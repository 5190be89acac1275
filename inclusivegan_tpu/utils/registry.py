"""Dotted-name → object resolution.

The reference wires every layer together through dotted-string function names
resolved at call time (``dnnlib.util.get_module_from_obj_name`` /
``get_obj_by_name`` / ``call_func_by_name``, /root/reference/dnnlib/util.py:194-256).
We keep that capability — configs stay picklable and human-diffable — with a
simpler resolver: try progressively shorter module prefixes, import, getattr
the rest.
"""

import importlib
import types
from typing import Any, Tuple


def get_module_from_obj_name(obj_name: str) -> Tuple[types.ModuleType, str]:
    """Split 'pkg.mod.attr.subattr' into (imported module, 'attr.subattr')."""
    parts = obj_name.split(".")
    # Longest importable prefix wins.
    for split in range(len(parts), 0, -1):
        module_name = ".".join(parts[:split])
        try:
            module = importlib.import_module(module_name)
            return module, ".".join(parts[split:])
        except ImportError:
            continue
    raise ImportError(f"cannot import any prefix of: {obj_name!r}")


def get_obj_from_module(module: types.ModuleType, obj_name: str) -> Any:
    obj = module
    if obj_name:
        for part in obj_name.split("."):
            obj = getattr(obj, part)
    return obj


def get_obj_by_name(name: str) -> Any:
    module, rest = get_module_from_obj_name(name)
    return get_obj_from_module(module, rest)


def call_func_by_name(*args, func_name: str, **kwargs) -> Any:
    assert func_name is not None
    return get_obj_by_name(func_name)(*args, **kwargs)
