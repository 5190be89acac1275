"""Network introspection — ``list_layers``/``print_layers`` parity with the
reference Network class (/root/reference/dnnlib/tflib/network.py:463-533):
per-scope parameter counts and shapes, used for weight-count parity checks
against the reference's printed tables."""

from typing import Any, Dict, List, Tuple

import jax
import numpy as np


def list_layers(params: Dict[str, Any], prefix: str = ""):
    """→ [(scope_name, num_params, [shapes...])] with one row per leaf dict
    (a 'layer' = a params subtree containing only arrays)."""
    rows = []
    arrays = {k: v for k, v in params.items()
              if not isinstance(v, dict)}
    subtrees = {k: v for k, v in params.items() if isinstance(v, dict)}
    if arrays:
        n = sum(int(np.prod(np.shape(a))) for a in arrays.values())
        shapes = [list(np.shape(a)) for a in arrays.values()]
        rows.append((prefix.rstrip("/") or "<root>", n, shapes))
    for k in subtrees:
        rows.extend(list_layers(subtrees[k], prefix + k + "/"))
    return rows


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(x)))
               for x in jax.tree_util.tree_leaves(params))


def print_layers(params: Dict[str, Any], title: str = "Network") -> int:
    rows = list_layers(params)
    total = count_params(params)
    name_w = max([len(r[0]) for r in rows] + [len(title)]) + 2
    print(f"\n{title:<{name_w}s}{'Params':<10s}Shapes")
    print("-" * (name_w + 40))
    for name, n, shapes in rows:
        print(f"{name:<{name_w}s}{n:<10d}{shapes}")
    print("-" * (name_w + 40))
    print(f"{'Total':<{name_w}s}{total:<10d}\n")
    return total
