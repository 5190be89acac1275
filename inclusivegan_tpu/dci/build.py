"""Compile-and-cache for the native DCI library.

Plays the role the reference's nvcc JIT harness played for its CUDA ops
(/root/reference/dnnlib/tflib/custom_ops.py:87-167): hash the sources and
build config, build ``libdci_<hash>.so`` once into a cache dir, reuse after.
"""

import hashlib
import os
import subprocess
import sys

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SOURCES = ["dci.cpp", "dci_c.cpp"]
_HEADERS = ["dci.hpp"]


def _cache_dir() -> str:
    d = os.environ.get("INCLUSIVEGAN_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "inclusivegan_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def build_dci_lib(verbose: bool = False) -> str:
    """Returns the path of the compiled shared library, building if needed."""
    hasher = hashlib.md5()
    for name in _HEADERS + _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            hasher.update(f.read())
    flags = ["-O3", "-std=c++17", "-fPIC", "-shared", "-fopenmp",
             "-march=native", "-funroll-loops"]
    hasher.update(" ".join(flags).encode())
    out = os.path.join(_cache_dir(), f"libdci_{hasher.hexdigest()[:12]}.so")
    if os.path.exists(out):
        return out
    cmd = (["g++"] + flags +
           [os.path.join(_SRC_DIR, s) for s in _SOURCES] +
           ["-I", _SRC_DIR, "-o", out + ".tmp"])
    if verbose:
        print("Building DCI library:", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    os.replace(out + ".tmp", out)
    return out
