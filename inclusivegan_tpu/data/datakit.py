"""ctypes binding for the native data kernels (csrc/datakit.cpp): fast
CRC32C + TFRecord framing. data/tfrecord.py transparently uses these when
the library builds; the pure-python path remains the fallback (and the
correctness oracle in tests)."""

import ctypes
import hashlib
import os
import subprocess
import sys
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "datakit.cpp")
_LIB = None
_BUILD_FAILED = False


def _cache_dir() -> str:
    d = os.environ.get("INCLUSIVEGAN_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache",
                                    "inclusivegan_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    out = os.path.join(_cache_dir(), f"libdatakit_{digest}.so")
    if not os.path.exists(out):
        cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
               "-march=native", _SRC, "-o", out + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out + ".tmp", out)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded library or None when unavailable (no compiler)."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    try:
        lib = ctypes.CDLL(_build())
        lib.dk_crc32c.restype = ctypes.c_uint
        lib.dk_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                  ctypes.c_uint]
        lib.dk_write_record.restype = ctypes.c_int
        lib.dk_write_record.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_long]
        lib.dk_frame_records.restype = ctypes.c_long
        lib.dk_frame_records.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                         ctypes.c_long, ctypes.c_void_p]
        lib.dk_scan_records.restype = ctypes.c_long
        lib.dk_scan_records.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                        ctypes.c_void_p, ctypes.c_long,
                                        ctypes.c_int]
        _LIB = lib
    except Exception as e:  # no toolchain: fall back to python
        print(f"datakit build unavailable ({type(e).__name__}); "
              "using python TFRecord path", file=sys.stderr)
        _BUILD_FAILED = True
    return _LIB


def crc32c(data: bytes, crc: int = 0) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.dk_crc32c(data, len(data), crc))


def frame_record(payload: bytes) -> Optional[bytes]:
    """Return the framed record bytes (header+crc+payload+crc)."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    sizes = np.array([len(payload)], np.int64)
    out = ctypes.create_string_buffer(len(payload) + 16)
    n = lib.dk_frame_records(payload, sizes.ctypes.data_as(ctypes.c_void_p),
                             1, out)
    return out.raw[:n]
