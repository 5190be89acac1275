"""Native datakit vs the pure-python oracle: CRC32C values, framing bytes,
file scanning."""

import os

import numpy as np
import pytest

from inclusivegan_tpu.data import datakit, tfrecord


@pytest.fixture(scope="module")
def lib():
    lib = datakit.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    return lib


def test_crc32c_matches_python(lib):
    r = np.random.RandomState(0)
    for n in (0, 1, 7, 8, 9, 63, 1024, 100_000):
        data = r.bytes(n)
        assert datakit.crc32c(data) == tfrecord._crc32c_py(data), n
    assert datakit.crc32c(b"123456789") == 0xE3069283


def test_crc32c_streaming(lib):
    data = os.urandom(10_000)
    whole = datakit.crc32c(data)
    # streaming: feed in two chunks through the crc parameter
    part = datakit.crc32c(data[:4000])
    # (CRC chaining needs un-finalized state; our API finalizes — verify the
    # single-shot path only and that the python fallback agrees.)
    assert whole == tfrecord._crc32c_py(data)
    assert part == tfrecord._crc32c_py(data[:4000])


def test_frame_record_matches_python_writer(lib, tmp_path):
    payload = os.urandom(5000)
    native = datakit.frame_record(payload)
    import io
    buf = io.BytesIO()
    tfrecord.write_record(buf, payload)
    assert native == buf.getvalue()


def test_scan_records(lib, tmp_path):
    import ctypes
    path = str(tmp_path / "scan.rec")
    payloads = [os.urandom(n) for n in (10, 1000, 77)]
    with open(path, "wb") as f:
        for p in payloads:
            tfrecord.write_record(f, p)
    offsets = np.zeros(10, np.int64)
    lengths = np.zeros(10, np.int64)
    n = lib.dk_scan_records(path.encode(),
                            offsets.ctypes.data_as(ctypes.c_void_p),
                            lengths.ctypes.data_as(ctypes.c_void_p), 10, 1)
    assert n == 3
    with open(path, "rb") as f:
        blob = f.read()
    for i, p in enumerate(payloads):
        assert blob[offsets[i]:offsets[i] + lengths[i]] == p
