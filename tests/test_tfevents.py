"""tfevents writer: format round-trip against our own proto parser (and
TensorFlow's reader when available)."""

import os

import numpy as np
import pytest

from inclusivegan_tpu.data.tfrecord import read_records, _parse_message
from inclusivegan_tpu.utils.tfevents import EventWriter


def _decode_events(path):
    events = []
    for payload in read_records(path, verify_crc=True):
        step, scalars = 0, {}
        for tag, wire, val in _parse_message(payload):
            if tag == 2 and wire == 0:
                step = val
            if tag == 5 and wire == 2:  # Summary
                for t2, _w2, v2 in _parse_message(val):
                    if t2 != 1:
                        continue
                    name, value = None, None
                    import struct
                    for t3, w3, v3 in _parse_message(v2):
                        if t3 == 1:
                            name = v3.decode()
                        if t3 == 2 and w3 == 5:
                            value = struct.unpack("<f", v3)[0]
                    if name is not None:
                        scalars[name] = value
        if scalars:
            events.append((step, scalars))
    return events


def test_event_file_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalars({"a/b": 1.25, "c": -3.0}, step=7)
    w.add_scalars({"a/b": 2.5}, step=8)
    w.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out")]
    assert len(files) == 1
    events = _decode_events(os.path.join(tmp_path, files[0]))
    assert (7, {"a/b": 1.25, "c": -3.0}) in events
    assert (8, {"a/b": 2.5}) in events


def test_tensorflow_reads_events(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from tensorflow.python.summary.summary_iterator import summary_iterator
    w = EventWriter(str(tmp_path))
    w.add_scalars({"x": 0.5}, step=3)
    w.close()
    f = [n for n in os.listdir(tmp_path) if n.startswith("events.out")][0]
    seen = [(e.step, v.tag, v.simple_value)
            for e in summary_iterator(os.path.join(str(tmp_path), f))
            for v in e.summary.value]
    assert (3, "x", 0.5) in seen


def test_copy_source_files(tmp_path):
    from inclusivegan_tpu.utils.run_harness import SubmitConfig, submit_run
    sc = SubmitConfig(run_dir_root=str(tmp_path), run_desc="s",
                      copy_source_files=True)
    submit_run(sc, "tests.test_tfevents._noop_run")
    src_dir = os.path.join(str(tmp_path), "00000-s", "src", "inclusivegan_tpu")
    assert os.path.isfile(os.path.join(src_dir, "ops", "upfirdn2d.py"))


def _noop_run(submit_config):
    return None
