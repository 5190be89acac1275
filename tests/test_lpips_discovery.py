"""Ambient LPIPS weight discovery (models/lpips.py::get_lpips_params).

The reference hardcodes metrics/vgg16_zhang_perceptual.pkl in the training
loop (/root/reference/training/training_loop.py:195); our equivalent is a
well-known drop-in path (DEFAULT_WEIGHTS_PATH) plus the
INCLUSIVEGAN_LPIPS_WEIGHTS env override, with the pixel-pyramid fallback
when nothing is present. Routing is tested with a stubbed loader so no
full-width VGG npz is needed.
"""

import numpy as np

from inclusivegan_tpu.models import lpips as L


def _stub_loader(monkeypatch):
    monkeypatch.setattr(L, "load_lpips_params",
                        lambda path: {"_mode": np.array(1), "path": path})


def test_env_empty_forces_fallback(monkeypatch, tmp_path):
    # even with weights sitting at the default path, "" must win (test
    # hermeticity contract, conftest.py)
    f = tmp_path / "vgg16_zhang_perceptual.npz"
    f.write_bytes(b"x")
    monkeypatch.setattr(L, "DEFAULT_WEIGHTS_PATH", str(f))
    monkeypatch.setenv("INCLUSIVEGAN_LPIPS_WEIGHTS", "")
    assert int(L.get_lpips_params()["_mode"]) == 2


def test_env_path_used(monkeypatch, tmp_path):
    f = tmp_path / "w.npz"
    f.write_bytes(b"x")
    _stub_loader(monkeypatch)
    monkeypatch.setenv("INCLUSIVEGAN_LPIPS_WEIGHTS", str(f))
    assert L.get_lpips_params()["path"] == str(f)


def test_default_path_discovery(monkeypatch, tmp_path):
    monkeypatch.delenv("INCLUSIVEGAN_LPIPS_WEIGHTS", raising=False)
    f = tmp_path / "vgg16_zhang_perceptual.npz"
    f.write_bytes(b"x")
    _stub_loader(monkeypatch)
    monkeypatch.setattr(L, "DEFAULT_WEIGHTS_PATH", str(f))
    assert L.get_lpips_params()["path"] == str(f)


def test_explicit_path_beats_env(monkeypatch, tmp_path):
    explicit = tmp_path / "explicit.npz"
    explicit.write_bytes(b"x")
    other = tmp_path / "other.npz"
    other.write_bytes(b"x")
    _stub_loader(monkeypatch)
    monkeypatch.setenv("INCLUSIVEGAN_LPIPS_WEIGHTS", str(other))
    assert L.get_lpips_params(str(explicit))["path"] == str(explicit)


def test_nothing_present_falls_back(monkeypatch, tmp_path):
    monkeypatch.delenv("INCLUSIVEGAN_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "DEFAULT_WEIGHTS_PATH",
                        str(tmp_path / "missing.npz"))
    assert int(L.get_lpips_params()["_mode"]) == 2
