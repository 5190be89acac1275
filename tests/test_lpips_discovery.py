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


def test_trunk_dtype_normalize_parity(monkeypatch):
    """INCLUSIVEGAN_TPU_LPIPS_NORM=trunk (bf16 maps, f32-accumulated
    channel norms, no f32 map materialization — BENCH_NOTES r4) stays
    within ~1e-2 relative distance of the default f32-map path, and the
    flag is a no-op for a float32 trunk."""
    import jax.numpy as jnp
    import numpy as np
    from inclusivegan_tpu.models.lpips import init_lpips_params, lpips_distance

    params = init_lpips_params(seed=11)
    r = np.random.RandomState(3)
    a = jnp.asarray(r.rand(4, 3, 32, 32).astype(np.float32) * 255)
    b = jnp.asarray(r.rand(4, 3, 32, 32).astype(np.float32) * 255)

    monkeypatch.delenv("INCLUSIVEGAN_TPU_LPIPS_NORM", raising=False)
    ref_f32 = np.asarray(lpips_distance(params, a, b))
    ref_bf16 = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16))

    monkeypatch.setenv("INCLUSIVEGAN_TPU_LPIPS_NORM", "trunk")
    trunk_bf16 = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16))
    trunk_f32 = np.asarray(lpips_distance(params, a, b))

    np.testing.assert_array_equal(trunk_f32, ref_f32)  # flag no-op on f32
    assert np.all(ref_f32 > 0)
    rel = np.abs(trunk_bf16 - ref_f32) / ref_f32
    assert rel.max() < 1e-2, (rel.max(), trunk_bf16, ref_f32)
    # and the trunk-norm path should not be WILDLY off the bf16 default
    rel2 = np.abs(trunk_bf16 - ref_bf16) / ref_bf16
    assert rel2.max() < 1e-2, rel2.max()


def test_norm_arg_overrides_env(monkeypatch):
    """ADVICE r4: the normalization mode is config-carried — the explicit
    ``norm=`` argument (plumbed from TrainConfig.lpips_norm through
    loss.g_main_loss) decides the path regardless of the env var, which
    remains only the fallback default for config-less callers."""
    import jax.numpy as jnp
    import numpy as np
    from inclusivegan_tpu.models.lpips import init_lpips_params, lpips_distance

    params = init_lpips_params(seed=11)
    r = np.random.RandomState(4)
    a = jnp.asarray(r.rand(2, 3, 32, 32).astype(np.float32) * 255)
    b = jnp.asarray(r.rand(2, 3, 32, 32).astype(np.float32) * 255)

    monkeypatch.delenv("INCLUSIVEGAN_TPU_LPIPS_NORM", raising=False)
    env_default = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16))
    arg_trunk = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16,
                                          norm="trunk"))
    # env says trunk, arg says f32 → arg wins (bitwise-equal to default)
    monkeypatch.setenv("INCLUSIVEGAN_TPU_LPIPS_NORM", "trunk")
    env_trunk = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16))
    arg_f32 = np.asarray(lpips_distance(params, a, b, dtype=jnp.bfloat16,
                                        norm="f32"))
    np.testing.assert_array_equal(arg_trunk, env_trunk)
    np.testing.assert_array_equal(arg_f32, env_default)
    assert np.any(arg_trunk != env_default)  # the two layouts do differ
