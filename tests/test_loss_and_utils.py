"""Unit tests for loss math, schedule, optimizer hyper folding, run harness
and host utils."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inclusivegan_tpu.training.loss import fold_dlatent_avg, lerp, slerp
from inclusivegan_tpu.training.optimizer import lazy_reg_hparams
from inclusivegan_tpu.training.schedule import training_schedule
from inclusivegan_tpu.utils import misc
from inclusivegan_tpu.utils.easydict import EasyDict
from inclusivegan_tpu.utils.run_harness import RunContext, SubmitConfig, submit_run


def test_slerp_endpoints_and_norm():
    a = jnp.asarray(np.random.RandomState(0).randn(4, 16), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(4, 16), jnp.float32)
    s0 = slerp(a, b, jnp.zeros((4, 1)))
    s1 = slerp(a, b, jnp.ones((4, 1)))
    # tflib.slerp normalizes its output (tfutil.py:78-87)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(s0), axis=1), 1.0,
                               rtol=1e-5)
    an = np.asarray(a) / np.linalg.norm(np.asarray(a), axis=1, keepdims=True)
    bn = np.asarray(b) / np.linalg.norm(np.asarray(b), axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(s0), an, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), bn, rtol=1e-4, atol=1e-5)
    # midpoint equidistant on the sphere
    sm = np.asarray(slerp(a, b, jnp.full((4, 1), 0.5)))
    d0 = np.linalg.norm(sm - an, axis=1)
    d1 = np.linalg.norm(sm - bn, axis=1)
    np.testing.assert_allclose(d0, d1, rtol=1e-4)


def test_slerp_np_matches_jax():
    a = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    b = np.random.RandomState(1).randn(4, 16).astype(np.float32)
    # both follow the same normalized-slerp formula (misc.py:196-203 ==
    # tfutil.py:78-87)
    s_np = misc.slerp_np(a, b, 0.3)
    s_jx = np.asarray(slerp(jnp.asarray(a), jnp.asarray(b),
                            jnp.full((4, 1), 0.3)))
    np.testing.assert_allclose(s_np, s_jx, rtol=1e-3, atol=1e-4)


def test_fold_dlatent_avg_order():
    avg = jnp.zeros((4,))
    b1 = jnp.ones((4,))
    b2 = jnp.full((4,), 2.0)
    out = fold_dlatent_avg(avg, [b1, b2], beta=0.9)
    # two sequential lerps: a1 = 0.1*1; a2 = 2 + (a1-2)*0.9
    expected = 2.0 + (0.1 - 2.0) * 0.9
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)


def test_lazy_reg_hparams():
    lr, b1, b2 = lazy_reg_hparams(0.002, 0.0, 0.99, 4)
    assert abs(lr - 0.002 * 0.8) < 1e-9
    assert b1 == 0.0
    assert abs(b2 - 0.99 ** 0.8) < 1e-9


def test_training_schedule_constant_lod():
    s = training_schedule(cur_nimg=500_000, resolution_log2=7,
                          minibatch_size_base=12, minibatch_gpu_base=6)
    assert s.lod == 0.0
    assert s.resolution == 128
    assert s.minibatch_size == 12 and s.minibatch_gpu == 6
    assert s.G_lrate == 0.002


def test_training_schedule_rampup():
    s = training_schedule(cur_nimg=500, resolution_log2=5,
                          lrate_rampup_kimg=1.0)
    assert abs(s.G_lrate - 0.001) < 1e-9


def test_resume_rampup_scale():
    from inclusivegan_tpu.training.schedule import resume_rampup_scale
    assert resume_rampup_scale(301.0, 301.0, 20.0) == 0.0
    assert abs(resume_rampup_scale(311.0, 301.0, 20.0) - 0.5) < 1e-9
    assert resume_rampup_scale(400.0, 301.0, 20.0) == 1.0
    assert resume_rampup_scale(0.0, 301.0, 20.0) == 0.0    # clamped below
    assert resume_rampup_scale(5.0, 301.0, 0.0) == 1.0     # disabled


def test_submit_run_harness(tmp_path):
    sc = SubmitConfig(run_dir_root=str(tmp_path / "results"), run_desc="t")
    result = submit_run(sc, "tests.test_loss_and_utils._dummy_run_func",
                        value=7)
    assert result == 14
    run_dir = os.path.join(str(tmp_path / "results"), "00000-t")
    names = os.listdir(run_dir)
    for expected in ("log.txt", "submit_config.pkl", "submit_config.txt",
                     "_finished.txt"):
        assert expected in names
    # numbered dirs increment
    sc2 = SubmitConfig(run_dir_root=str(tmp_path / "results"), run_desc="t")
    submit_run(sc2, "tests.test_loss_and_utils._dummy_run_func", value=1)
    assert os.path.isdir(os.path.join(str(tmp_path / "results"), "00001-t"))


def _dummy_run_func(submit_config, value):
    print(f"running with {value}")
    return value * 2


def test_run_context_abort(tmp_path):
    sc = SubmitConfig(run_dir_root=str(tmp_path), run_desc="x")
    sc.run_dir = str(tmp_path / "run")
    os.makedirs(sc.run_dir)
    sc.task_name = "t"
    ctx = RunContext(sc)
    assert not ctx.should_stop()
    open(os.path.join(sc.run_dir, "abort.txt"), "w").close()
    assert ctx.should_stop()
    ctx.close()
    assert os.path.exists(os.path.join(sc.run_dir, "run.txt"))


def test_parse_kimg_from_log(tmp_path):
    log = tmp_path / "log.txt"
    log.write_text(
        "tick 1     kimg 2.5      lod 0.00 minibatch 8    time 1m 30s "
        "sec/tick 10.0    sec/kimg 4.0\n"
        "tick 2     kimg 5.0      lod 0.00 minibatch 8    time 3m 00s "
        "sec/tick 10.0    sec/kimg 4.0\n")
    kimg, secs = misc.parse_kimg_time_from_log(str(log))
    assert kimg == 5.0
    assert secs == 180.0


def test_image_grid_and_drange():
    imgs = np.random.RandomState(0).uniform(-1, 1, (6, 3, 8, 8)).astype(np.float32)
    grid = misc.create_image_grid(imgs, grid_size=(3, 2))
    assert grid.shape == (3, 16, 24)
    u8 = misc.convert_to_uint8_pil(grid)
    assert u8.dtype == np.uint8 and u8.shape == (16, 24, 3)


def test_registry_resolution():
    from inclusivegan_tpu.utils.registry import call_func_by_name, get_obj_by_name
    fn = get_obj_by_name("inclusivegan_tpu.models.stylegan2.nf")
    assert fn(1, 512, 1.0, 1, 64) == 64
    out = call_func_by_name(2, 512, 1.0, 1, 64,
                            func_name="inclusivegan_tpu.models.stylegan2.nf")
    assert out == 64


def test_parse_config_for_previous_run(tmp_path):
    """Run-dir config recovery (reference misc.py:85-89): metrics re-open a
    run's own dataset when dataset_args aren't passed."""
    import pickle
    from inclusivegan_tpu.utils.misc import parse_config_for_previous_run
    from inclusivegan_tpu.utils.run_harness import SubmitConfig
    sc = SubmitConfig()
    sc.run_func_kwargs = {"dataset_args": {"tfrecord_dir": "toy"},
                          "mirror_augment": True}
    with open(tmp_path / "submit_config.pkl", "wb") as f:
        pickle.dump(sc, f)
    cfg = parse_config_for_previous_run(str(tmp_path))
    assert cfg["dataset"] == {"tfrecord_dir": "toy"}
    assert cfg["train"]["mirror_augment"] is True
