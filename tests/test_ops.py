"""Kernel-level parity tests: fast conv path and Pallas path vs the
independent shift-and-sum reference implementation, including 1st and
2nd-order gradients (SURVEY.md §4: the 2nd-order path is load-bearing for the
R1 and path-length regularizers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from inclusivegan_tpu.ops import (
    upfirdn2d, setup_filter, filter2d, upsample2d, downsample2d,
    upsample_conv2d, conv_downsample2d, fused_bias_act, activation_funcs,
)

RK = [1, 3, 3, 1]  # resample_kernel used throughout the reference nets


def _rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 1), (2, 1, 2), (1, 2, 1), (2, 2, 3),
    (1, 1, (2, 1, 0, 3)), (2, 1, (1, -1, 2, 0)),
])
def test_upfirdn2d_conv_matches_ref(up, down, pad):
    x = _rand((2, 3, 8, 8))
    f = setup_filter(RK)
    y_ref = upfirdn2d(x, f, up=up, down=down, pad=pad, impl="ref")
    y_fast = upfirdn2d(x, f, up=up, down=down, pad=pad, impl="conv")
    assert y_fast.shape == y_ref.shape
    np.testing.assert_allclose(y_fast, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", [(1, 1, 1), (2, 1, 2), (1, 2, 1)])
def test_upfirdn2d_pallas_matches_ref(up, down, pad):
    x = _rand((2, 3, 8, 8))
    f = setup_filter(RK)
    y_ref = upfirdn2d(x, f, up=up, down=down, pad=pad, impl="ref")
    y_pl = upfirdn2d(x, f, up=up, down=down, pad=pad, impl="pallas")
    np.testing.assert_allclose(y_pl, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", [(1, 1, 1), (2, 1, 2), (1, 2, 1)])
def test_upfirdn2d_pallas_bf16_accumulates_f32(up, down, pad):
    """ADVICE r3: production feeds the FIR kernel bf16 activations. The
    kernel must accumulate in f32 (as the MXU conv path it replaced does),
    so its bf16 output may differ from the f32 conv result by one output
    rounding only — not by accumulated bf16 drift."""
    x16 = _rand((2, 3, 8, 8), seed=3).astype(jnp.bfloat16)
    f = setup_filter(RK)
    y32 = upfirdn2d(x16.astype(jnp.float32), f, up=up, down=down, pad=pad,
                    impl="conv")
    y16 = upfirdn2d(x16, f, up=up, down=down, pad=pad, impl="pallas")
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(y16.astype(jnp.float32), y32,
                               rtol=1e-2, atol=1e-2)


def test_upfirdn2d_gradients_match():
    x = _rand((1, 2, 6, 6))
    f = setup_filter(RK)

    def loss(impl):
        return lambda x: jnp.sum(upfirdn2d(x, f, up=2, down=1, pad=2, impl=impl) ** 2)

    g_ref = jax.grad(loss("ref"))(x)
    g_fast = jax.grad(loss("conv"))(x)
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-4, atol=1e-5)
    # 2nd order
    gg_ref = jax.grad(lambda x: jnp.sum(jax.grad(loss("ref"))(x) ** 2))(x)
    gg_fast = jax.grad(lambda x: jnp.sum(jax.grad(loss("conv"))(x) ** 2))(x)
    np.testing.assert_allclose(gg_fast, gg_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 1), (2, 1, 2), (1, 2, 1), (2, 2, 3), (1, 1, (2, 1, 0, 3)),
])
def test_upfirdn2d_pallas_gradients_match(up, down, pad):
    """The Pallas kernel's custom VJP (flipped taps, swapped up/down —
    reference upfirdn_2d.py:130-140) must agree with XLA autodiff through the
    conv path, to 2nd order (R1 differentiates the D downsample twice)."""
    x = _rand((1, 2, 6, 6))
    f = setup_filter(RK)

    def loss(impl):
        return lambda x: jnp.sum(
            upfirdn2d(x, f, up=up, down=down, pad=pad, impl=impl) ** 2)

    g_ref = jax.grad(loss("conv"))(x)
    g_pl = jax.grad(loss("pallas"))(x)
    np.testing.assert_allclose(g_pl, g_ref, rtol=1e-4, atol=1e-5)
    gg_ref = jax.grad(lambda x: jnp.sum(jax.grad(loss("conv"))(x) ** 2))(x)
    gg_pl = jax.grad(lambda x: jnp.sum(jax.grad(loss("pallas"))(x) ** 2))(x)
    np.testing.assert_allclose(gg_pl, gg_ref, rtol=1e-4, atol=1e-5)


def test_upsample_downsample_shapes_and_roundtrip_dc():
    x = jnp.ones((1, 1, 8, 8))
    up = upsample2d(x, RK, factor=2)
    assert up.shape == (1, 1, 16, 16)
    dn = downsample2d(up, RK, factor=2)
    assert dn.shape == (1, 1, 8, 8)
    # DC gain preserved through up→down (interior far from borders)
    np.testing.assert_allclose(dn[0, 0, 2:-2, 2:-2], 1.0, rtol=1e-4)


def test_upsample_conv2d_matches_explicit():
    """Fused transposed-conv+FIR equals upsample-then-conv for a 1x1 kernel."""
    x = _rand((2, 4, 8, 8))
    w = _rand((1, 1, 4, 5), seed=1)  # [kh,kw,Cin,Cout]
    y = upsample_conv2d(x, w, RK, factor=2)
    assert y.shape == (2, 5, 16, 16)
    # 1x1 conv commutes with resampling
    xc = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y2 = upsample2d(xc, RK, factor=2)
    np.testing.assert_allclose(y, y2, rtol=1e-4, atol=1e-5)


def test_conv_downsample2d_matches_explicit():
    x = _rand((2, 4, 16, 16))
    w = _rand((1, 1, 4, 5), seed=1)
    y = conv_downsample2d(x, w, RK, factor=2)
    assert y.shape == (2, 5, 8, 8)
    xc = jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y2 = downsample2d(xc, RK, factor=2)
    np.testing.assert_allclose(y, y2, rtol=1e-4, atol=1e-5)


def test_filter2d_keeps_shape():
    x = _rand((1, 3, 9, 9))
    y = filter2d(x, RK)
    assert y.shape == x.shape


def test_nhwc_layout_agrees():
    x = _rand((2, 3, 8, 8))
    f = setup_filter(RK)
    y_nchw = upfirdn2d(x, f, up=2, pad=2)
    y_nhwc = upfirdn2d(jnp.transpose(x, (0, 2, 3, 1)), f, up=2, pad=2,
                       data_format="NHWC")
    np.testing.assert_allclose(jnp.transpose(y_nhwc, (0, 3, 1, 2)), y_nchw,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# fused_bias_act
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("act", sorted(activation_funcs.keys()))
def test_fused_bias_act_all_activations(act):
    x = _rand((2, 4, 3, 3))
    b = _rand((4,), seed=2)
    y = fused_bias_act(x, b, act=act)
    spec = activation_funcs[act]
    expected = spec.fn(x + b.reshape(1, -1, 1, 1), spec.def_alpha) * spec.def_gain
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_fused_bias_act_second_order_grad():
    x = _rand((1, 2, 2, 2))
    b = _rand((2,), seed=3)

    def f(x):
        return jnp.sum(fused_bias_act(x, b, act="swish") ** 2)

    g = jax.grad(f)(x)
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(gg)).all()


def test_bias_act_pallas_matches_jax():
    x = _rand((2, 4, 8, 8))
    b = _rand((4,), seed=2)
    y_jax = fused_bias_act(x, b, act="lrelu", impl="jax")
    y_pl = fused_bias_act(x, b, act="lrelu", impl="pallas")
    np.testing.assert_allclose(y_pl, y_jax, rtol=1e-5, atol=1e-6)
    # gradient parity through the custom_vjp
    g_jax = jax.grad(lambda x: jnp.sum(fused_bias_act(x, b, act="lrelu") ** 2))(x)
    g_pl = jax.grad(lambda x: jnp.sum(fused_bias_act(x, b, act="lrelu", impl="pallas") ** 2))(x)
    np.testing.assert_allclose(g_pl, g_jax, rtol=1e-5, atol=1e-6)


def test_bias_act_pallas_second_order_grad():
    """R1 and path-reg differentiate the activation twice; the Pallas
    custom_jvp must agree with XLA autodiff through the jnp form."""
    x = _rand((2, 3, 4, 4))
    b = _rand((3,), seed=1)

    def loss(impl):
        return lambda x: jnp.sum(
            fused_bias_act(x, b, act="lrelu", impl=impl) ** 2)

    for order in range(2):
        g_jax = jax.grad(loss("jax"))(x)
        g_pl = jax.grad(loss("pallas"))(x)
        np.testing.assert_allclose(g_pl, g_jax, rtol=1e-5, atol=1e-6)
    gg_jax = jax.grad(lambda x: jnp.sum(jax.grad(loss("jax"))(x) ** 2))(x)
    gg_pl = jax.grad(lambda x: jnp.sum(jax.grad(loss("pallas"))(x) ** 2))(x)
    np.testing.assert_allclose(gg_pl, gg_jax, rtol=1e-5, atol=1e-6)
    # bias grad parity too (db = sum over N,H,W of slope*g)
    db_jax = jax.grad(lambda b: jnp.sum(
        fused_bias_act(x, b, act="lrelu", impl="jax") ** 2))(b)
    db_pl = jax.grad(lambda b: jnp.sum(
        fused_bias_act(x, b, act="lrelu", impl="pallas") ** 2))(b)
    np.testing.assert_allclose(db_pl, db_jax, rtol=1e-5, atol=1e-6)


def test_fused_bias_act_clamp():
    x = _rand((1, 2, 2, 2)) * 100
    y = fused_bias_act(x, None, act="linear", clamp=1.5)
    assert float(jnp.max(jnp.abs(y))) <= 1.5 + 1e-6


def test_pallas_bias_act_inside_shard_map():
    """Regression: pallas_call out_shapes must carry the input's vma or
    shard_map's check_vma rejects the kernel (hit by the on-chip G-step
    A/B, scripts/probe_g_step_ab.py pallas variant)."""
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P
    from inclusivegan_tpu.ops.pallas_kernels import bias_act_lrelu_pallas

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("data",))
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 8), jnp.float32)
    b = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)

    @jax.jit
    def run(x, b):
        return jax.shard_map(
            lambda xx, bb: bias_act_lrelu_pallas(xx, bb),
            mesh=mesh, in_specs=(P("data"), P()),
            out_specs=P("data"))(x, b)

    y = run(x, b)
    ref = jnp.maximum(x + b[None, :, None, None], 0.2 * (
        x + b[None, :, None, None])) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)
