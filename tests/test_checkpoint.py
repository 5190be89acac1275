"""Full-state checkpoint round-trip (orbax) + introspection + in-graph DCI op."""

import jax
import jax.numpy as jnp
import numpy as np

from inclusivegan_tpu.models import Discriminator, GMain
from inclusivegan_tpu.training.checkpoint import (latest_checkpoint,
                                                  load_checkpoint,
                                                  save_checkpoint)
from inclusivegan_tpu.training.train_state import create_train_state


def _models():
    G = GMain.create(resolution=16, num_channels=3, latent_size=16,
                     dlatent_size=16, fmap_base=128, fmap_max=16,
                     mapping_layers=1, mapping_fmaps=16)
    D = Discriminator(resolution=16, num_channels=3, fmap_base=128,
                      fmap_max=16, mbstd_group_size=2)
    return G, D


def test_checkpoint_roundtrip(tmp_path):
    G, D = _models()
    state = create_train_state(jax.random.key(0), G, D)
    state = state._replace(step=jnp.asarray(42, jnp.int32),
                           pl_mean=jnp.asarray(1.5, jnp.float32))
    imle = {"cursor": 128, "staleness": 20}
    path = save_checkpoint(str(tmp_path / "ckpt"), state, imle)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    target = create_train_state(jax.random.key(1), G, D)  # different init
    restored, imle2 = load_checkpoint(path, target)
    assert int(restored.step) == 42
    assert float(restored.pl_mean) == 1.5
    assert imle2["cursor"] == 128 and imle2["staleness"] == 20
    w0 = state.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    w1 = restored.g_params["synthesis"]["4x4"]["Conv"]["weight"]
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
    m0 = state.g_opt.m["synthesis"]["4x4"]["Conv"]["weight"]
    m1 = restored.g_opt.m["synthesis"]["4x4"]["Conv"]["weight"]
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))


def test_print_layers_counts():
    from inclusivegan_tpu.utils.network_util import count_params, list_layers
    G, D = _models()
    params = G.init(jax.random.key(0))
    rows = list_layers(params["synthesis"])
    assert any("4x4/Conv" in name for name, _n, _s in rows)
    assert sum(n for _name, n, _s in rows) == count_params(params["synthesis"])


def test_dci_nn_search_op_inside_jit():
    from inclusivegan_tpu.dci.jax_op import DciNnSearch
    r = np.random.RandomState(0)
    data = r.randn(500, 8)
    op = DciNnSearch(dim=8, num_levels=1)
    op.update_db(data)

    @jax.jit
    def lookup(q):
        ids, dists = op.nn_search(q, num_neighbours=1, max_retrieve=500)
        return ids[:, 0], dists[:, 0]

    q = jnp.asarray(data[:5] + 1e-6)
    ids, dists = lookup(q)
    np.testing.assert_array_equal(np.asarray(ids), np.arange(5))
    assert float(jnp.max(dists)) < 1e-3


def test_reference_pkl_converter_roundtrip(tmp_path):
    """Stage-2 converter (scripts/convert_reference_pkl.py): flat reference
    variable names ('G/G_synthesis/4x4/Conv/weight', noise vars under the
    G_synthesis scope, 'G/dlatent_avg') map bijectively onto our param trees
    and the converted snapshot loads and runs a forward pass."""
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from convert_reference_pkl import convert
    from inclusivegan_tpu.training.training_loop import load_snapshot

    G, D = _models()
    state = create_train_state(jax.random.key(3), G, D)

    def flatten(tree, prefix, out):
        for k, v in tree.items():
            if isinstance(v, dict):
                flatten(v, f"{prefix}/{k}", out)
            else:
                out[f"{prefix}/{k}"] = np.asarray(v)

    flat = {}
    for net, params in (("G", state.g_params), ("Gs", state.gs_params)):
        flatten(params["mapping"], f"{net}/G_mapping", flat)
        flatten(params["synthesis"], f"{net}/G_synthesis", flat)
        for k, v in params["noise"].items():
            flat[f"{net}/G_synthesis/{k}"] = np.asarray(v)
        flat[f"{net}/dlatent_avg"] = np.asarray(params["dlatent_avg"])
    flatten(state.d_params, "D", flat)

    npz = str(tmp_path / "vars.npz")
    np.savez(npz, **flat)
    out_pkl = str(tmp_path / "converted.pkl")
    kwargs = dict(fmap_max=16, mapping_layers=1, mapping_fmaps=16)
    convert(npz, out_pkl, resolution=16, num_channels=3, latent_size=16,
            fmap_base=128, g_kwargs=kwargs,
            d_kwargs=dict(fmap_max=16, mbstd_group_size=2))

    G2, D2, params = load_snapshot(out_pkl)
    # weights survive bit-exactly
    np.testing.assert_array_equal(
        np.asarray(params["gs_params"]["synthesis"]["4x4"]["Conv"]["weight"]),
        np.asarray(state.gs_params["synthesis"]["4x4"]["Conv"]["weight"]))
    np.testing.assert_array_equal(
        np.asarray(params["g_params"]["noise"]["noise0"]),
        np.asarray(state.g_params["noise"]["noise0"]))
    np.testing.assert_array_equal(
        np.asarray(params["d_params"]["4x4"]["Conv"]["weight"]),
        np.asarray(state.d_params["4x4"]["Conv"]["weight"]))
    # and the converted snapshot actually runs
    z = np.random.RandomState(0).randn(2, 16).astype(np.float32)
    img = G2.apply(params["gs_params"], jnp.asarray(z),
                   jnp.zeros((2, G2.mapping.label_size)),
                   rng=jax.random.key(0), truncation_psi=0.7)
    assert img.shape == (2, 3, 16, 16)
    scores, _feats = D2.apply(params["d_params"], img)
    assert np.isfinite(np.asarray(scores)).all()


def test_lpips_weight_converter_roundtrip(tmp_path):
    """scripts/convert_lpips_weights.py: a torchvision-layout VGG16
    state_dict + richzhang LPIPS linear heads convert to the npz layout
    models/lpips.py loads, and the loaded params drive a finite LPIPS
    distance with d(x,x)=0."""
    import subprocess
    import sys
    import torch

    chans = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
             10: (128, 256), 12: (256, 256), 14: (256, 256),
             17: (256, 512), 19: (512, 512), 21: (512, 512),
             24: (512, 512), 26: (512, 512), 28: (512, 512)}
    g = torch.Generator().manual_seed(0)
    sd = {}
    for idx, (cin, cout) in chans.items():
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.05
    vgg_pth = str(tmp_path / "vgg16.pth")
    torch.save(sd, vgg_pth)

    taps_c = [64, 128, 256, 512, 512]
    lp = {f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
          for i, c in enumerate(taps_c)}
    lpips_pth = str(tmp_path / "lpips_vgg.pth")
    torch.save(lp, lpips_pth)

    out_npz = str(tmp_path / "lpips.npz")
    subprocess.run(
        [sys.executable, "/root/repo/scripts/convert_lpips_weights.py",
         "--vgg16-pth", vgg_pth, "--lpips-pth", lpips_pth, "--out", out_npz],
        check=True, capture_output=True)

    from inclusivegan_tpu.models.lpips import (load_lpips_params,
                                               lpips_distance)
    params = load_lpips_params(out_npz)
    # converted conv kernels are HWIO and bit-identical to the source
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["w"]),
        np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0)))
    imgs = np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32) * 255
    a = jnp.asarray(imgs)
    d_self = np.asarray(lpips_distance(params, a, a))
    d_cross = np.asarray(lpips_distance(params, a, a[::-1]))
    assert np.allclose(d_self, 0.0, atol=1e-5)
    assert np.isfinite(d_cross).all() and (d_cross > 0).all()
