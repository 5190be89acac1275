"""Tests for the pretrained-weight converter scripts (VERDICT round-1 §2).

The converters were previously untested: a key-mapping or layout bug would
stay invisible until a real reference blob appears (none exist in this
container — no egress). These tests synthesize source-format dumps and
assert round-trip structural AND numeric parity, so a real pkl/pth dropped
in later "just works".

Reference formats emulated:
  * reference network pkl → vars npz (dnnlib/tflib/network.py:255-299 var
    naming, e.g. 'G/G_synthesis/4x4/Conv/weight'),
  * torchvision inception_v3 state_dict (.conv.weight/.bn.* module paths),
  * torchvision vgg16 ``features`` state_dict + richzhang LPIPS lin heads.
"""

import importlib.util
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    path = os.path.join(REPO, "scripts", f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        assert np.array_equal(np.asarray(a), np.asarray(b)), path


# ---------------------------------------------------------------------------
# reference network pkl (stage-2) round trip
# ---------------------------------------------------------------------------

def test_reference_vars_roundtrip_forward_parity(tmp_path):
    """Init a tiny (G, D, Gs) triple, dump it in the reference's TF-variable
    naming (what scripts/dump_reference_vars.py would emit from a TF1 env),
    convert with scripts/convert_reference_pkl.py, reload through
    training_loop.load_snapshot, and assert identical trees + bit-identical
    forward outputs."""
    from inclusivegan_tpu.models import GMain, Discriminator
    from inclusivegan_tpu.training.training_loop import load_snapshot

    g_kwargs = dict(fmap_max=16, mapping_layers=2, mapping_fmaps=16)
    d_kwargs = dict(fmap_max=16, mbstd_group_size=2)
    G = GMain.create(resolution=16, num_channels=3, latent_size=16,
                     dlatent_size=16, fmap_base=128, architecture="skip",
                     **g_kwargs)
    D = Discriminator(resolution=16, num_channels=3, fmap_base=128,
                      architecture="resnet", **d_kwargs)
    key = jax.random.key(7)
    kg, kgs, kd = jax.random.split(key, 3)
    g_params = G.init(kg)
    gs_params = jax.tree_util.tree_map(lambda x: x + 0.01, G.init(kgs))
    d_params = D.init(kd)

    # --- emulate dump_reference_vars.py: '<net>/<scope>/<var>' keys
    dump = {}
    for net, params in (("G", g_params), ("Gs", gs_params)):
        dump.update(_flatten(params["mapping"], f"{net}/G_mapping"))
        dump.update(_flatten(params["synthesis"], f"{net}/G_synthesis"))
        dump.update(_flatten(params["noise"], f"{net}/G_synthesis"))
        dump[f"{net}/dlatent_avg"] = np.asarray(params["dlatent_avg"])
    dump.update(_flatten(d_params, "D"))
    npz = tmp_path / "vars.npz"
    np.savez(npz, **dump)

    conv = _load_script("convert_reference_pkl")
    out_pkl = tmp_path / "converted.pkl"
    conv.convert(str(npz), str(out_pkl), resolution=16, num_channels=3,
                 latent_size=16, fmap_base=128, g_arch="skip",
                 d_arch="resnet", g_kwargs=g_kwargs, d_kwargs=d_kwargs)

    G2, D2, state = load_snapshot(str(out_pkl))
    _tree_equal(g_params, state["g_params"])
    _tree_equal(gs_params, state["gs_params"])
    _tree_equal(d_params, state["d_params"])

    z = jax.random.normal(jax.random.key(3), (4, 16))
    img1 = G.apply(g_params, z, randomize_noise=False)
    img2 = G2.apply(state["g_params"], z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))

    s1, f1 = D.apply(d_params, img1)
    s2, f2 = D2.apply(state["d_params"], img2)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_reference_vars_var_names_match_reference_inventory():
    """The conversion relies on our param-tree paths equalling the
    reference's TF variable-scope names (models/stylegan2.py module doc).
    Pin the exact flattened inventory for a 16px skip-G / resnet-D so a
    rename on our side fails loudly here, not at blob-drop time.
    Reference scopes: networks_stylegan2.py:151-507."""
    from inclusivegan_tpu.models import GMain, Discriminator

    G = GMain.create(resolution=16, num_channels=3, latent_size=16,
                     dlatent_size=16, fmap_base=128, fmap_max=16,
                     architecture="skip", mapping_layers=2, mapping_fmaps=16)
    D = Discriminator(resolution=16, num_channels=3, fmap_base=128,
                      fmap_max=16, architecture="resnet", mbstd_group_size=2)
    p = G.init(jax.random.key(0))

    mapping = sorted(_flatten(p["mapping"], "G_mapping"))
    assert mapping == [
        "G_mapping/Dense0/bias", "G_mapping/Dense0/weight",
        "G_mapping/Dense1/bias", "G_mapping/Dense1/weight"]

    modconv = ["bias", "mod_bias", "mod_weight", "noise_strength", "weight"]
    torgb = ["bias", "mod_bias", "mod_weight", "weight"]
    expected = (["G_synthesis/4x4/Const/const"]
                + [f"G_synthesis/4x4/Conv/{v}" for v in modconv]
                + [f"G_synthesis/4x4/ToRGB/{v}" for v in torgb])
    for res in ("8x8", "16x16"):
        expected += [f"G_synthesis/{res}/Conv0_up/{v}" for v in modconv]
        expected += [f"G_synthesis/{res}/Conv1/{v}" for v in modconv]
        expected += [f"G_synthesis/{res}/ToRGB/{v}" for v in torgb]
    expected += [f"G_synthesis/noise{i}" for i in range(5)]
    synth = sorted(_flatten(p["synthesis"], "G_synthesis")
                   | _flatten(p["noise"], "G_synthesis"))
    assert synth == sorted(expected)

    dp = D.init(jax.random.key(1))
    d_expected = (["16x16/FromRGB/bias", "16x16/FromRGB/weight"]
                  + [f"{res}/{layer}/weight" for res in ("16x16", "8x8")
                     for layer in ("Conv0", "Conv1_down", "Skip")]
                  + [f"{res}/{layer}/bias" for res in ("16x16", "8x8")
                     for layer in ("Conv0", "Conv1_down")]
                  + ["4x4/Conv/bias", "4x4/Conv/weight",
                     "4x4/Dense0/bias", "4x4/Dense0/weight",
                     "Output/bias", "Output/weight"])
    assert sorted(_flatten(dp)) == sorted(d_expected)


# ---------------------------------------------------------------------------
# inception converter
# ---------------------------------------------------------------------------

def _fake_bn_module(rng, name, cin, cout, k, with_gamma=True, tame=False):
    """A torchvision-style BasicConv2d state-dict fragment.

    tame=True keeps per-layer gain ≈ 1 so ~94 stacked layers don't overflow
    (used by the full-model key/shape test); tame=False uses tiny variances
    on purpose — that is where the naive g²·v fold is maximally wrong
    relative to eps=1e-3 (used by the numeric fold test)."""
    import torch
    kh, kw = (k, k) if isinstance(k, int) else k
    std = 1.0 / np.sqrt(kh * kw * cin) if tame else 0.1
    var_lo, var_hi = (0.5, 2.0) if tame else (0.002, 0.05)
    frag = {
        f"{name}.conv.weight": torch.tensor(
            rng.normal(0, std, (cout, cin, kh, kw)).astype(np.float32)),
        f"{name}.bn.bias": torch.tensor(
            rng.normal(0, 0.2, (cout,)).astype(np.float32)),
        f"{name}.bn.running_mean": torch.tensor(
            rng.normal(0, 0.3 if not tame else 0.05,
                       (cout,)).astype(np.float32)),
        f"{name}.bn.running_var": torch.tensor(
            rng.uniform(var_lo, var_hi, (cout,)).astype(np.float32)),
    }
    if with_gamma:
        if tame:
            g = rng.uniform(0.8, 1.2, (cout,)).astype(np.float32)
        else:
            g = rng.uniform(0.2, 2.5, (cout,)).astype(np.float32)
            g[::7] *= -1.0                  # exercise negative gammas
            if cout > 3:
                g[3] = 0.0                  # and a dead channel
        frag[f"{name}.bn.weight"] = torch.tensor(g)
    return frag


def test_inception_gamma_fold_numeric_parity():
    """convert()'s gamma fold must reproduce torch's affine BN exactly
    through our scale-free BN formula (models/inception.py:162-164)."""
    import torch
    import torch.nn.functional as F

    conv = _load_script("convert_inception_weights")
    rng = np.random.RandomState(0)
    sd = _fake_bn_module(rng, "m", cin=5, cout=8, k=3)
    out = conv.convert(sd)

    x = rng.normal(0, 1, (2, 5, 9, 9)).astype(np.float32)
    with torch.no_grad():
        y_true = F.batch_norm(
            F.conv2d(torch.tensor(x), sd["m.conv.weight"]),
            sd["m.bn.running_mean"], sd["m.bn.running_var"],
            weight=sd["m.bn.weight"], bias=sd["m.bn.bias"],
            training=False, eps=conv.BN_EPS).numpy()

    # our model's conv+BN path with the exported params
    w = jnp.transpose(jnp.asarray(out["m.w"]), (3, 2, 0, 1))  # HWIO→OIHW
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    inv = jax.lax.rsqrt(jnp.asarray(out["m.var"]) + conv.BN_EPS)
    y = ((y - out["m.mean"][None, :, None, None])
         * inv[None, :, None, None] + out["m.beta"][None, :, None, None])
    np.testing.assert_allclose(np.asarray(y), y_true, atol=2e-4, rtol=2e-4)

    # sensitivity guard: the naive fold (w·g, m·g, v·g²) must NOT pass this
    # fixture, else the test proves nothing
    g = sd["m.bn.weight"].numpy()
    naive_var = sd["m.bn.running_var"].numpy() * g * g
    naive_inv = 1.0 / np.sqrt(naive_var + conv.BN_EPS)
    c = F.conv2d(torch.tensor(x),
                 sd["m.conv.weight"] * torch.tensor(g)[:, None, None, None])
    y_naive = ((c.numpy() - (sd["m.bn.running_mean"].numpy() * g)
                [None, :, None, None]) * naive_inv[None, :, None, None]
               + sd["m.bn.bias"].numpy()[None, :, None, None])
    assert np.max(np.abs(y_naive - y_true)) > 1e-2


def test_inception_no_gamma_passthrough():
    """TF-style dumps (scale=False, no .bn.weight key) must pass through
    untouched apart from the HWIO transpose."""
    conv = _load_script("convert_inception_weights")
    rng = np.random.RandomState(1)
    sd = _fake_bn_module(rng, "m", cin=4, cout=6, k=(1, 7), with_gamma=False)
    out = conv.convert(sd)
    np.testing.assert_array_equal(
        out["m.w"], np.transpose(sd["m.conv.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_array_equal(out["m.mean"],
                                  sd["m.bn.running_mean"].numpy())
    np.testing.assert_array_equal(out["m.var"],
                                  sd["m.bn.running_var"].numpy())
    assert out["m.w"].shape == (1, 7, 4, 6)


def test_inception_fc_logits_offset():
    """torchvision's 1000-way fc maps into TF's 1008-way layout at offset 1
    (class 0 is TF's background logit)."""
    import torch
    conv = _load_script("convert_inception_weights")
    rng = np.random.RandomState(2)
    sd = {"fc.weight": torch.tensor(
              rng.normal(0, 1, (1000, 2048)).astype(np.float32)),
          "fc.bias": torch.tensor(
              rng.normal(0, 1, (1000,)).astype(np.float32))}
    out = conv.convert(sd)
    assert out["logits.w"].shape == (2048, 1008)
    assert np.all(out["logits.w"][:, 0] == 0)
    assert np.all(out["logits.w"][:, 1001:] == 0)
    np.testing.assert_array_equal(out["logits.w"][:, 1:1001],
                                  sd["fc.weight"].numpy().T)
    np.testing.assert_array_equal(out["logits.b"][1:1001],
                                  sd["fc.bias"].numpy())


def test_inception_full_statedict_loads_into_model(tmp_path):
    """A complete fake torchvision dump (every module our InceptionV3
    enumerates, with gammas) converts into an npz the model actually loads
    in 'pretrained' mode and runs — catching any key-name drift between
    converter output and models/inception.py's expectations."""
    from inclusivegan_tpu.models.inception import InceptionV3

    conv = _load_script("convert_inception_weights")
    probe = InceptionV3(weights_path=None)  # for the conv inventory
    rng = np.random.RandomState(3)
    sd = {}
    for name, cin, cout, k, _s, _p in probe._conv_names():
        sd.update(_fake_bn_module(rng, name, cin, cout, k, tame=True))
    import torch
    sd["fc.weight"] = torch.tensor(
        rng.normal(0, 0.05, (1000, 2048)).astype(np.float32))
    sd["fc.bias"] = torch.zeros(1000)

    out = conv.convert(sd)
    npz = tmp_path / "inception.npz"
    np.savez(npz, **out)

    net = InceptionV3(weights_path=str(npz))
    assert net.mode == "pretrained"
    assert sorted(net.params) == sorted(probe.params), \
        "converter key set drifted from the model's"
    for k in net.params:
        assert net.params[k].shape == probe.params[k].shape, k
    imgs = rng.randint(0, 256, (2, 3, 64, 64)).astype(np.uint8)
    feats = net(imgs)
    assert feats.shape == (2, 2048) and np.all(np.isfinite(feats))


# ---------------------------------------------------------------------------
# LPIPS converter
# ---------------------------------------------------------------------------

def test_lpips_converter_layout_and_model_load(tmp_path):
    """Fake torchvision vgg16 features + richzhang lin heads → our npz →
    lpips model loads it and computes; HWIO transpose checked numerically
    against torch's conv."""
    import torch
    import torch.nn.functional as F
    from inclusivegan_tpu.models.lpips import (
        load_lpips_params, lpips_distance, _VGG_LAYOUT)

    conv = _load_script("convert_lpips_weights")
    rng = np.random.RandomState(4)
    cin = 3
    vgg_sd = {}
    channels = {}
    for name, idx in conv._TORCH_FEATURE_IDX.items():
        cout = {"1": 8, "2": 12, "3": 16, "4": 16, "5": 16}[name[4]]
        vgg_sd[f"features.{idx}.weight"] = torch.tensor(
            rng.normal(0, 0.05, (cout, cin, 3, 3)).astype(np.float32))
        vgg_sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.05, (cout,)).astype(np.float32))
        channels[name] = cout
        cin = cout
    lp_sd = {}
    for i, tap in enumerate(conv._TAPS):
        lp_sd[f"lin{i}.model.1.weight"] = torch.tensor(
            rng.uniform(0, 1, (1, channels[tap], 1, 1)).astype(np.float32))

    out = conv.convert(vgg_sd, lp_sd)
    # HWIO transpose: torch conv == jax conv on the exported weight
    x = rng.normal(0, 1, (1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        y_t = F.conv2d(torch.tensor(x), vgg_sd["features.0.weight"],
                       vgg_sd["features.0.bias"], padding=1).numpy()
    w = jnp.transpose(jnp.asarray(out["conv1_1_w"]), (3, 2, 0, 1))
    y_j = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y_j = y_j + out["conv1_1_b"][None, :, None, None]
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5)

    for i, tap in enumerate(conv._TAPS):
        np.testing.assert_array_equal(
            out[f"lin_{tap}"],
            lp_sd[f"lin{i}.model.1.weight"].numpy().reshape(-1))

    # fallback heads when no LPIPS pth is given: uniform 1/C
    out_nolin = conv.convert(vgg_sd)
    for tap in conv._TAPS:
        c = channels[tap]
        np.testing.assert_allclose(out_nolin[f"lin_{tap}"],
                                   np.full((c,), 1.0 / c, np.float32))

    # NOTE: the real model pins VGG16's channel widths (_VGG_LAYOUT), so a
    # full load test needs full-width weights — too heavy for unit tests.
    # Instead assert the key sets line up exactly.
    npz = tmp_path / "lpips.npz"
    np.savez(npz, **out)
    data = np.load(npz)
    expected_names = {f"{n}_{s}" for n, _c, _p in _VGG_LAYOUT
                      for s in ("w", "b")}
    expected_names |= {f"lin_{t}" for t in conv._TAPS}
    assert set(data.keys()) == expected_names


# ---------------------------------------------------------------------------
# published-pkl layout fixture (VERDICT r2 item 7)
# ---------------------------------------------------------------------------

def _reference_pkl_inventory_128():
    """Transcription of the reference's full variable inventory for a
    config-e-Gskip-Dresnet network at 128 px, label_size 0 — the layout of
    the fork's published pretrained pkls — written down INDEPENDENTLY from
    our model code, straight from the reference source:

      * fmap ramp: nf(stage) = min(8192 // 2**stage, 512)
        (get_weight/nf, networks_stylegan2.py:157-159 with the config-e
        fmap_base=8<<10 halving, run_training.py:54-69)
      * G_main: 'lod' + 'dlatent_avg' (:194-195)
      * G_mapping: 8 dense layers 'Dense%d/{weight,bias}' (:293)
      * G_synthesis: 'noise%d' 0..10 at 2**((i+5)//2) px (:342-346),
        '4x4/Const/const' (:382-383), modulated conv vars
        {weight, mod_weight, mod_bias, noise_strength, bias} (:89-127,
        :352-359), blocks 'Conv0_up'/'Conv1'/'ToRGB' per res (:362-375),
        skip-arch ToRGB at every res (:375-398)
      * D (resnet): FromRGB at top res only (:439,469), per-res
        'Conv0'/'Conv1_down' (+bias) and bias-free 'Skip' (:444-450),
        mbstd +1 channel into '4x4/Conv' (:483-487), '4x4/Dense0',
        'Output' head of width max(label_size,1)=1 (:488-501); no lod var

    Returns {var_name: shape} per net role.
    """
    NF = {s: min(8192 // (1 << s), 512) for s in range(1, 8)}
    Z = 512
    g = {"lod": (), "dlatent_avg": (Z,)}
    for i in range(8):
        g[f"G_mapping/Dense{i}/weight"] = (Z, Z)
        g[f"G_mapping/Dense{i}/bias"] = (Z,)
    for i in range(11):                      # num_layers-1 = 2*7-2-1
        r = 2 ** ((i + 5) // 2)
        g[f"G_synthesis/noise{i}"] = (1, 1, r, r)
    g["G_synthesis/4x4/Const/const"] = (1, NF[1], 4, 4)

    def modconv(scope, cin, cout, k):
        g[f"{scope}/weight"] = (k, k, cin, cout)
        g[f"{scope}/mod_weight"] = (Z, cin)
        g[f"{scope}/mod_bias"] = (cin,)
        g[f"{scope}/noise_strength"] = ()
        g[f"{scope}/bias"] = (cout,)

    def torgb(scope, cin):
        g[f"{scope}/weight"] = (1, 1, cin, 3)
        g[f"{scope}/mod_weight"] = (Z, cin)
        g[f"{scope}/mod_bias"] = (cin,)
        g[f"{scope}/bias"] = (3,)

    modconv("G_synthesis/4x4/Conv", NF[1], NF[1], 3)
    torgb("G_synthesis/4x4/ToRGB", NF[1])
    for res in range(3, 8):
        s = f"G_synthesis/{2**res}x{2**res}"
        modconv(f"{s}/Conv0_up", NF[res - 2], NF[res - 1], 3)
        modconv(f"{s}/Conv1", NF[res - 1], NF[res - 1], 3)
        torgb(f"{s}/ToRGB", NF[res - 1])

    d = {}
    d["128x128/FromRGB/weight"] = (1, 1, 3, NF[6])
    d["128x128/FromRGB/bias"] = (NF[6],)
    for res in range(7, 2, -1):
        s = f"{2**res}x{2**res}"
        d[f"{s}/Conv0/weight"] = (3, 3, NF[res - 1], NF[res - 1])
        d[f"{s}/Conv0/bias"] = (NF[res - 1],)
        d[f"{s}/Conv1_down/weight"] = (3, 3, NF[res - 1], NF[res - 2])
        d[f"{s}/Conv1_down/bias"] = (NF[res - 2],)
        d[f"{s}/Skip/weight"] = (1, 1, NF[res - 1], NF[res - 2])
    d["4x4/Conv/weight"] = (3, 3, NF[1] + 1, NF[1])
    d["4x4/Conv/bias"] = (NF[1],)
    d["4x4/Dense0/weight"] = (4 * 4 * NF[1], min(8192, 512))
    d["4x4/Dense0/bias"] = (min(8192, 512),)
    d["Output/weight"] = (min(8192, 512), 1)
    d["Output/bias"] = (1,)
    return g, d


def test_converter_maps_every_published_pkl_var(tmp_path):
    """convert_reference_pkl on a fixture with the REAL published-pkl
    variable layout (names + shapes at production 128px scale) maps every
    variable onto the TPU param tree: the converted tree's flattened
    name:shape inventory equals our model init's exactly, and the only
    fixture vars not represented are the documented drops (the vestigial
    progressive-growing 'lod' scalar — config-e runs fixed lod 0,
    PARITY.md)."""
    conv = _load_script("convert_reference_pkl")
    from inclusivegan_tpu.models import Discriminator, GMain

    g_inv, d_inv = _reference_pkl_inventory_128()
    rng = np.random.RandomState(0)
    data = {}
    for net in ("G", "Gs"):
        for name, shape in g_inv.items():
            data[f"{net}/{name}"] = rng.normal(
                0, 0.1, shape).astype(np.float32)
    for name, shape in d_inv.items():
        data[f"D/{name}"] = rng.normal(0, 0.1, shape).astype(np.float32)
    npz = tmp_path / "vars.npz"
    np.savez(npz, **data)

    out = tmp_path / "converted.pkl"
    conv.convert(str(npz), str(out), resolution=128, num_channels=3,
                 latent_size=512, fmap_base=8 << 10, g_arch="skip",
                 d_arch="resnet")
    with open(out, "rb") as f:
        snap = pickle.load(f)

    G = GMain.create(resolution=128, num_channels=3, latent_size=512,
                     dlatent_size=512, fmap_base=8 << 10,
                     architecture="skip")
    D = Discriminator(resolution=128, num_channels=3, fmap_base=8 << 10,
                      architecture="resnet")
    # shapes only (eval_shape: no 128px init work on CPU)
    def _shapes(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(_shapes(v, path))
            else:
                out[path] = tuple(v.shape)
        return out

    ours_g = _shapes(jax.eval_shape(G.init, jax.random.key(0)))
    ours_d = _shapes(jax.eval_shape(D.init, jax.random.key(0)))

    for role in ("G", "Gs"):
        got = {k: tuple(np.asarray(v).shape)
               for k, v in _flatten(snap[role]["params"]).items()}
        assert got == ours_g, (
            role,
            sorted(set(got) ^ set(ours_g)),
            {k: (got.get(k), ours_g.get(k))
             for k in got if k in ours_g and got[k] != ours_g[k]})
    got_d = {k: tuple(np.asarray(v).shape)
             for k, v in _flatten(snap["D"]["params"]).items()}
    assert got_d == ours_d, (sorted(set(got_d) ^ set(ours_d)))

    # reverse completeness: every fixture var is represented in the tree
    # except the documented drops
    for net, role in (("G", "G"), ("Gs", "Gs")):
        flat = set(_flatten(snap[role]["params"]))
        consumed = set()
        for name in g_inv:
            if name == "lod":
                continue  # documented drop
            if name == "dlatent_avg":
                tree_name = "dlatent_avg"
            elif name.startswith("G_mapping/"):
                tree_name = "mapping/" + name[len("G_mapping/"):]
            elif name.startswith("G_synthesis/noise"):
                tree_name = "noise/" + name[len("G_synthesis/"):]
            else:
                tree_name = "synthesis/" + name[len("G_synthesis/"):]
            assert tree_name in flat, (net, name, tree_name)
            consumed.add(tree_name)
        assert consumed == flat, sorted(consumed ^ flat)
    flat_d = set(_flatten(snap["D"]["params"]))
    assert flat_d == set(d_inv), sorted(flat_d ^ set(d_inv))
