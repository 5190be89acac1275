"""IMLE orchestration host-logic tests: rebuild boundaries with staleness
doubling, 1-NN retrieval alignment with the rec-dataset cursor, distance
filtering and exclusive-code mode (reference training_loop.py:325-464)."""

import numpy as np
import pytest

from inclusivegan_tpu.data.dataset import SyntheticDataset
from inclusivegan_tpu.training.imle import IMLEOrchestrator, func_proj_dim

DATA = 32
ZDIM = 8
RES = 8


class _LinearG:
    """Deterministic 'generator': image = W z reshaped — so the 1-NN of an
    image made from latent z is recoverable."""

    def __init__(self, seed=0):
        self.W = np.random.RandomState(seed).randn(3 * RES * RES, ZDIM) * 0.3

    def __call__(self, latents):
        flat = latents @ self.W.T
        return np.tanh(flat).reshape(-1, 3, RES, RES).astype(np.float32)


class _GeneratedDataset:
    """Dataset whose reals ARE generator outputs of known latents."""

    def __init__(self, g, latents):
        imgs = g(latents)  # [-1,1]
        self._images = ((imgs + 1) * 127.5).astype(np.uint8)
        self._np_labels = np.zeros((len(latents), 0), np.float32)
        self.shape = list(self._images.shape[1:])
        self.dynamic_range = [0, 255]
        self.label_size = 0
        self.num_images = len(latents)
        self._cursor = 0

    def get_all_images(self):
        return self._images

    def get_minibatch_np(self, n):
        idx = (np.arange(n) + self._cursor) % self.num_images
        self._cursor += n
        return self._images[idx], self._np_labels[idx]


def _orch(**kw):
    defaults = dict(data_size=DATA, num_samples_factor=4, latent_size=ZDIM,
                    image_dim=3 * RES * RES, init_staleness=10,
                    knn_perturb_factor=0.0, candidate_batch_size=16,
                    num_comp_indices=2, num_simp_indices=6, num_levels=1,
                    seed=0)
    defaults.update(kw)
    return IMLEOrchestrator(**defaults)


def test_func_proj_dim():
    assert func_proj_dim(None, 100, 10, 3072) == 3072
    assert func_proj_dim(64, 100, 10, 3072) == 64
    jl = func_proj_dim(0, 1000, 10, 3072)
    assert 1000 < jl < 20000  # JL estimate at eps=0.1


def test_rebuild_retrieves_true_nn():
    orch = _orch()
    g = _LinearG()
    # reals are images of the FIRST data_size candidate latents → their own
    # latent is the exact 1-NN candidate
    true_latents = orch.latent_candidates[:DATA]
    ds = _GeneratedDataset(g, true_latents)
    orch.rebuild(g, ds, verbose=False)
    match = (orch.selected_latents == true_latents).all(axis=1).mean()
    assert match >= 0.9, match
    # residual distance is the uint8 quantization floor of the reals
    assert np.median(orch.selected_dists) < 0.2


def test_staleness_doubling_and_boundary():
    orch = _orch()
    g = _LinearG()
    ds = _GeneratedDataset(g, orch.latent_candidates[:DATA])
    assert orch.needs_rebuild(0, 8)
    orch.rebuild(g, ds, verbose=False)
    assert orch.staleness == 10
    period = DATA * 10
    assert not orch.needs_rebuild(8, 8)
    # regression: cur_nimg < nimg_per_iter must NOT re-trigger (negative
    # floor division used to make iteration 2 rebuild again, double-
    # advancing the staleness schedule)
    assert not orch.needs_rebuild(8, 16)
    assert not orch.needs_rebuild(4, 64)
    assert orch.needs_rebuild(period, 8)  # crossing the boundary
    orch.rebuild(g, ds, verbose=False)
    assert orch.staleness == 20


def test_next_rec_batch_alignment_and_perturb():
    orch = _orch()
    g = _LinearG()
    true_latents = orch.latent_candidates[:DATA]
    ds = _GeneratedDataset(g, true_latents)
    orch.rebuild(g, ds, verbose=False)
    mb = 4
    r1, l1, z1, r2, l2, z2 = orch.next_rec_batch(ds, mb)
    assert r1.shape == (mb, 3, RES, RES) and z1.shape == (mb, ZDIM)
    # perturb factor 0 → latents are exactly (normalized) retrieved ones;
    # verify each returned real/latent pair is consistent: real == G(z·norm)
    for reals, latents in ((r1, z1), (r2, z2)):
        imgs = ((g(latents) + 1) * 127.5).astype(np.uint8)
        # slerp with t=0 normalizes the latent; G here is NOT scale-invariant,
        # so instead check pairing via nearest candidate index mapping
        pass
    # stronger: the multiset of latents equals the first 2*mb selected
    sel = orch.selected_latents[:2 * mb]
    sel_norm = sel / np.linalg.norm(sel, axis=1, keepdims=True)
    got = np.concatenate([z1, z2])
    got_sorted = got[np.lexsort(got.T)]
    exp_sorted = sel_norm[np.lexsort(sel_norm.T)]
    np.testing.assert_allclose(got_sorted, exp_sorted, rtol=1e-4, atol=1e-5)


def test_dist_threshold_filters_rows():
    orch = _orch(dist_thres_percentile=50.0)
    g = _LinearG()
    ds = _GeneratedDataset(g, orch.latent_candidates[:DATA])
    orch.rebuild(g, ds, verbose=False)
    assert np.isfinite(orch.dist_thres)
    mb = 4
    r1, l1, z1, r2, l2, z2 = orch.next_rec_batch(ds, mb)
    assert r1.shape[0] == mb  # filtering still fills the batch by carrying


def test_exclusive_retrieved_code_increases_diversity():
    g = _LinearG()
    # near-duplicate reals: tiny perturbations of one latent → plain 1-NN
    # retrieval collapses to few codes; exclusive mode (first unused of the
    # k=num_samples_factor neighbours, reference :382-396) spreads them out
    base = None
    results = {}
    for exclusive in (False, True):
        orch = _orch(exclusive_retrieved_code=exclusive)
        if base is None:
            base = orch.latent_candidates[:1]
        near = base + np.random.RandomState(1).randn(DATA, ZDIM) * 1e-3
        ds = _GeneratedDataset(g, near.astype(np.float32))
        orch.rebuild(g, ds, verbose=False)
        results[exclusive] = len({tuple(v) for v in orch.selected_latents})
    assert results[True] > results[False], results


def test_tick_rec_batch_tracks_latest_batch():
    """Snapshot grids must show the MOST RECENT rec batch (reference keeps
    tick_*_rec_double from the latest iteration, training_loop.py:512-515),
    not the first batch ever — whose latents predate any training."""
    orch = _orch()
    g = _LinearG()
    ds = _GeneratedDataset(g, orch.latent_candidates[:DATA])
    orch.rebuild(g, ds, verbose=False)
    orch.next_rec_batch(ds, 4)
    first = orch.tick_rec_batch[0].copy()
    orch.next_rec_batch(ds, 4)
    second = orch.tick_rec_batch[0]
    assert not np.array_equal(first, second)


def test_knn_backend_exact_matches_or_beats_dci():
    """The exact on-device backend must retrieve candidates at least as
    close as the approximate Prioritized-DCI backend, and both must agree
    with host brute force on the unambiguous cases."""
    g = _LinearG()
    real_latents = np.random.RandomState(7).randn(DATA, ZDIM)
    ds = _GeneratedDataset(g, real_latents)

    def run(backend):
        orch = _orch(knn_backend=backend)
        orch.rebuild(g, ds, verbose=False)
        return orch.selected_latents.copy(), orch.selected_dists.copy()

    lat_exact, d_exact = run("exact")
    lat_dci, d_dci = run("dci")
    assert lat_exact.shape == lat_dci.shape == (DATA, ZDIM)
    # exact never returns a farther neighbour than the approximation
    assert (d_exact <= d_dci + 1e-4).all()

    # host brute force oracle on the exact backend
    orch = _orch(knn_backend="exact")
    cand_imgs = g(orch.latent_candidates)
    cand_flat = cand_imgs.reshape(len(cand_imgs), -1).astype(np.float64)
    reals_flat = ((ds.get_all_images().astype(np.float64) / 127.5) - 1.0
                  ).reshape(DATA, -1)
    bf_ids = np.argmin(
        ((reals_flat[:, None, :] - cand_flat[None, :, :]) ** 2).sum(-1),
        axis=1)
    orch.rebuild(g, ds, verbose=False)
    np.testing.assert_allclose(orch.selected_latents,
                               orch.latent_candidates[bf_ids], atol=1e-6)


def test_dci_cost_gate_routes_and_warns(monkeypatch, capsys):
    """Cost-based routing of the host-DCI fallback (VERDICT r1 item 7):
    `auto` beyond the HBM budget must fail loudly with guidance instead of
    silently stalling in a multi-minute host build; an explicit `dci`
    request proceeds but prints the projected build time."""
    from inclusivegan_tpu.training import imle as imle_mod

    assert imle_mod.estimate_dci_build_seconds(2_400_000) > \
        imle_mod.estimate_dci_build_seconds(240_000) > 0

    g = _LinearG()
    ds = _GeneratedDataset(g, np.random.RandomState(1).randn(DATA, ZDIM))

    # force the gate on tiny pools: no HBM room for exact, zero time budget
    monkeypatch.setattr(imle_mod, "_EXACT_KNN_HBM_BUDGET", 0)
    monkeypatch.setattr(imle_mod, "_DCI_BUILD_BUDGET_S", 0.0)

    orch = _orch(knn_backend="auto")
    with pytest.raises(RuntimeError, match="knn_backend='dci'"):
        orch.rebuild(g, ds, verbose=False)

    orch = _orch(knn_backend="dci")
    orch.rebuild(g, ds, verbose=False)  # proceeds despite the projection
    assert orch.selected_latents is not None
    assert "projected to take" in capsys.readouterr().out


def test_dci_host_memory_gate(monkeypatch):
    """Un-projected features beyond the host budget must fail fast with
    init_proj_dim guidance — not OOM minutes into candidate generation
    (hit live at the CelebA-128 30k regime: 300k x 49152 f64 = 118 GiB)."""
    from inclusivegan_tpu.training import imle as imle_mod
    monkeypatch.setattr(imle_mod, "_EXACT_KNN_HBM_BUDGET", 0)
    monkeypatch.setattr(imle_mod, "_DCI_HOST_MEM_BUDGET", 0)
    g = _LinearG()
    ds = _GeneratedDataset(g, np.random.RandomState(1).randn(DATA, ZDIM))
    orch = _orch(knn_backend="dci")
    with pytest.raises(RuntimeError, match="init_proj_dim"):
        orch.rebuild(g, ds, verbose=False)


def test_attr_interesting_filters_minority_rows():
    """Minority-inclusion (the paper's headline feature): with
    attr_interesting set, ONLY reals carrying all the interesting
    attributes enter the reconstruction batches (reference
    training_loop.py:416-427), and the batch still fills to minibatch_size
    by carrying across the epoch cursor."""
    g = _LinearG()
    latents = np.random.RandomState(3).randn(DATA, ZDIM).astype(np.float32)
    ds = _GeneratedDataset(g, latents)
    # 4 attrs; rows are minority ("Bald" AND "Young") iff index % 3 == 0
    attr_names = ["Bald", "Male", "Young", "Eyeglasses"]
    labels = np.zeros((DATA, 4), np.float32)
    minority = np.arange(DATA) % 3 == 0
    labels[minority, 0] = 1
    labels[minority, 2] = 1
    labels[~minority, 1] = 1
    ds._np_labels = labels
    ds.label_size = 4

    orch = _orch(attr_interesting="Bald,Young", attr_names=attr_names)
    orch.rebuild(g, ds, verbose=False)
    mb = 4
    seen = 0
    for _ in range(3):
        r1, l1, z1, r2, l2, z2 = orch.next_rec_batch(ds, mb)
        assert r1.shape[0] == mb and r2.shape[0] == mb
        for l in (l1, l2):
            assert (l[:, 0] == 1).all() and (l[:, 2] == 1).all(), l
        seen += 2 * mb
    # the filter must not starve the stream: 3 iterations consumed 24
    # minority rows out of DATA/3 per epoch, so the cursor wrapped — the
    # orchestrator keeps serving (carry + wrap logic, not an assert here)
    assert seen == 24
