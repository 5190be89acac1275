"""IMLE orchestration: DCI rebuild + per-iteration rec-batch assembly.

Capability parity with the host-side choreography in
/root/reference/training/training_loop.py:
  * fixed latent-candidate pool of data_size·num_samples_factor (:325)
  * staleness-doubling rebuild boundary (:354-356)
  * candidate features = G samples, flattened, optionally multiplied by a
    persistent random projector matrix cached to .npy (:205-212, :358-365)
  * 1-NN latent retrieval for every real, in the rec dataset's fixed
    iteration order (:374-404); exclusive-code mode retrieving the first
    unused of k neighbours (:382-396)
  * minority filtering by CelebA attrs or distance percentile, with
    remainder carry across iterations (:409-441)
  * slerp perturbation of retrieved latents (knn_perturb_factor, :447)
  * dual rec batches with independent shuffles for the interp loss (:452-464)

TPU-native redesign (the reference blocks training for minutes here):
  * candidate generation runs as jitted G batches on the TPU;
  * the DCI random projections (n·d·mL GEMM — the construction bottleneck)
    and the optional proj_dim projector are TPU matmuls; the C++ library
    receives precomputed projections and only sorts/walks tables;
  * queries are likewise projected on TPU and answered in one batched
    native call instead of a python loop of minibatch queries.
"""

import functools
import math
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dci import DCI
from ..utils.misc import adjust_dynamic_range, slerp_np

# ---------------------------------------------------------------------------
# Exact device-side kNN (the default retrieval backend).
#
# The reference approximates 1-NN with host-side Prioritized DCI because on
# CPU/GPU-2017 the exact problem was too big. On TPU the exact search IS the
# cheap option: 240k queries x 2.4M candidates x 128-dim features is one
# ~74 TFLOP chunked matmul (~seconds at MXU rates), and keeping the
# candidate features in HBM means only [nq, k] ids+dists ever cross the
# device->host link (the scarce resource on relay-attached hosts — see
# BENCH_NOTES.md). The DCI library remains as the fallback backend for
# feature sets that don't fit the HBM budget and for reference parity.
# ---------------------------------------------------------------------------

_KNN_CAND_CHUNK = 65536     # scores buffer = QUERY_CHUNK x CAND_CHUNK f32
_KNN_QUERY_CHUNK = 8192
_EXACT_KNN_HBM_BUDGET = 4 << 30  # candidate-feature bytes

# Host-DCI construction cost model, fitted by scripts/bench_dci_build.py on
# one core at the production index shape (dim 128, 3x15 tables, 2 levels):
# t = 1.22e-3 * n**0.907 seconds (n = 8k..131k measured, r^2 > 0.99;
# extrapolates to ~12.5 min at the 2.4M-candidate 240k regime). Used to
# route `auto` and to gate an explicit `dci` request with a loud warning
# instead of letting it silently stall training for an unknown time.
_DCI_BUILD_COEF = 1.22e-3
_DCI_BUILD_EXP = 0.907
_DCI_BUILD_BUDGET_S = 900.0
_DCI_HOST_MEM_BUDGET = 32 << 30  # float64 candidate-feature bytes on host


def estimate_dci_build_seconds(n: int) -> float:
    """Projected host-DCI index construction time for an n-point pool."""
    cores = max(os.cpu_count() or 1, 1)
    # the assignment loop is OpenMP-parallel; assume ~70% scaling efficiency
    return _DCI_BUILD_COEF * float(n) ** _DCI_BUILD_EXP / (0.3 + 0.7 * cores)


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_topk(qfeats, cand3, cnorm3, base3, k):
    """Running top-k smallest L2 over candidate chunks.

    qfeats [Q,D] f32; cand3 [S,C,D]; cnorm3 [S,C] squared norms (+inf on
    padding); base3 [S] global index base of each chunk. Returns
    (dists [Q,k] Euclidean, ids [Q,k] int32).
    """

    def step(carry, xs):
        bd, bi = carry
        c, cn, base = xs
        # ||c||^2 - 2 q.c ranks identically to the true squared distance
        scores = cn[None, :] - 2.0 * jnp.dot(
            qfeats, c.T, precision=jax.lax.Precision.HIGHEST)
        if k == 1:
            d = jnp.min(scores, axis=1, keepdims=True)
            i = jnp.argmin(scores, axis=1).astype(jnp.int32)[:, None] + base
        else:
            negd, i = jax.lax.top_k(-scores, k)
            d, i = -negd, i.astype(jnp.int32) + base
        alld = jnp.concatenate([bd, d], axis=1)
        alli = jnp.concatenate([bi, i], axis=1)
        negd, sel = jax.lax.top_k(-alld, k)
        return (-negd, jnp.take_along_axis(alli, sel, axis=1)), None

    q_count = qfeats.shape[0]
    init = (jnp.full((q_count, k), jnp.inf, jnp.float32),
            jnp.zeros((q_count, k), jnp.int32))
    (bd, bi), _ = jax.lax.scan(step, init, (cand3, cnorm3, base3))
    qnorm = jnp.sum(qfeats * qfeats, axis=1, keepdims=True)
    dists = jnp.sqrt(jnp.maximum(bd + qnorm, 0.0))
    return dists, bi


@jax.jit
def _featurize_dev(x, scale, bias, projector):
    """uint8/float images -> drange_net -> flat (@ projector) on device."""
    x = x.astype(jnp.float32) * scale + bias
    flat = x.reshape(x.shape[0], -1)
    if projector is None:
        return flat
    return jnp.dot(flat, projector, precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _flatten_project_dev(img, projector):
    """Images already in drange_net (G output) -> features, on device."""
    flat = img.astype(jnp.float32).reshape(img.shape[0], -1)
    if projector is None:
        return flat
    return jnp.dot(flat, projector, precision=jax.lax.Precision.HIGHEST)


def func_proj_dim(init_proj_dim: Optional[int], data_size: int,
                  num_samples_factor: int, image_dim: int) -> int:
    """Projection dimensionality selection (reference training_loop.py:28-35):
    None → raw image dim; 0 → Johnson–Lindenstrauss estimate (eps=0.1)."""
    if init_proj_dim is None:
        return image_dim
    if init_proj_dim == 0:
        n = data_size * num_samples_factor
        eps = 0.1
        return int(np.ceil(4 * math.log(n) / (eps ** 2 / 2 - eps ** 3 / 3)))
    return int(init_proj_dim)


def load_or_create_projector(image_dim: int, proj_dim: int,
                             cache_dir: str = ".") -> np.ndarray:
    """Persistent random projector matrix, cached to .npy so resumed runs
    retrieve in the same space (reference training_loop.py:205-212)."""
    path = os.path.join(cache_dir,
                        f"random_projector_mat_{image_dim}to{proj_dim}.npy")
    if os.path.isfile(path):
        return np.load(path)
    projector = np.random.normal(
        0.0, 1.0 / float(proj_dim), size=(image_dim, proj_dim)).astype(np.float64)
    np.save(path, projector)
    return projector


class IMLEOrchestrator:
    """Owns the candidate pool, the DCI index, and the rec-batch cursor."""

    def __init__(self, *, data_size: int, num_samples_factor: int,
                 latent_size: int, image_dim: int,
                 init_proj_dim: Optional[int] = None,
                 init_staleness: int = 10,
                 knn_perturb_factor: float = 0.05,
                 candidate_batch_size: int = 256,
                 exclusive_retrieved_code: bool = False,
                 dist_thres_percentile: float = 100.0,
                 attr_interesting: Optional[str] = None,
                 attr_names: Optional[list] = None,
                 num_comp_indices: int = 3, num_simp_indices: int = 15,
                 num_levels: int = 2, seed: int = 0,
                 drange_data=(0, 255), drange_net=(-1, 1),
                 projector_cache_dir: str = ".",
                 knn_backend: str = "auto"):
        self.data_size = data_size
        self.num_samples_factor = num_samples_factor
        self.latent_size = latent_size
        self.image_dim = image_dim
        self.init_proj_dim = init_proj_dim
        self.staleness = init_staleness
        self.knn_perturb_factor = knn_perturb_factor
        self.candidate_batch_size = candidate_batch_size
        self.exclusive_retrieved_code = exclusive_retrieved_code
        self.dist_thres_percentile = dist_thres_percentile
        self.attr_interesting = attr_interesting
        self.attr_names = attr_names
        self.num_levels = num_levels
        self.drange_data = tuple(drange_data)
        self.drange_net = tuple(drange_net)
        assert knn_backend in ("auto", "exact", "dci"), knn_backend
        self.knn_backend = knn_backend

        self.proj_dim = func_proj_dim(init_proj_dim, data_size,
                                      num_samples_factor, image_dim)
        self.projector = None
        if init_proj_dim is not None:
            self.projector = load_or_create_projector(
                image_dim, self.proj_dim, projector_cache_dir)

        # PCG64 standard_normal: legacy RandomState.randn measures ~0.3M
        # values/s on this vCPU class vs ~25M/s here — at 240k×10 pool size
        # that is the difference between ~1 h and ~1 min of startup
        rnd = np.random.Generator(np.random.PCG64(seed))
        self.latent_candidates = rnd.standard_normal(
            (data_size * num_samples_factor, latent_size), dtype=np.float32)
        self.dci = DCI(self.proj_dim, num_comp_indices, num_simp_indices,
                       seed=seed)
        self._proj_vec_dev = None  # DCI directions, device-side [dim, m*L]
        self._projector_dev = None

        self.selected_latents: Optional[np.ndarray] = None
        self.selected_dists: Optional[np.ndarray] = None
        self.dist_thres = np.inf
        self.cursor = 0
        self._remainder = None  # carried (reals, labels, latents)
        self._rng = np.random.Generator(np.random.PCG64(seed + 1))
        self.tick_rec_batch = None  # latest rec batch (snapshot grids)

    # ------------------------------------------------------------------
    def needs_rebuild(self, cur_nimg: int, nimg_per_iter: int) -> bool:
        """Staleness boundary test (reference training_loop.py:354)."""
        if self.selected_latents is None:
            return True
        period = self.data_size * self.staleness
        # clamp: early iterations have cur_nimg < nimg_per_iter, and a
        # negative floor-division (-x // period == -1) would re-trigger a
        # spurious second rebuild right after the initial one
        prev = max(cur_nimg - nimg_per_iter, 0)
        return cur_nimg // period != prev // period

    # ------------------------------------------------------------------
    def _features_from_images(self, images_01: np.ndarray) -> np.ndarray:
        """Flatten [-1,1] images → float64 features (optionally projected).
        The projector matmul runs on the accelerator when available."""
        flat = images_01.reshape(images_01.shape[0], -1)
        if self.projector is None:
            return flat.astype(np.float64)
        if self._projector_dev is None:
            self._projector_dev = jnp.asarray(self.projector, jnp.float32)
        out = jnp.dot(jnp.asarray(flat, jnp.float32), self._projector_dev,
                      preferred_element_type=jnp.float32)
        return np.asarray(out).astype(np.float64)

    def _dci_projections(self, features64: np.ndarray) -> np.ndarray:
        """data @ proj_vec.T as one accelerator matmul (float32 accumulate is
        ample: the projections only steer the priority queues; exact ranking
        happens in float64 on the raw features)."""
        if self._proj_vec_dev is None:
            self._proj_vec_dev = jnp.asarray(self.dci.proj_vec.T, jnp.float32)
        out = jnp.dot(jnp.asarray(features64, jnp.float32),
                      self._proj_vec_dev, preferred_element_type=jnp.float32)
        return np.asarray(out).astype(np.float64)

    # ------------------------------------------------------------------
    def rebuild(self, generate_images: Callable[[np.ndarray], np.ndarray],
                rec_dataset, verbose: bool = True,
                generate_features: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                ) -> None:
        """Regenerate candidate features with the current G, rebuild the DCI
        index, and retrieve the 1-NN latent for every real image.

        generate_images: latents [B,Z] → images [B,C,H,W] in drange_net
        (jitted G.apply batches on the TPU).
        generate_features (preferred): latents [B,Z] → features
        [B, proj_dim] with the flatten+projector matmul fused into the
        jitted G batch — only proj_dim floats per candidate cross the
        device→host link instead of a full image (the link is the scarce
        resource on relay-attached TPUs; see BENCH_NOTES.md).
        """
        if self.selected_latents is not None:
            self.staleness *= 2  # doubling (reference :354-356)

        n = self.data_size * self.num_samples_factor
        use_exact = (self.knn_backend == "exact"
                     or (self.knn_backend == "auto"
                         and n * self.proj_dim * 4 <= _EXACT_KNN_HBM_BUDGET))
        if use_exact:
            self._rebuild_exact(generate_images, rec_dataset, verbose,
                                generate_features)
            return

        # Host-DCI path: route by projected construction cost AND host
        # feature memory, not hope. The DCI interface is float64
        # (reference dci.py:116-127), so raw un-projected CelebA-128
        # features would be n x 49152 x 8 B — 118 GB at the 30k regime,
        # an instant OOM that the 2026-08-19 quality-loop launch hit live.
        host_bytes = n * self.proj_dim * 8
        if host_bytes > _DCI_HOST_MEM_BUDGET:
            raise RuntimeError(
                f"host-DCI candidate features ({n:,} x {self.proj_dim} "
                f"f64 = {host_bytes / 2**30:.0f} GiB) exceed the "
                f"{_DCI_HOST_MEM_BUDGET >> 30} GiB host budget. Set "
                f"init_proj_dim (e.g. 512, or 0 for the "
                f"Johnson-Lindenstrauss estimate) so the features are "
                f"projected before retrieval — the reference requires "
                f"this at CelebA scale too (training_loop.py:28-35).")
        est = estimate_dci_build_seconds(n)
        if est > _DCI_BUILD_BUDGET_S:
            if self.knn_backend == "dci":
                print(f"WARNING: host-DCI index build for {n:,} candidates "
                      f"is projected to take ~{est / 60:.0f} min on this "
                      f"host (fitted model, scripts/bench_dci_build.py); "
                      f"training stalls for the duration. Reduce "
                      f"init_proj_dim so the exact device backend fits its "
                      f"{_EXACT_KNN_HBM_BUDGET >> 30} GiB HBM budget if "
                      f"that is unacceptable.", flush=True)
            else:  # auto, and exact does not fit HBM either
                raise RuntimeError(
                    f"knn_backend='auto': candidate features "
                    f"({n:,} x {self.proj_dim} f32 = "
                    f"{n * self.proj_dim * 4 / 2**30:.1f} GiB) exceed the "
                    f"{_EXACT_KNN_HBM_BUDGET >> 30} GiB exact-backend HBM "
                    f"budget, and the host-DCI fallback is projected at "
                    f"~{est / 60:.0f} min per rebuild on this host. Either "
                    f"reduce init_proj_dim (smaller features -> exact fits) "
                    f"or set knn_backend='dci' explicitly to accept the "
                    f"host build time.")

        feats = np.empty((n, self.proj_dim), np.float64)
        bs = self.candidate_batch_size

        def _consume(i, out):
            if generate_features is not None:
                feats[i:i + bs] = np.asarray(out).astype(np.float64)
            else:
                feats[i:i + bs] = self._features_from_images(np.asarray(out))

        # one-deep pipeline: dispatch batch i+1 before fetching batch i, so
        # the device→host copy (and host featurization in the fallback path)
        # overlaps the next batch's G forward — jax dispatch is async
        pend = None
        for i in range(0, n, bs):
            if verbose and (i // bs) % 16 == 0:
                print(f"\rCandidates sampling {i}/{n}...", end="", flush=True)
            z = self.latent_candidates[i:i + bs]
            out = (generate_features(z) if generate_features is not None
                   else generate_images(z))
            if pend is not None:
                _consume(*pend)
            pend = (i, out)
        if pend is not None:
            _consume(*pend)
        if verbose:
            print("\rDCI constructing...                    ")

        self.dci.reset(seed=int(self._rng.integers(2 ** 31)))
        self._proj_vec_dev = None
        proj = self._dci_projections(feats)
        self.dci.add(feats, num_levels=self.num_levels, projections=proj)

        # query every real in the rec dataset's fixed epoch order
        reals = rec_dataset.get_all_images()[:self.data_size]
        reals_net = adjust_dynamic_range(
            reals.astype(np.float32), list(self.drange_data),
            list(self.drange_net))
        qfeats = self._features_from_images(reals_net)
        qproj = self._dci_projections(qfeats)

        if self.exclusive_retrieved_code:
            k = self.num_samples_factor
            ids, dists = self.dci.query(qfeats, num_neighbours=k,
                                        field_of_view=200,
                                        max_retrieve=max(1024, 32 * k),
                                        projections=qproj)
            used = set()
            sel_ids, sel_dists = [], []
            for row_ids, row_dists in zip(ids, dists):
                pick = 0
                for j, cand in enumerate(row_ids):
                    if cand not in used:
                        pick = j
                        break
                used.add(row_ids[pick])
                sel_ids.append(row_ids[pick])
                sel_dists.append(row_dists[pick])
            nearest_ids = np.array(sel_ids)
            nearest_dists = np.array(sel_dists)
        else:
            ids, dists = self.dci.query(qfeats, num_neighbours=1,
                                        field_of_view=200,
                                        projections=qproj)
            nearest_ids = np.array([i[0] for i in ids])
            nearest_dists = np.array([d[0] for d in dists])

        self.selected_latents = self.latent_candidates[nearest_ids]
        self.selected_dists = nearest_dists
        self.dist_thres = np.percentile(nearest_dists,
                                        self.dist_thres_percentile)
        if verbose:
            print(f"DCI retrieval done: mean 1-NN dist "
                  f"{nearest_dists.mean():.4f}, staleness now "
                  f"{self.staleness}")

    # ------------------------------------------------------------------
    def _rebuild_exact(self, generate_images, rec_dataset, verbose,
                       generate_features):
        """Exact retrieval, entirely on device (see module header): candidate
        features stay in HBM, 1-NN (or top-k for exclusive mode) is a chunked
        matmul + running-min scan, and only [nq, k] ids/dists are fetched."""
        n = self.data_size * self.num_samples_factor
        bs = self.candidate_batch_size
        projector_dev = (jnp.asarray(self.projector, jnp.float32)
                         if self.projector is not None else None)

        # two-level grouped concat keeps every concatenate ≤64 operands
        # (a single 1000+-operand op would bloat the XLA graph)
        groups, pending = [], []

        def _flush():
            if pending:
                groups.append(pending[0] if len(pending) == 1
                              else jnp.concatenate(pending, axis=0))
                pending.clear()

        for i in range(0, n, bs):
            if verbose and (i // bs) % 16 == 0:
                print(f"\rCandidates sampling {i}/{n}...", end="", flush=True)
            z = self.latent_candidates[i:i + bs]
            if generate_features is not None:
                pending.append(generate_features(z))
            else:
                pending.append(_flatten_project_dev(generate_images(z),
                                                    projector_dev))
            if len(pending) == 64:
                _flush()
        _flush()
        cand = (groups[0] if len(groups) == 1
                else jnp.concatenate(groups, axis=0))
        cand = cand[:n].astype(jnp.float32)
        del groups
        if verbose:
            print("\rExact kNN (device)...                  ")

        # pad candidates into [S, CAND_CHUNK, D] chunks; +inf norms mask pads
        cc = min(_KNN_CAND_CHUNK, n)
        s = (n + cc - 1) // cc
        pad = s * cc - n
        cnorm = jnp.sum(cand * cand, axis=1)
        if pad:
            cand = jnp.concatenate(
                [cand, jnp.zeros((pad, cand.shape[1]), jnp.float32)])
            cnorm = jnp.concatenate([cnorm, jnp.full((pad,), jnp.inf)])
        cand3 = cand.reshape(s, cc, cand.shape[1])
        cnorm3 = cnorm.reshape(s, cc)
        base3 = jnp.arange(s, dtype=jnp.int32) * cc

        reals = rec_dataset.get_all_images()[:self.data_size]
        nq = reals.shape[0]
        k = (self.num_samples_factor if self.exclusive_retrieved_code else 1)
        scale = np.float32(
            (self.drange_net[1] - self.drange_net[0])
            / (self.drange_data[1] - self.drange_data[0]))
        bias = np.float32(self.drange_net[0] - self.drange_data[0] * scale)

        qc = _KNN_QUERY_CHUNK
        ids = np.empty((nq, k), np.int64)
        dists = np.empty((nq, k), np.float64)
        for j in range(0, nq, qc):
            r = reals[j:j + qc]
            if r.shape[0] < qc:  # pad to the jitted shape
                padq = np.zeros((qc - r.shape[0],) + r.shape[1:], r.dtype)
                r = np.concatenate([r, padq])
            qf = _featurize_dev(jnp.asarray(r), scale, bias, projector_dev)
            d, i = _knn_topk(qf, cand3, cnorm3, base3, k)
            take = min(qc, nq - j)
            ids[j:j + take] = np.asarray(i[:take], np.int64)
            dists[j:j + take] = np.asarray(d[:take], np.float64)

        if self.exclusive_retrieved_code:
            used = set()
            sel_ids, sel_dists = [], []
            for row_ids, row_dists in zip(ids, dists):
                pick = 0
                for jj, cand_id in enumerate(row_ids):
                    if cand_id not in used:
                        pick = jj
                        break
                used.add(row_ids[pick])
                sel_ids.append(row_ids[pick])
                sel_dists.append(row_dists[pick])
            nearest_ids = np.array(sel_ids)
            nearest_dists = np.array(sel_dists)
        else:
            nearest_ids = ids[:, 0]
            nearest_dists = dists[:, 0]

        self.selected_latents = self.latent_candidates[nearest_ids]
        self.selected_dists = nearest_dists
        self.dist_thres = np.percentile(nearest_dists,
                                        self.dist_thres_percentile)
        if verbose:
            print(f"Exact retrieval done: mean 1-NN dist "
                  f"{nearest_dists.mean():.4f}, staleness now "
                  f"{self.staleness}")

    # ------------------------------------------------------------------
    def _row_filter(self, labels: np.ndarray, dists: np.ndarray) -> np.ndarray:
        """Minority-attr or distance-percentile row selection
        (reference :416-427)."""
        if self.attr_interesting is None:
            return dists <= self.dist_thres
        active = np.ones(labels.shape[0], bool)
        for attr in self.attr_interesting.split(","):
            idx = self.attr_names.index(attr)
            active &= labels[:, idx] == 1
        return active

    def next_rec_batch(self, rec_dataset, minibatch_size: int
                       ) -> Tuple[np.ndarray, ...]:
        """Assemble the two rec minibatches for one training iteration.

        Returns (reals_1, labels_1, latents_1, reals_2, labels_2, latents_2)
        with reals in the dataset's raw drange (uint8) — conversion happens
        on device in the train step."""
        assert self.selected_latents is not None, "rebuild() first"
        double = minibatch_size * 2
        reals = labels = latents = None
        if self._remainder is not None and self.cursor % self.data_size != 0:
            reals, labels, latents = self._remainder
            self._remainder = None
        at_epoch_start = self.cursor % self.data_size == 0
        while reals is None or reals.shape[0] < double:
            r, l = rec_dataset.get_minibatch_np(double)
            z = self.selected_latents[
                (self.cursor % self.data_size):
                (self.cursor % self.data_size) + double]
            d = self.selected_dists[
                (self.cursor % self.data_size):
                (self.cursor % self.data_size) + double]
            keep = self._row_filter(l, d)
            r, l, z = r[keep], l[keep], z[keep]
            if reals is None or at_epoch_start:
                reals, labels, latents = r, l, z
                at_epoch_start = False
            else:
                reals = np.concatenate([reals, r])
                labels = np.concatenate([labels, l])
                latents = np.concatenate([latents, z])
            self.cursor += double
        if reals.shape[0] > double:
            self._remainder = (reals[double:], labels[double:], latents[double:])
            reals, labels, latents = (reals[:double], labels[:double],
                                      latents[:double])
        else:
            self._remainder = None

        # slerp-perturb retrieved latents (reference :447)
        latents = slerp_np(
            latents,
            self._rng.standard_normal(latents.shape, dtype=np.float32),
            self.knn_perturb_factor)

        # latest rec batch, rendered at image-snapshot ticks (the reference
        # keeps tick_{reals,latents}_rec_double from the most recent
        # iteration, training_loop.py:512-515 — NOT the first batch ever,
        # whose latents come from the untrained-G retrieval)
        self.tick_rec_batch = (reals.copy(), labels.copy(), latents.copy())

        # independent shuffles decouple the rec pairs for the interp loss
        order = np.arange(minibatch_size)
        self._rng.shuffle(order)
        r1, l1, z1 = (reals[:minibatch_size][order],
                      labels[:minibatch_size][order],
                      latents[:minibatch_size][order])
        self._rng.shuffle(order)
        r2, l2, z2 = (reals[minibatch_size:][order],
                      labels[minibatch_size:][order],
                      latents[minibatch_size:][order])
        return r1, l1, z1, r2, l2, z2
