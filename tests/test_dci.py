"""DCI library tests vs brute-force kNN — the reference's example programs
used synthetic low-intrinsic-dimension data as the smoke fixture
(/root/reference/dci_code/example.py:36-40); we turn that into recall
assertions (SURVEY.md §4 item 2)."""

import numpy as np
import pytest

from inclusivegan_tpu.dci import DCI


def _low_intrinsic_data(n, ambient_dim, intrinsic_dim, seed=0, basis_seed=1234):
    """Points on one shared low-dimensional subspace (data and queries must
    share the basis or the intrinsic-dimension structure disappears)."""
    basis = np.random.RandomState(basis_seed).randn(intrinsic_dim, ambient_dim)
    coords = np.random.RandomState(seed).randn(n, intrinsic_dim)
    return (coords @ basis).astype(np.float64)


def _brute_1nn(data, queries):
    d2 = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1), np.sqrt(d2.min(1))


def test_exact_on_small_set():
    data = _low_intrinsic_data(200, 32, 4)
    queries = _low_intrinsic_data(20, 32, 4, seed=1)
    dci = DCI(32, num_comp_indices=2, num_simp_indices=7)
    dci.add(data, num_levels=1)
    ids, dists = dci.query(queries, num_neighbours=1, prop_to_retrieve=1.0,
                           max_retrieve=200, max_visits=100000)
    bf_ids, bf_dists = _brute_1nn(data, queries)
    got = np.array([i[0] for i in ids])
    np.testing.assert_array_equal(got, bf_ids)
    np.testing.assert_allclose([d[0] for d in dists], bf_dists, rtol=1e-9)


@pytest.mark.parametrize("num_levels", [1, 2, 3])
def test_recall_low_intrinsic_dim(num_levels):
    n = 5000
    data = _low_intrinsic_data(n, 64, 6)
    queries = _low_intrinsic_data(200, 64, 6, seed=2)
    dci = DCI(64, num_comp_indices=3, num_simp_indices=10)
    dci.add(data, num_levels=num_levels)
    ids, _ = dci.query(queries, num_neighbours=1, field_of_view=16,
                       max_retrieve=300, max_visits=20000)
    bf_ids, _ = _brute_1nn(data, queries)
    got = np.array([i[0] if i else -1 for i in ids])
    recall = float((got == bf_ids).mean())
    assert recall >= 0.9, f"1-NN recall {recall} at num_levels={num_levels}"


def test_knn_ordering_and_counts():
    data = _low_intrinsic_data(1000, 16, 3)
    queries = data[:5] + 1e-3  # near-duplicates of known points
    dci = DCI(16)
    dci.add(data, num_levels=1)
    ids, dists = dci.query(queries, num_neighbours=5, max_retrieve=500,
                           max_visits=50000)
    for i in range(5):
        assert len(ids[i]) == 5
        assert ids[i][0] == i  # nearest is the seed point itself
        assert all(dists[i][j] <= dists[i][j + 1] for j in range(4))
        assert len(set(ids[i])) == 5  # no duplicate neighbours


def test_external_projections_match_internal():
    data = _low_intrinsic_data(800, 24, 4)
    queries = _low_intrinsic_data(50, 24, 4, seed=3)
    a = DCI(24, seed=42)
    a.add(data, num_levels=1)
    # feed the same projections explicitly (simulating the TPU matmul path)
    b = DCI(24, seed=42)
    proj = data @ b.proj_vec.T
    qproj = queries @ b.proj_vec.T
    b.add(data, num_levels=1, projections=proj)
    ids_a, d_a = a.query(queries, num_neighbours=1, max_retrieve=200)
    ids_b, d_b = b.query(queries, num_neighbours=1, max_retrieve=200,
                         projections=qproj)
    assert [i[0] for i in ids_a] == [i[0] for i in ids_b]
    np.testing.assert_allclose([d[0] for d in d_a], [d[0] for d in d_b],
                               rtol=1e-9)


def test_reset_and_readd():
    data = _low_intrinsic_data(100, 8, 2)
    dci = DCI(8)
    dci.add(data, num_levels=1)
    assert dci.num_points == 100
    pv1 = dci.proj_vec.copy()
    dci.reset(seed=99)
    assert dci.num_points == 0
    pv2 = dci.proj_vec
    assert np.abs(pv1 - pv2).max() > 1e-6  # directions re-drawn
    dci.add(data[:50], num_levels=2)
    assert dci.num_points == 50
    ids, _ = dci.query(data[:3], num_neighbours=1)
    assert [i[0] for i in ids] == [0, 1, 2]


def test_proj_vec_unit_norm():
    dci = DCI(32, num_comp_indices=2, num_simp_indices=5)
    pv = dci.proj_vec
    assert pv.shape == (10, 32)
    np.testing.assert_allclose(np.linalg.norm(pv, axis=1), 1.0, rtol=1e-9)


def test_jax_op_nn_search_in_jit():
    """DciNnSearch (the reference tf_dci.cc CPU-op equivalent,
    dci/jax_op.py): persistent locked index callable from inside a jitted
    function via pure_callback, exact 1-NN on low-intrinsic-dim data."""
    import jax
    import jax.numpy as jnp

    from inclusivegan_tpu.dci.jax_op import DciNnSearch

    data = _low_intrinsic_data(200, 16, 3)
    queries = _low_intrinsic_data(17, 16, 3, seed=7)
    op = DciNnSearch(16, num_comp_indices=2, num_simp_indices=7,
                     num_levels=1)
    op.update_db(data)

    @jax.jit
    def go(q):
        ids, dists = op.nn_search(q, num_neighbours=1, max_retrieve=200)
        return ids[:, 0], dists[:, 0]

    ids, dists = go(jnp.asarray(queries, jnp.float32))
    want_ids, want_d = _brute_1nn(data, queries)
    np.testing.assert_array_equal(np.asarray(ids), want_ids)
    np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-4)

    # update_db rebuilds the persistent index (reference tf_dci.cc:72-93)
    op.update_db(data[:50])
    ids2, _ = go(jnp.asarray(data[:3], jnp.float32))
    np.testing.assert_array_equal(np.asarray(ids2), [0, 1, 2])
