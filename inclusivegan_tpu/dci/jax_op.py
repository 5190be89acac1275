"""In-graph DCI kNN lookup via ``jax.pure_callback``.

Capability parity with the reference's TF CPU op ``DciNnSearch``
(/root/reference/dci_code/src/tf_dci.cc:16-197): a persistent DCI database
that jitted code can query as an op, with an update path that rebuilds the
index. The reference guards the database with reader/writer mutexes
(:72-93); here the same role is played by a host-side RLock inside the
callback. Like the reference op (unused by the training path,
training_loop.py:23 uses the python binding), this exists for API
completeness — the IMLE loop calls the library directly from the host."""

import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dci import DCI


class DciNnSearch:
    def __init__(self, dim: int, num_comp_indices: int = 2,
                 num_simp_indices: int = 7, num_levels: int = 2,
                 seed: int = 0):
        self._dci = DCI(dim, num_comp_indices, num_simp_indices, seed=seed)
        self._dim = dim
        self._num_levels = num_levels
        self._lock = threading.RLock()

    def update_db(self, data: np.ndarray) -> None:
        """Rebuild the persistent index (reference tf_dci.cc update_db input)."""
        with self._lock:
            if self._dci.num_points:
                self._dci.clear()
            self._dci.add(np.asarray(data, np.float64),
                          num_levels=self._num_levels)

    def nn_search(self, queries, num_neighbours: int = 1,
                  max_retrieve: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jit-compatible kNN: [Nq, dim] → (ids [Nq,k] int32, dists [Nq,k]
        float32). Usable inside jitted functions via pure_callback."""
        k = num_neighbours
        nq = queries.shape[0]

        def host_fn(q):
            with self._lock:
                ids, dists = self._dci.query(
                    np.asarray(q, np.float64), num_neighbours=k,
                    max_retrieve=max_retrieve)
            out_ids = np.full((q.shape[0], k), -1, np.int32)
            out_d = np.full((q.shape[0], k), -1.0, np.float32)
            for i, (row_i, row_d) in enumerate(zip(ids, dists)):
                n = len(row_i)
                out_ids[i, :n] = row_i
                out_d[i, :n] = row_d
            return out_ids, out_d

        return jax.pure_callback(
            host_fn,
            (jax.ShapeDtypeStruct((nq, k), jnp.int32),
             jax.ShapeDtypeStruct((nq, k), jnp.float32)),
            queries)
