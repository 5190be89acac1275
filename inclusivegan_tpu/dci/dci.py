"""Python binding for the native Prioritized DCI library.

API parity with the reference wrapper (/root/reference/dci_code/dci.py):
``DCI(dim, num_comp_indices, num_simp_indices)`` with float64 C-contiguous
inputs (dci.py:113-127), ``add(data, num_levels, field_of_view,
prop_to_retrieve)``, ``query(queries, num_neighbours, field_of_view,
prop_to_retrieve) -> (ids_list, dists_list)`` returning per-query lists
(dci.py:273-330), ``clear``/``reset`` and the ``proj_vec`` property.

TPU-native extension: ``add``/``query`` accept precomputed ``projections``
(data @ proj_vec.T computed as one TPU matmul) so the host never runs the
O(n·d·mL) projection GEMM — see training/imle.py.
"""

import ctypes
import math
from typing import List, Optional, Tuple

import numpy as np

from .build import build_dci_lib

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        _LIB = ctypes.CDLL(build_dci_lib())
        c = _LIB
        c.dci_new.restype = ctypes.c_void_p
        c.dci_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_ulonglong]
        c.dci_free.argtypes = [ctypes.c_void_p]
        c.dci_add.argtypes = [ctypes.c_void_p, ctypes.c_long,
                              ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        c.dci_query.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int, ctypes.c_long, ctypes.c_long,
                                ctypes.c_int, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_void_p]
        c.dci_clear.argtypes = [ctypes.c_void_p]
        c.dci_reset.argtypes = [ctypes.c_void_p, ctypes.c_ulonglong]
        c.dci_num_points.restype = ctypes.c_long
        c.dci_num_points.argtypes = [ctypes.c_void_p]
        c.dci_num_levels.restype = ctypes.c_int
        c.dci_num_levels.argtypes = [ctypes.c_void_p]
        c.dci_get_proj_vecs.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    return _LIB


def _as_f64(arr, name: str) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    assert arr.ndim == 2, f"{name} must be 2-D"
    return arr


class DCI:
    def __init__(self, dim: int, num_comp_indices: int = 2,
                 num_simp_indices: int = 7, seed: int = 0):
        self._dim = int(dim)
        self._num_comp = int(num_comp_indices)
        self._num_simp = int(num_simp_indices)
        self._handle = _lib().dci_new(self._dim, self._num_comp,
                                      self._num_simp, seed)
        self._data = None   # keep the numpy buffers alive (borrowed by C++)
        self._proj = None
        self.num_points = 0

    def __del__(self):
        if getattr(self, "_handle", None):
            _lib().dci_free(self._handle)
            self._handle = None

    @property
    def dim(self):
        return self._dim

    @property
    def num_comp_indices(self):
        return self._num_comp

    @property
    def num_simp_indices(self):
        return self._num_simp

    @property
    def num_levels(self):
        return _lib().dci_num_levels(self._handle)

    @property
    def proj_vec(self) -> np.ndarray:
        out = np.empty((self._num_comp * self._num_simp, self._dim),
                       np.float64)
        _lib().dci_get_proj_vecs(self._handle, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def add(self, data, num_levels: int = 2, field_of_view: int = 10,
            prop_to_retrieve: float = 0.002,
            projections: Optional[np.ndarray] = None) -> None:
        """Build the index over ``data`` [n, dim] (float64; single call, like
        the reference which only supports one add per reset, dci.py:224-270).
        ``projections``: optional precomputed [n, m*L] = data @ proj_vec.T.
        field_of_view/prop_to_retrieve kept for reference-signature parity
        (construction-time search budgets are internal)."""
        data = _as_f64(data, "data")
        assert data.shape[1] == self._dim, (data.shape, self._dim)
        assert self.num_points == 0, "call clear()/reset() before re-adding"
        pp = None
        if projections is not None:
            projections = _as_f64(projections, "projections")
            assert projections.shape == (data.shape[0],
                                         self._num_comp * self._num_simp)
            pp = projections.ctypes.data_as(ctypes.c_void_p)
        self._data = data
        self._proj = projections
        _lib().dci_add(self._handle, data.shape[0],
                       data.ctypes.data_as(ctypes.c_void_p), pp,
                       int(num_levels))
        self.num_points = data.shape[0]

    def query(self, queries, num_neighbours: int = 1,
              field_of_view: int = 100, prop_to_retrieve: float = 1.0,
              max_retrieve: Optional[int] = None,
              max_visits: Optional[int] = None,
              projections: Optional[np.ndarray] = None,
              ) -> Tuple[List[List[int]], List[List[float]]]:
        """k-NN query. Budget mapping from the reference-style arguments:
        ``max_retrieve = min(ceil(prop_to_retrieve · n), cap)`` candidates are
        exact-ranked per query; ``field_of_view`` cells are descended per
        level. Returns ragged per-query (ids, dists) lists like the
        reference wrapper (dci.py:273-330)."""
        queries = _as_f64(queries, "queries")
        assert queries.shape[1] == self._dim
        n = self.num_points
        assert n > 0, "index is empty"
        k = int(num_neighbours)
        if max_retrieve is None:
            cap = max(512, 32 * k)
            max_retrieve = min(max(int(math.ceil(prop_to_retrieve * n)), k), cap)
        if max_visits is None:
            max_visits = max(16 * max_retrieve, 2048)
        pp = None
        if projections is not None:
            projections = _as_f64(projections, "query projections")
            assert projections.shape == (queries.shape[0],
                                         self._num_comp * self._num_simp)
            pp = projections.ctypes.data_as(ctypes.c_void_p)

        nq = queries.shape[0]
        out_ids = np.empty((nq, k), np.int32)
        out_dists = np.empty((nq, k), np.float64)
        out_counts = np.empty((nq,), np.int32)
        _lib().dci_query(self._handle, nq,
                         queries.ctypes.data_as(ctypes.c_void_p), pp, k,
                         int(max_retrieve), int(max_visits),
                         int(field_of_view),
                         out_ids.ctypes.data_as(ctypes.c_void_p),
                         out_dists.ctypes.data_as(ctypes.c_void_p),
                         out_counts.ctypes.data_as(ctypes.c_void_p))
        ids = [out_ids[i, :out_counts[i]].tolist() for i in range(nq)]
        dists = [out_dists[i, :out_counts[i]].tolist() for i in range(nq)]
        return ids, dists

    def clear(self) -> None:
        _lib().dci_clear(self._handle)
        self._data = None
        self._proj = None
        self.num_points = 0

    def reset(self, seed: int = 0) -> None:
        _lib().dci_reset(self._handle, seed)
        self._data = None
        self._proj = None
        self.num_points = 0
