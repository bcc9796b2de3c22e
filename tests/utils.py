"""Shared test helpers: random sparse instances + dense oracles.

Mirrors the reference's differential-oracle strategy
(tests/test_backend_sparse.py: random dense tensors sparsified by
thresholding, checked against eager dense ops with non-uniform dims to
catch transposition bugs)."""

from __future__ import annotations

import numpy as np

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor

TOL = 1e-5


def random_sparse(rng, shape, density=0.3, dense_shape=(), nnz_pad=None):
    """Random sparse tensor + its dense numpy counterpart."""
    dense = rng.normal(size=tuple(shape) + tuple(dense_shape))
    keep = rng.random(tuple(shape)) < density
    dense = dense * keep.reshape(keep.shape + (1,) * len(dense_shape))
    idx = np.nonzero(keep)
    ind = np.stack(idx).astype(np.int64)
    val = dense[idx]
    st = SparseTensor.from_numpy(ind, val, shape, nnz_pad=nnz_pad)
    return st, dense, ind, val


def maxdiff(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())
