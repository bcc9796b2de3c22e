"""Sparse x dense matrix product (reference pygho/backend/Spmm.py:6-44).

One gather + one sorted segment reduce; with padded entries dropping out at
the scatter, the whole op is static-shape and fuses under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sptensor import SparseTensor
from .segment import segment_reduce


def spmm(A: SparseTensor, dim1: int, X: jax.Array, aggr: str = "sum") -> jax.Array:
    """Contract ``dim1`` of the 2-dim SparseTensor ``A`` with dim 0 of dense
    ``X``: out[tar] = aggr_{src} A[tar, src] * X[src] (dim1 selects which of
    A's dims is the source/contracted one).

    Returns a dense ``[A.sparse_shape[1 - dim1], *broadcast_dense]`` array.
    """
    assert A.sparse_dim == 2, "spmm needs a 2-dim sparse tensor"
    if dim1 == 0:
        srcind, tarind = A.indices[0], A.indices[1]
        tarsize = A.sparse_shape[1]
        sorted_tar = False
    else:
        srcind, tarind = A.indices[1], A.indices[0]
        tarsize = A.sparse_shape[0]
        sorted_tar = True
    gathered = X[jnp.minimum(srcind, X.shape[0] - 1)]
    if A.values is None:
        mult = gathered
    else:
        av = A.values
        while av.ndim < gathered.ndim:  # scalar edge weights broadcast over d
            av = av[..., None]
        mult = av * gathered
    return segment_reduce(mult, tarind, tarsize, aggr,
                          indices_are_sorted=sorted_tar)
