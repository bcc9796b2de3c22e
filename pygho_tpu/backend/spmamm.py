"""Sparse x masked-dense product (reference pygho/backend/Spmamm.py:12-68).

A is a 3-sparse-dim batched adjacency (b, n, n); B is a masked dense
(b, n, *dense).  One gather from B at (batch, src), an optional multiply by
A's edge values, a validity fill, and a sorted segment reduce into the
flattened (b*n) target rows.

Fixes reference bug #2 (Spmamm.py:62): the reference calls ``masked_fill``
out-of-place and discards the result, so max/min over rows with invalid
source entries silently aggregate zeros; here invalid source entries are
properly filled with the op-neutral value before reduction.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .sptensor import SparseTensor, _expand_mask
from .matensor import MaskedTensor, filterinf
from .segment import segment_reduce

_FILL = {"sum": 0.0, "mean": 0.0, "max": -jnp.inf, "min": jnp.inf}


def spmamm(
    A: SparseTensor,
    dim1: int,
    B: MaskedTensor,
    dim2: int,
    mask: Optional[jax.Array] = None,
    aggr: str = "sum",
) -> MaskedTensor:
    """out[b, i] = aggr_j A[b, i, j] * B[b, j] (dim1 selects which of A's
    node dims is contracted; dim2 selects B's contracted masked dim)."""
    assert A.sparse_dim == 3, "A must be a (batch, n, n) sparse tensor"
    bsz = A.sparse_shape[0]
    if dim1 == 1:
        n = A.sparse_shape[2]
        bidx, srcidx = A.indices[0], A.indices[1]
        taridx = A.indices[2]
    elif dim1 == 2:
        n = A.sparse_shape[1]
        bidx, srcidx = A.indices[0], A.indices[2]
        taridx = A.indices[1]
    else:
        raise NotImplementedError("dim1 must be 1 or 2")

    tB = jnp.moveaxis(B.data, dim2, 1)
    tBmask = jnp.moveaxis(B.mask, dim2, 1)

    cb = jnp.minimum(bidx, tB.shape[0] - 1)
    cs = jnp.minimum(srcidx, tB.shape[1] - 1)
    gathered = tB[cb, cs]
    valid = tBmask[cb, cs]
    if A.values is not None:
        # A's edge values broadcast over any extra masked dims of B
        # (reference: Aval.unsqueeze(1), Spmamm.py:58)
        av = A.values
        extra = gathered.ndim - av.ndim
        av = av.reshape(av.shape[:1] + (1,) * extra + av.shape[1:])
        gathered = av * gathered
    fill = jnp.asarray(_FILL[aggr], gathered.dtype)
    vmask = valid.reshape(valid.shape + (1,) * (gathered.ndim - valid.ndim))
    gathered = jnp.where(vmask, gathered, fill)

    # flat (b * n) target; padded A entries have PAD_INDEX => dropped
    tar = jnp.where(A.rowmask, cb * n + jnp.minimum(taridx, n - 1),
                    jnp.asarray(bsz * n, jnp.int32))
    out = segment_reduce(gathered, tar, bsz * n, aggr,
                         indices_are_sorted=False)
    out = out.reshape((bsz, n) + out.shape[1:])
    out = jnp.moveaxis(out, 1, dim2)
    if aggr in ("max", "min"):
        out = filterinf(out, 0.0)
    return MaskedTensor(out, mask if mask is not None else B.mask)
