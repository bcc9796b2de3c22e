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

# Densify-and-matmul fast path (see spmamm docstring below): enabled by
# default for sum/mean; the budget caps the dense adjacency size so
# giant-graph batches keep the gather path.
_DENSE_SPMAMM = True
_DENSE_BUDGET_BYTES = 512 * 1024 * 1024


def set_dense_spmamm(flag: bool) -> None:
    global _DENSE_SPMAMM
    _DENSE_SPMAMM = bool(flag)


def _dense_spmamm(A: SparseTensor, bidx, taridx, srcidx, n_t: int,
                  n_s: int, tB: jax.Array, dim2: int, aggr: str,
                  mask) -> MaskedTensor:
    """out[b, t] = aggr_s densify(A)[b, t, s] * B[b, s] on the MXU.

    The gather path moves nnz * prod(B row shape) floats through HBM
    three times (gather, multiply, scatter); at molecule-scale n the
    dense adjacency is only (b, n, n[, d]) — one small scatter of
    A.values — and the contraction becomes a batched matmul whose
    contracted axis is already B's leading non-batch axis (zero
    relayout), or the channel-wise product for per-channel edge values
    (kernels/channelwise_bmm.py picks this up on TPU)."""
    bsz = A.sparse_shape[0]
    if A.values is None:
        vals = jnp.ones(A.indices.shape[1], tB.dtype)
    else:
        vals = A.values
    dense = jnp.zeros((bsz, n_t, n_s) + vals.shape[1:], vals.dtype)
    # PAD_INDEX rows exceed every dim => mode="drop" discards them
    dense = dense.at[bidx, taridx, srcidx].add(vals, mode="drop")
    if vals.ndim == 1:
        out = jnp.einsum("bts,bs...->bt...", dense, tB,
                         preferred_element_type=tB.dtype)
    else:                       # per-channel edge values (nnz, d)
        if (tB.ndim == 4 and jax.default_backend() == "tpu"):
            from ..kernels.channelwise_bmm import (channelwise_bmm,
                                                   cw_bmm_applicable)
            if cw_bmm_applicable(dense.shape, tB.shape, dense.dtype,
                                 tB.dtype):
                out = channelwise_bmm(dense, tB).astype(tB.dtype)
            else:
                out = jnp.einsum("btsd,bs...d->bt...d", dense, tB)
        else:
            out = jnp.einsum("btsd,bs...d->bt...d", dense, tB)
    if aggr == "mean":
        deg = jnp.zeros((bsz, n_t), tB.dtype)
        deg = deg.at[bidx, taridx].add(1.0, mode="drop")
        deg = jnp.maximum(deg, 1.0)
        out = out / deg.reshape(deg.shape + (1,) * (out.ndim - 2))
    return MaskedTensor(jnp.moveaxis(out, 1, dim2), mask)


def _fused_spmamm(A: SparseTensor, dim1: int, B: MaskedTensor, dim2: int,
                  mask, aggr: str, plans) -> MaskedTensor:
    """Fused Pallas path: ride the spspmm kernel on host-expanded
    (t, u, v) triples (kernels/fused_spmamm.py).  sum/mean, vector edge
    values matching B's feature dim."""
    from ..kernels.fused_spspmm import fused_spspmm, get_fused_math
    from ..kernels.strip_spspmm import StripPlan, fused_spspmm_strip

    bsz, n = A.sparse_shape[0], B.data.shape[dim2]
    md = B.masked_dim
    data = B.fill_masked(0.0)
    perm = jnp.moveaxis(data, dim2, md - 1)     # contracted last masked
    dense_shape = perm.shape[md:]
    flat = perm.reshape((-1,) + dense_shape)
    rows = flat.shape[0]
    fwd, dxp, dap = plans
    run = (fused_spspmm_strip if isinstance(fwd, StripPlan)
           else fused_spspmm)
    out_flat = run(A.values.astype(jnp.float32),
                   flat.astype(jnp.float32),
                   fwd, dxp, dap, None, get_fused_math())[:rows]
    out = out_flat.reshape(perm.shape[:md] + dense_shape).astype(B.data.dtype)
    out = jnp.moveaxis(out, md - 1, dim2)
    if aggr == "mean":
        taridx = A.indices[2] if dim1 == 1 else A.indices[1]
        bidx = A.indices[0]
        ids = jnp.where(A.rowmask,
                        jnp.minimum(bidx, bsz - 1) * n
                        + jnp.minimum(taridx, n - 1),
                        jnp.asarray(bsz * n, jnp.int32))
        deg = segment_reduce(jnp.ones((ids.shape[0],), out.dtype), ids,
                             bsz * n, "sum", indices_are_sorted=False)
        deg = jnp.maximum(deg.reshape(bsz, n), 1.0)
        shape = [1] * out.ndim
        shape[0], shape[dim2] = bsz, n
        out = out / deg.reshape(shape)
    return MaskedTensor(out, mask if mask is not None else B.mask)


def spmamm(
    A: SparseTensor,
    dim1: int,
    B: MaskedTensor,
    dim2: int,
    mask: Optional[jax.Array] = None,
    aggr: str = "sum",
    plans=None,
) -> MaskedTensor:
    """out[b, i] = aggr_j A[b, i, j] * B[b, j] (dim1 selects which of A's
    node dims is contracted; dim2 selects B's contracted masked dim).

    ``plans`` (a (fwd, dX, dA) ChunkPlan triple from
    kernels.fused_spmamm.build_spmamm_plans) routes the contraction
    through the fused Pallas kernel when applicable."""
    assert A.sparse_dim == 3, "A must be a (batch, n, n) sparse tensor"
    if (plans is not None and aggr in ("sum", "mean")
            and A.values is not None and A.values.ndim == 2
            and B.dense_dim == 1
            and A.values.shape[1] == B.data.shape[-1]
            and A.values.dtype in (jnp.float32, jnp.bfloat16)
            and B.data.dtype in (jnp.float32, jnp.bfloat16)
            # Mosaic lane constraint (see sp_operator): small feature
            # dims stay on the XLA/dense paths on TPU
            and (A.values.shape[1] % 128 == 0
                 or jax.default_backend() != "tpu")):
        return _fused_spmamm(A, dim1, B, dim2, mask, aggr, plans)
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

    n_s = A.sparse_shape[1] if dim1 == 1 else A.sparse_shape[2]
    if _DENSE_SPMAMM and aggr in ("sum", "mean"):
        vshape = () if A.values is None else A.values.shape[1:]
        itemsize = 4 if A.values is None else A.values.dtype.itemsize
        nbytes = bsz * n * n_s * itemsize
        for s in vshape:
            nbytes *= s
        vec_ok = (len(vshape) == 1 and B.dense_dim == 1
                  and vshape[0] == B.data.shape[-1])
        if (len(vshape) == 0 or vec_ok) and nbytes <= _DENSE_BUDGET_BYTES:
            tBf = jnp.moveaxis(B.fill_masked(0.0), dim2, 1)
            return _dense_spmamm(A, bidx, taridx, srcidx, n, n_s, tBf,
                                 dim2, aggr,
                                 mask if mask is not None else B.mask)

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
