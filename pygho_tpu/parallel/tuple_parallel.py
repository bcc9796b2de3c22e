"""Tuple-parallel sparse contraction over an "sp" mesh axis.

The scaling axis of this domain is tuple count (SURVEY.md §5 "long
context"): a single giant graph's tuple tensor can exceed one chip.  The
contraction triples ``acd`` are sorted by output row ``a``; sharding them
contiguously along the triple axis gives each device a slab of the
gather-multiply work whose outputs land in a (mostly) contiguous band of
target rows.

v1 (this module): operand values replicated, acd sharded, one psum over
the padded output — correct for every aggr in {sum, mean-numerator},
deterministic, and already compute-parallel.  The documented upgrade path
(round 2+) partitions the value arrays too, turns the psum into a
reduce_scatter over ownership bands, and overlaps an all_to_all boundary
exchange with the local segment reduction (the graph-world analog of ring
attention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..backend.sptensor import SparseTensor
from ..backend.segment import segment_reduce


def _local_contract(a_vals, b_vals, acd_local, nnz_pad, aggr):
    av = a_vals[jnp.minimum(acd_local[1], a_vals.shape[0] - 1)]
    bv = b_vals[jnp.minimum(acd_local[2], b_vals.shape[0] - 1)]
    while av.ndim < bv.ndim:
        av = av[..., None]
    while bv.ndim < av.ndim:
        bv = bv[..., None]
    return segment_reduce(av * bv, acd_local[0], nnz_pad, aggr,
                          indices_are_sorted=True)


def spspmm_tuple_parallel(
    A_values: jax.Array,
    B_values: jax.Array,
    acd: jax.Array,
    nnz_pad: int,
    aggr: str = "sum",
    axis: str = "sp",
) -> jax.Array:
    """Shard-level body: call *inside* shard_map with ``acd`` sharded on
    its triple axis (P(None, axis)) and values replicated.  Returns the
    full (nnz_pad, d) output, psum'd over the axis.

    Only "sum" (and mean via external count) distribute exactly over a
    psum; max/min would need a pmax/pmin — handled here accordingly.
    """
    if aggr in ("sum", "mean"):
        partial = _local_contract(A_values, B_values, acd, nnz_pad, "sum")
        out = jax.lax.psum(partial, axis)
        if aggr == "mean":
            ones = jnp.ones((acd.shape[1],), dtype=partial.dtype)
            cnt = segment_reduce(ones, acd[0], nnz_pad, "sum",
                                 indices_are_sorted=True)
            cnt = jax.lax.psum(cnt, axis)
            out = out / jnp.maximum(cnt, 1.0).reshape(
                (-1,) + (1,) * (out.ndim - 1))
        return out
    if aggr in ("max", "min"):
        # keep +-inf empty-markers until AFTER the cross-device reduce —
        # converting to 0 locally would clobber negative maxima
        av = A_values[jnp.minimum(acd[1], A_values.shape[0] - 1)]
        bv = B_values[jnp.minimum(acd[2], B_values.shape[0] - 1)]
        while av.ndim < bv.ndim:
            av = av[..., None]
        while bv.ndim < av.ndim:
            bv = bv[..., None]
        segfn = jax.ops.segment_max if aggr == "max" else jax.ops.segment_min
        partial = segfn(av * bv, acd[0], nnz_pad, indices_are_sorted=True)
        out = (jax.lax.pmax if aggr == "max" else jax.lax.pmin)(partial, axis)
        return jnp.where(jnp.isinf(out), jnp.zeros_like(out), out)
    raise ValueError(aggr)


def make_tuple_parallel_spspmm(mesh: Mesh, aggr: str = "sum",
                               axis: str = "sp"):
    """High-level wrapper: jit-able fn(X: SparseTensor, A: SparseTensor,
    acd) -> SparseTensor with the contraction sharded over ``axis``.

    acd's triple axis length must be divisible by the axis size (the
    batcher's bucket sizes are multiples of 128, so any axis size that
    divides 128 works).
    """

    def run(X: SparseTensor, A: SparseTensor, acd: jax.Array) -> SparseTensor:
        body = jax.shard_map(
            lambda xv, av, acd_l: spspmm_tuple_parallel(
                xv, av, acd_l, X.nnz_pad, aggr, axis),
            mesh=mesh,
            in_specs=(P(), P(), P(None, axis)),
            out_specs=P(),
            check_vma=False,
        )
        vals = body(X.values, A.values, acd)
        return SparseTensor(indices=X.indices, values=vals, nnz=X.nnz,
                            sparse_shape=X.sparse_shape)

    return run
