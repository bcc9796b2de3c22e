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
        # only the op's own identity marks empty segments (matching
        # backend.segment.segment_reduce): -inf is a legitimate minimum
        empty = jnp.isneginf(out) if aggr == "max" else jnp.isposinf(out)
        return jnp.where(empty, jnp.zeros_like(out), out)
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


# ---------------------------------------------------------------------------
# v2: partitioned values + host-planned boundary exchange
# ---------------------------------------------------------------------------


import dataclasses

import numpy as np

from ..backend.indexing import PAD_INDEX


def _boundary_pool(c, owner, slabs, B, P):
    """Per-source-block boundary row sets + vectorized position lookup.

    Returns (send_idx (P, Bnd), Bnd, remap(cs) -> pool positions) where
    remap maps absolute row ids to B + q*Bnd + pos via searchsorted over
    the sorted per-block boundary lists (no Python-level dict loops)."""
    bnd_lists = []
    for q in range(P):
        rows = []
        bnd_lists.append(rows)
    # rows of block q needed by any OTHER owner
    c_owner = np.minimum(c // B, P - 1)
    for p in range(P):
        cs = c[slabs[p]]
        co = c_owner[slabs[p]]
        remote = cs[co != p]
        ro = co[co != p]
        for q in np.unique(ro):
            q = int(q)
            bnd_lists[q].extend((remote[ro == q] - q * B).tolist())
    bnd_sorted = [np.unique(np.asarray(b, dtype=np.int64))
                  for b in bnd_lists]
    Bnd = max(max((len(b) for b in bnd_sorted), default=1), 1)
    send_idx = np.zeros((P, Bnd), np.int32)
    for q, rows in enumerate(bnd_sorted):
        send_idx[q, : len(rows)] = rows

    def remap(cs: np.ndarray) -> np.ndarray:
        q = np.minimum(cs // B, P - 1)
        local = cs - q * B
        pos = np.empty(cs.shape[0], np.int64)
        for qq in range(P):
            m = q == qq
            if m.any():
                pos[m] = np.searchsorted(bnd_sorted[qq], local[m])
        return q * Bnd + pos

    return send_idx, Bnd, remap


def _overlapped_contract(h, Av, loc, bnd, send_row, B, axis):
    """Shared shard-level body of the overlapped boundary-exchange
    contraction: all_gather the boundary pool (async, overlaps with the
    local reduction below), local triples, then boundary triples."""
    pool = jax.lax.all_gather(h[send_row], axis)       # (P, Bnd, D)
    av = h[jnp.minimum(loc[:, 1], h.shape[0] - 1)]
    bv = Av[jnp.minimum(loc[:, 2], Av.shape[0] - 1)]
    out = segment_reduce(av * bv, loc[:, 0], B, "sum",
                         indices_are_sorted=True)
    flat = pool.reshape(-1, h.shape[-1])
    avb = flat[jnp.minimum(bnd[:, 1], flat.shape[0] - 1)]
    bvb = Av[jnp.minimum(bnd[:, 2], Av.shape[0] - 1)]
    return out + segment_reduce(avb * bvb, bnd[:, 0], B, "sum",
                                indices_are_sorted=True)


@dataclasses.dataclass(frozen=True)
class TupleShardPlan:
    """Host-built plan for the partitioned tuple-parallel contraction.

    X values are partitioned into P contiguous row blocks of size B; each
    device owns the output rows of its block.  The acd triples are
    slab-partitioned by output owner.  Cross-block gathers are resolved
    through a boundary pool: each device contributes the rows other
    devices need (``send_idx``), one all_gather shares the pools, and
    ``acd_local``'s c-indices are pre-remapped into
    [own block | gathered pools].  Communication volume is the boundary
    size, not the full tuple tensor — the graph-world analog of ring
    attention's neighbor exchange (SURVEY.md §5)."""

    acd_local: jax.Array   # i32[P, Kp, 3] (a_local, c_remapped, d)
    send_idx: jax.Array    # i32[P, Bnd] block-local rows for the pool
    P: int
    B: int                 # rows per block
    Bnd: int               # boundary pool rows per device


jax.tree_util.register_dataclass(
    TupleShardPlan, data_fields=["acd_local", "send_idx"],
    meta_fields=["P", "B", "Bnd"])


def build_tuple_shard_plan(acd: np.ndarray, nnz_pad: int,
                           P: int) -> TupleShardPlan:
    """Partition padded acd triples (sorted by a) across P devices."""
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a, c, d = (acd[0][real].astype(np.int64), acd[1][real].astype(np.int64),
               acd[2][real].astype(np.int64))
    assert nnz_pad % P == 0, "nnz_pad must divide by the axis size"
    B = nnz_pad // P
    owner = np.minimum(a // B, P - 1)

    # per-device triple slabs
    slabs = [np.nonzero(owner == p)[0] for p in range(P)]
    Kp = max((len(s) for s in slabs), default=1)
    Kp = max(Kp, 1)

    # boundary rows: for each source block q, the union of rows devices
    # other than q read from q
    bnd_sets = [set() for _ in range(P)]
    for p in range(P):
        cs = c[slabs[p]]
        remote = cs[(cs < p * B) | (cs >= (p + 1) * B)]
        for q in np.unique(remote // B):
            q = int(min(q, P - 1))
            rows = remote[(remote // B) == q]
            bnd_sets[q].update((rows - q * B).tolist())
    bnd_lists = [sorted(s) for s in bnd_sets]
    Bnd = max(max((len(b) for b in bnd_lists), default=1), 1)

    send_idx = np.zeros((P, Bnd), np.int32)
    lookup = {}  # (q, block-local row) -> pool position
    for q, rows in enumerate(bnd_lists):
        for pos, r in enumerate(rows):
            send_idx[q, pos] = r
            lookup[(q, r)] = q * Bnd + pos

    acd_local = np.zeros((P, 3, Kp), np.int32)
    acd_local[:, 0, :] = PAD_INDEX  # dropped by the scatter
    for p in range(P):
        idx = slabs[p]
        m = len(idx)
        if m == 0:
            continue
        acd_local[p, 0, :m] = a[idx] - p * B
        cs = c[idx]
        own = (cs >= p * B) & (cs < (p + 1) * B)
        remap = np.empty(m, np.int64)
        remap[own] = cs[own] - p * B
        for j in np.nonzero(~own)[0]:
            q = int(min(cs[j] // B, P - 1))
            remap[j] = B + lookup[(q, int(cs[j] - q * B))]
        acd_local[p, 1, :m] = remap
        acd_local[p, 2, :m] = d[idx]
    return TupleShardPlan(
        acd_local=jnp.asarray(np.swapaxes(acd_local, 1, 2)),
        send_idx=jnp.asarray(send_idx), P=P, B=B, Bnd=Bnd)


def make_partitioned_spspmm(mesh: Mesh, plan: TupleShardPlan,
                            aggr: str = "sum", axis: str = "sp"):
    """Partitioned-values tuple-parallel spspmm: X values sharded in row
    blocks over ``axis``; A values replicated (edge tensors are small);
    output sharded the same way as X.  Communication = one all_gather of
    the boundary pool."""
    from jax.sharding import PartitionSpec as P_

    assert aggr == "sum", "partitioned path: sum aggregation"

    def body(Xblk, Av, acd_l, send_l):
        Xb = Xblk[0]                      # (B, D)
        acd = acd_l[0]                    # (Kp, 3)
        pool_mine = Xb[send_l[0]]         # (Bnd, D)
        pool = jax.lax.all_gather(pool_mine, axis)   # (P, Bnd, D)
        table = jnp.concatenate([Xb, pool.reshape(-1, Xb.shape[-1])], axis=0)
        av = table[jnp.minimum(acd[:, 1], table.shape[0] - 1)]
        bv = Av[jnp.minimum(acd[:, 2], Av.shape[0] - 1)]
        while bv.ndim < av.ndim:
            bv = bv[..., None]
        out = segment_reduce(av * bv, acd[:, 0], plan.B, "sum",
                             indices_are_sorted=True)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(plan.P, plan.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P_(axis), P_(), P_(axis), P_(axis)),
            out_specs=P_(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, plan.acd_local, plan.send_idx)
        return out.reshape(plan.P * plan.B, -1)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# v3: overlapped boundary exchange
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class OverlappedShardPlan:
    """Like TupleShardPlan but with the per-device triples split into a
    local set (c inside the own block) and a boundary set (c remote).
    The device function issues the boundary all_gather first, computes
    the local contraction while the collective is in flight (XLA's async
    collective scheduler overlaps them — there is no data dependency),
    then adds the boundary contributions."""

    acd_loc: jax.Array     # i32[P, Kl, 3] local triples (a_l, c_local, d)
    acd_bnd: jax.Array     # i32[P, Kb, 3] boundary (a_l, pool_idx, d)
    send_idx: jax.Array    # i32[P, Bnd]
    P: int
    B: int
    Bnd: int


jax.tree_util.register_dataclass(
    OverlappedShardPlan, data_fields=["acd_loc", "acd_bnd", "send_idx"],
    meta_fields=["P", "B", "Bnd"])


def build_overlapped_shard_plan(acd: np.ndarray, nnz_pad: int,
                                P: int) -> OverlappedShardPlan:
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a, c, d = (acd[0][real].astype(np.int64), acd[1][real].astype(np.int64),
               acd[2][real].astype(np.int64))
    assert nnz_pad % P == 0
    B = nnz_pad // P
    owner = np.minimum(a // B, P - 1)
    c_owner = np.minimum(c // B, P - 1)
    is_local = c_owner == owner

    slabs = [np.nonzero(owner == p)[0] for p in range(P)]
    send_idx, Bnd, remap = _boundary_pool(c, owner, slabs, B, P)

    Kl = max(int(max((np.sum((owner == p) & is_local) for p in range(P)),
                     default=1)), 1)
    Kb = max(int(max((np.sum((owner == p) & ~is_local) for p in range(P)),
                     default=1)), 1)
    acd_loc = np.zeros((P, Kl, 3), np.int32)
    acd_bnd = np.zeros((P, Kb, 3), np.int32)
    acd_loc[:, :, 0] = PAD_INDEX
    acd_bnd[:, :, 0] = PAD_INDEX
    for p in range(P):
        sel_l = np.nonzero((owner == p) & is_local)[0]
        acd_loc[p, :len(sel_l), 0] = a[sel_l] - p * B
        acd_loc[p, :len(sel_l), 1] = c[sel_l] - p * B
        acd_loc[p, :len(sel_l), 2] = d[sel_l]
        sel_b = np.nonzero((owner == p) & ~is_local)[0]
        if len(sel_b):
            acd_bnd[p, :len(sel_b), 0] = a[sel_b] - p * B
            # position in the flattened (P*Bnd, D) gathered pool
            acd_bnd[p, :len(sel_b), 1] = remap(c[sel_b])
            acd_bnd[p, :len(sel_b), 2] = d[sel_b]
    return OverlappedShardPlan(
        acd_loc=jnp.asarray(acd_loc), acd_bnd=jnp.asarray(acd_bnd),
        send_idx=jnp.asarray(send_idx), P=P, B=B, Bnd=Bnd)


def make_overlapped_spspmm(mesh: Mesh, plan: OverlappedShardPlan,
                           axis: str = "sp"):
    """Partitioned tuple-parallel spspmm with comm/compute overlap."""
    from jax.sharding import PartitionSpec as P_

    def body(Xblk, Av, loc, bnd, send_l):
        Xb = Xblk[0]
        out = _overlapped_contract(Xb, Av, loc[0], bnd[0], send_l[0],
                                   plan.B, axis)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(plan.P, plan.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P_(axis), P_(), P_(axis), P_(axis), P_(axis)),
            out_specs=P_(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, plan.acd_loc, plan.acd_bnd, plan.send_idx)
        return out.reshape(plan.P * plan.B, -1)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# v4: input-stationary bands + all_to_all of pre-reduced outputs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ScatterShardPlan:
    """Dual of OverlappedShardPlan: triples are partitioned by the owner
    of the INPUT row c (input-stationary).  Cross-shard contributions
    are pre-reduced locally into per-destination bands — many triples
    hitting the same remote output row collapse into ONE exchanged row —
    then swapped point-to-point with all_to_all and scattered into the
    owner's block.  Wins over the boundary-pool all_gather whenever the
    output fan-in across shards exceeds the input boundary size
    (hub-and-spoke / high-degree graphs); plan_exchange_volumes compares
    the two on the host."""

    acd_loc: jax.Array    # i32[P, Kl, 3] (a_local, c_local, d), both own
    acd_out: jax.Array    # i32[P, Kc, 3] (band_pos=q*Bpq+s, c_local, d)
    recv_row: jax.Array   # i32[P, P, Bpq] dest-local row for (dest, src, s)
    P: int
    B: int
    Bpq: int


jax.tree_util.register_dataclass(
    ScatterShardPlan, data_fields=["acd_loc", "acd_out", "recv_row"],
    meta_fields=["P", "B", "Bpq"])


def build_scatter_shard_plan(acd: np.ndarray, nnz_pad: int,
                             P: int) -> ScatterShardPlan:
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a, c, d = (acd[0][real].astype(np.int64), acd[1][real].astype(np.int64),
               acd[2][real].astype(np.int64))
    assert nnz_pad % P == 0
    B = nnz_pad // P
    a_owner = np.minimum(a // B, P - 1)
    c_owner = np.minimum(c // B, P - 1)
    is_local = a_owner == c_owner

    # per-(src, dest) output bands: the distinct remote rows each source
    # contributes to, ranked by destination-local row
    band_rows = {}
    for p in range(P):
        for q in range(P):
            if p == q:
                continue
            sel = (c_owner == p) & (a_owner == q)
            if sel.any():
                band_rows[(p, q)] = np.unique(a[sel])
    Bpq = max(max((len(r) for r in band_rows.values()), default=1), 1)

    recv_row = np.full((P, P, Bpq), PAD_INDEX, np.int32)
    for (p, q), rows in band_rows.items():
        recv_row[q, p, : len(rows)] = rows - q * B

    Kl = max(int(max((np.sum((c_owner == p) & is_local) for p in range(P)),
                     default=1)), 1)
    Kc = max(int(max((np.sum((c_owner == p) & ~is_local) for p in range(P)),
                     default=1)), 1)
    acd_loc = np.zeros((P, Kl, 3), np.int32)
    acd_out = np.zeros((P, Kc, 3), np.int32)
    acd_loc[:, :, 0] = PAD_INDEX
    acd_out[:, :, 0] = P * Bpq          # OOB segment id -> dropped
    for p in range(P):
        sel_l = np.nonzero((c_owner == p) & is_local)[0]
        acd_loc[p, :len(sel_l), 0] = a[sel_l] - p * B
        acd_loc[p, :len(sel_l), 1] = c[sel_l] - p * B
        acd_loc[p, :len(sel_l), 2] = d[sel_l]
        sel_c = np.nonzero((c_owner == p) & ~is_local)[0]
        if len(sel_c):
            qs, as_, cs, ds = (a_owner[sel_c], a[sel_c], c[sel_c], d[sel_c])
            order = np.lexsort((as_, qs))   # by (dest, target row)
            qs, as_, cs, ds = qs[order], as_[order], cs[order], ds[order]
            pos = np.empty(len(sel_c), np.int64)
            for q in np.unique(qs):
                m = qs == q
                pos[m] = np.searchsorted(band_rows[(p, int(q))], as_[m])
            acd_out[p, :len(sel_c), 0] = qs * Bpq + pos
            acd_out[p, :len(sel_c), 1] = cs - p * B
            acd_out[p, :len(sel_c), 2] = ds
    return ScatterShardPlan(
        acd_loc=jnp.asarray(acd_loc), acd_out=jnp.asarray(acd_out),
        recv_row=jnp.asarray(recv_row), P=P, B=B, Bpq=Bpq)


def _scatter_contract(h, Av, loc, outc, recv_row_me, P, B, Bpq, axis):
    """Shard body: pre-reduce per-destination bands, start the
    all_to_all, reduce local triples under it, then scatter-add the
    received pre-reduced rows into the own block."""
    av = h[jnp.minimum(outc[:, 1], h.shape[0] - 1)]
    bv = Av[jnp.minimum(outc[:, 2], Av.shape[0] - 1)]
    send = segment_reduce(av * bv, outc[:, 0], P * Bpq, "sum",
                          indices_are_sorted=True)
    send = send.reshape(P, Bpq, -1)
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    # local contraction has no dependency on the exchange above — XLA's
    # async collectives overlap the two
    al = h[jnp.minimum(loc[:, 1], h.shape[0] - 1)]
    bl = Av[jnp.minimum(loc[:, 2], Av.shape[0] - 1)]
    out = segment_reduce(al * bl, loc[:, 0], B, "sum",
                         indices_are_sorted=True)
    flat = recv.reshape(P * Bpq, -1)
    ids = recv_row_me.reshape(P * Bpq)
    return out + segment_reduce(flat, ids, B, "sum",
                                indices_are_sorted=False)


def make_scatter_spspmm(mesh: Mesh, plan: ScatterShardPlan,
                        axis: str = "sp"):
    """Tuple-parallel spspmm with the pre-reduced output exchange."""
    from jax.sharding import PartitionSpec as P_

    def body(Xblk, Av, loc, outc, rrow):
        out = _scatter_contract(Xblk[0], Av, loc[0], outc[0], rrow[0],
                                plan.P, plan.B, plan.Bpq, axis)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(plan.P, plan.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P_(axis), P_(), P_(axis), P_(axis), P_(axis)),
            out_specs=P_(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, plan.acd_loc, plan.acd_out, plan.recv_row)
        return out.reshape(plan.P * plan.B, -1)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# v5: ppermute ring over boundary pools
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RingShardPlan:
    """Ring variant of OverlappedShardPlan (ROADMAP #1): instead of one
    all_gather that materializes every block's boundary pool at once
    (peak memory P*Bnd rows/device), the pools travel the ring with
    ``lax.ppermute`` in P-1 steps.  At step s device p holds block
    (p-s) mod P's pool and contracts exactly the triples that reference
    it; the next permute has no data dependency on that contraction, so
    XLA's async collectives overlap communication with compute at every
    step — the graph-world analog of ring attention's rotation
    (SURVEY.md §5).  Total bytes moved equal the all_gather's, but peak
    boundary memory is O(Bnd) instead of O(P*Bnd), which is what makes
    giant-graph tuple tensors with large boundaries fit at all."""

    acd_loc: jax.Array     # i32[P, Kl, 3] local triples (a_l, c_local, d)
    acd_ring: jax.Array    # i32[P, P-1, Ks, 3] (a_l, pool_pos, d) per step
    send_idx: jax.Array    # i32[P, Bnd] block-local rows of the own pool
    P: int
    B: int
    Bnd: int


jax.tree_util.register_dataclass(
    RingShardPlan, data_fields=["acd_loc", "acd_ring", "send_idx"],
    meta_fields=["P", "B", "Bnd"])


def build_ring_shard_plan(acd: np.ndarray, nnz_pad: int,
                          P: int) -> RingShardPlan:
    """Group each device's boundary triples by source-block owner q and
    schedule them at ring step s = (p - q) mod P."""
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a, c, d = (acd[0][real].astype(np.int64), acd[1][real].astype(np.int64),
               acd[2][real].astype(np.int64))
    assert nnz_pad % P == 0
    B = nnz_pad // P
    owner = np.minimum(a // B, P - 1)
    c_owner = np.minimum(c // B, P - 1)
    is_local = c_owner == owner

    slabs = [np.nonzero(owner == p)[0] for p in range(P)]
    send_idx, Bnd, remap = _boundary_pool(c, owner, slabs, B, P)

    Kl = max(int(max((np.sum((owner == p) & is_local) for p in range(P)),
                     default=1)), 1)
    # per-(device, step) slab sizes
    Ks = 1
    for p in range(P):
        for q in range(P):
            if q != p:
                Ks = max(Ks, int(np.sum((owner == p) & (c_owner == q))))
    S = max(P - 1, 1)
    acd_loc = np.zeros((P, Kl, 3), np.int32)
    acd_ring = np.zeros((P, S, Ks, 3), np.int32)
    acd_loc[:, :, 0] = PAD_INDEX
    acd_ring[:, :, :, 0] = PAD_INDEX
    for p in range(P):
        sel_l = np.nonzero((owner == p) & is_local)[0]
        acd_loc[p, :len(sel_l), 0] = a[sel_l] - p * B
        acd_loc[p, :len(sel_l), 1] = c[sel_l] - p * B
        acd_loc[p, :len(sel_l), 2] = d[sel_l]
        for s in range(1, P):
            q = (p - s) % P
            sel = np.nonzero((owner == p) & (c_owner == q))[0]
            if len(sel):
                acd_ring[p, s - 1, :len(sel), 0] = a[sel] - p * B
                # remap() yields q*Bnd+pos in the flat all_gather pool;
                # the held pool at step s IS block q's, so keep only pos
                acd_ring[p, s - 1, :len(sel), 1] = remap(c[sel]) - q * Bnd
                acd_ring[p, s - 1, :len(sel), 2] = d[sel]
    return RingShardPlan(
        acd_loc=jnp.asarray(acd_loc), acd_ring=jnp.asarray(acd_ring),
        send_idx=jnp.asarray(send_idx), P=P, B=B, Bnd=Bnd)


def _ring_contract(h, Av, loc, ring, send_row, P, B, axis):
    """Shard body: local contraction + P-1 ring steps.  Each scan step
    starts the next ppermute (no dependency on this step's contraction)
    and reduces the triples aimed at the currently-held pool."""
    out = _local_contract_triplet(h, Av, loc, B)
    if P == 1:
        return out
    perm = [(i, (i + 1) % P) for i in range(P)]
    pool0 = h[send_row]                                  # my own pool

    def step(carry, acd_s):
        pool, acc = carry
        held = jax.lax.ppermute(pool, axis, perm)        # overlaps below
        contrib = _pool_contract(held, Av, acd_s, B)
        return (held, acc + contrib), None

    # step s consumes the pool *after* s permutes; the first ppermute is
    # inside the first scan iteration, so acd_ring[0] (source block p-1)
    # lines up with the pool received there.
    (_, out), _ = jax.lax.scan(step, (pool0, out), ring)
    return out


def _local_contract_triplet(h, Av, loc, B):
    av = h[jnp.minimum(loc[:, 1], h.shape[0] - 1)]
    bv = Av[jnp.minimum(loc[:, 2], Av.shape[0] - 1)]
    while bv.ndim < av.ndim:
        bv = bv[..., None]
    return segment_reduce(av * bv, loc[:, 0], B, "sum",
                          indices_are_sorted=True)


def _pool_contract(pool, Av, acd_s, B):
    av = pool[jnp.minimum(acd_s[:, 1], pool.shape[0] - 1)]
    bv = Av[jnp.minimum(acd_s[:, 2], Av.shape[0] - 1)]
    while bv.ndim < av.ndim:
        bv = bv[..., None]
    return segment_reduce(av * bv, acd_s[:, 0], B, "sum",
                          indices_are_sorted=True)


def make_ring_spspmm(mesh: Mesh, plan: RingShardPlan, axis: str = "sp"):
    """Tuple-parallel spspmm with the ppermute ring exchange."""
    from jax.sharding import PartitionSpec as P_

    def body(Xblk, Av, loc, ring, send_l):
        out = _ring_contract(Xblk[0], Av, loc[0], ring[0], send_l[0],
                             plan.P, plan.B, axis)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(plan.P, plan.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P_(axis), P_(), P_(axis), P_(axis), P_(axis)),
            out_specs=P_(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, plan.acd_loc, plan.acd_ring, plan.send_idx)
        return out.reshape(plan.P * plan.B, -1)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# v6: reduce_scatter over ownership bands
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ReduceScatterShardPlan:
    """Input-stationary triples + ``psum_scatter`` over ownership bands
    (ROADMAP #1).  Each device keeps its own X block, contracts ALL of
    its triples into a full-range (P*B) partial output, and one
    reduce_scatter sums the partials while handing every device exactly
    its own B-row band — half a psum's wire traffic and no host-planned
    boundary sets at all.  This is the dense-exchange endpoint of the
    strategy family: it moves ~P*B rows/device regardless of structure.
    By raw row count it can only tie the boundary-pool gather (Bnd <= B
    always), so the chooser prefers it exactly at that tie — a graph so
    entangled that pools approach full blocks — where one fused
    psum_scatter beats gathering P irregular pools and indexing into
    them (``plan_exchange_volumes`` compares all three)."""

    acd_loc: jax.Array    # i32[P, Kp, 3] (a_global, c_local, d)
    P: int
    B: int


jax.tree_util.register_dataclass(
    ReduceScatterShardPlan, data_fields=["acd_loc"], meta_fields=["P", "B"])


def build_reduce_scatter_shard_plan(acd: np.ndarray, nnz_pad: int,
                                    P: int) -> ReduceScatterShardPlan:
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a, c, d = (acd[0][real].astype(np.int64), acd[1][real].astype(np.int64),
               acd[2][real].astype(np.int64))
    assert nnz_pad % P == 0
    B = nnz_pad // P
    c_owner = np.minimum(c // B, P - 1)
    Kp = max(int(max((np.sum(c_owner == p) for p in range(P)),
                     default=1)), 1)
    acd_loc = np.zeros((P, Kp, 3), np.int32)
    acd_loc[:, :, 0] = PAD_INDEX
    for p in range(P):
        sel = np.nonzero(c_owner == p)[0]   # global a-order preserved
        acd_loc[p, :len(sel), 0] = a[sel]
        acd_loc[p, :len(sel), 1] = c[sel] - p * B
        acd_loc[p, :len(sel), 2] = d[sel]
    return ReduceScatterShardPlan(acd_loc=jnp.asarray(acd_loc), P=P, B=B)


def make_reduce_scatter_spspmm(mesh: Mesh, plan: ReduceScatterShardPlan,
                               axis: str = "sp"):
    """Tuple-parallel spspmm via full-range partials + psum_scatter."""
    from jax.sharding import PartitionSpec as P_

    def body(Xblk, Av, loc):
        h, acd = Xblk[0], loc[0]
        av = h[jnp.minimum(acd[:, 1], h.shape[0] - 1)]
        bv = Av[jnp.minimum(acd[:, 2], Av.shape[0] - 1)]
        while bv.ndim < av.ndim:
            bv = bv[..., None]
        partial = segment_reduce(av * bv, acd[:, 0], plan.P * plan.B,
                                 "sum", indices_are_sorted=True)
        out = jax.lax.psum_scatter(
            partial.reshape((plan.P, plan.B) + partial.shape[1:]),
            axis, scatter_dimension=0, tiled=False)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(plan.P, plan.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P_(axis), P_(), P_(axis)),
            out_specs=P_(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, plan.acd_loc)
        return out.reshape(plan.P * plan.B, -1)

    return jax.jit(run)


def plan_exchange_volumes(acd: np.ndarray, nnz_pad: int, P: int) -> dict:
    """Per-device exchanged row counts (padded, what actually moves) for
    the two partitioned strategies — pick the smaller before building:

    - "overlapped" (v3): all_gather of input boundary pools, P*Bnd rows
    - "scatter" (v4): all_to_all of pre-reduced output bands, P*Bpq rows
    - "reduce_scatter" (v6): full-range partials summed into ownership
      bands, P*B rows — structure-independent, the floor for dense
      exchanges

    Also reports "ring_peak" (v5): the ppermute ring moves the same
    total rows as overlapped but holds only one block's pool (Bnd rows)
    at a time — the knob that matters when P*Bnd itself won't fit.
    """
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    a = acd[0][real].astype(np.int64)
    c = acd[1][real].astype(np.int64)
    B = nnz_pad // P
    a_owner = np.minimum(a // B, P - 1)
    c_owner = np.minimum(c // B, P - 1)
    cross = a_owner != c_owner
    bnd = 0
    bpq = 0
    for q in range(P):
        rows = np.unique(c[cross & (c_owner == q)])
        bnd = max(bnd, len(rows))
    for p in range(P):
        for q in range(P):
            if p != q:
                bpq = max(bpq, len(np.unique(
                    a[cross & (c_owner == p) & (a_owner == q)])))
    return {"overlapped": P * max(bnd, 1), "scatter": P * max(bpq, 1),
            "reduce_scatter": nnz_pad, "ring_peak": max(bnd, 1)}


def choose_partitioned_spspmm(mesh: Mesh, acd: np.ndarray, nnz_pad: int,
                              axis: str = "sp",
                              max_boundary_rows: Optional[int] = None):
    """Build whichever partitioned contraction moves fewer rows.

    ``max_boundary_rows`` caps the per-device exchanged-row footprint: a
    strategy whose resident exchange buffer exceeds it is disqualified,
    and when both buffer-at-once strategies bust the cap the ppermute
    ring (v5) is used — same bytes on the wire as overlapped, but only
    one block's boundary pool resident per step."""
    vols = plan_exchange_volumes(acd, nnz_pad, mesh.shape[axis])
    P = mesh.shape[axis]
    cap = max_boundary_rows if max_boundary_rows is not None else np.inf
    builders = {
        "scatter": (build_scatter_shard_plan, make_scatter_spspmm),
        "overlapped": (build_overlapped_shard_plan, make_overlapped_spspmm),
        "reduce_scatter": (build_reduce_scatter_shard_plan,
                           make_reduce_scatter_spspmm),
    }
    # tie-break: reduce_scatter (one fused collective, no boundary
    # planning) > overlapped > scatter.  reduce_scatter can only tie the
    # pool gather on row count (Bnd <= B), so the rank is what selects
    # it on fully-entangled graphs.
    rank = {"reduce_scatter": 0, "overlapped": 1, "scatter": 2}
    fitting = [(vols[k], rank[k], k) for k in builders if vols[k] <= cap]
    if fitting:
        _, _, name = min(fitting)
        build, make = builders[name]
        plan = build(acd, nnz_pad, P)
        return make(mesh, plan, axis), name, vols
    plan = build_ring_shard_plan(acd, nnz_pad, P)
    return make_ring_spspmm(mesh, plan, axis), "ring", vols


# ---------------------------------------------------------------------------
# v7: fused-kernel overlapped strategy (local + boundary contractions on
# the Pallas chunk kernel)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FusedOverlappedShardPlan:
    """OverlappedShardPlan (v3) whose two per-shard contractions run on
    the fused Pallas chunk kernel instead of XLA gather+segment-sum.

    Per shard p there are two triple sets (tuple_parallel.py v3):
    local ``out[t] += h[u] * Av[v]`` with t, u inside the own block, and
    boundary ``out[t] += pool[u] * Av[v]`` over the all_gathered
    boundary pool.  Each gets a (fwd, dX, dA) ChunkPlan triple
    (kernels/fused_spspmm.py) built host-side with one shared geometry
    and a common padded chunk count, so the plan pytrees stack on a
    leading P axis and shard over the mesh like any other array.
    The fused kernel is 3.1x XLA at giant-graph scale (BENCHMARKS.md),
    which is exactly the regime this module exists for."""

    base: OverlappedShardPlan
    loc_plans: tuple    # (fwd, dx, da) ChunkPlans, arrays stacked on P
    bnd_plans: tuple


jax.tree_util.register_dataclass(
    FusedOverlappedShardPlan,
    data_fields=["base", "loc_plans", "bnd_plans"], meta_fields=[])


def build_fused_overlapped_shard_plan(
        acd: np.ndarray, nnz_pad: int, P_: int, n_edge_rows: int,
        D: int = 128, geoms: Optional[dict] = None, kind: str = "chunk",
) -> FusedOverlappedShardPlan:
    """Build the v3 partition plus per-shard fused-kernel plans.

    ``n_edge_rows`` is the (padded) row count of the edge-value operand
    Av; ``D`` the feature dim the cost model autotunes for (the kernel
    itself requires D % 128 == 0 at run time).  ``geoms`` overrides the
    per-role geometry dict (build_spspmm_plans_for format).

    ``kind``: "chunk" (v1) or "strip" (v2).  Strip plans stack across
    shards via a common per-block step table (build_strip_plan
    ``steps_per_block``): shared oblk means shared launch_splits
    (pytree meta), so multi-launch giant-graph shards stack too.  Only
    a geometry the strip planner itself refuses (a single output block
    spanning more grid steps than the Mosaic ceiling) falls the build
    back to chunk plans with a warning."""
    from ..kernels.fused_spspmm import (DEFAULT_C, DEFAULT_R, DEFAULT_S,
                                        autotune_spspmm_geoms,
                                        build_spspmm_plans_for)

    base = build_overlapped_shard_plan(acd, nnz_pad, P_)
    B = base.B
    pool_rows = max(P_ * base.Bnd, 1)

    def tris_of(arr):
        arr = np.asarray(arr)
        return [np.stack([arr[p, :, 0], arr[p, :, 1], arr[p, :, 2]])
                .astype(np.int64) for p in range(P_)]

    def plans_for_chunk(tris, u_rows):
        g = geoms
        if g is None:
            counts = [int(np.sum(t[0] < PAD_INDEX)) for t in tris]
            if max(counts) == 0:
                gd = (DEFAULT_C, DEFAULT_R, DEFAULT_S)
                g = {"fwd": gd, "dx": gd, "da": gd}
            else:
                # autotune once on the densest shard; one geometry for
                # all shards keeps the plan pytrees stackable
                g = autotune_spspmm_geoms(tris[int(np.argmax(counts))],
                                          u_rows, n_edge_rows, B, D=D)
        built = [build_spspmm_plans_for(t, u_rows, n_edge_rows, B, g)
                 for t in tris]
        pad = max(p.n_chunks for ps in built for p in ps)
        built = [build_spspmm_plans_for(t, u_rows, n_edge_rows, B, g,
                                        pad_chunks_to=pad) for t in tris]
        return jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *built)

    def plans_for_strip(tris, u_rows):
        from ..kernels.strip_spspmm import (autotune_strip_geoms,
                                            build_spspmm_strip_plans)

        g = geoms
        if g is None:
            counts = [int(np.sum(t[0] < PAD_INDEX)) for t in tris]
            gd = (256, 256, 512, 128, 128)
            g = ({"fwd": gd, "dx": gd, "da": gd} if max(counts) == 0
                 else autotune_strip_geoms(
                     tris[int(np.argmax(counts))], u_rows, n_edge_rows,
                     B, D=D))
        built = [build_spspmm_strip_plans(t, u_rows, n_edge_rows, B, g)
                 for t in tris]
        # pad every shard to a COMMON per-block step table: plans then
        # share oblk — hence launch_splits (pytree meta) — so they stack
        # even when the grid needs Mosaic's multi-launch split.  An
        # unpadded plan's oblk repeats block b exactly its natural step
        # count, so bincount recovers the per-shard tables directly.
        spb = {}
        for i, role in enumerate(("fwd", "dx", "da")):
            nb = built[0][i].out_rows // built[0][i].S
            spb[role] = np.stack(
                [np.bincount(np.asarray(ps[i].oblk), minlength=nb)
                 for ps in built]).max(axis=0)
        built = [build_spspmm_strip_plans(t, u_rows, n_edge_rows, B, g,
                                          steps_per_block_to=spb)
                 for t in tris]
        return jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *built)

    plans_for = plans_for_strip if kind == "strip" else plans_for_chunk
    from ..kernels.strip_spspmm import StripPlanError as _StripPlanError
    try:
        loc_plans = plans_for(tris_of(base.acd_loc), B)
        bnd_plans = plans_for(tris_of(base.acd_bnd), pool_rows)
    except (_StripUnstackable, _StripPlanError) as ex:
        # _StripPlanError: the strip planner itself refused the geometry
        # (e.g. one output block alone exceeds the grid ceiling, or the
        # common step table fails to dominate a shard).  A dedicated
        # exception — not AssertionError — so the fallback still fires
        # under `python -O` and genuine planner bugs stay loud.
        if kind != "strip":
            raise
        import warnings

        warnings.warn(f"v7 strip plans not stackable ({ex}); "
                      f"falling back to chunk plans")
        loc_plans = plans_for_chunk(tris_of(base.acd_loc), B)
        bnd_plans = plans_for_chunk(tris_of(base.acd_bnd), pool_rows)
    return FusedOverlappedShardPlan(base=base, loc_plans=tuple(loc_plans),
                                    bnd_plans=tuple(bnd_plans))


class _StripUnstackable(Exception):
    """Legacy marker (pre-common-split-table builds): a shard's strip
    plan exceeded the single-launch grid ceiling.  Kept for API compat;
    the builder now stacks multi-launch plans via common per-block step
    tables and only AssertionError (planner refusal) triggers the chunk
    fallback."""


def _fused_overlapped_contract(h, Av, send_row, lp, bp, B, axis):
    """Shard-level body of the fused v7 contraction: all_gather the
    boundary pool (async; the local fused kernel runs under it), then
    both contractions on the chunk kernel via the differentiable
    fused_spspmm (custom VJP; the all_gather's transpose routes the
    pool's gradient back to its owners)."""
    from ..kernels.fused_spspmm import fused_spspmm, get_fused_math
    from ..kernels.strip_spspmm import StripPlan, fused_spspmm_strip

    pool = jax.lax.all_gather(h[send_row], axis)       # (P, Bnd, D)
    flat = pool.reshape(-1, h.shape[-1])
    exact = get_fused_math()
    run = (fused_spspmm_strip if isinstance(lp[0], StripPlan)
           else fused_spspmm)
    h32 = h.astype(jnp.float32)
    av32 = Av.astype(jnp.float32)
    out = run(h32, av32, lp[0], lp[1], lp[2], None, exact)[:B]
    outb = run(flat.astype(jnp.float32), av32,
               bp[0], bp[1], bp[2], None, exact)[:B]
    return (out + outb).astype(h.dtype)


def make_fused_overlapped_spspmm(mesh: Mesh, plan: FusedOverlappedShardPlan,
                                 axis: str = "sp"):
    """Standalone jitted runner (parity with make_overlapped_spspmm)."""
    base = plan.base

    def body(Xb, Av, send_l, lp, bp):
        out = _fused_overlapped_contract(
            Xb[0], Av, send_l[0],
            jax.tree.map(lambda x: x[0], lp),
            jax.tree.map(lambda x: x[0], bp), base.B, axis)
        return out[None]

    def run(Xvals: jax.Array, Avals: jax.Array) -> jax.Array:
        Xs = Xvals.reshape(base.P, base.B, -1)
        f = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )
        out = f(Xs, Avals, base.send_idx, plan.loc_plans, plan.bnd_plans)
        return out.reshape(base.P * base.B, -1)

    return jax.jit(run)
