"""Fused sparse contraction kernel (Pallas TPU) + host-side chunk planner.

The computation is the spspmm hot loop (reference backend/Spspmm.py:307-321):

    out[t] += U[u] * V[v]    for triples (t, u, v), t sorted ascending

XLA executes this as two materialized gathers + a scatter-add (3+ HBM
round trips over the (K, D) intermediate).  The fused kernel streams
VMEM-resident blocks instead:

- The host packs the triple array into *chunks* of C triples such that
  each chunk's u-indices fall inside one aligned R-row window of U, its
  v-indices inside one R-row window of V, and its t-indices inside one
  aligned S-row window of the output (build_chunk_plan).  For
  block-diagonal graph batches this locality always exists: a chunk's
  triples belong to one or two graphs whose rows are contiguous.
- Each grid step DMAs those three blocks (Pallas pipelines them), forms
  the gathers as one-hot matmuls on the MXU (a (C, R) 0/1 matrix times
  the (R, D) block), multiplies, and segment-reduces with a second
  one-hot matmul onto the (S, D) output block.  Consecutive chunks
  mapping to the same output block accumulate in VMEM (revisit pattern);
  the block is spilled to HBM exactly once.

The backward pass reuses the same kernel with role-permuted triples
(dU[u] += g[t] * V[v] and dV[v] += U[u] * g[t]) whose plans are also
host-precomputed — the custom_vjp never builds indices on device
(SURVEY.md §7.2 hard part #2).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..backend.indexing import PAD_INDEX

# chunk geometry defaults: C triples per chunk, R-row operand windows,
# S-row output windows.  R/S must be multiples of 8 (f32 sublane), and
# lane dim D is the feature dim (>= 128 ideal).
DEFAULT_C = 512
DEFAULT_R = 1024
DEFAULT_S = 512


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Host-built execution plan for one fused contraction."""
    tuv_local: jax.Array   # i32[n_chunks, 3, C] block-local (t, u, v)
    ublk: jax.Array        # i32[n_chunks] U block index per chunk
    vblk: jax.Array        # i32[n_chunks] V block index per chunk
    oblk: jax.Array        # i32[n_chunks] output block index per chunk
    C: int
    R: int
    S: int
    out_rows: int          # padded output rows (multiple of S)

    @property
    def n_chunks(self) -> int:
        return self.tuv_local.shape[0]


jax.tree_util.register_dataclass(
    ChunkPlan,
    data_fields=["tuv_local", "ublk", "vblk", "oblk"],
    meta_fields=["C", "R", "S", "out_rows"],
)


def build_chunk_plan(
    tuv: np.ndarray,
    u_rows: int,
    v_rows: int,
    out_rows: int,
    C: int = DEFAULT_C,
    R: int = DEFAULT_R,
    S: int = DEFAULT_S,
    pad_chunks_to: Optional[int] = None,
) -> ChunkPlan:
    """Greedy chunker: walk the (3, K) triple array (sorted by t; padded
    PAD_INDEX rows allowed at the end and dropped) and cut chunks of at
    most C triples whose u / v indices fit in one aligned R window and
    whose t indices fit in one aligned S window.

    Also inserts zero-work chunks for output blocks no triple touches, so
    every output row is written (empty segments must be 0, matching the
    scatter semantics)."""
    tuv = np.asarray(tuv)
    t, u, v = tuv[0], tuv[1], tuv[2]
    K = int(np.sum(t < PAD_INDEX))  # real triples
    t, u, v = t[:K].astype(np.int64), u[:K].astype(np.int64), \
        v[:K].astype(np.int64)
    assert out_rows % S == 0, "out_rows must be a multiple of S"
    assert np.all(np.diff(t) >= 0), "triples must be sorted by t"

    from .. import native as _native

    chunks = []  # (start, end, ublk, vblk, oblk)
    host = _native.get()
    if host is not None and K > 0:
        starts, ends, ubs, vbs, obs = host.chunk_bounds(
            np.ascontiguousarray(t), np.ascontiguousarray(u),
            np.ascontiguousarray(v), C, R, S)
        chunks = list(zip(starts.tolist(), ends.tolist(), ubs.tolist(),
                          vbs.tolist(), obs.tolist()))
    else:
        start = 0
        while start < K:
            end_max = min(start + C, K)
            ub = u[start] // R
            vb = v[start] // R
            ob = t[start] // S
            sl = slice(start, end_max)
            ok = ((u[sl] // R == ub) & (v[sl] // R == vb)
                  & (t[sl] // S == ob))
            bad = np.nonzero(~ok)[0]
            end = start + (int(bad[0]) if len(bad) else (end_max - start))
            assert end > start
            chunks.append((start, end, int(ub), int(vb), int(ob)))
            start = end

    # insert empty chunks for untouched output blocks
    touched = set(c[4] for c in chunks)
    n_oblk = out_rows // S
    all_chunks = []
    ci = 0
    for ob in range(n_oblk):
        # emit chunks for this block in order
        while ci < len(chunks) and chunks[ci][4] == ob:
            all_chunks.append(chunks[ci])
            ci += 1
        if ob not in touched:
            all_chunks.append((0, 0, 0, 0, ob))  # zero-work chunk
    assert ci == len(chunks)

    # pad the chunk count to a stable size (zero-work chunks re-visiting
    # the last output block) so jit shapes don't depend on the batch
    if pad_chunks_to is not None:
        assert pad_chunks_to >= len(all_chunks), (pad_chunks_to,
                                                  len(all_chunks))
        last_ob = all_chunks[-1][4] if all_chunks else 0
        while len(all_chunks) < pad_chunks_to:
            all_chunks.append((0, 0, 0, 0, last_ob))

    n = len(all_chunks)
    tuv_local = np.zeros((n, 3, C), dtype=np.int32)
    tuv_local[:, 0, :] = S  # t sentinel => one-hot row all-zero
    ublk = np.zeros((n,), np.int32)
    vblk = np.zeros((n,), np.int32)
    oblk = np.zeros((n,), np.int32)
    for i, (s0, e0, ub, vb, ob) in enumerate(all_chunks):
        m = e0 - s0
        if m > 0:
            tuv_local[i, 0, :m] = t[s0:e0] - ob * S
            tuv_local[i, 1, :m] = u[s0:e0] - ub * R
            tuv_local[i, 2, :m] = v[s0:e0] - vb * R
        ublk[i], vblk[i], oblk[i] = ub, vb, ob
    # padded entries: u/v local 0 (harmless gather), t = S (dropped)
    return ChunkPlan(
        tuv_local=jnp.asarray(tuv_local), ublk=jnp.asarray(ublk),
        vblk=jnp.asarray(vblk), oblk=jnp.asarray(oblk),
        C=C, R=R, S=S, out_rows=out_rows)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _fused_kernel(C: int, R: int, S: int):
    def kernel(ublk_ref, vblk_ref, oblk_ref, tuv_ref, u_ref, v_ref, o_ref):
        import jax.lax as lax
        from jax.experimental import pallas as pl

        i = pl.program_id(0)
        t_loc = tuv_ref[0, 0, :]   # (C,)
        u_loc = tuv_ref[0, 1, :]
        v_loc = tuv_ref[0, 2, :]

        iota_R = lax.broadcasted_iota(jnp.int32, (C, R), 1)
        onehot_u = jnp.where(u_loc[:, None] == iota_R, 1.0, 0.0) \
            .astype(u_ref.dtype)
        onehot_v = jnp.where(v_loc[:, None] == iota_R, 1.0, 0.0) \
            .astype(v_ref.dtype)
        # HIGHEST precision: the MXU otherwise truncates f32 operands to
        # bf16, corrupting the gathered values (one-hot rows select exact
        # input rows, so full precision must be preserved end to end)
        gu = jnp.dot(onehot_u, u_ref[:], preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
        gv = jnp.dot(onehot_v, v_ref[:], preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
        prod = gu * gv                                     # (C, D)

        iota_S = lax.broadcasted_iota(jnp.int32, (S, C), 0)
        onehot_t = jnp.where(t_loc[None, :] == iota_S, 1.0, 0.0) \
            .astype(prod.dtype)
        acc = jnp.dot(onehot_t, prod, preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)

        first = jnp.logical_or(
            i == 0, oblk_ref[i] != oblk_ref[jnp.maximum(i - 1, 0)])

        from jax.experimental import pallas as pl

        @pl.when(first)
        def _():
            o_ref[:] = acc.astype(o_ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[:] = o_ref[:] + acc.astype(o_ref.dtype)

    return kernel


def _auto_interpret(interpret):
    if interpret is None:
        # Pallas TPU kernels only compile on TPU; interpret elsewhere
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_contract(U: jax.Array, V: jax.Array, plan: ChunkPlan,
                   interpret: Optional[bool] = None) -> jax.Array:
    """Execute out[t] += U[u] * V[v] per ``plan``.  U, V: (rows, D) with
    rows a multiple of plan.R (pad on host).  Returns (plan.out_rows, D).
    """
    interpret = _auto_interpret(interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, R, S = plan.C, plan.R, plan.S
    D = U.shape[-1]
    assert U.shape[0] % R == 0 and V.shape[0] % R == 0, (
        "operand rows must be padded to a multiple of R")
    n_chunks = plan.n_chunks

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 3, C), lambda i, ub, vb, ob: (i, 0, 0)),
            pl.BlockSpec((R, D), lambda i, ub, vb, ob: (ub[i], 0)),
            pl.BlockSpec((R, D), lambda i, ub, vb, ob: (vb[i], 0)),
        ],
        out_specs=pl.BlockSpec((S, D), lambda i, ub, vb, ob: (ob[i], 0)),
    )
    flops = 2 * n_chunks * (2 * C * R * D + S * C * D)
    out = pl.pallas_call(
        _fused_kernel(C, R, S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.out_rows, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_chunks * (2 * R + S) * D * 4,
            transcendentals=0),
        interpret=interpret,
    )(plan.ublk, plan.vblk, plan.oblk, plan.tuv_local, U, V)
    return out


# ---------------------------------------------------------------------------
# spspmm plans (forward + both gradients) and custom_vjp
# ---------------------------------------------------------------------------


def build_spspmm_plans(
    acd: np.ndarray,
    x_rows: int,
    a_rows: int,
    out_rows: int,
    C: int = DEFAULT_C,
    R: int = DEFAULT_R,
    S: int = DEFAULT_S,
    pad_chunks_to: Optional[int] = None,
) -> Tuple[ChunkPlan, ChunkPlan, ChunkPlan]:
    """Build (forward, dX, dA) plans from the padded acd triples
    (a = output tuple, c = X row, d = A row; sorted by a).

    - forward: out[a] += X[c] * A[d]          triples (a, c, d)
    - dX:      dX[c] += g[a] * A[d]           triples (c, a, d) sorted by c
    - dA:      dA[d] += X[c] * g[a]           triples (d, c, a) sorted by d

    x_rows / a_rows / out_rows are the padded row counts (multiples of R
    resp. S are enforced by rounding up — callers pad values accordingly).
    """
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return ((n + m - 1) // m) * m

    fwd = build_chunk_plan(np.stack([a, c, d]), rup(x_rows, R),
                           rup(a_rows, R), rup(out_rows, S), C, R, S,
                           pad_chunks_to)
    o1 = np.argsort(c, kind="stable")
    dx = build_chunk_plan(np.stack([c, a, d])[:, o1], rup(out_rows, R),
                          rup(a_rows, R), rup(x_rows, S), C, R, S,
                          pad_chunks_to)
    o2 = np.argsort(d, kind="stable")
    da = build_chunk_plan(np.stack([d, c, a])[:, o2], rup(x_rows, R),
                          rup(out_rows, R), rup(a_rows, S), C, R, S,
                          pad_chunks_to)
    return fwd, dx, da


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    assert rows > x.shape[0]
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_spspmm(Xv: jax.Array, Av: jax.Array, fwd: ChunkPlan,
                 dxp: ChunkPlan, dap: ChunkPlan,
                 interpret: Optional[bool] = None) -> jax.Array:
    """Differentiable fused spspmm: out[a] = sum_cd X[c] * A[d].

    Returns (fwd.out_rows, D); callers slice back to their padded nnz.
    Sum aggregation only (the only aggr with a matching linear transpose;
    max/mean stay on the XLA path).  The plans are pytrees of int arrays;
    their cotangents are symbolic float0 zeros."""
    Xp = _pad_rows(Xv, ((Xv.shape[0] + fwd.R - 1) // fwd.R) * fwd.R)
    Ap = _pad_rows(Av, ((Av.shape[0] + fwd.R - 1) // fwd.R) * fwd.R)
    return fused_contract(Xp, Ap, fwd, interpret=interpret)


def _plan_zeros(plan: ChunkPlan):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plan)


def _fwd_rule(Xv, Av, fwd, dxp, dap, interpret):
    out = fused_spspmm(Xv, Av, fwd, dxp, dap, interpret)
    return out, (Xv, Av, fwd, dxp, dap)


def _bwd_rule(interpret, res, g):
    Xv, Av, fwd, dxp, dap = res
    R = dxp.R
    gp = _pad_rows(g, ((g.shape[0] + R - 1) // R) * R)
    Ap = _pad_rows(Av, ((Av.shape[0] + R - 1) // R) * R)
    Xp = _pad_rows(Xv, ((Xv.shape[0] + R - 1) // R) * R)
    dX = fused_contract(gp, Ap, dxp, interpret=interpret)[: Xv.shape[0]]
    dA = fused_contract(Xp, gp, dap, interpret=interpret)[: Av.shape[0]]
    return dX, dA, _plan_zeros(fwd), _plan_zeros(dxp), _plan_zeros(dap)


fused_spspmm.defvjp(_fwd_rule, _bwd_rule)
