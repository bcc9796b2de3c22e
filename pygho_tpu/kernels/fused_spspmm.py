"""Fused sparse contraction kernel (Pallas TPU) + host-side chunk planner.

The computation is the spspmm hot loop (reference backend/Spspmm.py:307-321):

    out[t] += U[u] * V[v]    for triples (t, u, v), t sorted ascending

XLA executes this as two materialized gathers + a scatter-add (3+ HBM
round trips over the (K, D) intermediate).  The fused kernel streams
VMEM-resident operand windows instead:

- The host packs the triple array into *chunks* of up to C triples whose
  u-indices span < R rows of U and v-indices span < R rows of V
  (build_chunk_plan; dynamic window bases, so block-diagonal graph
  batches chunk at full C regardless of where graph boundaries fall).
  t-indices stay inside one aligned S window of the output.
- Each grid step double-buffer-DMAs the two (R, D) windows from HBM at
  the chunk's dynamic row offsets (scalar-prefetched bases), forms the
  gathers as one-hot matmuls on the MXU, multiplies, and segment-reduces
  with a second one-hot matmul onto the (S, D) output block.
  Consecutive chunks mapping to the same output block accumulate in VMEM
  (revisit pattern); each block spills to HBM once.
- Math modes: ``exact`` decomposes f32 values into three bf16 terms
  (three MXU passes, f32-accurate results — the MXU would otherwise
  truncate f32 operands); ``fast`` runs one bf16 pass (training-grade
  precision).

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
# S-row output windows.
DEFAULT_C = 512
DEFAULT_R = 320
DEFAULT_S = 512

# default math mode for the operator-layer fused path: True = f32-exact
# (3 bf16 MXU passes), False = single bf16 pass (~2x faster contractions,
# training-grade precision).  Flip globally with set_fused_math.
_DEFAULT_EXACT = True


def set_fused_math(exact: bool) -> None:
    global _DEFAULT_EXACT
    _DEFAULT_EXACT = bool(exact)


def get_fused_math() -> bool:
    return _DEFAULT_EXACT


@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    """Host-built execution plan for one fused contraction.

    ``uslot/vslot`` assign each chunk's operand window to one of two VMEM
    buffers and ``udma/vdma`` flag whether a fresh DMA is needed —
    consecutive chunks over the same window (common: a graph's tuples
    span several chunks) reuse the resident buffer instead of re-reading
    HBM."""
    tuv_local: jax.Array   # i32[n_chunks, 3, C] window-local (t, u, v)
    ubase: jax.Array       # i32[n_chunks] U window start row (element units)
    vbase: jax.Array       # i32[n_chunks] V window start row
    oblk: jax.Array        # i32[n_chunks] output block index (S units)
    uslot: jax.Array       # i32[n_chunks] buffer slot for the U window
    vslot: jax.Array
    udma: jax.Array        # i32[n_chunks] 1 = DMA the window for this chunk
    vdma: jax.Array
    oslot: jax.Array       # i32[n_chunks] output VMEM slot (packed kernel)
    owait: jax.Array       # i32[n_chunks] 1 = wait slot's prior flush first
    owait_blk: jax.Array   # i32[n_chunks] HBM block of that prior flush
    otail: jax.Array       # i32[2, 2] per slot: (pending?, block) at end
    C: int
    R: int
    S: int
    out_rows: int          # padded output rows (multiple of S)
    u_rows: int            # required padded U rows (window clamp bound)
    v_rows: int
    Rv: int = 0            # v window rows; 0 means "same as R" (legacy)
    slots: int = 2         # operand VMEM buffers; prefetch depth slots-1
    G: int = 1             # chunks per grid step (packed kernel if > 1)
    # window-base alignment achieved per operand (1 = unaligned).  A
    # 16-aligned base lets the kernel DMA bf16 operands as (rows/16, 16,
    # D) groups — dynamic slices on a *tiled* bf16 dim fail Mosaic's
    # divisibility proof, but the grouped view's leading dim is untiled.
    u_align: int = 1
    v_align: int = 1

    @property
    def r_v(self) -> int:
        return self.Rv or self.R

    @property
    def n_chunks(self) -> int:
        return self.tuv_local.shape[0]


def _slots_and_dmas(bases: np.ndarray, n_slots: int = 2):
    """Cycle buffer slots on window changes; skip DMAs on repeats.
    ``n_slots`` > 2 enables prefetch deeper than one chunk (the kernel
    prefetches ``n_slots - 1`` ahead; a slot is only rewritten after its
    chunk's compute step has retired)."""
    n = bases.shape[0]
    slots = np.zeros(n, np.int32)
    dmas = np.zeros(n, np.int32)
    slot = 0
    for i in range(n):
        if i == 0 or bases[i] != bases[i - 1]:
            if i > 0:
                slot = (slot + 1) % n_slots
            dmas[i] = 1
        slots[i] = slot
    return slots, dmas


jax.tree_util.register_dataclass(
    ChunkPlan,
    data_fields=["tuv_local", "ubase", "vbase", "oblk", "uslot", "vslot",
                 "udma", "vdma", "oslot", "owait", "owait_blk", "otail"],
    meta_fields=["C", "R", "S", "out_rows", "u_rows", "v_rows", "Rv",
                 "slots", "G", "u_align", "v_align"],
)

try:
    # allow jax.export to serialize batches carrying fused-kernel plans
    # (models.serve.export_forward with build_plans=True)
    import json as _json

    from jax import export as _jexport

    _jexport.register_pytree_node_serialization(
        ChunkPlan,
        serialized_name="pygho_tpu.kernels.ChunkPlan",
        serialize_auxdata=lambda aux: _json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda b: tuple(_json.loads(bytes(b).decode())),
    )
except Exception:  # pragma: no cover - jax without the export API
    pass


def build_chunk_plan(
    tuv: np.ndarray,
    u_rows: int,
    v_rows: int,
    out_rows: int,
    C: int = DEFAULT_C,
    R: int = DEFAULT_R,
    S: int = DEFAULT_S,
    pad_chunks_to: Optional[int] = None,
    Rv: Optional[int] = None,
    n_slots: int = 2,
    pack: int = 1,
    base_align: int = 16,
) -> ChunkPlan:
    """Greedy chunker with dynamic operand windows: walk the (3, K)
    triple array (sorted by t; PAD_INDEX rows at the end are dropped) and
    cut chunks of at most C triples whose u / v index *ranges* stay below
    R / ``Rv`` and whose t indices stay inside one aligned S window.

    ``Rv`` (default R) narrows the v operand's window independently —
    useful when V is a much smaller array than U (edge values vs tuple
    values): the kernel's v gather one-hot matmul is (C, Rv) @ (Rv, D),
    so a narrower Rv cuts its FLOPs and VMEM without fragmenting chunks
    on the u side.

    Inserts zero-work chunks for untouched output blocks (empty segments
    must come out 0) and optionally pads the chunk count to a stable
    size.

    ``base_align`` (default 16) keeps every window base a multiple of
    that many rows — required for bf16-operand DMA (grouped-view trick,
    see ChunkPlan.u_align) — at the cost of chunking with an effective
    index-range bound of R - base_align + 1.  Alignment is applied
    per-operand only where R/Rv and the operand row counts are themselves
    multiples of it (recorded in u_align/v_align)."""
    tuv = np.asarray(tuv)
    Rv = R if Rv is None else Rv
    t, u, v = tuv[0], tuv[1], tuv[2]
    K = int(np.sum(t < PAD_INDEX))
    t = t[:K].astype(np.int64)
    u = u[:K].astype(np.int64)
    v = v[:K].astype(np.int64)
    assert out_rows % S == 0, "out_rows must be a multiple of S"
    assert u_rows >= R and v_rows >= Rv, "operand rows must be >= R"
    assert np.all(np.diff(t) >= 0), "triples must be sorted by t"
    au = base_align if (base_align > 1 and R % base_align == 0
                        and u_rows % base_align == 0) else 1
    av = base_align if (base_align > 1 and Rv % base_align == 0
                        and v_rows % base_align == 0) else 1
    R_eff = R - (au - 1)
    Rv_eff = Rv - (av - 1)

    from .. import native as _native

    # Opportunistic base quantization: when a chunk's index range leaves
    # slack, snap the window base down to a coarse grid — nearby chunks
    # then share bases exactly and the kernel skips their window DMAs.
    # Chunking itself keeps the full R_eff range (no extra fragmentation).
    Qu = max((R // 4) // au * au, au, 8 if au == 1 else au)
    Qv = max((Rv // 4) // av * av, av, 8 if av == 1 else av)

    host = _native.get()
    chunks = []  # (start, end, ubase, vbase, oblk)
    if host is not None and K > 0 and hasattr(host, "chunk_bounds_dyn2"):
        starts, ends, ubs, vbs, obs = host.chunk_bounds_dyn2(
            np.ascontiguousarray(t), np.ascontiguousarray(u),
            np.ascontiguousarray(v), C, R_eff, Rv_eff, S)
        chunks = list(zip(starts.tolist(), ends.tolist(), ubs.tolist(),
                          vbs.tolist(), obs.tolist()))
    elif host is not None and K > 0 and Rv_eff == R_eff and hasattr(
            host, "chunk_bounds_dyn"):
        starts, ends, ubs, vbs, obs = host.chunk_bounds_dyn(
            np.ascontiguousarray(t), np.ascontiguousarray(u),
            np.ascontiguousarray(v), C, R_eff, S)
        chunks = list(zip(starts.tolist(), ends.tolist(), ubs.tolist(),
                          vbs.tolist(), obs.tolist()))
    else:
        start = 0
        while start < K:
            end_max = min(start + C, K)
            sl = slice(start, end_max)
            umin = np.minimum.accumulate(u[sl])
            umax = np.maximum.accumulate(u[sl])
            vmin = np.minimum.accumulate(v[sl])
            vmax = np.maximum.accumulate(v[sl])
            ok = ((umax - umin < R_eff) & (vmax - vmin < Rv_eff)
                  & (t[sl] // S == t[start] // S))
            bad = np.nonzero(~ok)[0]
            end = start + (int(bad[0]) if len(bad) else (end_max - start))
            assert end > start
            chunks.append((start, end,
                           int(u[start:end].min()), int(v[start:end].min()),
                           int(t[start] // S)))
            start = end
    # snap each base to the Q grid when the range still fits in the
    # window; always land on the a_ alignment grid (range < R - a_ + 1
    # guarantees the aligned-down base still covers the chunk)
    def snap(lo_, hi_, rows, win, q_, a_):
        q = (lo_ // q_) * q_
        base = q if hi_ - q < win else (lo_ // a_) * a_
        return min(base, rows - win)

    chunks = [(s0, e0,
               snap(ub, int(u[s0:e0].max()) if e0 > s0 else ub, u_rows, R,
                    Qu, au),
               snap(vb, int(v[s0:e0].max()) if e0 > s0 else vb, v_rows, Rv,
                    Qv, av),
               ob)
              for (s0, e0, ub, vb, ob) in chunks]

    # insert zero-work chunks for untouched output blocks, in oblk order;
    # they inherit the previous chunk's window bases (their compute is
    # all-zero regardless) so DMA-reuse runs are not broken
    touched = set(c[4] for c in chunks)
    n_oblk = out_rows // S
    all_chunks = []
    ci = 0
    for ob in range(n_oblk):
        while ci < len(chunks) and chunks[ci][4] == ob:
            all_chunks.append(chunks[ci])
            ci += 1
        if ob not in touched:
            pu, pv = (all_chunks[-1][2], all_chunks[-1][3])                 if all_chunks else (0, 0)
            all_chunks.append((0, 0, pu, pv, ob))
    assert ci == len(chunks)

    if pad_chunks_to is not None:
        assert pad_chunks_to >= len(all_chunks), (pad_chunks_to,
                                                  len(all_chunks))
        lu, lv, last_ob = ((all_chunks[-1][2], all_chunks[-1][3],
                            all_chunks[-1][4]) if all_chunks else (0, 0, 0))
        while len(all_chunks) < pad_chunks_to:
            all_chunks.append((0, 0, lu, lv, last_ob))
    if pack > 1:           # pad total count to a step-multiple (zero work)
        lu, lv, last_ob = ((all_chunks[-1][2], all_chunks[-1][3],
                            all_chunks[-1][4]) if all_chunks else (0, 0, 0))
        while len(all_chunks) % pack:
            all_chunks.append((0, 0, lu, lv, last_ob))

    n = len(all_chunks)
    ca = np.asarray(all_chunks, dtype=np.int64).reshape(n, 5)
    starts_a, ends_a = ca[:, 0], ca[:, 1]
    ubase = ca[:, 2].astype(np.int32)
    vbase = ca[:, 3].astype(np.int32)
    oblk = ca[:, 4].astype(np.int32)
    # vectorized local-index fill: row r of chunk i sits at (i, r - start_i)
    tuv_local = np.zeros((n, 3, C), dtype=np.int32)
    tuv_local[:, 0, :] = S  # t sentinel: one-hot row all-zero => dropped
    lens = (ends_a - starts_a).astype(np.int64)
    if lens.sum() > 0:
        cid = np.repeat(np.arange(n), lens)
        row = np.concatenate([np.arange(s0, e0)
                              for s0, e0 in zip(starts_a, ends_a)
                              if e0 > s0]).astype(np.int64)
        pos = np.arange(len(row)) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        tuv_local[cid, 0, pos] = (t[row] - ca[cid, 4] * S).astype(np.int32)
        tuv_local[cid, 1, pos] = (u[row] - ca[cid, 2]).astype(np.int32)
        tuv_local[cid, 2, pos] = (v[row] - ca[cid, 3]).astype(np.int32)
    if pack > 1:
        # the packed kernel keeps up to 2*pack chunks' windows in flight
        # (current step's compute + next step's prefetch)
        n_slots = max(n_slots, 2 * pack + 1)
    uslot, udma = _slots_and_dmas(ubase, n_slots)
    vslot, vdma = _slots_and_dmas(vbase, n_slots)
    # Output-slot bookkeeping for the packed kernel: slots alternate at
    # block transitions.  At a transition the kernel (a) waits the flush
    # previously issued FROM the slot it is about to start filling
    # (owait/owait_blk), then (b) issues the flush of the block just
    # finished from the other slot.  `otail` records, per slot, any
    # flush still in flight when the grid ends (plus the slot of the
    # final explicit flush) so the last step can drain everything.
    # Only the packed kernel reads these — skip the Python walk on the
    # (hot) default path and ship zeros with the same pytree shapes.
    nck = len(oblk)
    owait = np.zeros(nck, np.int32)
    owait_blk = np.zeros(nck, np.int32)
    otail = np.zeros((2, 2), np.int32)
    if pack > 1:
        oslot, ofirst = _slots_and_dmas(oblk, 2)
        pending: dict = {0: None, 1: None}
        for ci in range(1, nck):
            if ofirst[ci]:
                s = int(oslot[ci])
                if pending[s] is not None:
                    owait[ci] = 1
                    owait_blk[ci] = pending[s]
                    pending[s] = None
                pending[1 - s] = int(oblk[ci - 1])
        if nck:
            last_slot = int(oslot[-1])
            if pending[last_slot] is not None:   # drained pre final flush
                otail[last_slot] = (1, pending[last_slot])
                pending[last_slot] = None
            if pending[1 - last_slot] is not None:
                otail[1 - last_slot] = (1, pending[1 - last_slot])
    else:
        oslot = np.zeros(nck, np.int32)
    # keep numpy: device transfer happens in one bulk device_put with the
    # rest of the batch (per-array transfers are RTT-bound on remote TPUs)
    return ChunkPlan(
        tuv_local=tuv_local, ubase=ubase, vbase=vbase, oblk=oblk,
        uslot=uslot, vslot=vslot, udma=udma, vdma=vdma,
        oslot=oslot, owait=owait, owait_blk=owait_blk, otail=otail,
        C=C, R=R, S=S, out_rows=out_rows, u_rows=u_rows, v_rows=v_rows,
        Rv=Rv, slots=n_slots, G=pack, u_align=au, v_align=av)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _split3(x):
    """Three-term bf16 decomposition: x ~= hi + mid + lo to ~2^-24
    relative — f32-accurate through bf16 MXU passes."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _chunk_math(t_loc, u_loc, v_loc, uw, vw, C, R, S, Rv, exact):
    """One chunk's gather-multiply-scatter as one-hot MXU contractions:
    returns the (S, D) f32 partial for this chunk's output block."""
    import jax.lax as lax

    iota_R = lax.broadcasted_iota(jnp.int32, (C, R), 1)
    onehot_u = jnp.where(u_loc[:, None] == iota_R,
                         1.0, 0.0).astype(jnp.bfloat16)
    iota_Rv = lax.broadcasted_iota(jnp.int32, (C, Rv), 1)
    onehot_v = jnp.where(v_loc[:, None] == iota_Rv,
                         1.0, 0.0).astype(jnp.bfloat16)

    def gathered(onehot, w):
        # a bf16 operand needs no decomposition: one bf16 pass selects it
        # exactly (the one-hot rows are exact in bf16), in every mode
        if exact and w.dtype != jnp.bfloat16:
            return sum(jnp.dot(onehot, part,
                               preferred_element_type=jnp.float32)
                       for part in _split3(w))
        return jnp.dot(onehot, w.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    prod = gathered(onehot_u, uw) * gathered(onehot_v, vw)  # (C, D) f32

    iota_S = lax.broadcasted_iota(jnp.int32, (S, C), 0)
    onehot_t = jnp.where(t_loc[None, :] == iota_S,
                         1.0, 0.0).astype(jnp.bfloat16)
    if exact:
        return sum(jnp.dot(onehot_t, part,
                           preferred_element_type=jnp.float32)
                   for part in _split3(prod))
    return jnp.dot(onehot_t, prod.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _fused_kernel(C: int, R: int, S: int, exact: bool, Rv: int,
                  depth: int = 1, gu: int = 1, gv: int = 1):
    """``gu``/``gv`` > 1: the operand HBM refs arrive as (rows/g, g, D)
    grouped views (bf16 — dynamic slices on the untiled leading dim
    sidestep Mosaic's tile-divisibility proof); window bases are plan-
    aligned to g so the group index is exact."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # packed prefetch meta[chunk] = [ubase, vbase, oblk, uslot, vslot,
    # udma, vdma]: one smem buffer per launch instead of seven (smem is
    # paged per prefetch buffer; multi-launch chained programs
    # overflowed the 1 MB budget — see strip_spspmm._strip_kernel)
    def kernel(meta_ref, tuv_ref, u_hbm, v_hbm,
               o_ref, ubuf, vbuf, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def oblk_ref(c):
            return meta_ref[c, 2]

        def udma_ref(c):
            return meta_ref[c, 5]

        def vdma_ref(c):
            return meta_ref[c, 6]

        def u_copy(chunk):
            ub, us = meta_ref[chunk, 0], meta_ref[chunk, 3]
            src = (u_hbm.at[pl.ds(ub, R)] if gu == 1 else
                   u_hbm.at[pl.ds(ub // gu, R // gu)])
            return pltpu.make_async_copy(
                src, ubuf.at[us], sems.at[us, 0])

        def v_copy(chunk):
            vb, vs = meta_ref[chunk, 1], meta_ref[chunk, 4]
            src = (v_hbm.at[pl.ds(vb, Rv)] if gv == 1 else
                   v_hbm.at[pl.ds(vb // gv, Rv // gv)])
            return pltpu.make_async_copy(
                src, vbuf.at[vs], sems.at[vs, 1])

        # warm-up: issue the first chunk's DMAs plus the prefetch horizon
        # (chunks 1..depth-1); steady state keeps `depth` chunks in
        # flight.  A slot cycles every window change, so with
        # slots = depth + 1 buffers a slot is never rewritten before the
        # grid step that consumes it has retired (TPU grid steps are
        # sequential; only the copies are async).
        @pl.when(i == 0)
        def _():
            u_copy(0).start()
            v_copy(0).start()
            for k in range(1, depth):
                kc = jnp.minimum(k, n - 1)

                @pl.when(jnp.logical_and(k < n, udma_ref(kc) == 1))
                def _():
                    u_copy(kc).start()

                @pl.when(jnp.logical_and(k < n, vdma_ref(kc) == 1))
                def _():
                    v_copy(kc).start()

        # prefetch chunk i+depth's windows only when they change
        nxt = jnp.minimum(i + depth, n - 1)

        @pl.when(jnp.logical_and(i + depth < n, udma_ref(nxt) == 1))
        def _():
            u_copy(nxt).start()

        @pl.when(jnp.logical_and(i + depth < n, vdma_ref(nxt) == 1))
        def _():
            v_copy(nxt).start()

        # wait exactly for DMAs that were issued for THIS chunk
        @pl.when(udma_ref(i) == 1)
        def _():
            u_copy(i).wait()

        @pl.when(vdma_ref(i) == 1)
        def _():
            v_copy(i).wait()
        uw = ubuf[meta_ref[i, 3]]
        vw = vbuf[meta_ref[i, 4]]
        if gu > 1:
            uw = uw.reshape(R, uw.shape[-1])
        if gv > 1:
            vw = vw.reshape(Rv, vw.shape[-1])
        acc = _chunk_math(tuv_ref[0, 0, :], tuv_ref[0, 1, :],
                          tuv_ref[0, 2, :], uw, vw, C, R, S, Rv, exact)

        first = jnp.logical_or(
            i == 0, oblk_ref(i) != oblk_ref(jnp.maximum(i - 1, 0)))

        @pl.when(first)
        def _():
            o_ref[:] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


def _fused_kernel_packed(C: int, R: int, S: int, exact: bool, Rv: int,
                         G: int):
    """G chunks per grid step, amortizing the per-step fixed cost that
    dominates at molecule-scale chunk counts (see BENCHMARKS calibration).
    Steps may span output-block boundaries, so the output block lives in
    a double-buffered VMEM scratch and is flushed to HBM with manual
    async copies at block transitions (bookkept host-side:
    oslot/owait/owait_blk/otail in build_chunk_plan)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(ubase_ref, vbase_ref, oblk_ref, uslot_ref, vslot_ref,
               udma_ref, vdma_ref, oslot_ref, owait_ref, owblk_ref,
               otail_ref, tuv_ref, u_hbm, v_hbm,
               o_hbm, ubuf, vbuf, sems, obuf, osems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        nc = n * G

        def u_copy(chunk):
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(ubase_ref[chunk], R)],
                ubuf.at[uslot_ref[chunk]], sems.at[uslot_ref[chunk], 0])

        def v_copy(chunk):
            return pltpu.make_async_copy(
                v_hbm.at[pl.ds(vbase_ref[chunk], Rv)],
                vbuf.at[vslot_ref[chunk]], sems.at[vslot_ref[chunk], 1])

        def flush(slot, blk):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[pl.ds(blk * S, S)], osems.at[slot])

        # warm-up: step 0's own windows
        @pl.when(i == 0)
        def _():
            u_copy(0).start()
            v_copy(0).start()
            for k in range(1, G):
                kc = jnp.minimum(k, nc - 1)

                @pl.when(jnp.logical_and(k < nc, udma_ref[kc] == 1))
                def _():
                    u_copy(kc).start()

                @pl.when(jnp.logical_and(k < nc, vdma_ref[kc] == 1))
                def _():
                    v_copy(kc).start()

        # prefetch the NEXT step's windows before computing this one
        for k in range(G):
            pf = jnp.minimum((i + 1) * G + k, nc - 1)

            @pl.when(jnp.logical_and((i + 1) * G + k < nc,
                                     udma_ref[pf] == 1))
            def _():
                u_copy(pf).start()

            @pl.when(jnp.logical_and((i + 1) * G + k < nc,
                                     vdma_ref[pf] == 1))
            def _():
                v_copy(pf).start()

        for k in range(G):
            c = i * G + k

            @pl.when(udma_ref[c] == 1)
            def _():
                u_copy(c).wait()

            @pl.when(vdma_ref[c] == 1)
            def _():
                v_copy(c).wait()

            acc = _chunk_math(tuv_ref[k, 0, :], tuv_ref[k, 1, :],
                              tuv_ref[k, 2, :], ubuf[uslot_ref[c]],
                              vbuf[vslot_ref[c]], C, R, S, Rv, exact)
            cp = jnp.maximum(c - 1, 0)
            first = jnp.logical_or(c == 0, oblk_ref[c] != oblk_ref[cp])
            slot = oslot_ref[c]

            @pl.when(jnp.logical_and(first, c > 0))
            def _():
                # drain the flush previously issued FROM this slot, then
                # hand the just-finished block (other slot) to HBM
                @pl.when(owait_ref[c] == 1)
                def _():
                    flush(slot, owblk_ref[c]).wait()

                flush(1 - slot, oblk_ref[cp]).start()

            # static-unrolled store (dynamic-index VMEM writes are shaky
            # on this Mosaic toolchain)
            for s_ in range(2):
                @pl.when(jnp.logical_and(first, slot == s_))
                def _():
                    obuf[s_] = acc

                @pl.when(jnp.logical_and(jnp.logical_not(first),
                                         slot == s_))
                def _():
                    obuf[s_] = obuf[s_] + acc

        # final step: drain everything
        @pl.when(i == n - 1)
        def _():
            last = nc - 1
            sl = oslot_ref[last]

            @pl.when(otail_ref[sl, 0] == 1)
            def _():
                flush(sl, otail_ref[sl, 1]).wait()

            flush(sl, oblk_ref[last]).start()
            flush(sl, oblk_ref[last]).wait()

            @pl.when(otail_ref[1 - sl, 0] == 1)
            def _():
                flush(1 - sl, otail_ref[1 - sl, 1]).wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def fused_contract(U: jax.Array, V: jax.Array, plan: ChunkPlan,
                   interpret: Optional[bool] = None,
                   exact: bool = True) -> jax.Array:
    """Execute out[t] += U[u] * V[v] per ``plan``.  U: (plan.u_rows, D),
    V: (plan.v_rows, D) — pad with _pad_rows.  Returns
    (plan.out_rows, D) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # NOTE: bf16 operands do NOT flip the mode.  In exact mode a bf16
    # operand's gather is a single (already-exact) bf16 pass while the
    # f32 side and the scatter of the f32 product keep their 3-term
    # decomposition — so a bf16 model under set_fused_math(True) still
    # gets an f32-accurate contraction of its bf16 values.
    C, R, S = plan.C, plan.R, plan.S
    Rv = plan.r_v
    D = U.shape[-1]
    assert U.shape[0] >= plan.u_rows and V.shape[0] >= plan.v_rows, (
        "operands must be padded to the plan's row counts")

    # bf16 operands DMA as (rows/16, 16, D) groups — needs 16-aligned
    # window bases from the plan; otherwise cast up to f32 (correct,
    # just wider DMAs).  The packed kernel keeps the f32-only contract.
    def grouping(x, align, win):
        if x.dtype != jnp.bfloat16:
            return x, 1
        if align % 16 or win % 16 or plan.G > 1:
            return x.astype(jnp.float32), 1
        return x[: (x.shape[0] // 16) * 16].reshape(-1, 16, x.shape[-1]), 16

    U, gu = grouping(U, plan.u_align, R)
    V, gv = grouping(V, plan.v_align, Rv)
    if not interpret:
        assert D % 128 == 0, (
            f"fused kernel needs a feature dim that is a multiple of 128 "
            f"(got {D}); use the XLA spspmm path for smaller dims")
    n_chunks = plan.n_chunks

    n_slots = plan.slots
    passes = 3 if exact else 1
    flops = 2 * n_chunks * passes * (C * R * D + C * Rv * D + S * C * D)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=n_chunks * (R + Rv + S) * D * 4,
        transcendentals=0)
    if plan.G > 1:
        # packed: G chunks per grid step, manually-flushed output blocks
        G = plan.G
        assert n_chunks % G == 0, (n_chunks, G)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=11,
            grid=(n_chunks // G,),
            in_specs=[
                pl.BlockSpec((G, 3, C),
                             lambda i, *refs: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((n_slots, R, D), U.dtype),
                pltpu.VMEM((n_slots, Rv, D), V.dtype),
                pltpu.SemaphoreType.DMA((n_slots, 2)),
                pltpu.VMEM((2, S, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            _fused_kernel_packed(C, R, S, exact, Rv, G),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((plan.out_rows, D),
                                           jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(plan.ubase, plan.vbase, plan.oblk, plan.uslot, plan.vslot,
          plan.udma, plan.vdma, plan.oslot, plan.owait, plan.owait_blk,
          plan.otail, plan.tuv_local, U, V)
        return out
    meta = jnp.stack(
        [plan.ubase, plan.vbase, plan.oblk, plan.uslot, plan.vslot,
         plan.udma, plan.vdma], axis=1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 3, C),
                         lambda i, *refs: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((S, D),
                               lambda i, meta: (meta[i, 2], 0)),
        scratch_shapes=[
            pltpu.VMEM((n_slots, R, D) if gu == 1 else
                       (n_slots, R // gu, gu, D), U.dtype),
            pltpu.VMEM((n_slots, Rv, D) if gv == 1 else
                       (n_slots, Rv // gv, gv, D), V.dtype),
            pltpu.SemaphoreType.DMA((n_slots, 2)),
        ],
    )
    out = pl.pallas_call(
        _fused_kernel(C, R, S, exact, Rv, depth=n_slots - 1, gu=gu, gv=gv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.out_rows, D), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(meta, plan.tuv_local, U, V)
    return out


# ---------------------------------------------------------------------------
# spspmm plans (forward + both gradients) and custom_vjp
# ---------------------------------------------------------------------------


DEFAULT_R_DA = 768


def build_spspmm_plans(
    acd: np.ndarray,
    x_rows: int,
    a_rows: int,
    out_rows: int,
    C: int = DEFAULT_C,
    R: int = DEFAULT_R,
    S: int = DEFAULT_S,
    pad_chunks_to: Optional[int] = None,
    R_da: Optional[int] = None,
) -> Tuple[ChunkPlan, ChunkPlan, ChunkPlan]:
    """Build (forward, dX, dA) plans from padded acd triples
    (a = output tuple, c = X row, d = A row; sorted by a).

    - forward: out[a] += X[c] * A[d]          triples (a, c, d)
    - dX:      dX[c] += g[a] * A[d]           triples (c, a, d) sorted by c
    - dA:      dA[d] += X[c] * g[a]           triples (d, c, a) sorted by d

    The dA plan uses a wider operand window (``R_da``, default 768): the
    gradient w.r.t. edge values has graph-wide fan-in (one edge's triples
    touch every subgraph containing it), so its c/a ranges span a whole
    graph's tuple block rather than one subgraph's.
    """
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    Rda = R_da if R_da is not None else max(R, DEFAULT_R_DA)
    return build_spspmm_plans_for(
        acd, x_rows, a_rows, out_rows,
        {"fwd": (C, R, S), "dx": (C, R, S), "da": (C, Rda, S)},
        pad_chunks_to)


def build_spspmm_plans_for(
    acd: np.ndarray,
    x_rows: int,
    a_rows: int,
    out_rows: int,
    geoms: dict,
    pad_chunks_to: Optional[int] = None,
    n_slots: int = 2,
) -> Tuple[ChunkPlan, ChunkPlan, ChunkPlan]:
    """build_spspmm_plans with an independent geometry per role —
    ``geoms = {"fwd": g, "dx": g, "da": g}`` where each g is (C, R, S)
    or (C, R, S, Rv) (from autotune_spspmm_geoms or hand-picked; Rv
    narrows the v-operand window independently of R).  The dX/dA operand
    padding always covers the forward's padded output so the custom_vjp
    can feed the cotangent straight through.  ``n_slots`` > 2 enables
    deeper window prefetch in the kernel (measured within noise of the
    default double-buffering on v5e; see BENCHMARKS.md)."""
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    def parse(g):
        return g if len(g) == 4 else (g[0], g[1], g[2], g[1])

    Cf, Rf, Sf, Rvf = parse(geoms["fwd"])
    Cx, Rx, Sx, Rvx = parse(geoms["dx"])
    Ca, Ra, Sa, Rva = parse(geoms["da"])
    fwd = build_chunk_plan(np.stack([a, c, d]), rup(x_rows, Rf),
                           rup(a_rows, Rvf), rup(out_rows, Sf), Cf, Rf, Sf,
                           pad_chunks_to, Rv=Rvf, n_slots=n_slots)
    # the gradient-side "operand" is the cotangent g, whose row count is
    # the forward's padded OUTPUT (fwd.out_rows); window-pad that
    g_rows = fwd.out_rows
    # secondary sort on the u operand: within a target run the triple
    # order is free, and (target, u) order minimizes each chunk's u
    # window span — the planner can then cut wider chunks / the Ru sweep
    # can pick narrower windows
    o1 = np.lexsort((a, c))
    dx = build_chunk_plan(np.stack([c, a, d])[:, o1], rup(g_rows, Rx),
                          rup(a_rows, Rvx), rup(x_rows, Sx), Cx, Rx, Sx,
                          pad_chunks_to, Rv=Rvx, n_slots=n_slots)
    o2 = np.lexsort((c, d))
    da = build_chunk_plan(np.stack([d, c, a])[:, o2], rup(x_rows, Ra),
                          rup(g_rows, Rva), rup(a_rows, Sa), Ca, Ra, Sa,
                          pad_chunks_to, Rv=Rva, n_slots=n_slots)
    return fwd, dx, da


def _pad_rows(x: jax.Array, rows: int) -> jax.Array:
    if x.shape[0] == rows:
        return x
    assert rows > x.shape[0], (x.shape, rows)
    pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_spspmm(Xv: jax.Array, Av: jax.Array, fwd: ChunkPlan,
                 dxp: ChunkPlan, dap: ChunkPlan,
                 interpret: Optional[bool] = None,
                 exact: bool = True) -> jax.Array:
    """Differentiable fused spspmm: out[a] = sum_cd X[c] * A[d].

    Returns (fwd.out_rows, D); callers slice back to their padded nnz.
    Sum aggregation only (the only aggr with a matching linear transpose;
    max/mean stay on the XLA path).  The plans are pytrees of int arrays;
    their cotangents are symbolic float0 zeros."""
    return fused_contract(_pad_rows(Xv, fwd.u_rows),
                          _pad_rows(Av, fwd.v_rows), fwd,
                          interpret=interpret, exact=exact)


def _plan_zeros(plan: ChunkPlan):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plan)


def _fwd_rule(Xv, Av, fwd, dxp, dap, interpret, exact):
    out = fused_spspmm(Xv, Av, fwd, dxp, dap, interpret, exact)
    return out, (Xv, Av, fwd, dxp, dap)


def _bwd_rule(interpret, exact, res, g):
    Xv, Av, fwd, dxp, dap = res
    g = g.astype(jnp.float32)
    dX = fused_contract(_pad_rows(g, dxp.u_rows),
                        _pad_rows(Av, dxp.v_rows), dxp,
                        interpret=interpret, exact=exact)[: Xv.shape[0]]
    dA = fused_contract(_pad_rows(Xv, dap.u_rows),
                        _pad_rows(g, dap.v_rows), dap,
                        interpret=interpret, exact=exact)[: Av.shape[0]]
    return (dX.astype(Xv.dtype), dA.astype(Av.dtype),
            _plan_zeros(fwd), _plan_zeros(dxp), _plan_zeros(dap))


fused_spspmm.defvjp(_fwd_rule, _bwd_rule)


def suggest_geometry(acd: np.ndarray, C: int = DEFAULT_C,
                     candidates=(256, 320, 384, 512, 768, 1024)) -> Tuple[int, int, int]:
    """Pick (C, R, S) from the triple array's locality statistics: R is
    the smallest candidate covering the 90th percentile of the u/v index
    ranges over C-row windows (chunks above it split, which is cheap if
    rare).  S stays at C (output windows track the sorted target)."""
    acd = np.asarray(acd)
    real = acd[0] < PAD_INDEX
    u = acd[1][real].astype(np.int64)
    v = acd[2][real].astype(np.int64)
    K = u.shape[0]
    if K < C:
        return C, candidates[-1], C
    spans = []
    for arr in (u, v):
        w = np.lib.stride_tricks.sliding_window_view(arr, C)[::C // 2]
        spans.append(np.percentile(w.max(1) - w.min(1), 90))
    need = max(spans) + 1
    for r in candidates:
        if r >= need:
            return C, int(r), C
    return C, int(candidates[-1]), C

# ---------------------------------------------------------------------------
# static cost model + geometry autotuning
# ---------------------------------------------------------------------------

# TPU v5e per-chip constants, CALIBRATED against a measured 13-point
# geometry sweep on the ZINC fwd workload (2026-08-17; 3-parameter
# linear fit, rank correlation 0.97).  Only the RATIOS matter — the
# model ranks candidate geometries.
_MXU_FLOPS = 165e12      # effective bf16 matmul rate on kernel shapes
_VPU_RATE = 5.9e12       # one-hot elements/s (iota-compare builds)
_CHUNK_FIXED = 0.58e-6   # per-grid-step overhead (issue/wait/step)
_HBM_BW = 819e9          # bytes/s


def estimate_plan_cost(plan: ChunkPlan, D: int, exact: bool = True,
                       itemsize: int = 4) -> float:
    """Calibrated time estimate (seconds) for one fused_contract launch.

    Per chunk: a fixed grid-step overhead (measured ~0.6 us — the
    dominant term at molecule-scale chunk counts), plus MXU passes and
    VPU one-hot builds; window DMAs are double-buffered against compute
    (max); output blocks spill to HBM once each; the scalar triple
    stream is read once.  ``exact`` triples the MXU passes (3-term bf16
    decomposition)."""
    C, R, S = plan.C, plan.R, plan.S
    Rv = plan.r_v
    passes = 3 if exact else 1
    # (C,R)@(R,D) + (C,Rv)@(Rv,D) gathers + one (S,C)@(C,D) scatter, per pass
    mxu = passes * (2 * C * (R + Rv) * D + 2 * S * C * D) / _MXU_FLOPS
    # one-hot construction is VPU-bound and independent of passes
    vpu = (C * (R + Rv) + S * C) / _VPU_RATE
    t_comp = mxu + vpu
    t_dma = ((np.asarray(plan.udma).astype(np.float64) * R
              + np.asarray(plan.vdma).astype(np.float64) * Rv)
             * (D * itemsize / _HBM_BW))
    total = float(np.sum(np.maximum(t_dma, t_comp)))
    # fixed cost is per grid STEP; the packed kernel (G chunks/step)
    # amortizes it (measured neutral on v5e, where the cost turned out
    # per-chunk-intrinsic — keep the division so the model reflects the
    # packed kernel's design intent on toolchains where it does help)
    total += (plan.n_chunks / max(plan.G, 1)) * _CHUNK_FIXED
    total += plan.out_rows * D * itemsize / _HBM_BW          # block spills
    total += plan.n_chunks * (3 * C + 8) * 4 / _HBM_BW       # triple stream
    return total


# (C, R, S) grid for the autotuner.  All MXU-tile friendly; S >= C
# asymmetric entries trade a bigger scatter one-hot for fewer output
# block transitions (fewer chunks -> less per-step overhead, which the
# calibrated model says dominates at molecule scale).
_GEOM_CANDIDATES = (
    (256, 256, 256), (256, 512, 256), (256, 256, 512),
    (512, 256, 512), (512, 320, 512), (512, 512, 512), (512, 768, 512),
    (1024, 512, 1024), (1024, 768, 1024), (1024, 1024, 1024),
)

# narrower v-window candidates for the secondary Rv sweep (all sublane
# aligned; 64 covers per-graph edge blocks on small molecular graphs)
_RV_CANDIDATES = (64, 128, 192, 256, 384, 512)


def autotune_geometry(tuv: np.ndarray, u_rows: int, v_rows: int,
                      out_rows: int, D: int, exact: bool = True,
                      candidates=None) -> Tuple[Tuple[int, int, int], float]:
    """Pick the geometry minimizing estimate_plan_cost over REAL plans
    built for each candidate (host planning is cheap: the C++ chunker is
    linear in the triple count).  After choosing (C, R, S), sweeps
    narrower v windows — a smaller Rv shrinks the v gather matmul when
    the v index locality allows it.  Returns
    ((C, R, S, Rv), predicted_seconds)."""

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    best = None
    for C, R, S in candidates or _GEOM_CANDIDATES:
        plan = build_chunk_plan(np.asarray(tuv), rup(u_rows, R),
                                rup(v_rows, R), rup(out_rows, S), C, R, S)
        cost = estimate_plan_cost(plan, D, exact)
        if best is None or cost < best[1]:
            best = ((C, R, S), cost)
    (C, R, S), cost = best
    best = ((C, R, S, R), cost)
    for Rv in _RV_CANDIDATES:
        if Rv >= R:
            continue
        plan = build_chunk_plan(np.asarray(tuv), rup(u_rows, R),
                                rup(v_rows, Rv), rup(out_rows, S), C, R, S,
                                Rv=Rv)
        cost = estimate_plan_cost(plan, D, exact)
        if cost < best[1]:
            best = ((C, R, S, Rv), cost)
    # symmetric sweep on the u window with the chosen Rv held fixed
    (C, R, S, Rv), cost = best
    for Ru in _RV_CANDIDATES:
        if Ru >= R:
            continue
        plan = build_chunk_plan(np.asarray(tuv), rup(u_rows, Ru),
                                rup(v_rows, Rv), rup(out_rows, S), C, Ru, S,
                                Rv=Rv)
        cost = estimate_plan_cost(plan, D, exact)
        if cost < best[1]:
            best = ((C, Ru, S, Rv), cost)
    return best


def autotune_spspmm_geoms(acd: np.ndarray, x_rows: int, a_rows: int,
                          out_rows: int, D: int = 128, exact: bool = True,
                          candidates=None) -> dict:
    """Per-role geometry for build_spspmm_plans_for, each picked by the
    cost model on that role's actual triple ordering (the dA role's
    graph-wide fan-in usually selects a much wider R than the forward)."""
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    g_fwd, _ = autotune_geometry(np.stack([a, c, d]), x_rows, a_rows,
                                 out_rows, D, exact, candidates)
    g_rows = rup(out_rows, g_fwd[2])
    o1 = np.lexsort((a, c))     # same (target, u) order the plan builder uses
    g_dx, _ = autotune_geometry(np.stack([c, a, d])[:, o1], g_rows, a_rows,
                                x_rows, D, exact, candidates)
    o2 = np.lexsort((c, d))
    g_da, _ = autotune_geometry(np.stack([d, c, a])[:, o2], x_rows, g_rows,
                                a_rows, D, exact, candidates)
    return {"fwd": g_fwd, "dx": g_dx, "da": g_da}
