"""Strip-aligned fused sparse contraction (Pallas TPU) — kernel v2.

Same computation as kernels/fused_spspmm.py (the spspmm hot loop,
reference backend/Spspmm.py:307-321):

    out[t] += U[u] * V[v]    for triples (t, u, v), t sorted ascending

The v1 kernel is bound at molecule scale by an intrinsic ~0.6 us
per-chunk cost: each grid step runs a serial VPU->MXU->VPU->MXU chain of
SMALL matmuls (gather-u, gather-v, multiply, scatter) whose pipeline
drains dominate (BENCHMARKS.md round-1 calibration; the packed-kernel
experiment proved G sequential _chunk_math calls per step do NOT
amortize it).  v2 restructures the math so one grid step covers G
sub-chunks with ONE batched MXU primitive per stage:

- **Strip-aligned scatter**: sub-chunk g of a step holds only triples
  whose targets fall in *strip* g of the step's output block (St rows,
  S = G*St).  The scatter one-hot is then (G, St, C) batched —
  per-triple scatter FLOPs drop from 2*S*D to 2*St*D (4x for St=128,
  S=512) — and the batched result reshapes losslessly to the (S, D)
  output block.
- **Batched gathers**: operand windows are DMA'd contiguously into
  (G, R, D) buffers, so gathers are single batched dot_generals
  (G, C, R) @ (G, R, D') instead of G dependent small matmuls.
- **Packed exact mode**: the 3-term bf16 decomposition of f32 operands
  (kernels/fused_spspmm._split3) is packed along the feature dim —
  (G, R, 3D) — so exact mode still issues ONE gather matmul per operand
  (3x the lanes, not 3 dependent passes), plus a slice-sum on the VPU.

The host planner rides the same C++ chunker as v1 (chunk_bounds_dyn2
with the S window set to St gives strip-aligned sub-chunks directly)
and packs sub-chunks into steps: slot g of a step carries the k-th
sub-chunk of strip (oblk*G + g); strips needing more sub-chunks add
revisit steps for the same block (the output BlockSpec accumulates).

Numerics: identical contract to v1 — ``exact=True`` is f32-accurate
(2^-24 relative) through bf16 MXU passes; ``exact=False`` is one
bf16 pass per stage (training-grade).  Sum aggregation only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..backend.indexing import PAD_INDEX
from .fused_spspmm import _pad_rows, _split3

__all__ = ["StripPlan", "StripPlanError", "build_strip_plan",
           "strip_contract", "build_spspmm_strip_plans",
           "fused_spspmm_strip", "estimate_strip_cost",
           "autotune_strip_geoms"]


@dataclasses.dataclass(frozen=True)
class StripPlan:
    """Host-built execution plan for one strip-aligned contraction."""
    tuv_local: jax.Array   # i32[n_steps, G, 3, C] strip/window-local (t,u,v)
    ubase: jax.Array       # i32[n_steps, G] U window start rows
    vbase: jax.Array       # i32[n_steps, G, Gv] V sub-window start rows
    oblk: jax.Array        # i32[n_steps] output block (S units), monotone
    C: int
    R: int
    S: int                 # output block rows (= G * St)
    St: int                # strip rows (scatter one-hot height)
    Rv: int
    out_rows: int
    u_rows: int
    v_rows: int
    u_align: int = 1       # bf16 grouped-DMA alignment (see v1 ChunkPlan)
    v_align: int = 1
    # v operand sub-windows per sub-chunk: the (Rv, D) window buffer is
    # filled by Gv disjoint (Rv/Gv, D) DMAs with host-remapped local
    # indices — same one-hot FLOPs, Gv x the effective index span
    # (giant-graph edge windows; see BENCHMARKS "locality limits")
    Gv: int = 1
    # static launch splits (step_start, step_end, blk_start, blk_end):
    # Mosaic on this toolchain crashes on strip grids beyond ~512-2048
    # steps (bisected 2026-08-19: 512 compiles, 2048 doesn't), so big
    # plans execute as several <=512-step launches over disjoint
    # block ranges whose outputs concatenate
    launch_splits: tuple = ()
    # DMA pipeline depth (window buffers per operand): nbuf-1 steps of
    # DMA lookahead.  2 = classic double buffering; small-window
    # geometries with ~1-2 us steps need 3-4 to hide HBM DMA latency
    nbuf: int = 2
    # persistent v windows (giant-graph mode): i32[n_steps, 6] schedule
    # [use_slot, wait_flag, load_base0, load_slot0, load_base1,
    # load_slot1] — the v window (e.g. one community's edge block) stays
    # resident in one of 2 VMEM slots across every step that references
    # it, and is DMA'd ONCE per window instead of once per step.  None =
    # classic per-step double-buffered v windows.
    v_sched: Optional[jax.Array] = None

    @property
    def v_persistent(self) -> bool:
        return self.v_sched is not None

    @property
    def n_v_windows(self) -> int:
        if self.v_sched is None:
            return self.n_steps
        vs = np.asarray(self.v_sched)
        return int((vs[:, [2, 4]] >= 0).sum())

    @property
    def G(self) -> int:
        return self.S // self.St

    @property
    def n_steps(self) -> int:
        return int(self.oblk.shape[0])

    @property
    def n_chunks(self) -> int:  # v1-compat: total sub-chunk slots
        return self.n_steps * self.G


jax.tree_util.register_dataclass(
    StripPlan,
    data_fields=["tuv_local", "ubase", "vbase", "oblk", "v_sched"],
    meta_fields=["C", "R", "S", "St", "Rv", "out_rows", "u_rows",
                 "v_rows", "u_align", "v_align", "Gv", "launch_splits",
                 "nbuf"],
)

try:  # jax.export serialization (parity with v1 plans)
    import json as _json

    from jax import export as _jexport

    def _detuple(x):
        # JSON has no tuples: restore nested tuples (launch_splits is a
        # tuple of 4-tuples and participates in pytree-meta equality)
        return (tuple(_detuple(e) for e in x) if isinstance(x, list)
                else x)

    _jexport.register_pytree_node_serialization(
        StripPlan,
        serialized_name="pygho_tpu.kernels.StripPlan",
        serialize_auxdata=lambda aux: _json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda b: _detuple(_json.loads(
            bytes(b).decode())),
    )
except Exception:  # pragma: no cover
    pass



_MAX_GRID_STEPS = 512


class StripPlanError(ValueError):
    """The strip planner refused a (geometry, workload) pair — e.g. one
    output block alone exceeds the Mosaic grid ceiling, or a common
    per-block step table fails to dominate a shard's natural counts.
    Raised (not assert'ed) so the chunk-plan fallback in
    parallel/tuple_parallel.py still fires under ``python -O``."""


def _launch_splits(oblk: np.ndarray, n_blocks: int,
                   max_steps: Optional[int] = None) -> tuple:
    """Static (step_start, step_end, blk_start, blk_end) launch ranges,
    cut at output-block boundaries so each block's revisit accumulation
    stays within one launch."""
    if max_steps is None:
        max_steps = _MAX_GRID_STEPS   # read at call time (testable)
    n = len(oblk)
    if n <= max_steps:
        return ((0, n, 0, n_blocks),)
    starts = np.concatenate(
        [[0], np.nonzero(np.diff(oblk))[0] + 1, [n]])
    splits = []
    s0 = 0
    b0 = 0
    while s0 < n:
        limit = s0 + max_steps
        if limit >= n:
            s1 = n
        else:
            cands = starts[(starts > s0) & (starts <= limit)]
            if not len(cands):
                raise StripPlanError(
                    f"one output block spans more than {max_steps} "
                    f"steps; raise St or C (block at step {s0})")
            s1 = int(cands[-1])
        b1 = int(oblk[s1 - 1]) + 1 if s1 < n else n_blocks
        splits.append((s0, s1, b0, b1))
        s0, b0 = s1, b1
    return tuple(splits)


def _build_v_sched(win_step: np.ndarray, wbases: np.ndarray,
                   splits: tuple) -> np.ndarray:
    """Persistent-v DMA schedule: i32[n_steps, 6] rows
    [use_slot, wait_flag, load_base0, load_slot0, load_base1,
    load_slot1] (-1 base = no load).  Windows alternate between 2 VMEM
    slots; window k+1's DMA starts at window k's first-use step, so it
    lands under k's compute.  Each launch split restarts the schedule
    (scratch does not survive a pallas_call boundary)."""
    n = len(win_step)
    sched = np.zeros((n, 6), np.int32)
    sched[:, 2] = -1
    sched[:, 4] = -1
    for (s0, s1, _b0, _b1) in (splits or ((0, n, 0, 0),)):
        seq: list = []          # window ordinals, in first-use order
        first: list = []        # their first-use steps within [s0, s1)
        prev = None
        for s in range(s0, s1):
            w = int(win_step[s])
            if w != prev:
                # greedy assignment is monotone: a window never recurs
                # after a different one, so runs are maximal
                seq.append(w)
                first.append(s)
                prev = w
        slot_of = {w: k % 2 for k, w in enumerate(seq)}
        sched[s0:s1, 0] = [slot_of[int(win_step[s])]
                           for s in range(s0, s1)]
        for k, f in enumerate(first):
            sched[f, 1] = 1                       # wait before first use
        if seq:
            sched[s0, 2] = wbases[seq[0]]
            sched[s0, 3] = 0
        if len(seq) > 1:
            sched[s0, 4] = wbases[seq[1]]
            sched[s0, 5] = 1
        for k in range(1, len(seq) - 1):
            # window k+1 loads when window k comes into use; its slot
            # (k+1)%2 was last read at step first[k]-1, so the DMA can
            # overwrite it safely under the sequential grid
            sched[first[k], 2] = wbases[seq[k + 1]]
            sched[first[k], 3] = (k + 1) % 2
    return sched


def build_strip_plan(
    tuv: np.ndarray,
    u_rows: int,
    v_rows: int,
    out_rows: int,
    C: int = 320,
    R: int = 384,
    S: int = 512,
    St: int = 128,
    Rv: Optional[int] = None,
    base_align: int = 16,
    pad_steps_to: Optional[int] = None,
    Gv: int = 1,
    steps_per_block: Optional[np.ndarray] = None,
    v_persistent: bool = False,
) -> StripPlan:
    """Cut strip-aligned sub-chunks and pack them into G-slot steps.

    Sub-chunks come from the same greedy window chunker as v1
    (native chunk_bounds_dyn2 / numpy fallback) with the output window
    set to ``St`` — every sub-chunk's targets live inside one strip.
    Step packing: block b's steps stack the k-th sub-chunks of its G
    strips; empty slots carry the sentinel (t_loc = St, u/v_loc = R/Rv,
    which gather zero and scatter nothing).

    ``steps_per_block`` pads each output block's step run to the given
    count (i32[out_rows // S], elementwise >= the natural counts).
    Plans padded to a COMMON per-block table share ``oblk`` — hence
    identical ``launch_splits`` — so they stack leaf-wise across shards
    even when the grid needs Mosaic's multi-launch split (the v7
    tuple-parallel strip path relies on this).

    ``v_persistent``: consecutive steps whose v needs fit one window
    share it — the kernel DMAs each distinct window ONCE (into one of 2
    VMEM slots, next window prefetched under the current window's
    steps) instead of re-issuing a window DMA per step.  This removes
    the window-byte amplification on fragmented giant graphs where a
    wide Rv (e.g. 2048 rows = one community's whole edge block) is
    reused by every step of that community (BENCHMARKS "giant-graph
    locality limits": per-step window DMA was ~8x the useful bytes).
    Requires G == 1 (S == St) and Gv == 1.
    """
    assert S % St == 0, (S, St)
    G = S // St
    if v_persistent and (G != 1 or Gv > 1):
        raise StripPlanError(
            f"v_persistent needs G == 1 (S == St) and Gv == 1; got "
            f"S={S}, St={St}, Gv={Gv}")
    Rv = R if Rv is None else Rv
    tuv = np.asarray(tuv)
    t, u, v = tuv[0], tuv[1], tuv[2]
    K = int(np.sum(t < PAD_INDEX))
    t = t[:K].astype(np.int64)
    u = u[:K].astype(np.int64)
    v = v[:K].astype(np.int64)
    assert out_rows % S == 0, "out_rows must be a multiple of S"
    assert u_rows >= R and v_rows >= Rv
    # WITHIN a strip the triple order is free (the scatter one-hot
    # places rows by t_loc, not position), so sort strip-major then by
    # (u, v): each sub-chunk's u window is then minimal, which stops
    # graph-boundary strips from fragmenting on the u range
    order = np.lexsort((v, u, t // St))
    t, u, v = t[order], u[order], v[order]
    if Gv > 1:
        return _build_strip_plan_multiv(
            t, u, v, u_rows, v_rows, out_rows, C, R, S, St, Rv,
            base_align, pad_steps_to, Gv, steps_per_block)
    au = base_align if (base_align > 1 and R % base_align == 0
                        and u_rows % base_align == 0) else 1
    av = base_align if (base_align > 1 and Rv % base_align == 0
                        and v_rows % base_align == 0) else 1
    R_eff = R - (au - 1)
    Rv_eff = Rv - (av - 1)

    from .. import native as _native

    host = _native.get()
    if host is not None and K > 0 and hasattr(host, "chunk_bounds_dyn2"):
        starts, ends, ubs, vbs, strips = host.chunk_bounds_dyn2(
            np.ascontiguousarray(t), np.ascontiguousarray(u),
            np.ascontiguousarray(v), C, R_eff, Rv_eff, St)
        starts = starts.astype(np.int64)
        ends = ends.astype(np.int64)
        ubs = ubs.astype(np.int64)
        vbs = vbs.astype(np.int64)
        strips = strips.astype(np.int64)
    else:
        starts_l, ends_l, ubs_l, vbs_l, strips_l = [], [], [], [], []
        start = 0
        while start < K:
            end_max = min(start + C, K)
            sl = slice(start, end_max)
            umin = np.minimum.accumulate(u[sl])
            umax = np.maximum.accumulate(u[sl])
            vmin = np.minimum.accumulate(v[sl])
            vmax = np.maximum.accumulate(v[sl])
            ok = ((umax - umin < R_eff) & (vmax - vmin < Rv_eff)
                  & (t[sl] // St == t[start] // St))
            bad = np.nonzero(~ok)[0]
            end = start + (int(bad[0]) if len(bad) else (end_max - start))
            assert end > start
            starts_l.append(start)
            ends_l.append(end)
            ubs_l.append(int(u[start:end].min()))
            vbs_l.append(int(v[start:end].min()))
            strips_l.append(int(t[start] // St))
            start = end
        starts = np.asarray(starts_l, np.int64)
        ends = np.asarray(ends_l, np.int64)
        ubs = np.asarray(ubs_l, np.int64)
        vbs = np.asarray(vbs_l, np.int64)
        strips = np.asarray(strips_l, np.int64)

    # align window bases down to the bf16-grouped-DMA grid and clamp so
    # the window stays inside the padded operand (range < R_eff
    # guarantees the aligned-down base still covers the sub-chunk)
    ubs = np.minimum((ubs // au) * au, u_rows - R)
    vbs = np.minimum((vbs // av) * av, v_rows - Rv)

    n_sub = len(starts)
    if v_persistent and n_sub:
        # greedy window merging with UNION-span growth: a sub-chunk
        # joins the current window when the union of its v range with
        # the window's still fits Rv — the window's base can move DOWN
        # (strips revisit a community's low edge rows, so first-chunk
        # anchoring fragments ~4x).  Community-contiguous workloads
        # then reuse one window per ~Rv of community edge rows.
        # (chunker output is a contiguous cover, so reduceat segments
        # are exactly [starts[i], ends[i]))
        vmins = np.minimum.reduceat(v, starts)
        vmaxs = np.maximum.reduceat(v, starts)

        def aldn(x):
            return min((x // av) * av, v_rows - Rv)

        wid = np.zeros(n_sub, np.int64)     # window ordinal (monotone)
        lo = hi = None
        k = -1
        spans: list = []                    # per-window final lo
        for ci in range(n_sub):             # host loop: n_sub ~ 1e3-1e4
            nlo = int(vmins[ci]) if lo is None else min(lo,
                                                        int(vmins[ci]))
            nhi = int(vmaxs[ci]) if hi is None else max(hi,
                                                        int(vmaxs[ci]))
            if lo is None or nhi - aldn(nlo) >= Rv:
                lo, hi = int(vmins[ci]), int(vmaxs[ci])
                k += 1
                spans.append(lo)
            else:
                lo, hi = nlo, nhi
                spans[k] = lo
            wid[ci] = k
        wbases_merged = np.array([aldn(s) for s in spans], np.int64)
        wb = wbases_merged[wid]
        vbs = wb
    n_blocks = out_rows // S
    blk_of = strips // G
    slot_of = strips % G
    # k-th sub-chunk of its strip (sub-chunks of one strip are
    # consecutive in the chunker's output)
    k_of = np.zeros(n_sub, np.int64)
    if n_sub > 1:
        same = strips[1:] == strips[:-1]
        run = np.zeros(n_sub, np.int64)
        for i in range(1, n_sub):  # short loop: n_sub ~ hundreds
            run[i] = run[i - 1] + 1 if same[i - 1] else 0
        k_of = run
    # steps per block = max sub-chunks over its strips (>= 1: every
    # block must be emitted once so untouched rows come out zero)
    steps_per_blk = np.ones(n_blocks, np.int64)
    if n_sub:
        np.maximum.at(steps_per_blk, blk_of, k_of + 1)
    steps_per_blk = _apply_block_pad(steps_per_blk, steps_per_block)
    blk_step_off = np.concatenate([[0], np.cumsum(steps_per_blk)[:-1]])
    n_steps = int(steps_per_blk.sum())
    if pad_steps_to is not None:
        assert pad_steps_to >= n_steps, (pad_steps_to, n_steps)
        n_steps_padded = pad_steps_to
    else:
        n_steps_padded = n_steps

    tuv_local = np.zeros((n_steps_padded, G, 3, C), np.int32)
    tuv_local[:, :, 0, :] = St   # sentinel: scatter one-hot all-zero
    tuv_local[:, :, 1, :] = R    # sentinel: gather one-hot all-zero
    tuv_local[:, :, 2, :] = Rv
    ubase = np.zeros((n_steps_padded, G), np.int32)
    vbase = np.zeros((n_steps_padded, G, 1), np.int32)
    oblk = np.zeros(n_steps_padded, np.int32)
    # block ids for every step (padding steps repeat the last block)
    ids = np.repeat(np.arange(n_blocks), steps_per_blk)
    oblk[:n_steps] = ids
    oblk[n_steps:] = n_blocks - 1 if n_blocks else 0

    if n_sub:
        step_of = blk_step_off[blk_of] + k_of
        ubase[step_of, slot_of] = ubs
        vbase[step_of, slot_of, 0] = vbs
        lens = ends - starts
        cid = np.repeat(np.arange(n_sub), lens)
        rows = np.concatenate([np.arange(s0, e0)
                               for s0, e0 in zip(starts, ends)])
        pos = np.arange(len(rows)) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        si, gi = step_of[cid], slot_of[cid]
        tuv_local[si, gi, 0, pos] = (t[rows] - strips[cid] * St).astype(
            np.int32)
        tuv_local[si, gi, 1, pos] = (u[rows] - ubs[cid]).astype(np.int32)
        tuv_local[si, gi, 2, pos] = (v[rows] - vbs[cid]).astype(np.int32)

    splits = _launch_splits(oblk, n_blocks)
    v_sched = None
    if v_persistent:
        # per-step window ordinals: real steps carry their sub-chunk's
        # window; padding steps inherit the previous real window
        # (leading padding backfills window 0 — loaded at launch start)
        win_step = np.full(n_steps_padded, -1, np.int64)
        if n_sub:
            win_step[blk_step_off[blk_of] + k_of] = wid
            pos = np.arange(n_steps_padded)
            ffidx = np.where(win_step >= 0, pos, -1)
            np.maximum.accumulate(ffidx, out=ffidx)
            win_step = np.where(ffidx >= 0,
                                win_step[np.maximum(ffidx, 0)], wid[0])
            # one source of truth: the merge loop's per-window bases
            # (vbs was derived from it; re-deriving here could desync
            # the kernel's wait descriptors from the load schedule)
            wbases = wbases_merged
        else:
            win_step[:] = 0
            wbases = np.zeros(1, np.int64)
        # padding steps' vbase mirrors the window base (the kernel's
        # wait descriptor reads vbase at the window's first-use step)
        vbase[:, 0, 0] = wbases[win_step]
        v_sched = _build_v_sched(win_step, wbases, splits)

    return StripPlan(
        tuv_local=tuv_local, ubase=ubase, vbase=vbase, oblk=oblk,
        C=C, R=R, S=S, St=St, Rv=Rv, out_rows=out_rows,
        u_rows=u_rows, v_rows=v_rows, u_align=au, v_align=av,
        launch_splits=splits, v_sched=v_sched)



def _apply_block_pad(steps_per_blk: np.ndarray,
                     steps_per_block: Optional[np.ndarray]) -> np.ndarray:
    """Raise each block's step count to the caller's common table (see
    build_strip_plan docstring); identity when no table is given."""
    if steps_per_block is None:
        return steps_per_blk
    tgt = np.asarray(steps_per_block, np.int64)
    if tgt.shape != steps_per_blk.shape:
        raise StripPlanError(
            f"steps_per_block shape {tgt.shape} != natural "
            f"{steps_per_blk.shape}")
    if not np.all(tgt >= steps_per_blk):
        raise StripPlanError(
            "steps_per_block must dominate the natural per-block counts "
            f"(max deficit {int((steps_per_blk - tgt).max())})")
    return tgt


def _build_strip_plan_multiv(t, u, v, u_rows, v_rows, out_rows,
                             C, R, S, St, Rv, base_align, pad_steps_to,
                             Gv, steps_per_block=None) -> StripPlan:
    """Gv > 1 planner: per strip, assign v values to runs of Rv/Gv rows
    (sorted-unique greedy), batch runs Gv at a time, then cut each run
    batch by u range / count.  Local v indices are remapped to the
    compacted (Gv, Rv/Gv) window layout, so the kernel math is
    unchanged — only the DMA issues Gv sub-window copies."""
    assert Rv % Gv == 0, (Rv, Gv)
    Rvs = Rv // Gv
    G = S // St
    K = t.shape[0]
    # align sub-window bases like the single-window path (rounding a
    # base DOWN only extends coverage downward), so grouped 16-row DMA
    # views stay legal and bf16 operands skip the f32 upcast; the u cut
    # uses the effective range R - (align-1) to absorb the rounding
    al = base_align if (base_align > 1 and Rvs % base_align == 0
                        and R % base_align == 0
                        and u_rows % base_align == 0
                        and v_rows % base_align == 0) else 1
    R_eff = R - (al - 1)
    n_blocks = out_rows // S

    # (strip, rows, ubase, vbases[Gv], t/u/v locals) per sub-chunk
    subs = []
    strip_arr = t // St
    strip_starts = np.concatenate(
        [[0], np.nonzero(np.diff(strip_arr))[0] + 1, [K]])
    for si in range(len(strip_starts) - 1):
        s0, s1 = int(strip_starts[si]), int(strip_starts[si + 1])
        if s1 <= s0:
            continue
        strip = int(strip_arr[s0])
        vs = v[s0:s1]
        uniq = np.unique(vs)
        # greedy v runs of width Rvs
        bases = []
        run_of_uniq = np.zeros(len(uniq), np.int64)
        cur_base = None
        rid = -1
        for idx, val in enumerate(uniq):
            if cur_base is None or val > cur_base + Rvs - 1:
                rid += 1
                cur_base = int(min(val - val % al, v_rows - Rvs))
                bases.append(cur_base)
            run_of_uniq[idx] = rid
        run_of = run_of_uniq[np.searchsorted(uniq, vs)]
        batch_of = run_of // Gv
        for b in range(int(batch_of.max()) + 1):
            m = np.nonzero(batch_of == b)[0]
            bb = bases[b * Gv:(b + 1) * Gv]
            bb = np.asarray(bb + [bb[-1]] * (Gv - len(bb)), np.int64)
            tb, ub, vb = t[s0:s1][m], u[s0:s1][m], vs[m]
            rb = run_of[m] - b * Gv
            vloc = rb * Rvs + (vb - bb[rb])
            # cut by u range / count (rows within a batch keep (u, v)
            # order, so u is non-decreasing)
            start = 0
            nb = len(m)
            while start < nb:
                end_max = min(start + C, nb)
                umin = ub[start]
                umax = np.maximum.accumulate(ub[start:end_max])
                ok = umax - umin < R_eff
                bad = np.nonzero(~ok)[0]
                end = start + (int(bad[0]) if len(bad) else
                               (end_max - start))
                assert end > start
                ubase_c = int(min(umin - umin % al, u_rows - R))
                subs.append((strip,
                             (tb[start:end] - strip * St).astype(np.int32),
                             (ub[start:end] - ubase_c).astype(np.int32),
                             vloc[start:end].astype(np.int32),
                             ubase_c, bb))
                start = end

    # pack sub-chunks into steps: slot g of a step holds the k-th
    # sub-chunk of strip (oblk*G + g)
    strips = np.asarray([c[0] for c in subs], np.int64)
    n_sub = len(subs)
    blk_of = strips // G
    slot_of = strips % G
    k_of = np.zeros(n_sub, np.int64)
    for i in range(1, n_sub):
        k_of[i] = k_of[i - 1] + 1 if strips[i] == strips[i - 1] else 0
    steps_per_blk = np.ones(n_blocks, np.int64)
    if n_sub:
        np.maximum.at(steps_per_blk, blk_of, k_of + 1)
    steps_per_blk = _apply_block_pad(steps_per_blk, steps_per_block)
    blk_step_off = np.concatenate([[0], np.cumsum(steps_per_blk)[:-1]])
    n_steps = int(steps_per_blk.sum())
    n_steps_padded = pad_steps_to if pad_steps_to is not None else n_steps
    assert n_steps_padded >= n_steps, (n_steps_padded, n_steps)

    tuv_local = np.zeros((n_steps_padded, G, 3, C), np.int32)
    tuv_local[:, :, 0, :] = St
    tuv_local[:, :, 1, :] = R
    tuv_local[:, :, 2, :] = Rv
    ubase = np.zeros((n_steps_padded, G), np.int32)
    vbase = np.zeros((n_steps_padded, G, Gv), np.int32)
    oblk = np.zeros(n_steps_padded, np.int32)
    ids = np.repeat(np.arange(n_blocks), steps_per_blk)
    oblk[:n_steps] = ids
    oblk[n_steps:] = n_blocks - 1 if n_blocks else 0
    for i, (strip, tl, ul, vl, ub_c, bb) in enumerate(subs):
        st = int(blk_step_off[blk_of[i]] + k_of[i])
        g = int(slot_of[i])
        L = len(tl)
        tuv_local[st, g, 0, :L] = tl
        tuv_local[st, g, 1, :L] = ul
        tuv_local[st, g, 2, :L] = vl
        ubase[st, g] = ub_c
        vbase[st, g] = bb.astype(np.int32)

    return StripPlan(
        tuv_local=tuv_local, ubase=ubase, vbase=vbase, oblk=oblk,
        C=C, R=R, S=S, St=St, Rv=Rv, out_rows=out_rows,
        u_rows=u_rows, v_rows=v_rows, u_align=al, v_align=al, Gv=Gv,
        launch_splits=_launch_splits(oblk, n_blocks))


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _batch_dot(a, b):
    """(G, M, K) @ (G, K, N) -> (G, M, N) f32 batched matmul.  G == 1
    lowers as a plain 2-D dot — degenerate batch dims produce worse
    Mosaic code (and hung compiles were observed at G=1 on hardware)."""
    if a.shape[0] == 1:
        return jnp.dot(a[0], b[0],
                       preferred_element_type=jnp.float32)[None]
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _pack3(x):
    """f32 (..., D) -> bf16 (..., 3D): the 3-term decomposition packed
    along the lanes so exact mode is ONE matmul instead of three."""
    return jnp.concatenate(_split3(x), axis=-1)


def _sum3(o):
    D = o.shape[-1] // 3
    return o[..., :D] + o[..., D:2 * D] + o[..., 2 * D:]


def _strip_math(tuv, uw, vw, C, R, St, Rv, exact):
    """One step's G sub-chunks as three batched MXU primitives.
    tuv: (G, 3, C) i32; uw: (G, R, D); vw: (G, Rv, D).
    Returns the (G*St, D) f32 contribution to the output block.

    Exact mode: mixed-precision dots — an exact bf16 one-hot against the
    f32 operand.  Mosaic decomposes the f32 side into bf16 MXU passes
    internally, which measured identical to the hand-packed 3-term
    (G, R, 3D) decomposition this replaced (A/B 2026-08-19: 0.182 vs
    0.187 ms, rel err 1.0e-7 both vs the f64 oracle) while skipping the
    per-step split3/pack/sum VPU passes and the 3x-lane VMEM
    intermediates.  Fast mode stays a single all-bf16 pass per stage."""
    import jax.lax as lax

    G = tuv.shape[0]
    t_loc, u_loc, v_loc = tuv[:, 0, :], tuv[:, 1, :], tuv[:, 2, :]

    def gather(loc, w, width):
        iota = lax.broadcasted_iota(jnp.int32, (G, C, width), 2)
        # direct predicate->bf16 cast (one VPU pass; where+astype is two)
        oh = (loc[:, :, None] == iota).astype(jnp.bfloat16)
        if exact and w.dtype != jnp.bfloat16:
            return _batch_dot(oh, w)          # mixed: Mosaic splits w
        return _batch_dot(oh, w.astype(jnp.bfloat16))

    prod = gather(u_loc, uw, R) * gather(v_loc, vw, Rv)   # (G, C, D) f32

    iota_t = lax.broadcasted_iota(jnp.int32, (G, St, C), 1)
    oh_t = (t_loc[:, None, :] == iota_t).astype(jnp.bfloat16)
    if exact:
        acc = _batch_dot(oh_t, prod)          # mixed: Mosaic splits prod
    else:
        acc = _batch_dot(oh_t, prod.astype(jnp.bfloat16))
    return acc.reshape(G * St, -1)


def _strip_kernel_pv(C: int, R: int, St: int, Rv: int, exact: bool,
                     gu: int = 1, gv: int = 1, nbuf: int = 2):
    """Persistent-v variant (G == 1): u windows ride the classic
    per-step nbuf pipeline; the v window lives in one of 2 VMEM slots
    and is DMA'd once per DISTINCT window per the host schedule
    (StripPlan.v_sched) — window k+1's copy starts at window k's
    first-use step and lands under its compute.  See build_strip_plan
    ``v_persistent``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # packed prefetch meta[step] = [ubase, vbase, oblk, use_slot, wait,
    # lb0, ls0, lb1, ls1] — one smem buffer per launch (see the
    # smem-budget note in _strip_kernel)
    def kernel(meta_ref, tuv_ref,
               u_hbm, v_hbm, o_ref, ubuf, vbuf, usems, vsems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def u_copy(step, buf):
            ub = meta_ref[step, 0]
            src = (u_hbm.at[pl.ds(ub, R)] if gu == 1 else
                   u_hbm.at[pl.ds(ub // gu, R // gu)])
            return pltpu.make_async_copy(src, ubuf.at[buf],
                                         usems.at[buf])

        def v_desc(base, slot):
            src = (v_hbm.at[pl.ds(base, Rv)] if gv == 1 else
                   v_hbm.at[pl.ds(base // gv, Rv // gv)])
            return pltpu.make_async_copy(src, vbuf.at[slot],
                                         vsems.at[slot])

        @pl.when(i == 0)
        def _():
            u_copy(0, 0).start()
            for k in range(1, nbuf - 1):
                @pl.when(k < n)
                def _(k=k):
                    u_copy(jnp.minimum(k, n - 1), k % nbuf).start()

        @pl.when(i + nbuf - 1 < n)
        def _():
            nxt = jnp.minimum(i + nbuf - 1, n - 1)
            u_copy(nxt, (i + nbuf - 1) % nbuf).start()

        # v loads per the host schedule (up to 2, both at a launch's
        # first step; later steps start at most one lookahead window)
        for w in (0, 1):
            @pl.when(meta_ref[i, 5 + 2 * w] >= 0)
            def _(w=w):
                v_desc(meta_ref[i, 5 + 2 * w],
                       meta_ref[i, 6 + 2 * w]).start()

        u_copy(i, i % nbuf).wait()
        use = meta_ref[i, 3]

        @pl.when(meta_ref[i, 4] == 1)
        def _():
            # first use of this window: wait out its DMA (descriptor
            # reconstructed from this step's vbase — the window base)
            v_desc(meta_ref[i, 1], use).wait()

        # (grouped or flat) -> the (G=1, rows, D) layout _strip_math eats
        uw = ubuf[i % nbuf].reshape(1, R, ubuf.shape[-1])
        vw = vbuf[use].reshape(1, Rv, vbuf.shape[-1])
        acc = _strip_math(tuv_ref[0], uw, vw, C, R, St, Rv, exact)

        first = jnp.logical_or(
            i == 0, meta_ref[i, 2] != meta_ref[jnp.maximum(i - 1, 0), 2])

        @pl.when(first)
        def _():
            o_ref[:] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


def _strip_kernel(C: int, R: int, S: int, St: int, Rv: int, exact: bool,
                  gu: int = 1, gv: int = 1, Gv: int = 1, nbuf: int = 2):
    """Pipelined strip kernel: the window DMAs of the next ``nbuf - 1``
    steps are in flight while step i computes.  nbuf = 2 is classic
    double buffering; deeper pipelines matter for small-window
    geometries whose per-step compute (~1-2 us) is shorter than the
    HBM DMA latency — one step of lookahead can't hide it (round-3
    measurement: the small-window family floors at ~2.2 us/step at
    nbuf=2).  ``gu``/``gv`` as in v1: bf16 operands arrive as
    (rows/g, g, D) grouped views (untiled leading dim sidesteps
    Mosaic's divisibility proof on dynamic bf16 slices).  ``Gv`` > 1:
    the v window is Gv disjoint sub-window DMAs (multi-base windows;
    local indices pre-remapped by the planner)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = S // St
    Rvs = Rv // Gv

    # ALL launch scalars ride ONE packed prefetch array
    # meta[step] = [ubase (G) | vbase (G*Gv) | oblk (1)]: XLA bills
    # smem per scalar-prefetch BUFFER at page granularity, so three
    # separate arrays per launch overflowed the 1 MB smem budget on
    # multi-key 6-layer chained programs (observed: SSWL fused chained,
    # "Used 1.06M of 1.00M smem"); one buffer per launch is 3x fewer.
    def kernel(meta_ref, tuv_ref, u_hbm, v_hbm,
               o_ref, ubuf, vbuf, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def oblk_ref(step):
            return meta_ref[step, G + G * Gv]

        def u_copy(step, buf, g):
            ub = meta_ref[step, g]
            src = (u_hbm.at[pl.ds(ub, R)] if gu == 1 else
                   u_hbm.at[pl.ds(ub // gu, R // gu)])
            return pltpu.make_async_copy(src, ubuf.at[buf, g],
                                         sems.at[buf, g, 0])

        def v_copy(step, buf, g, w=0):
            vb = meta_ref[step, G + g * Gv + w]
            if Gv == 1:
                src = (v_hbm.at[pl.ds(vb, Rv)]
                       if gv == 1 else
                       v_hbm.at[pl.ds(vb // gv,
                                      Rv // gv)])
                return pltpu.make_async_copy(src, vbuf.at[buf, g],
                                             sems.at[buf, g, 1])
            src = (v_hbm.at[pl.ds(vb, Rvs)]
                   if gv == 1 else
                   v_hbm.at[pl.ds(vb // gv,
                                  Rvs // gv)])
            return pltpu.make_async_copy(src, vbuf.at[buf, g, w],
                                         sems.at[buf, g, 1 + w])

        def start(step, buf):
            for g in range(G):
                u_copy(step, buf, g).start()
                for w in range(Gv):
                    v_copy(step, buf, g, w).start()

        @pl.when(i == 0)
        def _():
            # prologue: fill the whole pipeline (steps 0 .. nbuf-2)
            start(0, 0)
            for k in range(1, nbuf - 1):
                @pl.when(k < n)
                def _(k=k):
                    start(jnp.minimum(k, n - 1), k % nbuf)

        @pl.when(i + nbuf - 1 < n)
        def _():
            nxt = jnp.minimum(i + nbuf - 1, n - 1)
            start(nxt, (i + nbuf - 1) % nbuf)

        for g in range(G):
            u_copy(i, i % nbuf, g).wait()
            for w in range(Gv):
                v_copy(i, i % nbuf, g, w).wait()

        uw = ubuf[i % nbuf]
        vw = vbuf[i % nbuf]
        if gu > 1:
            uw = uw.reshape(G, R, uw.shape[-1])
        if gv > 1 or Gv > 1:
            vw = vw.reshape(G, Rv, vw.shape[-1])
        acc = _strip_math(tuv_ref[0], uw, vw, C, R, St, Rv, exact)

        first = jnp.logical_or(
            i == 0, oblk_ref(i) != oblk_ref(jnp.maximum(i - 1, 0)))

        @pl.when(first)
        def _():
            o_ref[:] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def strip_contract(U: jax.Array, V: jax.Array, plan: StripPlan,
                   interpret: Optional[bool] = None,
                   exact: bool = True) -> jax.Array:
    """Execute out[t] += U[u] * V[v] per ``plan`` (v2 kernel).
    U: (plan.u_rows, D), V: (plan.v_rows, D); returns
    (plan.out_rows, D) f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, R, S, St, Rv = plan.C, plan.R, plan.S, plan.St, plan.Rv
    G = plan.G
    D = U.shape[-1]
    assert U.shape[0] >= plan.u_rows and V.shape[0] >= plan.v_rows, (
        "operands must be padded to the plan's row counts")

    Gv = plan.Gv

    def grouping(x, align, win):
        if x.dtype != jnp.bfloat16:
            return x, 1
        if align % 16 or win % 16:
            # unaligned plan bases (or a sub-16 DMA unit): upcast for
            # DMA-legal dynamic slices
            return x.astype(jnp.float32), 1
        return x[: (x.shape[0] // 16) * 16].reshape(-1, 16, x.shape[-1]), 16

    U, gu = grouping(U, plan.u_align, R)
    # the v DMA unit is the sub-window height when Gv > 1
    V, gv = grouping(V, plan.v_align, Rv // Gv)
    nb = max(2, int(plan.nbuf))
    if not interpret:
        assert D % 128 == 0, (
            f"strip kernel needs a feature dim that is a multiple of 128 "
            f"(got {D}); use the XLA spspmm path for smaller dims")
        vmem = estimate_strip_vmem((C, R, S, St, Rv), D, exact)
        assert vmem <= _VMEM_BUDGET, (
            f"strip geometry (C={C}, R={R}, S={S}, St={St}, Rv={Rv}) "
            f"needs ~{vmem / 1e6:.0f} MB VMEM (> {_VMEM_BUDGET / 1e6:.0f}"
            f" MB budget) at D={D} — Mosaic would exhaust VMEM; pick a "
            f"narrower window / smaller G = S//St (autotune_strip_geoms "
            f"filters candidates automatically)")
    pv = plan.v_sched is not None

    def launch(ubase, vbase, oblk, tuv_local, out_rows, v_sched=None):
        n_steps = int(oblk.shape[0])
        passes = 3 if exact else 1
        flops = 2 * n_steps * G * passes * (C * R * D + C * Rv * D
                                            + St * C * D)
        cost = pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_steps * G * (R + Rv + St) * D * 4,
            transcendentals=0)
        if pv:
            # one packed scalar-prefetch buffer (smem page budget —
            # see _strip_kernel): [ubase, vbase, oblk, sched(6)]
            meta = jnp.concatenate(
                [ubase.reshape(n_steps, 1),
                 vbase.reshape(n_steps, 1),
                 oblk.reshape(n_steps, 1),
                 v_sched], axis=1).astype(jnp.int32)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_steps,),
                in_specs=[
                    pl.BlockSpec((1, G, 3, C), lambda i, *refs:
                                 (i, 0, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (S, D), lambda i, meta: (meta[i, 2], 0)),
                scratch_shapes=[
                    pltpu.VMEM((nb, R, D) if gu == 1 else
                               (nb, R // gu, gu, D), U.dtype),
                    # 2 persistent slots, not nbuf step buffers
                    pltpu.VMEM((2, Rv, D) if gv == 1 else
                               (2, Rv // gv, gv, D), V.dtype),
                    pltpu.SemaphoreType.DMA((nb,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            return pl.pallas_call(
                _strip_kernel_pv(C, R, St, Rv, exact, gu=gu, gv=gv,
                                 nbuf=nb),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((out_rows, D),
                                               jnp.float32),
                cost_estimate=cost,
                interpret=interpret,
            )(meta, tuv_local, U, V)
        meta = jnp.concatenate(
            [ubase.reshape(n_steps, G),
             vbase.reshape(n_steps, G * Gv),
             oblk.reshape(n_steps, 1)], axis=1).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, G, 3, C), lambda i, *refs: (i, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (S, D), lambda i, meta: (meta[i, G + G * Gv], 0)),
            scratch_shapes=[
                pltpu.VMEM((nb, G, R, D) if gu == 1 else
                           (nb, G, R // gu, gu, D), U.dtype),
                pltpu.VMEM((nb, G, Rv, D) if (gv == 1 and Gv == 1) else
                           ((nb, G, Rv // gv, gv, D) if Gv == 1 else
                            ((nb, G, Gv, Rv // Gv, D) if gv == 1 else
                             (nb, G, Gv, Rv // Gv // gv, gv, D))),
                           V.dtype),
                pltpu.SemaphoreType.DMA((nb, G, 1 + Gv)),
            ],
        )
        return pl.pallas_call(
            _strip_kernel(C, R, S, St, Rv, exact, gu=gu, gv=gv, Gv=Gv,
                          nbuf=nb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, D), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(meta, tuv_local, U, V)

    splits = plan.launch_splits or ((0, plan.n_steps, 0,
                                     plan.out_rows // S),)
    if len(splits) == 1:
        return launch(plan.ubase, plan.vbase, plan.oblk,
                      plan.tuv_local, plan.out_rows, plan.v_sched)
    # Mosaic grid-length ceiling (see launch_splits): several launches
    # over disjoint block ranges; slices are static, outputs concat
    # (v_sched is built split-aware: each split's first step reloads
    # and waits its windows, since scratch dies at the call boundary)
    outs = []
    for (s0, s1, b0, b1) in splits:
        outs.append(launch(plan.ubase[s0:s1], plan.vbase[s0:s1],
                           plan.oblk[s0:s1] - b0,
                           plan.tuv_local[s0:s1], (b1 - b0) * S,
                           None if plan.v_sched is None
                           else plan.v_sched[s0:s1]))
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# spspmm roles (forward + both gradients) and custom_vjp
# ---------------------------------------------------------------------------


def normalize_strip_geom(g) -> Tuple[int, int, int, int, int, int, int,
                                     int]:
    """Accept v1-style (C, R, S) / (C, R, S, Rv), 5-tuple strip
    (C, R, S, St, Rv), 6-tuple (..., Gv), 7-tuple (..., Gv, align), or
    full 8-tuple (..., Gv, align, pv); fill defaults St = S//4 (when
    8-aligned), Gv = 1, align = 16 and pv = 0.

    ``align`` is the plan's window-base alignment (build_strip_plan's
    ``base_align``): 16 keeps bf16 grouped-DMA views legal; 1 gives the
    chunker the FULL window range (R_eff = R), which matters for tight
    R=128 windows where losing 15 rows of range fragments every strip
    (bf16 operands then upcast to f32 at the kernel boundary — measured
    neutral at molecule scale, BENCHMARKS "bf16-operand fused kernel").

    ``pv`` = 1 selects persistent v windows (build_strip_plan
    ``v_persistent``): the v window is DMA'd once per distinct window
    (e.g. once per community edge block) instead of once per step —
    the giant-graph fragmentation fix.  Requires G == 1 and Gv == 1."""
    g = tuple(int(x) for x in g)
    if len(g) == 8:
        return g
    if len(g) == 7:
        return g + (0,)
    if len(g) == 6:
        return g + (16, 0)
    if len(g) == 5:
        return g + (1, 16, 0)
    C, R, S = g[:3]
    Rv = g[3] if len(g) == 4 else R
    St = S // 4 if (S % 4 == 0 and (S // 4) % 8 == 0) else S
    return (C, R, S, St, Rv, 1, 16, 0)


def build_spspmm_strip_plans(
    acd: np.ndarray,
    x_rows: int,
    a_rows: int,
    out_rows: int,
    geoms: dict,
    pad_steps_to: Optional[dict] = None,
    steps_per_block_to: Optional[dict] = None,
) -> Tuple[StripPlan, StripPlan, StripPlan]:
    """(forward, dX, dA) strip plans from padded acd triples; ``geoms``
    maps role -> (C, R, S, St, Rv).  Same role orderings as v1
    build_spspmm_plans_for (kernels/fused_spspmm.py).

    ``steps_per_block_to`` maps role -> per-block step table (see
    build_strip_plan ``steps_per_block``); used by the v7 tuple-parallel
    builder to make per-shard plans stack under multi-launch splits."""
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    def mk(tuv, u_rows, v_rows, o_rows, g, pad, spb):
        C, R, S, St, Rv, Gv, align, pv = normalize_strip_geom(g)
        return build_strip_plan(tuv, rup(u_rows, R), rup(v_rows, Rv),
                                rup(o_rows, S), C, R, S, St, Rv,
                                base_align=align, pad_steps_to=pad, Gv=Gv,
                                steps_per_block=spb,
                                v_persistent=bool(pv))

    pad = pad_steps_to or {}
    spb = steps_per_block_to or {}
    # no pre-sorting needed: build_strip_plan orders (strip, u, v) itself
    fwd = mk(np.stack([a, c, d]), x_rows, a_rows, out_rows,
             geoms["fwd"], pad.get("fwd"), spb.get("fwd"))
    g_rows = fwd.out_rows
    dx = mk(np.stack([c, a, d]), g_rows, a_rows, x_rows,
            geoms["dx"], pad.get("dx"), spb.get("dx"))
    da = mk(np.stack([d, c, a]), x_rows, g_rows, a_rows,
            geoms["da"], pad.get("da"), spb.get("da"))
    return fwd, dx, da


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_spspmm_strip(Xv: jax.Array, Av: jax.Array, fwd: StripPlan,
                       dxp: StripPlan, dap: StripPlan,
                       interpret: Optional[bool] = None,
                       exact: bool = True) -> jax.Array:
    """Differentiable strip-kernel spspmm: out[a] = sum_cd X[c] * A[d].
    Drop-in for kernels.fused_spspmm with StripPlans."""
    return strip_contract(_pad_rows(Xv, fwd.u_rows),
                          _pad_rows(Av, fwd.v_rows), fwd,
                          interpret=interpret, exact=exact)


def _plan_zeros(plan: StripPlan):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plan)


def _fwd_rule(Xv, Av, fwd, dxp, dap, interpret, exact):
    out = fused_spspmm_strip(Xv, Av, fwd, dxp, dap, interpret, exact)
    return out, (Xv, Av, fwd, dxp, dap)


def _bwd_rule(interpret, exact, res, g):
    Xv, Av, fwd, dxp, dap = res
    g = g.astype(jnp.float32)
    dX = strip_contract(_pad_rows(g, dxp.u_rows),
                        _pad_rows(Av, dxp.v_rows), dxp,
                        interpret=interpret, exact=exact)[: Xv.shape[0]]
    dA = strip_contract(_pad_rows(Xv, dap.u_rows),
                        _pad_rows(g, dap.v_rows), dap,
                        interpret=interpret, exact=exact)[: Av.shape[0]]
    return (dX.astype(Xv.dtype), dA.astype(Av.dtype),
            _plan_zeros(fwd), _plan_zeros(dxp), _plan_zeros(dap))


fused_spspmm_strip.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# cost model + geometry autotuning
# ---------------------------------------------------------------------------

from .fused_spspmm import (_MXU_FLOPS, _VPU_RATE, _HBM_BW)  # noqa: E402

# per-step fixed cost: one batched primitive per stage means the v1
# per-chunk drain happens per STEP here.  Calibrated 2026-08-19 against
# an 8-geometry sweep on the ZINC fwd workload (measured 1.96-2.9
# us/step exact; the pure-MXU estimate at 165 TF/s tracked measurements
# within tunnel noise with ~0.4 us residual per step)
_STEP_FIXED = 0.4e-6


def estimate_strip_cost(plan: StripPlan, D: int, exact: bool = True,
                        itemsize: int = 4) -> float:
    """Calibrated time estimate (seconds) for one strip_contract launch.

    ``exact`` is intentionally unused since 2026-08-19 (kept for call
    compatibility): exact and fast bill the SAME single MXU pass — see
    the measurement note below.  It still matters in
    `estimate_strip_vmem`, which budgets exact-mode scratch.

    MXU billing is tile-aware: the contraction (K) dim of each matmul is
    rounded up to 128 lanes (gathers contract over R/Rv, the scatter
    over C — so C = 160 bills its scatter at K = 256), and the streamed
    M dim is billed at >= 128 rows (St = 64 measured at the M = 128 cost
    with half the array idle; BENCHMARKS "St=64 strips").  Re-checked
    against the round-2 measurements: the recorded fwd geometry
    (320, 256, 512, 128, 128) bills to 250 us vs 254 us measured.

    Exact mode bills ONE MXU pass, same as fast: since the mixed
    bf16xf32 dots landed (2026-08-19), exact and fast measure
    statistically identical on the v5e — ZINC 60.8k-triple cross-probe
    (each math on each mode's autotuned geometry) all four combos
    within 0.124-0.133 ms; 556k-row community graph measured exact
    3.89 ms vs 3.65 ms 1-pass estimate, where the old 3-pass billing
    said 6.90 ms (1.77x over).  Mosaic's internal f32 decomposition
    pipelines with the one-hot passes instead of tripling them."""
    C, R, S, St, Rv = plan.C, plan.R, plan.S, plan.St, plan.Rv
    G = plan.G
    n = plan.n_steps
    passes = 1

    def r128(x):
        return ((x + 127) // 128) * 128

    gath = 2 * max(C, 128) * (r128(R) + r128(Rv)) * D
    scat = 2 * max(St, 128) * r128(C) * D
    mxu = passes * G * (gath + scat) / _MXU_FLOPS
    vpu = G * (C * (R + Rv) + St * C) / _VPU_RATE
    t_comp = mxu + vpu
    if plan.v_persistent:
        # v windows are DMA'd once per DISTINCT window; only u rides
        # the per-step DMA stream
        t_dma = G * R * D * itemsize / _HBM_BW
        total = n * (max(t_comp, t_dma) + _STEP_FIXED)
        total += plan.n_v_windows * Rv * D * itemsize / _HBM_BW
    else:
        t_dma = G * (R + Rv) * D * itemsize / _HBM_BW
        total = n * (max(t_comp, t_dma) + _STEP_FIXED)
    total += plan.out_rows * D * itemsize / _HBM_BW
    total += n * G * (3 * C + 16) * 4 / _HBM_BW
    return total


# (C, R, S, St, Rv[, Gv[, align]]) candidates; G = S // St.  Measured
# guidance (2026-08-19 ZINC sweep): R/Rv should stay MXU-tile multiples
# of 128 (R=192 measured slower than R=256 despite fewer FLOPs).
# Wider-R entries cover giant-graph locality at G=2/G=1 so their VMEM
# footprint stays under the budget (see estimate_strip_vmem).
#
# The minimum-FLOP family (C=128-160, R=Rv=St=128, align=1) exploits
# the u-locality of molecule workloads (u spans per 128-target strip
# measured 138-157 on ZINC hop-3 — one R=128 window per ~128-row
# sub-chunk once the chunker may cut on the FULL range, hence align=1).
# Round-3 fill analysis: every cut on these workloads is a strip
# boundary; strips hold ~250 acd rows, so small windows cost nothing
# while halving per-triple gather FLOPs vs R=256.
_STRIP_GEOMS = (
    (256, 256, 512, 128, 128),
    (320, 256, 512, 128, 128),
    (256, 128, 512, 128, 128),
    (256, 256, 512, 128, 64),
    (384, 384, 512, 128, 128),
    (512, 512, 1024, 256, 256),
    (256, 512, 512, 128, 128),
    (256, 512, 256, 128, 256),
    (384, 768, 256, 128, 384),
    (512, 1024, 128, 128, 512),
    # minimum-FLOP small-window family (see note above)
    (128, 128, 1024, 128, 128, 1, 1),
    (128, 128, 768, 128, 128, 1, 1),
    (128, 128, 512, 128, 128, 1, 1),
    (160, 128, 1024, 128, 128, 1, 1),
    (144, 128, 1536, 128, 128, 1, 1),
    # St=96 single-piece strips: a 96-target strip's u span stays under
    # R=128 AND its ~190 rows fit one C=224-256 slot, so strips never
    # split — measured fwd exact 0.123-0.131 ms / fast 0.111-0.124 ms
    # on the ZINC workload (best of all round-3 candidates)
    (224, 128, 768, 96, 128, 1, 1),
    (256, 128, 768, 96, 128, 1, 1),
    # multi-base v windows (Gv sub-window DMAs): giant-graph regimes
    # whose per-strip edge spans exceed any single window
    (256, 1024, 128, 128, 512, 8),
    (256, 512, 256, 128, 256, 8),
    # Gv=16: the fragmented-community winner (556k-row 200x100 graph:
    # 3.89 ms exact = 0.143 G rows/s vs 5.92 for the Gv=8 pick, v5e
    # 2026-08-20; round-2's recorded best was 10.66 ms)
    (256, 512, 256, 128, 512, 16),
    # persistent-v-window family (pv=1): the v window covers a whole
    # community edge block and is DMA'd once per community — removes
    # the fragmented-graph window-byte amplification (the measured
    # round-3 bottleneck).  Wide Rv bills its one-hot K honestly in
    # the cost model, so these only win when window reuse is high.
    # S = St (G = 1): prefer S = 256 — S = 128 puts a once-per-block
    # step floor of out_rows/128 under fragmented workloads.
    (512, 512, 256, 256, 2048, 1, 16, 1),
    (512, 512, 128, 128, 2048, 1, 16, 1),
    (512, 512, 256, 256, 1536, 1, 16, 1),
    (384, 512, 256, 256, 2048, 1, 16, 1),
    (256, 512, 128, 128, 2048, 1, 16, 1),
    (512, 256, 256, 256, 1024, 1, 16, 1),
    # r5 pv candidates at S = St = 512 (vs the S = 256 guidance above).
    # CAUTION: the first A/B (runs/giant_pv_r4.json) that read these as
    # 1.20x winners was bias-contaminated — the harness passed HOST
    # numpy plans as jit args, which re-transfer every call (measured
    # 280-330 ms/dispatch vs 25-33 with device plans, interleaved), and
    # plan sizes differ ~1.6x across candidates, favoring the
    # small-plan pv entries.  Kept in the pool because the cost model
    # prices them above the Gv family anyway (they only surface via
    # autotune(measure=K), which times device-resident plans); the
    # unbiased re-measure is queued as runs/giant_pv_r5.json.
    (384, 512, 512, 512, 2048, 1, 16, 1),
    (512, 512, 512, 512, 2048, 1, 16, 1),
)

# per-launch VMEM budget for the CONSERVATIVE estimator below (which
# over-counts vs what Mosaic actually materializes: geometries
# estimated at 13-14 MB compile and run on the 16 MB v5e; the observed
# crasher estimated 49 MB).  16 MB rejects the true monsters while
# keeping every hardware-validated geometry.
# r5 fragmented-graph family from the host sweep on the 556k community
# graph: the strip-level instrumentation showed (a) per-strip u spans of
# ~140 rows — R=512 was 2x oversized, R=256 halves the u-gather one-hot;
# (b) the Gv=16 fill ceiling (~0.52) is the sub-window GRANULARITY: a
# 16-sub-window batch covers only ~150 triples' v rows (9 uniques per
# 32-row run at the graph's ~0.3 per-strip v-intersection density),
# cutting sub-chunks far below C.  Gv=32-64 at Rv=1024 matches
# granularity to density: est 2.67-2.73 ms vs the Gv=16 winner's 3.65.
# First A/B 2026-08-20 (runs/giant_pv_r4.json) measured the family at
# 5.0-5.9 ms, but that artifact is bias-contaminated (host-plan jit
# args re-transferred per call, see the pv pool note above) — the
# in-session ordering it showed is NOT trustworthy and the family is
# NOT promoted; runs/giant_pv_r5.json (device-resident plans) is the
# deciding artifact.  This tuple remains the A/B candidate list.
_STRIP_GEOMS_R5_GIANT = (
    (384, 256, 256, 128, 1024, 64),
    (256, 256, 512, 256, 512, 32),
    (384, 256, 256, 128, 1024, 32),
    (256, 256, 512, 128, 512, 32),
    (384, 256, 512, 256, 1024, 64),
)

_VMEM_BUDGET = 16 * 1024 * 1024


def estimate_strip_vmem(geom, D: int, exact: bool = True,
                        itemsize: int = 4) -> int:
    """Conservative VMEM bytes for one strip_contract launch — used to
    reject geometries that would crash the Mosaic compiler (observed:
    (512, 1024, 1024, 256, 1024) at D=128 exhausts the 16 MB VMEM with
    register-allocator spills)."""
    C, R, S, St, Rv, _Gv, _al, _pv = normalize_strip_geom(geom)
    G = S // St
    win = 2 * G * (R + Rv) * D * itemsize          # double-buffered windows
    tuv = 2 * G * 3 * C * 4                        # block double buffer
    onehot = G * C * (R + Rv) * (2 + 4)            # bf16 one-hot + i32 iota
    oh_t = G * St * C * (2 + 4)
    # exact mode no longer packs 3-term bf16 splits (mixed bf16xf32
    # dots since 2026-08-19); budget 2 bf16 hi/lo copies per f32 dot
    # operand as a proxy for Mosaic's internal decomposition scratch
    packs = (G * (R + Rv) * 2 * D * 2 + G * C * 2 * D * 2) if exact else 0
    inter = 3 * G * C * D * 4                      # gathered u/v + product
    out = 2 * S * D * 4
    return win + tuv + onehot + oh_t + packs + inter + out


_PROBE_CACHE: dict = {}


def _probe_strip_geom(geom, D: int, exact: bool) -> bool:
    """Compile-probe one candidate geometry: AOT-compile a tiny
    one-launch `strip_contract` instance and report whether Mosaic
    accepts it.  The crash modes this guards (register-allocator VMEM
    spills, tile-divisibility proofs — CLAUDE.md "Mosaic remote compile
    CRASHES on") depend only on (geometry, D, dtype math), not on the
    workload, so a minimal synthetic plan is a faithful probe.  Results
    are cached per process; non-TPU backends (interpret mode) trivially
    pass.  Regression seed: (256, 256, 512, 128, 256, 8) builds a valid
    plan but dies in Mosaic compile (BENCHMARKS 2026-08-20)."""
    key = (normalize_strip_geom(geom), D, bool(exact))
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    if jax.default_backend() != "tpu":
        return True     # interpret mode can't crash Mosaic; don't cache
    C, R, S, St, Rv, Gv, align, pv = normalize_strip_geom(geom)
    ok = True
    try:
        tuv = np.stack([np.arange(S, dtype=np.int64),
                        np.zeros(S, dtype=np.int64),
                        np.zeros(S, dtype=np.int64)])
        plan = build_strip_plan(tuv, R, Rv, S, C, R, S, St, Rv,
                                base_align=align, Gv=Gv,
                                v_persistent=bool(pv))
        U = jax.ShapeDtypeStruct((R, D), jnp.float32)
        V = jax.ShapeDtypeStruct((Rv, D), jnp.float32)
        strip_contract.lower(U, V, plan, exact=exact).compile()
    except Exception as ex:    # Mosaic failures surface as many types
        import warnings

        warnings.warn(f"strip geometry {geom} failed compile probe "
                      f"({type(ex).__name__}: {str(ex)[:200]}); "
                      f"falling back to next-best candidate")
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


def _time_strip_plans(plans, D: int, exact: bool,
                      iters: int = 12, reps: int = 3) -> list:
    """On-device wall time per plan (seconds/contraction), interleaved
    across candidates so tunnel/session drift hits all equally.  Plans
    ride as jit ARGUMENTS (closure capture would inline MBs of plan
    constants into HLO).  Candidates whose compile or run fails time as
    inf."""
    import time

    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda u, v, p: jax.lax.fori_loop(
        0, iters, lambda i, acc: acc + strip_contract(
            u, v, p, exact=exact)[0, :1], jnp.zeros((1,), jnp.float32)),
        static_argnames=())

    rng = np.random.default_rng(0)
    ops, best = [], [float("inf")] * len(plans)
    for p in plans:
        try:
            # device_put the PLAN too: its index arrays are host numpy
            # (tens of MB on giant graphs) and jit re-transfers numpy
            # args every call — through the tunnel that transfer would
            # dominate the timing and rank candidates by plan bytes,
            # not kernel speed
            U = jax.device_put(
                rng.normal(size=(p.u_rows, D)).astype(np.float32))
            V = jax.device_put(
                rng.normal(size=(p.v_rows, D)).astype(np.float32))
            p = jax.device_put(p)
            float(jnp.sum(run(U, V, p)))          # compile + warm
            ops.append((U, V, p))
        except Exception:                         # Mosaic crash at the
            ops.append(None)                      # real (not probe) shape
    for _ in range(reps):
        for i, op in enumerate(ops):
            if op is None:
                continue
            U, V, p = op
            try:
                t0 = time.perf_counter()
                float(jnp.sum(run(U, V, p)))
                best[i] = min(best[i],
                              (time.perf_counter() - t0) / iters)
            except Exception:       # runtime failure / tunnel outage:
                ops[i] = None       # drop the candidate, keep tuning
                best[i] = float("inf")
    return best


def autotune_strip_geoms(acd: np.ndarray, x_rows: int, a_rows: int,
                         out_rows: int, D: int = 128, exact: bool = True,
                         candidates=None, probe: bool = True,
                         measure: int = 0) -> dict:
    """Per-role strip geometry by building REAL plans per candidate and
    scoring with estimate_strip_cost (mirrors v1 autotune_spspmm_geoms).
    The cost-ranked winner is compile-probed (`_probe_strip_geom`)
    before selection so a Mosaic-crashing geometry can never take down
    training — it falls back to the next-best candidate instead.

    ``measure`` > 0 (TPU only): the top-``measure`` cost-ranked,
    probe-passing candidates are additionally TIMED on device with
    their real plans (interleaved reps, min taken) and the measured
    winner is returned.  This closes the gap where the analytic model
    mispredicts DMA/compute overlap — on the 556k fragmented community
    graph the model prices the pv family 1.4x ABOVE the Gv=64 family
    while hardware runs it 1.1x FASTER (runs/giant_pv_r4.json).  Each
    timed candidate costs one remote compile (~20-40 s through the
    tunnel), so reserve it for plans reused many times (giant graphs,
    long trainings)."""
    acd = np.asarray(acd)
    a, c, d = acd[0], acd[1], acd[2]
    real = a < PAD_INDEX
    a, c, d = a[real], c[real], d[real]

    def rup(n, m):
        return max(((n + m - 1) // m) * m, m)

    def tune(tuv, u_rows, v_rows, o_rows):
        scored = []
        pool = [g for g in (candidates or _STRIP_GEOMS)
                if estimate_strip_vmem(g, D, exact) <= _VMEM_BUDGET]
        if not pool:  # degenerate D: take the smallest-footprint entry
            pool = [min(candidates or _STRIP_GEOMS,
                        key=lambda g: estimate_strip_vmem(g, D, exact))]
        for g in pool:
            C, R, S, St, Rv, Gv, align, pv = normalize_strip_geom(g)
            try:
                plan = build_strip_plan(tuv, rup(u_rows, R),
                                        rup(v_rows, Rv),
                                        rup(o_rows, S), C, R, S, St, Rv,
                                        base_align=align, Gv=Gv,
                                        v_persistent=bool(pv))
            except (AssertionError, StripPlanError):
                # e.g. one output block needs more grid steps than the
                # Mosaic ceiling and launch splitting can't cut it —
                # this candidate simply doesn't fit the workload
                continue
            # keep the plan only when the measure stage will time it —
            # retaining all ~20 candidates' plans (tens of MB each on
            # giant graphs) would blow host memory for plain autotune
            scored.append((estimate_strip_cost(plan, D, exact), g,
                           plan if measure > 0 else None))
        if not scored:
            raise StripPlanError("no strip geometry candidate fits")
        scored.sort(key=lambda cg: cg[0])
        if measure > 0 and jax.default_backend() == "tpu":
            # probe lazily in cost order and stop at `measure`
            # finalists — each uncached probe is a remote compile
            finalists = []
            for _, g, plan in scored:
                if len(finalists) >= measure:
                    break
                if not probe or _probe_strip_geom(g, D, exact):
                    finalists.append((g, plan))
            if finalists:
                ts = _time_strip_plans([p for _, p in finalists],
                                       D, exact)
                i = int(np.argmin(ts))
                if np.isfinite(ts[i]):
                    return finalists[i][0]
        for _, g, _plan in scored:
            if not probe or _probe_strip_geom(g, D, exact):
                return g
        raise StripPlanError(
            "every fitting strip geometry failed its compile probe")

    g_fwd = tune(np.stack([a, c, d]), x_rows, a_rows, out_rows)
    g_rows = rup(out_rows, g_fwd[2])
    g_dx = tune(np.stack([c, a, d]), g_rows, a_rows, x_rows)
    g_da = tune(np.stack([d, c, a]), x_rows, g_rows, a_rows)
    return {"fwd": g_fwd, "dx": g_dx, "da": g_da}
