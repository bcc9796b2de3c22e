"""Single-launch fused attention on the strip kernel (Pallas TPU).

The spspmpnn attention chain (reference Spspmm.py:334-380; the NGAT
message closure in honn/conv.py) is, per triple (a, c, d):

    s_k   = a1[c_k] * aA[d_k] * a2[a_k]          (per-channel score)
    e_k   = exp(s_k - m)                          (m: per-channel shift)
    out[a] = (sum_k e_k * a3[c_k]) / (sum_k e_k)  (softmax-aggregate)

Round 2's two-launch composition (score stage + aggregate stage on the
strip kernel, softmax on XLA) still materializes the (K, D) score array
twice and pays an extra kernel round trip; BENCHMARKS.md's floor
analysis puts a single-launch kernel at ~1.5x a plain contraction.
This module is that kernel: ONE strip launch computes gathers, the
exponential, and the numerator/denominator scatters; only the final
division stays on XLA.  The softmax shift is the per-SEGMENT bound
t[a] = |a2[a]| * B with B[d] = max|a1| * max|aA| (column maxima, no
gathers; computed in-kernel from the gathered a2): any per-segment
constant cancels in the softmax ratio exactly, so the bound only has
to keep e representable (s - t <= 0 by construction; underflow needs
the bound to overshoot the true row max by >85 nats, vs the measured
~10-40 for this bound — a GLOBAL product bound including max|a2|
measured 30-105 nats over and flushed most rows to zero, which is why
the a2 factor stays per-row).

Gradients run as three more strip launches that RECOMPUTE e in-kernel
(flash-attention-style; e is never materialized in HBM).  With
gZ = g / Z and goZ = gZ * out (cheap XLA elementwise on the cotangent):

    ds_k   = e_k * (a3[c]*gZ[a] - goZ[a])
    d_a2[a] += ds * a1[c] * aA[d]     (strip-sorted by a — fwd plan)
    d_a1[c] += ds * aA[d] * a2[a]     (strip-sorted by c — dx plan)
    d_a3[c] += e  * gZ[a]             (same launch as d_a1: packed lanes)
    d_aA[d] += ds * a1[c] * a2[a]     (strip-sorted by d — da plan)

Every role is the SAME kernel shape — two one-hot window gathers + one
strip-side gather (the transpose of the scatter one-hot) + VPU math +
one strip-aligned scatter — parameterized by which score factors live
in which window and by the message expression.  Plans are the plain
``build_spspmm_strip_plans(acd, x_rows, e_rows, x_rows, geoms)`` triple
on the raw (a, c, d) triples.  Multi-feature operand groups stay
SEPARATE HBM refs DMA'd into per-operand VMEM planes (one shared
one-hot, one dot per operand): the former packed-lane layout made the
XLA wrapper materialize (rows, W*D) concats on every call — the
measured per-call prologue cost the round-2 verdict flagged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .strip_spspmm import StripPlan, _batch_dot, estimate_strip_vmem

__all__ = ["strip_attention_role", "fused_attention_strip",
           "estimate_att_vmem"]


# denominator floor: the measured f32 accuracy edge (~e^-60) — below
# this the forward poisons (with a nonempty mask; opt-in) or returns 0
_DEN_FLOOR = 1e-26
# backward cotangent floor == the forward floor.  (r5 tried widening
# this to 1e-8 against the tuned-lr fused-NGAT nan; WRONG — the loose
# global-shift bound puts legitimate dens at ~1e-18 even for unit-scale
# activations, and the oracle gradient parity breaks at 0.58 rel.  The
# tuned-lr chained-fused instability is still open: repro in
# BENCHMARKS "NGAT tuned-HP"; unfused XLA path is clean and is the
# production fallback for aggressive-lr NGAT training.)
_GRAD_FLOOR = _DEN_FLOOR

# role -> (Wu, Wv, Wt, Wout) window lane widths in units of D
_ROLE_WIDTHS = {
    "fwd": (2, 1, 1, 2),   # u=[a1|a3]  v=[aA]        t=[a2]     out=[num|den]
    "dw":  (2, 1, 3, 1),   # u=[a1|a3]  v=[aA]        t=[a2|gZ|goZ]  out=[da2]
    "dc":  (3, 1, 2, 2),   # u=[a2|gZ|goZ]  v=[aA]    t=[a1|a3]  out=[da1|da3]
    "dv":  (2, 3, 1, 1),   # u=[a1|a3]  v=[a2|gZ|goZ] t=[aA]     out=[daA]
}


def _att_math(role, tuv, u_ops, v_ops, t_ops, m, C, R, St, Rv, exact):
    """One step's G sub-chunks of the attention role ``role``.
    tuv: (G, 3, C) i32; u_ops/v_ops/t_ops: per-operand window tuples of
    (G, R, D) / (G, Rv, D) / (G, St, D); m: (1, D) f32.  Returns
    (G*St, Wout*D) f32.

    Operands arrive UNPACKED (one HBM ref per operand, DMA'd into
    per-operand VMEM planes) — the former packed-lane layout forced the
    XLA wrapper to materialize (rows, Wu*D) concats per call, which was
    the measured per-call prologue cost (BENCHMARKS.md single-launch
    attention).  Each gather shares its one-hot across the group's
    operands; exact mode feeds the f32 operand straight into the dot
    against the exact bf16 one-hot (Mosaic decomposes the f32 side —
    same mixed-dot route as strip_spspmm._strip_math)."""
    import jax.lax as lax

    G = tuv.shape[0]
    t_loc, u_loc, v_loc = tuv[:, 0, :], tuv[:, 1, :], tuv[:, 2, :]

    def gather(loc, ops, width):
        iota = lax.broadcasted_iota(jnp.int32, (G, C, width), 2)
        oh = (loc[:, :, None] == iota).astype(jnp.bfloat16)

        def one(w):
            if exact and w.dtype != jnp.bfloat16:
                return _batch_dot(oh, w)      # mixed: Mosaic splits w
            return _batch_dot(oh, w.astype(jnp.bfloat16))

        return tuple(one(w) for w in ops)

    gu = gather(u_loc, u_ops, R)
    gv = gather(v_loc, v_ops, Rv)
    # strip-side gather: the transpose of the scatter one-hot
    st = gather(t_loc, t_ops, St)

    # map gathered groups onto (u1, u3 | w, gZ, goZ | v) per role.
    # the softmax shift is PER SEGMENT: t[a] = |w[a]| * B with
    # B[d] = max|a1| * max|av| (the m input) — segment-constant, so it
    # cancels in the softmax ratio exactly; a *global* product bound
    # (max|a1|*max|av|*max|a2|) measured 30-105 nats above the true row
    # max on normal data, flushing e below f32's subnormal cutoff
    # (~e^-87, TPU flushes) for most rows
    def _e(u1, v, w):
        return jnp.exp(u1 * v * w - jnp.abs(w) * m[None])

    if role == "fwd":
        u1, u3 = gu
        (v,), (w,) = gv, st
        e = _e(u1, v, w)
        msg = jnp.concatenate([u3 * e, e], axis=-1)
    elif role == "dw":
        u1, u3 = gu
        (v,), (w, gZ, goZ) = gv, st
        e = _e(u1, v, w)
        msg = e * (u3 * gZ - goZ) * u1 * v
    elif role == "dc":
        w, gZ, goZ = gu
        (v,), (u1, u3) = gv, st
        e = _e(u1, v, w)
        msg = jnp.concatenate(
            [e * (u3 * gZ - goZ) * v * w, e * gZ], axis=-1)
    elif role == "dv":
        u1, u3 = gu
        (w, gZ, goZ), (v,) = gv, st
        e = _e(u1, v, w)
        msg = e * (u3 * gZ - goZ) * u1 * w
    else:  # pragma: no cover
        raise ValueError(role)

    iota_t = lax.broadcasted_iota(jnp.int32, (G, St, C), 1)
    oh_t = (t_loc[:, None, :] == iota_t).astype(jnp.bfloat16)
    if exact:
        acc = _batch_dot(oh_t, msg)          # mixed: Mosaic splits msg
    else:
        acc = _batch_dot(oh_t, msg.astype(jnp.bfloat16))
    return acc.reshape(G * St, -1)


def _att_kernel(role: str, C: int, R: int, S: int, St: int, Rv: int,
                exact: bool, Gv: int = 1):
    """Double-buffered attention strip kernel: per-OPERAND u/v window
    DMAs plus strip-side DMAs of each t-operand's own St rows per
    sub-chunk (base = oblk*S + g*St, derived from the scalar-prefetched
    oblk).  Each operand is its own HBM ref copied into its own VMEM
    plane — no packed-lane layouts, so the XLA caller never
    materializes operand concats (the former per-call prologue cost).
    ``Gv``: every v-operand window fills from Gv disjoint sub-window
    DMAs (multi-base windows; 16-aligned bases since 2026-08-19)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = S // St
    Rvs = Rv // Gv
    Wu, Wv, Wt, _ = _ROLE_WIDTHS[role]

    # packed prefetch meta[step] = [ubase (G) | vbase (G*Gv) | oblk]:
    # one smem buffer per launch instead of three — XLA bills prefetch
    # buffers at page granularity and 6-layer chained programs with
    # several launches/layer overflowed the 1 MB smem budget (see the
    # same fix in strip_spspmm._strip_kernel)
    def kernel(meta_ref, tuv_ref, m_ref, *refs):
        u_hbm = refs[:Wu]
        v_hbm = refs[Wu:Wu + Wv]
        t_hbm = refs[Wu + Wv:Wu + Wv + Wt]
        o_ref, ubuf, vbuf, tbuf, sems = refs[Wu + Wv + Wt:]
        i = pl.program_id(0)
        n = pl.num_programs(0)

        # operands arrive as (rows/16, 16, D) grouped views: this
        # Mosaic's tile-divisibility proof rejects dynamic-base slices
        # on ANY tiled dim wider than one lane tile (128), f32 included
        # (probed 2026-08-19); the grouped leading dim is untiled, and
        # plan bases are 16-aligned (base_align=16, the planner default)
        def u_copy(step, buf, g, w):
            return pltpu.make_async_copy(
                u_hbm[w].at[pl.ds(meta_ref[step, g] // 16, R // 16)],
                ubuf.at[buf, g, w], sems.at[buf, g, w])

        def t_copy(step, buf, g, w):
            return pltpu.make_async_copy(
                t_hbm[w].at[pl.ds(meta_ref[step, G + G * Gv] * (S // 16)
                                  + g * (St // 16), St // 16)],
                tbuf.at[buf, g, w], sems.at[buf, g, Wu + w])

        def v_copy(step, buf, g, w, sub):
            if Gv == 1:
                return pltpu.make_async_copy(
                    v_hbm[w].at[pl.ds(meta_ref[step, G + g * Gv] // 16,
                                      Rv // 16)],
                    vbuf.at[buf, g, w], sems.at[buf, g, Wu + Wt + w])
            return pltpu.make_async_copy(
                v_hbm[w].at[pl.ds(meta_ref[step, G + g * Gv + sub] // 16,
                                  Rvs // 16)],
                vbuf.at[buf, g, w, sub],
                sems.at[buf, g, Wu + Wt + w * Gv + sub])

        def start_all(step, buf):
            for g in range(G):
                for w in range(Wu):
                    u_copy(step, buf, g, w).start()
                for w in range(Wt):
                    t_copy(step, buf, g, w).start()
                for w in range(Wv):
                    for sub in range(Gv):
                        v_copy(step, buf, g, w, sub).start()

        @pl.when(i == 0)
        def _():
            start_all(0, 0)

        @pl.when(i + 1 < n)
        def _():
            start_all(jnp.minimum(i + 1, n - 1), (i + 1) % 2)

        for g in range(G):
            for w in range(Wu):
                u_copy(i, i % 2, g, w).wait()
            for w in range(Wt):
                t_copy(i, i % 2, g, w).wait()
            for w in range(Wv):
                for sub in range(Gv):
                    v_copy(i, i % 2, g, w, sub).wait()

        D = ubuf.shape[-1]
        u_ops = tuple(ubuf[i % 2, :, w].reshape(G, R, D)
                      for w in range(Wu))
        v_ops = tuple(vbuf[i % 2, :, w].reshape(G, Rv, D)
                      for w in range(Wv))
        t_ops = tuple(tbuf[i % 2, :, w].reshape(G, St, D)
                      for w in range(Wt))
        acc = _att_math(role, tuv_ref[0], u_ops, v_ops, t_ops,
                        m_ref[0:1], C, R, St, Rv, exact)

        first = jnp.logical_or(
            i == 0, meta_ref[i, G + G * Gv]
            != meta_ref[jnp.maximum(i - 1, 0), G + G * Gv])

        @pl.when(first)
        def _():
            o_ref[:] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            o_ref[:] = o_ref[:] + acc

    return kernel


def estimate_att_vmem(role: str, geom, D: int, exact: bool = True,
                      Gv: int = 1) -> int:
    """VMEM bytes for one attention-role step (window buffers x2 for
    double buffering + the step's gather/scatter intermediates), the
    attention analog of estimate_strip_vmem."""
    C, R, S, St, Rv = geom[:5]
    G = S // St
    Wu, Wv, Wt, Wout = _ROLE_WIDTHS[role]
    f = 3 if exact else 1
    win = 2 * G * (R * Wu + Rv * Wv + St * Wt) * D * 4
    onehot = G * C * (R + Rv + 2 * St) * 2
    inter = G * C * D * (Wu + Wv + Wt + Wout) * 4 \
        + G * C * max(Wu, Wv, Wt, Wout) * D * f * 2
    out = S * Wout * D * 4
    return win + onehot + inter + out


@functools.partial(jax.jit,
                   static_argnames=("role", "interpret", "exact"))
def strip_attention_role(role: str, U, V, T, m: jax.Array,
                         plan: StripPlan,
                         interpret: Optional[bool] = None,
                         exact: bool = True) -> jax.Array:
    """Run one attention role per ``plan``.  U/V/T: PER-OPERAND tuples
    of (>=plan.u_rows, D) / (>=plan.v_rows, D) / (>=plan.out_rows, D)
    arrays (lengths Wu/Wv/Wt per _ROLE_WIDTHS); m: (1, D) f32.  Returns
    (plan.out_rows, Wout*D) f32.  Keeping operands separate means the
    caller never pays packed-lane concats — each operand streams from
    its own HBM ref into its own VMEM window plane."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    C, R, S, St, Rv = plan.C, plan.R, plan.S, plan.St, plan.Rv
    G, Gv = plan.G, plan.Gv
    Wu, Wv, Wt, Wout = _ROLE_WIDTHS[role]
    U, V, T = tuple(U), tuple(V), tuple(T)
    assert len(U) == Wu and len(V) == Wv and len(T) == Wt, (
        role, len(U), len(V), len(T))
    D = U[0].shape[-1]
    assert Gv == 1 or plan.v_align % 16 == 0, (
        "Gv > 1 attention plans need 16-aligned sub-window bases "
        "(build with base_align=16, the planner default)")
    assert R % 16 == 0 and (Rv // Gv) % 16 == 0 and St % 16 == 0, (
        R, Rv, Gv, St)
    for x in U + V + T:
        assert x.shape[-1] == D, (role, [x.shape for x in U + V + T])
    assert all(x.shape[0] >= plan.u_rows for x in U) \
        and all(x.shape[0] >= plan.v_rows for x in V) \
        and all(x.shape[0] >= plan.out_rows for x in T)

    def group16(x):
        return x.astype(jnp.float32)[: (x.shape[0] // 16) * 16].reshape(
            -1, 16, x.shape[-1])

    U = tuple(group16(x) for x in U)
    V = tuple(group16(x) for x in V)
    m8 = jnp.zeros((8, D), jnp.float32).at[0].set(
        m.reshape(-1).astype(jnp.float32))
    if not interpret:
        assert D % 128 == 0, (
            f"attention strip kernel needs D % 128 == 0 (got {D})")
        from .strip_spspmm import _VMEM_BUDGET
        vmem = estimate_att_vmem(role, (C, R, S, St, Rv), D, exact)
        assert vmem <= _VMEM_BUDGET, (
            f"attention role {role} geometry (C={C}, R={R}, S={S}, "
            f"St={St}, Rv={Rv}) needs ~{vmem / 1e6:.0f} MB VMEM at "
            f"D={D} (> {_VMEM_BUDGET / 1e6:.0f} MB budget); pick a "
            f"narrower window (autotune with D=3*hiddim is a safe "
            f"conservative filter)")

    def launch(ubase, vbase, oblk, tuv_local, t_parts, out_rows):
        n_steps = int(oblk.shape[0])
        passes = 3 if exact else 1
        flops = 2 * n_steps * G * passes * C * D * (
            R * Wu + Rv * Wv + St * Wt + St * Wout)
        cost = pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_steps * G * (R * Wu + Rv * Wv
                                          + 2 * St * Wt) * D * 4,
            transcendentals=n_steps * G * C * D)
        meta = jnp.concatenate(
            [ubase.reshape(n_steps, G),
             vbase.reshape(n_steps, G * Gv),
             oblk.reshape(n_steps, 1)], axis=1).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, G, 3, C), lambda i, *refs: (i, 0, 0, 0)),
                pl.BlockSpec((8, D), lambda i, *refs: (0, 0)),
                # pin operands to HBM: pl.ANY lets Mosaic place small
                # arrays in VMEM, where the dynamic-base window DMA hits
                # the tile-divisibility proof even for f32
                *([pl.BlockSpec(memory_space=pltpu.HBM)]
                  * (Wu + Wv + Wt)),
            ],
            out_specs=pl.BlockSpec(
                (S, Wout * D),
                lambda i, meta: (meta[i, G + G * Gv], 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, Wu, R // 16, 16, D), jnp.float32),
                pltpu.VMEM((2, G, Wv, Rv // 16, 16, D) if Gv == 1 else
                           (2, G, Wv, Gv, Rv // Gv // 16, 16, D),
                           jnp.float32),
                pltpu.VMEM((2, G, Wt, St // 16, 16, D), jnp.float32),
                pltpu.SemaphoreType.DMA((2, G, Wu + Wt + Wv * Gv)),
            ],
        )
        return pl.pallas_call(
            _att_kernel(role, C, R, S, St, Rv, exact, Gv=Gv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, Wout * D),
                                           jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(meta, tuv_local, m8, *U, *V,
          *(group16(t) for t in t_parts))

    splits = plan.launch_splits or ((0, plan.n_steps, 0,
                                     plan.out_rows // S),)
    if len(splits) == 1:
        return launch(plan.ubase, plan.vbase, plan.oblk,
                      plan.tuv_local, T, plan.out_rows)
    outs = []
    for (s0, s1, b0, b1) in splits:
        outs.append(launch(plan.ubase[s0:s1], plan.vbase[s0:s1],
                           plan.oblk[s0:s1] - b0, plan.tuv_local[s0:s1],
                           tuple(t[b0 * S:b1 * S] for t in T),
                           (b1 - b0) * S))
    return jnp.concatenate(outs, axis=0)


# ---------------------------------------------------------------------------
# differentiable softmax-attention contraction
# ---------------------------------------------------------------------------


def _pad_to(x, rows):
    if x.shape[0] >= rows:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((rows - x.shape[0],) + x.shape[1:], x.dtype)])


def _shift_bound(a1, av):
    """Per-channel B[d] = max|a1| * max|av| (column maxima; pad rows
    are zeroed upstream, so they never raise the max).  The kernel's
    softmax shift is the per-segment t[a] = |a2[a]| * B >= |score| —
    see _att_math for why the a2 factor must stay per-row."""
    m = jnp.max(jnp.abs(a1), axis=0) * jnp.max(jnp.abs(av), axis=0)
    return jax.lax.stop_gradient(m.astype(jnp.float32))[None]



# Poison-mode default: OFF.  r5 measured that mid-training periodic
# evals routinely visit transiently-flushing models (one aggressive
# tuned-lr step spreads scores past the global-shift f32 window), so a
# loud NaN default aborts legitimate training runs at either the train
# step (chained) or the val metric (dispatched).  The torch reference's
# per-row-max softmax has no such edge and trains through.  Serving /
# debugging can opt back into the loud contract:
# set_attention_poison(True) BEFORE tracing (read at trace time).
_POISON = False


def set_attention_poison(on: bool) -> None:
    global _POISON
    _POISON = bool(on)


def get_attention_poison() -> bool:
    return _POISON


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_attention_strip(a1: jax.Array, a3: jax.Array, av: jax.Array,
                          a2: jax.Array, fwd: StripPlan, dxp: StripPlan,
                          dap: StripPlan,
                          nonempty: Optional[jax.Array] = None,
                          interpret: Optional[bool] = None,
                          exact: bool = True,
                          poison: bool = True) -> jax.Array:
    """out[a] = softmax_k(a1[c_k]*av[d_k]*a2[a])-weighted sum of a3[c_k]
    over triples (a, c, d) — the full NGAT attention chain in one strip
    launch (plus the final division).  a1/a3/a2: (x_rows, D);
    av: (e_rows, D).  Plans: build_attention_strip_plans(acd, x_rows,
    e_rows, geoms).  Returns (fwd.out_rows, D) f32.

    ``nonempty`` (bool (x_rows,), rows that have triples — cheap from
    acd): rows whose denominator fully flushed to zero (the shift bound
    overshot f32's ~85-nat window — activations far outside the
    normalized regime; any f32 softmax is in range trouble there) are
    poisoned with NaN instead of returning a silent 0, so NaN guards
    catch it; without the mask they return 0 like genuinely empty rows.

    ``poison=False`` (training mode): flushed rows return a finite 0
    with zero gradient for the step instead of NaN.  The loud default
    is for eval/serving, where a flush means the inputs are outside
    the trained regime; during TRAINING the transient is NORMAL — one
    aggressive optimizer step (e.g. the reference's tuned lr 1e-2 on
    ZINC) spreads scores past the global-shift f32 window on some
    rows, and poisoning turns a recoverable transient into a nan loss
    that kills the run (observed r5: NGAT tuned-HP run died at epoch
    1; the torch reference's per-row-max softmax trains through it).
    """
    out, _ = _att_fwd(a1, a3, av, a2, fwd, dxp, dap, nonempty,
                      interpret, exact, poison)
    return out


def _att_fwd(a1, a3, av, a2, fwd, dxp, dap, nonempty, interpret, exact,
             poison=True):
    m = _shift_bound(a1, av)
    # per-operand tuples — _pad_to is a no-op whenever the loader's
    # row buckets already match the plan paddings (the common case), so
    # the wrapper's former per-call concat/copy prologue vanishes
    U = (_pad_to(a1, fwd.u_rows), _pad_to(a3, fwd.u_rows))
    V = (_pad_to(av, fwd.v_rows),)
    T = (_pad_to(a2, fwd.out_rows),)
    nd = strip_attention_role("fwd", U, V, T, m, fwd, interpret, exact)
    D = a1.shape[-1]
    num, den_raw = nd[:, :D], nd[:, D:]
    out = num / jnp.maximum(den_raw, 1e-30)
    if nonempty is not None:
        # measured f32 edge (v5e, f64-oracle buckets): channels with
        # den >= e^-60 are accurate to <1e-4; below that num/den is
        # cancellation junk.  Eval (poison=True): NaN, don't silently
        # mis-normalize.  Train (poison=False): finite 0 with zero
        # grad for the step — the backward already zeroes flushed
        # cotangents, so the transient is recoverable.
        bad = _pad_to(nonempty.reshape(-1, 1),
                      fwd.out_rows) & (den_raw < _DEN_FLOOR)
        out = jnp.where(bad,
                        jnp.float32(jnp.nan) if poison else
                        jnp.float32(0.0), out)
    return out, (a1, a3, av, a2, m, out, den_raw, fwd, dxp, dap, nonempty)


def _att_bwd(interpret, exact, poison, res, g):
    a1, a3, av, a2, m, out, den_raw, fwdp, dxp, dap, nonempty = res
    D = a1.shape[-1]
    x_rows = a1.shape[0]
    e_rows = av.shape[0]
    # flush-edge channels (den below the poison floor): 1/den explodes
    # to ~1e30 and the recomputed in-kernel e times it leaks junk into
    # every gradient that row's triples touch (measured 1e-2 rel on
    # da3) — zero their cotangent instead; the forward already poisons
    # them with NaN under the nonempty mask
    safe = den_raw >= _GRAD_FLOOR
    gZ = jnp.where(safe,
                   g.astype(jnp.float32)[:den_raw.shape[0]]
                   / jnp.maximum(den_raw, 1e-30), 0.0)
    goZ = jnp.where(safe, gZ * out, 0.0)
    # plans were built with out_rows == x-row padding, so gZ/goZ align
    # with a2's row space directly; per-operand tuples, no concats
    rows2 = max(fwdp.out_rows, dxp.u_rows, dap.v_rows)
    T2 = (_pad_to(a2.astype(jnp.float32), rows2),
          _pad_to(gZ, rows2), _pad_to(goZ, rows2))
    rows13 = max(fwdp.u_rows, dxp.out_rows, dap.u_rows)
    U13 = (_pad_to(a1.astype(jnp.float32), rows13),
           _pad_to(a3.astype(jnp.float32), rows13))
    V = (_pad_to(av.astype(jnp.float32),
                 max(fwdp.v_rows, dxp.v_rows, dap.out_rows)),)
    da2 = strip_attention_role("dw", U13, V, T2, m, fwdp,
                               interpret, exact)[:x_rows]
    d13 = strip_attention_role("dc", T2, V,
                               U13, m, dxp, interpret, exact)[:x_rows]
    daA = strip_attention_role("dv", U13, T2,
                               V, m, dap, interpret, exact)[:e_rows]
    da1, da3 = d13[:, :D], d13[:, D:]
    import numpy as _np

    from .strip_spspmm import _plan_zeros
    dne = (None if nonempty is None else
           _np.zeros(nonempty.shape, jax.dtypes.float0))
    return (da1.astype(a1.dtype), da3.astype(a3.dtype),
            daA.astype(av.dtype), da2.astype(a2.dtype),
            _plan_zeros(fwdp), _plan_zeros(dxp), _plan_zeros(dap), dne)


fused_attention_strip.defvjp(_att_fwd, _att_bwd)


# ---------------------------------------------------------------------------
# plan building
# ---------------------------------------------------------------------------


def autotune_attention_geoms(acd, x_rows: int, e_rows: int,
                             D: int = 128, exact: bool = True) -> dict:
    """Strip geometries for the attention roles: the spspmm autotuner
    over candidates that fit every role's VMEM (three windows, up to
    3D lanes); Gv > 1 candidates are admitted when the sub-window
    height is a 16 multiple (the 16-aligned multi-base DMAs,
    2026-08-19)."""
    from .strip_spspmm import _STRIP_GEOMS, autotune_strip_geoms

    def fits(g):
        C, R, S, St, Rv = g[:5]
        gv = g[5] if len(g) > 5 else 1
        align = g[6] if len(g) > 6 else 16
        pv = g[7] if len(g) > 7 else 0
        # the attention kernel has no persistent-v data path: a pv plan
        # would be COSTED with the once-per-window DMA discount but
        # EXECUTED with a full per-step window DMA — exclude pv
        # geometries outright
        if pv:
            return False
        # the attention kernel DMAs ALL operands as (rows/16, 16, W)
        # grouped views (wide f32 sources fail Mosaic's dynamic-base
        # tile proof), so plan bases must stay 16-aligned
        return align % 16 == 0 and (Rv // gv) % 16 == 0 and all(
            estimate_att_vmem(role, (C, R, S, St, Rv), D, exact)
            <= 16 * 1024 * 1024 for role in _ROLE_WIDTHS)

    pool = [g for g in _STRIP_GEOMS if fits(g)]
    if not pool:
        pool = [(256, 256, 512, 128, 128, 1)]
    # probe=False: _probe_strip_geom AOT-compiles strip_contract, whose
    # Mosaic footprint differs from strip_attention_role (3 operand
    # planes, wider scratch/output) — a passing probe would be false
    # confidence and each probe a wasted remote compile.  The per-role
    # estimate_att_vmem gate above remains the crash filter here.
    return autotune_strip_geoms(acd, x_rows, e_rows, x_rows, D=D,
                                exact=exact, candidates=pool,
                                probe=False)


def build_attention_strip_plans(
        acd, x_rows: int, e_rows: int, geoms: dict,
        pad_steps_to: Optional[dict] = None,
) -> Tuple[StripPlan, StripPlan, StripPlan]:
    """(fwd/dw, dc, dv) strip plans for fused_attention_strip — exactly
    the spspmm (fwd, dX, dA) triple on the raw (a, c, d) triples with
    out_rows = the tuple-row padding (targets a live in X's row space).
    """
    from .strip_spspmm import build_spspmm_strip_plans

    plans = build_spspmm_strip_plans(acd, x_rows, e_rows, x_rows, geoms,
                                     pad_steps_to=pad_steps_to)
    for p in plans:
        assert p.Gv == 1 or p.v_align % 16 == 0, (
            "Gv>1 attention plans need 16-aligned sub-window bases")
    return plans
