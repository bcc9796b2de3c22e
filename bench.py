"""Benchmark: sparse tuple message-passing throughput on one chip.

Measures the hot kernel — the spspmm gather-multiply-segment-reduce over
precomputed acd triples — on a ZINC-scale NGNN workload (batch=128
graphs, hop=3 ego-nets, d=128, the example/minimal.py configuration),
plus the full jitted train step.

Timing methodology (required by the axon tunnel, whose
``block_until_ready`` acks before execution completes): the kernel is
iterated inside ONE jitted lax.fori_loop with a data dependency between
iterations, the result is materialized to host, and the measured
host round-trip latency is subtracted.

Prints ONE JSON line:
  value: useful acd rows per second for the SpMM forward pass
  vs_baseline: fraction of the HBM roofline
    (roofline = BW / bytes_per_row, bytes_per_row = 3 * d * 4 f32:
     read A-row + read X-row + write out-row per acd row).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM_BW = {
    "v5e": 819e9, "v5litepod": 819e9, "v4": 1228e9, "v5p": 2765e9,
    "v6e": 1640e9,
}


def main():
    import jax
    # NOTE: do NOT enable jax_compilation_cache_dir here — it deadlocks
    # against the axon remote-compile tunnel in this container.
    import jax.numpy as jnp

    from functools import partial

    from pygho_tpu.hodata import Sppretransform, collate_sparse
    from pygho_tpu.hodata.sp_data import batch_to_sparse_dict
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import make_sparse_steps, make_optimizer
    from pygho_tpu.backend.spspmm import spspmm

    dev = jax.devices()[0]
    log("device:", dev, "platform:", dev.platform)
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    bw = HBM_BW.get(gen, 819e9)

    D = 128
    model = make_sp_model("NGNN", num_layer=6, hiddim=D,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=128, seed=5)
    pre = Sppretransform(partial(KhopSampler, hop=3), [""], keys)
    t0 = time.time()
    datas = [pre(g) for g in graphs]
    log(f"preprocess: {time.time() - t0:.1f}s")
    batch = collate_sparse(datas, keys, num_graphs=128)
    key = keys[0]
    acd = batch[f"{key}___acd"]
    acd_rows = int(np.sum(acd[0] < (1 << 30)))
    nnz = int(batch["num_tuples"])
    nnz_pad = batch["tupleid"].shape[1]
    log(f"batch: {nnz} tuples ({nnz_pad} padded), "
        f"{acd_rows} acd rows ({acd.shape[1]} padded)")

    batch = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}

    def rtt():
        t0 = time.perf_counter()
        float(jnp.sum(batch["tuplefeat"]))
        return time.perf_counter() - t0

    # ---- raw SpMM kernel (forward), iterated in-jit ---------------------
    N_ITER = 100

    @jax.jit
    def spmm_loop(batch, vals):
        dd = batch_to_sparse_dict(batch)
        A = dd["A"].tuplewiseapply(
            lambda v: jnp.ones(v.shape + (D,), jnp.float32))
        X0 = dd["X"]

        def body(i, vals):
            X = X0.tuplewiseapply(lambda _: vals)
            out = spspmm(X, 1, A, 0, "sum", acd=batch[f"{key}___acd"],
                         tarX=X)
            return out.values

        return jax.lax.fori_loop(0, N_ITER, body, vals)

    vals = jax.device_put(
        np.random.default_rng(0).normal(
            size=(nnz_pad, D)).astype(np.float32))
    float(jnp.sum(spmm_loop(batch, vals)))  # compile + warm
    base_rtt = min(rtt(), rtt())
    t0 = time.perf_counter()
    float(jnp.sum(spmm_loop(batch, vals)))
    dt = (time.perf_counter() - t0 - base_rtt) / N_ITER
    rows_per_s = acd_rows / dt
    bytes_per_row = 3 * D * 4
    roofline_rows = bw / bytes_per_row
    log(f"spmm fwd: {dt * 1e3:.3f} ms/iter -> {rows_per_s / 1e9:.3f} "
        f"G rows/s (roofline {roofline_rows / 1e9:.3f}; rtt "
        f"{base_rtt * 1e3:.0f} ms)")

    # ---- fused Pallas kernels: v1 (chunk) and v2 (strip), exact f32 +
    # fast bf16, geometry from the calibrated autotuners (the loader's
    # plan_geometry="autotune" paths) --------------------------------------
    from pygho_tpu.kernels import (build_spspmm_plans_for,
                                   autotune_spspmm_geoms,
                                   build_spspmm_strip_plans,
                                   autotune_strip_geoms)
    from pygho_tpu.kernels.fused_spspmm import fused_contract, _pad_rows
    from pygho_tpu.kernels.strip_spspmm import strip_contract

    e_rows = batch["edge_index"].shape[1]
    fused = {}

    def bench_contract(contract, fwd_plan, exact, tag, reps=3):
        u_rows = fwd_plan.u_rows
        Xp0 = _pad_rows(vals, u_rows)
        Ap0 = _pad_rows(jnp.ones((e_rows, D), jnp.float32),
                        fwd_plan.v_rows)
        # the plan is a jit ARGUMENT: closure capture would inline its
        # index arrays as HLO constants (large literals burden the
        # remote compiler; the training path ships plans in the batch)
        # (A/B'd 2026-08-19 at N=1000: arg vs constant time identically)
        plan_dev = jax.device_put(fwd_plan)
        # sub-ms kernels need the loop to dominate the ~31 ms tunnel
        # RTT being subtracted, or readings scatter 2-3x (measured):
        # 500 iterations puts 0.1-0.3 s of device time per rep
        N_K = 5 * N_ITER

        @jax.jit
        def floop(Xp, Ap, plan):
            def body(i, Xc):
                o = contract(Xc, Ap, plan, interpret=False,
                             exact=exact)
                return jnp.concatenate(
                    [o[:nnz_pad],
                     jnp.zeros((u_rows - nnz_pad, D),
                               jnp.float32)]) \
                    if u_rows != nnz_pad else o[:nnz_pad]
            return jax.lax.fori_loop(0, N_K, body, Xp)

        float(jnp.sum(floop(Xp0, Ap0, plan_dev)))
        r = min(rtt(), rtt())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(floop(Xp0, Ap0, plan_dev)))
            ts.append((time.perf_counter() - t0 - r) / N_K)
        dtf = sorted(ts)[len(ts) // 2]
        log(f"{tag}: {dtf * 1e3:.3f} ms -> "
            f"{acd_rows / dtf / 1e9:.3f} G rows/s")
        return dtf

    for exact in (True, False):
        mode = "exact" if exact else "fast"
        geoms = autotune_spspmm_geoms(np.asarray(acd), nnz_pad, e_rows,
                                      nnz_pad, D=D, exact=exact)
        v1_fwd = build_spspmm_plans_for(
            np.asarray(acd), nnz_pad, e_rows, nnz_pad, geoms)[0]
        log(f"v1 geometry ({mode}): {geoms['fwd']}")
        fused[mode] = bench_contract(fused_contract, v1_fwd, exact,
                                     f"fused v1 chunk ({mode})")
        sgeoms = autotune_strip_geoms(np.asarray(acd), nnz_pad, e_rows,
                                      nnz_pad, D=D, exact=exact)
        s_fwd = build_spspmm_strip_plans(
            np.asarray(acd), nnz_pad, e_rows, nnz_pad, sgeoms)[0]
        log(f"v2 strip geometry ({mode}): {sgeoms['fwd']} "
            f"steps={s_fwd.n_steps}")
        fused[f"strip_{mode}"] = bench_contract(
            strip_contract, s_fwd, exact, f"fused v2 strip ({mode})")

    # ---- SDDMM (spsphadamard): gather-multiply on matched patterns ------
    from pygho_tpu.backend.indexing import spsphadamard_ind
    from pygho_tpu.backend.spspmm import spsphadamard
    from pygho_tpu.backend.sptensor import SparseTensor

    tid = np.asarray(batch["tupleid"])[:, :nnz]   # real columns only
    b2a_host = spsphadamard_ind(tid, tid).astype(np.int32)
    b2a = jnp.asarray(np.concatenate(
        [b2a_host, np.full(nnz_pad - nnz, -1, np.int32)]))

    # the op is fast enough that RTT noise swamps N_ITER iterations
    # (~40 us/iter vs ~31 ms tunnel RTT): run 40x more so the loop body
    # dominates the subtraction, and take the median of 3
    N_SDDMM = 40 * N_ITER

    @jax.jit
    def sddmm_loop(vals):
        Xs = SparseTensor(jnp.asarray(batch["tupleid"]), vals,
                          jnp.asarray(batch["num_tuples"], jnp.int32),
                          (batch["x"].shape[0],) * 2)

        def body(i, v):
            A2 = SparseTensor(Xs.indices, v, Xs.nnz, Xs.sparse_shape)
            return spsphadamard(A2, Xs, b2a).values

        return jax.lax.fori_loop(0, N_SDDMM, body, vals)

    float(jnp.sum(sddmm_loop(vals)))
    r = min(rtt(), rtt())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(sddmm_loop(vals)))
        ts.append((time.perf_counter() - t0 - r) / N_SDDMM)
    dt_sddmm = max(sorted(ts)[1], 1e-6)
    # roofline for the hadamard: 3 HBM passes over nnz rows
    sddmm_rows = int(batch["num_tuples"]) / dt_sddmm
    sddmm_roof = bw / (3 * D * 4)
    log(f"sddmm (spsphadamard): {dt_sddmm * 1e3:.3f} ms -> "
        f"{sddmm_rows / 1e9:.3f} G rows/s "
        f"({sddmm_rows / sddmm_roof:.2f} of its 3-pass roofline)")

    # ---- single-launch fused attention (NGAT chain) ----------------------
    # guarded: a failure here must not take down the whole bench
    att = {}
    try:
        from pygho_tpu.kernels.strip_attention import (
            autotune_attention_geoms, build_attention_strip_plans,
            fused_attention_strip)

        x_rows_a = int(batch["tupleid"].shape[1])
        e_rows_a = int(batch["edge_index"].shape[1])
        ageoms = autotune_attention_geoms(np.asarray(acd), x_rows_a,
                                          e_rows_a, D=D)
        aplans = build_attention_strip_plans(np.asarray(acd), x_rows_a,
                                             e_rows_a, ageoms)
        a_ops = tuple(jax.device_put(np.random.default_rng(i).normal(
            size=(n, D)).astype(np.float32) * 0.3)
            for i, n in enumerate((x_rows_a, x_rows_a, e_rows_a, x_rows_a)))

        from pygho_tpu.kernels.strip_attention import (_pad_to,
                                                       _shift_bound,
                                                       strip_attention_role)

        N_ATT = 2 * N_ITER

        @partial(jax.jit, static_argnums=(2,))
        def att_loop(ops, plan, exact):
            # time the fwd ROLE itself (gathers + exp + num/den
            # scatter); a scalar write-back chains iterations at ~zero
            # cost.  Operands are per-operand refs now (round 3): the
            # wrapper no longer pays packed-lane concats per call
            a1, a3, av, a2 = ops
            m = _shift_bound(a1, av)
            a1p = _pad_to(a1, plan.u_rows)
            a3p = _pad_to(a3, plan.u_rows)
            V = (_pad_to(av, plan.v_rows),)
            T = (_pad_to(a2, plan.out_rows),)

            def body(i, a1c):
                nd = strip_attention_role("fwd", (a1c, a3p), V, T, m,
                                          plan, False, exact)
                return a1c.at[0, 0].set(nd[0, 0])

            return jax.lax.fori_loop(0, N_ATT, body, a1p)

        for mode, exact in (("exact", True), ("fast", False)):
            float(jnp.sum(att_loop(a_ops, aplans[0], exact)))
            r = min(rtt(), rtt())
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(att_loop(a_ops, aplans[0], exact)))
                ts.append((time.perf_counter() - t0 - r) / N_ATT)
            dt_att = max(sorted(ts)[1], 1e-6)
            att[f"attention_{mode}_ms"] = dt_att * 1e3
            att[f"attention_{mode}_rows_per_s"] = acd_rows / dt_att
            log(f"fused attention fwd role ({mode}): "
                f"{dt_att * 1e3:.3f} ms -> {acd_rows / dt_att / 1e9:.3f}"
                f" G rows/s")
    except Exception as ex:  # pragma: no cover
        log(f"fused attention bench skipped: {type(ex).__name__}: {ex}")

    # ---- dense DD path: the MXU einsum route on the same workload -------
    from pygho_tpu.hodata import Mapretransform, collate_dense
    from pygho_tpu.hodata.ma_data import batch_to_dense_dict
    from pygho_tpu.hodata.ma_sampler import spdsampler
    from pygho_tpu.backend.mamamm import mamamm

    madatas = [Mapretransform(partial(spdsampler, hop=3), [""])(g)
               for g in graphs]
    mbatch = collate_dense(madatas, [""], num_graphs=128)
    mbatch = {k: jax.device_put(np.asarray(v)) for k, v in mbatch.items()}
    Bsz, n_pad = mbatch["x"].shape[0], mbatch["x"].shape[1]

    @jax.jit
    def dd_loop(mbatch, vals):
        dd = batch_to_dense_dict(mbatch)
        Xm = dd["X"]
        from pygho_tpu.backend.matensor import MaskedTensor
        A = MaskedTensor(jnp.ones(Xm.mask.shape + (D,), jnp.float32),
                         dd["A"].mask)

        def body(i, v):
            X = MaskedTensor(v, Xm.mask)
            return mamamm(X, 2, A, 1, Xm.mask).data

        return jax.lax.fori_loop(0, N_ITER, body, vals)

    mvals = jax.device_put(np.random.default_rng(0).normal(
        size=(Bsz, n_pad, n_pad, D)).astype(np.float32))
    float(jnp.sum(dd_loop(mbatch, mvals)))
    base_rtt2 = min(rtt(), rtt())
    t0 = time.perf_counter()
    float(jnp.sum(dd_loop(mbatch, mvals)))
    dt_dd = (time.perf_counter() - t0 - base_rtt2) / N_ITER
    # equivalent useful tuple-edges: the same acd_rows of the sparse batch
    dd_rows_per_s = acd_rows / dt_dd
    log(f"dense DD (einsum b,n,n,d): {dt_dd * 1e3:.3f} ms/iter -> "
        f"{dd_rows_per_s / 1e9:.3f} G equiv rows/s "
        f"(padded dense FLOPs {2 * Bsz * n_pad**3 * D / 1e9:.1f} GFLOP)")

    # ---- dense DD train step (PPGN family hot path) ----------------------
    from pygho_tpu.models import make_ma_model
    from pygho_tpu.models.training import make_dense_steps

    ma_model = make_ma_model("PPGN", num_layer=2, hiddim=D,
                             mlp={"norm": "bn", "act": "silu"})
    ma_opt = make_optimizer(ma_model, 1e-3)
    ma_train, _ = make_dense_steps()
    float(ma_train(ma_model, ma_opt, mbatch))   # compile
    t0 = time.perf_counter()
    for _ in range(10):
        lma = ma_train(ma_model, ma_opt, mbatch)
    float(lma)
    dd_step_dt = (time.perf_counter() - t0 - base_rtt2) / 10
    log(f"dense DD train step (PPGN x2): {dd_step_dt * 1e3:.1f} ms")

    # bf16 dense-DD training: (b,n,n,d) einsums at the MXU bf16 rate,
    # f32 params/BN — the dense analog of the sparse --bf16 path
    ma_model_bf = make_ma_model("PPGN", num_layer=2, hiddim=D,
                                dtype=jnp.bfloat16,
                                mlp={"norm": "bn", "act": "silu"})
    ma_opt_bf = make_optimizer(ma_model_bf, 1e-3)
    float(ma_train(ma_model_bf, ma_opt_bf, mbatch))   # compile
    t0 = time.perf_counter()
    for _ in range(10):
        lmb = ma_train(ma_model_bf, ma_opt_bf, mbatch)
    float(lmb)
    dd_step_bf_dt = (time.perf_counter() - t0 - base_rtt2) / 10
    log(f"dense DD train step (PPGN x2, bf16): {dd_step_bf_dt * 1e3:.1f} ms")

    # chained dense step (the production zinc_tpu --chained dense path):
    # one dispatch per N steps — the honest device-side step time (the
    # 10-dispatch loop above carries per-dispatch tunnel latency, the
    # same artifact the sparse path showed: 16.0 dispatched vs 5.9
    # chained).  Full component breakdown: scripts/bench_dense_ablate.py
    from pygho_tpu.models.training import make_chained_train

    dd_chain, _, _ = make_chained_train(mode="dense")
    ma_model2 = make_ma_model("PPGN", num_layer=2, hiddim=D,
                              mlp={"norm": "bn", "act": "silu"})
    ma_opt2 = make_optimizer(ma_model2, 1e-3)
    N_DD = 30
    float(dd_chain(ma_model2, ma_opt2, mbatch, N_DD))   # compile
    ts_ddc = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(dd_chain(ma_model2, ma_opt2, mbatch, N_DD))
        ts_ddc.append((time.perf_counter() - t0 - base_rtt2) / N_DD)
    dd_step_chained_dt = float(np.median(ts_ddc))
    log(f"dense DD train step chained (PPGN x2): "
        f"{dd_step_chained_dt * 1e3:.1f} ms")

    # ---- full train step (python-dispatched; state chains the steps) ----
    opt = make_optimizer(model, 1e-3)
    train_step, _ = make_sparse_steps()
    loss = float(train_step(model, opt, batch))  # compile
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        l = train_step(model, opt, batch)
    final = float(l)  # waits for the whole dependent chain
    step_dt = (time.perf_counter() - t0 - base_rtt) / n_steps

    # ---- train step through the fused kernel (bf16 fast math) -----------
    from pygho_tpu.hodata import SpDataloader
    from pygho_tpu.kernels.fused_spspmm import set_fused_math

    set_fused_math(False)
    dlf = SpDataloader(datas, 128, keys, device_put=True, prefetch=0,
                       build_plans=True, plan_geometry="autotune",
                       plan_dim=D)
    fbatch = next(iter(dlf))
    mf = make_sp_model("NGNN", num_layer=6, hiddim=D, seed=0,
                       mlp={"norm": "bn", "act": "silu"})
    optf = make_optimizer(mf, 1e-3)
    lf = float(train_step(mf, optf, fbatch))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        l = train_step(mf, optf, fbatch)
    finalf = float(l)
    fstep_dt = (time.perf_counter() - t0 - base_rtt) / n_steps
    set_fused_math(True)
    log(f"train step (fused bf16): {fstep_dt * 1e3:.1f} ms "
        f"(vs {step_dt * 1e3:.1f} XLA), loss {lf:.4f} -> {finalf:.4f}")

    # ---- chained train steps (fori_loop in one jit program): removes
    # per-step host dispatch, which over the remote tunnel dominates the
    # python-loop numbers above ------------------------------------------
    from pygho_tpu.models.training import make_chained_sparse_train

    chain_fn, _, _ = make_chained_sparse_train()
    cstep = {}
    for tag, cbatch in (("xla", batch), ("fused", fbatch)):
        if tag == "fused":
            set_fused_math(False)
        mc = make_sp_model("NGNN", num_layer=6, hiddim=D, seed=0,
                           mlp={"norm": "bn", "act": "silu"})
        oc = make_optimizer(mc, 1e-3)
        float(chain_fn(mc, oc, cbatch, n_steps))  # compile + warm
        r = min(rtt(), rtt())
        t0 = time.perf_counter()
        lc = float(chain_fn(mc, oc, cbatch, n_steps))
        cstep[tag] = (time.perf_counter() - t0 - r) / n_steps
        set_fused_math(True)
        log(f"train step chained ({tag}): {cstep[tag] * 1e3:.2f} ms/step "
            f"(loss {lc:.4f})")

    # chained fused with a bf16 model: bf16 values feed the kernel's
    # grouped-DMA path directly (no f32 upcast at the boundary)
    set_fused_math(False)
    mb = make_sp_model("NGNN", num_layer=6, hiddim=D, seed=0,
                       mlp={"norm": "bn", "act": "silu"},
                       dtype=jnp.bfloat16)
    ob = make_optimizer(mb, 1e-3)
    float(chain_fn(mb, ob, fbatch, n_steps))  # compile + warm
    r = min(rtt(), rtt())
    t0 = time.perf_counter()
    lb = float(chain_fn(mb, ob, fbatch, n_steps))
    cstep["fused_bf16"] = (time.perf_counter() - t0 - r) / n_steps
    set_fused_math(True)
    log(f"train step chained (fused, bf16 model): "
        f"{cstep['fused_bf16'] * 1e3:.2f} ms/step (loss {lb:.4f})")
    # 6 layers x (fwd + dX + dA) gather-scatter passes over acd
    step_rows = 6 * 3 * acd_rows / step_dt
    log(f"train step: {step_dt * 1e3:.1f} ms "
        f"({step_rows / 1e9:.3f} G acd-rows/s incl. backward), "
        f"loss {loss:.4f} -> {final:.4f}")

    # converged-protocol result (BASELINE metric c): recorded by the
    # reference-scale run (example/zinc_tpu.py, reference NGNN tuned
    # config, 500 epochs, best-val test selection — see BENCHMARKS.md
    # "Converged protocol"); carried here from the runs/ artifact so the
    # bench record always includes the latest converged MAE
    converged = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "runs", "converged_zinc.json")) as f:
            converged = {"converged_recorded": json.load(f)}
    except Exception:
        pass
    # full converged benchmark matrix (r4): one artifact per conv/mode,
    # reference-tuned HPs (scripts/converged_matrix.sh) — summarized as
    # conv_mode -> (best val MAE, test MAE at best val, s/epoch)
    try:
        import glob as _glob

        mat = {}
        pat = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "runs", "converged", "*.json")
        for p in sorted(_glob.glob(pat)):
            with open(p) as f:
                r = json.load(f)
            name = os.path.basename(p)[:-5]
            mat[name] = {
                "val": r.get("best_val_mae"),
                "tst": r.get("tst_mae_at_best_val"),
                "s_per_epoch": r.get("sec_per_epoch_median"),
                "seed": r.get("seed"),
            }
        if mat:
            converged["converged_matrix"] = mat
    except Exception:
        pass

    # headline: the EXACT-f32 kernel (the apples-to-apples match for
    # the reference's f32 elementwise hot loop, Spspmm.py:307-321);
    # bf16 fast-math and the XLA path are recorded in extra.
    best = max(rows_per_s, acd_rows / fused["exact"],
               acd_rows / fused["strip_exact"])
    print(json.dumps({
        "metric": "tuple-edges/s/chip (SpMM fwd, exact f32 math, "
                  "ZINC NGNN d=128)",
        "value": best,
        "unit": "rows/s",
        "vs_baseline": best / roofline_rows,
        "extra": {
            "xla_spmm_ms": dt * 1e3,
            "fused_exact_rows_per_s": acd_rows / fused["exact"],
            "fused_exact_ms": fused["exact"] * 1e3,
            "fused_fast_bf16_ms": fused["fast"] * 1e3,
            "fused_fast_rows_per_s": acd_rows / fused["fast"],
            "strip_exact_ms": fused["strip_exact"] * 1e3,
            "strip_exact_rows_per_s": acd_rows / fused["strip_exact"],
            "strip_fast_ms": fused["strip_fast"] * 1e3,
            "strip_fast_rows_per_s": acd_rows / fused["strip_fast"],
            "sddmm_ms": dt_sddmm * 1e3,
            "sddmm_rows_per_s": sddmm_rows,
            "sddmm_vs_own_roofline": sddmm_rows / sddmm_roof,
            "dense_dd_ms": dt_dd * 1e3,
            "dense_dd_equiv_rows_per_s": dd_rows_per_s,
            "dense_dd_train_step_ms": dd_step_dt * 1e3,
            "dense_dd_train_step_bf16_ms": dd_step_bf_dt * 1e3,
            "dense_dd_train_step_chained_ms": dd_step_chained_dt * 1e3,
            "train_step_ms": step_dt * 1e3,
            "train_step_fused_bf16_ms": fstep_dt * 1e3,
            "train_step_chained_ms": cstep["xla"] * 1e3,
            "train_step_chained_fused_ms": cstep["fused"] * 1e3,
            "train_step_chained_fused_bf16_ms": cstep["fused_bf16"] * 1e3,
            "train_rows_per_s": step_rows,
            "acd_rows": acd_rows,
            "platform": str(dev),
            **att,
            **converged,
        },
    }))


def _fallback(err):
    """Emit a valid JSON line even when the TPU tunnel is down so the
    driver always records something parsable."""
    print(json.dumps({
        "metric": "tuple-edges/s/chip (SpMM fwd, exact f32 math, "
                  "ZINC NGNN d=128)",
        "value": 0.0,
        "unit": "rows/s",
        "vs_baseline": 0.0,
        "error": str(err)[:300],
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # tunnel outages must not kill the bench record
        import traceback

        traceback.print_exc(file=sys.stderr)
        _fallback(e)
