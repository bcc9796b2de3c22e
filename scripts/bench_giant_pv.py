"""Giant-graph persistent-v-window (pv) A/B — VERDICT r3 item 3.

The 556k-acd-row 200x100 community graph ran at 0.143 G rows/s exact
(3.89 ms, geometry (256,512,256,128,512,Gv=16)) — 0.27x of the 3-pass
HBM normalization, bound by per-step window DMA at fill ~0.5 (~8x byte
amplification).  pv mode DMAs each distinct v window ONCE (the whole
community edge block stays VMEM-resident across its steps), removing
the amplification.

Interleaved A/B on the real chip: r3 winner vs the pv candidates (plus
full autotune with pv in the pool).  In-jit loops, plans passed as jit
ARGUMENTS (closure capture would inline MBs of plan constants into HLO).

Usage: python scripts/bench_giant_pv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax

if os.environ.get("ABLATE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

N = int(os.environ.get("GIANT_N", 30))
REPS = int(os.environ.get("GIANT_REPS", 6))
D = int(os.environ.get("GIANT_D", 128))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench_scaling import community_graph, hop1_instance
    from pygho_tpu.backend import indexing
    from pygho_tpu.kernels.strip_spspmm import (build_strip_plan,
                                                normalize_strip_geom,
                                                estimate_strip_cost,
                                                autotune_strip_geoms,
                                                strip_contract)

    scale = os.environ.get("GIANT_SCALE", "200x100")
    com, cs = (int(x) for x in scale.split("x"))
    ei, n = community_graph(communities=com, csize=cs)
    g, tup, acd = hop1_instance(ei, n)
    rows = int(acd.shape[1])
    log(f"graph: n={n} tuples={tup.shape[1]} edges={g.num_edges} "
        f"acd={rows}")

    a, c, d_ = acd[0], acd[1], acd[2]
    x_rows = indexing.bucket_size(tup.shape[1])
    e_rows = indexing.bucket_size(g.num_edges)
    out_rows = x_rows
    rng = np.random.default_rng(0)
    U = jax.device_put(rng.normal(size=(x_rows, D)).astype(np.float32))
    V = jax.device_put(rng.normal(size=(e_rows, D)).astype(np.float32))

    def rup(x, m):
        return max(((x + m - 1) // m) * m, m)

    def mk_plan(geom):
        import dataclasses
        nbuf = None
        if len(geom) == 9:          # optional 9th element: DMA depth
            geom, nbuf = geom[:8], geom[8]
        C, R, S, St, Rv, Gv, al, pv = normalize_strip_geom(geom)
        p = build_strip_plan(np.stack([a, c, d_]), rup(x_rows, R),
                             rup(e_rows, Rv), rup(out_rows, S),
                             C, R, S, St, Rv, base_align=al, Gv=Gv,
                             v_persistent=bool(pv))
        return dataclasses.replace(p, nbuf=nbuf) if nbuf else p

    run = jax.jit(lambda u, v, p: jax.lax.fori_loop(
        0, N, lambda i, acc: acc + strip_contract(
            u, v, p, exact=True)[0, :1], jnp.zeros((1,), jnp.float32)))

    cands = {
        "r3_winner_gv16": (256, 512, 256, 128, 512, 16),
        "pv_2048_s256": (512, 512, 256, 256, 2048, 1, 16, 1),
        "pv_2048_s128": (512, 512, 128, 128, 2048, 1, 16, 1),
        "pv_1536_s256": (512, 512, 256, 256, 1536, 1, 16, 1),
        "pv_1024_s256_r256": (512, 256, 256, 256, 1024, 1, 16, 1),
        "pv_2048_s512": (512, 512, 512, 512, 2048, 1, 16, 1),
        "pv_2048_s512_c384": (384, 512, 512, 512, 2048, 1, 16, 1),
        "pv_2048_s1024": (512, 512, 1024, 1024, 2048, 1, 16, 1),
        # r5 granularity-matched Gv family (host sweep, strip_spspmm
        # _STRIP_GEOMS note): R=256 right-sizes the u window (spans
        # ~140), Gv=32-64 sub-windows match the ~0.3 per-strip v
        # density that capped Gv=16 fill at 0.52
        "r5_gv64_c384": (384, 256, 256, 128, 1024, 64),
        "r5_gv32_s512st256": (256, 256, 512, 256, 512, 32),
        "r5_gv32_c384": (384, 256, 256, 128, 1024, 32),
        "r5_gv32_g4": (256, 256, 512, 128, 512, 32),
        "r5_gv64_st256": (384, 256, 512, 256, 1024, 64),
        # DMA depth 3: the Gv family is near DMA-bound (1.3 MB/step at
        # ~1.6 us/step); one extra lookahead window costs ~1.3 MB VMEM
        "r5_gv64_c384_nb3": (384, 256, 256, 128, 1024, 64, 16, 0, 3),
    }
    plans, est = {}, {}
    for name, geom in cands.items():
        try:
            p = mk_plan(geom)
            # device_put the plan: numpy jit args re-transfer EVERY
            # call, and plan sizes differ 2x across candidates (6-13
            # MB) — host plans would bias the A/B toward small-plan
            # candidates by ~(plan bytes / tunnel BW / N) per
            # contraction (found in the r5 code review; bench.py's
            # strip section already device_puts its plan)
            p = jax.device_put(p)
            plans[name] = p
            est[name] = estimate_strip_cost(p, D, True) * 1e3
            nw = p.n_v_windows if p.v_persistent else p.n_steps
            log(f"{name}: steps={p.n_steps} v_windows={nw} "
                f"launches={len(p.launch_splits) or 1} "
                f"est={est[name]:.2f} ms")
        except Exception as ex:
            log(f"{name}: plan failed {type(ex).__name__}: {ex}")

    if os.environ.get("PLAN_ONLY"):
        print(json.dumps({"acd_rows": rows, "estimates_ms": est}))
        return

    # compile each candidate once (and drop candidates whose Mosaic
    # compile fails), then measure fully INTERLEAVED: one rep per
    # candidate per round, REPS rounds — tunnel variance (±30%) hits
    # every candidate equally (CLAUDE.md measurement discipline)
    samples = {k: [] for k in plans}

    def padded(p):
        Up = (U if U.shape[0] >= p.u_rows else
              jnp.pad(U, ((0, p.u_rows - U.shape[0]), (0, 0))))
        Vp = (V if V.shape[0] >= p.v_rows else
              jnp.pad(V, ((0, p.v_rows - V.shape[0]), (0, 0))))
        return Up, Vp

    for name in list(plans):
        try:
            Up, Vp = padded(plans[name])
            float(jnp.sum(run(Up, Vp, plans[name])))       # compile
        except Exception as ex:
            log(f"{name}: compile/run failed {type(ex).__name__}: "
                f"{str(ex)[:200]}")
            plans[name] = None

    for rnd in range(REPS):
        for name, p in plans.items():
            if p is None:
                continue
            Up, Vp = padded(p)
            t0 = time.perf_counter()
            float(jnp.sum(run(Up, Vp, p)))
            samples[name].append((time.perf_counter() - t0) / N)

    out = {"acd_rows": rows, "d": D, "estimates_ms": est}
    for name, ts in samples.items():
        if not ts:
            continue
        med = float(np.median(ts))
        mn = float(np.min(ts))
        out[name] = {"median_ms": med * 1e3, "min_ms": mn * 1e3,
                     "g_rows_per_s": rows / med / 1e9}
        log(f"{name}: median {med * 1e3:.2f} ms / min {mn * 1e3:.2f} "
            f"-> {rows / med / 1e9:.3f} G rows/s")

    # correctness cross-check on the fastest pv vs the r3 winner
    ref_p = plans.get("r3_winner_gv16")
    pvs = [k for k in plans if k.startswith("pv_") and plans[k] is not None]
    if ref_p is not None and pvs:
        k0 = min(pvs, key=lambda k: out.get(k, {}).get("median_ms", 1e9))
        p = plans[k0]
        o1 = strip_contract(
            jnp.pad(U, ((0, max(0, ref_p.u_rows - U.shape[0])), (0, 0))),
            jnp.pad(V, ((0, max(0, ref_p.v_rows - V.shape[0])), (0, 0))),
            ref_p, exact=True)[:out_rows]
        o2 = strip_contract(
            jnp.pad(U, ((0, max(0, p.u_rows - U.shape[0])), (0, 0))),
            jnp.pad(V, ((0, max(0, p.v_rows - V.shape[0])), (0, 0))),
            p, exact=True)[:out_rows]
        md = float(jnp.max(jnp.abs(o1 - o2)))
        out["pv_vs_r3_maxdiff"] = md
        log(f"correctness {k0} vs r3 winner: maxdiff {md:.2e}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
