"""Multi-device scaling-efficiency harness (BASELINE.json metric b).

Two sections:

(a) **DP scaling** — tuple-edges/s for the data-parallel training step at
    P = 1/2/4/8 devices (graphs per device fixed, so rows scale with P;
    efficiency = rate_P / (P * rate_1)).

(b) **Tuple-parallel strategy sweep** — ONE giant graph's contraction
    sharded over the tuple dimension, the v3/v4/v5/v6 strategies timed
    against each other on three structurally distinct >=500k-acd-row
    graphs, and the `plan_exchange_volumes` cost model + the
    `choose_partitioned_spspmm` chooser checked against the measured
    ordering.  P-scaling of the best strategy per shape is reported as
    tuple-edges/s at P = 1/2/4/8.

On real pods run as-is; in the dev container it runs on the virtual CPU
mesh.  CPU-mesh numbers demonstrate the harness and the *relative*
strategy ordering (collective bytes move through shared memory, not ICI
— absolute rates and crossovers on real hardware differ; the chooser
model counts exchanged rows, which is hardware-agnostic):

  python bench_scaling.py            # virtual CPU x8 (default)
  python bench_scaling.py --pod      # real multi-chip TPU slice

For multi-host pods, call jax.distributed.initialize() first (see
pygho_tpu/parallel/mesh.py); efficiency is computed the same way.
Measured outputs are recorded in BENCHMARKS.md ("Scaling harness").
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- shapes


def community_graph(communities=200, csize=100, intra=5, cross=3, seed=0):
    """Locality-rich: dense blocks + sparse ring of cross edges."""
    rng = np.random.default_rng(seed)
    edges = []
    for ci in range(communities):
        base = ci * csize
        u = rng.integers(0, csize, csize * intra) + base
        v = rng.integers(0, csize, csize * intra) + base
        edges.append(np.stack([u, v]))
        u2 = rng.integers(0, csize, cross) + base
        v2 = rng.integers(0, csize, cross) + ((ci + 1) % communities) * csize
        edges.append(np.stack([u2, v2]))
    ei = np.concatenate(edges, axis=1)
    return np.concatenate([ei, ei[::-1]], axis=1), communities * csize


def ring_lattice_graph(n=8000, k=8):
    """Maximal locality: node i connects to its k nearest neighbours —
    boundary sets between contiguous shards are tiny."""
    src = np.repeat(np.arange(n), k)
    off = np.tile(np.arange(1, k // 2 + 1), n * 2)[: n * k]
    sgn = np.tile(np.repeat([1, -1], k // 2), n)[: n * k]
    dst = (src + sgn * off) % n
    return np.stack([src, dst]), n


def expander_graph(n=1500, deg=96, seed=1):
    """Dense uniform random edges (no base-graph locality; ~1.1M acd
    rows at the defaults).  Note the measured structural fact: even
    here the hop-1 NGNN contraction's boundary volumes stay tiny,
    because target a=(i,j) and operand c=(i,k) share the subgraph
    index i — tuple-sorted shards keep them co-resident.  Exchange-
    bound regimes need contractions whose operand leading index
    differs from the target's."""
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n, n * deg // 2)
    v = rng.integers(0, n, n * deg // 2)
    keep = u != v
    ei = np.stack([u[keep], v[keep]])
    return np.concatenate([ei, ei[::-1]], axis=1), n


def hop1_instance(ei, n):
    """Hop-1 tuples + contraction triples for a single giant graph."""
    from pygho_tpu.backend import indexing
    from pygho_tpu.hodata.graph import Graph

    g = Graph(x=np.zeros((n, 1), np.int64), edge_index=ei,
              edge_attr=None).coalesced()
    ii = np.concatenate([np.arange(n), g.edge_index[0]])
    jj = np.concatenate([np.arange(n), g.edge_index[1]])
    tup, _ = indexing.coalesce(np.stack([ii, jj]))
    tar, bcd = indexing.spspmm_ind(tup, 1, g.edge_index, 0)
    acd = indexing.filterind(tup, tar, bcd)
    return g, tup, acd


# ------------------------------------------------------------ section (a)


def bench_dp(jax, counts, d=64, per_dev_graphs=16):
    import jax.numpy as jnp  # noqa: F401
    from flax import nnx

    from pygho_tpu.hodata import Sppretransform
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import make_optimizer
    from pygho_tpu.parallel import (make_mesh, collate_sharded_sparse,
                                    make_dp_train_step)

    ndev = len(jax.devices())
    model = make_sp_model("NGNN", num_layer=3, hiddim=d,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=per_dev_graphs * ndev, seed=5)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    results = {}
    for k in counts:
        devs = jax.devices()[:k]
        mesh = make_mesh((k,), ("dp",), devices=devs)
        m = make_sp_model("NGNN", num_layer=3, hiddim=d, seed=0,
                          mlp={"norm": "bn", "act": "silu"})
        opt = make_optimizer(m, 1e-3)
        graphdef, state = nnx.split((m, opt))
        step = make_dp_train_step(mesh, graphdef)
        batch = collate_sharded_sparse(datas[: per_dev_graphs * k], k,
                                       per_dev_graphs, keys, buckets={})
        acd_rows = int(np.sum(
            np.asarray(batch[f"{keys[0]}___acd"])[:, 0] < (1 << 30)))
        # TWO warmup calls: the first compiles against the host-side
        # nnx state; its output state is device-resident with a new jit
        # signature, so the second call RETRACES (+~2 s on CPU).  A
        # single warmup left that retrace inside the timed loop and
        # inflated every recorded r3/r4 step by ~200 ms — the r4 DP
        # table largely measured one compile (see BENCHMARKS.md r5
        # correction).  Steady state is reached after call 2; verified
        # via step._cache_size() staying flat across the timed reps.
        state, loss = step(state, batch)
        float(loss)
        state, loss = step(state, batch)
        float(loss)
        cache0 = step._cache_size()
        n_iter, reps = 10, 3
        dt = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                state, loss = step(state, batch)
            float(loss)
            dt = min(dt, (time.perf_counter() - t0) / n_iter)
        if step._cache_size() != cache0:
            log(f"  WARNING dp={k}: retrace inside timed loop "
                f"({cache0} -> {step._cache_size()})")
        rate = acd_rows / dt  # graphs scale with k => rows scale with k
        results[k] = {"step_ms": dt * 1e3, "rows_per_s": rate,
                      "acd_rows": acd_rows}
        log(f"dp={k}: {dt * 1e3:.1f} ms/step, {rate / 1e6:.2f} M rows/s")

    base = results[counts[0]]["rows_per_s"]
    for k in counts:
        results[k]["efficiency"] = results[k]["rows_per_s"] / (
            base * k / counts[0])
    return results


# ------------------------------------------------------------ section (b)


def bench_tuple_parallel(jax, d=64, n_iter=10):
    import jax.numpy as jnp
    from pygho_tpu.backend import indexing
    from pygho_tpu.backend.segment import segment_reduce  # noqa: F401
    from pygho_tpu.parallel import make_mesh, choose_partitioned_spspmm
    from pygho_tpu.parallel.tuple_parallel import (
        plan_exchange_volumes,
        build_overlapped_shard_plan, make_overlapped_spspmm,
        build_scatter_shard_plan, make_scatter_spspmm,
        build_ring_shard_plan, make_ring_spspmm,
        build_reduce_scatter_shard_plan, make_reduce_scatter_spspmm)

    P = len(jax.devices())
    strategies = {
        "overlapped": (build_overlapped_shard_plan, make_overlapped_spspmm),
        "scatter": (build_scatter_shard_plan, make_scatter_spspmm),
        "ring": (build_ring_shard_plan, make_ring_spspmm),
        "reduce_scatter": (build_reduce_scatter_shard_plan,
                           make_reduce_scatter_spspmm),
    }
    shapes = {
        "community": community_graph(),
        "ring_lattice": ring_lattice_graph(),
        "expander": expander_graph(),
    }
    out = {}
    for shape_name, (ei, n) in shapes.items():
        g, tup, acd = hop1_instance(ei, n)
        acd_rows = acd.shape[1]
        nnz_pad = ((indexing.bucket_size(tup.shape[1]) + P - 1) // P) * P
        acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
        rng = np.random.default_rng(0)
        Xv = jnp.asarray(indexing.pad_values(
            rng.normal(size=(tup.shape[1], d)).astype(np.float32), nnz_pad))
        Av = jnp.asarray(
            rng.normal(size=(g.num_edges, d)).astype(np.float32))
        vols = plan_exchange_volumes(acd_p, nnz_pad, P)
        log(f"[{shape_name}] n={n} tuples={tup.shape[1]} "
            f"acd={acd_rows} vols={vols}")
        mesh = make_mesh((P,), ("sp",))
        times = {}
        for sname, (build, make) in strategies.items():
            run = make(mesh, build(acd_p, nnz_pad, P))
            float(jnp.sum(run(Xv, Av)))  # compile
            t0 = time.perf_counter()
            for _ in range(n_iter):
                r = run(Xv, Av)
            float(jnp.sum(r))
            times[sname] = (time.perf_counter() - t0) / n_iter
            log(f"  {sname}: {times[sname] * 1e3:.1f} ms "
                f"({acd_rows / times[sname] / 1e6:.1f} M rows/s)")
        measured = sorted(times, key=times.get)
        # cost-model ordering over the same four (ring moves the same
        # bytes as overlapped but serialized into P steps: rank it by
        # its total moved rows = P * ring_peak, after overlapped)
        model_vol = {"overlapped": vols["overlapped"],
                     "scatter": vols["scatter"],
                     "reduce_scatter": vols["reduce_scatter"],
                     "ring": vols["overlapped"] + 1}
        predicted = sorted(model_vol, key=model_vol.get)
        _, chosen, _ = choose_partitioned_spspmm(mesh, acd_p, nnz_pad)
        # P-scaling of the measured winner
        scaling = {}
        for k in (1, 2, 4, P):
            if k > P:
                continue
            mk = make_mesh((k,), ("sp",), devices=jax.devices()[:k])
            pad_k = ((indexing.bucket_size(tup.shape[1]) + k - 1) // k) * k
            Xk = jnp.asarray(indexing.pad_values(
                np.asarray(Xv)[: tup.shape[1]], pad_k))
            build, make = strategies[measured[0]]
            runk = make(mk, build(acd_p, pad_k, k))
            float(jnp.sum(runk(Xk, Av)))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                r = runk(Xk, Av)
            float(jnp.sum(r))
            dt = (time.perf_counter() - t0) / n_iter
            scaling[k] = acd_rows / dt
            log(f"  P={k} ({measured[0]}): {dt * 1e3:.1f} ms "
                f"({scaling[k] / 1e6:.1f} M rows/s)")
        # v7 strip-plan stacking at giant scale (round 3): shards whose
        # grids exceed the Mosaic single-launch ceiling now stack via
        # common per-block step tables instead of falling back to chunk
        # plans.  CPU interpret execution at this row count would take
        # hours, so this records the structural facts a TPU run needs:
        # no fallback, launch counts, and the host planning cost.
        import warnings as _warnings

        from pygho_tpu.kernels.strip_spspmm import StripPlan
        from pygho_tpu.parallel.tuple_parallel import (
            build_fused_overlapped_shard_plan)

        t0 = time.perf_counter()
        with _warnings.catch_warnings(record=True) as wrec:
            _warnings.simplefilter("always")
            fplan = build_fused_overlapped_shard_plan(
                acd_p, nnz_pad, P, g.num_edges, D=128, kind="strip")
        v7_build_s = time.perf_counter() - t0
        plans6 = list(fplan.loc_plans) + list(fplan.bnd_plans)
        v7_stacked = all(isinstance(p, StripPlan) for p in plans6)
        v7 = {
            "stacked": v7_stacked,
            "fell_back": any("falling back" in str(x.message)
                             for x in wrec),
            "build_s": v7_build_s,
            "launches": [len(p.launch_splits) for p in plans6
                         ] if v7_stacked else [],
            "steps": [int(p.oblk.shape[1]) for p in plans6
                      ] if v7_stacked else [],
        }
        log(f"  v7 strip stacking: stacked={v7['stacked']} "
            f"launches={v7['launches']} build={v7_build_s:.1f}s")
        out[shape_name] = {
            "acd_rows": acd_rows,
            "v7_strip": v7,
            "times_ms": {k: v * 1e3 for k, v in times.items()},
            "measured_order": measured,
            "predicted_order": predicted,
            "order_match": measured == predicted,
            "winner_match": measured[0] == predicted[0],
            "chooser_pick": chosen,
            "chooser_correct": chosen == measured[0],
            "exchange_vols": {k: int(v) for k, v in vols.items()},
            "scaling_rows_per_s": {str(k): v for k, v in scaling.items()},
        }
    return out


def main():
    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "")
         + " --xla_force_host_platform_device_count=8").strip())
    import jax

    # default: the virtual 8-device CPU mesh (the dev container's single
    # tunneled chip cannot demonstrate scaling).  --pod keeps the real
    # TPU backend for genuine multi-chip slices.
    if "--pod" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    ndev = len(jax.devices())
    log(f"devices: {ndev} x {jax.devices()[0].platform}")
    counts = sorted({1, 2, 4, ndev} & set(range(1, ndev + 1)))

    dp = bench_dp(jax, counts)
    tp = bench_tuple_parallel(jax)

    eff = dp[counts[-1]]["efficiency"]
    chooser_ok = all(v["chooser_correct"] for v in tp.values())
    print(json.dumps({
        "metric": f"dp scaling efficiency 1->{counts[-1]} devices",
        "value": eff,
        "unit": "fraction",
        "vs_baseline": eff / 0.8,  # target >= 80%
        "extra": {"dp": dp,
                  "tuple_parallel": tp,
                  "chooser_all_correct": chooser_ok},
    }))


if __name__ == "__main__":
    main()
