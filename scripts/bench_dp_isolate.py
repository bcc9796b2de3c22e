"""Isolate the DP-efficiency loss: collective cost vs host contention.

VERDICT r4 item 6: metric-b's in-container DP efficiency (0.69 @ P=8 on
the 8-virtual-device CPU mesh, runs/scaling_r4.json) was attributed to
host oversubscription by assertion.  This script *measures* the split,
with the same per-device workload as bench_scaling.bench_dp (NGNN
3-layer d=64, 16 graphs/device — weak scaling):

  t_full(P)    — the production DP step (pmean grads + BN stats + loss;
                 pygho_tpu/parallel/data_parallel.py:make_dp_train_step)
  t_nosync(P)  — an otherwise IDENTICAL shard_map step with every pmean
                 removed: zero communication, embarrassingly parallel.

Decomposition (per-device work fixed as P grows):
  contention(P) = t_nosync(P) / t_nosync(1)   -- pure host/core effect,
                                                 no collectives involved
  collective_ms(P) = t_full(P) - t_nosync(P)  -- cost of the pmeans

Run pinned to restrict the process to exactly P cores (1:1 core:device)
for the pinning A/B:    taskset -c 0,1 python scripts/bench_dp_isolate.py --counts 1,2

Emits one JSON object on stdout; recorded in BENCHMARKS.md (metric b).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from flax import nnx
    from jax.sharding import PartitionSpec as P

    from pygho_tpu.hodata import Sppretransform
    from pygho_tpu.hodata.sp_data import batch_to_sparse_dict
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import make_optimizer, masked_l1_loss
    from pygho_tpu.parallel import (make_mesh, collate_sharded_sparse,
                                    make_dp_train_step)
    from pygho_tpu.parallel.data_parallel import _take_shard, _pmean_stats

    counts = [1, 2, 4, 8]
    for i, a in enumerate(sys.argv):
        if a == "--counts":
            counts = [int(c) for c in sys.argv[i + 1].split(",")]
    ndev = len(jax.devices())
    counts = [c for c in counts if c <= ndev]
    affinity = sorted(os.sched_getaffinity(0))
    log(f"devices: {ndev} x {jax.devices()[0].platform}; "
        f"cpu affinity: {affinity} ({len(affinity)} cores)")

    d, per_dev_graphs, n_iter, reps = 64, 16, 10, 3
    model = make_sp_model("NGNN", num_layer=3, hiddim=d,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=per_dev_graphs * max(counts),
                            seed=5)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    def make_nosync_step(mesh, graphdef, axis="dp"):
        # identical to make_dp_train_step's device body with every
        # jax.lax.pmean removed: replicas run fully independently, so
        # any slowdown vs P=1 is host contention, not communication.
        # (State replicas diverge — fine for a timing probe; out_specs
        # stay unchecked under check_vma=False.)
        def device_body(state, batch):
            batch = jax.tree.map(_take_shard, batch)
            model, optimizer = nnx.merge(graphdef, state)

            def loss_fn(model):
                dd = batch_to_sparse_dict(batch, ("",))
                pred = model(dd)
                return masked_l1_loss(pred, batch["y"], batch["graph_mask"])

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            optimizer.update(model, grads)
            _, new_state = nnx.split((model, optimizer))
            return new_state, loss[None]

        def step(state, batch):
            body = jax.shard_map(
                device_body, mesh=mesh,
                in_specs=(P(), jax.tree.map(lambda _: P(axis), batch)),
                out_specs=(P(), P(axis)),
                check_vma=False,
                axis_names=frozenset({axis}),
            )
            return body(state, batch)

        return jax.jit(step)

    def time_step(step, state, batch):
        state2, loss = step(state, batch)  # compile + warm
        np.asarray(loss)
        best = np.inf
        for _ in range(reps):
            s = state
            t0 = time.perf_counter()
            for _ in range(n_iter):
                s, loss = step(s, batch)
            np.asarray(loss)
            best = min(best, (time.perf_counter() - t0) / n_iter)
        return best * 1e3

    results = {}
    for k in counts:
        mesh = make_mesh((k,), ("dp",), devices=jax.devices()[:k])
        m = make_sp_model("NGNN", num_layer=3, hiddim=d, seed=0,
                          mlp={"norm": "bn", "act": "silu"})
        opt = make_optimizer(m, 1e-3)
        graphdef, state = nnx.split((m, opt))
        batch = collate_sharded_sparse(datas[: per_dev_graphs * k], k,
                                       per_dev_graphs, keys, buckets={})
        full_ms = time_step(make_dp_train_step(mesh, graphdef), state, batch)
        nosync_ms = time_step(make_nosync_step(mesh, graphdef), state, batch)
        results[k] = {"full_ms": round(full_ms, 2),
                      "nosync_ms": round(nosync_ms, 2),
                      "collective_ms": round(full_ms - nosync_ms, 2)}
        log(f"P={k}: full {full_ms:.1f} ms, nosync {nosync_ms:.1f} ms, "
            f"collective {full_ms - nosync_ms:.1f} ms")

    base_ns = results[counts[0]]["nosync_ms"]
    base_f = results[counts[0]]["full_ms"]
    for k in counts:
        r = results[k]
        r["contention_factor"] = round(r["nosync_ms"] / base_ns, 3)
        r["efficiency_full"] = round(base_f / r["full_ms"], 3)
        r["efficiency_nosync"] = round(base_ns / r["nosync_ms"], 3)
    print(json.dumps({"cores": len(affinity), "affinity": affinity,
                      "per_dev_graphs": per_dev_graphs, "hiddim": d,
                      "n_iter": n_iter, "reps": reps,
                      "dp_isolate": results}))


if __name__ == "__main__":
    main()
