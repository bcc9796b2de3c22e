"""Multi-device scaling-efficiency harness (BASELINE.json metric b).

Measures tuple-edges/s for the DP training step and the tuple-parallel
contraction at increasing device counts and reports scaling efficiency
relative to 1 device.  On real pods run it as-is; in the dev container it
runs on the virtual CPU mesh (numbers demonstrate the harness, not the
hardware):

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py

For multi-host pods, call jax.distributed.initialize() first (see
pygho_tpu/parallel/mesh.py); efficiency is computed the same way.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "")
         + " --xla_force_host_platform_device_count=8").strip())
    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
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
    log(f"devices: {ndev} x {jax.devices()[0].platform}")
    per_dev_graphs = 16

    model = make_sp_model("NGNN", num_layer=3, hiddim=64,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=per_dev_graphs * ndev, seed=5)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    results = {}
    counts = sorted({1, 2, ndev} & set(range(1, ndev + 1)))
    for k in counts:
        devs = jax.devices()[:k]
        mesh = make_mesh((k,), ("dp",), devices=devs)
        m = make_sp_model("NGNN", num_layer=3, hiddim=64, seed=0,
                          mlp={"norm": "bn", "act": "silu"})
        opt = make_optimizer(m, 1e-3)
        graphdef, state = nnx.split((m, opt))
        step = make_dp_train_step(mesh, graphdef)
        buckets = {}
        batch = collate_sharded_sparse(datas[: per_dev_graphs * k], k,
                                       per_dev_graphs, keys,
                                       buckets=buckets)
        acd_rows = int(np.sum(
            np.asarray(batch[f"{keys[0]}___acd"])[:, 0] < (1 << 30)))
        state, loss = step(state, batch)  # compile
        float(loss)
        n_iter = 10
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, loss = step(state, batch)
        float(loss)
        dt = (time.perf_counter() - t0) / n_iter
        rate = acd_rows / dt  # graphs scale with k => rows scale with k
        results[k] = {"step_ms": dt * 1e3, "rows_per_s": rate,
                      "acd_rows": acd_rows}
        log(f"dp={k}: {dt * 1e3:.1f} ms/step, {rate / 1e6:.2f} M rows/s")

    base = results[counts[0]]["rows_per_s"]
    for k in counts:
        results[k]["efficiency"] = results[k]["rows_per_s"] / (base * k /
                                                               counts[0])
    eff = results[counts[-1]]["efficiency"]
    print(json.dumps({
        "metric": f"dp scaling efficiency 1->{counts[-1]} devices",
        "value": eff,
        "unit": "fraction",
        "vs_baseline": eff / 0.8,  # target >= 80%
        "extra": results,
    }))


if __name__ == "__main__":
    main()
