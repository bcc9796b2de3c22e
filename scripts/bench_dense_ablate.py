"""Dense-DD (PPGN-path) train-step breakdown — VERDICT r3 item 2.

BENCH_r03 recorded dense_dd_train_step_ms = 17.3 (bf16 15.9) from 10
PYTHON-DISPATCHED ma_train calls.  The sparse path already showed this
container's per-dispatch tunnel latency dominates small steps (16.0 ms
dispatched vs 5.9 ms chained); this harness measures the dense step the
same two ways and then ablates the chained step component-by-component:

  - chained (lax.fori_loop, one dispatch, N=50)  <- the production path
    (zinc_tpu --chained dense) and the honest device-side step time
  - eval (forward-only) chained
  - norm ablation: bn -> none (masked-BN stats cost)
  - einsum ablation: mamamm monkeypatched to pass-through (2FWL bmm
    share, fwd+bwd)
  - channelwise-bmm kernel backward A/B (set_cw_train_kernel)
  - compiled-step cost_analysis (FLOPs, bytes accessed)

Usage (real TPU): python scripts/bench_dense_ablate.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np
import jax

if os.environ.get("ABLATE_CPU"):      # API smoke on the host
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

N = int(os.environ.get("ABLATE_N", 50))
REPS = int(os.environ.get("ABLATE_REPS", 5))
NG = int(os.environ.get("ABLATE_NG", 128))
D = int(os.environ.get("ABLATE_D", 128))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pygho_tpu.hodata import Mapretransform, collate_dense
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.hodata.ma_sampler import spdsampler
    from pygho_tpu.models import make_ma_model
    from pygho_tpu.models.training import (make_dense_steps,
                                           make_optimizer,
                                           make_chained_train,
                                           make_chained_eval,
                                           stack_batches)

    graphs = synthetic_zinc("train", n_graphs=NG)
    madatas = [Mapretransform(partial(spdsampler, hop=3), [""])(g)
               for g in graphs]
    mbatch = collate_dense(madatas, [""], num_graphs=NG)
    mbatch = {k: jax.device_put(np.asarray(v)) for k, v in mbatch.items()}
    log(f"batch: x {mbatch['x'].shape}")

    def rtt():
        x = jnp.zeros((8, 8))
        t0 = time.perf_counter()
        float(jnp.sum(x + 1))
        return time.perf_counter() - t0

    base_rtt = min(rtt() for _ in range(3))
    log(f"tunnel rtt {base_rtt * 1e3:.1f} ms")

    chain_fn, _, _ = make_chained_train(mode="dense")
    chained_eval = make_chained_eval(mode="dense")

    def mk(norm="bn", bf16=False):
        m = make_ma_model("PPGN", num_layer=2, hiddim=D,
                          dtype=(jnp.bfloat16 if bf16 else None),
                          mlp={"norm": norm, "act": "silu"})
        return m, make_optimizer(m, 1e-3)

    def t_chain(model, opt):
        float(chain_fn(model, opt, mbatch, N))         # compile
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(chain_fn(model, opt, mbatch, N))
            ts.append((time.perf_counter() - t0 - base_rtt) / N)
        return float(np.median(ts))

    out = {}

    # 1. dispatched baseline (reproduces the BENCH_r03 methodology)
    model, opt = mk()
    train_step, _ = make_dense_steps()
    float(train_step(model, opt, mbatch))
    t0 = time.perf_counter()
    for _ in range(10):
        l = train_step(model, opt, mbatch)
    float(l)
    out["dispatched_ms"] = (time.perf_counter() - t0 - base_rtt) / 10 * 1e3
    log(f"dispatched: {out['dispatched_ms']:.2f} ms/step")

    # 2. chained production path
    model, opt = mk()
    out["chained_ms"] = t_chain(model, opt) * 1e3
    log(f"chained: {out['chained_ms']:.2f} ms/step")

    # 2b. chained bf16
    model_bf, opt_bf = mk(bf16=True)
    out["chained_bf16_ms"] = t_chain(model_bf, opt_bf) * 1e3
    log(f"chained bf16: {out['chained_bf16_ms']:.2f} ms/step")

    # 3. forward-only (eval) chained: scan over N stacked copies
    model.eval()
    stacked = jax.device_put(stack_batches([mbatch] * N))
    float(np.asarray(chained_eval(model, stacked))[0])
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(np.asarray(chained_eval(model, stacked))[0])
        ts.append((time.perf_counter() - t0 - base_rtt) / N)
    model.train()
    out["eval_chained_ms"] = float(np.median(ts)) * 1e3
    log(f"eval chained: {out['eval_chained_ms']:.2f} ms/step")

    # 4. norm ablation
    m2, o2 = mk(norm="none")
    out["chained_nonorm_ms"] = t_chain(m2, o2) * 1e3
    log(f"chained norm=none: {out['chained_nonorm_ms']:.2f} ms/step")

    # 5. einsum (2FWL bmm) ablation: mamamm -> pass-through
    # (the backend package re-exports the function under the submodule
    # name, so `import ... as mm` would bind the function; go via
    # importlib to get the MODULE)
    import importlib

    mm = importlib.import_module("pygho_tpu.backend.mamamm")
    real_mamamm = mm.mamamm

    def fake_mamamm(tA, dim1, tB, dim2, mask=None,
                    broadcast_firstdim=True):
        return tA          # pass-through MaskedTensor: no 2FWL bmm

    mm.mamamm = fake_mamamm
    try:
        # honn.ma_operator imports mamamm at module import; patch there
        mo = importlib.import_module("pygho_tpu.honn.ma_operator")
        real_mo = getattr(mo, "mamamm", None)
        if real_mo is not None:
            mo.mamamm = fake_mamamm
        m3, o3 = mk()
        out["chained_nobmm_ms"] = t_chain(m3, o3) * 1e3
        log(f"chained no-bmm: {out['chained_nobmm_ms']:.2f} ms/step")
    finally:
        mm.mamamm = real_mamamm
        if real_mo is not None:
            mo.mamamm = real_mo

    # 6. channelwise kernel backward A/B
    try:
        from pygho_tpu.backend.mamamm import set_channelwise_bmm
        from pygho_tpu.kernels.channelwise_bmm import set_cw_train_kernel

        set_channelwise_bmm(True)
        set_cw_train_kernel(True)
        m4, o4 = mk()
        out["chained_cwkernel_ms"] = t_chain(m4, o4) * 1e3
        log(f"chained cw-kernel: {out['chained_cwkernel_ms']:.2f} ms/step")
    except Exception as ex:
        log(f"cw kernel A/B failed: {type(ex).__name__}: {ex}")
    finally:
        try:
            set_cw_train_kernel(False)
            set_channelwise_bmm(False)
        except Exception:
            pass

    # 7. compiled cost analysis of one dispatched step
    try:
        from flax import nnx

        graphdef, state = nnx.split((model, opt))

        @jax.jit
        def one(state, batch):
            mdl, op = nnx.merge(graphdef, state)

            def loss_fn(mdl):
                from pygho_tpu.hodata.ma_data import batch_to_dense_dict
                from pygho_tpu.models.training import masked_l1_loss

                dd = batch_to_dense_dict(batch, ("",))
                return masked_l1_loss(mdl(dd), batch["y"],
                                      batch["graph_mask"])

            lv, grads = nnx.value_and_grad(loss_fn)(mdl)
            op.update(mdl, grads)
            _, st = nnx.split((mdl, op))
            return st, lv

        ca = one.lower(state, mbatch).compile().cost_analysis()
        out["cost_flops"] = float(ca.get("flops", 0.0))
        out["cost_bytes"] = float(ca.get("bytes accessed", 0.0))
        log(f"cost_analysis: {out['cost_flops'] / 1e9:.1f} GFLOP, "
            f"{out['cost_bytes'] / 1e9:.2f} GB accessed")
    except Exception as ex:
        log(f"cost_analysis failed: {type(ex).__name__}: {ex}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
