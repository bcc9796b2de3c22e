"""NGAT epoch accounting by measurement (VERDICT r3 item 6).

Round 3 left a ~0.9 ms/layer attributed-by-subtraction residual between
the role-level timings (~1.15 ms/layer) and the chained epoch
(~1.7 ms/layer).  This harness measures the pieces directly, all inside
the production chained scan (N epochs of the stacked workload per
dispatch, interleaved reps):

  - NGNN baseline epoch (same data/shape discipline)
  - NGAT full epoch (nonempty precomputed by the loader — new in r4)
  - NGAT with the in-layer nonempty segment-reduce (the r3 path):
    quantifies the hoist win
  - NGAT eval epoch (fwd role only): isolates the 3 backward roles
  - NGAT with attention Linears skipped (identity): the 4 per-layer
    d x d matmuls + their fusion boundaries
  - cost_analysis bytes/FLOPs of one NGAT vs NGNN train step

Run on the real TPU: python scripts/bench_ngat_ablate.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np
import jax

if os.environ.get("ABLATE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from flax import nnx

EPOCHS = int(os.environ.get("ABLATE_EPOCHS", 30))
REPS = int(os.environ.get("ABLATE_REPS", 5))
NG = int(os.environ.get("ABLATE_NG", 1024))
D = int(os.environ.get("ABLATE_D", 128))
NL = int(os.environ.get("ABLATE_NL", 6))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pygho_tpu.hodata import Sppretransform, SpDataloader
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import (make_optimizer,
                                           make_chained_train,
                                           make_chained_eval,
                                           group_stack_batches)
    from pygho_tpu.kernels.fused_spspmm import set_fused_math

    set_fused_math(False)
    graphs = synthetic_zinc("train", n_graphs=NG)

    def rtt():
        x = jnp.zeros((8, 8))
        t0 = time.perf_counter()
        float(jnp.sum(x + 1))
        return time.perf_counter() - t0

    base_rtt = min(rtt() for _ in range(3))
    log(f"tunnel rtt {base_rtt * 1e3:.1f} ms")

    _, _, perm_scan_fn = make_chained_train(mode="sparse")
    chained_eval = make_chained_eval(mode="sparse")

    def stacked_for(conv, strip_nonempty=False):
        model = make_sp_model(conv, num_layer=NL, hiddim=D,
                              mlp={"norm": "bn", "act": "silu"})
        keys = parse_precomputekey(model)
        pre = Sppretransform(partial(KhopSampler, hop=3), [""], keys)
        datas = [pre(g) for g in graphs]
        dl = SpDataloader(datas, 128, keys, build_plans=True,
                          plan_dim=D, attention_plans=(conv == "NGAT"),
                          device_put=False)
        batches = list(dl)
        if strip_nonempty:
            batches = [{k: v for k, v in b.items()
                        if not k.endswith("___nonempty")}
                       for b in batches]
        stacked = jax.device_put(group_stack_batches(batches)[0])
        return model, make_optimizer(model, 1e-3), stacked

    def t_epoch(model, opt, stacked, train=True):
        n_steps = jax.tree.leaves(stacked)[0].shape[0]
        perm = jnp.arange(n_steps, dtype=jnp.int32)
        if train:
            run = lambda: float(np.asarray(
                perm_scan_fn(model, opt, stacked, perm))[-1])
        else:
            model.eval()
            run = lambda: float(np.asarray(chained_eval(model,
                                                        stacked))[0])
        run()                                   # compile
        ts = []
        for _ in range(REPS * EPOCHS):
            pass
        for _ in range(REPS):
            t0 = time.perf_counter()
            for _ in range(EPOCHS):
                run()
            ts.append((time.perf_counter() - t0
                       - EPOCHS * base_rtt) / EPOCHS / n_steps)
        model.train()
        return float(np.median(ts))

    out = {}
    m_ngnn, o_ngnn, s_ngnn = stacked_for("NGNN")
    out["ngnn_step_ms"] = t_epoch(m_ngnn, o_ngnn, s_ngnn) * 1e3
    log(f"NGNN chained step: {out['ngnn_step_ms']:.2f} ms")

    m_a, o_a, s_a = stacked_for("NGAT")
    out["ngat_step_ms"] = t_epoch(m_a, o_a, s_a) * 1e3
    log(f"NGAT chained step: {out['ngat_step_ms']:.2f} ms "
        f"({out['ngat_step_ms'] / out['ngnn_step_ms']:.2f}x NGNN)")

    m_b, o_b, s_b = stacked_for("NGAT", strip_nonempty=True)
    out["ngat_inlayer_nonempty_ms"] = t_epoch(m_b, o_b, s_b) * 1e3
    log(f"NGAT (in-layer nonempty): "
        f"{out['ngat_inlayer_nonempty_ms']:.2f} ms")

    out["ngat_eval_step_ms"] = t_epoch(m_a, o_a, s_a, train=False) * 1e3
    out["ngnn_eval_step_ms"] = t_epoch(m_ngnn, o_ngnn, s_ngnn,
                                       train=False) * 1e3
    log(f"eval steps: NGAT {out['ngat_eval_step_ms']:.2f} ms, "
        f"NGNN {out['ngnn_eval_step_ms']:.2f} ms")

    # attention Linears -> identity (keeps shapes; quantifies the 4
    # d x d matmuls AND their fusion-boundary cost)
    import pygho_tpu.honn.conv as conv_mod

    class _Id:
        def __call__(self, x):
            return x

    m_c, _o_unused, s_c = stacked_for("NGAT")
    patched = 0
    for lyr in getattr(m_c, "subggnns", []):
        if isinstance(lyr, conv_mod.NGATConv):
            patched += 1
            lyr.att1 = _Id()
            lyr.att2 = _Id()
            lyr.att3 = _Id()
            lyr.attA = _Id()
    # the optimizer must be built AFTER patching: _Id is not an nnx
    # module, so the patched model's param tree lacks att1..attA and a
    # pre-patch optimizer's state no longer merges (dict key mismatch)
    from pygho_tpu.models.training import make_optimizer as _mk_opt
    o_c = _mk_opt(m_c, 1e-3)
    try:
        assert patched, "no NGATConv layers found to patch"
        out["ngat_nolin_step_ms"] = t_epoch(m_c, o_c, s_c) * 1e3
        log(f"NGAT (identity att-linears, {patched} layers): "
            f"{out['ngat_nolin_step_ms']:.2f} ms")
    except Exception as ex:
        log(f"identity-linear variant failed: {type(ex).__name__}: {ex}")

    # aggregate cost analysis of one step, NGAT vs NGNN
    try:
        from pygho_tpu.models.training import make_sparse_steps

        for name, (mm, oo, ss) in (("ngat", (m_a, o_a, s_a)),
                                   ("ngnn", (m_ngnn, o_ngnn, s_ngnn))):
            graphdef, state = nnx.split((mm, oo))
            one = jax.tree.map(lambda x: x[0], ss)

            @jax.jit
            def step(state, batch):
                mdl, op = nnx.merge(graphdef, state)

                def loss_fn(mdl):
                    from pygho_tpu.hodata.sp_data import (
                        batch_to_sparse_dict)
                    from pygho_tpu.models.training import masked_l1_loss

                    dd = batch_to_sparse_dict(batch, ("",))
                    return masked_l1_loss(mdl(dd), batch["y"],
                                          batch["graph_mask"])

                lv, grads = nnx.value_and_grad(loss_fn)(mdl)
                op.update(mdl, grads)
                return nnx.split((mdl, op))[1], lv

            ca = step.lower(state, one).compile().cost_analysis()
            out[f"{name}_cost_flops"] = float(ca.get("flops", 0.0))
            out[f"{name}_cost_bytes"] = float(ca.get("bytes accessed",
                                                     0.0))
            log(f"{name} step cost: "
                f"{out[f'{name}_cost_flops'] / 1e9:.1f} GFLOP, "
                f"{out[f'{name}_cost_bytes'] / 1e9:.2f} GB")
    except Exception as ex:
        log(f"cost_analysis failed: {type(ex).__name__}: {ex}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
