"""Reproduce + bisect the smem-overflow compile failure (SSWL fused
chained, 6 layers): AOT-compile the perm_scan program for a given conv
and layer count through the remote compile helper, WITHOUT touching the
device.  Usage:

  python scripts/repro_smem.py SSWL 3 4 5 6      # layer sweep
  ABLATE_CPU=1 ... for a host-only API check (no Mosaic, no smem)
"""

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


def main():
    conv = sys.argv[1] if len(sys.argv) > 1 else "SSWL"
    layer_counts = [int(x) for x in sys.argv[2:]] or [6]

    from pygho_tpu.hodata import Sppretransform, SpDataloader
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model
    from pygho_tpu.models.training import (make_optimizer,
                                           make_chained_train,
                                           group_stack_batches)
    from pygho_tpu.kernels.fused_spspmm import set_fused_math

    set_fused_math(False)
    graphs = synthetic_zinc("train", n_graphs=256)

    # FULL=1 mirrors the failing converged-matrix config exactly:
    # tuned-HP cosine_warm_restarts schedule, outlayer 4 / mlplayer 2,
    # the 78-step n=10000 stacked epoch (cached dataset)
    full = bool(os.environ.get("FULL"))
    for nl in layer_counts:
        mlpd = ({"dp": 0.0, "norm": "bn", "act": "silu",
                 "normparam": 0.22, "numlayer": 2, "tailact": True}
                if full else {"norm": "bn", "act": "silu"})
        model = make_sp_model(conv, num_layer=nl, hiddim=128,
                              outlayer=(4 if full else 2), mlp=mlpd)
        keys = parse_precomputekey(model)
        pre = Sppretransform(partial(KhopSampler, hop=3), [""], keys)
        if full:
            from pygho_tpu.hodata import ParallelPreprocessDataset

            ds = ParallelPreprocessDataset(
                f"dataset/SYNZINC_sp_{conv}_h3_train_n10000",
                synthetic_zinc("train", n_graphs=10000), pre, 0)
            datas = ds.datas
        else:
            datas = [pre(g) for g in graphs]
        dl = SpDataloader(datas, 128, keys, build_plans=True,
                          plan_dim=128, device_put=False,
                          attention_plans=(conv == "NGAT"),
                          shuffle=full, drop_last=full)
        if full:
            # mirror zinc_tpu's warming: shuffled epochs grow the
            # padding buckets (the failing run stacked at acd=81920,
            # not the first-epoch 65536)
            for _ in range(3):
                list(dl)
        stacked = group_stack_batches(list(dl))[0]
        from pygho_tpu.honn.sp_operator import KEYSEP

        acd0 = stacked[f"{keys[0]}{KEYSEP}acd"]
        print(f"  stacked acd bucket: {acd0.shape}", flush=True)
        if full:
            from pygho_tpu.models.training import cosine_warm_restarts

            sched = cosine_warm_restarts(9e-3, 40, 78, 8.4e-5, 1.4e-2,
                                         1.0e-7)
            opt = make_optimizer(model, sched, 6.5e-7)
        else:
            opt = make_optimizer(model, 1e-3)
        _, _, perm_scan_fn = make_chained_train(mode="sparse")

        # AOT path mirrors perm_scan_fn's jit without executing
        from pygho_tpu.models import training as tr

        graphdef, state = nnx.split((model, opt))
        n_steps = jax.tree.leaves(stacked)[0].shape[0]
        perm = jnp.arange(n_steps, dtype=jnp.int32)
        stacked_j = jax.tree.map(jnp.asarray, stacked)
        t0 = time.perf_counter()
        try:
            tr_run = tr.make_chained_train(mode="sparse")[2]
            # reach the inner jitted callable through a lower() call
            # of the same structure: re-create _perm_scan_run via the
            # factory's closure is not exposed; instead lower the
            # public function by tracing through jax.jit here
            @partial(jax.jit, static_argnums=0)
            def _run(gd, st, stck, p):
                # reuse the library body: one step == _one_step of
                # make_chained_train; emulate via scan over perm
                def body(stt, pi):
                    batch = jax.tree.map(
                        lambda x: jax.lax.dynamic_index_in_dim(
                            x, pi, keepdims=False), stck)
                    mdl, op = nnx.merge(gd, stt)

                    def loss_fn(mdl):
                        from pygho_tpu.hodata.sp_data import (
                            batch_to_sparse_dict)
                        dd = batch_to_sparse_dict(batch, ("",))
                        pred = mdl(dd)
                        from pygho_tpu.models.training import (
                            masked_l1_loss)
                        return masked_l1_loss(pred, batch["y"],
                                              batch["graph_mask"])

                    lv, grads = nnx.value_and_grad(loss_fn)(mdl)
                    op.update(mdl, grads)
                    _, stt2 = nnx.split((mdl, op))
                    return stt2, lv

                return jax.lax.scan(body, st, p)

            _run.lower(graphdef, state, stacked_j, perm).compile()
            print(f"{conv} x{nl}: COMPILE OK "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as ex:
            msg = str(ex)
            smem = "smem" in msg
            print(f"{conv} x{nl}: FAIL ({'smem' if smem else 'other'}) "
                  f"{type(ex).__name__}: {msg[:160]}", flush=True)


if __name__ == "__main__":
    main()
