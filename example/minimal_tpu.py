"""Minimal end-to-end NGNN on a ZINC-style dataset — the reference
example/minimal.py workload on TPU.

Run: python example/minimal_tpu.py [--cpu] [--epochs N]
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--epochs", type=int, default=20)
parser.add_argument("--hiddim", type=int, default=128)
parser.add_argument("--num_layer", type=int, default=6)
parser.add_argument("--bs", type=int, default=128)
parser.add_argument("--hop", type=int, default=3)
parser.add_argument("--fused", action="store_true",
                    help="route message passing through the fused Pallas "
                         "kernel (bf16 fast math)")
parser.add_argument("--ckpt", default="", help="checkpoint dir (save per "
                    "epoch; resumes if one exists)")
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pygho_tpu.hodata import (Sppretransform, SpDataloader,
                              ParallelPreprocessDataset)
from pygho_tpu.hodata.sp_sampler import KhopSampler
from pygho_tpu.hodata.datasets import synthetic_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model
from pygho_tpu.models.training import make_sparse_steps, make_optimizer
from pygho_tpu.utils import MetricsLogger, device_memory_stats

# 1. model (reference example/minimal.py:92-98)
mlpdict = {"norm": "bn", "act": "silu", "dp": 0.0}
model = make_sp_model("NGNN", num_layer=args.num_layer, hiddim=args.hiddim,
                      mlp=mlpdict)

# 2. preprocessing with the model's precompute keys (minimal.py:107-116)
keys = parse_precomputekey(model)
pre = Sppretransform(partial(KhopSampler, hop=args.hop), [""], keys)
datasets = {}
for split in ("train", "val", "test"):
    datasets[split] = ParallelPreprocessDataset(
        f"dataset/SYNZINC_{split}", synthetic_zinc(split), pre, 0)

# 3. dataloaders (minimal.py:118-133)
if args.fused:
    from pygho_tpu.kernels.fused_spspmm import set_fused_math

    set_fused_math(False)   # bf16 fast math in the fused kernel
loaders = {
    "train": SpDataloader(datasets["train"].datas, args.bs, keys,
                          shuffle=True, drop_last=True,
                          build_plans=args.fused, plan_dim=args.hiddim),
    "val": SpDataloader(datasets["val"].datas, args.bs, keys,
                        build_plans=args.fused, plan_dim=args.hiddim),
    "test": SpDataloader(datasets["test"].datas, args.bs, keys,
                         build_plans=args.fused, plan_dim=args.hiddim),
}

opt = make_optimizer(model, 1e-3)
train_step, eval_step = make_sparse_steps()
metrics = MetricsLogger("runs/minimal_tpu.jsonl")

start_epoch = 1
if args.ckpt:
    import os

    from pygho_tpu.utils import save_checkpoint, restore_checkpoint

    if os.path.isdir(args.ckpt) and any(
            d.startswith("step_") for d in os.listdir(args.ckpt)):
        start_epoch = restore_checkpoint(args.ckpt, model, opt) + 1
        print(f"resumed from epoch {start_epoch - 1}")


def train(dl):
    model.train()
    losses = []
    for batch in dl:
        losses.append(train_step(model, opt, batch))
    return float(np.mean([float(l) for l in losses]))


def evaluate(dl):
    model.eval()
    tot = np.zeros(2)
    for batch in dl:
        tot += np.asarray(eval_step(model, batch))
    return tot[0] / tot[1]


best_val, tst_score = float("inf"), float("inf")
for epoch in range(start_epoch, args.epochs + 1):
    t1 = time.time()
    loss = train(loaders["train"])
    t2 = time.time()
    val = evaluate(loaders["val"])
    if val < best_val:
        best_val = val
        tst_score = evaluate(loaders["test"])
    t3 = time.time()
    mem = device_memory_stats().get("peak_gb_in_use", 0.0)
    metrics.log_epoch(epoch, t2 - t1, t3 - t2, mem, loss, val, tst_score)
    if args.ckpt:
        save_checkpoint(args.ckpt, model, opt, step=epoch)
    if np.isnan(loss) or np.isnan(val):
        break

print(f"Final test MAE: {tst_score:.4f}")
