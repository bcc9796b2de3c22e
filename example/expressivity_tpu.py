"""Expressivity / counting benchmarks: CSL, EXP, sr25, subgraphcount
(the datasets the reference stages under dataset/ without loader scripts;
BASELINE.json configs 3-5).

  python example/expressivity_tpu.py --dataset CSL   --conv NGNN
  python example/expressivity_tpu.py --dataset EXP   --conv SSWL
  python example/expressivity_tpu.py --dataset sr25  --conv NGNN
  python example/expressivity_tpu.py --dataset count --conv I2GNN

CSL/EXP/sr25 are classification (HOGNNs should reach ~100% where 1-WL
GNNs are at chance); count is triangle-count regression.
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", choices=["CSL", "EXP", "sr25", "count"],
                    default="CSL")
parser.add_argument("--conv", default="NGNN")
parser.add_argument("--target", default="triangle",
                    help="count-dataset regression target: one of "
                         "triangle/tailed_triangle/star/cycle4/cycle5/"
                         "chordal, or 'all' (6-task regression — the "
                         "randomgraph.mat target family)")
parser.add_argument("--dense", action="store_true",
                    help="masked-dense ('DD') backend: spdsampler tuple "
                         "features, padded (b,n,n) tensors, einsum path "
                         "(BASELINE configs 3/5: NGNN on EXP/CSL, PPGN "
                         "on sr25)")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--epochs", type=int, default=60)
parser.add_argument("--hiddim", type=int, default=64)
parser.add_argument("--num_layer", type=int, default=4)
parser.add_argument("--bs", type=int, default=32)
parser.add_argument("--hop", type=int, default=3)
parser.add_argument("--lr", type=float, default=2e-3)
parser.add_argument("--cosT", type=int, default=0,
                    help="cosine-warm-restarts period in epochs (0 = "
                         "constant lr); the ZINC harness's scheduler")
parser.add_argument("--minlr", type=float, default=0.0)
parser.add_argument("--wd", type=float, default=0.0)
parser.add_argument("--K", type=float, default=0.0)
parser.add_argument("--K2", type=float, default=0.0)
parser.add_argument("--norm", choices=["bn", "ln", "none"], default="bn")
parser.add_argument("--recalibrate_bn", action="store_true",
                    help="re-estimate batchnorm running stats over the "
                         "training batches before each eval (fixes "
                         "eval-mode staleness on tiny margins)")
parser.add_argument("--eval_train_mode", action="store_true",
                    help="evaluate with batch statistics (transductive "
                         "full-batch tasks like sr25, where eval-mode "
                         "running stats lag the razor-thin class margins)")
parser.add_argument("--normparam", type=float, default=0.1,
                    help="batchnorm momentum; 1.0 with full-batch training "
                         "makes eval-mode stats equal train-mode (useful "
                         "for tiny transductive sets like sr25)")
args = parser.parse_args()

if args.dense and args.conv == "I2GNN":
    parser.error("I2GNN needs 3-tuple features; the dense pipeline's "
                 "spdsampler emits 2-tuples — drop --dense")

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pygho_tpu.hodata import (Sppretransform, SpDataloader,
                              ParallelPreprocessDataset)
from pygho_tpu.hodata.sp_sampler import KhopSampler, I2Sampler
from pygho_tpu.hodata.datasets import (load_csl, load_exp, load_sr25,
                                       synthetic_subgraphcount)
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model
from pygho_tpu.models.training import (
    make_sparse_steps, make_sparse_classification_steps, make_optimizer)
from pygho_tpu.utils import MetricsLogger

if args.dataset == "CSL":
    graphs, num_classes, task = load_csl(), 10, "cls"
elif args.dataset == "EXP":
    graphs, num_classes, task = load_exp(), 2, "cls"
elif args.dataset == "sr25":
    graphs, num_classes, task = load_sr25(), 15, "cls"
else:
    import os

    from pygho_tpu.hodata.datasets import load_subgraphcount
    _mat = "/root/reference/dataset/subgraphcount/raw/randomgraph.mat"
    if os.path.exists(_mat):   # real benchmark blob, when present
        graphs = load_subgraphcount(_mat, target=args.target)
    else:                      # stripped from this snapshot -> synthetic
        graphs = synthetic_subgraphcount(target=args.target)
    num_classes, task = graphs[0].y.shape[0], "reg"
    # targets live in g.y, so the preprocessing cache must be per-target
    args.dataset = f"count_{args.target}"

rng = np.random.default_rng(0)
perm = rng.permutation(len(graphs))
n_val = max(1, len(graphs) // 5)
val_idx, trn_idx = perm[:n_val], perm[n_val:]
if args.dataset == "sr25":    # task: memorize/separate all 15 graphs
    trn_idx = val_idx = perm

mlp = {"norm": args.norm, "act": "silu", "normparam": args.normparam}
if args.dense:
    from pygho_tpu.hodata import MaDataloader, Mapretransform
    from pygho_tpu.hodata.ma_sampler import spdsampler
    from pygho_tpu.models import make_ma_model
    from pygho_tpu.models.training import (
        make_dense_steps, make_dense_classification_steps)

    model = make_ma_model(args.conv, num_tasks=num_classes,
                          num_layer=args.num_layer, hiddim=args.hiddim,
                          mlp=mlp)
    ds = ParallelPreprocessDataset(
        f"dataset/{args.dataset}_ma_h{args.hop}", graphs,
        Mapretransform(partial(spdsampler, hop=args.hop), [""]), 0)
    trn = MaDataloader([ds[i] for i in trn_idx], args.bs, shuffle=True)
    val = MaDataloader([ds[i] for i in val_idx], args.bs)
    if task == "cls":
        train_step, eval_step = make_dense_classification_steps()
    else:
        train_step, eval_step = make_dense_steps()
else:
    model = make_sp_model(args.conv, num_tasks=num_classes,
                          num_layer=args.num_layer, hiddim=args.hiddim,
                          mlp=mlp)
    keys = parse_precomputekey(model)
    sampler = (partial(I2Sampler, hop=args.hop) if args.conv == "I2GNN"
               else partial(KhopSampler, hop=args.hop))
    ds = ParallelPreprocessDataset(
        f"dataset/{args.dataset}_{args.conv}_h{args.hop}", graphs,
        Sppretransform(sampler, [""], keys), 0)
    trn = SpDataloader([ds[i] for i in trn_idx], args.bs, keys, shuffle=True)
    val = SpDataloader([ds[i] for i in val_idx], args.bs, keys)
    if task == "cls":
        train_step, eval_step = make_sparse_classification_steps()
    else:
        train_step, eval_step = make_sparse_steps()

if args.cosT > 0:
    from pygho_tpu.models.training import cosine_warm_restarts

    sched = cosine_warm_restarts(args.lr, args.cosT, len(trn),
                                 args.minlr, args.K, args.K2)
    opt = make_optimizer(model, sched, args.wd)
else:
    opt = make_optimizer(model, args.lr, args.wd)
metrics = MetricsLogger(
    f"runs/expr_{args.dataset}_{args.conv}"
    f"{'_dense' if args.dense else ''}.jsonl")

if args.recalibrate_bn:
    from flax import nnx as _nnx

    if args.dense:
        from pygho_tpu.hodata.ma_data import batch_to_dense_dict as _b2d

        @_nnx.jit
        def _recal_fwd(m, b):
            return m(_b2d(b))
    else:
        from pygho_tpu.hodata.sp_data import batch_to_sparse_dict as _b2s

        @_nnx.jit
        def _recal_fwd(m, b):
            return m(_b2s(b))

best = 0.0 if task == "cls" else float("inf")
for epoch in range(1, args.epochs + 1):
    t0 = time.time()
    model.train()
    losses = [float(train_step(model, opt, b)) for b in trn]
    if args.recalibrate_bn:
        from pygho_tpu.honn.utils import recalibrate_batchnorm

        model.train()
        recalibrate_batchnorm(model, list(trn), _recal_fwd)
    if args.eval_train_mode:
        model.train()
    else:
        model.eval()
    tot = np.zeros(2)
    for b in val:
        tot += np.asarray(eval_step(model, b))
    if task == "cls":
        score = tot[0] / tot[1]
        best = max(best, score)
        name = "acc"
    else:
        score = tot[0] / tot[1]
        best = min(best, score)
        name = "mae"
    metrics.log({"type": "epoch", "epoch": epoch,
                 "loss": float(np.mean(losses)), name: float(score)})
    print(f"epoch {epoch} time {time.time()-t0:.1f}s "
          f"loss {np.mean(losses):.4f} val {name} {score:.4f} "
          f"(best {best:.4f})", flush=True)

print(f"Final {args.dataset} {name}: {best:.4f}")
