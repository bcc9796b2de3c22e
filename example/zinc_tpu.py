"""Full ZINC-style benchmark harness — the reference example/zinc.py
argparse matrix: {sparse|dense} x 7 convs x aggr/pool/norm/lr/schedule
hyperparameters, repeated runs, per-epoch metrics.

Run examples:
  python example/zinc_tpu.py --sparse --conv NGNN
  python example/zinc_tpu.py --conv PPGN            (dense / DD mode)
  python example/zinc_tpu.py --sparse --conv I2GNN  (3-tuples)
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

parser = argparse.ArgumentParser()
parser.add_argument("--sparse", action="store_true")
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--aggr", choices=["sum", "mean", "max"], default="sum")
parser.add_argument("--conv", choices=["NGNN", "NGAT", "GNNAK", "DSSGNN",
                                       "SSWL", "SUN", "PPGN", "I2GNN"],
                    default="NGNN")
parser.add_argument("--npool", choices=["mean", "sum", "max"], default="sum")
parser.add_argument("--lpool", choices=["mean", "sum", "max"], default="mean")
parser.add_argument("--cpool", choices=["mean", "sum", "max"], default="mean")
parser.add_argument("--mlplayer", type=int, default=1)
parser.add_argument("--outlayer", type=int, default=2)
parser.add_argument("--norm", choices=["ln", "bn", "none"], default="bn")
parser.add_argument("--lr", type=float, default=1e-3)
parser.add_argument("--minlr", type=float, default=0.0)
parser.add_argument("--wd", type=float, default=0.0)
parser.add_argument("--dp", type=float, default=0.0)
parser.add_argument("--bs", type=int, default=128)
parser.add_argument("--normparam", type=float, default=0.1)
parser.add_argument("--cosT", type=int, default=100)
parser.add_argument("--K", type=float, default=0.0)
parser.add_argument("--K2", type=float, default=0.0)
parser.add_argument("--repeat", type=int, default=1)
parser.add_argument("--seed0", type=int, default=0,
                    help="first seed index (reference zinc.py:401 repeats "
                         "seeds 0..repeat-1; seed0>0 extends an existing "
                         "matrix entry with new seeds without re-running "
                         "the recorded ones)")
parser.add_argument("--ntrain", type=int, default=None,
                    help="training-set size (default 1024 synthetic "
                         "graphs; 10000 matches the reference's "
                         "ZINC-subset scale)")
parser.add_argument("--epochs", type=int, default=100)
parser.add_argument("--hop", type=int, default=3)
parser.add_argument("--num_layer", type=int, default=6)
parser.add_argument("--hiddim", type=int, default=128)
parser.add_argument("--fused", action="store_true",
                    help="fused Pallas kernel with bf16 fast math (sparse)")
parser.add_argument("--plan-measure", action="store_true",
                    help="with --fused: time the top autotune geometry "
                         "candidates on device and pick the measured "
                         "winner (one remote compile each; for "
                         "high-reuse plans / giant graphs)")
parser.add_argument("--bf16", action="store_true",
                    help="bf16 activations/compute (sparse or dense), "
                         "MLPs and norms (params stay f32); composes "
                         "with --fused and --chained")
parser.add_argument("--ddp", type=int, default=0,
                    help="data-parallel over N devices (sparse): shard_map "
                         "train step with pmean'd grads/BN stats; eval runs "
                         "single-device on the synced state")
parser.add_argument("--remat", action="store_true",
                    help="layer-level rematerialization (sparse or "
                         "dense): recompute conv activations in the "
                         "backward pass instead of storing them")
parser.add_argument("--chained", action="store_true",
                    help="whole-epoch lax.scan training/eval: one device "
                         "dispatch per padding bucket per epoch — wins when "
                         "host-device latency dominates step time")
parser.add_argument("--data-root", type=str, default=None,
                    help="path to a real ZINC dataset root "
                         "(<root>/raw/{split}.pickle[+.index], the PyG "
                         "ZINC raw layout); default: synthetic_zinc "
                         "stand-in (no-egress container)")
parser.add_argument("--converged-record", type=str, default=None,
                    help="write a converged-protocol summary json "
                         "(best-val/test MAE, s/epoch) to this path; "
                         "bench.py reads runs/converged_zinc.json")
parser.add_argument("--full", action="store_true",
                    help="with --data-root: use the full 250k ZINC "
                         "instead of the 12k benchmark subset")
args = parser.parse_args()

if args.conv == "NGAT" and not args.sparse:
    parser.error("NGAT is sparse-only (spspmpnn attention path); "
                 "add --sparse")
if args.conv == "I2GNN" and not args.sparse:
    parser.error("I2GNN needs 3-tuple features; the dense pipeline's "
                 "spdsampler emits 2-tuples (the reference shares this "
                 "limit, MaTupleSampler.py) — add --sparse")

import os

if args.cpu and args.ddp > 1:
    # virtual host devices must be configured before jax initializes
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{args.ddp}").strip()

import jax
import jax.numpy as jnp

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pygho_tpu.hodata import (Sppretransform, Mapretransform, SpDataloader,
                              MaDataloader, ParallelPreprocessDataset)
from pygho_tpu.hodata.sp_sampler import KhopSampler, I2Sampler
from pygho_tpu.hodata.ma_sampler import spdsampler
from pygho_tpu.hodata.datasets import synthetic_zinc, load_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model, make_ma_model
from pygho_tpu.models.training import (make_sparse_steps, make_dense_steps,
                                       make_optimizer, cosine_warm_restarts,
                                       make_chained_train, make_chained_eval,
                                       group_stack_batches)
from pygho_tpu.utils import MetricsLogger, device_memory_stats
from pygho_tpu.utils.metrics import CompileCounter

mlpdict = {"dp": args.dp, "norm": args.norm, "act": "silu",
           "normparam": args.normparam, "numlayer": args.mlplayer,
           "tailact": True}


def run_once(rep: int) -> float:
    if args.sparse:
        model = make_sp_model(args.conv, num_layer=args.num_layer,
                              hiddim=args.hiddim, aggr=args.aggr,
                              npool=args.npool, lpool=args.lpool,
                              cpool=args.cpool, outlayer=args.outlayer,
                              mlp=mlpdict, seed=rep,
                              dtype=(jnp.bfloat16 if args.bf16 else None),
                              remat=args.remat)
        keys = parse_precomputekey(model)
        sampler = (partial(I2Sampler, hop=args.hop) if args.conv == "I2GNN"
                   else partial(KhopSampler, hop=args.hop))
        pre = Sppretransform(sampler, [""], keys)
        tag = f"sp_{args.conv}_h{args.hop}"
    else:
        model = make_ma_model(args.conv, num_layer=args.num_layer,
                              hiddim=args.hiddim, npool=args.npool,
                              lpool=args.lpool, cpool=args.cpool,
                              outlayer=args.outlayer, mlp=mlpdict, seed=rep,
                              dtype=(jnp.bfloat16 if args.bf16 else None),
                              remat=args.remat)
        keys = []
        pre = Mapretransform(partial(spdsampler, hop=args.hop), [""])
        tag = f"ma_{args.conv}_h{args.hop}"

    if args.data_root:
        def raw(s):
            gs = load_zinc(args.data_root, s, subset=not args.full)
            return gs[: args.ntrain] if s == "train" and args.ntrain else gs
        dstag = "ZINC" + ("full" if args.full else "")
    else:
        def raw(s):
            return synthetic_zinc(
                s, n_graphs=args.ntrain if s == "train" else None)
        dstag = "SYNZINC"
    ds = {s: ParallelPreprocessDataset(
        f"dataset/{dstag}_{tag}_{s}"
        + (f"_n{args.ntrain}" if s == "train" and args.ntrain else ""),
        raw(s), pre, 0)
          for s in ("train", "val", "test")}
    if args.sparse:
        if args.fused:
            from pygho_tpu.kernels.fused_spspmm import set_fused_math

            set_fused_math(False)
        # chained mode stacks on host and device_puts once — per-batch
        # device_put would move the epoch over the link several times
        shared_geoms = {}   # one autotune (incl. measured) for all splits
        mk = lambda split, **kw: SpDataloader(
            ds[split].datas, args.bs, keys, build_plans=args.fused,
            plan_dim=args.hiddim, geoms_cache=shared_geoms,
            plan_geometry=("autotune+measure" if args.plan_measure
                           else "autotune"),
            # NGAT: fused attention stages need the score/agg plan pairs
            attention_plans=args.fused and args.conv == "NGAT",
            device_put=not args.chained, **kw)
        train_step, eval_step = make_sparse_steps()
    else:
        mk = lambda split, **kw: MaDataloader(ds[split].datas, args.bs,
                                              device_put=not args.chained,
                                              **kw)
        train_step, eval_step = make_dense_steps()
    loaders = {"train": mk("train", shuffle=True, drop_last=True),
               "val": mk("val"), "test": mk("test")}
    if args.ddp > 1:
        assert args.sparse, "--ddp is the sparse shard_map path"
        from flax import nnx
        from pygho_tpu.parallel import (make_mesh, collate_sharded_sparse,
                                        make_dp_train_step)

        assert args.bs % args.ddp == 0, "--bs must divide by --ddp"
        mesh = make_mesh((args.ddp,), ("dp",),
                         devices=jax.devices()[: args.ddp])
    if args.chained:
        mode = "sparse" if args.sparse else "dense"
        _, scan_fn, perm_scan_fn = make_chained_train(mode=mode)
        chained_eval = make_chained_eval(mode=mode)
        # eval splits don't shuffle: stack them once
        eval_stacked = {s: group_stack_batches(list(loaders[s]))
                        for s in ("val", "test")}
        # train: collate + (fused) plan + stack ONCE; epochs reshuffle
        # the step order on device (perm_scan) — batch membership is
        # frozen at this first collation, and all per-epoch host work
        # (collate ~9 ms + plan ~40-70 ms per batch) disappears
        eval_stacked = jax.device_put(eval_stacked)
        ch_rng = np.random.default_rng(1000 + rep)
        if args.ddp <= 1:
            list(loaders["train"])  # warm padding buckets (fewer groups)
            # device_put once: leaving numpy leaves would re-transfer
            # the whole stacked epoch on every perm_scan call (seconds
            # over a remote tunnel)
            train_stacked = jax.device_put(
                group_stack_batches(list(loaders["train"])))

    sched = cosine_warm_restarts(args.lr, args.cosT, len(loaders["train"]),
                                 args.minlr, args.K, args.K2)
    opt = make_optimizer(model, sched, args.wd)
    metrics = MetricsLogger(f"runs/zinc_{tag}_r{rep}.jsonl")
    compiles = CompileCounter()
    # one-time padding-waste report (host-side collation only)
    try:
        from pygho_tpu.hodata.loader import padding_stats

        probe = loaders["train"]._collate(
            ds["train"].datas[: min(args.bs, len(ds["train"].datas))])
        metrics.log({"type": "padding", **{
            k: v for k, v in padding_stats(probe).items()}})
    except Exception:
        pass
    if args.ddp > 1:
        graphdef, dp_state = nnx.split((model, opt))
        dp_rng = np.random.default_rng(rep)
        dp_buckets = {}
        dp_geoms = {}
        dp_kw = dict(build_plans=args.fused, plan_dim=args.hiddim,
                     plan_geometry=("autotune+measure" if args.plan_measure
                                    else "autotune"),
                     geoms_cache=dp_geoms)
        if args.chained:
            # dp x chained composition: stack the sharded epoch once,
            # scan a device-side step permutation each epoch
            from pygho_tpu.models.training import stack_batches
            from pygho_tpu.parallel import make_dp_chained_train

            datas, per = ds["train"].datas, args.bs // args.ddp
            nb = len(datas) // args.bs
            mkb = lambda: [collate_sharded_sparse(
                datas[i * args.bs:(i + 1) * args.bs], args.ddp, per,
                keys, buckets=dp_buckets, **dp_kw) for i in range(nb)]
            mkb()                       # warm shared buckets
            dp_stacked = jax.device_put(stack_batches(mkb()))
            dp_scan = make_dp_chained_train(mesh, graphdef)

            def dp_epoch():
                nonlocal dp_state
                perm = dp_rng.permutation(nb)
                dp_state, losses = dp_scan(dp_state, dp_stacked, perm)
                nnx.update((model, opt), dp_state)   # sync for eval
                return float(np.mean(np.asarray(losses)))
        else:
            dp_train = make_dp_train_step(mesh, graphdef)

            def dp_epoch():
                nonlocal dp_state
                datas, per = ds["train"].datas, args.bs // args.ddp
                order = dp_rng.permutation(len(datas))
                losses = []
                for i in range(0, len(datas) - args.bs + 1, args.bs):
                    chunk = [datas[j] for j in order[i:i + args.bs]]
                    sb = collate_sharded_sparse(chunk, args.ddp, per, keys,
                                                buckets=dp_buckets, **dp_kw)
                    dp_state, loss = dp_train(dp_state, sb)
                    losses.append(loss)
                nnx.update((model, opt), dp_state)   # sync for eval
                return float(np.mean([float(l) for l in losses]))

    best_val, tst = float("inf"), float("inf")
    best_epoch = 0
    epoch_times = []
    for epoch in range(1, args.epochs + 1):
        t1 = time.time()
        model.train()
        if args.ddp > 1:
            loss = dp_epoch()
        elif args.chained:
            parts = []
            # shuffle group visit order too — a frozen bucket order
            # would bias BN running stats toward the last bucket
            for gi in ch_rng.permutation(len(train_stacked)):
                g = train_stacked[gi]
                n_steps = jax.tree.leaves(g)[0].shape[0]
                perm = ch_rng.permutation(n_steps)
                parts.append(np.asarray(perm_scan_fn(model, opt, g, perm)))
            loss = float(np.mean(np.concatenate(parts)))
        else:
            losses = [train_step(model, opt, b) for b in loaders["train"]]
            loss = float(np.mean([float(l) for l in losses]))
        t2 = time.time()
        model.eval()

        def split_mae(split):
            tot = np.zeros(2)
            if args.chained:
                for g in eval_stacked[split]:
                    tot += np.asarray(chained_eval(model, g))
            else:
                for b in loaders[split]:
                    tot += np.asarray(eval_step(model, b))
            return tot[0] / tot[1]

        val = split_mae("val")
        if val < best_val:
            best_val = val
            best_epoch = epoch
            tst = split_mae("test")
        t3 = time.time()
        epoch_times.append(t2 - t1)
        mem = device_memory_stats().get("peak_gb_in_use", 0.0)
        metrics.log_epoch(epoch, t2 - t1, t3 - t2, mem, loss, val, tst)
        # recompile + bucket-growth telemetry: compiles after epoch 1
        # mean a late outlier batch grew a padding bucket (the growth
        # events name the bucket that did it)
        growth = [e for ld in loaders.values()
                  for e in ld.buckets.drain_events()]
        metrics.log({"type": "telemetry", "epoch": epoch,
                     "compiles": compiles.delta(),
                     "compile_secs_total": round(compiles.total_secs, 2),
                     "bucket_growth": growth})
        if np.isnan(loss) or np.isnan(val):
            break
    if args.converged_record:
        # durable converged-protocol artifact (reference example/
        # zinc.py:413-427: best-val test selection); bench.py carries
        # it into every BENCH_r record as extra.converged_recorded
        import json as _json

        def fin(x):
            # strict JSON has no Infinity/NaN: a run that diverged in
            # epoch 1 leaves best_val/tst at inf — serialize as null
            return float(x) if np.isfinite(x) else None
        rec = {"dataset": dstag, "conv": args.conv,
               "mode": "sparse" if args.sparse else "dense",
               "fused": args.fused, "bf16": args.bf16,
               "ntrain": args.ntrain, "epochs": args.epochs,
               "hop": args.hop, "hiddim": args.hiddim,
               "num_layer": args.num_layer, "bs": args.bs,
               "seed": rep,
               "hps": {"lr": args.lr, "minlr": args.minlr, "wd": args.wd,
                       "cosT": args.cosT, "K": args.K, "K2": args.K2,
                       "normparam": args.normparam, "aggr": args.aggr,
                       "npool": args.npool, "lpool": args.lpool,
                       "cpool": args.cpool, "mlplayer": args.mlplayer,
                       "outlayer": args.outlayer, "norm": args.norm},
               "best_val_mae": fin(best_val), "best_val_epoch": best_epoch,
               "tst_mae_at_best_val": fin(tst),
               "sec_per_epoch_median": float(np.median(epoch_times[1:]))
               if len(epoch_times) > 1 else None}
        # --repeat > 1: one seed-labeled artifact per repetition
        # (splitext over the basename: a dotted DIRECTORY name must not
        # swallow the suffix)
        path = args.converged_record
        if args.repeat > 1 or args.seed0 > 0:
            import os.path as _osp
            stem, ext = _osp.splitext(path)
            path = f"{stem}.s{rep}{ext}"
        with open(path, "w") as f:
            _json.dump(rec, f, indent=1)
        print(f"converged record -> {path}", flush=True)
    return tst


scores = [run_once(r) for r in range(args.seed0, args.seed0 + args.repeat)]
print(f"All {np.average(scores)} {np.std(scores)}")
