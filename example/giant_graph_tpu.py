"""Giant-graph tuple-parallel training demo.

When ONE graph's tuple tensor exceeds a chip, the scaling axis is the
tuple dimension (BASELINE metric b).  This demo builds a large
community-structured graph, RCM-reorders it for window locality,
precomputes the sharding plan, and trains an sp-sharded NGNN stack over
the device mesh:

  JAX_PLATFORMS=cpu python example/giant_graph_tpu.py --devices 8

(on a real pod slice, drop the --cpu flag; mesh axes span ICI/DCN)
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

parser = argparse.ArgumentParser()
parser.add_argument("--devices", type=int, default=8)
parser.add_argument("--cpu", action="store_true", default=True)
parser.add_argument("--tpu", dest="cpu", action="store_false",
                    help="run on the real TPU (single chip: --devices 1)")
parser.add_argument("--communities", type=int, default=100)
parser.add_argument("--csize", type=int, default=30)
parser.add_argument("--hiddim", type=int, default=32)
parser.add_argument("--num_layer", type=int, default=3)
parser.add_argument("--steps", type=int, default=30)
parser.add_argument("--lr", type=float, default=1e-4)
parser.add_argument("--strategy",
                    choices=["overlapped", "ring", "reduce_scatter",
                             "overlapped_fused"],
                    default="overlapped",
                    help="boundary exchange: all_gather pools / ppermute "
                         "ring (O(Bnd) peak memory) / psum_scatter over "
                         "ownership bands (structure-free) / all_gather "
                         "pools with both contractions on the fused "
                         "Pallas kernel (hiddim must be a multiple of "
                         "128 on real TPU)")
parser.add_argument("--fast", action="store_true",
                    help="bf16 fast math in the fused kernel "
                         "(overlapped_fused only)")
args = parser.parse_args()

import os

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + f" --xla_force_host_platform_device_count={args.devices}").strip())

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from pygho_tpu.backend import indexing
from pygho_tpu.hodata.graph import Graph, rcm_reorder
from pygho_tpu.parallel import (make_mesh, build_giant_graph_plan,
                                init_giant_params, make_giant_graph_step)

if args.fast:
    from pygho_tpu.kernels.fused_spspmm import set_fused_math

    set_fused_math(False)

# 1. a large community-structured graph
rng = np.random.default_rng(0)
n = args.communities * args.csize
edges = []
for ci in range(args.communities):
    base = ci * args.csize
    u = rng.integers(0, args.csize, args.csize * 5) + base
    v = rng.integers(0, args.csize, args.csize * 5) + base
    edges.append(np.stack([u, v]))
    u2 = rng.integers(0, args.csize, 3) + base
    v2 = rng.integers(0, args.csize, 3) + \
        ((ci + 1) % args.communities) * args.csize
    edges.append(np.stack([u2, v2]))
ei = np.concatenate(edges, axis=1)
ei = np.concatenate([ei, ei[::-1]], axis=1)
g = Graph(x=np.zeros((n, 1), np.int64), edge_index=ei, edge_attr=None)
g = rcm_reorder(g.coalesced())
print(f"graph: {g.num_nodes} nodes, {g.num_edges} edges")

# 2. tuples (hop-1 here; swap in KhopSampler for deeper ego-nets)
ii = np.concatenate([np.arange(n), g.edge_index[0]])
jj = np.concatenate([np.arange(n), g.edge_index[1]])
tup, _ = indexing.coalesce(np.stack([ii, jj]))
tar, bcd = indexing.spspmm_ind(tup, 1, g.edge_index, 0)
acd = indexing.filterind(tup, tar, bcd)
print(f"tuples: {tup.shape[1]}, contraction rows: {acd.shape[1]}")

# 3. sharding plan over the sp axis
P = args.devices
nnz_pad = ((indexing.bucket_size(tup.shape[1]) + P - 1) // P) * P
tid = indexing.pad_indices(tup, nnz_pad)
acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1]))
mesh = make_mesh((P,), ("sp",))
plan = build_giant_graph_plan(acd_p, tid, nnz_pad, n, P,
                              strategy=args.strategy,
                              n_edge_rows=g.num_edges,
                              plan_dim=args.hiddim)
_c = getattr(plan.contraction, "base", plan.contraction)
if hasattr(_c, "Bnd"):
    print(f"plan ({args.strategy}): {plan.B} tuple rows/device, "
          f"boundary pool {_c.Bnd} rows/device")
else:
    print(f"plan ({args.strategy}): {plan.B} tuple rows/device, "
          f"exchange {P * plan.B} full-range partial rows/device "
          f"(reduce_scatter, no boundary sets)")

# 4. train
d = args.hiddim
params = init_giant_params(args.num_layer, d)
Xv = jnp.asarray(indexing.pad_values(
    rng.normal(size=(tup.shape[1], d)).astype(np.float32) * 0.1, nnz_pad))
Av = jnp.asarray(rng.normal(size=(g.num_edges, d)).astype(np.float32) * 0.1)
deg = np.bincount(g.edge_index[0], minlength=n)
y = jnp.asarray((deg / deg.max()).astype(np.float32))  # predict degree

loss_fn, step = make_giant_graph_step(mesh, plan, args.num_layer,
                                      lr=args.lr)
t0 = time.time()
params, loss = step(params, Xv, Av, y)
print(f"step 0: loss {float(loss):.5f} "
      f"(compile+run {time.time() - t0:.1f}s)", flush=True)
t1 = time.time()
for i in range(1, args.steps):
    params, loss = step(params, Xv, Av, y)
    if i % 5 == 0 or i == args.steps - 1:
        print(f"step {i}: loss {float(loss):.5f}", flush=True)
float(loss)  # materialize before timing (tunnel acks early)
steady = (time.time() - t1) / max(args.steps - 1, 1)
print(f"{args.steps} steps in {time.time() - t0:.1f}s "
      f"({steady * 1e3:.1f} ms/step steady) on a "
      f"{P}-device '{jax.devices()[0].platform}' mesh")
