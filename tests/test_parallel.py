"""Distribution tests on the virtual 8-device CPU mesh.

Oracles: the single-device implementations.  DP training must track the
equivalent big-batch single-device run; tuple-parallel contraction must
equal spspmm exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pygho_tpu.backend import indexing
from pygho_tpu.backend.sptensor import SparseTensor
from pygho_tpu.backend.spspmm import spspmm
from pygho_tpu.hodata import Sppretransform
from pygho_tpu.hodata.sp_sampler import KhopSampler
from pygho_tpu.hodata.datasets import synthetic_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import make_sp_model
from pygho_tpu.models.training import make_optimizer
from pygho_tpu.parallel import (make_mesh, collate_sharded_sparse,
                                make_dp_train_step, make_dp_eval_step,
                                spspmm_tuple_parallel)
from pygho_tpu.parallel.tuple_parallel import make_tuple_parallel_spspmm

from utils import maxdiff


def test_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_dp_train_step_runs_and_learns():
    model = make_sp_model("NGNN", num_layer=2, hiddim=16,
                          mlp={"norm": "bn", "act": "silu"})
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("train", n_graphs=64)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    mesh = make_mesh((8,), ("dp",))
    opt = make_optimizer(model, 1e-2)
    graphdef, state = nnx.split((model, opt))
    train = make_dp_train_step(mesh, graphdef)
    evals = make_dp_eval_step(mesh, graphdef)

    buckets = {}
    losses = []
    for ep in range(6):
        batch = collate_sharded_sparse(datas, 8, 8, keys, buckets=buckets)
        state, loss = train(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    res = np.asarray(evals(state, batch))
    assert res[1] == 64.0  # every graph counted exactly once
    # state can be merged back
    nnx.update((model, opt), state)


def test_dp_matches_single_device_first_step():
    """One DP step over 8 shards == one single-device step over the same
    64 graphs (grads are exact means since every shard has equal graph
    count and the loss is a mean over graphs)."""
    graphs = synthetic_zinc("train", n_graphs=64)

    def build():
        m = make_sp_model("NGNN", num_layer=1, hiddim=8, seed=3,
                          mlp={"norm": "none", "act": "relu"})
        return m

    keys = parse_precomputekey(build())
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]

    # single device, one batch of 64
    from pygho_tpu.hodata import SpDataloader
    from pygho_tpu.models.training import make_sparse_steps
    m1 = build()
    o1 = make_optimizer(m1, 1e-2)
    dl = SpDataloader(datas, batch_size=64, keys=keys, device_put=False,
                      prefetch=0)
    ts1, _ = make_sparse_steps()
    loss1 = float(ts1(m1, o1, next(iter(dl))))

    # 8-way DP
    m2 = build()
    o2 = make_optimizer(m2, 1e-2)
    mesh = make_mesh((8,), ("dp",))
    graphdef, state = nnx.split((m2, o2))
    train = make_dp_train_step(mesh, graphdef)
    batch = collate_sharded_sparse(datas, 8, 8, keys)
    state, loss2 = train(state, batch)
    assert abs(loss1 - float(loss2)) < 2e-4, (loss1, float(loss2))

    # params after one step agree
    nnx.update((m2, o2), state)
    p1 = jax.tree.leaves(nnx.state(m1, nnx.Param))
    p2 = jax.tree.leaves(nnx.state(m2, nnx.Param))
    worst = max(maxdiff(a, b) for a, b in zip(p1, p2))
    assert worst < 2e-4, worst


@pytest.mark.parametrize("aggr", ["sum", "mean", "max"])
def test_tuple_parallel_matches_spspmm(rng, aggr):
    from utils import random_sparse

    n, d = 12, 4
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,))
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,))
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = jnp.asarray(indexing.pad_acd(
        acd, indexing.bucket_size(acd.shape[1], 256)))

    ref = spspmm(X, 1, A, 0, aggr, acd=acd_p, tarX=X)

    mesh = make_mesh((8,), ("sp",))
    run = make_tuple_parallel_spspmm(mesh, aggr)
    got = run(X, A, acd_p)
    assert maxdiff(got.values, ref.values) < 1e-5


def test_partitioned_tuple_parallel_matches_spspmm(rng):
    """v2 partitioned-values path (boundary-pool all_gather) == spspmm."""
    from pygho_tpu.parallel.tuple_parallel import (build_tuple_shard_plan,
                                                   make_partitioned_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_tuple_shard_plan(acd_p, X.nnz_pad, 8)
    assert plan.Bnd >= 1
    run = make_partitioned_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5


def test_overlapped_tuple_parallel_matches_spspmm(rng):
    from pygho_tpu.parallel.tuple_parallel import (
        build_overlapped_shard_plan, make_overlapped_spspmm)
    from utils import random_sparse

    n, d = 16, 8
    X, dX, indX, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    A, dA, indA, _ = random_sparse(rng, (n, n), 0.5, (d,), nnz_pad=256)
    tar, bcd = indexing.spspmm_ind(indX, 1, indA, 0)
    acd = indexing.filterind(indX, tar, bcd)
    acd_p = indexing.pad_acd(acd, indexing.bucket_size(acd.shape[1], 256))
    ref = spspmm(X, 1, A, 0, "sum", acd=jnp.asarray(acd_p), tarX=X)

    mesh = make_mesh((8,), ("sp",))
    plan = build_overlapped_shard_plan(acd_p, X.nnz_pad, 8)
    run = make_overlapped_spspmm(mesh, plan)
    got = run(X.values, A.values)
    assert maxdiff(got, ref.values) < 1e-5
