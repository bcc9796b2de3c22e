"""Serving-path tests: Predictor order/parity and jax.export round-trip.

Net-new surface (the reference has no serving story, SURVEY.md §2.5);
oracle = the jitted eval forward called directly on the same batches.
"""

import numpy as np
import pytest
from flax import nnx

from pygho_tpu.hodata import Sppretransform, Mapretransform, SpDataloader
from pygho_tpu.hodata.sp_data import batch_to_sparse_dict
from pygho_tpu.hodata.sp_sampler import KhopSampler
from pygho_tpu.hodata.ma_sampler import spdsampler
from pygho_tpu.hodata.datasets import synthetic_zinc
from pygho_tpu.honn import parse_precomputekey
from pygho_tpu.models import (make_sp_model, make_ma_model, SpPredictor,
                              MaPredictor, export_forward, ExportedForward)

MLPD = {"norm": "bn", "act": "silu", "dp": 0.0}


def test_sp_predictor_matches_direct_forward():
    model = make_sp_model("NGNN", num_layer=2, hiddim=16, mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("val", n_graphs=20)
    predictor = SpPredictor(model, KhopSampler, keys, batch_size=8)
    preds = predictor(graphs)
    assert preds.shape[0] == len(graphs)
    assert np.isfinite(preds).all()

    # oracle: run the same batches through the model directly, in order
    model.eval()
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, 8, keys, shuffle=False, drop_last=False,
                      device_put=False, prefetch=0)
    dl.buckets = predictor._buckets

    @nnx.jit
    def fwd(model, batch):
        return model(batch_to_sparse_dict(batch, ("",)))

    direct = []
    for batch in dl:
        out = np.asarray(fwd(model, batch))
        direct.append(out[: int(np.asarray(batch["graph_mask"]).sum())])
    direct = np.concatenate(direct, 0)
    assert np.abs(preds - direct).max() < 1e-5

    # second call reuses buckets and stays order-consistent
    again = predictor(graphs[:5])
    assert np.abs(again - preds[:5]).max() < 1e-5


def test_ma_predictor_runs_and_is_ordered():
    model = make_ma_model("NGNN", num_layer=2, hiddim=16, mlp=dict(MLPD))
    graphs = synthetic_zinc("val", n_graphs=12)
    predictor = MaPredictor(model, spdsampler, batch_size=4)
    preds = predictor(graphs)
    assert preds.shape[0] == len(graphs)
    assert np.isfinite(preds).all()
    # permuting the input permutes the output identically
    perm = np.random.default_rng(0).permutation(len(graphs))
    preds2 = predictor([graphs[i] for i in perm])
    assert np.abs(preds2 - preds[perm]).max() < 1e-5


def test_export_forward_roundtrip(tmp_path):
    model = make_sp_model("NGNN", num_layer=2, hiddim=16, mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("val", n_graphs=8)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, 8, keys, shuffle=False, drop_last=False,
                      device_put=False, prefetch=0)
    batch = next(iter(dl))

    path = str(tmp_path / "ngnn_fwd.stablehlo")
    export_forward(model, batch, path)

    model.eval()

    @nnx.jit
    def fwd(model, b):
        return model(batch_to_sparse_dict(b, ("",)))

    want = np.asarray(fwd(model, batch))

    import pygho_tpu.models.serve as serve
    loaded = serve.load_exported(path)
    got = loaded(batch)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-5

    # a second batch with the same bucket signature runs through the
    # same artifact
    graphs2 = synthetic_zinc("test", n_graphs=8)
    datas2 = [pre(g) for g in graphs2]
    dl2 = SpDataloader(datas2, 8, keys, shuffle=False, drop_last=False,
                       device_put=False, prefetch=0)
    dl2.buckets = dl.buckets
    batch2 = next(iter(dl2))
    got2 = loaded(batch2)
    want2 = np.asarray(fwd(model, batch2))
    assert np.abs(got2 - want2).max() < 1e-4


def test_export_with_fused_plans():
    """Batches carrying ChunkPlan pytrees serialize through jax.export
    (the registered ChunkPlan codec); interpret-mode kernel on CPU."""
    model = make_sp_model("NGNN", num_layer=2, hiddim=128, mlp=dict(MLPD))
    keys = parse_precomputekey(model)
    graphs = synthetic_zinc("val", n_graphs=8)
    pre = Sppretransform(KhopSampler, [""], keys)
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, 8, keys, shuffle=False, drop_last=False,
                      device_put=False, prefetch=0, build_plans=True,
                      plan_dim=128)
    batch = next(iter(dl))
    assert any(k.endswith("___plan") for k in batch), list(batch)

    blob = export_forward(model, batch)
    model.eval()

    @nnx.jit
    def fwd(model, b):
        return model(batch_to_sparse_dict(b, ("",)))

    want = np.asarray(fwd(model, batch))
    got = ExportedForward(blob)(batch)
    assert np.abs(got - want).max() < 1e-4


def test_export_with_pv_strip_plans():
    """StripPlan pytrees with a persistent-v schedule (the r4 v_sched
    data field) serialize through jax.export and reproduce the direct
    forward — guards the registered StripPlan codec against the new
    field."""
    import jax.numpy as jnp

    from pygho_tpu.backend.indexing import PAD_INDEX
    from pygho_tpu.kernels.strip_spspmm import (build_spspmm_strip_plans,
                                                fused_spspmm_strip)
    from jax import export as jexport

    rng = np.random.default_rng(3)
    K, n_out, n_u, n_v, D = 2048, 1024, 1024, 512, 128
    a = np.sort(rng.integers(0, n_out, K))
    c = rng.integers(0, n_u, K)
    d = (a // 256) * 128 + rng.integers(0, 128, K)   # windowable v
    acd = np.stack([a, c, d]).astype(np.int64)
    gpv = (256, 512, 128, 128, 512, 1, 16, 1)
    plans = build_spspmm_strip_plans(acd, n_u, n_v, n_out,
                                     {"fwd": gpv, "dx": gpv, "da": gpv})
    assert plans[0].v_persistent

    U = jnp.asarray(rng.normal(size=(n_u, D)).astype(np.float32))
    V = jnp.asarray(rng.normal(size=(n_v, D)).astype(np.float32))

    import jax

    fn = jax.jit(lambda u, v, p: fused_spspmm_strip(u, v, *p, True))
    exported = jexport.export(fn)(U, V, plans)
    blob = exported.serialize()
    relo = jexport.deserialize(blob)
    want = np.asarray(fn(U, V, plans))
    got = np.asarray(relo.call(U, V, plans))
    assert np.abs(got - want).max() < 1e-5
