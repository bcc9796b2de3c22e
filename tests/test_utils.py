"""Aux subsystem tests: config, metrics, checkpoint, debugging."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from pygho_tpu.utils import (ExperimentConfig, ModelConfig, TrainConfig,
                             MetricsLogger, save_checkpoint,
                             restore_checkpoint, nan_guard,
                             check_determinism)
from pygho_tpu.models import make_sp_model
from pygho_tpu.models.training import make_optimizer


def test_config_roundtrip():
    cfg = ExperimentConfig(model=ModelConfig(conv="PPGN", norm="ln"),
                           train=TrainConfig(lr=5e-4, K=1.0))
    c2 = ExperimentConfig.from_json(cfg.to_json())
    assert c2.model.conv == "PPGN"
    assert c2.model.mlp_dict()["norm"] == "ln"
    assert c2.train.K == 1.0


def test_metrics_jsonl(tmp_path):
    p = str(tmp_path / "m.jsonl")
    ml = MetricsLogger(p, echo=False)
    ml.log_epoch(3, 1.0, 0.5, 0.2, 0.9, 0.8, 0.7, lr=1e-3)
    ml.log({"type": "custom", "x": 1})
    ml.close()
    recs = [json.loads(l) for l in open(p)]
    assert recs[0]["epoch"] == 3 and recs[0]["lr"] == 1e-3
    assert recs[1]["type"] == "custom"


def test_checkpoint_roundtrip(tmp_path):
    m1 = make_sp_model("NGNN", num_layer=1, hiddim=8, seed=1,
                       mlp={"norm": "none"})
    o1 = make_optimizer(m1, 1e-3)
    save_checkpoint(str(tmp_path), m1, o1, step=3)
    m2 = make_sp_model("NGNN", num_layer=1, hiddim=8, seed=2,
                       mlp={"norm": "none"})
    o2 = make_optimizer(m2, 1e-3)
    step = restore_checkpoint(str(tmp_path), m2, o2)
    assert step == 3
    p1 = jax.tree.leaves(nnx.state(m1, nnx.Param))
    p2 = jax.tree.leaves(nnx.state(m2, nnx.Param))
    for a, b in zip(p1, p2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_nan_guard():
    g = nan_guard(lambda x: jnp.log(x), "log")
    err, _ = jax.jit(g)(jnp.asarray([1.0]))
    assert err.get() is None
    err, _ = jax.jit(g)(jnp.asarray([-1.0]))
    assert err.get() is not None


def test_check_determinism():
    assert check_determinism(jax.jit(lambda x: (x @ x).sum()),
                             jnp.ones((16, 16)))


def test_batchnorm_recalibration():
    """Running stats re-estimated over batches equal the batch stats for
    a single repeated batch -> eval == train mode."""
    import jax.numpy as jnp

    from pygho_tpu.honn.utils import BatchNorm, recalibrate_batchnorm

    bn = BatchNorm(4, normparam=0.1, rngs=nnx.Rngs(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(32, 4))
                    .astype(np.float32))
    train_out = bn(x)          # uses batch stats; running stats lag
    wrap = nnx.Dict(bn=bn)     # recalibrate walks a module tree
    recalibrate_batchnorm(wrap, [x], lambda m, b: m["bn"](b))
    bn.use_running_average = True
    eval_out = bn(x)
    assert np.abs(np.asarray(train_out) - np.asarray(eval_out)).max() < 1e-5


def test_model_from_config():
    from pygho_tpu.models import make_model_from_config
    from pygho_tpu.honn import parse_precomputekey

    cfg = ExperimentConfig(model=ModelConfig(conv="SSWL", hiddim=16,
                                             num_layer=2, norm="ln"))
    m = make_model_from_config(cfg)
    assert len(parse_precomputekey(m)) == 2
    cfg2 = ModelConfig(conv="PPGN", sparse=False, hiddim=16, num_layer=1)
    m2 = make_model_from_config(cfg2)
    assert m2 is not None


def test_compile_counter_and_bucket_events():
    """Telemetry primitives (VERDICT r1 #10): CompileCounter counts XLA
    backend compiles via jax.monitoring; Buckets records growth events
    and drains them."""
    import jax
    import jax.numpy as jnp

    from pygho_tpu.hodata.loader import Buckets
    from pygho_tpu.utils.metrics import CompileCounter

    cc = CompileCounter()
    base = cc.count
    jax.jit(lambda x: x * 3 + 1)(jnp.ones((5, 7)))
    assert cc.count >= base + 1
    d = cc.delta()
    assert d >= 1
    assert cc.delta() == 0          # no compiles since
    jax.jit(lambda x: x - 2)(jnp.ones((3,)))
    assert cc.delta() >= 1

    b = Buckets()
    b["tuples"] = 128
    b["tuples"] = 64                # shrink attempt: monotone, no event
    b["tuples"] = 256
    assert b["tuples"] == 256
    ev = b.drain_events()
    assert ("tuples", 0, 128) in ev and ("tuples", 128, 256) in ev
    assert all(old < new for _, old, new in ev)
    assert b.drain_events() == []
