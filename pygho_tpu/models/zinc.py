"""ZINC-style HOGNN models, sparse and masked-dense
(reference example/minimal.py:22-85 and example/zinc.py:58-294).

The model consumes the loader's collated batch dict: call
``batch_to_sparse_dict`` / ``batch_to_dense_dict`` first (jit-safe), then
``model(datadict)``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from ..backend.sptensor import SparseTensor
from ..backend.matensor import MaskedTensor
from ..backend.segment import segment_reduce
from ..honn import tensorop as TensorOp
from ..honn import conv as Conv
from ..honn.utils import MLP


class InputEncoderSp(nnx.Module):
    """Categorical encoders for node / edge / tuple features
    (reference example/minimal.py:22-34)."""

    def __init__(self, hiddim: int, *, rngs: nnx.Rngs,
                 num_x: int = 32, num_ea: int = 16, num_tf: int = 16):
        self.x_encoder = nnx.Embed(num_x, hiddim, rngs=rngs)
        self.ea_encoder = nnx.Embed(num_ea, hiddim, rngs=rngs)
        self.tuplefeat_encoder = nnx.Embed(num_tf, hiddim, rngs=rngs)

    def __call__(self, datadict: Dict) -> Dict:
        datadict = dict(datadict)
        x = datadict["x"]
        datadict["x"] = self.x_encoder(x.reshape(x.shape[0], -1)[:, 0])
        if datadict["A"].values is not None:
            datadict["A"] = datadict["A"].tuplewiseapply(
                lambda v: self.ea_encoder(v.reshape(v.shape[0])))
        datadict["X"] = datadict["X"].tuplewiseapply(
            lambda v: self.tuplefeat_encoder(v.reshape(v.shape[0])))
        return datadict


class InputEncoderI2(nnx.Module):
    """3-tuple encoder: sums embeddings of (spd_u, spd_v)
    (reference example/zinc.py:91-104)."""

    def __init__(self, hiddim: int, *, rngs: nnx.Rngs,
                 num_x: int = 32, num_ea: int = 16, num_tf: int = 16):
        self.x_encoder = nnx.Embed(num_x, hiddim, rngs=rngs)
        self.ea_encoder = nnx.Embed(num_ea, hiddim, rngs=rngs)
        self.tuplefeat_encoder1 = nnx.Embed(num_tf, hiddim, rngs=rngs)
        self.tuplefeat_encoder2 = nnx.Embed(num_tf, hiddim, rngs=rngs)

    def __call__(self, datadict: Dict) -> Dict:
        datadict = dict(datadict)
        x = datadict["x"]
        datadict["x"] = self.x_encoder(x.reshape(x.shape[0], -1)[:, 0])
        if datadict["A"].values is not None:
            datadict["A"] = datadict["A"].tuplewiseapply(
                lambda v: self.ea_encoder(v.reshape(v.shape[0])))
        datadict["X"] = datadict["X"].tuplewiseapply(
            lambda v: self.tuplefeat_encoder1(v[:, 0]) +
            self.tuplefeat_encoder2(v[:, 1]))
        return datadict


class InputEncoderMa(nnx.Module):
    """(reference example/zinc.py:58-72); the adjacency embedding zeroes
    non-edges via the mask rather than padding_idx."""

    def __init__(self, hiddim: int, *, rngs: nnx.Rngs,
                 num_x: int = 32, num_ea: int = 16, num_tf: int = 16):
        self.x_encoder = nnx.Embed(num_x, hiddim, rngs=rngs)
        self.ea_encoder = nnx.Embed(num_ea, hiddim, rngs=rngs)
        self.tuplefeat_encoder = nnx.Embed(num_tf, hiddim, rngs=rngs)

    def __call__(self, datadict: Dict) -> Dict:
        datadict = dict(datadict)
        x: MaskedTensor = datadict["x"]
        datadict["x"] = MaskedTensor(
            self.x_encoder(x.data[..., 0]), x.mask)
        A = datadict["A"]
        if isinstance(A, MaskedTensor):
            datadict["A"] = MaskedTensor(
                self.ea_encoder(A.data.astype(jnp.int32)), A.mask)
        else:  # sparse batched adjacency ("SD" mode)
            datadict["A"] = A.tuplewiseapply(
                lambda v: self.ea_encoder(v.reshape(v.shape[0])))
        X: MaskedTensor = datadict["X"]
        datadict["X"] = MaskedTensor(
            self.tuplefeat_encoder(X.data.astype(jnp.int32)), X.mask)
        return datadict


def _sp_convdict(rngs, aggr, cpool, mlp):
    """Sparse conv factories (reference example/zinc.py:107-131)."""
    return {
        "NGNN": lambda d: Conv.NGNNConv(d, d, aggr, "SS", mlp, rngs=rngs),
        "SSWL": lambda d: Conv.SSWLConv(d, d, aggr, "SS", mlp, rngs=rngs),
        "DSSGNN": lambda d: Conv.DSSGNNConv(
            d, d, aggr, aggr, cpool, "SS", mlp, rngs=rngs),
        "GNNAK": lambda d: Conv.GNNAKConv(
            d, d, aggr, cpool, "SS", mlp, mlp, rngs=rngs),
        "SUN": lambda d: Conv.SUNConv(
            d, d, aggr, cpool, "SS", mlp, mlp, rngs=rngs),
        "PPGN": lambda d: Conv.PPGNConv(d, d, aggr, "SS", mlp, rngs=rngs),
        "I2GNN": lambda d: Conv.I2Conv(d, d, aggr, "SS", mlp, rngs=rngs),
        "NGAT": lambda d: Conv.NGATConv(d, d, aggr, "SS", mlp, rngs=rngs),
    }


def _ma_convdict(rngs, aggr, cpool, mlp, mode="DD"):
    """Dense conv factories (reference example/zinc.py:133-152).  mode
    "DD" = dense adjacency (einsum path, sum aggr); "SD" = sparse batched
    adjacency with dense tuples (spmamm path, any aggr)."""
    a = aggr if mode == "SD" else "sum"
    return {
        "NGNN": lambda d: Conv.NGNNConv(d, d, a, mode, mlp, rngs=rngs),
        "SSWL": lambda d: Conv.SSWLConv(d, d, a, mode, mlp, rngs=rngs),
        "DSSGNN": lambda d: Conv.DSSGNNConv(
            d, d, a, a, cpool, mode, mlp, rngs=rngs),
        "GNNAK": lambda d: Conv.GNNAKConv(
            d, d, a, cpool, mode, mlp, mlp, rngs=rngs),
        "SUN": lambda d: Conv.SUNConv(
            d, d, a, cpool, mode, mlp, mlp, rngs=rngs),
        "PPGN": lambda d: Conv.PPGNConv(d, d, a, "DD", mlp, rngs=rngs),
        "I2GNN": lambda d: Conv.I2Conv(d, d, a, mode, mlp, rngs=rngs),
    }


class SpModel(nnx.Module):
    """Sparse HOGNN for graph regression (reference example/zinc.py:225-294).

    forward(datadict) -> (num_graphs, num_tasks)
    """

    def __init__(self, conv: str = "NGNN", num_tasks: int = 1,
                 num_layer: int = 6, hiddim: int = 128, aggr: str = "sum",
                 npool: str = "sum", lpool: str = "mean",
                 cpool: str = "mean", residual: bool = True,
                 outlayer: int = 2, mlp: Optional[dict] = None,
                 dtype=None, remat: bool = False, *, rngs: nnx.Rngs):
        mlp = dict(mlp or {})
        mlp.setdefault("numlayer", 1)
        mlp.setdefault("tailact", True)
        if dtype is not None:   # mixed precision: bf16 compute, f32 params
            mlp.setdefault("dtype", dtype)
        self.dtype = dtype
        # rematerialize layer activations in the backward pass: trades
        # recompute for HBM traffic/footprint (the step is traffic-bound)
        self.remat = remat
        self.conv_name = conv
        self.is3d = conv == "I2GNN"
        self.hiddim = hiddim
        self.num_tasks = num_tasks
        self.residual = residual
        self.npool = npool

        self.lin_tupleinit0 = nnx.Linear(hiddim, hiddim, dtype=dtype,
                                         rngs=rngs)
        self.lin_tupleinit1 = nnx.Linear(hiddim, hiddim, dtype=dtype,
                                         rngs=rngs)
        if self.is3d:
            self.lin_tupleinit2 = nnx.Linear(hiddim, hiddim, dtype=dtype,
                                             rngs=rngs)

        convdict = _sp_convdict(rngs, aggr, cpool, mlp)
        if conv not in convdict:
            raise ValueError(
                f"unknown conv {conv!r}; available: "
                f"{sorted(convdict)}")
        factory = convdict[conv]
        self.subggnns = nnx.List([factory(hiddim) for _ in range(num_layer)])

        if self.is3d:
            self.lpool3 = TensorOp.OpPoolingSubg3D("S", lpool)
            self.lpool2 = TensorOp.OpPoolingSubg2D("S", lpool)
        else:
            self.lpool = TensorOp.OpPoolingSubg2D("S", lpool)
        self.poolmlp = MLP(hiddim, hiddim, 1, tailact=True, rngs=rngs,
                           **{k: v for k, v in mlp.items()
                              if k not in ("numlayer", "tailact")})
        self.data_encoder = (InputEncoderI2(hiddim, rngs=rngs) if self.is3d
                             else InputEncoderSp(hiddim, rngs=rngs))
        self.out_f32 = lambda x: x.astype(jnp.float32)
        self.pred_lin = MLP(hiddim, num_tasks, outlayer, tailact=False,
                            rngs=rngs,
                            **{k: v for k, v in mlp.items()
                               if k not in ("numlayer", "tailact")})

    def tupleinit(self, X: SparseTensor, x: jax.Array) -> SparseTensor:
        """X_ij <- W0 x_i * W1 x_j (* W2 x_j for 3-tuples) * X_ij
        (reference example/zinc.py:276-282)."""
        t0 = self.lin_tupleinit0(x)[jnp.minimum(X.indices[0], x.shape[0] - 1)]
        t1 = self.lin_tupleinit1(x)[jnp.minimum(X.indices[1], x.shape[0] - 1)]
        if self.is3d:
            # reference quirk kept for parity: example/zinc.py:282 also
            # gathers lin_tupleinit2 at indices[1] (not [2]) — the third
            # node never enters the init product
            t2 = self.lin_tupleinit2(x)[
                jnp.minimum(X.indices[1], x.shape[0] - 1)]
            return X.tuplewiseapply(lambda v: t0 * t1 * t2 * v)
        return X.tuplewiseapply(lambda v: t0 * t1 * v)

    def encode_init(self, datadict: Dict):
        """Stage-0 prologue: encoder + dtype cast + tupleinit.  Returns
        (datadict, A, X) — the inputs every conv layer consumes.  Split
        out of __call__ so pipeline parallelism can stage the conv stack
        (parallel/pipeline.py make_model_pipeline_step)."""
        datadict = self.data_encoder(datadict)
        A: SparseTensor = datadict["A"]
        X: SparseTensor = datadict["X"]
        x: jax.Array = datadict["x"]
        if self.dtype is not None:
            import dataclasses as _dc
            x = x.astype(self.dtype)
            A = _dc.replace(A, values=None if A.values is None
                            else A.values.astype(self.dtype))
            X = _dc.replace(X, values=X.values.astype(self.dtype))
        X = self.tupleinit(X, x)
        return datadict, A, X

    def readout(self, X: SparseTensor, datadict: Dict) -> jax.Array:
        """Last-stage epilogue: subgraph pool + node MLP + graph pool +
        prediction head."""
        if self.is3d:
            X2 = self.lpool3(X, datadict)
            xs = self.lpool2(X2)
        else:
            xs = self.lpool(X)
        node_mask = jnp.arange(xs.shape[0]) < datadict["num_nodes"]
        xs = self.poolmlp(xs, node_mask)
        num_graphs = datadict["graph_mask"].shape[0]
        h_graph = segment_reduce(xs, datadict["batch"], num_graphs,
                                 self.npool, indices_are_sorted=True)
        return self.pred_lin(h_graph).astype(jnp.float32)

    def __call__(self, datadict: Dict) -> jax.Array:
        datadict, A, X = self.encode_init(datadict)
        for conv in self.subggnns:
            if self.remat:
                tX = nnx.remat(
                    lambda c, A, X, dd: c(A, X, dd))(conv, A, X, datadict)
            else:
                tX = conv(A, X, datadict)
            X = X.add(tX, True) if self.residual else tX
        return self.readout(X, datadict)

    forward = __call__


class SpPipelineTrunk(nnx.Module):
    """The replicated (non-staged) part of an :class:`SpModel` for
    pipeline parallelism: encoder, tupleinit, pools, heads — everything
    but the conv stack, sharing the SAME parameter objects as the source
    model, so ``nnx.split(trunk)`` yields a state pytree without any
    conv weights (those are stage-sharded separately)."""

    def __init__(self, model: SpModel):
        self.data_encoder = model.data_encoder
        self.lin_tupleinit0 = model.lin_tupleinit0
        self.lin_tupleinit1 = model.lin_tupleinit1
        self.is3d = model.is3d
        if model.is3d:
            self.lin_tupleinit2 = model.lin_tupleinit2
            self.lpool3 = model.lpool3
            self.lpool2 = model.lpool2
        else:
            self.lpool = model.lpool
        self.poolmlp = model.poolmlp
        self.pred_lin = model.pred_lin
        self.npool = model.npool
        self.dtype = model.dtype
        self.residual = model.residual

    # same prologue/epilogue logic as the full model (duck-typed: these
    # unbound methods only touch attributes the trunk carries)
    tupleinit = SpModel.tupleinit
    encode_init = SpModel.encode_init
    readout = SpModel.readout


class MaModel(nnx.Module):
    """Masked-dense HOGNN (reference example/zinc.py:155-222)."""

    def __init__(self, conv: str = "NGNN", num_tasks: int = 1,
                 num_layer: int = 6, hiddim: int = 128, aggr: str = "sum",
                 npool: str = "mean", lpool: str = "max",
                 cpool: str = "mean", residual: bool = True,
                 outlayer: int = 2, mlp: Optional[dict] = None,
                 mode: str = "DD", dtype=None, remat: bool = False,
                 *, rngs: nnx.Rngs):
        from ..honn import ma_operator as MaOperator

        assert mode in ("DD", "SD")
        mlp = dict(mlp or {})
        mlp.setdefault("numlayer", 1)
        mlp.setdefault("tailact", True)
        if dtype is not None:   # mixed precision: bf16 compute, f32 params
            mlp.setdefault("dtype", dtype)
        self.dtype = dtype
        # layer-level rematerialization: the dense-DD train step is
        # HBM-bound (r5 cost analysis: 16.8 GB accessed vs 64.9 GFLOP =
        # 0.33 ms of MXU — recompute is effectively free), so dropping
        # per-layer intermediates from the backward tape trades traffic
        # the step can't afford for FLOPs it can (same rationale as
        # SpModel(remat=True), BENCHMARKS "Rematerialization")
        self.remat = remat
        self.hiddim = hiddim
        self.residual = residual

        self.lin_tupleinit0 = nnx.Linear(hiddim, hiddim, dtype=dtype,
                                         rngs=rngs)
        self.lin_tupleinit1 = nnx.Linear(hiddim, hiddim, dtype=dtype,
                                         rngs=rngs)
        convdict = _ma_convdict(rngs, aggr, cpool, mlp, mode)
        if conv not in convdict:
            raise ValueError(
                f"unknown conv {conv!r}; available: "
                f"{sorted(convdict)}")
        factory = convdict[conv]
        self.subggnns = nnx.List([factory(hiddim) for _ in range(num_layer)])
        self.npool_op = MaOperator.OpPooling(1, pool=npool)
        self.lpool_op = TensorOp.OpPoolingSubg2D("D", lpool)
        self.poolmlp = MLP(hiddim, hiddim, 1, tailact=True, rngs=rngs,
                           **{k: v for k, v in mlp.items()
                              if k not in ("numlayer", "tailact")})
        self.data_encoder = InputEncoderMa(hiddim, rngs=rngs)
        self.pred_lin = MLP(hiddim, num_tasks, outlayer, tailact=False,
                            rngs=rngs,
                            **{k: v for k, v in mlp.items()
                               if k not in ("numlayer", "tailact")})

    def tupleinit(self, X: MaskedTensor, x: MaskedTensor) -> MaskedTensor:
        t0 = self.lin_tupleinit0(x.fill_masked(0.0))
        t1 = self.lin_tupleinit1(x.fill_masked(0.0))
        return X.tuplewiseapply(
            lambda v: t0[:, :, None, :] * t1[:, None, :, :] * v)

    def __call__(self, datadict: Dict) -> jax.Array:
        datadict = self.data_encoder(datadict)
        A = datadict["A"]
        X: MaskedTensor = datadict["X"]
        x: MaskedTensor = datadict["x"]
        if self.dtype is not None:
            # bf16-dense training: the (b,n,n,d) einsums/channelwise
            # matmuls run at the MXU's bf16 rate, params/BN stay f32
            # (the dense analog of the sparse model's dtype path)
            x = MaskedTensor(x.data.astype(self.dtype), x.mask)
            X = MaskedTensor(X.data.astype(self.dtype), X.mask)
            if isinstance(A, MaskedTensor):
                A = MaskedTensor(A.data.astype(self.dtype), A.mask)
            else:   # SD mode: sparse batched adjacency
                import dataclasses as _dc
                A = _dc.replace(A, values=None if A.values is None
                                else A.values.astype(self.dtype))
        X = self.tupleinit(X, x)
        for conv in self.subggnns:
            if self.remat:
                tX = nnx.remat(
                    lambda c, A, X, dd: c(A, X, dd))(conv, A, X, datadict)
            else:
                tX = conv(A, X, datadict)
            X = X.add(tX, True) if self.residual else tX
        xm = self.lpool_op(X)
        xm = xm.tuplewiseapply(lambda v: self.poolmlp(v, xm.mask))
        h_graph = self.npool_op(xm).fill_masked(0.0)
        return self.pred_lin(h_graph).astype(jnp.float32)

    forward = __call__


def make_sp_model(conv: str = "NGNN", seed: int = 0, **kw) -> SpModel:
    return SpModel(conv, rngs=nnx.Rngs(seed), **kw)


def make_ma_model(conv: str = "NGNN", seed: int = 0, **kw) -> MaModel:
    return MaModel(conv, rngs=nnx.Rngs(seed), **kw)


def make_model_from_config(cfg, seed: int = 0):
    """Build the model described by a utils.config.ExperimentConfig (or
    ModelConfig) — the typed equivalent of the reference's argparse
    surface (example/zinc.py:306-308)."""
    mc = getattr(cfg, "model", cfg)
    kw = dict(num_tasks=mc.num_tasks, num_layer=mc.num_layer,
              hiddim=mc.hiddim, npool=mc.npool, lpool=mc.lpool,
              cpool=mc.cpool, residual=mc.residual, outlayer=mc.outlayer,
              mlp=mc.mlp_dict(), seed=seed)
    if mc.sparse:
        return make_sp_model(mc.conv, aggr=mc.aggr, **kw)
    return make_ma_model(mc.conv, aggr=mc.aggr, **kw)
