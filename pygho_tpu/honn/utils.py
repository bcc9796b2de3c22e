"""NN building blocks: masked norms + MLP (reference pygho/honn/utils.py).

The reference's MLP applies BatchNorm over the flattened (nnz, d) value
rows (honn/utils.py:44-60).  On TPU the value arrays are *padded*, so the
norms here are mask-aware: statistics are computed over real rows only.
Modules follow flax.nnx conventions — ``model.train()`` / ``model.eval()``
flip ``deterministic`` / ``use_running_average`` flags.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import nnx


class NoneNorm(nnx.Module):
    """Identity placeholder (reference honn/utils.py:35-41)."""

    def __init__(self, dim: int = 0, normparam: float = 0.0, *, rngs=None):
        self.num_features = dim

    def __call__(self, x, mask=None):
        return x


class BatchNorm(nnx.Module):
    """Mask-aware batch normalization over flattened leading dims
    (reference honn/utils.py:44-60; torch momentum semantics:
    running <- (1 - m) * running + m * batch)."""

    def __init__(self, dim: int, normparam: float = 0.1, *,
                 rngs: Optional[nnx.Rngs] = None, eps: float = 1e-5):
        self.num_features = dim
        self.momentum = normparam
        self.eps = eps
        self.scale = nnx.Param(jnp.ones((dim,)))
        self.bias = nnx.Param(jnp.zeros((dim,)))
        self.mean = nnx.BatchStat(jnp.zeros((dim,)))
        self.var = nnx.BatchStat(jnp.ones((dim,)))
        self.use_running_average = False

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)  # statistics in f32 for stability
        d = x.shape[-1]
        if self.use_running_average:
            mean, var = self.mean[...], self.var[...]
        else:
            rows = x.reshape(-1, d)
            if mask is None:
                mean = rows.mean(0)
                var = rows.var(0)
            else:
                m = jnp.broadcast_to(
                    mask.reshape(mask.shape + (1,) * (x.ndim - 1 - mask.ndim)),
                    x.shape[:-1]).reshape(-1, 1).astype(x.dtype)
                cnt = jnp.maximum(m.sum(), 1.0)
                mean = (rows * m).sum(0) / cnt
                var = (((rows - mean) ** 2) * m).sum(0) / cnt
            self.mean[...] = (1 - self.momentum) * self.mean[...] + \
                self.momentum * mean
            self.var[...] = (1 - self.momentum) * self.var[...] + \
                self.momentum * var
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x - mean) * inv * self.scale[...] + self.bias[...]
        return out.astype(in_dtype)


class LayerNorm(nnx.Module):
    """Last-dim layer norm (reference honn/utils.py:63-70)."""

    def __init__(self, dim: int, normparam: float = 0.1, *,
                 rngs: Optional[nnx.Rngs] = None, eps: float = 1e-5):
        self.num_features = dim
        self.eps = eps
        self.scale = nnx.Param(jnp.ones((dim,)))
        self.bias = nnx.Param(jnp.zeros((dim,)))

    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None):
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        out = (x - mean) * jax.lax.rsqrt(var + self.eps) * \
            self.scale[...] + self.bias[...]
        return out.astype(in_dtype)


normdict = {"bn": BatchNorm, "ln": LayerNorm, "none": NoneNorm}

act_dict: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "ELU": jax.nn.elu,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
}


class MLP(nnx.Module):
    """Multi-layer perceptron (reference honn/utils.py:85-142).

    Layer stack (numlayer >= 1):
      [Linear(hid->hid), Norm, Dropout?, Act] * (numlayer - 1)
      Linear(hid->out)  [+ Norm, Dropout?, Act if tailact]

    numlayer == 0 is the identity (requires hiddim == outdim).
    All calls accept an optional row-validity ``mask`` forwarded to norms.
    """

    def __init__(self, hiddim: int, outdim: int, numlayer: int,
                 tailact: bool, dp: float = 0.0, norm: str = "bn",
                 act: str = "relu", tailbias: bool = True,
                 normparam: float = 0.1, dtype=None, *, rngs: nnx.Rngs):
        assert numlayer >= 0
        self.numlayer = numlayer
        self.tailact = tailact
        self.act = act_dict[act]
        self.dp = dp
        # dtype = compute dtype (e.g. jnp.bfloat16 for mixed precision);
        # params stay f32
        self.dtype = dtype
        if numlayer == 0:
            assert hiddim == outdim
            self.hid_lins = nnx.List([])
            self.hid_norms = nnx.List([])
            self.hid_dps = nnx.List([])
            self.tail_lin = None
            return
        self.hid_lins = nnx.List(
            [nnx.Linear(hiddim, hiddim, dtype=dtype, rngs=rngs)
             for _ in range(numlayer - 1)])
        self.hid_norms = nnx.List(
            [normdict[norm](hiddim, normparam, rngs=rngs)
             for _ in range(numlayer - 1)])
        self.hid_dps = nnx.List(
            [nnx.Dropout(dp, rngs=rngs) for _ in range(numlayer - 1)]
            if dp > 0 else [])
        self.tail_lin = nnx.Linear(hiddim, outdim, use_bias=tailbias,
                                   dtype=dtype, rngs=rngs)
        if tailact:
            self.tail_norm = normdict[norm](outdim, normparam, rngs=rngs)
            self.tail_dp = nnx.Dropout(dp, rngs=rngs) if dp > 0 else None

    def __call__(self, x: jax.Array, mask=None) -> jax.Array:
        for i, lin in enumerate(self.hid_lins):
            x = lin(x)
            x = self.hid_norms[i](x, mask)
            if self.dp > 0:
                x = self.hid_dps[i](x)
            x = self.act(x)
        if self.tail_lin is None:
            return x
        x = self.tail_lin(x)
        if self.tailact:
            x = self.tail_norm(x, mask)
            if self.tail_dp is not None:
                x = self.tail_dp(x)
            x = self.act(x)
        return x


class HeteroLinear(nnx.Module):
    """Type-conditional linear map (used by SUNConv's diagonal-vs-
    offdiagonal routing, reference honn/Conv.py:345,360-361 via
    torch_geometric.nn.HeteroLinear): out = x @ W[type] + b[type],
    realized as a dense two-weight einsum + select — no gather of weight
    matrices, MXU-friendly."""

    def __init__(self, indim: int, outdim: int, num_types: int,
                 use_bias: bool = True, *, rngs: nnx.Rngs):
        init = nnx.initializers.lecun_normal()
        self.weight = nnx.Param(
            init(rngs.params(), (num_types, indim, outdim)))
        self.bias = nnx.Param(jnp.zeros((num_types, outdim))) if use_bias \
            else None
        self.num_types = num_types

    def __call__(self, x: jax.Array, types: jax.Array) -> jax.Array:
        # x: (..., indim), types: int (...,)
        outs = jnp.einsum("...i,tio->...to", x, self.weight[...])
        onehot = jax.nn.one_hot(types, self.num_types, dtype=x.dtype)
        out = jnp.einsum("...to,...t->...o", outs, onehot)
        if self.bias is not None:
            out = out + jnp.einsum("to,...t->...o", self.bias[...], onehot)
        return out


class NormMomentumScheduler:
    """Epoch-wise momentum decay for batch norms
    (reference honn/utils.py:12-33)."""

    def __init__(self, mfunc: Callable[[int], float], initmomentum: float,
                 normtype=BatchNorm):
        self.normtype = normtype
        self.mfunc = mfunc
        self.epoch = 0
        self.initmomentum = initmomentum

    def step(self, model: nnx.Module) -> float:
        ratio = self.mfunc(self.epoch)
        self.epoch += 1
        if abs(ratio - 1.0) < 1e-6:
            return self.initmomentum
        curm = self.initmomentum * ratio
        for _, mod in nnx.iter_graph(model):
            if type(mod) is self.normtype:
                mod.momentum = curm
        return curm


def recalibrate_batchnorm(model, batches, forward):
    """Re-estimate BatchNorm running statistics by averaging batch stats
    over ``batches`` (the standard post-training BN re-estimation).

    ``forward(model, batch)`` runs the model's forward; it may be
    nnx.jit'd — the module attributes change exactly once before the
    sweep and once after, so at most two traces.  Cures eval-mode
    brittleness when training stats lag rapidly-changing weights
    (e.g. tiny transductive sets — see the sr25 example notes).
    """
    import numpy as np

    from flax import nnx

    bns = [mod for _, mod in nnx.iter_graph(model)
           if isinstance(mod, BatchNorm)]
    saved = [(bn.momentum, bn.use_running_average) for bn in bns]
    for bn in bns:
        bn.momentum = 1.0          # running stats := this batch's stats
        bn.use_running_average = False
    sums = None
    n = 0
    for batch in batches:
        forward(model, batch)
        stats = [(np.asarray(bn.mean[...]), np.asarray(bn.var[...]))
                 for bn in bns]
        if sums is None:
            sums = [(m.copy(), v.copy()) for m, v in stats]
        else:
            sums = [(sm + m, sv + v)
                    for (sm, sv), (m, v) in zip(sums, stats)]
        n += 1
    if n:
        for bn, (sm, sv) in zip(bns, sums):
            bn.mean[...] = jnp.asarray(sm / n)
            bn.var[...] = jnp.asarray(sv / n)
    for bn, (m, ura) in zip(bns, saved):
        bn.momentum = m
        bn.use_running_average = ura
    return n
