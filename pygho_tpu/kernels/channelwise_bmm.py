"""Channel-wise batched dense matmul kernel (Pallas TPU).

The dense-mode 2FWL/PPGN product (reference pygho/backend/Mamamm.py:35-64
with per-channel features) is

    out[b, i, j, d] = sum_k A[b, i, k, d] * X[b, k, j, d]

i.e. an independent (n, n) @ (n, n) matmul per (batch, channel).  With
molecule-scale n (~30-50 padded), XLA's einsum route transposes both
operands to (b, d, n, n) — two full HBM relayout passes — before a
batched matmul at tiny-tile MXU utilization: measured 2.29 ms for a
(128, 40, 40, 128) ZINC-scale batch on v5e.

This kernel keeps the (n, n, d) layout — d stays on the 128-wide lane
dimension where it is already contiguous — and contracts on the VPU
with n unrolled broadcast-FMAs per graph (one grid step per graph):

    acc[i, j, :] += A[i, k, :] * X[k, j, :]      (k static, unrolled)

Measured 1.45 ms on the same batch — 1.6x over the einsum, with no HBM
relayouts.  (An MXU variant using in-VMEM (d, n, n) transposes measured
0.90 ms but its relayout scratch sits at the 16 MB VMEM ceiling and
compiles only intermittently — rejected.)

Training runs the kernel for the primal AND both gradients (the
gradients are themselves channel-wise bmms of n-transposed operands, so
d stays on the lanes and no (b, d, n, n) relayout exists anywhere in
the step).  Measured on the full chained PPGN train step
(runs/dense_ablate_r4.json, v5e): all-kernel 13.16 ms vs all-einsum
16.80 ms — 1.28x.  The historical half-and-half configuration (kernel
forward + einsum backward) measured *slower* than pure einsum because
the einsum gradients want the (b, d, n, n) relayouts the kernel primal
refused to materialize; it remains available via
``set_cw_train_kernel(False)`` which restores the all-einsum train
path (einsum primal so XLA shares the relayouts across the three
contractions).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# VMEM budget gate: double-buffered (n, n, d) f32 blocks x 3.
_MAX_BLOCK_BYTES = 4 * 1024 * 1024


def _cw_kernel(n: int):
    def kernel(a_ref, b_ref, o_ref):
        A = a_ref[0].astype(jnp.float32)          # (n, n, d)
        B = b_ref[0].astype(jnp.float32)
        acc = A[:, 0, :][:, None, :] * B[0, :, :][None, :, :]
        for k in range(1, n):
            acc = acc + A[:, k, :][:, None, :] * B[k, :, :][None, :, :]
        o_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cw_bmm_raw(A: jax.Array, B: jax.Array,
                interpret: Optional[bool] = None) -> jax.Array:
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Bsz, n, n2, d = A.shape
    assert n == n2 and B.shape == A.shape, (A.shape, B.shape)
    blk = lambda i: (i, 0, 0, 0)
    return pl.pallas_call(
        _cw_kernel(n),
        grid=(Bsz,),
        in_specs=[pl.BlockSpec((1, n, n, d), blk),
                  pl.BlockSpec((1, n, n, d), blk)],
        out_specs=pl.BlockSpec((1, n, n, d), blk),
        out_shape=jax.ShapeDtypeStruct((Bsz, n, n, d), jnp.float32),
        interpret=interpret,
    )(A, B)


def _cw_einsum(A, X):
    return jnp.einsum("bikd,bkjd->bijd", A, X,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def channelwise_bmm(A: jax.Array, X: jax.Array,
                    interpret: Optional[bool] = None) -> jax.Array:
    """out[b,i,j,d] = sum_k A[b,i,k,d] * X[b,k,j,d], f32 output.

    Outside differentiation (inference/serving) this runs the Pallas
    kernel; under ``jax.grad`` the whole contraction stays on the einsum
    path (see module docstring for why)."""
    return _cw_bmm_raw(A, X, interpret)


# Training-path mode: True (default) runs the Pallas kernel for the
# primal AND both gradients (the gradients are themselves channel-wise
# bmms of n-transposed operands, and the (n, n) swap keeps d on the
# lanes — no (b, d, n, n) relayout; 13.16 vs 16.80 ms on the chained
# PPGN step, runs/dense_ablate_r4.json).  False restores the all-einsum
# train path (einsum primal+backward so XLA shares the (b, d, n, n)
# relayouts across the three contractions).
_TRAIN_KERNEL = True


def set_cw_train_kernel(on: bool) -> None:
    """Select the training-path implementation (see _TRAIN_KERNEL note).

    Call BEFORE the first traced train step: the flag is read at trace
    time, so an already-compiled step keeps executing the path it was
    traced with (the same set-before-trace contract as
    ``set_channelwise_bmm`` / ``set_fused_math``)."""
    global _TRAIN_KERNEL
    _TRAIN_KERNEL = bool(on)


def _cw_fwd(A, X, interpret):
    if _TRAIN_KERNEL:
        return _cw_bmm_raw(A, X, interpret), (A, X)
    # einsum primal so XLA shares the (b, d, n, n) relayouts with the
    # two gradient einsums below
    return _cw_einsum(A, X), (A, X)


def _cw_bwd(interpret, res, g):
    A, X = res
    g = g.astype(jnp.float32)
    if _TRAIN_KERNEL:
        # dA[b,i,k,d] = sum_j g[b,i,j,d] X[b,k,j,d]  = cw(g, X^T)
        # dX[b,k,j,d] = sum_i A[b,i,k,d] g[b,i,j,d]  = cw(A^T, g)
        dA = _cw_bmm_raw(g, X.astype(jnp.float32).swapaxes(1, 2),
                         interpret)
        dX = _cw_bmm_raw(A.astype(jnp.float32).swapaxes(1, 2), g,
                         interpret)
        return dA.astype(A.dtype), dX.astype(X.dtype)
    dA = jnp.einsum("bijd,bkjd->bikd", g, X.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dX = jnp.einsum("bikd,bijd->bkjd", A.astype(jnp.float32), g,
                    preferred_element_type=jnp.float32)
    return dA.astype(A.dtype), dX.astype(X.dtype)


channelwise_bmm.defvjp(_cw_fwd, _cw_bwd)


def cw_bmm_applicable(a_shape, b_shape, dtype_a, dtype_b) -> bool:
    """Shape/size gate for routing mamamm through the kernel: 4-D
    (b, n, n, d) operands, d a lane multiple, block under the VMEM
    budget, float inputs."""
    if len(a_shape) != 4 or tuple(a_shape) != tuple(b_shape):
        return False
    _, n, n2, d = a_shape
    if n != n2 or d % 128 != 0:
        return False
    if n * n * d * 4 > _MAX_BLOCK_BYTES:
        return False
    return all(dt in (jnp.float32, jnp.bfloat16)
               for dt in (dtype_a, dtype_b))
