"""Masked dense x masked dense contraction (reference pygho/backend/Mamamm.py:7-64).

On TPU this is the MXU-native path: a single ``jnp.einsum`` over 0-filled
data, batched over the batch dim and any shared dense dims, with
``preferred_element_type=float32`` so the MXU accumulates in f32 even for
bf16 inputs.  No movedim/flatten dance — we build the einsum spec from the
dims, which also avoids reference bug #3 (Mamamm.py:46-53, the discarded
``unsqueeze`` that breaks the masked_dim==1 path).
"""

from __future__ import annotations

import string

import jax
import jax.numpy as jnp

from .matensor import MaskedTensor

# toggle for the Pallas channel-wise product path (TPU only)
_CHANNELWISE = True


def set_channelwise_bmm(flag: bool) -> None:
    global _CHANNELWISE
    _CHANNELWISE = bool(flag)


def _use_channelwise() -> bool:
    return _CHANNELWISE


def mamamm(
    A: MaskedTensor,
    dim1: int,
    B: MaskedTensor,
    dim2: int,
    mask: jax.Array,
    broadcast_firstdim: bool = True,
) -> MaskedTensor:
    """Contract masked dim ``dim1`` of A with masked dim ``dim2`` of B.

    Output masked shape: (batch?, *A.maskedshape\\{dim1}, *B.maskedshape\\{dim2})
    with dense dims treated as shared batch (elementwise) dims, exactly the
    reference's batched-matmul semantics.
    """
    tA = A.fill_masked(0.0)
    tB = B.fill_masked(0.0)

    # channel-wise product fast path (the PPGN/2FWL hot op): an
    # independent (n, n) matmul per (graph, channel) maps terribly onto
    # the MXU at molecule-scale n — the Pallas kernel keeps the
    # (n, n, d) layout and contracts on the VPU with d on the lanes
    # (kernels/channelwise_bmm.py).  TPU only; einsum elsewhere.
    if (broadcast_firstdim and A.masked_dim == 3 and B.masked_dim == 3
            and A.dense_dim == 1 and B.dense_dim == 1
            and dim1 in (1, 2) and dim2 in (1, 2)
            and jax.default_backend() == "tpu" and _use_channelwise()):
        from ..kernels.channelwise_bmm import (channelwise_bmm,
                                               cw_bmm_applicable)

        if cw_bmm_applicable(tA.shape, tB.shape, tA.dtype, tB.dtype):
            a = tA if dim1 == 2 else jnp.swapaxes(tA, 1, 2)
            b = tB if dim2 == 1 else jnp.swapaxes(tB, 1, 2)
            prod = channelwise_bmm(a, b).astype(tA.dtype)
            return MaskedTensor(prod, mask)

    letters = iter(string.ascii_lowercase)
    k = next(letters)          # contracted index
    dense_letters = [next(letters) for _ in range(A.dense_dim)]
    assert A.dense_dim == B.dense_dim, "dense dims must match"

    a_sub, a_out = [], []
    batch_letter = None
    if broadcast_firstdim:
        assert dim1 > 0 and dim2 > 0, "dim 0 is the broadcast batch dim"
        batch_letter = next(letters)
    for i in range(A.masked_dim):
        if i == 0 and broadcast_firstdim:
            a_sub.append(batch_letter)
        elif i == dim1:
            a_sub.append(k)
        else:
            c = next(letters)
            a_sub.append(c)
            a_out.append(c)
    b_sub, b_out = [], []
    for i in range(B.masked_dim):
        if i == 0 and broadcast_firstdim:
            b_sub.append(batch_letter)
        elif i == dim2:
            b_sub.append(k)
        else:
            c = next(letters)
            b_sub.append(c)
            b_out.append(c)
    a_spec = "".join(a_sub) + "".join(dense_letters)
    b_spec = "".join(b_sub) + "".join(dense_letters)
    out_spec = ((batch_letter or "") + "".join(a_out) + "".join(b_out)
                + "".join(dense_letters))
    prod = jnp.einsum(f"{a_spec},{b_spec}->{out_spec}", tA, tB,
                      preferred_element_type=jnp.float32)
    prod = prod.astype(tA.dtype)
    return MaskedTensor(prod, mask)
