"""Sparse x sparse contraction on precomputed index triples.

Device-side half of the reference's core engine
(pygho/backend/Spspmm.py:225-380).  The index building
(spspmm_ind/filterind) lives on the host in backend.indexing; here we only
execute the hot loop

    mult   = A.values[acd[1]] * B.values[acd[2]]     (gather, gather, mul)
    retval = segment_reduce(mult, acd[0], ...)       (sorted segment reduce)

with ``acd`` padded by (PAD_INDEX, 0, 0) rows: the gathers read row 0 and
the scatter drops the product.  ``pygho_tpu.kernels`` provides a fused
Pallas version of the same contraction; this module is the XLA reference
implementation and the correctness oracle.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .sptensor import SparseTensor, _expand_mask
from .segment import segment_reduce


def _take_rows(values: jax.Array, idx: jax.Array) -> jax.Array:
    # clamp-gather: padded idx rows read the last row harmlessly
    return values[jnp.minimum(idx, values.shape[0] - 1)]


def spspmm(
    A: SparseTensor,
    dim1: int,
    B: SparseTensor,
    dim2: int,
    aggr: str = "sum",
    acd: Optional[jax.Array] = None,
    tarX: Optional[SparseTensor] = None,
) -> SparseTensor:
    """Contract dim1 of A with dim2 of B onto the target pattern ``tarX``.

    Unlike the reference (Spspmm.py:270-331), the fallback index build is
    *not* available on device — ``acd`` (host-precomputed, padded) and the
    target pattern are required.  This is a design decision, not a
    limitation: dynamic index building inside the hot loop is precisely
    what a TPU-native design moves to the data pipeline.
    """
    assert acd is not None, (
        "spspmm requires precomputed acd (datadict['<key>___acd']); "
        "run the sparse preprocessing with the model's precompute keys")
    assert tarX is not None, "spspmm requires the target pattern tarX"
    if A.values is None:
        mult = _take_rows(B.values, acd[2])
    elif B.values is None:
        mult = _take_rows(A.values, acd[1])
    else:
        av = _take_rows(A.values, acd[1])
        bv = _take_rows(B.values, acd[2])
        while av.ndim < bv.ndim:  # scalar edge weights broadcast over d
            av = av[..., None]
        while bv.ndim < av.ndim:
            bv = bv[..., None]
        mult = av * bv
    retval = segment_reduce(mult, acd[0], tarX.nnz_pad, aggr,
                            indices_are_sorted=True)
    keep_shape = (tuple(A.sparse_shape[:dim1]) + tuple(A.sparse_shape[dim1 + 1:])
                  + tuple(B.sparse_shape[:dim2]) + tuple(B.sparse_shape[dim2 + 1:]))
    return SparseTensor(indices=tarX.indices, values=retval, nnz=tarX.nnz,
                        sparse_shape=keep_shape)


def spspmpnn(
    A: SparseTensor,
    dim1: int,
    B: SparseTensor,
    dim2: int,
    C: SparseTensor,
    acd: jax.Array,
    message_func: Callable,
    aggr: str = "sum",
) -> SparseTensor:
    """Generalized message passing phi(A_ij, B_ik, C_kj) -> aggregate
    (reference Spspmm.py:334-380).  ``message_func(av, bv, cv, seg_ids)``
    receives the gathered rows and the output segment ids (for e.g.
    segment-softmax attention) and returns per-contribution messages."""
    av = None if A.values is None else _take_rows(A.values, acd[1])
    bv = None if B.values is None else _take_rows(B.values, acd[2])
    cv = None if C.values is None else _take_rows(C.values,
                                                  jnp.minimum(acd[0], C.nnz_pad - 1))
    mult = message_func(av, bv, cv, acd[0])
    retval = segment_reduce(mult, acd[0], C.nnz_pad, aggr,
                            indices_are_sorted=True)
    keep_shape = (tuple(A.sparse_shape[:dim1]) + tuple(A.sparse_shape[dim1 + 1:])
                  + tuple(B.sparse_shape[:dim2]) + tuple(B.sparse_shape[dim2 + 1:]))
    return SparseTensor(indices=C.indices, values=retval, nnz=C.nnz,
                        sparse_shape=keep_shape)


def spsphadamard(
    A: SparseTensor,
    B: SparseTensor,
    b2a: jax.Array,
) -> SparseTensor:
    """Elementwise product of two SparseTensors, returned on B's pattern
    (reference Spspmm.py:225-267).

    ``b2a`` maps each B row to its position in A (-1 = no match; host:
    indexing.spsphadamard_ind).  Deviation from the reference: the result
    keeps B's full pattern with explicit zeros at unmatched rows instead of
    compacting to the intersection pattern (compaction is a dynamic-shape
    op; explicit zeros are numerically identical for the sum/mean paths and
    for any op that respects the nnz row mask)."""
    assert A.sparse_shape == B.sparse_shape
    matched = b2a >= 0
    if A.values is None:
        vals = B.values
    elif B.values is None:
        vals = _take_rows(A.values, jnp.maximum(b2a, 0))
    else:
        vals = _take_rows(A.values, jnp.maximum(b2a, 0)) * B.values
    vals = jnp.where(_expand_mask(matched, vals.ndim), vals,
                     jnp.zeros((), vals.dtype))
    return SparseTensor(indices=B.indices, values=vals, nnz=B.nnz,
                        sparse_shape=B.sparse_shape)
