"""Fused Pallas path for spmamm (SD-mode sparse-adjacency contraction).

The spmamm hot loop (reference pygho/backend/Spmamm.py:41-68)

    out[b, ..., t] += Aval[e] * B[b, ..., s]     for edges e = (b, s->t)

is the same gather-multiply-segment-reduce shape as the spspmm hot loop,
so it rides the SAME fused kernel (kernels/fused_spspmm.py): the host
expands each real edge across the batch element's real root coordinates
(the masked axes of B that are neither batch nor contracted), flattens
(b, roots..., node) to row ids, and emits (t, u, v) triples

    t = flat output row, u = edge row in A.values, v = flat B row

sorted by t.  ``build_spmamm_plans`` then reuses build_spspmm_plans_for,
giving forward + both gradient plans (custom_vjp, no device-side index
work), with the per-role geometry autotuner.

This covers the SD-mode contractions end to end: node-level message
passing (B = (b, n, d), zero extra axes), within/cross-subgraph 2D
(one extra axis), and 3-tuple dim-3 passing (two extra axes).  The
triple count equals the true contraction size (nnz_A x prod(real root
extents)) — the same work the sparse-mode acd array encodes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..backend.indexing import PAD_INDEX
from .fused_spspmm import (ChunkPlan, autotune_spspmm_geoms,
                           build_spspmm_plans_for)


def spmamm_triples(
    A_indices: np.ndarray,
    dim1: int,
    n_pad: int,
    node_counts: np.ndarray,
    n_extra: int,
) -> np.ndarray:
    """Expand padded batched adjacency indices (3, nnz_pad) into fused
    (t, u, v) triples, sorted by (t, u).

    ``dim1`` follows spmamm: the adjacency node dim that is contracted
    (1 => source = indices[1], target = indices[2]; 2 => swapped).
    ``node_counts[g]`` is graph g's real node count — every extra masked
    axis of B ranges over it.  Row ids flatten (b, extra..., node) with
    the contracted/target axis last.
    """
    A_indices = np.asarray(A_indices)
    real = A_indices[0] < PAD_INDEX
    e = np.nonzero(real)[0].astype(np.int64)
    b = A_indices[0][real].astype(np.int64)
    if dim1 == 1:
        s, t = A_indices[1][real].astype(np.int64), \
            A_indices[2][real].astype(np.int64)
    elif dim1 == 2:
        s, t = A_indices[2][real].astype(np.int64), \
            A_indices[1][real].astype(np.int64)
    else:
        raise NotImplementedError("dim1 must be 1 or 2")

    counts = np.asarray(node_counts).astype(np.int64)
    if n_extra == 0:
        pre = b
        U = e
        tt, ss = t, s
    else:
        per = counts[b] ** n_extra
        tot = int(per.sum())
        eidx = np.repeat(np.arange(len(b)), per)
        local = np.arange(tot, dtype=np.int64) - np.repeat(
            np.cumsum(per) - per, per)
        c = counts[b][eidx]
        pre = b[eidx]
        rem = local
        for _ in range(n_extra):
            pre = pre * n_pad + rem % c
            rem = rem // c
        U = e[eidx]
        tt, ss = t[eidx], s[eidx]
    T = pre * n_pad + tt
    V = pre * n_pad + ss
    order = np.lexsort((U, T))
    return np.stack([T, U, V])[:, order]


def build_spmamm_plans(
    A_indices: np.ndarray,
    nnz_pad: int,
    dim1: int,
    n_pad: int,
    bsz: int,
    masked_ndim: int,
    node_counts: np.ndarray,
    D: int = 128,
    geometry="autotune",
    pad_chunks_to: Optional[int] = None,
    tuv: Optional[np.ndarray] = None,
    kind: str = "chunk",
) -> Tuple[ChunkPlan, ChunkPlan, ChunkPlan]:
    """Host-build (fwd, dAval, dB) chunk plans for a fused spmamm.

    ``masked_ndim`` is B's masked rank including batch (2 for node-level
    B, 3 for 2-tuple X, 4 for 3-tuple X); the contracted axis identity
    does not matter for the plan — only how many extra axes get
    expanded.  ``tuv`` skips the triple expansion when the caller
    already ran spmamm_triples (the loader shares it with the autotuner
    and the fill guard).  Returns plans consumable by
    backend.spmamm(plans=...) — via OpSpMessagePassing's datadict key
    for tuple-level B; node-level B (OpSpNodeMessagePassing takes no
    datadict) calls backend.spmamm directly.
    """
    n_extra = masked_ndim - 2
    assert n_extra >= 0
    if tuv is None:
        tuv = spmamm_triples(A_indices, dim1, n_pad, node_counts, n_extra)
    rows = bsz * n_pad ** (masked_ndim - 1)
    if kind == "strip":
        # v2 strip kernel (backend.spmamm dispatches on the plan type)
        from .strip_spspmm import (autotune_strip_geoms,
                                   build_spspmm_strip_plans)

        if isinstance(geometry, dict):
            geoms = geometry
        elif geometry in ("autotune", "auto"):
            geoms = autotune_strip_geoms(tuv, nnz_pad, rows, rows, D=D)
        else:
            geoms = {"fwd": geometry, "dx": geometry, "da": geometry}
        return build_spspmm_strip_plans(tuv, nnz_pad, rows, rows, geoms,
                                        pad_steps_to=pad_chunks_to)
    if isinstance(geometry, dict):
        geoms = geometry
    elif geometry == "autotune":
        geoms = autotune_spspmm_geoms(tuv, nnz_pad, rows, rows, D)
    elif geometry == "auto":
        from .fused_spspmm import suggest_geometry

        g = suggest_geometry(tuv)
        geoms = {"fwd": g, "dx": g, "da": g}
    else:
        geoms = {"fwd": geometry, "dx": geometry, "da": geometry}
    return build_spspmm_plans_for(tuv, nnz_pad, rows, rows, geoms,
                                  pad_chunks_to)
