"""Dense (masked) high-order data: per-graph precompute + pad-and-stack
batching (reference pygho/hodata/MaData.py).

Dense batches stack graphs with per-batch node padding: x -> (B, n, *f),
A -> dense (B, n, n, *ea) or batched 3-sparse-dim SparseTensor,
X -> (B, n, n, *feat) from the samplers' flat row-major arrays
(reference to_dense_x / to_dense_adj / to_dense_tuplefeat,
MaData.py:25-215).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from ..backend import indexing
from .graph import Graph


def ma_datapreprocess(
    graph: Graph,
    tuplesamplers: Sequence[Callable[[Graph], Dict[str, np.ndarray]]],
    annotate: Sequence[str] = ("",),
    relabel: Optional[str] = None,
) -> Dict[str, Any]:
    """(reference MaData.py:258-299).  ``relabel="rcm"`` reorders nodes
    by reverse Cuthill-McKee before sampling (see sp_datapreprocess)."""
    assert len(tuplesamplers) == len(annotate)
    graph = graph.coalesced()
    if relabel is not None:
        from .graph import rcm_reorder

        assert relabel == "rcm", f"unknown relabel {relabel!r}"
        graph = rcm_reorder(graph)
    datadict: Dict[str, Any] = {
        "x": graph.x,
        "edge_index": graph.edge_index,
        "edge_attr": graph.edge_attr,
        "y": graph.y,
        "num_nodes": graph.num_nodes,
        "num_edges": graph.num_edges,
    }
    for ann, sampler in zip(annotate, tuplesamplers):
        out = sampler(graph)
        datadict[f"tuplefeat{ann}"] = out["tuplefeat"]
        datadict[f"tupleshape{ann}"] = out["tupleshape"]
    return datadict


def to_dense_adj(edge_index: np.ndarray,
                 edge_batch: np.ndarray,
                 edge_attr: Optional[np.ndarray] = None,
                 max_num_nodes: Optional[int] = None,
                 batch_size: Optional[int] = None,
                 filled_value: float = 0.0):
    """Batched sparse adjacency (concatenated edges + batch vector) to a
    dense MaskedTensor (b, n, n, *ea) — reference MaData.py:25-70.

    Host-side numpy scatter; masked slots are explicitly set to
    ``filled_value`` (the reference relies on its buggy lazy fill,
    PARITY.md #9)."""
    import jax.numpy as jnp

    from ..backend.matensor import MaskedTensor

    edge_index = np.asarray(edge_index)
    edge_batch = np.asarray(edge_batch)
    if max_num_nodes is None:
        max_num_nodes = int(edge_index.max()) + 1
    if batch_size is None:
        batch_size = int(edge_batch.max()) + 1
    if edge_attr is None:
        edge_attr = np.ones(edge_index.shape[1], dtype=np.float32)
    data = np.full((batch_size, max_num_nodes, max_num_nodes) +
                   edge_attr.shape[1:], filled_value, dtype=edge_attr.dtype)
    mask = np.zeros((batch_size, max_num_nodes, max_num_nodes), dtype=bool)
    data[edge_batch, edge_index[0], edge_index[1]] = edge_attr
    mask[edge_batch, edge_index[0], edge_index[1]] = True
    return MaskedTensor(jnp.asarray(data), jnp.asarray(mask))


def to_sparse_adj(edge_index: np.ndarray,
                  edge_batch: np.ndarray,
                  edge_attr: Optional[np.ndarray] = None,
                  max_num_nodes: Optional[int] = None,
                  batch_size: Optional[int] = None,
                  nnz_pad: Optional[int] = None):
    """Batched edges to a 3-sparse-dim SparseTensor (b, n, n, *ea) —
    reference MaData.py:73-106 — with bucket-padded nnz."""
    from ..backend.sptensor import SparseTensor

    edge_index = np.asarray(edge_index)
    edge_batch = np.asarray(edge_batch)
    if max_num_nodes is None:
        max_num_nodes = int(edge_index.max()) + 1
    if batch_size is None:
        batch_size = int(edge_batch.max()) + 1
    inds = np.concatenate([edge_batch[None, :], edge_index], axis=0)
    return SparseTensor.from_numpy(
        inds, edge_attr,
        sparse_shape=(batch_size, max_num_nodes, max_num_nodes),
        nnz_pad=nnz_pad, is_coalesced=False)


def to_dense_x(nodeX: np.ndarray,
               Xptr: np.ndarray,
               max_num_nodes: Optional[int] = None,
               batch_size: Optional[int] = None,
               filled_value: float = 0.0):
    """Concatenated per-graph node features + ptr to a padded
    MaskedTensor (b, ñ, *f) — reference MaData.py:109-149."""
    import jax.numpy as jnp

    from ..backend.matensor import MaskedTensor

    nodeX = np.asarray(nodeX)
    Xptr = np.asarray(Xptr)
    counts = np.diff(Xptr)
    if batch_size is None:
        batch_size = Xptr.shape[0] - 1
    if max_num_nodes is None:
        max_num_nodes = int(counts.max())
    data = np.full((batch_size,) + (max_num_nodes,) + nodeX.shape[1:],
                   filled_value, dtype=nodeX.dtype)
    mask = np.zeros((batch_size, max_num_nodes), dtype=bool)
    for g in range(min(batch_size, counts.shape[0])):
        n = min(int(counts[g]), max_num_nodes)
        data[g, :n] = nodeX[Xptr[g]:Xptr[g] + n]
        mask[g, :n] = True
    return MaskedTensor(jnp.asarray(data), jnp.asarray(mask))


def to_dense_tuplefeat(tuplefeat: np.ndarray,
                       tupleshape: np.ndarray,
                       tuplefeatptr: np.ndarray,
                       max_tupleshape: Optional[np.ndarray] = None,
                       batch_size: Optional[int] = None,
                       feat2mask: Optional[Callable[[np.ndarray],
                                                    np.ndarray]] = None):
    """Flat row-major per-graph tuple features to a padded MaskedTensor
    (b, n1, n2, ..., *f) — reference MaData.py:152-215.

    ``feat2mask`` optionally refines the validity mask from the gathered
    dense features (e.g. ``lambda f: f < thresh``); it is AND-ed with the
    per-graph shape masks, as in the reference."""
    import jax.numpy as jnp

    from ..backend.matensor import MaskedTensor

    tuplefeat = np.asarray(tuplefeat)
    tupleshape = np.asarray(tupleshape)
    tuplefeatptr = np.asarray(tuplefeatptr)
    if batch_size is None:
        batch_size = tupleshape.shape[0]
    if max_tupleshape is None:
        max_tupleshape = tupleshape.max(axis=0)
    dims = tuple(int(s) for s in max_tupleshape)
    featshape = tuplefeat.shape[1:]
    data = np.zeros((batch_size,) + dims + featshape, dtype=tuplefeat.dtype)
    mask = np.zeros((batch_size,) + dims, dtype=bool)
    for g in range(min(batch_size, tupleshape.shape[0])):
        ts = tuple(int(s) for s in tupleshape[g])
        block = tuplefeat[tuplefeatptr[g]:tuplefeatptr[g] + int(np.prod(ts))]
        block = block.reshape(ts + featshape)
        sl = (g,) + tuple(slice(0, min(s, d)) for s, d in zip(ts, dims))
        data[sl] = block[tuple(slice(0, min(s, d)) for s, d in zip(ts, dims))]
        mask[sl] = True
    if feat2mask is not None:
        mask = np.logical_and(mask, np.asarray(feat2mask(data), dtype=bool))
        data = np.where(
            mask.reshape(mask.shape + (1,) * len(featshape)), data, 0)
    return MaskedTensor(jnp.asarray(data), jnp.asarray(mask))


def collate_dense(
    datas: List[Dict[str, Any]],
    annotate: Sequence[str] = ("",),
    num_graphs: Optional[int] = None,
    buckets: Optional[Dict[str, int]] = None,
    denseadj: bool = True,
) -> Dict[str, np.ndarray]:
    """Pad-and-stack collation to (B, ñ, ...) with validity masks."""
    G = len(datas)
    if num_graphs is None:
        num_graphs = G
    buckets = buckets if buckets is not None else {}
    nmax = max(d["num_nodes"] for d in datas)
    n_pad = max(indexing.bucket_size(nmax, 32), buckets.get("n", 0))
    buckets["n"] = n_pad
    B = num_graphs

    x0 = datas[0]["x"]
    out: Dict[str, np.ndarray] = {}
    x = np.zeros((B, n_pad) + x0.shape[1:], dtype=x0.dtype)
    node_mask = np.zeros((B, n_pad), dtype=bool)
    for g, d in enumerate(datas):
        n = d["num_nodes"]
        x[g, :n] = d["x"]
        node_mask[g, :n] = True
    out["x"] = x
    out["node_mask"] = node_mask
    out["graph_mask"] = np.arange(B) < G

    if datas[0].get("y") is not None:
        ys = [np.asarray(d["y"]).reshape(-1) for d in datas]
        out["y"] = np.stack(ys + [np.zeros_like(ys[0])] * (B - G))

    # adjacency
    ea0 = datas[0].get("edge_attr")
    if denseadj:
        adj = np.zeros((B, n_pad, n_pad) +
                       (ea0.shape[1:] if ea0 is not None else ()),
                       dtype=(ea0.dtype if ea0 is not None else np.float32))
        adj_mask = np.zeros((B, n_pad, n_pad), dtype=bool)
        for g, d in enumerate(datas):
            ei = d["edge_index"]
            if ea0 is not None:
                adj[g, ei[0], ei[1]] = d["edge_attr"]
            else:
                adj[g, ei[0], ei[1]] = 1.0
            adj_mask[g, ei[0], ei[1]] = True
        out["A_data"] = adj
        out["A_mask"] = adj_mask
    else:
        # batched 3-sparse-dim adjacency (reference to_sparse_adj,
        # MaData.py:73-106)
        E = sum(d["num_edges"] for d in datas)
        E_pad = max(indexing.bucket_size(E), buckets.get("edges", 0))
        buckets["edges"] = E_pad
        inds = np.concatenate(
            [np.concatenate([np.full((1, d["num_edges"]), g, np.int64),
                             d["edge_index"]], axis=0)
             for g, d in enumerate(datas)], axis=1)
        out["A_indices"] = indexing.pad_indices(inds, E_pad)
        if ea0 is not None:
            out["A_values"] = indexing.pad_values(
                np.concatenate([d["edge_attr"] for d in datas], axis=0),
                E_pad)
        out["A_nnz"] = np.int32(E)

    # tuple features: flat row-major (prod(tupleshape), *f) -> padded dense
    for ann in annotate:
        ts0 = datas[0][f"tupleshape{ann}"]
        ndim = len(ts0)
        featshape = datas[0][f"tuplefeat{ann}"].shape[1:]
        Xd = np.zeros((B,) + (n_pad,) * ndim + featshape,
                      dtype=datas[0][f"tuplefeat{ann}"].dtype)
        Xm = np.zeros((B,) + (n_pad,) * ndim, dtype=bool)
        for g, d in enumerate(datas):
            ts = tuple(int(s) for s in d[f"tupleshape{ann}"])
            block = d[f"tuplefeat{ann}"].reshape(ts + featshape)
            sl = (g,) + tuple(slice(0, s) for s in ts)
            Xd[sl] = block
            Xm[sl] = True
        out[f"X{ann}_data"] = Xd
        out[f"X{ann}_mask"] = Xm
    return out


def batch_to_dense_dict(batch: Dict[str, Any],
                        annotate: Sequence[str] = ("",)) -> Dict[str, Any]:
    """Wrap collated arrays into MaskedTensor / SparseTensor — jit-safe
    (reference batch2dense, MaData.py:218-255)."""
    import jax.numpy as jnp

    from ..backend.matensor import MaskedTensor
    from ..backend.sptensor import SparseTensor

    dd = dict(batch)
    dd["x"] = MaskedTensor(jnp.asarray(batch["x"]),
                           jnp.asarray(batch["node_mask"]))
    if "A_data" in batch:
        dd["A"] = MaskedTensor(jnp.asarray(batch["A_data"]),
                               jnp.asarray(batch["A_mask"]))
    else:
        B = batch["x"].shape[0]
        n_pad = batch["x"].shape[1]
        dd["A"] = SparseTensor(
            indices=jnp.asarray(batch["A_indices"]),
            values=None if "A_values" not in batch
            else jnp.asarray(batch["A_values"]),
            nnz=jnp.asarray(batch["A_nnz"], jnp.int32),
            sparse_shape=(B, n_pad, n_pad),
        )
    for ann in annotate:
        dd[f"X{ann}"] = MaskedTensor(
            jnp.asarray(batch[f"X{ann}_data"]),
            jnp.asarray(batch[f"X{ann}_mask"]))
    return dd
