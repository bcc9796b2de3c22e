"""Sparse tuple samplers (reference pygho/hodata/SpTupleSampler.py).

Vectorized with scipy all-pairs shortest paths instead of the reference's
per-root Python BFS (SpTupleSampler.py:109-123) — identical semantics
(BFS distance == unweighted SPD), orders of magnitude faster on the host.
Output index arrays come out lexicographically sorted by construction
(np.nonzero is row-major), which is the coalesced-order invariant the
device relies on.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import scipy.sparse as ssp

from .graph import Graph


def _spd_matrix(graph: Graph) -> np.ndarray:
    """All-pairs unweighted shortest-path distances (float, inf for
    unreachable)."""
    return ssp.csgraph.shortest_path(graph.to_scipy_csr(), directed=False,
                                     unweighted=True,
                                     return_predecessors=False)


def KhopSampler(graph: Graph, hop: int = 2) -> Dict[str, np.ndarray]:
    """Per-root k-hop ego-net tuples (reference SpTupleSampler.py:91-126):
    tuple (i, j) for every j within ``hop`` of root i, feature = SPD(i, j).

    Returns the per-graph datadict fragment:
      tupleid (2, nt) int64 sorted, tuplefeat (nt,) int64, tupleshape (2,).
    """
    dist = _spd_matrix(graph)
    mask = dist <= hop  # root itself included (dist 0)
    ii, jj = np.nonzero(mask)
    feat = dist[ii, jj].astype(np.int64)
    return {
        "tupleid": np.stack([ii, jj]).astype(np.int64),
        "tuplefeat": feat,
        "tupleshape": np.array([graph.num_nodes, graph.num_nodes],
                               dtype=np.int64),
    }


def I2Sampler(graph: Graph, hop: int = 3) -> Dict[str, np.ndarray]:
    """Per-edge 3-tuples for I2-GNN (reference SpTupleSampler.py:129-174):
    for each directed edge (u, v), tuples (u, v, w) for w within ``hop`` of
    {u, v}; feature = (SPD(u, w), SPD(v, w)).

    Also emits the pooling structures the TPU path needs to pool
    3-tuples back onto the (u, v) edge pattern under jit
    (pygho_tpu.honn.sp_operator.pool_seg_key("X", 2)):
      ``pool2_seg`` (nt,) — index of the parent edge for each 3-tuple.
    The pooled target pattern is the batch adjacency pattern itself.
    """
    dist = _spd_matrix(graph)
    ei = graph.edge_index
    u, v = ei[0], ei[1]
    within = (dist[u] <= hop) | (dist[v] <= hop)  # (E, n)
    e_idx, w = np.nonzero(within)
    feat = np.stack([dist[u[e_idx], w], dist[v[e_idx], w]], axis=-1)
    # nodes unreachable from one endpoint but within hop of the other:
    # clamp inf to hop + 2 (the reference would cast inf to a garbage long,
    # SpTupleSampler.py:146-150 — we clamp instead)
    feat = np.where(np.isinf(feat), hop + 2, feat).astype(np.int64)
    return {
        "tupleid": np.stack([u[e_idx], v[e_idx], w]).astype(np.int64),
        "tuplefeat": feat,
        "tupleshape": np.array([graph.num_nodes] * 3, dtype=np.int64),
        "pool2_seg": e_idx.astype(np.int64),
    }


def k_hop_subgraph(
    node_idx,
    num_hops: int,
    edge_index: np.ndarray,
    relabel_nodes: bool = False,
    num_nodes: int | None = None,
    flow: str = "source_to_target",
    directed: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """k-hop subgraph around root node(s), numpy-native (host side).

    Same contract as the reference's public utility
    (SpTupleSampler.py:12-88): returns
    ``(subset, edge_index, inv, edge_mask, dist)`` where ``subset`` is the
    sorted node ids reached within ``num_hops``, ``edge_index`` the edges
    retained (all subset-internal edges when ``directed=False``; the last
    BFS frontier's edges when ``directed=True``), ``inv`` positions of the
    roots inside ``subset``, ``edge_mask`` the boolean edge filter, and
    ``dist`` the hop distance of each subset node from the root set.
    ``relabel_nodes`` remaps the returned edges onto ``range(len(subset))``.
    """
    edge_index = np.asarray(edge_index, dtype=np.int64)
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.size else 1
    assert flow in ("source_to_target", "target_to_source")
    if flow == "target_to_source":
        row, col = edge_index[0], edge_index[1]
    else:
        col, row = edge_index[0], edge_index[1]

    roots = np.atleast_1d(np.asarray(node_idx, dtype=np.int64)).ravel()
    subsets = [roots]
    edge_mask = np.zeros(row.shape[0], dtype=bool)
    node_mask = np.zeros(num_nodes, dtype=bool)
    for _ in range(num_hops):
        node_mask[:] = False
        node_mask[subsets[-1]] = True
        edge_mask = node_mask[row]
        subsets.append(col[edge_mask])

    # distance = smallest hop index that reaches the node
    dist = np.full(num_nodes, num_nodes + 1, dtype=np.int64)
    for h in range(num_hops, -1, -1):
        dist[subsets[h]] = h

    subset, inv_all = np.unique(np.concatenate(subsets), return_inverse=True)
    inv = inv_all[: roots.shape[0]]
    dist = dist[subset]

    if not directed:
        node_mask[:] = False
        node_mask[subset] = True
        edge_mask = node_mask[row] & node_mask[col]
    out_edges = edge_index[:, edge_mask]
    if relabel_nodes:
        remap = np.full(num_nodes, -1, dtype=np.int64)
        remap[subset] = np.arange(subset.shape[0], dtype=np.int64)
        out_edges = remap[out_edges]
    return subset, out_edges, inv, edge_mask, dist
