"""Dataset loaders.

- ``synthetic_zinc``: a deterministic molecule-like random graph set with
  ZINC statistics (~23 nodes, ~50 directed edges, 21 atom types, 4 bond
  types) for end-to-end tests and benchmarking in the zero-egress
  container (the real ZINC download is not available here).  The target is
  a simple structural regression (normalized cycle + degree statistics) so
  models can actually learn it.
- Loaders for the reference's bundled expressivity datasets (sr25 .g6
  files; CSL pickled sparse matrices) — the same raw files the reference
  ships under dataset/ (reference dataset/sr25, dataset/CSL).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import numpy as np

from .graph import Graph


def _random_molecule(rng: np.random.Generator,
                     n_lo: int = 10, n_hi: int = 32) -> Graph:
    """Connected sparse graph: a random spanning tree + a few extra edges
    (rings), mimicking molecular graphs."""
    n = int(rng.integers(n_lo, n_hi + 1))
    # random tree
    edges = set()
    perm = rng.permutation(n)
    for i in range(1, n):
        j = int(rng.integers(0, i))
        u, v = int(perm[i]), int(perm[j])
        edges.add((u, v))
    # ring-closing extras
    extra = int(rng.integers(1, max(2, n // 6) + 1))
    for _ in range(extra):
        u, v = rng.integers(0, n, size=2)
        if u != v:
            edges.add((int(u), int(v)))
    und = set()
    for u, v in edges:
        und.add((u, v))
        und.add((v, u))
    ei = np.array(sorted(und)).T
    x = rng.integers(0, 21, size=(n, 1))
    ea = rng.integers(1, 4, size=(ei.shape[1],))
    # structural target: cycle rank + mean degree (normalized) — learnable
    # from graph structure alone
    m = ei.shape[1] // 2
    cycles = m - n + 1
    degs = np.bincount(ei[0], minlength=n)
    y = np.array([cycles / 4.0 + degs.mean() / 4.0 + x.mean() / 20.0],
                 dtype=np.float32)
    return Graph(x=x, edge_index=ei, edge_attr=ea, y=y)


def synthetic_zinc(split: str = "train", n_graphs: Optional[int] = None,
                   seed: int = 42) -> List[Graph]:
    sizes = {"train": 1024, "val": 128, "test": 128}
    offs = {"train": 0, "val": 1, "test": 2}
    n = n_graphs if n_graphs is not None else sizes[split]
    rng = np.random.default_rng(seed + 1000 * offs[split])
    return [_random_molecule(rng) for _ in range(n)]


# ---------------------------------------------------------------- graph6


def _parse_graph6(line: bytes) -> np.ndarray:
    """Decode one graph6 line into a dense adjacency (bool).  Standard
    format: n in N(x), then ceil(n(n-1)/2 / 6) bytes of column-major upper
    triangle bits, each byte = value + 63."""
    data = [c - 63 for c in line.strip()]
    if data[0] <= 62:
        n = data[0]
        bits = data[1:]
    else:
        # 63, n in next 3 bytes (n <= 258047)
        n = (data[1] << 12) | (data[2] << 6) | data[3]
        bits = data[4:]
    adj = np.zeros((n, n), dtype=bool)
    bitstream = []
    for b in bits:
        for k in range(5, -1, -1):
            bitstream.append((b >> k) & 1)
    idx = 0
    for j in range(1, n):
        for i in range(j):
            if bitstream[idx]:
                adj[i, j] = adj[j, i] = True
            idx += 1
    return adj


def load_sr25(root: str = "/root/reference/dataset/sr25/raw") -> List[Graph]:
    """Strongly-regular graphs (.g6).  All pairs are 1-WL (even 3-WL)
    indistinguishable; the task is to tell the 15 graphs apart
    (reference dataset/sr25)."""
    graphs = []
    for fn in sorted(os.listdir(root)):
        if not fn.endswith((".g6", ".txt")):
            continue
        with open(os.path.join(root, fn), "rb") as f:
            for li, line in enumerate(f):
                if not line.strip():
                    continue
                adj = _parse_graph6(line)
                ei = np.stack(np.nonzero(adj)).astype(np.int64)
                n = adj.shape[0]
                graphs.append(Graph(
                    x=np.zeros((n, 1), dtype=np.int64),
                    edge_index=ei, edge_attr=None,
                    y=np.array([len(graphs)], dtype=np.int64)))
    return graphs


def load_csl(root: str = "/root/reference/dataset/CSL/raw") -> List[Graph]:
    """Circular Skip Link graphs: 150 graphs, 10 isomorphism classes
    (reference dataset/CSL; raw pickle of scipy sparse adjacencies)."""
    with open(os.path.join(root,
                           "graphs_Kary_Deterministic_Graphs.pkl"), "rb") as f:
        adjs = pickle.load(f)
    import torch

    ys = torch.load(os.path.join(root, "y_Kary_Deterministic_Graphs.pt"),
                    weights_only=False)
    ys = np.asarray(ys).reshape(-1)
    graphs = []
    for adj, y in zip(adjs, ys):
        coo = adj.tocoo()
        ei = np.stack([coo.row, coo.col]).astype(np.int64)
        n = adj.shape[0]
        graphs.append(Graph(
            x=np.zeros((n, 1), dtype=np.int64),
            edge_index=ei, edge_attr=None,
            y=np.array([int(y)], dtype=np.int64)))
    return graphs


def _pyg_shim():
    """Install a minimal torch_geometric shim so the reference's bundled
    pickles (which reference torch_geometric.data.data.Data) unpickle
    without PyG installed."""
    import sys
    import types

    if "torch_geometric" in sys.modules:
        return
    tg = types.ModuleType("torch_geometric")
    tgd = types.ModuleType("torch_geometric.data")
    tgdd = types.ModuleType("torch_geometric.data.data")

    class Data:  # minimal stand-in: attribute bag
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            else:  # PyG >= 2 stores a (dict,) or custom tuple
                try:
                    self.__dict__.update(dict(state))
                except Exception:
                    self.__dict__["_state"] = state

    tgdd.Data = Data
    tgd.Data = Data
    tgd.data = tgdd
    tg.data = tgd
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tgd
    sys.modules["torch_geometric.data.data"] = tgdd


def load_exp(root: str = "/root/reference/dataset/EXP/raw",
             which: str = "GRAPHSAT.pkl") -> List[Graph]:
    """EXP expressivity dataset (reference dataset/EXP): pairs of
    1-WL-indistinguishable graphs labeled by SAT satisfiability.  The raw
    pickle stores PyG Data objects; a shim class stands in for PyG."""
    _pyg_shim()
    import torch

    with open(os.path.join(root, which), "rb") as f:
        datas = pickle.load(f)
    graphs = []
    for d in datas:
        ei = np.asarray(d.edge_index, dtype=np.int64)
        x = np.asarray(d.x)
        if x.ndim == 1:
            x = x[:, None]
        y = np.asarray(d.y).reshape(-1)
        graphs.append(Graph(x=x.astype(np.int64), edge_index=ei,
                            edge_attr=None,
                            y=y.astype(np.int64)))
    return graphs


def synthetic_subgraphcount(n_graphs: int = 512, seed: int = 3,
                            n_lo: int = 10, n_hi: int = 30) -> List[Graph]:
    """Substructure-counting dataset in the style of the reference's
    dataset/subgraphcount (whose raw randomgraph.mat blob is stripped from
    the snapshot, reference .MISSING_LARGE_BLOBS:1-2): random graphs with
    per-graph triangle counts as the regression target (normalized)."""
    rng = np.random.default_rng(seed)
    graphs = []
    for _ in range(n_graphs):
        n = int(rng.integers(n_lo, n_hi + 1))
        p = float(rng.uniform(0.1, 0.3))
        adj = rng.random((n, n)) < p
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        ei = np.stack(np.nonzero(adj)).astype(np.int64)
        if ei.shape[1] == 0:
            continue
        tri = np.trace(np.linalg.matrix_power(adj.astype(np.float64), 3)) / 6
        graphs.append(Graph(
            x=np.zeros((n, 1), dtype=np.int64),
            edge_index=ei, edge_attr=None,
            y=np.array([tri / 10.0], dtype=np.float32)))
    return graphs
