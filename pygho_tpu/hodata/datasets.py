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


def load_zinc(root: str, split: str = "train",
              subset: bool = True) -> List[Graph]:
    """Load the real ZINC dataset from its standard on-disk raw format
    (the files PyG's ``ZINC(root, subset=True, split=...)`` downloads,
    which the reference consumes at example/zinc.py:96-105 and
    example/minimal.py:107-111).

    Expects ``<root>/raw/{split}.pickle`` — a pickled list of molecule
    dicts with ``atom_type`` (n,) int tensor/array, ``bond_type`` (n, n)
    dense bond-order matrix, and ``logP_SA_cycle_normalized`` scalar
    target — plus, for the 12k benchmark subset, ``{split}.index``
    (comma-separated indices).  ``root`` may also point directly at the
    ``raw/`` directory.  Tensors may be torch or numpy; torch is only
    imported if needed.

    Returns graphs in the exact shape the rest of the pipeline consumes
    (same fields synthetic_zinc produces): integer atom types as
    ``x (n, 1)``, directed edge pairs from the nonzero bond entries,
    integer bond types as ``edge_attr``, float target ``y (1,)``.

    Schema provenance: this container has no network access, so the
    expected dict layout (``atom_type``/``bond_type``/
    ``logP_SA_cycle_normalized`` keys, dense bond matrix) was transcribed
    from PyG's ``torch_geometric/datasets/zinc.py`` ``process()`` source,
    NOT validated against a downloaded archive; the checked-in test
    fixture (tests/fixtures/zinc/raw) is self-authored to that schema.
    The parser is deliberately permissive — torch or numpy tensors both
    work, ``root`` or ``root/raw`` both resolve, a missing ``.index``
    file falls back to the full split, and the target accepts the first
    key present among ``logP_SA_cycle_normalized``/``logP_SA_cycle``/
    ``y`` — but a genuinely different field layout will still raise
    KeyError naming the molecule index.
    """
    raw = root if os.path.exists(os.path.join(root, f"{split}.pickle")) \
        else os.path.join(root, "raw")
    pkl = os.path.join(raw, f"{split}.pickle")
    if not os.path.exists(pkl):
        raise FileNotFoundError(
            f"ZINC raw file {pkl} not found; download the PyG ZINC "
            f"'molecules' archive into {root}/raw (train/val/test"
            f".pickle + .index)")
    with open(pkl, "rb") as f:
        mols = pickle.load(f)
    indices = range(len(mols))
    if subset:
        idx_file = os.path.join(raw, f"{split}.index")
        if os.path.exists(idx_file):
            with open(idx_file) as f:
                indices = [int(t) for t in f.read().strip().rstrip(",")
                           .split(",")]

    def to_np(t):
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)

    graphs = []
    target_keys = ("logP_SA_cycle_normalized", "logP_SA_cycle", "y")
    for i in indices:
        mol = mols[i]
        try:
            x = to_np(mol["atom_type"]).astype(np.int64).reshape(-1, 1)
            adj = to_np(mol["bond_type"])
            tkey = next((k for k in target_keys if k in mol), None)
            if tkey is None:
                raise KeyError(f"none of {target_keys}")
            y = np.asarray(to_np(mol[tkey]),
                           dtype=np.float32).reshape(-1)[:1]
        except KeyError as e:
            raise KeyError(
                f"ZINC molecule {i} does not match the expected PyG raw "
                f"schema (keys {sorted(mol) if hasattr(mol, 'keys') else type(mol)}): {e}"
            ) from e
        src, dst = np.nonzero(adj)
        order = np.lexsort((dst, src))
        ei = np.stack([src[order], dst[order]]).astype(np.int64)
        ea = adj[ei[0], ei[1]].astype(np.int64)
        graphs.append(Graph(x=x, edge_index=ei, edge_attr=ea, y=y))
    return graphs


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


SUBSTRUCTURES = ("triangle", "tailed_triangle", "star", "cycle4",
                 "cycle5", "chordal")


def count_substructures(adj: np.ndarray) -> dict:
    """Exact non-induced subgraph counts for the six substructures of the
    subgraphcount benchmark family (Chen et al. "Can GNNs Count
    Substructures?", the randomgraph.mat targets behind the reference's
    dataset/subgraphcount; also the I2-GNN counting suite): triangle,
    tailed triangle, 3-star (claw), 4-cycle, 5-cycle, and chordal cycle
    (diamond).  Closed forms over the adjacency matrix; brute-force
    verified in tests/test_pipeline.py.
    """
    A = adj.astype(np.float64)
    d = A.sum(1)
    m = d.sum() / 2.0
    A2 = A @ A
    A3 = A2 @ A
    tri_v = np.diag(A3) / 2.0          # triangles through each vertex
    triangle = tri_v.sum() / 3.0
    tailed = float((tri_v * (d - 2.0)).sum())
    star = float((d * (d - 1.0) * (d - 2.0) / 6.0).sum())
    # closed 4-walks: tr(A^4) = 2*sum(d^2) - 2m + 8*C4
    cycle4 = (np.trace(A3 @ A) - 2.0 * (d * d).sum() + 2.0 * m) / 8.0
    cycle5 = (np.trace(A3 @ A2) - 5.0 * np.trace(A3)
              - 5.0 * ((d - 2.0) * np.diag(A3)).sum()) / 10.0
    common = A2 * A                    # common neighbors across each edge
    chordal = float((common * (common - 1.0) / 2.0).sum() / 2.0)
    return {"triangle": float(triangle), "tailed_triangle": tailed,
            "star": star, "cycle4": float(cycle4),
            "cycle5": float(cycle5), "chordal": chordal}


def _count_graphs_from_adjs(adjs, target: str,
                            legacy_triangle_scale: bool) -> List[Graph]:
    """Build Graphs with substructure-count targets from dense boolean
    adjacencies.  Targets are std-normalized per column (the
    randomgraph.mat convention); the legacy single-triangle path keeps
    the original fixed /10 scale for benchmark continuity."""
    if target != "all" and target not in SUBSTRUCTURES:
        raise ValueError(f"unknown target {target!r}; "
                         f"choose from {SUBSTRUCTURES + ('all',)}")
    names = SUBSTRUCTURES if target == "all" else (target,)
    graphs, counts = [], []
    for adj in adjs:
        adj = np.asarray(adj).astype(bool)
        np.fill_diagonal(adj, False)
        ei = np.stack(np.nonzero(adj)).astype(np.int64)
        if ei.shape[1] == 0:
            continue
        c = count_substructures(adj)
        counts.append([c[k] for k in names])
        graphs.append(Graph(
            x=np.zeros((adj.shape[0], 1), dtype=np.int64),
            edge_index=ei, edge_attr=None,
            y=None))  # filled below once normalization is known
    counts = np.asarray(counts, dtype=np.float64)
    if legacy_triangle_scale and target == "triangle":
        scale = np.array([10.0])
    else:
        scale = np.maximum(counts.std(axis=0), 1e-8)
    ys = (counts / scale).astype(np.float32)
    for g, y in zip(graphs, ys):
        g.y = y
    return graphs


def synthetic_subgraphcount(n_graphs: int = 512, seed: int = 3,
                            n_lo: int = 10, n_hi: int = 30,
                            target: str = "triangle") -> List[Graph]:
    """Substructure-counting dataset in the style of the reference's
    dataset/subgraphcount (whose raw randomgraph.mat blob is stripped from
    the snapshot, reference .MISSING_LARGE_BLOBS:1-2): random graphs with
    per-graph substructure counts as the regression target.

    ``target`` is one of SUBSTRUCTURES or "all" (all six as a 6-task
    regression).  The default "triangle" keeps the legacy fixed /10
    normalization; other targets are normalized by the per-target std
    over the generated set (the randomgraph.mat convention).
    """
    rng = np.random.default_rng(seed)
    adjs = []
    for _ in range(n_graphs):
        n = int(rng.integers(n_lo, n_hi + 1))
        p = float(rng.uniform(0.1, 0.3))
        adj = rng.random((n, n)) < p
        adj = np.triu(adj, 1)
        adjs.append(adj | adj.T)
    return _count_graphs_from_adjs(adjs, target, legacy_triangle_scale=True)


def load_subgraphcount(
        path: str = "/root/reference/dataset/subgraphcount/raw/"
                    "randomgraph.mat",
        target: str = "all") -> List[Graph]:
    """Load the real subgraphcount benchmark (Chen et al. randomgraph.mat,
    the blob behind reference dataset/subgraphcount) when the file is
    available.  Only the adjacency cell array 'A' is read; targets are
    recomputed exactly with count_substructures (brute-force-verified
    closed forms), so the loader is independent of which precomputed
    count columns a given .mat revision ships."""
    from scipy.io import loadmat

    mat = loadmat(path)
    adjs = [np.asarray(a.todense() if hasattr(a, "todense") else a)
            for a in np.asarray(mat["A"]).ravel()]
    return _count_graphs_from_adjs(adjs, target, legacy_triangle_scale=False)
