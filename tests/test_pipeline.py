"""Data pipeline (L2) tests: samplers, collation offsets, loaders, cache.

Key invariant: batching is a block-diagonal embedding — running the model
op on a batch must equal running it per graph (the reference delegates
this to PyG's protocol; here the batcher owns it, so it gets its own
oracle tests)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pygho_tpu.backend import indexing
from pygho_tpu.backend.spspmm import spspmm
from pygho_tpu.hodata import (Graph, KhopSampler, I2Sampler, spdsampler,
                              rdsampler, sp_datapreprocess, collate_sparse,
                              batch_to_sparse_dict, ma_datapreprocess,
                              collate_dense, batch_to_dense_dict,
                              SpDataloader, MaDataloader, Sppretransform,
                              ParallelPreprocessDataset)
from pygho_tpu.hodata.datasets import synthetic_zinc, load_sr25, load_csl
from pygho_tpu.honn.sp_operator import KEYSEP

from utils import maxdiff

KEY = f"X{KEYSEP}X{KEYSEP}1{KEYSEP}A{KEYSEP}0"


def _graphs(rng, k=3):
    return synthetic_zinc("train", n_graphs=k, seed=int(rng.integers(1e6)))


def test_khop_sampler_matches_bfs(rng):
    g = _graphs(rng, 1)[0].coalesced()
    out = KhopSampler(g, hop=2)
    tid, feat = out["tupleid"], out["tuplefeat"]
    # root tuples have distance 0
    roots = tid[0] == tid[1]
    assert np.all(feat[roots] == 0)
    assert feat.max() <= 2
    # sorted lexicographically (coalesced invariant)
    h = indexing.indicehash(tid)
    assert np.all(np.diff(h) > 0)
    # brute-force BFS check on a few roots
    import scipy.sparse as ssp
    dist = ssp.csgraph.shortest_path(g.to_scipy_csr(), unweighted=True)
    for r in range(min(3, g.num_nodes)):
        expect = set(np.nonzero(dist[r] <= 2)[0])
        got = set(tid[1][tid[0] == r])
        assert got == expect


def test_i2_sampler(rng):
    g = _graphs(rng, 1)[0].coalesced()
    out = I2Sampler(g, hop=2)
    tid = out["tupleid"]
    h = indexing.indicehash(tid)
    assert np.all(np.diff(h) > 0), "3-tuples must be sorted"
    # parent-edge segment map is consistent
    seg = out["pool2_seg"]
    ei = g.edge_index
    assert np.all(ei[0, seg] == tid[0])
    assert np.all(ei[1, seg] == tid[1])


def test_ma_samplers(rng):
    g = _graphs(rng, 1)[0].coalesced()
    spd = spdsampler(g, hop=2)
    n = g.num_nodes
    assert spd["tuplefeat"].shape == (n * n,)
    assert spd["tuplefeat"].max() <= 3
    rd = rdsampler(g)
    assert rd["tuplefeat"].shape == (n * n, 1)
    assert np.isfinite(rd["tuplefeat"]).all()


def test_collate_block_diagonal(rng):
    """Batch-of-3 spspmm == per-graph spspmm, concatenated."""
    graphs = _graphs(rng, 3)
    pre = Sppretransform(KhopSampler, [""], [KEY])
    datas = [pre(g) for g in graphs]
    batch = collate_sparse(datas, [KEY], [""], num_graphs=4)
    dd = batch_to_sparse_dict(batch)
    A, X = dd["A"], dd["X"]
    out = spspmm(X.tuplewiseapply(lambda v: v.astype(jnp.float32)[:, None]),
                 1, A.tuplewiseapply(
                     lambda v: jnp.ones_like(v, jnp.float32)[:, None]),
                 0, "sum",
                 acd=jnp.asarray(batch[f"{KEY}{KEYSEP}acd"]), tarX=X)
    got = np.asarray(out.values)

    # oracle: per-graph
    offset = 0
    for d in datas:
        n = d["num_nodes"]
        tid = d["tupleid"]
        dX = np.zeros((n, n), np.float32)
        dX[tid[0], tid[1]] = d["tuplefeat"].astype(np.float32)
        dA = np.zeros((n, n), np.float32)
        dA[d["edge_index"][0], d["edge_index"][1]] = 1.0
        full = dX @ dA
        expect = full[tid[0], tid[1]]
        nt = d["num_tuples"]
        assert maxdiff(got[offset:offset + nt, 0], expect) < 1e-4
        offset += nt


def test_collate_pads_and_masks(rng):
    graphs = _graphs(rng, 3)
    pre = Sppretransform(KhopSampler, [""], [KEY])
    batch = collate_sparse([pre(g) for g in graphs], [KEY], [""],
                           num_graphs=8)
    assert batch["graph_mask"].sum() == 3
    assert batch["y"].shape[0] == 8
    N = int(batch["num_nodes"])
    assert np.all(batch["batch"][:N] < 3)
    assert np.all(batch["batch"][N:] == 8)
    assert np.all(batch["edge_index"][:, int(batch["num_edges"]):]
                  == indexing.PAD_INDEX)


def test_dense_collate_matches_sparse_pattern(rng):
    graphs = _graphs(rng, 2)
    spdatas = [sp_datapreprocess(g, [KhopSampler], [""], []) for g in graphs]
    madatas = [ma_datapreprocess(g, [spdsampler], [""]) for g in graphs]
    mb = collate_dense(madatas, [""], num_graphs=2)
    dd = batch_to_dense_dict(mb)
    for g_i, g in enumerate(graphs):
        n = g.num_nodes
        assert bool(np.asarray(dd["x"].mask)[g_i, :n].all())
        assert not np.asarray(dd["x"].mask)[g_i, n:].any()
        # adjacency data matches edges
        ei = spdatas[g_i]["edge_index"]
        assert np.asarray(dd["A"].mask)[g_i, ei[0], ei[1]].all()


def test_dataloader_stable_buckets(rng):
    graphs = _graphs(rng, 32)
    pre = Sppretransform(KhopSampler, [""], [KEY])
    datas = [pre(g) for g in graphs]
    dl = SpDataloader(datas, batch_size=8, keys=[KEY], shuffle=True,
                      drop_last=True, device_put=False, prefetch=0)
    shapes = set()
    for _ in range(3):
        for b in dl:
            shapes.add(tuple(b["tupleid"].shape))
    # buckets only grow -> stabilize quickly
    assert len(shapes) <= 2, shapes


def test_preprocess_cache(tmp_path, rng):
    graphs = _graphs(rng, 4)
    pre = Sppretransform(KhopSampler, [""], [KEY])
    ds1 = ParallelPreprocessDataset(str(tmp_path), graphs, pre, 0)
    assert os.path.exists(ds1.cache_path)
    ds2 = ParallelPreprocessDataset(str(tmp_path), graphs, pre, 0)
    assert len(ds2) == 4
    assert np.array_equal(ds1[0]["tupleid"], ds2[0]["tupleid"])


def test_load_bundled_sr25():
    graphs = load_sr25()
    assert len(graphs) == 15
    # strongly regular (25, 12, 5, 6): every graph 25 nodes, degree 12
    for g in graphs[:3]:
        assert g.num_nodes == 25
        deg = np.bincount(g.edge_index[0], minlength=25)
        assert np.all(deg == 12)


def test_load_bundled_csl():
    graphs = load_csl()
    assert len(graphs) == 150
    ys = np.array([int(g.y[0]) for g in graphs])
    assert len(np.unique(ys)) == 10


def test_multi_annotate_pipeline(rng):
    """Two tuple samplers with distinct annotations flow through
    preprocessing, collation and tensor assembly (reference supports
    sampler lists via annotate, Wrapper.py:30-56)."""
    from functools import partial

    graphs = _graphs(rng, 3)
    keyA = f"X1{KEYSEP}X1{KEYSEP}1{KEYSEP}A{KEYSEP}0"
    pre = Sppretransform(
        [partial(KhopSampler, hop=1), partial(KhopSampler, hop=2)],
        ["1", "2"], [keyA])
    datas = [pre(g) for g in graphs]
    assert "tupleid1" in datas[0] and "tupleid2" in datas[0]
    batch = collate_sparse(datas, [keyA], ["1", "2"], num_graphs=4)
    dd = batch_to_sparse_dict(batch, ["1", "2"])
    assert dd["X1"].nnz_pad > 0 and dd["X2"].nnz_pad > 0
    # hop-2 tuples strictly superset of hop-1
    assert int(dd["X2"].nnz) > int(dd["X1"].nnz)
    # acd for the annotated key exists and is padded
    assert batch[f"{keyA}{KEYSEP}acd"].shape[0] == 3


def test_k_hop_subgraph_matches_spd_oracle():
    """k_hop_subgraph vs an independent scipy shortest-path oracle."""
    import scipy.sparse as ssp
    from pygho_tpu.hodata.sp_sampler import k_hop_subgraph

    rng = np.random.default_rng(3)
    n = 30
    dense = (rng.random((n, n)) > 0.85)
    dense = dense | dense.T
    np.fill_diagonal(dense, False)
    src, dst = np.nonzero(dense)
    ei = np.stack([src, dst]).astype(np.int64)
    spd = ssp.csgraph.shortest_path(ssp.csr_matrix(dense), directed=False,
                                    unweighted=True)
    for root in (0, 7, [2, 11]):
        for hop in (1, 2, 3):
            subset, sub_ei, inv, emask, dist = k_hop_subgraph(
                root, hop, ei, num_nodes=n)
            roots = np.atleast_1d(np.asarray(root))
            d_oracle = spd[roots].min(axis=0)
            expect = np.sort(np.nonzero(d_oracle <= hop)[0])
            assert np.array_equal(subset, expect)
            assert np.array_equal(dist, d_oracle[subset].astype(np.int64))
            assert np.array_equal(subset[inv], roots)
            # undirected: retained edges = both endpoints in subset
            in_sub = np.isin(ei[0], subset) & np.isin(ei[1], subset)
            assert np.array_equal(emask, in_sub)
            assert np.array_equal(sub_ei, ei[:, in_sub])
    # relabel: edges map onto range(len(subset))
    subset, sub_ei, _, _, _ = k_hop_subgraph(0, 2, ei, relabel_nodes=True,
                                             num_nodes=n)
    if sub_ei.size:
        assert sub_ei.max() < subset.shape[0] and sub_ei.min() >= 0
        assert np.array_equal(subset[sub_ei],
                              k_hop_subgraph(0, 2, ei, num_nodes=n)[1])


def test_padding_stats_reports_bucket_waste():
    from functools import partial

    from pygho_tpu.hodata import (Sppretransform, SpDataloader,
                                  padding_stats)
    from pygho_tpu.hodata.sp_sampler import KhopSampler
    from pygho_tpu.hodata.datasets import synthetic_zinc
    from pygho_tpu.honn import parse_precomputekey
    from pygho_tpu.models import make_sp_model

    model = make_sp_model("NGNN", num_layer=1, hiddim=16)
    keys = parse_precomputekey(model)
    datas = [Sppretransform(partial(KhopSampler, hop=2), [""], keys)(g)
             for g in synthetic_zinc("train", 32)]
    dl = SpDataloader(datas, 16, keys, device_put=False, prefetch=0)
    stats = padding_stats(next(iter(dl)))
    for name in ("nodes", "edges", "tuples"):
        assert name in stats, stats.keys()
    for name, st in stats.items():
        assert st["real"] <= st["padded"], (name, st)
        # the bucket policy bounds waste at < ~25% (+1 graph of slack for
        # the batch remainder)
        assert st["waste"] < 0.35, (name, st)


# ------------------------------------------------------- substructure counts


def _brute_force_counts(adj):
    """Independent brute-force non-induced subgraph counts (n <= 8)."""
    import itertools

    n = adj.shape[0]
    tri = tailed = star = diamond = 0
    for a, b, c in itertools.combinations(range(n), 3):
        if adj[a, b] and adj[b, c] and adj[a, c]:
            tri += 1
            for v in (a, b, c):
                tailed += int(adj[v].sum()) - 2
    for v in range(n):
        nbrs = np.nonzero(adj[v])[0]
        star += sum(1 for _ in itertools.combinations(nbrs, 3))
    for i, j in itertools.combinations(range(n), 2):
        if adj[i, j]:
            t = int((adj[i] & adj[j]).sum())
            diamond += t * (t - 1) // 2

    def cycles(k):
        cnt = 0
        for seq in itertools.permutations(range(n), k):
            if all(adj[seq[i], seq[(i + 1) % k]] for i in range(k)):
                cnt += 1
        return cnt // (2 * k)

    return {"triangle": tri, "tailed_triangle": tailed, "star": star,
            "cycle4": cycles(4), "cycle5": cycles(5), "chordal": diamond}


def test_count_substructures_vs_brute_force():
    from pygho_tpu.hodata.datasets import count_substructures

    rng = np.random.default_rng(7)
    for case in range(25):
        n = int(rng.integers(4, 9))
        adj = rng.random((n, n)) < rng.uniform(0.2, 0.7)
        adj = np.triu(adj, 1)
        adj = adj | adj.T
        got = count_substructures(adj)
        want = _brute_force_counts(adj)
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6, (case, k, got[k], want[k])


def test_synthetic_subgraphcount_targets():
    from pygho_tpu.hodata.datasets import (SUBSTRUCTURES,
                                           synthetic_subgraphcount)

    legacy = synthetic_subgraphcount(n_graphs=8)
    assert all(g.y.shape == (1,) for g in legacy)
    multi = synthetic_subgraphcount(n_graphs=32, target="all")
    assert all(g.y.shape == (len(SUBSTRUCTURES),) for g in multi)
    ys = np.stack([g.y for g in multi])
    # std-normalized targets have O(1) spread per column
    assert np.all(ys.std(0) > 0.2) and np.all(ys.std(0) < 5.0)
    with pytest.raises(ValueError):
        synthetic_subgraphcount(n_graphs=2, target="pentagon")


def test_load_subgraphcount_mat(tmp_path):
    """Round-trip the randomgraph.mat loader on a fabricated .mat file
    (the real blob is stripped from the reference snapshot)."""
    from scipy.io import savemat

    from pygho_tpu.hodata.datasets import (count_substructures,
                                           load_subgraphcount)

    rng = np.random.default_rng(11)
    adjs = []
    for _ in range(6):
        n = int(rng.integers(6, 12))
        a = rng.random((n, n)) < 0.4
        a = np.triu(a, 1)
        adjs.append((a | a.T).astype(np.float64))
    cell = np.empty((1, len(adjs)), dtype=object)
    for i, a in enumerate(adjs):
        cell[0, i] = a
    p = str(tmp_path / "randomgraph.mat")
    savemat(p, {"A": cell})
    gs = load_subgraphcount(p, target="all")
    assert len(gs) == len(adjs)
    # per-graph structure preserved + targets = std-normalized exact counts
    raw = np.array([[count_substructures(a.astype(bool))[k]
                     for k in ("triangle", "tailed_triangle", "star",
                               "cycle4", "cycle5", "chordal")]
                    for a in adjs])
    scale = np.maximum(raw.std(0), 1e-8)
    got = np.stack([g.y for g in gs])
    assert np.allclose(got, raw / scale, atol=1e-5)
    assert gs[0].num_edges == int(adjs[0].sum())


def test_load_zinc_fixture():
    """load_zinc parses the standard PyG ZINC raw format (fixture
    checked in at tests/fixtures/zinc): pickled molecule dicts with
    torch tensors + subset .index files (reference example/zinc.py:96-105
    consumes the same files through PyG)."""
    from functools import partial

    from pygho_tpu.hodata.datasets import load_zinc

    root = os.path.join(os.path.dirname(__file__), "fixtures", "zinc")
    trn = load_zinc(root, "train", subset=True)
    assert len(trn) == 3          # .index selects 0,2,4 of 6
    full = load_zinc(root, "train", subset=False)
    assert len(full) == 6
    for g in full:
        n = g.x.shape[0]
        assert g.x.ndim == 2 and g.x.dtype == np.int64
        assert 0 <= g.x.min() and g.x.max() < 21
        ei = g.edge_index
        assert ei.shape[0] == 2 and ei.max() < n
        # symmetric bonds, sorted directed pairs, integer orders 1-3
        pairs = set(map(tuple, ei.T.tolist()))
        assert all((b, a) in pairs for a, b in pairs)
        assert np.all(np.lexsort((ei[1], ei[0])) == np.arange(ei.shape[1]))
        assert g.edge_attr.dtype == np.int64
        assert 1 <= g.edge_attr.min() and g.edge_attr.max() <= 3
        assert g.y.shape == (1,) and g.y.dtype == np.float32
    # subset indices are honored (graph 0 of subset == graph 0 of full)
    assert np.array_equal(trn[1].x, full[2].x)
    # and the loaded graphs flow through the real preprocessing path
    from pygho_tpu.hodata import Sppretransform, collate_sparse
    from pygho_tpu.hodata.sp_sampler import KhopSampler

    keys = ["X___A___1___X___0"]
    pre = Sppretransform(partial(KhopSampler, hop=2), [""], keys)
    datas = [pre(g) for g in trn]
    batch = collate_sparse(datas, keys, num_graphs=len(datas))
    assert int(batch["num_tuples"]) > 0
