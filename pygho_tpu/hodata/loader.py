"""Dataloaders + pre-transform builders (reference pygho/hodata/Wrapper.py).

A loader shuffles per epoch, collates with stable shape buckets (padding
sizes only grow, so jit recompiles a handful of times in epoch 1 and then
never again) and optionally double-buffers host->device transfer.
"""

from __future__ import annotations

import functools
import queue
import threading


class Buckets(dict):
    """Monotone, thread-safe bucket registry: concurrent collation workers
    may race on updates, but a bucket can only grow (max-merge on set), so
    the 'padding sizes only grow' invariant holds under concurrency.

    Every actual growth is recorded in ``events`` as ``(key, old, new)``
    — a growth after the first epoch means a late outlier batch forced a
    new padded shape (and therefore a jit recompile on the python-loop
    path).  ``drain_events()`` returns and clears them; training loops
    log the drained events per epoch alongside
    :class:`..utils.metrics.CompileCounter` deltas."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._lock = threading.Lock()
        self.events = []  # (key, old, new) growth records

    def __setitem__(self, key, value):
        with self._lock:
            old = super().get(key, 0)
            if value > old:
                self.events.append((key, old, value))
            super().__setitem__(key, max(value, old))

    def drain_events(self):
        with self._lock:
            ev, self.events = self.events, []
            return ev
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

import numpy as np

from .sp_data import sp_datapreprocess, collate_sparse, batch_to_sparse_dict
from .ma_data import ma_datapreprocess, collate_dense, batch_to_dense_dict


def Sppretransform(tuplesamplers, annotate: Sequence[str] = ("",),
                   keys: Sequence[str] = ("",),
                   relabel: Optional[str] = None):
    """Build the sparse pre-transform fn (reference Wrapper.py:30-56).

    ``relabel="rcm"``: reverse-Cuthill-McKee node reorder per graph
    before sampling — the locality lever for large single graphs whose
    input labels are arbitrary (see sp_datapreprocess docstring).
    Stays in the partial so the preprocess cache fingerprint includes
    it."""
    if callable(tuplesamplers):
        tuplesamplers = [tuplesamplers]
    return functools.partial(sp_datapreprocess,
                             tuplesamplers=tuplesamplers,
                             annotate=tuple(annotate), keys=tuple(keys),
                             relabel=relabel)


def Mapretransform(tuplesamplers, annotate: Sequence[str] = ("",),
                   relabel: Optional[str] = None):
    """Build the dense pre-transform fn (reference Wrapper.py:59-76)."""
    if callable(tuplesamplers):
        tuplesamplers = [tuplesamplers]
    return functools.partial(ma_datapreprocess,
                             tuplesamplers=tuplesamplers,
                             annotate=tuple(annotate), relabel=relabel)


class _BaseLoader:
    def __init__(self, dataset: List[Dict[str, Any]], batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: int = 0, device_put: bool = True,
                 prefetch: int = 2, workers: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.device_put = device_put
        self.prefetch = prefetch
        self.workers = workers  # collation threads (numpy releases the GIL)
        self.buckets: Dict[str, int] = Buckets()

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _collate(self, datas):
        raise NotImplementedError

    def _host_batches(self):
        idx = self._order()
        bs = self.batch_size
        stop = (len(idx) // bs) * bs if self.drop_last else len(idx)
        chunks = [[self.dataset[i] for i in idx[s:s + bs]]
                  for s in range(0, stop, bs)]
        if self.workers <= 1 or len(chunks) <= 1:
            for chunk in chunks:
                yield self._collate(chunk)
            return
        # warm the shared shape buckets on the first batch, then collate
        # the rest concurrently (ordered)
        from concurrent.futures import ThreadPoolExecutor

        yield self._collate(chunks[0])
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            for batch in pool.map(self._collate, chunks[1:]):
                yield batch

    def __iter__(self):
        if self.prefetch <= 0:
            for b in self._host_batches():
                yield self._to_device(b)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()

        def worker():
            try:
                for b in self._host_batches():
                    q.put(b)
            finally:
                q.put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is SENTINEL:
                break
            yield self._to_device(b)

    def _to_device(self, batch):
        if not self.device_put:
            return batch
        import jax

        return jax.tree.map(
            lambda x: jax.device_put(x) if isinstance(x, np.ndarray) else x,
            batch)


def add_spspmm_plans(batch, keys, buckets, geoms_cache,
                     plan_geometry="autotune", plan_dim: int = 128,
                     plan_kind: str = "strip"):
    """Build fused-kernel plans for every precompute key of one
    collated batch (in place: ``batch["<key>___plan"]``).  Shared
    ``buckets``/``geoms_cache`` dicts keep chunk counts and geometry
    stable across batches (and across the shards of one sharded batch).
    Used by SpDataloader(build_plans=True) and
    parallel.collate_sharded_sparse(build_plans=True).

    ``plan_kind``: "strip" (default — the v2 strip-aligned kernel,
    measured 1.4-1.7x the v1 chunk kernel on the ZINC workload, see
    BENCHMARKS.md) or "chunk" (v1).  For "strip", ``plan_geometry``
    "autotune" picks per-role (C, R, S, St, Rv) via the strip cost
    model; "autotune+measure" additionally times the top candidates on
    device and picks the measured winner (one remote compile each —
    for high-reuse plans); explicit tuples must be 5-tuples."""
    from ..backend.indexing import bucket_size
    from ..honn.sp_operator import KEYSEP
    from ..hodata.sp_data import parsekey
    from ..kernels import (build_spspmm_plans, build_spspmm_plans_for,
                           autotune_spspmm_geoms)
    from ..kernels.fused_spspmm import (DEFAULT_C, DEFAULT_R, DEFAULT_S,
                                        suggest_geometry)

    geom = plan_geometry

    def rows_of(op):
        if op[0] == "X":
            return batch[f"tupleid{op[1:]}"].shape[1]
        return batch["edge_index"].shape[1]

    if plan_kind == "strip":
        from ..kernels.strip_spspmm import (autotune_strip_geoms,
                                            build_spspmm_strip_plans)

        for key in keys:
            if not key:
                continue
            op0, op1, _, op2, _ = parsekey(key)
            acd = batch[f"{key}{KEYSEP}acd"]
            if geom in ("autotune", "auto", "autotune+measure"):
                gname = f"strip{key}"
                if gname not in geoms_cache:
                    # "+measure": top-6 cost-ranked candidates timed on
                    # device with their real plans (one remote compile
                    # each) — for plans reused many times; the analytic
                    # model alone mispredicts DMA/compute overlap on
                    # fragmented giant graphs (BENCHMARKS r5 giant-pv).
                    # Timed with the math mode that will actually train
                    # (fast bf16 halves DMA bytes and regroups views —
                    # a different overlap point than exact f32); the
                    # plain cost-ranked path keeps exact=True (billing
                    # is mode-independent since the mixed-dot change).
                    if geom == "autotune+measure":
                        from ..kernels.fused_spspmm import get_fused_math

                        geoms_cache[gname] = autotune_strip_geoms(
                            acd, rows_of(op1), rows_of(op2),
                            rows_of(op0), D=plan_dim,
                            exact=get_fused_math(), measure=6)
                    else:
                        geoms_cache[gname] = autotune_strip_geoms(
                            acd, rows_of(op1), rows_of(op2),
                            rows_of(op0), D=plan_dim)
                geoms = geoms_cache[gname]
            elif isinstance(geom, str):
                raise ValueError(f"unknown plan_geometry {geom!r}")
            else:
                geoms = {r: tuple(geom) for r in ("fwd", "dx", "da")}
            plans = build_spspmm_strip_plans(
                acd, rows_of(op1), rows_of(op2), rows_of(op0), geoms)
            k_real = int(np.sum(np.asarray(acd[0]) < (1 << 30)))
            # fragmentation guard: skip when the average sub-chunk slot
            # holds < 8 triples (empty slots are cheaper here than v1
            # chunks — their matmul lanes are batched with real work) —
            # but only at sizes where the kernel/XLA choice matters
            if (plans[0].n_chunks > 128
                    and plans[0].n_chunks * 8 > max(k_real, 1)):
                continue
            # COMMON per-block step tables (the v7 stacking mechanism,
            # strip_spspmm.build_strip_plan ``steps_per_block``): every
            # batch of a padding bucket shares oblk — hence
            # launch_splits (pytree META) — so chained stacking works
            # even when plans need Mosaic's multi-launch split (plans
            # padded only to a common TOTAL step count stacked fine
            # single-launch but diverged on split boundaries: observed
            # on PPGN-sparse X___X plans, 896 steps -> 2 launches).
            # Tables grow elementwise-max across batches like any other
            # bucket; warm one epoch before stacking (zinc_tpu does).
            spb = {}
            for role, p in zip(("fwd", "dx", "da"), plans):
                nb = p.out_rows // p.S
                tname = f"planspb{key}{role}n{nb}"
                nat = np.bincount(np.asarray(p.oblk), minlength=nb)
                # round the per-block counts up a little so near-miss
                # batches don't each grow the table by one
                nat = np.maximum(nat, 1)
                prev = geoms_cache.get(tname)
                tbl = (nat if prev is None
                       else np.maximum(prev, nat))
                geoms_cache[tname] = tbl
                # growth telemetry rides the int bucket store
                buckets[f"planspb{key}{role}"] = int(tbl.sum())
                spb[role] = tbl
            batch[f"{key}{KEYSEP}plan"] = build_spspmm_strip_plans(
                acd, rows_of(op1), rows_of(op2), rows_of(op0), geoms,
                steps_per_block_to=spb)
        return

    for key in keys:
        if not key:
            continue
        op0, op1, _, op2, _ = parsekey(key)
        acd = batch[f"{key}{KEYSEP}acd"]
        geoms = None
        if geom == "autotune":
            # per-role geometry from the calibrated cost model, picked
            # once per key on the first batch (bucketed shapes keep
            # later batches statistically alike)
            gname = f"tuned{key}"
            if gname not in geoms_cache:
                geoms_cache[gname] = autotune_spspmm_geoms(
                    acd, rows_of(op1), rows_of(op2), rows_of(op0),
                    D=plan_dim)
            geoms = geoms_cache[gname]
        elif geom == "auto":
            gname = f"geom{key}"
            if gname not in geoms_cache:
                geoms_cache[gname] = suggest_geometry(acd)
            C, R, S = geoms_cache[gname]
        elif isinstance(geom, str):
            raise ValueError(
                f"unknown plan_geometry {geom!r}: expected 'auto', "
                f"'autotune', a (C, R, S) tuple, or None")
        else:
            C, R, S = geom or (DEFAULT_C, DEFAULT_R, DEFAULT_S)
        if geoms is not None:
            plans = build_spspmm_plans_for(
                acd, rows_of(op1), rows_of(op2), rows_of(op0), geoms)
        else:
            plans = build_spspmm_plans(acd, rows_of(op1), rows_of(op2),
                                       rows_of(op0), C, R, S)
        # fragmentation guard: if the triples have no window locality
        # (expander-like graphs), tiny chunks make the fused kernel
        # slower than XLA — skip the plan and let the operator fall
        # back (consider hodata.graph.rcm_reorder at preprocessing)
        k_real = int(np.sum(np.asarray(acd[0]) < (1 << 30)))
        if plans[0].n_chunks * 32 > max(k_real, 1):
            continue
        # stabilize chunk counts across batches
        n = max(p.n_chunks for p in plans)
        pad = max(bucket_size(n, 8), buckets.get(f"plan{key}", 0))
        buckets[f"plan{key}"] = pad
        if geoms is not None:
            plans = build_spspmm_plans_for(
                acd, rows_of(op1), rows_of(op2), rows_of(op0), geoms,
                pad_chunks_to=pad)
        else:
            plans = build_spspmm_plans(acd, rows_of(op1), rows_of(op2),
                                       rows_of(op0), C, R, S,
                                       pad_chunks_to=pad)
        batch[f"{key}{KEYSEP}plan"] = plans


# telemetry: single-launch attention plans that fell back to two-launch
ATT_PLAN_FALLBACKS = {"count": 0}


def add_attention_plans(batch, keys, buckets, geoms_cache,
                        plan_dim: int = 128, plan_kind: str = "strip",
                        single_launch: bool = True):
    """Build the fused-kernel plans the fused NGAT attention path
    consumes.

    Default (``single_launch``): ONE strip-plan triple on the raw
    (a, c, d) triples (``batch["<key>___attplan1"]``) driving
    kernels.strip_attention.fused_attention_strip — the whole
    score/softmax/aggregate chain in one launch per pass.  Falls back
    per batch to the two-launch plans (``batch["<key>___attplan"]``,
    score stage (k, c, d) + aggregate stage (a, c, k) with softmax on
    XLA) when the single-launch planner cannot cover the geometry
    (fragmented windows needing Gv>1, or a >512-step output block).

    Shares the bucket/geometry caching discipline of add_spspmm_plans.
    """
    from ..backend.indexing import PAD_INDEX, bucket_size
    from ..honn.sp_operator import KEYSEP
    from ..hodata.sp_data import parsekey
    from ..kernels.strip_spspmm import (StripPlanError,
                                        autotune_strip_geoms,
                                        build_spspmm_strip_plans)
    from ..kernels.strip_attention import (autotune_attention_geoms,
                                           build_attention_strip_plans)

    assert plan_kind == "strip", "attention plans ride the strip kernel"
    for key in keys:
        if not key:
            continue
        op0, op1, _, op2, _ = parsekey(key)
        acd = np.asarray(batch[f"{key}{KEYSEP}acd"])
        K_pad = acd.shape[1]
        if single_launch:
            x_rows1 = batch[f"tupleid{op1[1:]}"].shape[1]
            e_rows1 = (batch["edge_index"].shape[1] if op2 == "A"
                       else batch[f"tupleid{op2[1:]}"].shape[1])
            # batch-constant softmax-denominator guard, precomputed on
            # host: the conv otherwise segment-reduces a ones column
            # over all acd rows EVERY layer (r3 VERDICT item 6 — part
            # of the unexplained per-layer wrapper cost)
            a_real = acd[0][acd[0] < PAD_INDEX]
            batch[f"{key}{KEYSEP}nonempty"] = (
                np.bincount(a_real, minlength=x_rows1) > 0)
            try:
                gname = f"att1{key}"
                if gname not in geoms_cache:
                    geoms_cache[gname] = autotune_attention_geoms(
                        acd, x_rows1, e_rows1, D=plan_dim)
                p = build_attention_strip_plans(acd, x_rows1, e_rows1,
                                                geoms_cache[gname])
                pads = {}
                for role, pp in zip(("fwd", "dx", "da"), p):
                    pad = max(bucket_size(pp.n_steps, 8),
                              buckets.get(f"att1{key}{role}", 0))
                    buckets[f"att1{key}{role}"] = pad
                    pads[role] = pad
                batch[f"{key}{KEYSEP}attplan1"] = \
                    build_attention_strip_plans(
                        acd, x_rows1, e_rows1, geoms_cache[gname],
                        pad_steps_to=pads)
                continue
            except (AssertionError, StripPlanError) as ex:
                # geometry not coverable (e.g. one output block beyond
                # the Mosaic grid ceiling — StripPlanError since r4, it
                # survives python -O): two-launch fallback (counted so
                # runs can attribute the extra launches/recompiles)
                import warnings

                ATT_PLAN_FALLBACKS["count"] += 1
                warnings.warn(
                    f"attention single-launch planner fell back to the "
                    f"two-launch path for key {key!r}: {ex}")
        x_rows = batch[f"tupleid{op1[1:]}"].shape[1]
        e_rows = (batch["edge_index"].shape[1] if op2 == "A"
                  else batch[f"tupleid{op2[1:]}"].shape[1])
        out_rows = x_rows
        kk = np.where(acd[0] < PAD_INDEX, np.arange(K_pad), PAD_INDEX)
        score_tuv = np.stack([kk, acd[1], acd[2]])
        agg_tuv = np.stack([acd[0], acd[1], kk])
        plans = {}
        for name, tuv, u_rows, v_rows, o_rows in (
                ("score", score_tuv, x_rows, e_rows, K_pad),
                ("agg", agg_tuv, x_rows, K_pad, out_rows)):
            gname = f"att_{name}{key}"
            if gname not in geoms_cache:
                geoms_cache[gname] = autotune_strip_geoms(
                    tuv, u_rows, v_rows, o_rows, D=plan_dim)
            p = build_spspmm_strip_plans(tuv, u_rows, v_rows, o_rows,
                                         geoms_cache[gname])
            pads = {}
            for role, pp in zip(("fwd", "dx", "da"), p):
                pad = max(bucket_size(pp.n_steps, 8),
                          buckets.get(f"att{name}{key}{role}", 0))
                buckets[f"att{name}{key}{role}"] = pad
                pads[role] = pad
            plans[name] = build_spspmm_strip_plans(
                tuv, u_rows, v_rows, o_rows, geoms_cache[gname],
                pad_steps_to=pads)
        batch[f"{key}{KEYSEP}attplan"] = (plans["score"], plans["agg"])


class SpDataloader(_BaseLoader):
    """Sparse batches (reference Wrapper.py:101-132).  Yields collated
    numpy/device dicts; call hodata.batch_to_sparse_dict inside your jit
    step to wrap them into SparseTensors.

    ``build_plans=True`` additionally builds fused-kernel chunk plans for
    every precompute key (datadict["<key>___plan"]), enabling the Pallas
    spspmm path on TPU.  ``plan_geometry`` defaults to "autotune": the
    roofline cost model picks a per-role (C, R, S, Rv) on the first batch
    (kernels.autotune_spspmm_geoms) — pass ``plan_dim`` = the model's
    hidden dim so the compute/DMA balance matches what will actually run.
    ``(C, R, S)`` / None force a fixed geometry; "auto" picks R from
    window-span percentiles only."""

    def __init__(self, dataset, batch_size: int, keys: Sequence[str] = ("",),
                 annotate: Sequence[str] = ("",), build_plans: bool = False,
                 plan_geometry="autotune", plan_dim: int = 128,
                 plan_kind: str = "strip", attention_plans: bool = False,
                 geoms_cache: Optional[dict] = None, **kw):
        super().__init__(dataset, batch_size, **kw)
        self.keys = tuple(keys)
        self.annotate = tuple(annotate)
        self.build_plans = build_plans
        self.plan_geometry = plan_geometry  # geometry|"auto"|"autotune"|None
        self.plan_dim = plan_dim
        self.plan_kind = plan_kind          # "strip" (v2) | "chunk" (v1)
        # fused NGAT attention: True builds the single-launch strip
        # plan triple (___attplan1); "two-launch" forces the two-stage
        # score/aggregate plan pairs (___attplan, softmax on XLA)
        self.attention_plans = attention_plans
        # pass one shared dict to the train/val/test loaders so the
        # autotune (and especially "autotune+measure"'s on-device
        # timing) runs once per geometry, not once per split
        self._geoms: Dict[str, tuple] = (geoms_cache if geoms_cache
                                         is not None else {})

    def _collate(self, datas):
        batch = collate_sparse(datas, self.keys, self.annotate,
                               num_graphs=self.batch_size,
                               buckets=self.buckets)
        if self.build_plans:
            add_spspmm_plans(batch, self.keys, self.buckets, self._geoms,
                             self.plan_geometry, self.plan_dim,
                             self.plan_kind)
        if self.attention_plans:
            add_attention_plans(
                batch, self.keys, self.buckets, self._geoms,
                self.plan_dim,
                single_launch=self.attention_plans != "two-launch")
        return batch


class MaDataloader(_BaseLoader):
    """Dense batches (reference Wrapper.py:135-176).

    With ``denseadj=False`` (SD mode) and ``build_plans=True``, also
    builds fused-kernel chunk plans for the spmamm contractions listed in
    ``plan_dims`` (pairs ``(dim1, dim2)`` matching the model's
    OpSpMessagePassing ops — collect them with
    honn.parse_spmamm_dims(model); an optional third element overrides
    B's masked rank, which otherwise defaults to the tuple tensor's).
    Plans land in ``batch["spmamm___<dim1>___<dim2>___plan"]`` and route
    the SD hot loop through the Pallas kernel (kernels/fused_spmamm.py).
    The ship/skip decision of the chunk-fill guard is latched on the
    first batch so the batch pytree structure stays jit-stable."""

    def __init__(self, dataset, batch_size: int,
                 annotate: Sequence[str] = ("",), denseadj: bool = True,
                 build_plans: bool = False,
                 plan_dims: Sequence[tuple] = ((1, 2),),
                 plan_geometry="autotune", plan_dim: int = 128,
                 plan_kind: str = "chunk",
                 **kw):
        super().__init__(dataset, batch_size, **kw)
        self.annotate = tuple(annotate)
        self.denseadj = denseadj
        self.build_plans = build_plans
        self.plan_dims = tuple(tuple(p) for p in plan_dims)
        self.plan_geometry = plan_geometry
        self.plan_dim = plan_dim
        # "chunk" (v1, the SD default: flat-output fill favors it at
        # molecule scale) | "strip" (v2, giant-graph SD workloads)
        self.plan_kind = plan_kind
        self._geoms: Dict[str, tuple] = {}
        self._plan_skip: Dict[str, bool] = {}

    def _collate(self, datas):
        batch = collate_dense(datas, self.annotate,
                              num_graphs=self.batch_size,
                              buckets=self.buckets, denseadj=self.denseadj)
        if self.build_plans and not self.denseadj:
            masked_ndim = len(
                datas[0][f"tupleshape{self.annotate[0]}"]) + 1
            self._add_spmamm_plans(batch, masked_ndim)
        return batch

    def _add_spmamm_plans(self, batch, masked_ndim: int):
        from ..backend.indexing import bucket_size
        from ..honn.sp_operator import KEYSEP
        from ..kernels.fused_spmamm import (build_spmamm_plans,
                                            spmamm_triples)
        from ..kernels import autotune_spspmm_geoms

        bsz, n_pad = batch["x"].shape[:2]
        counts = batch["node_mask"].sum(1).astype(np.int64)
        nnz_pad = batch["A_indices"].shape[1]
        for dims in self.plan_dims:
            dim1, dim2 = dims[0], dims[1]
            mnd = dims[2] if len(dims) > 2 else masked_ndim
            key = f"spmamm{KEYSEP}{dim1}{KEYSEP}{dim2}{KEYSEP}plan"
            if self._plan_skip.get(key):
                continue
            tuv = spmamm_triples(batch["A_indices"], dim1, n_pad,
                                 counts, mnd - 2)
            geom = self.plan_geometry
            if geom == "autotune":
                gname = f"tuned{self.plan_kind}{key}"
                if gname not in self._geoms:
                    rows = bsz * n_pad ** (mnd - 1)
                    if self.plan_kind == "strip":
                        from ..kernels.strip_spspmm import \
                            autotune_strip_geoms
                        self._geoms[gname] = autotune_strip_geoms(
                            tuv, nnz_pad, rows, rows, D=self.plan_dim)
                    else:
                        self._geoms[gname] = autotune_spspmm_geoms(
                            tuv, nnz_pad, rows, rows, D=self.plan_dim)
                geom = self._geoms[gname]
            plans = build_spmamm_plans(
                batch["A_indices"], nnz_pad, dim1, n_pad, bsz, mnd,
                counts, D=self.plan_dim, geometry=geom, tuv=tuv,
                kind=self.plan_kind)
            # fill guard: the flat SD output space is mostly padding at
            # molecule scale, which caps chunks at ~1 output block each
            # (measured: fused 2.5 ms vs densify 0.73 ms on ZINC SD).
            # Ship plans only when average chunk fill is >= 50% — the
            # over-budget giant-graph regime the fused path exists for.
            # Latched on the first batch: a per-batch flip would change
            # the batch pytree structure and force a jit recompile.
            if key not in self._plan_skip:
                self._plan_skip[key] = bool(
                    plans[0].n_chunks * plans[0].C
                    > 2 * max(tuv.shape[1], 1))
            if self._plan_skip[key]:
                continue
            if self.plan_kind == "strip":
                pad = {}
                for role, pp in zip(("fwd", "dx", "da"), plans):
                    pk = f"plan{key}{role}"
                    pad[role] = max(bucket_size(pp.n_steps, 8),
                                    self.buckets.get(pk, 0))
                    self.buckets[pk] = pad[role]
            else:
                n = max(p.n_chunks for p in plans)
                pad = max(bucket_size(n, 8),
                          self.buckets.get(f"plan{key}", 0))
                self.buckets[f"plan{key}"] = pad
            plans = build_spmamm_plans(
                batch["A_indices"], nnz_pad, dim1, n_pad, bsz, mnd,
                counts, D=self.plan_dim, geometry=geom, pad_chunks_to=pad,
                tuv=tuv, kind=self.plan_kind)
            batch[key] = plans


def padding_stats(batch: Dict[str, Any]) -> Dict[str, Dict[str, float]]:
    """Padding-waste report for one collated sparse batch (SURVEY.md §7.2
    hard part #1: bucketed static shapes target < ~25% waste per array).

    Returns ``{name: {"real": r, "padded": p, "waste": 1 - r/p}}`` for the
    node/edge/tuple/acd arrays present in the batch."""
    from ..backend.indexing import PAD_INDEX

    out: Dict[str, Dict[str, float]] = {}

    def rec(name, real, padded):
        real, padded = int(real), int(padded)
        out[name] = {"real": real, "padded": padded,
                     "waste": 1.0 - real / max(padded, 1)}

    if "num_nodes" in batch:
        rec("nodes", batch["num_nodes"], batch["x"].shape[0])
    if "num_edges" in batch:
        rec("edges", batch["num_edges"], batch["edge_index"].shape[1])
    for k in batch:
        if k.startswith("num_tuples"):
            ann = k[len("num_tuples"):]
            rec(f"tuples{ann}", batch[k], batch[f"tupleid{ann}"].shape[1])
        if k.endswith("___acd"):
            a = np.asarray(batch[k][0])
            rec(k, int(np.sum(a < PAD_INDEX)), a.shape[0])
    return out
