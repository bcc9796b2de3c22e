"""Serving utilities: batched prediction over raw graphs, and
ahead-of-time export of a frozen-weight forward as a portable
StableHLO artifact (jax.export).

The reference has no serving story — its examples are training scripts
only (reference example/zinc.py, example/minimal.py; SURVEY.md §2.5) —
so this module is net-new TPU-native surface:

- ``SpPredictor`` / ``MaPredictor`` own the full host pipeline for
  inference: tuple-sampler precompute → bucket-padded collation (shared
  shape buckets across calls, so recompiles stay bounded) → jitted
  eval-mode forward → unpad, preserving input order.
- ``export_forward`` serializes the jitted forward with the weights
  baked in as constants; ``load_exported`` runs it without any model
  code (the deployment artifact for a fixed bucket signature).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
from flax import nnx

__all__ = ["SpPredictor", "MaPredictor", "export_forward",
           "load_exported", "ExportedForward"]


def _unpad(pred: np.ndarray, batch: Dict[str, Any]) -> np.ndarray:
    mask = np.asarray(batch["graph_mask"]).astype(bool)
    return pred[: int(mask.sum())]


class _HostPool:
    """Persistent spawn-based process pool for host-side tuple
    precompute.  Spawn (not fork): the parent holds a live TPU/tunnel
    client whose threads must not be forked; workers only run
    numpy/scipy transforms and never touch a device."""

    def __init__(self, num_workers: int):
        self.num_workers = num_workers
        self._executor = None

    def map(self, fn, items):
        from concurrent.futures import ProcessPoolExecutor

        if self._executor is None:
            import multiprocessing

            self._executor = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"))
        chunk = max(1, len(items) // (4 * self.num_workers))
        return list(self._executor.map(fn, items, chunksize=chunk))

    def shutdown(self):
        if self._executor is not None:
            self._executor.shutdown(wait=False)
            self._executor = None


class SpPredictor:
    """Order-preserving batched inference for sparse models.

    ``predictor = SpPredictor(model, KhopSampler partial, keys)`` then
    ``predictor(graphs) -> (len(graphs), num_tasks)``.  ``keys`` are the
    model's precompute keys (``parse_precomputekey(model)``); pass
    ``build_plans=True`` + ``plan_dim`` to route through the fused
    Pallas kernel on TPU.

    ``num_workers > 0`` starts a persistent *spawn* process pool for the
    host precompute — spawn re-imports ``__main__``, so scripts that
    build a predictor at module top level must guard it behind
    ``if __name__ == "__main__":``.  Call :meth:`close` (or use the
    predictor as a context manager) to release the pool.
    """

    def __init__(self, model: nnx.Module, tuplesamplers,
                 keys: Sequence[str], annotate: Sequence[str] = ("",),
                 batch_size: int = 128, build_plans: bool = False,
                 plan_dim: int = 128, num_workers: int = 0):
        from ..hodata.loader import Sppretransform, Buckets
        from ..hodata.sp_data import batch_to_sparse_dict

        self.model = model
        self.pre = Sppretransform(tuplesamplers, annotate, keys)
        self.keys = tuple(keys)
        self.annotate = tuple(annotate)
        self.batch_size = batch_size
        self.build_plans = build_plans
        self.plan_dim = plan_dim
        self._buckets = Buckets()
        self._geoms: Dict[str, tuple] = {}
        self._pool = _HostPool(num_workers) if num_workers > 0 else None

        @nnx.jit
        def forward(model, batch):
            dd = batch_to_sparse_dict(batch, self.annotate)
            return model(dd)

        self._forward = forward

    def _loader(self, datas: List[Dict[str, Any]]):
        from ..hodata.loader import SpDataloader

        loader = SpDataloader(datas, self.batch_size, self.keys,
                              self.annotate, build_plans=self.build_plans,
                              plan_dim=self.plan_dim, shuffle=False,
                              drop_last=False)
        loader.buckets = self._buckets   # persist shape buckets
        loader._geoms = self._geoms      # and autotuned plan geometries
        return loader

    def preprocess(self, graphs) -> List[Dict[str, Any]]:
        """Host-side tuple precompute (reusable across calls); runs on
        the persistent worker pool when ``num_workers > 0``."""
        graphs = list(graphs)
        if self._pool is not None and len(graphs) > 1:
            return self._pool.map(self.pre, graphs)
        return [self.pre(g) for g in graphs]

    def __call__(self, graphs) -> np.ndarray:
        datas = graphs if graphs and isinstance(graphs[0], dict) \
            else self.preprocess(graphs)
        self.model.eval()
        preds = []
        for batch in self._loader(datas):
            preds.append(_unpad(np.asarray(
                self._forward(self.model, batch)), batch))
        return np.concatenate(preds, axis=0)

    def close(self):
        """Shut down the host precompute pool (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class MaPredictor:
    """Dense (masked) counterpart of :class:`SpPredictor`.  The
    ``num_workers`` pool semantics (spawn + ``__main__`` guard +
    :meth:`close`) match :class:`SpPredictor`."""

    def __init__(self, model: nnx.Module, tuplesamplers,
                 annotate: Sequence[str] = ("",), batch_size: int = 128,
                 denseadj: bool = True, num_workers: int = 0):
        from ..hodata.loader import Mapretransform, Buckets
        from ..hodata.ma_data import batch_to_dense_dict

        self.model = model
        self.pre = Mapretransform(tuplesamplers, annotate)
        self.annotate = tuple(annotate)
        self.batch_size = batch_size
        self.denseadj = denseadj
        self._buckets = Buckets()
        self._pool = _HostPool(num_workers) if num_workers > 0 else None

        @nnx.jit
        def forward(model, batch):
            dd = batch_to_dense_dict(batch, self.annotate)
            return model(dd)

        self._forward = forward

    def preprocess(self, graphs) -> List[Dict[str, Any]]:
        graphs = list(graphs)
        if self._pool is not None and len(graphs) > 1:
            return self._pool.map(self.pre, graphs)
        return [self.pre(g) for g in graphs]

    def __call__(self, graphs) -> np.ndarray:
        from ..hodata.loader import MaDataloader

        datas = graphs if graphs and isinstance(graphs[0], dict) \
            else self.preprocess(graphs)
        self.model.eval()
        loader = MaDataloader(datas, self.batch_size, self.annotate,
                              denseadj=self.denseadj, shuffle=False,
                              drop_last=False)
        loader.buckets = self._buckets
        preds = []
        for batch in loader:
            preds.append(_unpad(np.asarray(
                self._forward(self.model, batch)), batch))
        return np.concatenate(preds, axis=0)

    def close(self):
        """Shut down the host precompute pool (idempotent)."""
        if self._pool is not None:
            self._pool.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def export_forward(model: nnx.Module, example_batch: Dict[str, Any],
                   path: Optional[str] = None, backend: str = "sparse",
                   annotate: Sequence[str] = ("",)) -> bytes:
    """Serialize the eval-mode forward for ``example_batch``'s exact
    shape signature as a StableHLO artifact with the weights baked in
    as constants.

    The artifact is tied to one bucket signature (collate with a shared
    ``Buckets`` dict so production batches hit the same shapes) and to
    the platform it was exported under.  Returns the bytes; also writes
    them to ``path`` when given.
    """
    import jax
    from jax import export as jexport

    if backend == "sparse":
        from ..hodata.sp_data import batch_to_sparse_dict as to_dict
    else:
        from ..hodata.ma_data import batch_to_dense_dict as to_dict

    model.eval()
    graphdef, state = nnx.split(model)

    def fn(batch):
        # `state` is a closure capture: its leaves are embedded in the
        # exported artifact as constants (frozen weights).
        merged = nnx.merge(graphdef, state)
        return merged(to_dict(batch, tuple(annotate)))

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        {k: v for k, v in example_batch.items()})
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    if path is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class ExportedForward:
    """A deserialized exported forward: ``ExportedForward(blob)(batch)``."""

    def __init__(self, blob: bytes):
        from jax import export as jexport

        self._exported = jexport.deserialize(
            blob if isinstance(blob, (bytes, bytearray))
            else bytes(blob))

    def __call__(self, batch: Dict[str, Any]) -> np.ndarray:
        import jax

        arrays = jax.tree.map(np.asarray, dict(batch))
        return np.asarray(self._exported.call(arrays))


def load_exported(path: str) -> ExportedForward:
    with open(path, "rb") as f:
        return ExportedForward(f.read())
