"""Preprocessing driver with a content-addressed disk cache
(reference pygho/hodata/ParallelPreprocess.py).

Maps the pre-transform over all graphs — multi-process when
num_workers > 0 — and caches the resulting list of per-graph dicts as a
single .npz-style pickle keyed by a hash of the transform's repr, exactly
the reference's caching contract (ParallelPreprocess.py:42-65).
"""

from __future__ import annotations

import hashlib
import os
import pickle
from concurrent.futures import ProcessPoolExecutor
from typing import Any, Callable, Dict, List, Optional, Sequence

from .graph import Graph

_CACHE_VERSION = 1


def _transform_fingerprint(pre_transform) -> str:
    import functools

    def describe(f):
        if isinstance(f, functools.partial):
            return (f"partial({describe(f.func)}, args={f.args}, "
                    f"kw={sorted((k, describe(v) if callable(v) else repr(v)) for k, v in f.keywords.items())})")
        if callable(f):
            mod = getattr(f, "__module__", "?")
            name = getattr(f, "__qualname__", repr(f))
            return f"{mod}.{name}"
        return repr(f)

    return hashlib.sha256(
        f"v{_CACHE_VERSION}:{describe(pre_transform)}".encode()).hexdigest()[:16]


class ParallelPreprocessDataset:
    """Preprocess a list of Graphs with caching.

    Args:
      root: cache directory (created if needed).
      graphs: iterable of Graph.
      pre_transform: per-graph fn Graph -> dict (Sppretransform /
        Mapretransform output).
      num_worker: 0 = serial; > 0 = process pool.
    """

    def __init__(self, root: str, graphs: Sequence[Graph],
                 pre_transform: Callable[[Graph], Dict[str, Any]],
                 num_worker: int = 0):
        os.makedirs(root, exist_ok=True)
        fp = _transform_fingerprint(pre_transform)
        self.cache_path = os.path.join(root, f"processed_{fp}.pkl")
        if os.path.exists(self.cache_path):
            with open(self.cache_path, "rb") as f:
                self.datas: List[Dict[str, Any]] = pickle.load(f)
            return
        graphs = list(graphs)
        if num_worker and num_worker > 0:
            with ProcessPoolExecutor(max_workers=num_worker) as pool:
                self.datas = list(pool.map(pre_transform, graphs,
                                           chunksize=32))
        else:
            self.datas = [pre_transform(g) for g in graphs]
        tmp = self.cache_path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(self.datas, f, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, self.cache_path)

    def __len__(self):
        return len(self.datas)

    def __getitem__(self, i):
        return self.datas[i]
