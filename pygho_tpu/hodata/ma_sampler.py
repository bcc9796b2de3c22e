"""Dense tuple samplers (reference pygho/hodata/MaTupleSampler.py).

Each returns (tuplefeat_flat, tupleshape): a flat row-major (n*n, *) array
plus the masked shape, consumed by ma_data.collate_dense.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import scipy.sparse as ssp

from .graph import Graph


def spdsampler(graph: Graph, hop: int = 2) -> Dict[str, np.ndarray]:
    """All-pairs shortest-path distance clamped to hop + 1
    (reference MaTupleSampler.py:11-32).  inf (disconnected) also clamps
    to hop + 1."""
    dist = ssp.csgraph.shortest_path(graph.to_scipy_csr(), directed=False,
                                     unweighted=True,
                                     return_predecessors=False)
    dist = np.minimum(dist, hop + 1)
    return {
        "tuplefeat": dist.reshape(-1).astype(np.int64),
        "tupleshape": np.array([graph.num_nodes] * 2, dtype=np.int64),
    }


def rdsampler(graph: Graph) -> Dict[str, np.ndarray]:
    """Resistance distance via pseudo-inverse Laplacian
    (reference MaTupleSampler.py:35-57)."""
    adj = graph.to_scipy_csr()
    lap = ssp.csgraph.laplacian(adj).toarray()
    lap = lap + 0.01 * np.eye(*lap.shape)
    L_inv = np.linalg.pinv(lap, hermitian=True)
    dL = np.diagonal(L_inv)
    rd = (dL.reshape(-1, 1) + dL.reshape(1, -1) - L_inv - L_inv.T)
    return {
        "tuplefeat": rd.reshape(-1, 1).astype(np.float32),
        "tupleshape": np.array([graph.num_nodes] * 2, dtype=np.int64),
    }
