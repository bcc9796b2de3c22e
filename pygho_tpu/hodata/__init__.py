"""High-order data pipeline (L2): tuple samplers, precompute, batching,
loaders (reference pygho/hodata).

Everything here is host-side numpy/scipy; the output of a loader is a
dict of fixed-size device arrays (bucket-padded) ready to wrap into
SparseTensor / MaskedTensor pytrees inside jit.
"""

from .graph import Graph
from .sp_sampler import KhopSampler, I2Sampler, k_hop_subgraph
from .ma_sampler import spdsampler, rdsampler
from .sp_data import sp_datapreprocess, collate_sparse, batch_to_sparse_dict
from .ma_data import ma_datapreprocess, collate_dense, batch_to_dense_dict
from .loader import (SpDataloader, MaDataloader, Sppretransform,
                     Mapretransform, padding_stats)
from .preprocess import ParallelPreprocessDataset

__all__ = [
    "padding_stats",
    "Graph", "KhopSampler", "I2Sampler", "k_hop_subgraph",
    "spdsampler", "rdsampler",
    "sp_datapreprocess", "collate_sparse", "batch_to_sparse_dict",
    "ma_datapreprocess", "collate_dense", "batch_to_dense_dict",
    "SpDataloader", "MaDataloader", "Sppretransform", "Mapretransform",
    "ParallelPreprocessDataset",
]
