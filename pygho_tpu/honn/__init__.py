"""Operator (L3) and model-layer (L4) modules.

Mirrors the reference pygho/honn package: backend-specific operator
wrappers (sp_operator / ma_operator), the mode-string unified dispatch
(tensorop) and the published HOGNN conv layers (conv), built on flax.nnx.
"""

from . import sp_operator
from . import ma_operator
from . import tensorop
from . import conv
from . import utils
from .sp_operator import KEYSEP, parse_precomputekey
from .ma_operator import parse_spmamm_dims

__all__ = [
    "sp_operator", "ma_operator", "tensorop", "conv", "utils",
    "KEYSEP", "parse_precomputekey", "parse_spmamm_dims",
]
