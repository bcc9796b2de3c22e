"""Pallas TPU kernels for the sparse hot path.

``fused_spspmm``: the gather-multiply-segment-reduce contraction
(out[t] += U[u] * V[v] over host-planned triples) executed as one fused
Pallas kernel — one HBM pass over each operand block instead of XLA's
separate gather / multiply / scatter materializations.  The plan
(chunking of the triple array into VMEM-resident blocks) is built on the
host at batch-collation time, in the same spirit as the acd precompute
protocol.
"""

from .fused_spspmm import (ChunkPlan, build_chunk_plan, build_spspmm_plans,
                           build_spspmm_plans_for, autotune_spspmm_geoms,
                           autotune_geometry, estimate_plan_cost,
                           fused_spspmm, fused_contract)
from .fused_spmamm import build_spmamm_plans, spmamm_triples
from .strip_spspmm import (StripPlan, build_strip_plan, strip_contract,
                           build_spspmm_strip_plans, fused_spspmm_strip,
                           autotune_strip_geoms, estimate_strip_cost)
from .strip_attention import (fused_attention_strip,
                              build_attention_strip_plans,
                              autotune_attention_geoms,
                              strip_attention_role, estimate_att_vmem)

__all__ = ["ChunkPlan", "build_chunk_plan", "build_spspmm_plans",
           "build_spspmm_plans_for", "autotune_spspmm_geoms",
           "autotune_geometry", "estimate_plan_cost",
           "fused_spspmm", "fused_contract",
           "build_spmamm_plans", "spmamm_triples",
           "StripPlan", "build_strip_plan", "strip_contract",
           "build_spspmm_strip_plans", "fused_spspmm_strip",
           "autotune_strip_geoms", "estimate_strip_cost",
           "fused_attention_strip", "build_attention_strip_plans",
           "autotune_attention_geoms", "strip_attention_role",
           "estimate_att_vmem"]
