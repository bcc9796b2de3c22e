"""Distribution layer: device meshes, data-parallel training, tuple-parallel
sparse contraction.

The reference has no distributed support at all (SURVEY.md §2.7); this
subsystem is net-new design per BASELINE.json:
- mesh axes ("dp", "sp", "tp", "pp"): data-parallel over graphs first (graphs
  are independent blocks of the block-diagonal batch), tuple/edge
  partitioning of the contraction triples for single-giant-graph scaling,
  channel (tensor) parallelism over the hidden dim — the contraction
  is elementwise in d, so tp communication is only the MLP psums GSPMD
  inserts — and GPipe-style layer pipelining ("pp"): microbatches flow
  through layer stages via lax.ppermute, differentiated straight through
  (the backward pass is the reverse pipeline).
- All communication is XLA collectives over ICI (psum / all_gather /
  ppermute inside shard_map) — never host-driven.
"""

from .mesh import make_mesh
from .data_parallel import (collate_sharded_sparse, make_dp_train_step,
                            make_dp_eval_step, make_dp_chained_train)
from .tuple_parallel import (spspmm_tuple_parallel,
                             make_tuple_parallel_spspmm,
                             build_tuple_shard_plan, make_partitioned_spspmm,
                             build_overlapped_shard_plan,
                             make_overlapped_spspmm,
                             build_scatter_shard_plan, make_scatter_spspmm,
                             build_ring_shard_plan, make_ring_spspmm,
                             build_reduce_scatter_shard_plan,
                             make_reduce_scatter_spspmm,
                             build_fused_overlapped_shard_plan,
                             make_fused_overlapped_spspmm,
                             plan_exchange_volumes,
                             choose_partitioned_spspmm)
from .giant import (build_giant_graph_plan, init_giant_params,
                    make_giant_graph_step)
from .tensor_parallel import (tp_state_shardings, make_tp_train_step,
                              make_tp_eval_step)
from .pipeline import (build_pipeline_plan, init_pipeline_params,
                       make_pipeline_step, make_model_pipeline_step,
                       split_conv_stages, merge_conv_stages,
                       reference_model_pipeline_loss)

__all__ = [
    "make_mesh", "collate_sharded_sparse", "make_dp_train_step",
    "make_dp_eval_step", "make_dp_chained_train",
    "spspmm_tuple_parallel",
    "make_tuple_parallel_spspmm", "build_tuple_shard_plan",
    "make_partitioned_spspmm", "build_overlapped_shard_plan",
    "make_overlapped_spspmm", "build_scatter_shard_plan",
    "make_scatter_spspmm", "build_ring_shard_plan", "make_ring_spspmm",
    "build_reduce_scatter_shard_plan", "make_reduce_scatter_spspmm",
    "build_fused_overlapped_shard_plan", "make_fused_overlapped_spspmm",
    "plan_exchange_volumes",
    "choose_partitioned_spspmm",
    "build_giant_graph_plan", "init_giant_params", "make_giant_graph_step",
    "tp_state_shardings", "make_tp_train_step", "make_tp_eval_step",
    "build_pipeline_plan", "init_pipeline_params", "make_pipeline_step",
    "make_model_pipeline_step", "split_conv_stages",
    "merge_conv_stages", "reference_model_pipeline_loss",
]
