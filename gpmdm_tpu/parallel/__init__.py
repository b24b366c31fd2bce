"""Distribution layer: device meshes, sharded training, PF-bank sharding."""

from .dist_chol import chol_rowblock, tri_solve_lower_rowblock, y_nll_dist
from .inspect import COLLECTIVE_PRIMS, count_collectives, count_collectives_jaxpr
from .mesh import make_mesh, make_train_mesh, round_up
from .pf_bank import (
    pf_scan_bank_sharded,
    pf_scan_bank_sharded_masked,
    shard_bank_state,
)
from .sp_predict import predict_x_all_classes_rowsharded, predict_y_rowsharded
from .sharded import (
    ShardedTrainContext,
    make_context,
    make_sharded_update_step,
    nll_sharded,
    pad_Y,
    train_adam_sharded,
)

__all__ = [
    "COLLECTIVE_PRIMS",
    "count_collectives",
    "count_collectives_jaxpr",
    "chol_rowblock",
    "tri_solve_lower_rowblock",
    "y_nll_dist",
    "make_mesh",
    "make_train_mesh",
    "round_up",
    "pf_scan_bank_sharded",
    "pf_scan_bank_sharded_masked",
    "predict_y_rowsharded",
    "predict_x_all_classes_rowsharded",
    "shard_bank_state",
    "ShardedTrainContext",
    "make_context",
    "make_sharded_update_step",
    "nll_sharded",
    "pad_Y",
    "train_adam_sharded",
]
