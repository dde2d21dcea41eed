from .distributed import HostInfo, initialize
from .mesh import (
    batch_shardings,
    make_mesh,
    replicate,
    shard_batch,
    shard_train_state,
    train_state_shardings,
)
from .sharded_amsoftmax import sharded_amsoftmax_ce, sharded_cosine_scores_allgather

__all__ = [
    "HostInfo",
    "initialize",
    "batch_shardings",
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_train_state",
    "train_state_shardings",
    "sharded_amsoftmax_ce",
    "sharded_cosine_scores_allgather",
]
