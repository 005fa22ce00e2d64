from dtt.train.checkpoint import (latest_checkpoint, load_params,
                                  restore_checkpoint, save_checkpoint,
                                  save_params)
from dtt.train.losses import LossBreakdown, batch_loss, pair_loss
from dtt.train.trainer import (TrainState, create_train_state, make_data_mesh,
                               make_optimizer, make_parallel_train_step,
                               make_train_step, shard_batch)

__all__ = ["latest_checkpoint", "load_params", "restore_checkpoint",
           "save_checkpoint", "save_params", "LossBreakdown", "batch_loss",
           "pair_loss", "TrainState", "create_train_state", "make_data_mesh",
           "make_optimizer", "make_parallel_train_step", "make_train_step",
           "shard_batch"]
