from tpu3dssf.train.state import TrainState, create_optimizer, create_train_state
from tpu3dssf.train.loop import train_model, evaluate_model, make_train_step, make_eval_step
from tpu3dssf.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "train_model",
    "evaluate_model",
    "make_train_step",
    "make_eval_step",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
]
