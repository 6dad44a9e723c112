from gdrnet_tpu.engine.train_state import GDRNTrainState, create_train_state
from gdrnet_tpu.engine.steps import make_train_step, make_predict_step

__all__ = [
    "GDRNTrainState",
    "create_train_state",
    "make_train_step",
    "make_predict_step",
]
