from gdrnet_tpu.solver.schedulers import flat_and_anneal_schedule, build_lr_schedule
from gdrnet_tpu.solver.optimizers import (
    ranger,
    radam,
    adabelief,
    sgd_gc,
    build_optimizer,
)

__all__ = [
    "flat_and_anneal_schedule",
    "build_lr_schedule",
    "ranger",
    "radam",
    "adabelief",
    "sgd_gc",
    "build_optimizer",
]
