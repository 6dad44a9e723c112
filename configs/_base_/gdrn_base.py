# Base experiment config. Framework defaults live in
# gdrnet_tpu/config/defaults.py (the analogue of the reference's
# common_base.py + gdrn_base.py); entries here apply to every experiment.
SOLVER = dict(
    LR_SCHEDULER_NAME="flat_and_anneal",
    ANNEAL_METHOD="cosine",
    ANNEAL_POINT=0.72,
    WARMUP_FACTOR=0.001,
    WARMUP_ITERS=1000,
)
