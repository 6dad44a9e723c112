# Per-object (SO) config — reference family configs/gdrn/ycbvSO/
# a6_cPnP_AugAAETrunc_BG0.5_ycbv_real_pbr_visib20_20e_SO/ (one config per object;
# Rsym objects enable the symmetric PM loss, others disable it).
_base_ = ["../ycbv/a6_cPnP_AugAAETrunc_BG0.5_Rsym_ycbv_real_pbr_visib20_10e.py"]

OUTPUT_DIR = "output/gdrn/ycbvSO/a6_cPnP_AugAAETrunc_BG0.5_ycbv_real_pbr_visib20_20e_040_large_marker"

SOLVER = dict(TOTAL_EPOCHS=20, CHECKPOINT_PERIOD=5)

DATASETS = dict(
    TRAIN=("ycbv_040_large_marker_train_real", "ycbv_040_large_marker_train_pbr"),
    TEST=("ycbv_test",),
)

MODEL = dict(CDPN=dict(PNP_NET=dict(PM_LOSS_SYM=False)))
