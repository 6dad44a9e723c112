# Per-object (SO) config — reference family configs/gdrn/lmoSO/
# a6_cPnP_AugAAETrunc_BG0.5_lmoRealBl_160e_SO/ (one config per object:
# TRAIN = LM real "all" idx split + per-object blender renders).
_base_ = ["../lmo/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_blender_160e.py"]

OUTPUT_DIR = "output/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmoRealBl_160e_eggbox"

DATASETS = dict(
    TRAIN=("lm_real_eggbox_all", "lmo_blender_eggbox_train"),
    TEST=("lmo_test",),
)

MODEL = dict(CDPN=dict(ROT_HEAD=dict(NUM_CLASSES=1)))
