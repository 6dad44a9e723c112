# Per-object (SO) config — reference family configs/gdrn/lmoSO/
# a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_80e_SO/ (one config per object:
# TRAIN = LM real "all" idx split of the object, TRAIN2 = per-object LMO PBR).
_base_ = ["../lmo/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_40e.py"]

OUTPUT_DIR = "output/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_80e_cat"

SOLVER = dict(TOTAL_EPOCHS=80)

DATASETS = dict(
    TRAIN=("lm_real_cat_all",),
    TRAIN2=("lmo_pbr_cat_train",),
    TRAIN2_RATIO=0.1,
    TEST=("lmo_test",),
)

MODEL = dict(CDPN=dict(ROT_HEAD=dict(NUM_CLASSES=1)))
