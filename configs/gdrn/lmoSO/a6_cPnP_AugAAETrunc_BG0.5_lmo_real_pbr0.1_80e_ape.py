# LM-O single-object (ape) — representative of the reference's 16 per-object
# lmoSO configs (configs/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_80e_SO/).
# Other objects: copy and change OBJ_NAME / dataset names accordingly.
_base_ = ["../lmo/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_40e.py"]

OBJ_NAME = "ape"
OUTPUT_DIR = f"output/gdrn/lmoSO/a6_cPnP_AugAAETrunc_BG0.5_lmo_real_pbr0.1_80e_{OBJ_NAME}"

SOLVER = dict(TOTAL_EPOCHS=80)

DATASETS = dict(
    TRAIN=(f"lm_real_{OBJ_NAME}_train",),
    TRAIN2=("lmo_pbr_train",),
    TRAIN2_RATIO=0.1,
    TEST=("lmo_test",),
)

MODEL = dict(CDPN=dict(ROT_HEAD=dict(NUM_CLASSES=1)))
