# Auto-generated per-object (SO) config — reference family
# configs/gdrn/lmSO/a6_cPnP_lm13_80e/ (one config per object).
_base_ = ["../lm/a6_cPnP_lm13.py"]

OBJ_NAME = "lamp"
OUTPUT_DIR = "output/gdrn/lmSO/a6_cPnP_lm13_80e_lamp"

SOLVER = dict(TOTAL_EPOCHS=80)

DATASETS = dict(
    TRAIN=("lm_real_lamp_train",),
    TEST=("lm_13_test",),
)

MODEL = dict(CDPN=dict(ROT_HEAD=dict(NUM_CLASSES=1)))
