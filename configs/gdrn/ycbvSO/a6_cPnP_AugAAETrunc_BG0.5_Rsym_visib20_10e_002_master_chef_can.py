# Auto-generated per-object (SO) config — reference family
# configs/gdrn/ycbvSO/a6_cPnP_AugAAETrunc_BG0.5_Rsym_visib20_10e/ (one config per object).
_base_ = ["../ycbv/a6_cPnP_AugAAETrunc_BG0.5_Rsym_ycbv_real_pbr_visib20_10e.py"]

OBJ_NAME = "002_master_chef_can"
OUTPUT_DIR = "output/gdrn/ycbvSO/a6_cPnP_AugAAETrunc_BG0.5_Rsym_visib20_10e_002_master_chef_can"

SOLVER = dict(TOTAL_EPOCHS=30)

DATASETS = dict(
    TRAIN=("ycbv_train_real",),
    TEST=("ycbv_test",),
)

MODEL = dict(CDPN=dict(ROT_HEAD=dict(NUM_CLASSES=1)))
