# LM-13 multi-object training — port of the reference experiment
# configs/gdrn/lm/a6_cPnP_lm13.py (same keys/values; COLOR_AUG_CODE string
# pipelines map to the framework's numpy aug library by type name).
_base_ = ["../../_base_/gdrn_base.py"]

OUTPUT_DIR = "output/gdrn/lm/a6_cPnP_lm13"

INPUT = dict(
    DZI_PAD_SCALE=1.5,
    COLOR_AUG_PROB=0.0,
    COLOR_AUG_TYPE="code",
)

SOLVER = dict(
    IMS_PER_BATCH=24,
    TOTAL_EPOCHS=160,
    OPTIMIZER_CFG=dict(_delete_=True, type="Ranger", lr=1e-4, weight_decay=0),
)

DATASETS = dict(
    TRAIN=("lm_13_train",),
    TEST=("lm_13_test",),
    DET_FILES_TEST=(
        "datasets/BOP_DATASETS/lm/test/test_bboxes/bbox_faster_all.json",),
)

MODEL = dict(
    LOAD_DETS_TEST=True,
    CDPN=dict(
        ROT_HEAD=dict(
            NUM_CLASSES=13,
            XYZ_LW=1.0,
            NUM_REGIONS=64,
        ),
        PNP_NET=dict(
            REGION_ATTENTION=True,
            WITH_2D_COORD=True,
            ROT_TYPE="allo_rot6d",
            TRANS_TYPE="centroid_z",
            PM_NORM_BY_EXTENT=True,
            PM_R_ONLY=True,
            CENTROID_LOSS_TYPE="L1",
            CENTROID_LW=1.0,
            Z_LOSS_TYPE="L1",
            Z_LW=1.0,
        ),
        TRANS_HEAD=dict(FREEZE=True),
    ),
)

TEST = dict(EVAL_PERIOD=0, VIS=False, TEST_BBOX_TYPE="est")
