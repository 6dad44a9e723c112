# YCB-V 21 objects with symmetric PM loss — port of the reference
# configs/gdrn/ycbv/a6_cPnP_AugAAETrunc_BG0.5_Rsym_ycbv_real_pbr_visib20_10e.py.
_base_ = ["../../_base_/gdrn_base.py"]

OUTPUT_DIR = "output/gdrn/ycbv/a6_cPnP_AugAAETrunc_BG0.5_Rsym_ycbv_real_pbr_visib20_10e"

INPUT = dict(
    DZI_PAD_SCALE=1.5,
    TRUNCATE_FG=True,
    CHANGE_BG_PROB=0.5,
    COLOR_AUG_PROB=0.8,
    COLOR_AUG_TYPE="code",
    COLOR_AUG_CODE=(
        "Sequential(["
        "Sometimes(0.5, CoarseDropout( p=0.2, size_percent=0.05) ),"
        "Sometimes(0.5, GaussianBlur(1.2*np.random.rand())),"
        "Sometimes(0.5, Add((-25, 25), per_channel=0.3)),"
        "Sometimes(0.3, Invert(0.2, per_channel=True)),"
        "Sometimes(0.5, Multiply((0.6, 1.4), per_channel=0.5)),"
        "Sometimes(0.5, Multiply((0.6, 1.4))),"
        "Sometimes(0.5, LinearContrast((0.5, 2.2), per_channel=0.3))"
        "], random_order=False)"
    ),
)

SOLVER = dict(
    IMS_PER_BATCH=24,
    TOTAL_EPOCHS=10,
    OPTIMIZER_CFG=dict(_delete_=True, type="Ranger", lr=1e-4, weight_decay=0),
    CHECKPOINT_PERIOD=1,
)

DATASETS = dict(
    TRAIN=("ycbv_train_real", "ycbv_train_pbr"),
    TEST=("ycbv_test",),
    DET_FILES_TEST=(
        "datasets/BOP_DATASETS/ycbv/test/test_bboxes/"
        "fcos_V57eSE_MSx1333_ColorAugAAEWeaker_8e_ycbv_real_pbr_8e_test_keyframe.json",),
    SYM_OBJS=["024_bowl", "036_wood_block", "051_large_clamp",
              "052_extra_large_clamp", "061_foam_brick"],
)

DATALOADER = dict(
    NUM_WORKERS=4,
    FILTER_VISIB_THR=0.2,
)

MODEL = dict(
    LOAD_DETS_TEST=True,
    CDPN=dict(
        ROT_HEAD=dict(
            NUM_CLASSES=21,
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
            PM_LOSS_SYM=True,
            CENTROID_LOSS_TYPE="L1",
            CENTROID_LW=1.0,
            Z_LOSS_TYPE="L1",
            Z_LW=1.0,
        ),
        TRANS_HEAD=dict(ENABLED=False),
    ),
)

VAL = dict(
    DATASET_NAME="ycbv",
    TARGETS_FILENAME="ycbv_test_targets_keyframe.json",
    ERROR_TYPES="AUCadd,AUCadi,AUCad,ad,ABSadd,ABSadi,ABSad",
    USE_BOP=True,
)

TEST = dict(EVAL_PERIOD=0, VIS=False, TEST_BBOX_TYPE="est")
