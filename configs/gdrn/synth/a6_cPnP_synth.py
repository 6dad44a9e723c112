# Flagship-dims training on the self-rendered synthetic BOP dataset
# (tools/gen_scale_dataset.py -> datasets/BOP_DATASETS/synth) — the
# in-environment scale dress rehearsal (SCALE_RUN.md): 10 objects, 4
# symmetric, duplicate instances, estimated detections at test time,
# vsd/mssd/mspd + ad scoring on the held-out split.
#
# Same model family/settings as the reference's a6_cPnP experiments
# (allo_rot6d + centroid_z, region attention, 2D coords); trains from the
# HBM-resident pool (TRAIN.DEVICE_RESIDENT_POOL) with background
# aug-refresh — the whole mapped train set lives on device, steps are
# FLOP-bound.
_base_ = ["../../_base_/gdrn_base.py"]

OUTPUT_DIR = "output/gdrn/synth/a6_cPnP_synth"

INPUT = dict(
    DZI_PAD_SCALE=1.5,
    # the synth renders carry their own scene backgrounds and this
    # environment has no VOC bg set — replacing backgrounds (with the
    # gradient fallback) creates a train/test domain gap measured to
    # collapse held-out scores (SCALE_RUN.md round-5 postmortem)
    CHANGE_BG_PROB=0.0,
    COLOR_AUG_PROB=0.3,
    COLOR_AUG_TYPE="code",
    COLOR_AUG_CODE=(
        "Sequential(["
        "Sometimes(0.5, GaussianBlur(1.2*np.random.rand())),"
        "Sometimes(0.5, Add((-20, 20), per_channel=0.3)),"
        "Sometimes(0.5, Multiply((0.7, 1.3), per_channel=0.5)),"
        "Sometimes(0.5, LinearContrast((0.6, 1.8), per_channel=0.3))"
        "], random_order=False)"
    ),
)

SOLVER = dict(
    IMS_PER_BATCH=128,
    # 160 epochs (~1.9M ROI visits) fits one round's wall-clock budget and
    # saturates the held-out metrics on this dataset (SCALE_RUN.md); the
    # trainer is resume-safe, so a longer run just continues from the ckpt.
    TOTAL_EPOCHS=160,
    OPTIMIZER_CFG=dict(_delete_=True, type="Ranger", lr=2e-4, weight_decay=0),
    CHECKPOINT_PERIOD=100,
)

DATASETS = dict(
    TRAIN=("synth_train",),
    TEST=("synth_test",),
    DET_FILES_TEST=("datasets/BOP_DATASETS/synth/test_bboxes/est_dets.json",),
    SYM_OBJS=["brick", "tower", "bar", "hexprism"],
)

DATALOADER = dict(
    FILTER_VISIB_THR=0.1,
)

TRAIN = dict(
    DEVICE_RESIDENT_POOL=True,
    POOL_REFRESH=True,
    PRINT_FREQ=50,
)

MODEL = dict(
    LOAD_DETS_TEST=True,
    CDPN=dict(
        ROT_HEAD=dict(
            NUM_CLASSES=10,
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
    DATASET_NAME="synth",
    ERROR_TYPES="ad,rete,re,te,proj,vsd,mssd,mspd",
    USE_BOP=True,
)

TEST = dict(EVAL_PERIOD=0, VIS=False, TEST_BBOX_TYPE="est",
            ROI_BATCH_SIZE=64)
