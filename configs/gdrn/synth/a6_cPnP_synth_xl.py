# Data-scaling variant of a6_cPnP_synth: same model/recipe on the 3x
# train split (6,000 images / ~36k ROIs, tools/gen_scale_dataset.py
# --train-images 6000; the held-out test split is unchanged, so tables are
# directly comparable). Run-1 diagnosis (SCALE_RUN.md): rotation
# generalization to unseen renders is the binding constraint at 2,000
# images — this run measures the data axis. 100 epochs keeps the ROI-visit
# budget (~3.6M) inside one chip session at the measured sustained rate.
_base_ = ["./a6_cPnP_synth.py"]

OUTPUT_DIR = "output/gdrn/synth/a6_cPnP_synth_xl"

# CHECKPOINT_PERIOD 100 (inherited) would checkpoint only at the very end
# of this 100-epoch run; a mid-run hang/preemption then loses everything.
SOLVER = dict(TOTAL_EPOCHS=100, CHECKPOINT_PERIOD=10)
