#!/usr/bin/env bash
# Eval entrypoint (reference test_gdrn.sh <cfg> <gpu_ids> <ckpt>).
# Usage: ./scripts/test_gdrn.sh <config.py> <ckpt_dir> [extra opts...]
set -euo pipefail
CFG=$1
CKPT=$2
shift 2 || true
exec python -m gdrnet_tpu.engine.train --config-file "$CFG" --eval-only \
    "MODEL.WEIGHTS=$CKPT" "$@"
