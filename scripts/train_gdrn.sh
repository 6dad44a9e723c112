#!/usr/bin/env bash
# Train entrypoint (reference train_gdrn.sh: ./train_gdrn.sh <cfg> <gpu_ids>;
# device selection is a no-op on TPU — the mesh uses all local chips).
# Usage: ./scripts/train_gdrn.sh <config.py> [extra opts...]
set -euo pipefail
CFG=$1
shift || true
exec python -m gdrnet_tpu.engine.train --config-file "$CFG" "$@"
