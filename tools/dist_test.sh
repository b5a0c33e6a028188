#!/usr/bin/env bash
# Multi-host eval launcher (reference dist_test.sh equivalent).
#   ./tools/dist_test.sh CONFIG CHECKPOINT [extra args...]
set -euo pipefail
CONFIG=$1; CKPT=$2; shift 2 || true
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CKPT" "$@"
