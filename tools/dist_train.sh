#!/usr/bin/env bash
# Multi-host training launcher (reference dist_train.sh used
# torch.distributed.launch; on TPU pods each host runs the same command and
# jax.distributed discovers the topology from the environment).
#   ./tools/dist_train.sh CONFIG [extra args...]
set -euo pipefail
CONFIG=$1; shift || true
exec python "$(dirname "$0")/train.py" "$CONFIG" "$@"
