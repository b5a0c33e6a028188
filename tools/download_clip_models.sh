#!/usr/bin/env bash
# Fetch the OpenAI CLIP checkpoints used by the presets
# (reference pretrained/download_clip_models.sh equivalent; the python
# trainer also auto-fetches via train/weights.py ensure_weights).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$ROOT/pretrained"
PYTHONPATH="$ROOT${PYTHONPATH:+:$PYTHONPATH}" python - "$ROOT" <<'PY'
import os, sys
from denseclip_vit_multimodal_tpu.train.weights import ensure_weights

root = sys.argv[1]
for name in ("RN50.pt", "RN101.pt", "ViT-B-16.pt", "ViT-L-14.pt"):
    path = os.path.join(root, "pretrained", name)
    print(name, "->", ensure_weights(path))
PY
