#!/usr/bin/env bash
# Fetch the OpenAI CLIP checkpoints used by the presets
# (reference pretrained/download_clip_models.sh equivalent; the python
# trainer also auto-fetches via train/weights.py ensure_weights).
set -euo pipefail
DIR="$(dirname "$0")/../pretrained"
mkdir -p "$DIR"
python - <<'PY'
from denseclip_vit_multimodal_tpu.train.weights import CLIP_URLS, ensure_weights
import os
for name in ("RN50.pt", "RN101.pt", "ViT-B-16.pt", "ViT-L-14.pt"):
    path = os.path.join(os.path.dirname(__file__) or ".", "..", "pretrained", name)
    print(name, "->", ensure_weights(os.path.abspath(path)))
PY
