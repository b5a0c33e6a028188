"""Pretrained-weight resolution (`ensure_weights`).

Reference behavior (segmentation/train_denseclip.py:1530-1577 +
pretrained/download_clip_models.sh): rank 0 wget-downloads the OpenAI CLIP
checkpoint if the configured path is missing, other ranks wait.  Here:
process 0 downloads (when the environment has egress), a known-URL table
covers the three reference backbones, and a local-path check short-circuits.
"""

from __future__ import annotations

import os
from typing import Optional

CLIP_URLS = {
    "RN50.pt": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101.pt": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "ViT-B-16.pt": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L-14.pt": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}


def ensure_weights(path: str, logger=None, timeout: int = 600) -> Optional[str]:
    """Return a usable local checkpoint path, downloading if possible.

    Returns None (with a warning) when the file is absent and cannot be
    fetched — callers then train from random init, matching the reference's
    degrade-and-continue behavior.
    """
    def log(msg):
        if logger:
            logger.info(msg)

    if os.path.exists(path):
        return path

    name = os.path.basename(path)
    url = CLIP_URLS.get(name)
    if url is None:
        log(f"no known URL for {name}; cannot fetch {path}")
        return None

    # jax is only needed for multi-process coordination; a plain host
    # environment (e.g. the download shell script) works without it.
    try:
        import jax

        process_index, process_count = jax.process_index(), jax.process_count()
    except Exception:
        process_index, process_count = 0, 1

    if process_index == 0:
        try:
            import shutil
            import urllib.request

            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            log(f"downloading {url} -> {path}")
            tmp = path + ".part"
            # urlretrieve has NO socket timeout: a stalled CDN connection
            # would hang process 0 forever while the other hosts give up
            # after `timeout` and then deadlock on the weight allgather.
            with urllib.request.urlopen(url, timeout=60) as src, \
                    open(tmp, "wb") as dst:
                shutil.copyfileobj(src, dst)
            os.replace(tmp, path)
        except Exception as e:
            log(f"download failed ({e}); continuing without pretrained weights")
            return None
    if process_count > 1:
        # Barrier: all processes wait until the file lands on shared storage
        # (or give up after `timeout`).
        import time

        waited = 0
        while not os.path.exists(path) and waited < timeout:
            time.sleep(2)
            waited += 2
    return path if os.path.exists(path) else None
