#!/usr/bin/env python
"""Migrate a reference-trained torch checkpoint into this framework.

The reference trainer saves `{'epoch', 'state_dict', 'optimizer', ...}`
.pth files (reference train_denseclip.py:892-908, denseclip/utils.py:61-82).
This CLI converts one — or a raw `state_dict` — into an Orbax checkpoint
directory that `tools/train.py --load`, `tools/test.py` and
`tools/infer.py` consume, so a user switching from the reference keeps
their trained models.  Weight mapping (towers, projections, context
decoder, fusion neck, seg/depth heads, learnable contexts/gamma, BN
running stats) is `train/clip_import.py::import_reference_denseclip`, the
same importer the full-composite parity test pins against the reference
model itself.

    python tools/import_checkpoint.py CONFIG REF.pth --out work_dir
    python tools/train.py CONFIG --work-dir wd --load work_dir  # warm start
    python tools/test.py CONFIG work_dir --eval mIoU depth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="reference .pth -> Orbax checkpoint"
    )
    p.add_argument("config", help="config the checkpoint was trained with")
    p.add_argument("torch_ckpt", help=".pth file (trainer dict or state_dict)")
    p.add_argument("--out", required=True,
                   help="work dir to write checkpoints/epoch_N + latest into")
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p.parse_args(argv)


def load_reference_state_dict(path: str):
    """(state_dict as {key: float32 ndarray}, epoch, best_metric)."""
    import numpy as np
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    epoch, best = 0, None
    if isinstance(blob, dict) and "state_dict" in blob:
        epoch = int(blob.get("epoch", 0))
        if blob.get("best_metric") is not None:
            best = float(blob["best_metric"])
        blob = blob["state_dict"]
    if hasattr(blob, "state_dict"):  # a whole nn.Module / jit archive
        blob = blob.state_dict()
    state = {}
    for k, v in blob.items():
        if k.startswith("module."):  # DDP wrapper prefix
            k = k[len("module."):]
        state[k] = np.asarray(
            v.detach().float().numpy() if hasattr(v, "detach") else v,
            dtype=np.float32,
        )
    return state, epoch, best


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from denseclip_vit_multimodal_tpu.core.config import (
        load_config,
        resolve_config_path,
    )
    from denseclip_vit_multimodal_tpu.models.denseclip import build_denseclip
    from denseclip_vit_multimodal_tpu.train.checkpoint import save_checkpoint
    from denseclip_vit_multimodal_tpu.train.clip_import import (
        import_reference_denseclip,
    )
    from denseclip_vit_multimodal_tpu.train.loop import class_names_for
    from denseclip_vit_multimodal_tpu.train.state import create_train_state

    cfg = load_config(
        resolve_config_path(args.config), overrides=args.overrides
    )
    class_names = class_names_for(cfg.get("data", {}))
    model, texts = build_denseclip(cfg.model, class_names)

    state_dict, epoch, best = load_reference_state_dict(args.torch_ckpt)
    print(f"read {len(state_dict)} tensors from {args.torch_ckpt} "
          f"(epoch {epoch})")

    # param shapes don't depend on the init image size: keep init cheap
    patch = int(cfg.model.get("backbone", {}).get("patch_size", 16) or 16)
    hw = max(2 * patch, 32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 3)), jnp.asarray(texts)
    )
    variables = import_reference_denseclip(state_dict, variables)
    variables = jax.tree.map(jnp.asarray, variables)

    # fresh optimizer state: this is a weights migration, torch Adam moments
    # are not transferable to optax anyway (reference --load drops them too,
    # train_denseclip.py:1012-1034)
    train_state = create_train_state(
        model, variables, cfg.get("training", {}), steps_per_epoch=1
    )
    path = save_checkpoint(
        args.out, train_state, epoch=epoch, best_metric=best,
        is_best=best is not None,
    )
    n_leaves = len(jax.tree.leaves(train_state.params))
    print(f"wrote {path} ({n_leaves} param leaves; aliases: latest"
          + (", best)" if best is not None else ")"))
    return path


if __name__ == "__main__":
    main()
