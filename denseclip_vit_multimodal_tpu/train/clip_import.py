"""OpenAI CLIP checkpoint importer: torch .pt (JIT archive) -> Flax PyTree.

TPU-native equivalent of the reference's central CLIP-weight split-loader
(reference: segmentation/denseclip/denseclip.py:156-191 plus the per-module
loaders at models.py:459-512 and 629-677):

  * `visual.*` keys -> the backbone param tree; `transformer.* /
    token_embedding / positional_embedding / ln_final / text_projection`
    keys -> the text-encoder tree.
  * visual pos-embed is bilinearly RESIZED when the model's base grid
    differs (models.py:476-494); text pos-embed is TRUNCATED 77 -> model
    capacity (models.py:642-644, e.g. 22 for the context encoder).
  * `text_projection` is skipped on shape mismatch (denseclip.py:180-182),
    left at its random init.
  * the ViT `proj` is kept when shapes match, else left at init
    (models.py:497-500).

Layout conversions (torch -> flax):
  Linear weight [out, in] -> kernel [in, out] (transpose)
  Conv2d weight [out, in, kh, kw] -> kernel [kh, kw, in, out]
  Patch-embed conv [width, 3, p, p] -> matmul kernel [p*p*3, width]
    flattened in (kh, kw, c) order to match the backbone's reshape.
  nn.MultiheadAttention in_proj_weight [3D, D] -> fused qkv kernel [D, 3D].
  Per-layer block weights are STACKED on a leading axis (the `nn.scan`
  layout of models/layers.py Transformer).

Torch (CPU wheel) is used only as a file reader on the host; nothing torch
touches the device path.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

Params = Dict[str, Any]


def load_clip_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read an OpenAI CLIP checkpoint (JIT archive or plain state_dict)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        state = model.state_dict()
    except RuntimeError:
        state = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
    return {k: v.float().numpy() for k, v in state.items() if hasattr(v, "numpy")}


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


def _resize_grid_pos_embed(
    pos: np.ndarray, new_grid: tuple[int, int]
) -> np.ndarray:
    """[1+G*G, D] -> [1+gh*gw, D] bilinear (align_corners=False)."""
    import jax

    n, d = pos.shape
    g = int(round((n - 1) ** 0.5))
    assert g * g == n - 1, f"non-square pos embed: {pos.shape}"
    gh, gw = new_grid
    if (gh, gw) == (g, g):
        return pos
    spatial = pos[1:].reshape(g, g, d)
    resized = np.asarray(
        jax.image.resize(spatial, (gh, gw, d), method="bilinear")
    )
    return np.concatenate([pos[:1], resized.reshape(gh * gw, d)], axis=0)


def _stack_blocks(
    state: Dict[str, np.ndarray], prefix: str, layers: int
) -> Params:
    """Stack resblock weights into the scan layout [L, ...]."""
    def take(fmt: str) -> np.ndarray:
        return np.stack([state[fmt.format(prefix=prefix, i=i)] for i in range(layers)])

    return {
        "block": {
            "ln_1": {
                "scale": take("{prefix}.resblocks.{i}.ln_1.weight"),
                "bias": take("{prefix}.resblocks.{i}.ln_1.bias"),
            },
            "ln_2": {
                "scale": take("{prefix}.resblocks.{i}.ln_2.weight"),
                "bias": take("{prefix}.resblocks.{i}.ln_2.bias"),
            },
            "attn": {
                "qkv": {
                    "kernel": np.stack(
                        [
                            _t(state[f"{prefix}.resblocks.{i}.attn.in_proj_weight"])
                            for i in range(layers)
                        ]
                    ),
                    "bias": take("{prefix}.resblocks.{i}.attn.in_proj_bias"),
                },
                "out": {
                    "kernel": np.stack(
                        [
                            _t(state[f"{prefix}.resblocks.{i}.attn.out_proj.weight"])
                            for i in range(layers)
                        ]
                    ),
                    "bias": take("{prefix}.resblocks.{i}.attn.out_proj.bias"),
                },
            },
            "mlp": {
                "c_fc": {
                    "kernel": np.stack(
                        [
                            _t(state[f"{prefix}.resblocks.{i}.mlp.c_fc.weight"])
                            for i in range(layers)
                        ]
                    ),
                    "bias": take("{prefix}.resblocks.{i}.mlp.c_fc.bias"),
                },
                "c_proj": {
                    "kernel": np.stack(
                        [
                            _t(state[f"{prefix}.resblocks.{i}.mlp.c_proj.weight"])
                            for i in range(layers)
                        ]
                    ),
                    "bias": take("{prefix}.resblocks.{i}.mlp.c_proj.bias"),
                },
            },
        }
    }


def import_vit_params(
    state: Dict[str, np.ndarray],
    layers: int,
    base_grid: int,
    clip_proj_dim: Optional[int] = None,
) -> Params:
    """`visual.*` keys of a ViT CLIP checkpoint -> CLIPVisionTransformer params."""
    conv = state["visual.conv1.weight"]  # [width, 3, p, p]
    width = conv.shape[0]
    patch_kernel = conv.transpose(2, 3, 1, 0).reshape(-1, width)

    pos = _resize_grid_pos_embed(
        state["visual.positional_embedding"], (base_grid, base_grid)
    )

    params: Params = {
        "patch_embed": patch_kernel,
        "class_embedding": state["visual.class_embedding"],
        "positional_embedding": pos,
        "ln_pre": {
            "scale": state["visual.ln_pre.weight"],
            "bias": state["visual.ln_pre.bias"],
        },
        "ln_post": {
            "scale": state["visual.ln_post.weight"],
            "bias": state["visual.ln_post.bias"],
        },
        "transformer": {
            "blocks": _stack_blocks(state, "visual.transformer", layers)
        },
    }
    proj = state.get("visual.proj")
    if proj is not None and (clip_proj_dim is None or proj.shape[1] == clip_proj_dim):
        params["proj"] = proj
    return params


def import_resnet_params(
    state: Dict[str, np.ndarray],
    layers: tuple,
    spacial_dim: int,
    with_attnpool: bool = True,
) -> tuple[Params, Params]:
    """`visual.*` keys of a ResNet CLIP checkpoint -> CLIPResNet params.

    Mirrors the reference's ResNet weight loader incl. the attnpool pos-embed
    resize (reference models.py:196-226): 3-conv stem, anti-aliased
    bottleneck stages (downsample Sequential keys 0=conv, 1=bn), and the
    AttentionPool2d q/k/v/c projections.  Returns (params, batch_stats).
    """

    def conv(k):
        return {"kernel": state[f"visual.{k}.weight"].transpose(2, 3, 1, 0)}

    def bn(k):
        p = {
            "scale": state[f"visual.{k}.weight"],
            "bias": state[f"visual.{k}.bias"],
        }
        s = {
            "mean": state[f"visual.{k}.running_mean"],
            "var": state[f"visual.{k}.running_var"],
        }
        return p, s

    params: Params = {}
    stats: Params = {}
    stem_p: Params = {}
    stem_s: Params = {}
    for i in (1, 2, 3):
        stem_p[f"conv{i}"] = conv(f"conv{i}")
        bp, bs = bn(f"bn{i}")
        stem_p[f"bn{i}"] = bp
        stem_s[f"bn{i}"] = bs
    params["stem"] = stem_p
    stats["stem"] = stem_s

    for li, blocks in enumerate(layers, start=1):
        lp: Params = {}
        ls: Params = {}
        for bi in range(blocks):
            pre = f"layer{li}.{bi}"
            bp: Params = {}
            bs: Params = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = conv(f"{pre}.conv{ci}")
                a, b = bn(f"{pre}.bn{ci}")
                bp[f"bn{ci}"] = a
                bs[f"bn{ci}"] = b
            if f"visual.{pre}.downsample.0.weight" in state:
                bp["downsample_conv"] = conv(f"{pre}.downsample.0")
                a, b = bn(f"{pre}.downsample.1")
                bp["downsample_bn"] = a
                bs["downsample_bn"] = b
            lp[f"block{bi}"] = bp
            ls[f"block{bi}"] = bs
        params[f"layer{li}"] = lp
        stats[f"layer{li}"] = ls

    if with_attnpool and "visual.attnpool.positional_embedding" in state:
        pos = _resize_grid_pos_embed(
            state["visual.attnpool.positional_embedding"],
            (spacial_dim, spacial_dim),
        )
        ap: Params = {"positional_embedding": pos}
        for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
            ap[name] = {
                "kernel": _t(state[f"visual.attnpool.{name}.weight"]),
                "bias": state[f"visual.attnpool.{name}.bias"],
            }
        params["attnpool"] = ap
    return params, stats


def import_text_params(
    state: Dict[str, np.ndarray],
    layers: int,
    context_length: int,
    embed_dim: int,
) -> Params:
    """Text-tower keys -> CLIPTextEncoder / CLIPTextContextEncoder params.

    Truncates pos-embed to `context_length`; skips `text_projection` on shape
    mismatch (caller keeps random init), mirroring denseclip.py:171-186.
    """
    pos = state["positional_embedding"]
    if pos.shape[0] > context_length:
        pos = pos[:context_length]
    elif pos.shape[0] < context_length:
        raise ValueError(
            f"checkpoint text pos-embed {pos.shape[0]} < model capacity {context_length}"
        )
    params: Params = {
        "token_embedding": {"embedding": state["token_embedding.weight"]},
        "positional_embedding": pos,
        "ln_final": {
            "scale": state["ln_final.weight"],
            "bias": state["ln_final.bias"],
        },
        "transformer": {"blocks": _stack_blocks(state, "transformer", layers)},
    }
    tp = state.get("text_projection")
    if tp is not None and tp.shape[1] == embed_dim:
        params["text_projection"] = tp
    return params


def _merge_into(dst: Params, src: Params) -> int:
    """Recursively overwrite dst leaves with src leaves; returns #leaves set."""
    count = 0
    for key, value in src.items():
        if isinstance(value, dict):
            node = dst.setdefault(key, {})
            count += _merge_into(node, value)
        else:
            if key in dst and tuple(dst[key].shape) != tuple(value.shape):
                raise ValueError(
                    f"shape mismatch for {key}: model {dst[key].shape} vs ckpt {value.shape}"
                )
            dst[key] = np.asarray(value, dtype=np.float32)
            count += 1
    return count


def _ln(state: Dict[str, np.ndarray], prefix: str) -> Params:
    return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}


def _linear(state: Dict[str, np.ndarray], prefix: str) -> Params:
    out = {"kernel": _t(state[f"{prefix}.weight"])}
    if f"{prefix}.bias" in state:
        out["bias"] = state[f"{prefix}.bias"]
    return out


def _conv(state: Dict[str, np.ndarray], prefix: str) -> Params:
    # torch [out, in, kh, kw] -> flax NHWC kernel [kh, kw, in, out]
    out = {"kernel": state[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = state[f"{prefix}.bias"]
    return out


def _bn(state: Dict[str, np.ndarray], prefix: str) -> tuple[Params, Params]:
    """BatchNorm -> (params, batch_stats)."""
    params = {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}
    stats = {
        "mean": state[f"{prefix}.running_mean"],
        "var": state[f"{prefix}.running_var"],
    }
    return params, stats


def _count_indexed(state: Dict[str, np.ndarray], fmt: str) -> int:
    n = 0
    while any(k.startswith(fmt.format(i=n)) for k in state):
        n += 1
    return n


def _fcn_head(state: Dict[str, np.ndarray], prefix: str) -> tuple[Params, Params]:
    """torchvision FCNHead + appended classifier -> our FCNHead tree.

    The reference builds torchvision `FCNHead(in, channels)` (Sequential:
    Conv3x3 no-bias / BN / ReLU / Dropout / Conv1x1) and ASSIGNS `.classifier`,
    which appends a final Conv1x1 (reference denseclip.py:305-309, 343-349).
    State keys are the Sequential indices 0/1/4 plus 'classifier'.
    """
    bn_params, bn_stats = _bn(state, f"{prefix}.1")
    params = {
        "conv0": _conv(state, f"{prefix}.0"),
        "bn0": bn_params,
        "conv1": _conv(state, f"{prefix}.4"),
        "classifier": _conv(state, f"{prefix}.classifier"),
    }
    return params, {"bn0": bn_stats}


def _fusion_neck(state: Dict[str, np.ndarray], prefix: str) -> tuple[Params, Params]:
    """Reference ViTFeatureFusionNeck (models.py:717-782) -> our neck tree."""
    params: Params = {}
    stats: Params = {}
    levels = _count_indexed(state, f"{prefix}.process_layers.{{i}}.")
    for i in range(levels):
        bn_params, bn_stats = _bn(state, f"{prefix}.process_layers.{i}.1")
        params[f"process_{i}"] = {
            "conv": _conv(state, f"{prefix}.process_layers.{i}.0"),
            "bn": bn_params,
        }
        stats[f"process_{i}"] = {"bn": bn_stats}
    bn_params, bn_stats = _bn(state, f"{prefix}.fusion_layer.1")
    params["fuse"] = {"conv": _conv(state, f"{prefix}.fusion_layer.0"), "bn": bn_params}
    stats["fuse"] = {"bn": bn_stats}
    return params, stats


def _einsum_attn_self(state: Dict[str, np.ndarray], prefix: str) -> Params:
    """Reference einsum `Attention` (models.py:311-344: separate unbiased
    q/k/v projections + biased out proj) -> our fused-QKV self-attention."""
    qkv = np.concatenate(
        [
            _t(state[f"{prefix}.q_proj.weight"]),
            _t(state[f"{prefix}.k_proj.weight"]),
            _t(state[f"{prefix}.v_proj.weight"]),
        ],
        axis=1,
    )
    return {"qkv": {"kernel": qkv}, "out": _linear(state, f"{prefix}.proj")}


def _einsum_attn_cross(state: Dict[str, np.ndarray], prefix: str) -> Params:
    kv = np.concatenate(
        [_t(state[f"{prefix}.k_proj.weight"]), _t(state[f"{prefix}.v_proj.weight"])],
        axis=1,
    )
    return {
        "q": {"kernel": _t(state[f"{prefix}.q_proj.weight"])},
        "kv": {"kernel": kv},
        "out": _linear(state, f"{prefix}.proj"),
    }


def _context_decoder(state: Dict[str, np.ndarray], prefix: str) -> Params:
    """Reference ContextDecoder (models.py:867-917) -> our tree.

    memory_proj = Sequential(LN, Linear, LN); text_proj = Sequential(LN,
    Linear); decoder = N x TransformerDecoderLayer (models.py:346-375);
    out_proj = Sequential(LN, Linear).
    """
    params: Params = {
        "memory_ln_in": _ln(state, f"{prefix}.memory_proj.0"),
        "memory_proj": _linear(state, f"{prefix}.memory_proj.1"),
        "memory_ln_out": _ln(state, f"{prefix}.memory_proj.2"),
        "text_ln": _ln(state, f"{prefix}.text_proj.0"),
        "text_proj": _linear(state, f"{prefix}.text_proj.1"),
        "out_ln": _ln(state, f"{prefix}.out_proj.0"),
        "out_proj": _linear(state, f"{prefix}.out_proj.1"),
    }
    for i in range(_count_indexed(state, f"{prefix}.decoder.{{i}}.")):
        lp = f"{prefix}.decoder.{i}"
        params[f"layer_{i}"] = {
            "norm1": _ln(state, f"{lp}.norm1"),
            "norm2": _ln(state, f"{lp}.norm2"),
            "norm3": _ln(state, f"{lp}.norm3"),
            "self_attn": _einsum_attn_self(state, f"{lp}.self_attn"),
            "cross_attn": _einsum_attn_cross(state, f"{lp}.cross_attn"),
            "mlp_fc": _linear(state, f"{lp}.mlp.0"),
            "mlp_proj": _linear(state, f"{lp}.mlp.3"),
        }
    return params


def import_reference_denseclip(
    state: Dict[str, np.ndarray], variables: Params
) -> Params:
    """Full reference `DenseCLIP` state_dict -> our composite variables.

    Migrates a torch checkpoint of the ENTIRE reference model — towers,
    vis/global projections, context decoder, fusion neck, seg/depth heads,
    learnable contexts and gamma (reference denseclip.py:65-513) — into this
    framework's `{'params', 'batch_stats'}` variables (shapes taken from an
    existing `model.init` tree).  Layer counts and pos-embed geometry are
    derived from the trees, so any preset works.

    `state` is `{k: v.float().numpy() for k, v in model.state_dict().items()}`.
    """
    import jax

    variables = jax.tree.map(np.asarray, dict(variables))
    params: Params = variables["params"]
    stats: Params = variables.setdefault("batch_stats", {})

    # --- backbone (ViT): reuse the CLIP importer via the visual.* prefix ---
    vit_layers = _count_indexed(state, "backbone.transformer.resblocks.{i}.")
    vis_state = {
        f"visual.{k[len('backbone.'):]}": v
        for k, v in state.items()
        if k.startswith("backbone.")
    }
    n_pos = params["backbone"]["positional_embedding"].shape[0]
    base_grid = int(round((n_pos - 1) ** 0.5))
    proj_tree = params["backbone"].get("proj")
    vit = import_vit_params(
        vis_state,
        layers=vit_layers,
        base_grid=base_grid,
        clip_proj_dim=None if proj_tree is None else proj_tree.shape[1],
    )
    _merge_into(params["backbone"], vit)

    # --- text tower ---
    text_layers = _count_indexed(state, "text_encoder.transformer.resblocks.{i}.")
    text_state = {
        k[len("text_encoder."):]: v
        for k, v in state.items()
        if k.startswith("text_encoder.")
    }
    text = import_text_params(
        text_state,
        layers=text_layers,
        context_length=params["text_encoder"]["positional_embedding"].shape[0],
        embed_dim=params["text_encoder"]["text_projection"].shape[1],
    )
    _merge_into(params["text_encoder"], text)

    # --- projections + learnable prompt (denseclip.py:195-200, 377-406) ---
    if "vis_proj.weight" in state:
        _merge_into(params["vis_proj"], _conv(state, "vis_proj"))
        _merge_into(params["global_proj"], _linear(state, "global_proj"))
    if "contexts" in state:
        _merge_into(params, {"contexts": state["contexts"]})
    if "gamma" in state:
        _merge_into(params, {"gamma": state["gamma"]})

    # --- context decoder / neck / heads ---
    if any(k.startswith("context_decoder.") for k in state):
        _merge_into(
            params["context_decoder"], _context_decoder(state, "context_decoder")
        )
    if any(k.startswith("neck.") for k in state):
        p, s = _fusion_neck(state, "neck")
        _merge_into(params["neck"], p)
        _merge_into(stats.setdefault("neck", {}), s)
    for head in ("decode_head", "depth_head"):
        if any(k.startswith(f"{head}.") for k in state):
            p, s = _fcn_head(state, head)
            _merge_into(params[head], p)
            _merge_into(stats.setdefault(head, {}), s)
    return variables


def load_clip_into_variables(
    variables: Params, clip_path: str, model_cfg
) -> tuple[Params, int, int]:
    """Load an OpenAI CLIP checkpoint into DenseCLIP variables, any backbone.

    Dispatches on `model.backbone.type`: ViT checkpoints feed the ViT
    importer (pos-embed grid resize), RN50/RN101 checkpoints feed the ResNet
    importer (BN running stats land in `batch_stats`, attnpool pos-embed
    resized — reference models.py:196-226 / denseclip.py:156-191).
    Returns (updated variables, #visual leaves, #text leaves).
    """
    import jax

    bb = dict(model_cfg["backbone"])
    te = dict(model_cfg["text_encoder"])
    state = load_clip_state_dict(clip_path)
    params = jax.tree.map(np.asarray, dict(variables["params"]))
    stats = jax.tree.map(np.asarray, dict(variables.get("batch_stats", {})))

    if "visual.class_embedding" in state:  # ViT tower
        proj = params["backbone"].get("proj")
        vit = import_vit_params(
            state,
            layers=int(bb.get("layers", 12)),
            base_grid=int(bb.get("input_resolution", 224))
            // int(bb.get("patch_size", 16)),
            clip_proj_dim=None if proj is None else int(proj.shape[1]),
        )
        n_vis = _merge_into(params["backbone"], vit)
    else:  # ResNet tower
        rn_p, rn_s = import_resnet_params(
            state,
            layers=tuple(bb.get("layers", (3, 4, 6, 3))),
            spacial_dim=int(bb.get("input_resolution", 224)) // 32,
            with_attnpool="attnpool" in params["backbone"],
        )
        n_vis = _merge_into(params["backbone"], rn_p)
        if "backbone" in stats:
            n_vis += _merge_into(stats["backbone"], rn_s)

    text = import_text_params(
        state,
        layers=int(te.get("transformer_layers", 12)),
        context_length=int(
            params["text_encoder"]["positional_embedding"].shape[0]
        ),
        embed_dim=int(params["text_encoder"]["text_projection"].shape[1]),
    )
    n_txt = _merge_into(params["text_encoder"], text)
    out = {**dict(variables), "params": params}
    if stats:
        out["batch_stats"] = stats
    return out, n_vis, n_txt


def load_clip_into_denseclip(
    params: Params,
    clip_path: str,
    vit_layers: int,
    vit_base_grid: int,
    text_layers: int,
    text_context_length: int,
    text_embed_dim: int,
) -> Params:
    """Load CLIP weights into a DenseCLIP param tree (in place on a copy).

    `params` is the `variables['params']` dict from `model.init`; the
    backbone lives under 'backbone', the text tower under 'text_encoder'
    (flax submodule names).  Returns the updated tree.
    """
    import jax

    state = load_clip_state_dict(clip_path)
    params = jax.tree.map(np.asarray, params)

    vit = import_vit_params(
        state, layers=vit_layers, base_grid=vit_base_grid
    )
    n_vis = _merge_into(params["backbone"], vit)

    text = import_text_params(
        state,
        layers=text_layers,
        context_length=text_context_length,
        embed_dim=text_embed_dim,
    )
    n_txt = _merge_into(params["text_encoder"], text)
    del state
    return params, n_vis, n_txt
