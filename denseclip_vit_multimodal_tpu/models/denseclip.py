"""DenseCLIP composite segmentor (seg + optional depth), TPU-first.

Re-design of the reference `DenseCLIP` module and its config-driven assembly
(reference: segmentation/denseclip/denseclip.py:60-916).  Differences that
matter, all documented:

  * NHWC layout end to end; all resizes are align_corners=False bilinear
    (matching reference F.interpolate usage).
  * Score-map concat: the reference computes the score map but — due to list
    aliasing in `forward` (denseclip.py:743-759 passes the ORIGINAL features
    to the neck, discarding `_process_features`' concatenated copy) — never
    feeds it downstream.  We implement the *intended* mmseg-heritage
    behavior (concat into the neck inputs when `0 <= score_concat_index <
    len(features)`, cf. configs/denseclip_fpn_res50_512x512_80k.py:40); the
    working ViT config sets -1 so default behavior is identical.
  * `tau` is carried for config parity but, exactly like the reference
    (denseclip.py:101 stores it, `_process_features` never reads it), it does
    not scale the score map.
  * Losses live in the trainer (train/losses.py), as in the reference.

The learnable prompt (`contexts`, trunc-normal 0.02) and fusion scale
(`gamma`, 1e-4) are parameters of this module (denseclip.py:377-406); the
gradient flows through the frozen text tower into them.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from denseclip_vit_multimodal_tpu.models.context_decoder import ContextDecoder
from denseclip_vit_multimodal_tpu.models.heads import FCNHead, IdentityHead
from denseclip_vit_multimodal_tpu.models.layers import resize_bilinear
from denseclip_vit_multimodal_tpu.models.necks import FPN, ViTFeatureFusionNeck
from denseclip_vit_multimodal_tpu.models.resnet import (
    CLIPResNet,
    CLIPResNetWithAttention,
)
from denseclip_vit_multimodal_tpu.models.text import (
    CLIPTextContextEncoder,
    CLIPTextEncoder,
)
from denseclip_vit_multimodal_tpu.models.vit import CLIPVisionTransformer
from denseclip_vit_multimodal_tpu.ops.score_map import score_map as compute_score_map
from denseclip_vit_multimodal_tpu.text.tokenizer import tokenize

Dtype = Any


class DenseCLIP(nn.Module):
    """Language-guided dense prediction: CLIP backbone + text tower + heads."""

    backbone: nn.Module
    text_encoder: nn.Module
    decode_head: Optional[nn.Module] = None
    depth_head: Optional[nn.Module] = None
    context_decoder: Optional[nn.Module] = None
    neck: Optional[nn.Module] = None
    identity_head: Optional[nn.Module] = None

    num_classes: int = 19
    text_dim: int = 512
    token_embed_dim: int = 512
    context_feature: str = "attention"
    score_concat_index: int = -1
    tau: float = 0.07  # stored for config parity; unused (see module docstring)
    backbone_out_channels: int = 768
    fixed_context_length: int = 6  # tokens per class name
    num_learnable_contexts: int = 16  # N2 = encoder capacity - fixed length
    dtype: Dtype = jnp.float32

    @property
    def is_context_encoder(self) -> bool:
        return isinstance(self.text_encoder, CLIPTextContextEncoder)

    def setup(self):
        # Declared in setup (not the compact __call__) so encode_text_base can
        # be invoked standalone via apply(method=...) — Flax only permits
        # self.param in setup or the one compact method.  The name and scope
        # ("contexts" at module root) match the previous compact declaration,
        # so existing checkpoints load unchanged.
        if self.is_context_encoder and self.num_learnable_contexts > 0:
            self.contexts = self.param(
                "contexts",
                nn.initializers.truncated_normal(
                    stddev=0.02, lower=-2.0, upper=2.0
                ),
                (1, self.num_learnable_contexts, self.token_embed_dim),
                jnp.float32,
            )
        else:
            self.contexts = None

    def encode_text_base(
        self, texts: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """The image-independent text-tower output ([1, K, C] for the
        context encoder, [K, C] plain).

        The tower (and its learnable prompt) sees only `texts` + params, so a
        serving process can run it ONCE per checkpoint and feed the result to
        every frame via `__call__(cached_text=...)` — only the per-image
        context-decoder fusion stays in the hot program.  (The reference
        re-runs its text tower inside every forward,
        reference denseclip.py:640-656.)  Invoke via
        `model.apply(variables, texts, method="encode_text_base")`.
        """
        return self._text_tower(texts, deterministic)

    def _text_tower(self, texts: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.is_context_encoder:
            if self.contexts is not None:
                contexts = self.contexts  # declared in setup
            else:
                # capacity == fixed length -> nothing to learn; a zero-width
                # context splices to a no-op (the reference warns and passes
                # contexts=None, denseclip.py:383-386 — same semantics)
                contexts = jnp.zeros((1, 0, self.token_embed_dim), jnp.float32)
            return self.text_encoder(
                texts, contexts, deterministic=deterministic
            )  # [1, K, C]
        return self.text_encoder(texts, deterministic=deterministic)  # [K, C]

    def encode_text(
        self,
        texts: jnp.ndarray,
        batch: int,
        visual_context: Optional[jnp.ndarray],
        deterministic: bool,
        cached_text: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Text features [B, K, text_dim], with prompt learning + context fusion.

        `cached_text` short-circuits the tower with a precomputed
        `encode_text_base` result (serving: the tower is per-checkpoint
        constant; training must NOT pass it — the prompt is learnable).
        """
        if cached_text is not None:
            emb = cached_text
        else:
            # The learnable prompt is batch-invariant, so the tower output is
            # identical for every batch element: encode ONCE and broadcast —
            # the same encode-once-then-expand the reference does
            # (denseclip.py:652-656 expands [1,K,C] -> [B,K,C] after the
            # tower).  This replaced an earlier version of THIS repo that
            # re-encoded per batch element (measured ~1 ms/frame of waste at
            # the 10-window slide batch).  The per-image conditioning enters
            # below, through the context-decoder delta.
            emb = self._text_tower(texts, deterministic)
        if emb.ndim == 2:
            emb = emb[None]  # plain encoder: [K, C] -> [1, K, C]
        text_embeddings = jnp.broadcast_to(emb, (batch,) + emb.shape[1:])

        if self.context_decoder is not None and visual_context is not None:
            gamma = self.param(
                "gamma",
                lambda key, shape: jnp.full(shape, 1e-4, jnp.float32),
                (self.text_dim,),
            )
            delta = self.context_decoder(
                text_embeddings, visual_context, deterministic=deterministic
            )
            text_embeddings = text_embeddings + gamma * delta
        return text_embeddings

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,  # NHWC float [B, H, W, 3]
        texts: jnp.ndarray,  # int32 [K, N1] tokenized class names
        train: bool = False,
        gt_hw: Optional[Tuple[int, int]] = None,
        return_features: bool = False,
        resize_outputs: bool = True,
        cached_text: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Returns {'seg': [B,h,w,K], 'depth': [B,h,w,1], 'score_map': ...}.

        Train mode resizes outputs to `gt_hw` (reference denseclip.py:843-867);
        inference resizes to the input image size (denseclip.py:892-916).
        `resize_outputs=False` skips that final upsample and returns logits at
        head resolution — the slide engine fuses the (linear) upsample into
        its scatter loop instead of materializing full-crop fp32 logits for
        every window.  Segmentation logits come back channel-last.
        """
        deterministic = not train
        feats = self.backbone(image.astype(self.dtype), deterministic=deterministic)
        feats = list(feats)

        # --- _process_features (reference denseclip.py:570-698) ---
        visual = feats[-1]  # [B, h, w, C_vis]
        b, fh, fw, c_vis = visual.shape
        global_feat = jnp.mean(visual, axis=(1, 2))  # [B, C_vis]

        if self.backbone_out_channels != self.text_dim:
            global_feat = nn.Dense(
                self.text_dim,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(stddev=0.01),
                name="global_proj",
            )(global_feat)
            visual = nn.Conv(
                self.text_dim,
                (1, 1),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "truncated_normal"
                ),
                name="vis_proj",
            )(visual)

        visual_context = None
        if self.context_decoder is not None:
            spatial_seq = visual.reshape(b, fh * fw, -1)
            if self.context_feature == "attention":
                visual_context = jnp.concatenate(
                    [global_feat[:, None, :], spatial_seq], axis=1
                )
            elif self.context_feature == "backbone":
                visual_context = spatial_seq
            else:
                raise ValueError(f"invalid context_feature {self.context_feature!r}")

        text_embeddings = self.encode_text(
            texts, b, visual_context, deterministic, cached_text=cached_text
        )

        smap = compute_score_map(visual, text_embeddings)  # [B, h, w, K] fp32

        # --- neck & heads (reference denseclip.py:754-817) ---
        neck_inputs = feats
        if 0 <= self.score_concat_index < len(neck_inputs):
            target = neck_inputs[self.score_concat_index]
            smap_r = resize_bilinear(smap, target.shape[1:3]).astype(target.dtype)
            neck_inputs = list(neck_inputs)
            neck_inputs[self.score_concat_index] = jnp.concatenate(
                [target, smap_r], axis=-1
            )

        if self.neck is not None:
            n_in = getattr(self.neck, "num_inputs", len(neck_inputs))
            if n_in < len(neck_inputs):
                # ResNet-with-attention exposes c1..c4 + pooled map; a 4-level
                # FPN consumes the stage pyramid (the pooled map only feeds
                # the score/context path, reference denseclip.py:264-281).
                neck_inputs = neck_inputs[:n_in]
            neck_out = self.neck(neck_inputs, train=train)
            head_input = neck_out[0] if isinstance(neck_out, (tuple, list)) else neck_out
        else:
            head_input = neck_inputs[-1]

        seg_logits = None
        if self.decode_head is not None:
            seg_logits = self.decode_head(head_input, train=train)
        depth_pred = None
        if self.depth_head is not None:
            depth_pred = self.depth_head(head_input, train=train)

        # --- resize to target (GT during training, image size at inference) ---
        if train and gt_hw is not None:
            target_hw = tuple(gt_hw)
        else:
            target_hw = (image.shape[1], image.shape[2])
        if resize_outputs:
            if seg_logits is not None and seg_logits.shape[1:3] != target_hw:
                seg_logits = resize_bilinear(
                    seg_logits.astype(jnp.float32), target_hw
                )
            if depth_pred is not None and depth_pred.shape[1:3] != target_hw:
                depth_pred = resize_bilinear(
                    depth_pred.astype(jnp.float32), target_hw
                )

        out: Dict[str, Any] = {"seg": seg_logits, "depth": depth_pred}
        if return_features:
            out["score_map"] = smap
            out["text_embeddings"] = text_embeddings
            out["head_input"] = head_input
        if self.identity_head is not None:
            # Identity head over the score map (tau-scaled in the DenseCLIP
            # lineage); exposed for aux-loss use.
            out["identity"] = self.identity_head(smap / self.tau)
        return out


# --------------------------------------------------------------------------
# Config-driven builder (reference denseclip.py:110-358 assembly logic)
# --------------------------------------------------------------------------

CITYSCAPES_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train",
    "motorcycle", "bicycle",
)


def build_denseclip(
    model_cfg: Dict[str, Any],
    class_names: Sequence[str],
    dtype: Dtype = jnp.float32,
    attn_impl: str = "auto",
    remat: Any = False,
) -> Tuple[DenseCLIP, np.ndarray]:
    """Build a DenseCLIP module + tokenized class-name buffer from a config.

    The config schema mirrors the reference YAML
    (configs/denseclip_cityscapes.yaml `model:` section); dispatch logic
    follows reference denseclip.py:110-358.
    Returns (module, texts[int32 K x N1]).
    """
    cfg = dict(model_cfg)
    text_dim = int(cfg.get("text_dim", 512))
    fixed_len = int(cfg.get("context_length", 6))
    # Learnable prompt vectors live in the text transformer width; default
    # to it so presets can't silently mismatch (cf. the ViT-L tower at 768).
    _te_width = int(dict(cfg.get("text_encoder", {})).get("transformer_width", 512))
    token_embed_dim = int(cfg.get("token_embed_dim", _te_width))

    # --- backbone ---
    bb = dict(cfg["backbone"])
    bb_type = bb.pop("type")
    if bb_type == "CLIPVisionTransformer":
        # dedup+sort like the backbone does (vit.py taps sorted(set(...)));
        # counting raw duplicates here would build a neck whose num_inputs
        # the backbone can never satisfy
        out_indices = tuple(
            sorted(set(bb.get("out_indices", [bb.get("layers", 12) - 1])))
        )
        backbone = CLIPVisionTransformer(
            patch_size=int(bb.get("patch_size", 16)),
            width=int(bb.get("width", 768)),
            layers=int(bb.get("layers", 12)),
            heads=int(bb.get("heads", 12)),
            input_resolution=int(bb.get("input_resolution", 224)),
            output_dim=int(bb.get("output_dim", bb.get("width", 768))),
            out_indices=out_indices,
            drop_path_rate=float(bb.get("drop_path_rate", 0.0)),
            attn_impl=attn_impl,
            dtype=dtype,
            remat=remat,
        )
        backbone_out_channels = int(bb.get("width", 768))
        num_levels = len(out_indices)
    elif bb_type == "CLIPResNet":
        backbone = CLIPResNet(
            layers=tuple(bb.get("layers", (3, 4, 6, 3))),
            width=int(bb.get("width", 64)),
            dtype=dtype,
        )
        backbone_out_channels = int(bb.get("width", 64)) * 8 * 4
        num_levels = 4
    elif bb_type == "CLIPResNetWithAttention":
        backbone = CLIPResNetWithAttention(
            layers=tuple(bb.get("layers", (3, 4, 6, 3))),
            width=int(bb.get("width", 64)),
            output_dim=int(bb.get("output_dim", 1024)),
            input_resolution=int(bb.get("input_resolution", 224)),
            dtype=dtype,
        )
        backbone_out_channels = int(bb.get("output_dim", 1024))
        num_levels = 5
    else:
        from denseclip_vit_multimodal_tpu.core.registry import BACKBONES

        cls = BACKBONES.get(bb_type)
        if cls is None:
            raise ValueError(f"Unsupported backbone type: {bb_type}")
        backbone = cls(**bb)
        backbone_out_channels = int(
            getattr(backbone, "out_channels", bb.get("out_channels", 256))
        )
        num_levels = int(getattr(backbone, "num_levels", bb.get("num_levels", 1)))

    # --- text encoder ---
    te = dict(cfg["text_encoder"])
    te_type = te.pop("type")
    embed_dim = int(te.get("embed_dim", text_dim))
    if embed_dim != text_dim:
        text_dim = embed_dim  # reference reconciles to encoder dim (denseclip.py:137)
    common_te = dict(
        vocab_size=int(te.get("vocab_size", 49408)),
        transformer_width=int(te.get("transformer_width", 512)),
        transformer_heads=int(te.get("transformer_heads", 8)),
        transformer_layers=int(te.get("transformer_layers", 12)),
        embed_dim=text_dim,
        dtype=dtype,
    )
    if te_type == "CLIPTextEncoder":
        text_encoder = CLIPTextEncoder(context_length=fixed_len, **common_te)
        num_learnable = 0
    elif te_type == "CLIPTextContextEncoder":
        total_len = int(te["context_length"])
        text_encoder = CLIPTextContextEncoder(context_length=total_len, **common_te)
        num_learnable = total_len - fixed_len
        if num_learnable < 0:
            raise ValueError(
                f"text encoder capacity {total_len} < fixed context {fixed_len}"
            )
    else:
        from denseclip_vit_multimodal_tpu.core.registry import TEXT_ENCODERS

        cls = TEXT_ENCODERS.get(te_type)
        if cls is None:
            raise ValueError(f"Unsupported text_encoder type: {te_type}")
        text_encoder = cls(**te)
        num_learnable = int(te.get("num_learnable_contexts", 0))

    # --- context decoder ---
    context_decoder = None
    if cfg.get("context_decoder"):
        cd = dict(cfg["context_decoder"])
        cd.pop("type", None)
        context_decoder = ContextDecoder(
            transformer_width=int(cd.get("transformer_width", 256)),
            transformer_heads=int(cd.get("transformer_heads", 4)),
            transformer_layers=int(cd.get("transformer_layers", 6)),
            visual_dim=text_dim,
            dropout=float(cd.get("dropout", 0.1)),
            dtype=dtype,
        )

    # --- neck ---
    neck = None
    head_in_channels = backbone_out_channels
    if cfg.get("neck"):
        nk = dict(cfg["neck"])
        nk_type = nk.pop("type")
        if nk_type == "ViTFeatureFusionNeck":
            neck = ViTFeatureFusionNeck(
                num_inputs=num_levels,
                out_channels=int(nk["out_channels"]),
                inter_channels=nk.get("inter_channels"),
                dtype=dtype,
            )
            head_in_channels = int(nk["out_channels"])
        elif nk_type == "FPN":
            in_channels = nk.get("in_channels")
            n_in = len(in_channels) if in_channels else num_levels
            neck = FPN(
                num_inputs=n_in,
                out_channels=int(nk.get("out_channels", 256)),
                num_outs=nk.get("num_outs"),
                dtype=dtype,
            )
            head_in_channels = int(nk.get("out_channels", 256))
        else:
            from denseclip_vit_multimodal_tpu.core.registry import NECKS

            cls = NECKS.get(nk_type)
            if cls is None:
                raise ValueError(f"Unsupported neck type: {nk_type}")
            neck = cls(**nk)
            head_in_channels = int(
                getattr(neck, "out_channels", nk.get("out_channels", 256))
            )

    # --- heads ---
    decode_head = None
    num_classes = len(class_names)
    if cfg.get("decode_head"):
        dh = dict(cfg["decode_head"])
        dh_type = dh.pop("type")
        num_classes = int(dh.get("num_classes", num_classes))
        in_ch = int(dh.get("in_channels", head_in_channels))
        if dh_type in ("FPNHead", "FCNHead"):
            decode_head = FCNHead(
                in_channels=in_ch,
                channels=int(dh.get("channels", 256)),
                num_outputs=num_classes,
                dropout_ratio=float(dh.get("dropout_ratio", 0.1)),
                dtype=dtype,
            )
        elif dh_type == "IdentityHead":
            decode_head = IdentityHead()
        else:
            from denseclip_vit_multimodal_tpu.core.registry import HEADS

            cls = HEADS.get(dh_type)
            if cls is None:
                raise ValueError(f"Unsupported decode_head type: {dh_type}")
            decode_head = cls(**dh)

    depth_head = None
    if cfg.get("depth_head"):
        dph = dict(cfg["depth_head"])
        dph_type = dph.pop("type")
        if dph_type in ("FCNHeadDepth", "FCNHead"):
            depth_head = FCNHead(
                in_channels=int(dph.get("in_channels", head_in_channels)),
                channels=int(dph.get("channels", 128)),
                num_outputs=1,
                # torchvision FCNHead hard-codes Dropout(0.1); the reference
                # depth head inherits it (reference denseclip.py:343-349),
                # so that is the parity default here too.
                dropout_ratio=float(dph.get("dropout_ratio", 0.1)),
                dtype=dtype,
            )
        else:
            raise ValueError(f"Unsupported depth_head type: {dph_type}")

    identity_head = IdentityHead() if cfg.get("identity_head") else None

    texts = tokenize(list(class_names), context_length=fixed_len)

    model = DenseCLIP(
        backbone=backbone,
        text_encoder=text_encoder,
        decode_head=decode_head,
        depth_head=depth_head,
        context_decoder=context_decoder,
        neck=neck,
        identity_head=identity_head,
        num_classes=num_classes,
        text_dim=text_dim,
        token_embed_dim=token_embed_dim,
        context_feature=str(cfg.get("context_feature", "attention")),
        score_concat_index=int(cfg.get("score_concat_index", -1)),
        tau=float(cfg.get("tau", 0.07)),
        backbone_out_channels=backbone_out_channels,
        fixed_context_length=fixed_len,
        num_learnable_contexts=num_learnable,
        dtype=dtype,
    )
    return model, texts
