"""DeepLabV3+ model assembly & registry.

Rebuilds the reference factory (/root/reference/deeplabv3p/model.py:23-117)
the JAX way: a `DeeplabV3Plus` Flax module produces **logits at input
resolution** (N, H, W, num_classes); softmax / argmax / training flatten are
explicit functions, not graph layers (reference bakes Reshape+Softmax into
the Keras graph at model.py:79-86).

The reference's chop-at-`layers[-5]` + re-head quirk (model.py:65-76) —
build a 21-class pretrained graph, drop its logits conv, add a fresh
`conv_upsample` 1x1 for the real class count — is reproduced structurally:
the final conv here is named `conv_upsample` and is the only head-count-
dependent parameter, so pretrained checkpoints load everywhere else.

Freeze levels (model.py:106-115) map to optax gradient masks built by
`make_trainable_mask`.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deeplabv3p_tpu.models.layers import ASPP, ASPPLite, Decoder, Subpixel, _conv
from deeplabv3p_tpu.models.mobilenetv2 import MobileNetV2Body
from deeplabv3p_tpu.models.mobilenetv3 import (
    MobileNetV3LargeBody,
    MobileNetV3SmallBody,
)
from deeplabv3p_tpu.models.mobilevit import MobileViTBody
from deeplabv3p_tpu.models.ghostnet import GhostNetBody
from deeplabv3p_tpu.models.peleenet import PeleeNetBody
from deeplabv3p_tpu.models.resnet50 import ResNet50Body
from deeplabv3p_tpu.models.xception import XceptionBody
from deeplabv3p_tpu.ops.resize import resize_bilinear


class DeeplabV3Plus(nn.Module):
    """Backbone → ASPP[/Lite] → [Decoder] → 1x1 logits → bilinear upsample.

    Output: logits (N, H, W, num_classes) in fp32 at input resolution.
    """

    backbone_fn: Callable[..., nn.Module]
    num_classes: int = 21
    output_stride: int = 16
    lite: bool = False
    use_subpixel: bool = False
    remat: Any = False  # rematerialize backbone activations (OS8 @ 512
    # memory relief, SURVEY.md §7 "GlobalPool-in-graph + OS=8 memory").
    # False/off | True/'full' (one checkpoint around the whole backbone)
    # | 'block' (per-block checkpoints — backbones exposing a
    # `remat_blocks` field; finer memory control, compile-friendlier)
    fused_aspp: bool = False  # Pallas fused ASPP depthwise at inference
    fused_decoder: bool = False  # Pallas fused decoder front-end at inference
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        freeze_level: int = 0,
        skip_final_resize: bool = False,
    ) -> jax.Array:
        """Forward pass.

        freeze_level mirrors Keras `trainable=False` semantics during the
        reference's two-stage transfer training (train.py:172-187): frozen
        layers' BatchNorms run in *inference* mode (use running stats, do
        not update them), exactly like TF2 BN with trainable=False.
        freeze_level 1 freezes the backbone; 2 freezes all but the head.

        skip_final_resize returns the fp32 logits at FEATURE resolution,
        omitting the final bilinear upsample — the contract of the fused
        upsample+CE loss tail (ops/pallas/upsample_ce.py), which performs
        the identical resize inside its kernel so full-resolution logits
        never touch HBM. Only valid for the conv head (the subpixel head
        has no final resize to skip).
        """
        in_h, in_w = x.shape[1], x.shape[2]
        if self.dtype is not None:
            x = x.astype(self.dtype)

        backbone_train = train and freeze_level < 1
        head_train = train and freeze_level < 2

        remat_mode = {False: None, True: "full", "off": None}.get(
            self.remat, self.remat
        )
        if remat_mode not in (None, "full", "block"):
            raise ValueError(f"remat must be off/full/block, got {self.remat!r}")
        if remat_mode == "block":
            # per-block checkpoints: the backbone wraps each of its blocks
            # in jax.checkpoint itself (param scopes unchanged, so
            # checkpoints stay interchangeable with the non-remat model)
            import dataclasses
            import functools

            cls = (self.backbone_fn.func
                   if isinstance(self.backbone_fn, functools.partial)
                   else self.backbone_fn)
            if "remat_blocks" not in {
                f.name for f in dataclasses.fields(cls)
            }:
                raise ValueError(
                    f"remat='block' unsupported for {cls.__name__} "
                    "(no remat_blocks field); use remat='full'"
                )
            feat, skip = self.backbone_fn(
                output_stride=self.output_stride, dtype=self.dtype,
                remat_blocks=True, name="backbone",
            )(x, train=backbone_train)
        elif remat_mode == "full":
            # trade FLOPs for HBM: recompute backbone activations in the
            # backward pass (flax lifted jax.checkpoint); needed for the
            # memory-heavy OS8 @ 512 configs (SURVEY.md §7). The param
            # scope stays 'backbone', so checkpoints are interchangeable
            # with the non-remat model.
            import functools

            if isinstance(self.backbone_fn, functools.partial):
                cls, kw = self.backbone_fn.func, dict(self.backbone_fn.keywords)
            else:
                cls, kw = self.backbone_fn, {}
            remat_cls = nn.remat(cls, static_argnums=(2,))
            feat, skip = remat_cls(
                output_stride=self.output_stride, dtype=self.dtype,
                name="backbone", **kw,
            )(x, backbone_train)
        else:
            feat, skip = self.backbone_fn(
                output_stride=self.output_stride, dtype=self.dtype,
                name="backbone",
            )(x, train=backbone_train)

        if self.lite:
            # Lite head: ASPP-Lite, no decoder (reference
            # deeplabv3p_mobilenetv2.py:324-331).
            feat = ASPPLite(dtype=self.dtype, name="aspp")(feat, train=head_train)
        else:
            feat = ASPP(
                output_stride=self.output_stride,
                fused_inference=self.fused_aspp,
                dtype=self.dtype, name="aspp",
            )(feat, train=head_train)
            feat = Decoder(
                fused_inference=self.fused_decoder, dtype=self.dtype,
                name="decoder",
            )(feat, skip, train=head_train)

        if self.use_subpixel:
            if skip_final_resize:
                raise ValueError(
                    "skip_final_resize is incompatible with the subpixel "
                    "head (its upsample is the PixelShuffle itself)"
                )
            # Reference hardcodes scale 4 (xception) / 8 (model.py:68-73);
            # we derive it from the actual feature resolution so every
            # backbone/OS combination is shape-correct. Scope name
            # 'subpixel' (+ wrapper 'c' for the inner conv) maps to the
            # reference's auto-assigned Keras layer name, so subpixel h5
            # checkpoints interchange by name like every other layer.
            scale = in_h // feat.shape[1]
            logits = Subpixel(
                self.num_classes, kernel_size=1, r=scale, dtype=self.dtype,
                name="subpixel",
            )(feat)
            logits = logits.astype(jnp.float32)
        else:
            logits = _conv(
                self.num_classes, 1, use_bias=True, name="conv_upsample",
                dtype=self.dtype,
            )(feat)
            logits = logits.astype(jnp.float32)
            if not skip_final_resize:
                # pred_resize (reference model.py:76): bilinear to input
                # size, in fp32 for numerically stable loss/softmax.
                logits = resize_bilinear(logits, (in_h, in_w))
        return logits


# Registry mirroring reference deeplab_model_map (model.py:23-48).
# Each entry: (backbone factory, lite-head flag).
DEEPLAB_MODEL_REGISTRY: dict[str, tuple[Callable[..., nn.Module], bool]] = {
    "mobilenetv2": (partial(MobileNetV2Body, alpha=1.0), False),
    "mobilenetv2_lite": (partial(MobileNetV2Body, alpha=1.0), True),
    "mobilenetv3large": (partial(MobileNetV3LargeBody, alpha=1.0), False),
    "mobilenetv3large_lite": (partial(MobileNetV3LargeBody, alpha=1.0), True),
    "mobilenetv3small": (partial(MobileNetV3SmallBody, alpha=1.0), False),
    "mobilenetv3small_lite": (partial(MobileNetV3SmallBody, alpha=1.0), True),
    "xception": (XceptionBody, False),
    "resnet50": (ResNet50Body, False),
    "peleenet": (PeleeNetBody, False),
    "peleenet_lite": (PeleeNetBody, True),
    "ghostnet": (GhostNetBody, False),
    "ghostnet_lite": (GhostNetBody, True),
    "mobilevit_s": (partial(MobileViTBody, size="s"), False),
    "mobilevit_s_lite": (partial(MobileViTBody, size="s"), True),
    "mobilevit_xs": (partial(MobileViTBody, size="xs"), False),
    "mobilevit_xs_lite": (partial(MobileViTBody, size="xs"), True),
    "mobilevit_xxs": (partial(MobileViTBody, size="xxs"), False),
    "mobilevit_xxs_lite": (partial(MobileViTBody, size="xxs"), True),
}


def register_deeplab_model(
    name: str, backbone_fn: Callable[..., nn.Module], lite: bool
) -> None:
    DEEPLAB_MODEL_REGISTRY[name] = (backbone_fn, lite)


def build_deeplab_model(
    model_type: str,
    num_classes: int,
    output_stride: int = 16,
    use_subpixel: bool = False,
    remat: bool = False,
    fused_aspp: bool = False,
    fused_decoder: bool = False,
    dtype: Optional[Any] = None,
) -> DeeplabV3Plus:
    """Construct a DeepLabV3+ model (reference get_deeplabv3p_model,
    model.py:51-117). Weight loading / freezing are separate concerns:
    see deeplabv3p_tpu.utils.checkpoint and make_trainable_mask."""
    if model_type not in DEEPLAB_MODEL_REGISTRY:
        raise ValueError(
            f"This model type is not supported now: {model_type!r}. "
            f"Available: {sorted(DEEPLAB_MODEL_REGISTRY)}"
        )
    backbone_fn, lite = DEEPLAB_MODEL_REGISTRY[model_type]
    return DeeplabV3Plus(
        backbone_fn=backbone_fn,
        num_classes=num_classes,
        output_stride=output_stride,
        lite=lite,
        use_subpixel=use_subpixel,
        remat=remat,
        fused_aspp=fused_aspp,
        fused_decoder=fused_decoder,
        dtype=dtype,
    )


def build_segmentation_model(
    model_type: str,
    num_classes: int,
    output_stride: int = 16,
    use_subpixel: bool = False,
    remat: bool = False,
    fused_aspp: bool = False,
    fused_decoder: bool = False,
    dtype: Optional[Any] = None,
):
    """Unified factory across the three reference model families:
    DeepLabV3+ (deeplabv3p/model.py:23-48), UNet (unet/model.py:15-19),
    Fast-SCNN (fast_scnn/model.py). Every model emits logits at input
    resolution, so training/eval/inference code is family-agnostic."""
    if model_type in DEEPLAB_MODEL_REGISTRY:
        return build_deeplab_model(
            model_type, num_classes, output_stride=output_stride,
            use_subpixel=use_subpixel, remat=remat, fused_aspp=fused_aspp,
            fused_decoder=fused_decoder, dtype=dtype,
        )
    from deeplabv3p_tpu.models.fast_scnn import (
        FAST_SCNN_MODEL_REGISTRY, build_fast_scnn_model,
    )
    from deeplabv3p_tpu.models.unet import UNET_MODEL_REGISTRY, build_unet_model

    if model_type in UNET_MODEL_REGISTRY:
        return build_unet_model(model_type, num_classes, dtype=dtype)
    if model_type in FAST_SCNN_MODEL_REGISTRY:
        return build_fast_scnn_model(model_type, num_classes, dtype=dtype)
    raise ValueError(
        f"This model type is not supported now: {model_type!r}. Available: "
        f"{sorted(DEEPLAB_MODEL_REGISTRY) + sorted(UNET_MODEL_REGISTRY) + sorted(FAST_SCNN_MODEL_REGISTRY)}"
    )


def make_trainable_mask(params: Any, freeze_level: int) -> Any:
    """Boolean pytree mask (True = trainable) implementing reference freeze
    levels (model.py:106-115):

    0 — train everything;
    1 — freeze the backbone;
    2 — freeze everything except the prediction head (`conv_upsample`,
        or `subpixel` for the sub-pixel head).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if freeze_level == 0:
            return True
        if freeze_level == 1:
            return "backbone" not in keys
        if freeze_level == 2:
            return "conv_upsample" in keys or "subpixel" in keys
        raise ValueError(f"invalid freeze_level {freeze_level}")

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [trainable(path) for path, _ in flat]
    )
