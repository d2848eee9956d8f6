"""Image resize ops with TF2 / cv2 compatible sampling conventions.

The reference uses three distinct resize semantics that all affect metric
parity (SURVEY.md §7 "hard parts"):

* in-graph `img_resize` bilinear (reference layers.py:48-60) — TF2
  `tf.image.resize` half-pixel-centers bilinear. `jax.image.resize`
  ('linear') implements the same convention, so that is the fast path and
  XLA lowers it to MXU-friendly gathers/matmuls.
* label/nearest resizes via cv2 `INTER_NEAREST`
  (reference data.py:111, data_utils.py:457-477) — cv2's *legacy* mapping
  src = floor(dst * scale) (no half-pixel shift).
* TF nearest (`img_resize` mode='nearest') — half-pixel:
  src = floor((dst + 0.5) * scale).

`resize_nearest` therefore takes a `convention` switch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Half-pixel-centers bilinear resize of NHWC / HWC to spatial `size`.

    Matches tf.image.resize(method='bilinear') used by the reference's
    in-graph `pred_resize` / `aspp_resize` lambdas (layers.py:138,207;
    model.py:76).
    """
    h, w = size
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    elif x.ndim == 3:
        shape = (h, w, x.shape[2])
    else:
        raise ValueError(f"expected HWC or NHWC input, got shape {x.shape}")
    if x.shape[-3] == 1 and x.shape[-2] == 1:
        # Upsample from a 1x1 (ASPP image-pooling branch) is a broadcast;
        # skip the general gather path.
        return jnp.broadcast_to(x, shape)
    return jax.image.resize(x, shape, method="linear")


def resize_bicubic(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Half-pixel bicubic resize (reference img_resize mode='bicubic')."""
    h, w = size
    shape = x.shape[:-3] + (h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="cubic")


def _nearest_indices(out_size: int, in_size: int, convention: str) -> jax.Array:
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    if convention == "cv2":
        src = jnp.floor(dst * scale)
    elif convention == "tf":
        src = jnp.floor((dst + 0.5) * scale)
    else:
        raise ValueError(f"unknown nearest convention {convention!r}")
    return jnp.clip(src.astype(jnp.int32), 0, in_size - 1)


def resize_nearest(
    x: jax.Array, size: tuple[int, int], convention: str = "cv2"
) -> jax.Array:
    """Nearest-neighbour resize of (..., H, W) or (..., H, W, C).

    convention='cv2' matches cv2.INTER_NEAREST (reference mask_resize,
    data_utils.py:457-477); convention='tf' matches tf.image.resize
    nearest (reference layers.py:51-52).
    """
    if x.ndim >= 3 and x.shape[-1] <= 8 and x.ndim != 2:
        # Heuristic not needed — caller controls layout. Treat trailing dim
        # as channels only for ndim>=3 inputs.
        pass
    h, w = size
    if x.ndim == 2:
        hi = _nearest_indices(h, x.shape[0], convention)
        wi = _nearest_indices(w, x.shape[1], convention)
        return x[hi][:, wi]
    # (..., H, W, C)
    hi = _nearest_indices(h, x.shape[-3], convention)
    wi = _nearest_indices(w, x.shape[-2], convention)
    out = jnp.take(x, hi, axis=-3)
    out = jnp.take(out, wi, axis=-2)
    return out


_RESIZE_FNS = {
    "bilinear": resize_bilinear,
    "bicubic": resize_bicubic,
}


def resize(x: jax.Array, size: tuple[int, int], mode: str = "bilinear") -> jax.Array:
    """Dispatching resize mirroring reference `img_resize` (layers.py:48-60)."""
    if mode == "nearest":
        return resize_nearest(x, size, convention="tf")
    if mode in _RESIZE_FNS:
        return _RESIZE_FNS[mode](x, size)
    raise ValueError(f"invalid resize type {mode}")
