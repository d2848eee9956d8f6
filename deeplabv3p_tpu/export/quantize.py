"""Post-training int8 quantization (reference
tools/model_converter/post_train_quant_convert.py:20-57).

The reference feeds a representative `SegmentationGenerator` dataset to
the TFLite converter with Optimize.DEFAULT. The TPU-native equivalent:

* weights: symmetric per-output-channel int8 for every conv kernel
  (the MXU consumes int8 natively; dequantization scale folds into the
  following elementwise work);
* activations: per-tensor affine ranges calibrated by running the
  representative dataset through the model and recording min/max at
  layer boundaries (captured via flax intermediates).

`post_train_quantize` returns (quantized_params, quant_info) where the
quantized params pack `{values:int8, scale:f32}` leaves; `dequantize` maps
back to f32 for accuracy checks. Sub-1% mIOU delta is validated in
tests/test_quantize.py.
"""

from __future__ import annotations

from typing import Any, Iterable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTensor(NamedTuple):
    values: Any  # int8 values
    scale: Any  # f32 per-channel scale


def _quantize_kernel(kernel: jax.Array) -> QuantizedTensor:
    """Symmetric per-output-channel int8 quant for (H, W, Ci, Co)."""
    k = np.asarray(kernel, np.float32)
    axes = tuple(range(k.ndim - 1))
    absmax = np.maximum(np.abs(k).max(axis=axes), 1e-8)
    scale = (absmax / 127.0).astype(np.float32)
    values = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return QuantizedTensor(values=values, scale=scale)


def _dequantize_kernel(q: QuantizedTensor) -> np.ndarray:
    return q.values.astype(np.float32) * q.scale


def post_train_quantize(params: Any) -> tuple[Any, dict]:
    """Quantize all conv/dense kernels to int8; other leaves pass through.

    Returns (params_with_QuantizedTensor_leaves, stats dict).
    """
    n_quant = 0
    total_bytes_fp32 = 0
    total_bytes_int8 = 0

    def visit(path, leaf):
        nonlocal n_quant, total_bytes_fp32, total_bytes_int8
        name = getattr(path[-1], "key", str(path[-1]))
        arr = np.asarray(leaf)
        if name == "kernel" and arr.ndim >= 2:
            q = _quantize_kernel(arr)
            n_quant += 1
            total_bytes_fp32 += arr.size * 4
            total_bytes_int8 += q.values.size + q.scale.size * 4
            return q
        return leaf

    qparams = jax.tree_util.tree_map_with_path(visit, params)
    stats = {
        "quantized_kernels": n_quant,
        "fp32_bytes": total_bytes_fp32,
        "int8_bytes": total_bytes_int8,
        "compression": (
            total_bytes_fp32 / total_bytes_int8 if total_bytes_int8 else 1.0
        ),
    }
    return qparams, stats


def dequantize_params(qparams: Any) -> Any:
    """Reverse of post_train_quantize for accuracy evaluation."""

    def visit(leaf):
        if isinstance(leaf, QuantizedTensor):
            return jnp.asarray(_dequantize_kernel(leaf))
        return leaf

    return jax.tree_util.tree_map(
        visit, qparams, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def calibrate_activations(
    model, variables, batches: Iterable[np.ndarray]
) -> dict[str, tuple[float, float]]:
    """Record per-module activation (min, max) over a representative
    dataset — the calibration the reference delegates to the TFLite
    converter's representative_dataset hook
    (post_train_quant_convert.py:28-40)."""
    ranges: dict[str, list[float]] = {}
    for batch in batches:
        _, state = model.apply(
            variables, jnp.asarray(batch), train=False,
            capture_intermediates=True, mutable=["intermediates"],
        )
        flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
        for path, value in flat:
            key = "/".join(getattr(p, "key", str(p)) for p in path)
            lo = float(jnp.min(value))
            hi = float(jnp.max(value))
            if key in ranges:
                ranges[key][0] = min(ranges[key][0], lo)
                ranges[key][1] = max(ranges[key][1], hi)
            else:
                ranges[key] = [lo, hi]
    return {k: (v[0], v[1]) for k, v in ranges.items()}
