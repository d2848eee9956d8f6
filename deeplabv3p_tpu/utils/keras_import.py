"""Import reference Keras .h5 checkpoints into flax variable pytrees.

The reference's interchange format is whole-model Keras h5
(/root/reference/eval.py:566-571, deeplab.py:61-78). Our module tree
mirrors Keras layer names (SURVEY.md §7 "weight import" hard part), so
import is a name-join walk:

flax path                                   → Keras layer name
params/backbone/Conv/kernel                 → Conv
params/backbone/block_1/expanded_conv_1_expand/kernel
                                            → expanded_conv_1_expand
params/aspp/aspp1/depthwise/dw/kernel       → aspp1_depthwise
params/decoder/decoder_conv0/pointwise_BN/bn/scale
                                            → decoder_conv0_pointwise_BN
params/conv_upsample/kernel                 → conv_upsample

Rules: structural containers (backbone / aspp / decoder / block_i /
image_pool_branch) are dropped; 'bn' / 'dw' wrapper scopes are stripped;
remaining components join with '_'.

Weight-level mapping:
  Conv2D      kernel:0 (H,W,Ci,Co) → kernel          (same layout)
              bias:0               → bias
  DepthwiseConv2D depthwise_kernel:0 (H,W,C,1) → dw kernel (H,W,1,C)
  BatchNorm   gamma/beta → scale/bias (params);
              moving_mean/moving_variance → mean/var (batch_stats)
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

_CONTAINER_RE = re.compile(
    r"^(backbone|aspp|decoder|image_pool_branch|block_\d+|stage\d+[a-z]|se_\d+|mvit_\d+)$"
)
# 'bn'/'dw' are structural wrapper scopes inside BatchNorm/DepthwiseConv
# modules; note PeleeNet's '<name>_conv' layers keep their 'conv' component.
_WRAPPER_NAMES = frozenset({"bn", "dw", "c", "mha", "ct", "sep", "sep_dw", "sep_pw"})

_PARAM_TO_KERAS = {
    # our leaf name -> candidate Keras weight names (in priority order)
    "kernel": ("kernel:0", "depthwise_kernel:0"),
    "bias": ("bias:0",),
    "scale": ("gamma:0",),
    "mean": ("moving_mean:0",),
    "var": ("moving_variance:0",),
}
_BN_BIAS = ("beta:0",)


def keras_layer_name(path: tuple[str, ...]) -> str:
    """Map a flax module path (without the leaf param name) to the Keras
    layer name per the rules above. A double dash in a module name encodes
    a '/' in the Keras layer name (flax names cannot contain '/'):
    'expanded_conv_1--squeeze_excite--Conv' → 'expanded_conv_1/squeeze_excite/Conv'
    (MobileNetV3-style names, reference deeplabv3p_mobilenetv3.py:122-201).
    A plain double underscore stays literal (MobileViT's 'mv2_block_0__expand').
    """
    parts = [
        p for p in path
        if not _CONTAINER_RE.match(p) and p not in _WRAPPER_NAMES
    ]
    return "_".join(parts).replace("--", "/")


def _h5_weight_groups(h5file):
    """{layer_name: {weight_name: np.ndarray}} from a Keras h5 file
    (handles both full-model 'model_weights' and bare save_weights).

    Keras layer names may themselves contain '/' (h5 nests them), so each
    dataset `<scope...>/<weight>:0` is registered under every '/'-joined
    prefix of its scope; lookup by exact layer name then always hits.
    """
    root = h5file["model_weights"] if "model_weights" in h5file else h5file
    layers: dict[str, dict[str, np.ndarray]] = {}

    def collect(name, obj):
        import h5py

        if isinstance(obj, h5py.Dataset):
            parts = name.split("/")
            weight, scope = parts[-1], parts[:-1]
            # Keras 3's legacy writer drops the ':0' graph-tensor suffix
            # (verified vs keras 3.13, tests/test_tf_parity.py); normalize
            # so both vintages of h5 file match the ':0' candidate names.
            if not weight.endswith(":0"):
                weight = weight + ":0"
            arr = np.asarray(obj)
            for i in range(1, len(scope) + 1):
                key = "/".join(scope[:i])
                layers.setdefault(key, {}).setdefault(weight, arr)
            # Keras h5 doubles the layer name ('<layer>/<layer>/<sub>/<w>',
            # e.g. MultiHeadAttention 'tx_attention/tx_attention/query/
            # kernel'); expose the weight under the de-doubled scope too
            # ('tx_attention/query') — the path our layer-name mapping
            # produces (verified vs real Keras, tests/test_tf_parity.py).
            for i in range(1, len(scope) // 2 + 1):
                if scope[:i] == scope[i : 2 * i] and len(scope) > 2 * i:
                    key = "/".join(scope[:i] + scope[2 * i :])
                    layers.setdefault(key, {}).setdefault(weight, arr)

    root.visititems(collect)
    return layers


def load_keras_h5_weights(
    h5_path: str,
    variables: Any,
    strict: bool = False,
    verbose: bool = False,
) -> Any:
    """Load Keras h5 weights into a flax variables pytree
    ({'params': ..., 'batch_stats': ...}); returns a new pytree.

    strict=False mirrors Keras `load_weights(by_name=True)`
    (reference deeplabv3p_mobilenetv2.py:350): layers missing from the
    file keep their initialized values.
    """
    import h5py

    import jax

    with h5py.File(h5_path, "r") as f:
        layer_weights = _h5_weight_groups(f)

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    replacements: dict[tuple, np.ndarray] = {}
    missing: list[str] = []

    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        # keys[0] is the collection ('params' | 'batch_stats')
        module_path, leaf_name = keys[1:-1], keys[-1]
        lname = keras_layer_name(module_path)
        group = layer_weights.get(lname)
        if group is None:
            missing.append(f"{lname} ({'/'.join(keys)})")
            continue

        is_bn = "scale" in _collect_sibling_names(variables, keys)
        if leaf_name == "bias" and is_bn:
            candidates = _BN_BIAS
        elif leaf_name == "kernel" and "sep_pw" in module_path:
            # pointwise half of a Keras SeparableConv2D single layer
            candidates = ("pointwise_kernel:0", "kernel:0")
        else:
            candidates = _PARAM_TO_KERAS.get(leaf_name, ())

        value = None
        for cand in candidates:
            if cand in group:
                value = group[cand]
                src = cand
                break
        if value is None:
            missing.append(f"{lname}:{leaf_name}")
            continue

        is_dw = bool(module_path) and module_path[-1] == "dw"
        is_ct = bool(module_path) and module_path[-1] == "ct"
        if is_ct and leaf_name == "kernel":
            # Keras Conv2DTranspose stores a spatially-flipped kernel in
            # (kh, kw, out, in); flax ConvTranspose wants an unflipped
            # (kh, kw, in, out) (verified vs real Keras,
            # tests/test_tf_parity.py::test_conv_transpose_matches_keras)
            value = np.ascontiguousarray(
                value[::-1, ::-1].transpose(0, 1, 3, 2)
            )
        if src == "depthwise_kernel:0" or (
            # Keras 3 names the DepthwiseConv2D kernel plain 'kernel'
            # but keeps the (H,W,C,1) layout — transpose on shape evidence.
            is_dw
            and src == "kernel:0"
            and value.ndim == 4
            and value.shape[-1] == 1
            and leaf.shape[-2] == 1
            and value.shape != leaf.shape
        ):
            value = value.transpose(0, 1, 3, 2)  # (H,W,C,1)→(H,W,1,C)
        if value.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {lname}:{leaf_name}: "
                f"h5 {value.shape} vs model {leaf.shape}"
            )
        replacements[keys] = value.astype(np.asarray(leaf).dtype)
        if verbose:
            print(f"loaded {lname}/{src} -> {'/'.join(keys)}")

    if strict and missing:
        raise KeyError(f"missing weights for: {missing}")

    def substitute(path, leaf):
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        return replacements.get(keys, leaf)

    return jax.tree_util.tree_map_with_path(substitute, variables)


def _collect_sibling_names(variables: Any, keys: tuple) -> set:
    node = variables
    for k in keys[:-1]:
        node = node[k]
    return set(node.keys())


def save_keras_h5_weights(h5_path: str, variables: Any) -> None:
    """Export a flax variables pytree as a Keras-layout h5 file —
    the inverse of `load_keras_h5_weights`, so models trained here can be
    consumed by reference-ecosystem tooling (whole-model h5 is the
    reference's interchange format, eval.py:566-571).

    Layout: `model_weights/<layer path...>/<weight>:0`, with the Keras
    weight-name and kernel-layout conventions (depthwise kernels
    transposed back to (H, W, C, 1)). The `layer_names`/`weight_names`
    h5 attributes Keras's legacy h5 reader walks are written too —
    verified against the real `keras.src.legacy.saving.legacy_h5_format`
    by-name loader in tests/test_tf_parity.py."""
    import h5py

    import jax

    leaf_to_keras = {
        "scale": "gamma:0",
        "mean": "moving_mean:0",
        "var": "moving_variance:0",
    }
    # Keras `layer.weights` ordering — legacy by-name loading is
    # positional within each layer, so dataset/attr order must match.
    _KERAS_ORDER = {
        "kernel:0": 0,
        "depthwise_kernel:0": 0,
        "gamma:0": 0,
        "pointwise_kernel:0": 0.5,  # SeparableConv2D: dw, pw, bias
        "bias:0": 1,
        "beta:0": 1,
        "moving_mean:0": 2,
        "moving_variance:0": 3,
    }

    layers: dict[str, dict[str, np.ndarray]] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        module_path, leaf_name = keys[1:-1], keys[-1]
        lname = keras_layer_name(module_path)
        is_bn = "scale" in _collect_sibling_names(variables, keys)
        is_dw = module_path and module_path[-1] == "dw"

        if leaf_name == "kernel":
            if is_dw:
                wname = "depthwise_kernel:0"
            elif "sep_pw" in module_path:
                wname = "pointwise_kernel:0"
            else:
                wname = "kernel:0"
        elif leaf_name == "bias":
            wname = "beta:0" if is_bn else "bias:0"
        elif leaf_name in leaf_to_keras:
            wname = leaf_to_keras[leaf_name]
        else:
            continue  # non-Keras leaf (e.g. quantized scales)

        value = np.asarray(leaf)
        if wname == "depthwise_kernel:0":
            value = value.transpose(0, 1, 3, 2)  # (H,W,1,C)→(H,W,C,1)
        if leaf_name == "kernel" and module_path and module_path[-1] == "ct":
            # flax ConvTranspose (kh,kw,in,out) → Keras Conv2DTranspose
            # flipped (kh,kw,out,in); involutive, same map as import
            value = np.ascontiguousarray(
                value[::-1, ::-1].transpose(0, 1, 3, 2)
            )
        layers.setdefault(lname, {}).setdefault(wname, value)

    with h5py.File(h5_path, "w") as f:
        mw = f.create_group("model_weights")
        mw.attrs["layer_names"] = [n.encode("utf8") for n in layers]
        mw.attrs["backend"] = b"tensorflow"
        # Without this, Keras's legacy reader assumes a Keras-1 file and
        # runs layer-weight conversions that mangle modern layouts.
        mw.attrs["keras_version"] = b"2.15.0"
        for lname, weights in layers.items():
            # require_group: MobileNetV3-style layer names contain '/'
            # ('expanded_conv_1/squeeze_excite/Conv'), so one layer's name
            # may already exist as another's intermediate group
            g = mw.require_group(lname)
            ordered = sorted(weights, key=lambda w: _KERAS_ORDER.get(w, 9))
            # Keras nests '<layer>/<layer>/<weight>:0'
            g.attrs["weight_names"] = [
                f"{lname}/{w}".encode("utf8") for w in ordered
            ]
            for wname in ordered:
                g.create_dataset(f"{lname}/{wname}", data=weights[wname])
