"""Keras-h5 weight-import tests: synthetic checkpoints in Keras layout
(no pretrained h5 ships with the reference clone, so we fabricate files
with the exact `model_weights/<layer>/<layer>/<weight>:0` structure)."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeplabv3p_tpu.models.factory import build_deeplab_model
from deeplabv3p_tpu.utils.keras_import import (
    keras_layer_name,
    load_keras_h5_weights,
)

RNG = np.random.RandomState(0)


def test_keras_layer_name_mapping():
    assert keras_layer_name(("backbone", "Conv")) == "Conv"
    assert keras_layer_name(("backbone", "Conv_BN", "bn")) == "Conv_BN"
    assert (
        keras_layer_name(("backbone", "block_1", "expanded_conv_1_expand"))
        == "expanded_conv_1_expand"
    )
    assert keras_layer_name(("aspp", "aspp1", "depthwise", "dw")) == "aspp1_depthwise"
    assert (
        keras_layer_name(("decoder", "decoder_conv0", "pointwise_BN", "bn"))
        == "decoder_conv0_pointwise_BN"
    )
    assert keras_layer_name(("conv_upsample",)) == "conv_upsample"
    assert (
        keras_layer_name(("aspp", "image_pool_branch", "image_pooling_BN", "bn"))
        == "image_pooling_BN"
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_deeplab_model("mobilenetv2_lite", 5, output_stride=16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def _write_keras_h5(path, entries):
    """entries: {layer_name: {weight_name: array}} in Keras layout."""
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        for layer, weights in entries.items():
            g = mw.create_group(layer).create_group(layer)
            for wname, arr in weights.items():
                g.create_dataset(wname, data=arr)


def test_import_conv_bn_depthwise(model_and_vars, tmp_path):
    model, variables = model_and_vars
    p = variables["params"]

    conv_k = RNG.randn(*p["backbone"]["Conv"]["kernel"].shape).astype(np.float32)
    gamma = RNG.randn(*p["backbone"]["Conv_BN"]["bn"]["scale"].shape).astype(
        np.float32
    )
    beta = RNG.randn(*gamma.shape).astype(np.float32)
    mean = RNG.randn(*gamma.shape).astype(np.float32)
    var = np.abs(RNG.randn(*gamma.shape)).astype(np.float32)

    dw_ours = p["backbone"]["block_1"]["expanded_conv_1_depthwise"]["dw"]["kernel"]
    dw_keras = RNG.randn(
        dw_ours.shape[0], dw_ours.shape[1], dw_ours.shape[3], dw_ours.shape[2]
    ).astype(np.float32)  # Keras layout (H, W, C, 1)

    up_k = RNG.randn(*p["conv_upsample"]["kernel"].shape).astype(np.float32)
    up_b = RNG.randn(*p["conv_upsample"]["bias"].shape).astype(np.float32)

    h5_path = str(tmp_path / "ref.h5")
    _write_keras_h5(
        h5_path,
        {
            "Conv": {"kernel:0": conv_k},
            "Conv_BN": {
                "gamma:0": gamma, "beta:0": beta,
                "moving_mean:0": mean, "moving_variance:0": var,
            },
            "expanded_conv_1_depthwise": {"depthwise_kernel:0": dw_keras},
            "conv_upsample": {"kernel:0": up_k, "bias:0": up_b},
        },
    )

    loaded = load_keras_h5_weights(h5_path, variables)
    lp = loaded["params"]
    np.testing.assert_array_equal(lp["backbone"]["Conv"]["kernel"], conv_k)
    np.testing.assert_array_equal(
        lp["backbone"]["Conv_BN"]["bn"]["scale"], gamma
    )
    np.testing.assert_array_equal(lp["backbone"]["Conv_BN"]["bn"]["bias"], beta)
    np.testing.assert_array_equal(
        loaded["batch_stats"]["backbone"]["Conv_BN"]["bn"]["mean"], mean
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["backbone"]["Conv_BN"]["bn"]["var"], var
    )
    np.testing.assert_array_equal(
        lp["backbone"]["block_1"]["expanded_conv_1_depthwise"]["dw"]["kernel"],
        dw_keras.transpose(0, 1, 3, 2),
    )
    np.testing.assert_array_equal(lp["conv_upsample"]["kernel"], up_k)
    np.testing.assert_array_equal(lp["conv_upsample"]["bias"], up_b)

    # untouched layers keep their init values (by_name semantics)
    np.testing.assert_array_equal(
        lp["backbone"]["block_2"]["expanded_conv_2_expand"]["kernel"],
        p["backbone"]["block_2"]["expanded_conv_2_expand"]["kernel"],
    )


def test_import_strict_raises(model_and_vars, tmp_path):
    model, variables = model_and_vars
    h5_path = str(tmp_path / "empty.h5")
    _write_keras_h5(h5_path, {})
    with pytest.raises(KeyError):
        load_keras_h5_weights(h5_path, variables, strict=True)


def test_import_shape_mismatch_raises(model_and_vars, tmp_path):
    model, variables = model_and_vars
    h5_path = str(tmp_path / "bad.h5")
    _write_keras_h5(h5_path, {"Conv": {"kernel:0": np.zeros((1, 1, 1, 1), np.float32)}})
    with pytest.raises(ValueError):
        load_keras_h5_weights(h5_path, variables)


def test_full_coverage_of_param_tree(model_and_vars, tmp_path):
    """Every param/batch_stat leaf must map to a well-formed Keras layer
    name (no wrapper scopes leaking through)."""
    _, variables = model_and_vars
    for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        name = keras_layer_name(keys[1:-1])
        assert name, f"empty keras name for {keys}"
        assert "bn" not in name.split("_"), keys
        assert "dw" not in name.split("_"), keys


@pytest.mark.parametrize("model_type", [
    "xception", "resnet50", "mobilenetv3large", "mobilenetv3small",
    "peleenet", "ghostnet", "mobilevit_s",
])
def test_layer_name_mapping_all_backbones(model_type):
    """Every param leaf of every backbone family must map to a clean Keras
    layer name (no structural scopes leaking). Uses eval_shape, so the
    whole registry checks in seconds."""
    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model(model_type, 5, output_stride=16)
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    wrappers = {"bn", "dw", "c", "mha"}
    for path, _ in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        name = keras_layer_name(keys[1:-1])
        assert name, f"empty keras name for {keys}"
        assert "--" not in name, (model_type, keys, name)
        # when the leaf's enclosing scope is a structural wrapper, it must
        # have been stripped: the name equals the mapping of the parent
        # path (note: legit Keras names like 'bn_conv1'/'bn_dw' contain
        # these substrings — only the trailing wrapper scope is stripped)
        if keys[-2] in wrappers:
            assert name == keras_layer_name(keys[1:-2]), (model_type, keys)
            assert not name.endswith("_" + keys[-2]) or keys[-2] == "dw", (
                model_type, keys, name,
            )


def test_h5_export_import_roundtrip(model_and_vars, tmp_path):
    """flax → Keras h5 → flax roundtrip must be lossless (interchange
    with the reference toolchain in both directions)."""
    from deeplabv3p_tpu.utils.keras_import import (
        load_keras_h5_weights,
        save_keras_h5_weights,
    )

    model, variables = model_and_vars
    path = str(tmp_path / "export.h5")
    save_keras_h5_weights(path, variables)

    # reload into a freshly initialized tree; every leaf must round-trip
    fresh = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)))
    loaded = load_keras_h5_weights(path, fresh, strict=True)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables)[0],
        jax.tree_util.tree_flatten_with_path(loaded)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
