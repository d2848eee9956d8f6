"""Keras-3 twins of reference model families — TEST ORACLES.

Builds full model graphs (MobileNetV2-Lite, MobileNetV3-Small-Lite,
Xception full-head, UNet-Standard) with REAL Keras layers, using the same
layer names as the reference architecture (and therefore as our flax
module tree), so weights interchange by name through the legacy h5
format. tests/test_tf_parity.py uses them to prove FULL-MODEL numerical
parity of the flax implementations + h5 importer against actual
TensorFlow execution — the end-to-end evidence behind the "reference
checkpoints produce the same masks here" claim.

Written from this package's own module structure (models/mobilenetv2.py,
models/mobilenetv3.py, models/xception.py, models/unet.py,
models/layers.py), which mirrors the reference semantics.
"""

from __future__ import annotations

import numpy as np


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def build_mobilenetv2_lite_keras(num_classes: int, input_hw: tuple[int, int],
                                 alpha: float = 1.0,
                                 use_subpixel: bool = False):
    """OS16 MobileNetV2 + ASPP-Lite head + biased 1x1 logits conv +
    bilinear x16 upsample; emits logits at input resolution (same program
    shape as build_deeplab_model('mobilenetv2_lite', ...)). With
    use_subpixel the logits tail is the reference's Subpixel head
    (model.py:68-73): Conv2D C*r*r (layer 'subpixel') + _phase_shift."""
    import keras

    L = keras.layers
    relu6 = lambda name=None: L.ReLU(max_value=6.0)

    def bn(name):
        return L.BatchNormalization(epsilon=1e-3, momentum=0.999, name=name)

    def head_bn(name):
        return L.BatchNormalization(epsilon=1e-5, name=name)

    inp = keras.Input((*input_hw, 3))
    x = L.Conv2D(_make_divisible(32 * alpha), 3, strides=2, padding="same",
                 use_bias=False, name="Conv")(inp)
    x = bn("Conv_BN")(x)
    x = relu6()(x)

    channels = [_make_divisible(32 * alpha)]

    def block(x, filters, stride, expansion, block_id, skip, rate=1):
        in_ch = channels[-1]
        out_ch = _make_divisible(int(filters * alpha))
        prefix = (f"expanded_conv_{block_id}_" if block_id
                  else "expanded_conv_")
        y = x
        if block_id:
            y = L.Conv2D(expansion * in_ch, 1, use_bias=False,
                         name=prefix + "expand")(y)
            y = bn(prefix + "expand_BN")(y)
            y = relu6()(y)
        y = L.DepthwiseConv2D(3, strides=stride, dilation_rate=rate,
                              padding="same", use_bias=False,
                              name=prefix + "depthwise")(y)
        y = bn(prefix + "depthwise_BN")(y)
        y = relu6()(y)
        y = L.Conv2D(out_ch, 1, use_bias=False, name=prefix + "project")(y)
        y = bn(prefix + "project_BN")(y)
        if skip:
            y = L.Add()([y, x])
        channels.append(out_ch)
        return y

    # identical schedule to MobileNetV2Body at OS16
    # (mobilenetv2.py:136-160; os16_stride=2, os16_rate=1, os32_rate=2)
    x = block(x, 16, 1, 1, 0, False)
    x = block(x, 24, 2, 6, 1, False)
    x = block(x, 24, 1, 6, 2, True)
    x = block(x, 32, 2, 6, 3, False)
    x = block(x, 32, 1, 6, 4, True)
    x = block(x, 32, 1, 6, 5, True)
    x = block(x, 64, 2, 6, 6, False)
    x = block(x, 64, 1, 6, 7, True)
    x = block(x, 64, 1, 6, 8, True)
    x = block(x, 64, 1, 6, 9, True)
    x = block(x, 96, 1, 6, 10, False)
    x = block(x, 96, 1, 6, 11, True)
    x = block(x, 96, 1, 6, 12, True)
    x = block(x, 160, 1, 6, 13, False)
    x = block(x, 160, 1, 6, 14, True, rate=2)
    x = block(x, 160, 1, 6, 15, True, rate=2)
    x = block(x, 320, 1, 6, 16, False, rate=2)

    # ASPP-Lite (layers.py:ASPPLite; reference layers.py:166-196)
    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    b4 = L.AveragePooling2D(pool_size=(fh, fw), name="average_pooling")(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = head_bn("image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)

    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = head_bn("aspp0_BN")(b0)
    b0 = L.ReLU()(b0)

    x = L.Concatenate()([b4, b0])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = head_bn("concat_projection_BN")(x)
    x = L.ReLU()(x)
    # dropout omitted: inference graphs compare with training=False

    if use_subpixel:
        r = 16

        def phase_shift(t):
            ops = keras.ops
            _, h, w, c = t.shape
            cout = c // (r * r)
            t = ops.reshape(t, (-1, h, w, cout, r, r))
            t = ops.transpose(t, (0, 1, 5, 2, 4, 3))
            return ops.reshape(t, (-1, h * r, w * r, cout))

        x = L.Conv2D(num_classes * r * r, 1, use_bias=True,
                     name="subpixel")(x)
        x = L.Lambda(phase_shift)(x)
        return keras.Model(inp, x)
    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    x = L.UpSampling2D(size=16, interpolation="bilinear")(x)
    return keras.Model(inp, x)


def randomize_keras_weights(model, seed: int = 0) -> None:
    """Give every layer non-trivial weights (incl. BN moving stats) so a
    forward pass exercises real numerics, not init-time identities."""
    rng = np.random.RandomState(seed)
    for layer in model.layers:
        ws = layer.get_weights()
        if not ws:
            continue
        is_bn = "BatchNormalization" in type(layer).__name__
        new = []
        for i, w in enumerate(ws):
            if is_bn and i == 0:  # gamma
                new.append(rng.uniform(0.5, 1.5, w.shape).astype(np.float32))
            elif is_bn and i == 3:  # moving_variance
                new.append(rng.uniform(0.5, 2.0, w.shape).astype(np.float32))
            elif is_bn:  # beta / moving_mean
                new.append(rng.randn(*w.shape).astype(np.float32) * 0.1)
            else:  # conv kernels / bias
                new.append(rng.randn(*w.shape).astype(np.float32)
                           * (0.4 / max(1, int(np.prod(w.shape[:-1])) ** 0.5)))
        layer.set_weights(new)


def build_mobilenetv3_small_lite_keras(num_classes: int,
                                       input_hw: tuple[int, int],
                                       alpha: float = 1.0):
    """OS16 MobileNetV3-Small + ASPP-Lite head twin
    (deeplabv3p_tpu/models/mobilenetv3.py small stack, reference
    deeplabv3p_mobilenetv3.py:469-505).

    Keras 3 forbids '/' in layer names, so the reference's scoped names
    ('expanded_conv_3/squeeze_excite/Conv') are built here with the
    package's '--' encoding; rename_h5_scoped_layers() converts the saved
    h5 to the real reference layout before import."""
    import keras

    L = keras.layers

    def hard_swish(t):
        return t * keras.ops.clip(t + 3.0, 0.0, 6.0) / 6.0

    def hard_sigmoid(t):
        return keras.ops.clip(t + 3.0, 0.0, 6.0) / 6.0

    def depth(d):
        return _make_divisible(d * alpha, 8)

    def bn(name):
        return L.BatchNormalization(epsilon=1e-3, momentum=0.999, name=name)

    inp = keras.Input((*input_hw, 3))
    x = L.Conv2D(16, 3, strides=2, padding="same", use_bias=False,
                 name="Conv")(inp)
    x = bn("Conv--BatchNorm")(x)
    x = L.Lambda(hard_swish)(x)

    def block(x, expansion, filters, k, stride, se, act, bid, skip, rate=1):
        infilters = x.shape[-1]
        prefix = f"expanded_conv_{bid}--" if bid else "expanded_conv--"
        shortcut = x
        if bid:
            x = L.Conv2D(_make_divisible(infilters * expansion, 8), 1,
                         use_bias=False, name=prefix + "expand")(x)
            x = bn(prefix + "expand--BatchNorm")(x)
            x = L.Lambda(hard_swish)(x) if act == "hs" else L.ReLU()(x)
        x = L.DepthwiseConv2D(k, strides=stride, dilation_rate=rate,
                              padding="same", use_bias=False,
                              name=prefix + "depthwise--Conv")(x)
        x = bn(prefix + "depthwise--BatchNorm")(x)
        x = L.Lambda(hard_swish)(x) if act == "hs" else L.ReLU()(x)
        if se:
            se_ch = _make_divisible(infilters * expansion, 8)
            s = L.GlobalAveragePooling2D(keepdims=True)(x)
            s = L.Conv2D(_make_divisible(int(se_ch * 0.25), 8), 1,
                         use_bias=True,
                         name=prefix + "squeeze_excite--Conv")(s)
            s = L.ReLU()(s)
            s = L.Conv2D(se_ch, 1, use_bias=True,
                         name=prefix + "squeeze_excite--Conv_1")(s)
            s = L.Lambda(hard_sigmoid)(s)
            x = L.Multiply()([x, s])
        x = L.Conv2D(filters, 1, use_bias=False, name=prefix + "project")(x)
        x = bn(prefix + "project--BatchNorm")(x)
        if skip:
            x = L.Add()([x, shortcut])
        return x

    # small stack at OS16: os16_stride=2, os16_rate=1, os32_rate=2
    # (mobilenetv3.py:156-178)
    x = block(x, 1, depth(16), 3, 2, True, "re", 0, False)
    x = block(x, 72.0 / 16, depth(24), 3, 2, None, "re", 1, False)
    x = block(x, 88.0 / 24, depth(24), 3, 1, None, "re", 2, True)
    x = block(x, 4, depth(40), 5, 2, True, "hs", 3, False)
    x = block(x, 6, depth(40), 5, 1, True, "hs", 4, True)
    x = block(x, 6, depth(40), 5, 1, True, "hs", 5, True)
    x = block(x, 3, depth(48), 5, 1, True, "hs", 6, False)
    x = block(x, 3, depth(48), 5, 1, True, "hs", 7, True)
    x = block(x, 6, depth(96), 5, 1, True, "hs", 8, False)
    x = block(x, 6, depth(96), 5, 1, True, "hs", 9, True, rate=2)
    x = block(x, 6, depth(96), 5, 1, True, "hs", 10, True, rate=2)

    # ASPP-Lite head + logits (same as the mnv2_lite twin)
    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    b4 = L.AveragePooling2D(pool_size=(fh, fw))(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = L.BatchNormalization(epsilon=1e-5, name="image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(epsilon=1e-5, name="aspp0_BN")(b0)
    b0 = L.ReLU()(b0)
    x = L.Concatenate()([b4, b0])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="concat_projection_BN")(x)
    x = L.ReLU()(x)
    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    x = L.UpSampling2D(size=16, interpolation="bilinear")(x)
    return keras.Model(inp, x)


def rename_h5_scoped_layers(h5_path: str) -> None:
    """Convert '--'-encoded layer-group names in a saved legacy h5 back to
    the reference's '/'-scoped names (Keras 3 cannot create them natively;
    Keras 2 era files — the reference's — use them directly)."""
    import h5py

    with h5py.File(h5_path, "r+") as f:
        mw = f["model_weights"]
        for name in list(mw.keys()):
            if "--" in name:
                mw.move(name, name.replace("--", "/"))


def build_xception_keras(num_classes: int, input_hw: tuple[int, int]):
    """OS16 DeepLabV3+ Xception twin — full ASPP + decoder head
    (deeplabv3p_tpu/models/xception.py + models/layers.py ASPP/Decoder;
    reference deeplabv3p_xception.py:96-238, layers.py:114-219).

    Exercises at model scale: the manual effective-kernel pad for strided
    SepConv (ZeroPadding2D + 'valid'), conv/sum/none block shortcuts, the
    three dilated ASPP branches, image pooling, and the two-stage bilinear
    decoder."""
    import keras

    L = keras.layers

    def bn(name, eps=1e-3):
        return L.BatchNormalization(epsilon=eps, name=name)

    def sep_conv_bn(x, filters, prefix, stride=1, rate=1,
                    depth_activation=False, eps=1e-3):
        if not depth_activation:
            x = L.ReLU()(x)
        if stride == 1:
            x = L.DepthwiseConv2D(3, strides=1, dilation_rate=rate,
                                  padding="same", use_bias=False,
                                  name=prefix + "_depthwise")(x)
        else:
            keff = 3 + 2 * (rate - 1)
            pb, pe = (keff - 1) // 2, keff - 1 - (keff - 1) // 2
            x = L.ZeroPadding2D(((pb, pe), (pb, pe)))(x)
            x = L.DepthwiseConv2D(3, strides=stride, dilation_rate=rate,
                                  padding="valid", use_bias=False,
                                  name=prefix + "_depthwise")(x)
        x = bn(prefix + "_depthwise_BN", eps)(x)
        if depth_activation:
            x = L.ReLU()(x)
        x = L.Conv2D(filters, 1, use_bias=False,
                     name=prefix + "_pointwise")(x)
        x = bn(prefix + "_pointwise_BN", eps)(x)
        if depth_activation:
            x = L.ReLU()(x)
        return x

    def xception_block(x, depths, prefix, skip_type, stride, rate=1,
                       depth_activation=False, return_skip=False):
        inputs = x
        skip = None
        for i in range(3):
            x = sep_conv_bn(
                x, depths[i], f"{prefix}_separable_conv{i + 1}",
                stride=stride if i == 2 else 1, rate=rate,
                depth_activation=depth_activation,
            )
            if i == 1:
                skip = x
        if skip_type == "conv":
            sc = L.Conv2D(depths[-1], 1, strides=stride, padding="same",
                          use_bias=False, name=prefix + "_shortcut")(inputs)
            sc = bn(prefix + "_shortcut_BN")(sc)
            x = L.Add()([x, sc])
        elif skip_type == "sum":
            x = L.Add()([x, inputs])
        if return_skip:
            return x, skip
        return x

    inp = keras.Input((*input_hw, 3))
    x = L.Conv2D(32, 3, strides=2, padding="same", use_bias=False,
                 name="entry_flow_conv1_1")(inp)
    x = bn("entry_flow_conv1_1_BN")(x)
    x = L.ReLU()(x)
    x = L.Conv2D(64, 3, padding="same", use_bias=False,
                 name="entry_flow_conv1_2")(x)
    x = bn("entry_flow_conv1_2_BN")(x)
    x = L.ReLU()(x)

    x = xception_block(x, [128] * 3, "entry_flow_block1", "conv", 2)
    x, skip = xception_block(x, [256] * 3, "entry_flow_block2", "conv", 2,
                             return_skip=True)
    # OS16: os16_stride=2, os16_rate=1, os32_stride=1, os32_rate=2
    x = xception_block(x, [728] * 3, "entry_flow_block3", "conv", 2)
    for i in range(16):
        x = xception_block(x, [728] * 3, f"middle_flow_unit_{i + 1}",
                           "sum", 1)
    x = xception_block(x, [728, 1024, 1024], "exit_flow_block1", "conv", 1)
    x = xception_block(x, [1536, 1536, 2048], "exit_flow_block2", "none", 1,
                       rate=2, depth_activation=True)

    # full ASPP at OS16 rates (6, 12, 18)
    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    b4 = L.AveragePooling2D(pool_size=(fh, fw))(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = bn("image_pooling_BN", 1e-5)(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = bn("aspp0_BN", 1e-5)(b0)
    b0 = L.ReLU()(b0)
    b1 = sep_conv_bn(x, 256, "aspp1", rate=6, depth_activation=True, eps=1e-5)
    b2 = sep_conv_bn(x, 256, "aspp2", rate=12, depth_activation=True, eps=1e-5)
    b3 = sep_conv_bn(x, 256, "aspp3", rate=18, depth_activation=True, eps=1e-5)
    x = L.Concatenate()([b4, b0, b1, b2, b3])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = bn("concat_projection_BN", 1e-5)(x)
    x = L.ReLU()(x)

    # decoder to the OS4 skip
    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    skip = L.Conv2D(48, 1, use_bias=False, name="feature_projection0")(skip)
    skip = bn("feature_projection0_BN", 1e-5)(skip)
    skip = L.ReLU()(skip)
    x = L.Concatenate()([x, skip])
    x = sep_conv_bn(x, 256, "decoder_conv0", depth_activation=True, eps=1e-5)
    x = sep_conv_bn(x, 256, "decoder_conv1", depth_activation=True, eps=1e-5)

    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    return keras.Model(inp, x)


def build_unet_standard_keras(num_classes: int, input_hw: tuple[int, int]):
    """UNet-Standard twin (deeplabv3p_tpu/models/unet.py:_UNetEncDec;
    reference unet/models/unet.py:14-79): 64..1024 double-conv encoder
    with maxpools + dropout at depths 4/5, Conv2DTranspose 2x2/2
    upsampling with [skip, up] concats, 2ch relu conv + 1x1 head."""
    import keras

    L = keras.layers

    def double_conv(x, filters, idx):
        for j in range(2):
            x = L.Conv2D(filters, 3, padding="same", use_bias=True,
                         name=f"conv{idx}_{j}")(x)
            x = L.ReLU()(x)
        return x

    inp = keras.Input((*input_hw, 3))
    c1 = double_conv(inp, 64, 1)
    p1 = L.MaxPooling2D(2)(c1)
    c2 = double_conv(p1, 128, 2)
    p2 = L.MaxPooling2D(2)(c2)
    c3 = double_conv(p2, 256, 3)
    p3 = L.MaxPooling2D(2)(c3)
    c4 = double_conv(p3, 512, 4)
    p4 = L.MaxPooling2D(2)(c4)  # dropout omitted (inference compare)
    c5 = double_conv(p4, 1024, 5)

    def up(x, filters, idx):
        x = L.Conv2DTranspose(filters, 2, strides=2, padding="same",
                              use_bias=True, name=f"up{idx}")(x)
        return L.ReLU()(x)

    x = L.Concatenate()([c4, up(c5, 512, 6)])
    x = double_conv(x, 512, 6)
    x = L.Concatenate()([c3, up(x, 256, 7)])
    x = double_conv(x, 256, 7)
    x = L.Concatenate()([c2, up(x, 128, 8)])
    x = double_conv(x, 128, 8)
    x = L.Concatenate()([c1, up(x, 64, 9)])
    x = double_conv(x, 64, 9)
    x = L.Conv2D(2, 3, padding="same", use_bias=True, name="conv9_2")(x)
    x = L.ReLU()(x)
    x = L.Conv2D(num_classes, 1, use_bias=True, name="head")(x)
    return keras.Model(inp, x)


def build_fast_scnn_keras(num_classes: int, input_hw: tuple[int, int]):
    """Fast-SCNN twin (deeplabv3p_tpu/models/fast_scnn.py; reference
    fast_scnn/models/fast_scnn.py:86-149): learning-to-downsample with
    SeparableConv2D (ONE Keras layer per sep conv — pins the
    depthwise/pointwise single-group h5 mapping), bottleneck stages,
    pyramid pooling bins [2,4,6,8], feature fusion, classifier."""
    import keras

    L = keras.layers

    def conv_block(x, filters, name, k=3, strides=1, relu=True,
                   separable=False):
        if separable:
            x = L.SeparableConv2D(filters, k, strides=strides,
                                  padding="same", use_bias=True, name=name)(x)
        else:
            x = L.Conv2D(filters, k, strides=strides, padding="same",
                         use_bias=True, name=name + "_conv")(x)
        x = L.BatchNormalization(name=name + "_BN")(x)
        if relu:
            x = L.ReLU()(x)
        return x

    def bottleneck(x, filters, strides, name, residual):
        inputs = x
        t = 6
        x = conv_block(x, x.shape[-1] * t, name + "_expand", k=1)
        x = L.DepthwiseConv2D(3, strides=strides, padding="same",
                              use_bias=True, name=name + "_depthwise")(x)
        x = L.BatchNormalization(name=name + "_dw_BN")(x)
        x = L.ReLU()(x)
        x = conv_block(x, filters, name + "_project", k=1, relu=False)
        if residual:
            x = L.Add()([x, inputs])
        return x

    inp = keras.Input((*input_hw, 3))
    x = conv_block(inp, 32, "lds_conv", strides=2)
    x = conv_block(x, 48, "lds_ds1", strides=2, separable=True)
    lds = conv_block(x, 64, "lds_ds2", strides=2, separable=True)

    x = lds
    for sid, (filters, strides) in enumerate([(64, 2), (96, 2), (128, 1)]):
        for i in range(3):
            x = bottleneck(x, filters, strides if i == 0 else 1,
                           f"gfe{sid}_{i}", residual=i > 0)

    # pyramid pooling bins [2,4,6,8]
    h, w = x.shape[1], x.shape[2]
    outs = [x]
    for bin_size in (2, 4, 6, 8):
        ph, pw = max(1, h // bin_size), max(1, w // bin_size)
        p = L.AveragePooling2D(pool_size=(ph, pw))(x)
        p = L.Conv2D(128, 3, strides=2, padding="same", use_bias=True,
                     name=f"ppm_bin{bin_size}_conv")(p)
        p = L.Lambda(
            lambda t, hw=(h, w): keras.ops.image.resize(
                t, hw, interpolation="bilinear"
            )
        )(p)
        outs.append(p)
    x = L.Concatenate()(outs)

    ff1 = conv_block(lds, 128, "ff_low", k=1, relu=False)
    ff2 = L.UpSampling2D(4, interpolation="nearest")(x)
    ff2 = L.SeparableConv2D(128, 3, dilation_rate=4, padding="same",
                            use_bias=True, name="ff_dsconv")(ff2)
    ff2 = L.BatchNormalization(name="ff_dsconv_BN")(ff2)
    ff2 = L.ReLU()(ff2)
    ff2 = L.Conv2D(128, 1, use_bias=True, name="ff_conv")(ff2)
    x = L.Add()([ff1, ff2])
    x = L.BatchNormalization(name="ff_BN")(x)
    x = L.ReLU()(x)

    x = conv_block(x, 128, "DSConv1_classifier", separable=True)
    x = conv_block(x, 128, "DSConv2_classifier", separable=True)
    x = conv_block(x, num_classes, "classifier_conv", k=1, relu=False)
    x = L.UpSampling2D(8, interpolation="nearest")(x)
    return keras.Model(inp, x)


def _aspp_lite_head(L, x, num_classes, feat_hw):
    """Shared ASPP-Lite + logits tail used by the *_lite twins."""
    fh, fw = feat_hw
    b4 = L.AveragePooling2D(pool_size=(fh, fw))(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = L.BatchNormalization(epsilon=1e-5, name="image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(epsilon=1e-5, name="aspp0_BN")(b0)
    b0 = L.ReLU()(b0)
    x = L.Concatenate()([b4, b0])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="concat_projection_BN")(x)
    x = L.ReLU()(x)
    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    return L.UpSampling2D(size=16, interpolation="bilinear")(x)


def build_peleenet_lite_keras(num_classes: int, input_hw: tuple[int, int]):
    """PeleeNet-Lite twin at OS16 (deeplabv3p_tpu/models/peleenet.py;
    reference deeplabv3p_peleenet.py:63-253): stem block with parallel
    maxpool/conv downsample, [3,4,8,6] two-branch dense stages (growth 32,
    bottleneck widths [1,2,4,4]), 1x1 transitions, OS-controlled average
    pooling — pins the dense/stem concat ORDERS."""
    import keras

    L = keras.layers

    def basic(x, ch, name, k=3, s=1, act=True):
        x = L.Conv2D(ch, k, strides=s, padding="same", use_bias=False,
                     name=name + "_conv")(x)
        x = L.BatchNormalization(name=name + "_norm")(x)
        if act:
            x = L.ReLU()(x)
        return x

    def dense_layer(x, bw, name):
        growth = 16  # growth_rate 32 // 2
        inter = int(growth * bw / 4) * 4
        num_in = x.shape[-1]
        if inter > num_in / 2:
            inter = int(num_in / 8) * 4
        b1 = basic(x, inter, name + "_branch1a", k=1)
        b1 = basic(b1, growth, name + "_branch1b")
        b2 = basic(x, inter, name + "_branch2a", k=1)
        b2 = basic(b2, growth, name + "_branch2b")
        b2 = basic(b2, growth, name + "_branch2c")
        return L.Concatenate()([x, b1, b2])

    inp = keras.Input((*input_hw, 3))
    stem = "bbn_features_stemblock"
    out = basic(inp, 32, stem + "_stem1", s=2)
    b2 = basic(out, 16, stem + "_stem2a", k=1)
    b2 = basic(b2, 32, stem + "_stem2b", s=2)
    b1 = L.MaxPooling2D(2)(out)
    x = L.Concatenate()([b1, b2])
    x = basic(x, 32, stem + "_stem3", k=1)

    num_features = 32
    skip = None
    for i, num_layers in enumerate([3, 4, 8, 6]):
        bw = [1, 2, 4, 4][i]
        for j in range(num_layers):
            x = dense_layer(
                x, bw, f"bbn_features_denseblock{i + 1}_denselayer{j + 1}"
            )
        num_features += num_layers * 32
        x = basic(x, num_features, f"bbn_features_transition{i + 1}", k=1)
        if i < 2:  # OS16: pool after stages 1 and 2
            x = L.AveragePooling2D(2)(x)

    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    x = _aspp_lite_head(L, x, num_classes, (fh, fw))
    return keras.Model(inp, x)


def build_ghostnet_lite_keras(num_classes: int, input_hw: tuple[int, int]):
    """GhostNet-Lite twin at OS16 (deeplabv3p_tpu/models/ghostnet.py;
    reference deeplabv3p_ghostnet.py:135-285): ghost modules (primary 1x1
    + cheap depthwise, CONCAT order pinned), SE with hard-sigmoid,
    dw/1x1 shortcut branches, the OS16 config table with s=-1 'keep'
    blocks and dilated stage 5."""
    import keras

    L = keras.layers

    def hard_sigmoid(t):
        return keras.ops.clip(t + 3.0, 0.0, 6.0) / 6.0

    def make_div(v, d=4):
        return _make_divisible(v, d)

    def ghost_module(x, out_chs, name, act=True):
        import math as _m

        init_ch = int(_m.ceil(out_chs / 2))
        x1 = L.Conv2D(init_ch, 1, use_bias=False,
                      name=name + "_primary_conv_0")(x)
        x1 = L.BatchNormalization(name=name + "_primary_conv_1")(x1)
        if act:
            x1 = L.ReLU()(x1)
        x2 = L.DepthwiseConv2D(3, padding="same", use_bias=False,
                               name=name + "_cheap_operation_0")(x1)
        x2 = L.BatchNormalization(name=name + "_cheap_operation_1")(x2)
        if act:
            x2 = L.ReLU()(x2)
        return L.Concatenate()([x1, x2])

    def bottleneck(x, k, exp, out_chs, se_ratio, stride, rate, keep, name):
        inputs = x
        in_chs = x.shape[-1]
        mid = make_div(exp)
        out_chs = make_div(out_chs)
        x = ghost_module(x, mid, name + "_ghost1", act=True)
        if stride > 1 or keep:
            x = L.DepthwiseConv2D(k, strides=stride, dilation_rate=rate,
                                  padding="same", use_bias=False,
                                  name=name + "_conv_dw")(x)
            x = L.BatchNormalization(name=name + "_bn_dw")(x)
        if se_ratio:
            red = make_div(int(mid * se_ratio))
            s = L.GlobalAveragePooling2D(keepdims=True)(x)
            s = L.Conv2D(red, 1, use_bias=True,
                         name=name + "_se_conv_reduce")(s)
            s = L.ReLU()(s)
            s = L.Conv2D(mid, 1, use_bias=True,
                         name=name + "_se_conv_expand")(s)
            s = L.Lambda(hard_sigmoid)(s)
            x = L.Multiply()([x, s])
        x = ghost_module(x, out_chs, name + "_ghost2", act=False)
        if in_chs == out_chs and stride == 1:
            sc = inputs
        else:
            sc = L.DepthwiseConv2D(k, strides=stride, dilation_rate=rate,
                                   padding="same", use_bias=False,
                                   name=name + "_shortcut_0")(inputs)
            sc = L.BatchNormalization(name=name + "_shortcut_1")(sc)
            sc = L.Conv2D(out_chs, 1, use_bias=False,
                          name=name + "_shortcut_2")(sc)
            sc = L.BatchNormalization(name=name + "_shortcut_3")(sc)
        return L.Add()([x, sc])

    # OS16 table (ghostnet.py:_BASE + STAGE4(2,1) + STAGE5(-1, rate 2))
    cfgs = [
        [(3, 16, 16, 0.0, 1, 1)],
        [(3, 48, 24, 0.0, 2, 1)],
        [(3, 72, 24, 0.0, 1, 1)],
        [(5, 72, 40, 0.25, 2, 1)],
        [(5, 120, 40, 0.25, 1, 1)],
        [(3, 240, 80, 0.0, 2, 1)],
        [(3, 200, 80, 0.0, 1, 1), (3, 184, 80, 0.0, 1, 1),
         (3, 184, 80, 0.0, 1, 1), (3, 480, 112, 0.25, 1, 1),
         (3, 672, 112, 0.25, 1, 1)],
        [(5, 672, 160, 0.25, -1, 1)],
        [(5, 960, 160, 0.0, 1, 2), (5, 960, 160, 0.25, 1, 2),
         (5, 960, 160, 0.0, 1, 2), (5, 960, 160, 0.25, 1, 2)],
    ]

    inp = keras.Input((*input_hw, 3))
    x = L.Conv2D(16, 3, strides=2, padding="same", use_bias=False,
                 name="conv_stem")(inp)
    x = L.BatchNormalization(name="bn1")(x)
    x = L.ReLU()(x)
    for index, cfg in enumerate(cfgs):
        for sub_index, (k, exp, c, se, s, r) in enumerate(cfg):
            keep = s == -1
            x = bottleneck(x, k, exp, c, se, 1 if keep else s, r, keep,
                           f"blocks_{index}_{sub_index}")

    # final 1x1 expansion to the last exp size (reference ConvBnAct
    # 'blocks_9_0', deeplabv3p_ghostnet.py:421-424)
    x = L.Conv2D(make_div(960), 1, use_bias=False,
                 name="blocks_9_0_conv")(x)
    x = L.BatchNormalization(name="blocks_9_0_bn1")(x)
    x = L.ReLU()(x)

    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    x = _aspp_lite_head(L, x, num_classes, (fh, fw))
    return keras.Model(inp, x)


def build_resnet50_keras(num_classes: int, input_hw: tuple[int, int]):
    """ResNet50 DeepLabV3+ twin at OS16 with the full ASPP+decoder head
    (deeplabv3p_tpu/models/resnet50.py; reference
    deeplabv3p_resnet50.py:32-399): explicit-pad 7x7/2 stem + VALID
    maxpool, biased bottleneck blocks with conv shortcuts, dilated
    stages 4/5 (stage-5 'a' keeps the stage-4 rate)."""
    import keras

    L = keras.layers

    def bottleneck(x, filters, stage, block, strides=1, rate=1,
                   conv_shortcut=False):
        f1, f2, f3 = filters
        cb = f"res{stage}{block}_branch"
        bb = f"bn{stage}{block}_branch"
        inputs = x
        x = L.Conv2D(f1, 1, strides=strides, dilation_rate=rate,
                     use_bias=True, name=cb + "2a")(x)
        x = L.BatchNormalization(name=bb + "2a")(x)
        x = L.ReLU()(x)
        x = L.Conv2D(f2, 3, padding="same", dilation_rate=rate,
                     use_bias=True, name=cb + "2b")(x)
        x = L.BatchNormalization(name=bb + "2b")(x)
        x = L.ReLU()(x)
        x = L.Conv2D(f3, 1, dilation_rate=rate, use_bias=True,
                     name=cb + "2c")(x)
        x = L.BatchNormalization(name=bb + "2c")(x)
        if conv_shortcut:
            sc = L.Conv2D(f3, 1, strides=strides, dilation_rate=rate,
                          use_bias=True, name=cb + "1")(inputs)
            sc = L.BatchNormalization(name=bb + "1")(sc)
        else:
            sc = inputs
        return L.ReLU()(L.Add()([x, sc]))

    def sep_conv_bn(x, filters, prefix, rate=1, eps=1e-5):
        x = L.DepthwiseConv2D(3, dilation_rate=rate, padding="same",
                              use_bias=False, name=prefix + "_depthwise")(x)
        x = L.BatchNormalization(epsilon=eps, name=prefix + "_depthwise_BN")(x)
        x = L.ReLU()(x)
        x = L.Conv2D(filters, 1, use_bias=False,
                     name=prefix + "_pointwise")(x)
        x = L.BatchNormalization(epsilon=eps, name=prefix + "_pointwise_BN")(x)
        return L.ReLU()(x)

    inp = keras.Input((*input_hw, 3))
    x = L.ZeroPadding2D(3)(inp)
    x = L.Conv2D(64, 7, strides=2, padding="valid", use_bias=True,
                 name="conv1")(x)
    x = L.BatchNormalization(name="bn_conv1")(x)
    x = L.ReLU()(x)
    x = L.ZeroPadding2D(1)(x)
    x = L.MaxPooling2D(3, strides=2, padding="valid")(x)

    def blocks(x, filters, stage, names, strides=1, rate=1):
        for i, b in enumerate(names):
            x = bottleneck(x, filters, stage, b,
                           strides=strides if i == 0 else 1, rate=rate,
                           conv_shortcut=(i == 0))
        return x

    x = blocks(x, [64, 64, 256], 2, "abc", strides=1)
    skip = x
    x = blocks(x, [128, 128, 512], 3, "abcd", strides=2)
    x = blocks(x, [256, 256, 1024], 4, "abcdef", strides=2, rate=1)
    x = bottleneck(x, [512, 512, 2048], 5, "a", strides=1, rate=1,
                   conv_shortcut=True)
    for b in "bc":
        x = bottleneck(x, [512, 512, 2048], 5, b, rate=2)

    # full ASPP at OS16 + decoder (same structure as the Xception twin)
    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    b4 = L.AveragePooling2D(pool_size=(fh, fw))(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = L.BatchNormalization(epsilon=1e-5, name="image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(epsilon=1e-5, name="aspp0_BN")(b0)
    b0 = L.ReLU()(b0)
    b1 = sep_conv_bn(x, 256, "aspp1", rate=6)
    b2 = sep_conv_bn(x, 256, "aspp2", rate=12)
    b3 = sep_conv_bn(x, 256, "aspp3", rate=18)
    x = L.Concatenate()([b4, b0, b1, b2, b3])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="concat_projection_BN")(x)
    x = L.ReLU()(x)

    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    skip = L.Conv2D(48, 1, use_bias=False, name="feature_projection0")(skip)
    skip = L.BatchNormalization(epsilon=1e-5, name="feature_projection0_BN")(skip)
    skip = L.ReLU()(skip)
    x = L.Concatenate()([x, skip])
    x = sep_conv_bn(x, 256, "decoder_conv0")
    x = sep_conv_bn(x, 256, "decoder_conv1")
    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    return keras.Model(inp, x)


# per-size channel schedules (reference deeplabv3p_mobilevit.py:504-547)
MOBILEVIT_TWIN_CONFIGS = {
    "s": dict(ch=[16, 32, 64, 64, 96, 128, 160, 640],
              dims=[144, 192, 240], exp=4),
    "xs": dict(ch=[16, 32, 48, 48, 64, 80, 96, 384],
               dims=[96, 120, 144], exp=4),
    "xxs": dict(ch=[16, 16, 24, 24, 48, 64, 80, 320],
                dims=[64, 80, 96], exp=2),
}


def build_mobilevit_lite_keras(num_classes: int,
                               input_hw: tuple[int, int],
                               size: str = "xxs"):
    """MobileViT-Lite twin at OS16, any size config
    (deeplabv3p_tpu/models/mobilevit.py; reference
    deeplabv3p_mobilevit.py:282-547): swish conv blocks, MV2
    blocks (BN momentum 0.1), three MobileViT blocks using the
    REFERENCE's unfold — Reshape (P,N,C) + MultiHeadAttention with
    default attention_axes — plus the ASPP-Lite head. Pins the complete
    attention-model h5 interchange; S/XS share the code path with XXS
    but exercise different channel/dim/expansion tables (VERDICT r2
    weak #8)."""
    import keras

    L = keras.layers
    silu = lambda: L.Activation("silu")

    def bn(name):
        return L.BatchNormalization(momentum=0.1, name=name)

    def conv_block(x, filters, name, k=3, strides=1, rate=1):
        rate = 1 if k == 1 else rate
        x = L.Conv2D(filters, k, strides=strides, dilation_rate=rate,
                     padding="same", use_bias=False, name=name)(x)
        x = bn(name + "_BN")(x)
        return silu()(x)

    def mv2_block(x, expanded, out_ch, strides, bid, rate=1):
        prefix = f"mv2_block_{bid}_"
        inputs = x
        x = L.Conv2D(expanded, 1, use_bias=False,
                     name=prefix + "_expand")(x)
        x = bn(prefix + "expand_BN")(x)
        x = silu()(x)
        x = L.DepthwiseConv2D(3, strides=strides, dilation_rate=rate,
                              padding="same", use_bias=False,
                              name=prefix + "depthwise")(x)
        x = bn(prefix + "depthwise_BN")(x)
        x = silu()(x)
        x = L.Conv2D(out_ch, 1, use_bias=False, name=prefix + "project")(x)
        x = bn(prefix + "project_BN")(x)
        if inputs.shape[-1] == out_ch and strides == 1:
            x = L.Add()([x, inputs])
        return x

    def transformer(t, c, name):
        x1 = L.LayerNormalization(epsilon=1e-6, name=name + "_LN1")(t)
        att = L.MultiHeadAttention(num_heads=1, key_dim=c,
                                   name=name + "_attention")(x1, x1)
        x2 = L.Add()([att, t])
        x3 = L.LayerNormalization(epsilon=1e-6, name=name + "_LN2")(x2)
        x3 = L.Dense(2 * c, name=name + "_ff_0_dense")(x3)
        x3 = silu()(x3)
        x3 = L.Dense(c, name=name + "_ff_1_dense")(x3)
        return L.Add()([x3, x2])

    def mvit_block(x, num_blocks, dim, bid, rate=1):
        prefix = f"mvit_block_{bid}_"
        in_ch = x.shape[-1]
        local = conv_block(x, dim, prefix + "conv1", k=3, rate=rate)
        local = conv_block(local, dim, prefix + "conv2", k=1)
        h, w = local.shape[1], local.shape[2]
        # the reference unfold: plain Reshape to (P, N, C), 2x2 patches
        t = L.Reshape((4, (h * w) // 4, dim))(local)
        for i in range(num_blocks):
            t = transformer(t, dim, prefix + f"transformer_{i}")
        folded = L.Reshape((h, w, dim))(t)
        folded = conv_block(folded, in_ch, prefix + "conv3", k=1)
        fused = L.Concatenate()([x, folded])
        return conv_block(fused, in_ch, prefix + "conv4", k=3, rate=rate)

    # OS16: os16_stride=2, os16_rate=1, os32_rate=2
    cfg = MOBILEVIT_TWIN_CONFIGS[size]
    ch, dims, exp = cfg["ch"], cfg["dims"], cfg["exp"]

    inp = keras.Input((*input_hw, 3))
    x = conv_block(inp, ch[0], "stem_conv", k=3, strides=2)
    x = mv2_block(x, ch[0] * exp, ch[1], 1, 0)
    x = mv2_block(x, ch[1] * exp, ch[2], 2, 1)
    x = mv2_block(x, ch[2] * exp, ch[3], 1, 2)
    x = mv2_block(x, ch[2] * exp, ch[3], 1, 3)
    x = mv2_block(x, ch[3] * exp, ch[4], 2, 4)
    x = mvit_block(x, 2, dims[0], 0)
    x = mv2_block(x, ch[5] * exp, ch[5], 2, 5)
    x = mvit_block(x, 4, dims[1], 1)
    x = mv2_block(x, ch[6] * exp, ch[6], 1, 6)
    x = mvit_block(x, 3, dims[2], 2, rate=2)
    x = conv_block(x, ch[7], "1x1_conv", k=1)

    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    x = _aspp_lite_head(L, x, num_classes, (fh, fw))
    return keras.Model(inp, x)


def build_mobilevit_xxs_lite_keras(num_classes: int,
                                   input_hw: tuple[int, int]):
    """Back-compat alias (see build_mobilevit_lite_keras)."""
    return build_mobilevit_lite_keras(num_classes, input_hw, size="xxs")


def build_mobilenetv3_large_keras(num_classes: int,
                                  input_hw: tuple[int, int],
                                  alpha: float = 1.0):
    """MobileNetV3-Large DeepLabV3+ twin at OS16 with the FULL
    ASPP+decoder head (deeplabv3p_tpu/models/mobilenetv3.py large stack;
    reference deeplabv3p_mobilenetv3.py:556-600) — pins the Large
    schedule's per-block relu/hard-swish choice and SE placement, which
    parameter-count parity cannot detect. Uses the '--' name encoding
    (rename_h5_scoped_layers before import)."""
    import keras

    L = keras.layers

    def hard_swish(t):
        return t * keras.ops.clip(t + 3.0, 0.0, 6.0) / 6.0

    def hard_sigmoid(t):
        return keras.ops.clip(t + 3.0, 0.0, 6.0) / 6.0

    def depth(d):
        return _make_divisible(d * alpha, 8)

    def bn(name):
        return L.BatchNormalization(epsilon=1e-3, momentum=0.999, name=name)

    inp = keras.Input((*input_hw, 3))
    x = L.Conv2D(16, 3, strides=2, padding="same", use_bias=False,
                 name="Conv")(inp)
    x = bn("Conv--BatchNorm")(x)
    x = L.Lambda(hard_swish)(x)

    def block(x, expansion, filters, k, stride, se, act, bid, skip, rate=1):
        infilters = x.shape[-1]
        prefix = f"expanded_conv_{bid}--" if bid else "expanded_conv--"
        shortcut = x
        if bid:
            x = L.Conv2D(_make_divisible(infilters * expansion, 8), 1,
                         use_bias=False, name=prefix + "expand")(x)
            x = bn(prefix + "expand--BatchNorm")(x)
            x = L.Lambda(hard_swish)(x) if act == "hs" else L.ReLU()(x)
        x = L.DepthwiseConv2D(k, strides=stride, dilation_rate=rate,
                              padding="same", use_bias=False,
                              name=prefix + "depthwise--Conv")(x)
        x = bn(prefix + "depthwise--BatchNorm")(x)
        x = L.Lambda(hard_swish)(x) if act == "hs" else L.ReLU()(x)
        if se:
            se_ch = _make_divisible(infilters * expansion, 8)
            s = L.GlobalAveragePooling2D(keepdims=True)(x)
            s = L.Conv2D(_make_divisible(int(se_ch * 0.25), 8), 1,
                         use_bias=True,
                         name=prefix + "squeeze_excite--Conv")(s)
            s = L.ReLU()(s)
            s = L.Conv2D(se_ch, 1, use_bias=True,
                         name=prefix + "squeeze_excite--Conv_1")(s)
            s = L.Lambda(hard_sigmoid)(s)
            x = L.Multiply()([x, s])
        x = L.Conv2D(filters, 1, use_bias=False, name=prefix + "project")(x)
        x = bn(prefix + "project--BatchNorm")(x)
        if skip:
            x = L.Add()([x, shortcut])
        return x

    # large stack at OS16 (mobilenetv3.py:180-206; os16_stride=2,
    # os16_rate=1, os32_stride=1, os32_rate=2); relu blocks 0-5, SE on
    # 3-5 and 10-14, hard-swish from block 6
    se = True
    x = block(x, 1, depth(16), 3, 1, None, "re", 0, True)
    x = block(x, 4, depth(24), 3, 2, None, "re", 1, False)
    x = block(x, 3, depth(24), 3, 1, None, "re", 2, True)
    skip = x  # OS4
    x = block(x, 3, depth(40), 5, 2, se, "re", 3, False)
    x = block(x, 3, depth(40), 5, 1, se, "re", 4, True)
    x = block(x, 3, depth(40), 5, 1, se, "re", 5, True)
    x = block(x, 6, depth(80), 3, 2, None, "hs", 6, False)
    x = block(x, 2.5, depth(80), 3, 1, None, "hs", 7, True)
    x = block(x, 2.3, depth(80), 3, 1, None, "hs", 8, True)
    x = block(x, 2.3, depth(80), 3, 1, None, "hs", 9, True)
    x = block(x, 6, depth(112), 3, 1, se, "hs", 10, False)
    x = block(x, 6, depth(112), 3, 1, se, "hs", 11, True)
    x = block(x, 6, depth(160), 5, 1, se, "hs", 12, False)
    x = block(x, 6, depth(160), 5, 1, se, "hs", 13, True, rate=2)
    x = block(x, 6, depth(160), 5, 1, se, "hs", 14, True, rate=2)

    # full ASPP at OS16 + decoder (same structure as the ResNet50 twin)
    def sep_conv_bn(x, filters, prefix, rate=1, eps=1e-5):
        x = L.DepthwiseConv2D(3, dilation_rate=rate, padding="same",
                              use_bias=False, name=prefix + "_depthwise")(x)
        x = L.BatchNormalization(epsilon=eps, name=prefix + "_depthwise_BN")(x)
        x = L.ReLU()(x)
        x = L.Conv2D(filters, 1, use_bias=False,
                     name=prefix + "_pointwise")(x)
        x = L.BatchNormalization(epsilon=eps, name=prefix + "_pointwise_BN")(x)
        return L.ReLU()(x)

    fh, fw = input_hw[0] // 16, input_hw[1] // 16
    b4 = L.AveragePooling2D(pool_size=(fh, fw))(x)
    b4 = L.Conv2D(256, 1, use_bias=False, name="image_pooling")(b4)
    b4 = L.BatchNormalization(epsilon=1e-5, name="image_pooling_BN")(b4)
    b4 = L.ReLU()(b4)
    b4 = L.UpSampling2D(size=(fh, fw), interpolation="nearest")(b4)
    b0 = L.Conv2D(256, 1, use_bias=False, name="aspp0")(x)
    b0 = L.BatchNormalization(epsilon=1e-5, name="aspp0_BN")(b0)
    b0 = L.ReLU()(b0)
    b1 = sep_conv_bn(x, 256, "aspp1", rate=6)
    b2 = sep_conv_bn(x, 256, "aspp2", rate=12)
    b3 = sep_conv_bn(x, 256, "aspp3", rate=18)
    x = L.Concatenate()([b4, b0, b1, b2, b3])
    x = L.Conv2D(256, 1, use_bias=False, name="concat_projection")(x)
    x = L.BatchNormalization(epsilon=1e-5, name="concat_projection_BN")(x)
    x = L.ReLU()(x)

    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    skip = L.Conv2D(48, 1, use_bias=False, name="feature_projection0")(skip)
    skip = L.BatchNormalization(epsilon=1e-5,
                                name="feature_projection0_BN")(skip)
    skip = L.ReLU()(skip)
    x = L.Concatenate()([x, skip])
    x = sep_conv_bn(x, 256, "decoder_conv0")
    x = sep_conv_bn(x, 256, "decoder_conv1")
    x = L.Conv2D(num_classes, 1, use_bias=True, name="conv_upsample")(x)
    x = L.UpSampling2D(size=4, interpolation="bilinear")(x)
    return keras.Model(inp, x)
