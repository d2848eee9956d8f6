"""Minimal numpy interpreter for the ONNX ops emitted by convert.py.

Used by the test suite to execute exported ModelProtos and compare them
against the original JAX programs (the environment has no onnxruntime;
this is the reference-semantics checker). Each op implements the
ONNX-opset-13 semantics for the attribute subsets convert.py produces.
"""

from __future__ import annotations

import numpy as np

from deeplabv3p_tpu.export.onnx import onnx_pb2 as op

_ONNX_TO_NP = {
    op.TensorProto.FLOAT: np.float32,
    op.TensorProto.DOUBLE: np.float64,
    op.TensorProto.FLOAT16: np.float16,
    op.TensorProto.INT64: np.int64,
    op.TensorProto.INT32: np.int32,
    op.TensorProto.INT8: np.int8,
    op.TensorProto.UINT8: np.uint8,
    op.TensorProto.BOOL: np.bool_,
}


def tensor_to_np(t: op.TensorProto) -> np.ndarray:
    dtype = _ONNX_TO_NP[t.data_type]
    if t.raw_data:
        arr = np.frombuffer(t.raw_data, dtype=dtype)
    elif t.float_data:
        arr = np.asarray(t.float_data, dtype=dtype)
    elif t.int64_data:
        arr = np.asarray(t.int64_data, dtype=dtype)
    elif t.int32_data:
        arr = np.asarray(t.int32_data, dtype=dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    return arr.reshape(tuple(t.dims))


def _attrs(node: op.NodeProto) -> dict:
    out = {}
    for a in node.attribute:
        if a.type == op.AttributeProto.INT:
            out[a.name] = a.i
        elif a.type == op.AttributeProto.FLOAT:
            out[a.name] = a.f
        elif a.type == op.AttributeProto.STRING:
            out[a.name] = a.s.decode()
        elif a.type == op.AttributeProto.INTS:
            out[a.name] = list(a.ints)
        elif a.type == op.AttributeProto.FLOATS:
            out[a.name] = list(a.floats)
        else:
            raise NotImplementedError(f"attr type {a.type}")
    return out


def _conv2d(x, w, strides, pads, dilations, group):
    """NCHW conv via jax.lax (independent layout path from the exporter's
    NHWC source graphs)."""
    import jax.lax as lax
    import jax.numpy as jnp

    out = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w),
        window_strides=strides,
        padding=[(pads[0], pads[2]), (pads[1], pads[3])],
        rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=group,
    )
    return np.asarray(out)


def _conv_transpose2d(x, w, strides, pads, dilations, group, output_padding):
    """ONNX ConvTranspose (opset 13): W is (Cin, Cout/g, kH, kW); output
    o = i*s - pads + k*d scatter. Implemented as the equivalent
    lhs-dilated correlation (swap I/O, flip spatial, pad Ke-1-p)."""
    import jax.lax as lax
    import jax.numpy as jnp

    if group != 1:
        raise NotImplementedError("interp: grouped ConvTranspose")
    w = np.swapaxes(w, 0, 1)[:, :, ::-1, ::-1]  # (Cout, Cin, kH, kW)
    keff = [
        (w.shape[2 + i] - 1) * dilations[i] + 1 for i in range(2)
    ]
    pad_pairs = [
        (keff[i] - 1 - pads[i],
         keff[i] - 1 - pads[2 + i] + output_padding[i])
        for i in range(2)
    ]
    out = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(np.ascontiguousarray(w)),
        window_strides=(1, 1),
        padding=pad_pairs,
        lhs_dilation=strides,
        rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return np.asarray(out)


def _pool2d(x, kind, kernel, strides, pads, count_include_pad=False):
    import jax.lax as lax
    import jax.numpy as jnp

    pad_hw = [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])]
    window = (1, 1, *kernel)
    strides4 = (1, 1, *strides)
    if kind == "max":
        init = -np.inf
        out = lax.reduce_window(
            jnp.asarray(x), init, lax.max, window, strides4, pad_hw
        )
        return np.asarray(out)
    # average
    s = lax.reduce_window(
        jnp.asarray(x), 0.0, lax.add, window, strides4, pad_hw
    )
    if count_include_pad:
        denom = float(np.prod(kernel))
        return np.asarray(s) / denom
    ones = jnp.ones_like(jnp.asarray(x))
    cnt = lax.reduce_window(ones, 0.0, lax.add, window, strides4, pad_hw)
    return np.asarray(s / cnt)


def run_model(model: op.ModelProto, inputs: dict[str, np.ndarray]) -> dict:
    """Execute a ModelProto; returns {output_name: ndarray}."""
    env: dict[str, np.ndarray] = {}
    for t in model.graph.initializer:
        env[t.name] = tensor_to_np(t)
    for vi in model.graph.input:
        if vi.name not in env:
            env[vi.name] = np.asarray(inputs[vi.name])

    for node in model.graph.node:
        ins = [env[n] for n in node.input]
        a = _attrs(node)
        t = node.op_type
        if t == "Add":
            out = ins[0] + ins[1]
        elif t == "Sub":
            out = ins[0] - ins[1]
        elif t == "Mul":
            out = ins[0] * ins[1]
        elif t == "Div":
            out = ins[0] / ins[1]
        elif t == "Max":
            out = np.maximum(ins[0], ins[1])
        elif t == "Min":
            out = np.minimum(ins[0], ins[1])
        elif t == "Pow":
            out = np.power(ins[0], ins[1])
        elif t == "And":
            out = np.logical_and(ins[0], ins[1])
        elif t == "Or":
            out = np.logical_or(ins[0], ins[1])
        elif t == "Xor":
            out = np.logical_xor(ins[0], ins[1])
        elif t == "Abs":
            out = np.abs(ins[0])
        elif t == "Exp":
            out = np.exp(ins[0])
        elif t == "Log":
            out = np.log(ins[0])
        elif t == "Tanh":
            out = np.tanh(ins[0])
        elif t == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0]))
        elif t == "Sqrt":
            out = np.sqrt(ins[0])
        elif t == "Reciprocal":
            out = 1.0 / ins[0]
        elif t == "Neg":
            out = -ins[0]
        elif t == "Sign":
            out = np.sign(ins[0])
        elif t == "Floor":
            out = np.floor(ins[0])
        elif t == "Ceil":
            out = np.ceil(ins[0])
        elif t == "Not":
            out = np.logical_not(ins[0])
        elif t == "Erf":
            from scipy.special import erf  # scipy is in the image

            out = erf(ins[0]).astype(ins[0].dtype)
        elif t == "Greater":
            out = ins[0] > ins[1]
        elif t == "GreaterOrEqual":
            out = ins[0] >= ins[1]
        elif t == "Less":
            out = ins[0] < ins[1]
        elif t == "LessOrEqual":
            out = ins[0] <= ins[1]
        elif t == "Equal":
            out = ins[0] == ins[1]
        elif t == "Where":
            out = np.where(ins[0], ins[1], ins[2])
        elif t == "Cast":
            out = ins[0].astype(_ONNX_TO_NP[a["to"]])
        elif t == "Reshape":
            out = ins[0].reshape(tuple(int(d) for d in ins[1]))
        elif t == "Expand":
            out = np.broadcast_to(
                ins[0], np.broadcast_shapes(
                    ins[0].shape, tuple(int(d) for d in ins[1])
                )
            )
        elif t == "Transpose":
            out = np.transpose(ins[0], a["perm"])
        elif t == "Concat":
            out = np.concatenate(ins, axis=a["axis"])
        elif t == "Slice":
            x, starts, ends, axes, steps = ins
            idx = [slice(None)] * x.ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                idx[int(ax)] = slice(int(s), int(e), int(st))
            out = x[tuple(idx)]
        elif t == "Pad":
            x, pads, value = ins
            n = x.ndim
            width = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
            out = np.pad(x, width, constant_values=float(value))
        elif t == "ReduceSum":
            axes = tuple(int(i) for i in ins[1])
            out = ins[0].sum(axis=axes, keepdims=bool(a.get("keepdims", 1)))
        elif t in ("ReduceMax", "ReduceMin", "ReduceProd"):
            fn = {"ReduceMax": np.max, "ReduceMin": np.min,
                  "ReduceProd": np.prod}[t]
            out = fn(ins[0], axis=tuple(a["axes"]),
                     keepdims=bool(a.get("keepdims", 1)))
        elif t in ("ArgMax", "ArgMin"):
            fn = np.argmax if t == "ArgMax" else np.argmin
            out = fn(ins[0], axis=a["axis"]).astype(np.int64)
            if a.get("keepdims", 1):
                out = np.expand_dims(out, a["axis"])
        elif t == "Einsum":
            out = np.einsum(a["equation"], *ins)
        elif t == "Conv":
            out = _conv2d(
                ins[0], ins[1], a["strides"], a["pads"], a["dilations"],
                a.get("group", 1),
            )
            if len(ins) > 2:
                out = out + ins[2].reshape(1, -1, 1, 1)
        elif t == "ConvTranspose":
            out = _conv_transpose2d(
                ins[0], ins[1], a["strides"], a["pads"],
                a.get("dilations", [1, 1]), a.get("group", 1),
                a.get("output_padding", [0, 0]),
            )
            if len(ins) > 2:
                out = out + ins[2].reshape(1, -1, 1, 1)
        elif t == "MaxPool":
            out = _pool2d(ins[0], "max", a["kernel_shape"], a["strides"],
                          a["pads"])
        elif t == "AveragePool":
            out = _pool2d(ins[0], "avg", a["kernel_shape"], a["strides"],
                          a["pads"],
                          count_include_pad=bool(a.get("count_include_pad")))
        elif t == "Gather":
            out = np.take(ins[0], ins[1].astype(np.int64), axis=a.get("axis", 0))
        elif t == "Identity":
            out = ins[0]
        elif t == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        else:
            raise NotImplementedError(f"interp: op {t}")
        env[node.output[0]] = np.asarray(out)

    return {vi.name: env[vi.name] for vi in model.graph.output}
