"""jaxpr → ONNX ModelProto converter.

Replaces the reference's tf2onnx path (keras_to_onnx.py:34-56) with a
direct translation of the traced inference program: `jax.make_jaxpr` the
model's apply fn, then map each lax primitive onto ONNX-opset-13 ops.

Design points:

* **Constant folding**: any equation whose inputs are all constants is
  evaluated eagerly (with JAX) and becomes an initializer. This folds away
  the index arithmetic `jax.image.resize` traces (iota/comparisons/
  selects over static grids), leaving only MXU-shaped work (Conv, Einsum,
  elementwise, reductions) as graph nodes.
* **Layout**: the JAX graphs are NHWC; ONNX Conv/Pool are NCHW-only, so
  conv/pool nodes are wrapped in Transpose pairs (runtimes fold these).
  Conv kernels are constants, so their HWIO→OIHW transpose happens at
  export time.
* **bf16**: mapped to f32 (mainstream ONNX runtimes deploy f32; export
  callers should build models with dtype=None anyway).

Unsupported primitives raise with the primitive name so gaps are loud.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.extend import core as jax_core

from deeplabv3p_tpu.export.onnx import onnx_pb2 as op

OPSET_VERSION = 13
IR_VERSION = 8

_DTYPE_TO_ONNX = {
    np.dtype(np.float32): op.TensorProto.FLOAT,
    np.dtype(np.float64): op.TensorProto.DOUBLE,
    np.dtype(np.float16): op.TensorProto.FLOAT16,
    np.dtype(np.int64): op.TensorProto.INT64,
    np.dtype(np.int32): op.TensorProto.INT32,
    np.dtype(np.int8): op.TensorProto.INT8,
    np.dtype(np.uint8): op.TensorProto.UINT8,
    np.dtype(np.bool_): op.TensorProto.BOOL,
}


def _np_of(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype == jax.numpy.bfloat16:
        arr = arr.astype(np.float32)
    return arr


def _onnx_dtype(dtype) -> int:
    if str(dtype) == "bfloat16":
        return op.TensorProto.FLOAT
    return _DTYPE_TO_ONNX[np.dtype(dtype)]


class _Builder:
    """Accumulates nodes/initializers and hands out unique names."""

    def __init__(self):
        self.nodes: list[op.NodeProto] = []
        self.initializers: dict[str, op.TensorProto] = {}
        self._counter = 0
        self._const_cache: dict[Any, str] = {}
        self._const_refs: list[Any] = []

    def fresh(self, hint: str) -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def add_node(self, op_type: str, inputs: list[str], n_out: int = 1,
                 name_hint: str | None = None, **attrs) -> list[str]:
        outs = [self.fresh((name_hint or op_type).lower()) for _ in range(n_out)]
        node = op.NodeProto(
            op_type=op_type, input=inputs, output=outs,
            name=self.fresh(op_type),
        )
        for k, v in attrs.items():
            node.attribute.append(_attr(k, v))
        self.nodes.append(node)
        return outs

    def constant(self, value: np.ndarray, hint: str = "const") -> str:
        """Register a constant as an initializer. Small constants dedup by
        content; large ones by identity (with the array pinned — an id()
        key without a held reference would alias recycled temporaries)."""
        arr = _np_of(value)
        if arr.size <= 1024:
            key = (arr.tobytes(), arr.shape, arr.dtype.str)
        else:
            self._const_refs.append(value)
            key = ("id", id(value))
        if key in self._const_cache:
            return self._const_cache[key]
        name = self.fresh(hint)
        self.initializers[name] = _tensor_proto(name, arr)
        self._const_cache[key] = name
        return name


def _attr(name: str, value) -> op.AttributeProto:
    a = op.AttributeProto(name=name)
    if isinstance(value, bool) or isinstance(value, (int, np.integer)):
        a.type = op.AttributeProto.INT
        a.i = int(value)
    elif isinstance(value, float):
        a.type = op.AttributeProto.FLOAT
        a.f = value
    elif isinstance(value, str):
        a.type = op.AttributeProto.STRING
        a.s = value.encode()
    elif isinstance(value, (list, tuple, np.ndarray)):
        seq = list(value)
        if all(isinstance(v, (int, np.integer)) for v in seq):
            a.type = op.AttributeProto.INTS
            a.ints.extend(int(v) for v in seq)
        else:
            a.type = op.AttributeProto.FLOATS
            a.floats.extend(float(v) for v in seq)
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return a


def _tensor_proto(name: str, arr: np.ndarray) -> op.TensorProto:
    t = op.TensorProto(name=name, data_type=_DTYPE_TO_ONNX[arr.dtype])
    t.dims.extend(arr.shape)
    t.raw_data = np.ascontiguousarray(arr).tobytes()
    return t


def _value_info(name: str, shape, dtype) -> op.ValueInfoProto:
    vi = op.ValueInfoProto(name=name)
    vi.type.tensor_type.elem_type = _onnx_dtype(dtype)
    for d in shape:
        vi.type.tensor_type.shape.dim.add().dim_value = int(d)
    return vi


# ---------------------------------------------------------------------------
# Conversion environment: each jaxpr var is either a host constant (fold
# candidate) or a symbolic ONNX value name.
# ---------------------------------------------------------------------------

class _Sym(str):
    pass


class _Converter:
    def __init__(self):
        self.b = _Builder()

    # -- env helpers --------------------------------------------------------

    def read(self, env, atom):
        if isinstance(atom, jax_core.Literal):
            return _np_of(atom.val)
        return env[atom]

    def as_name(self, val, hint="const") -> str:
        """Symbolic name for a value (materializing constants)."""
        if isinstance(val, _Sym):
            return str(val)
        return self.b.constant(val, hint)

    # -- main walk -----------------------------------------------------------

    def convert_jaxpr(self, jaxpr, consts, input_names: list[str]):
        env: dict[Any, Any] = {}
        for var, const in zip(jaxpr.constvars, consts):
            env[var] = _np_of(const)
        for var, name in zip(jaxpr.invars, input_names):
            env[var] = _Sym(name)
        self._run_eqns(jaxpr, env)
        return [self.read(env, v) for v in jaxpr.outvars]

    def _inline(self, closed, in_vals):
        env: dict[Any, Any] = {}
        for var, const in zip(closed.jaxpr.constvars, closed.consts):
            env[var] = _np_of(const)
        for var, val in zip(closed.jaxpr.invars, in_vals):
            env[var] = val
        self._run_eqns(closed.jaxpr, env)
        return [self.read(env, v) for v in closed.jaxpr.outvars]

    def _run_eqns(self, jaxpr, env):
        for eqn in jaxpr.eqns:
            in_vals = [self.read(env, a) for a in eqn.invars]
            prim = eqn.primitive.name

            # call-like primitives: inline their sub-jaxprs
            if prim in ("pjit", "jit", "closed_call", "core_call",
                        "remat", "checkpoint"):
                sub = eqn.params.get("jaxpr")
                if not hasattr(sub, "consts"):  # open Jaxpr (e.g. remat)
                    sub = jax_core.ClosedJaxpr(sub, [])
                outs = self._inline(sub, in_vals)
            elif prim in ("custom_jvp_call", "custom_vjp_call"):
                sub = eqn.params.get("call_jaxpr") or eqn.params.get(
                    "fun_jaxpr"
                )
                outs = self._inline(sub, in_vals)
            elif all(not isinstance(v, _Sym) for v in in_vals):
                # constant folding: evaluate on host
                result = eqn.primitive.bind(
                    *[np.asarray(v) for v in in_vals], **eqn.params
                )
                outs = (
                    [_np_of(r) for r in result]
                    if eqn.primitive.multiple_results else [_np_of(result)]
                )
            else:
                handler = _HANDLERS.get(prim)
                if handler is None:
                    raise NotImplementedError(
                        f"ONNX export: unsupported primitive '{prim}' "
                        f"(params: {list(eqn.params)})"
                    )
                outs = handler(self, eqn, in_vals)
                if not isinstance(outs, list):
                    outs = [outs]

            for var, val in zip(eqn.outvars, outs):
                env[var] = val


# ---------------------------------------------------------------------------
# primitive handlers
# ---------------------------------------------------------------------------

_HANDLERS: dict[str, Callable] = {}


def _register(*names):
    def deco(fn):
        for n in names:
            _HANDLERS[n] = fn
        return fn
    return deco


_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow",
    "and": "And", "or": "Or", "xor": "Xor",
    "abs": "Abs", "exp": "Exp", "log": "Log", "tanh": "Tanh",
    "logistic": "Sigmoid", "sqrt": "Sqrt", "neg": "Neg", "sign": "Sign",
    "floor": "Floor", "ceil": "Ceil", "not": "Not", "erf": "Erf",
}

for _jax_name, _onnx_name in _ELEMENTWISE.items():
    def _make(onnx_name):
        def h(cv, eqn, vals):
            names = [cv.as_name(v) for v in vals]
            return _Sym(cv.b.add_node(onnx_name, names)[0])
        return h
    _HANDLERS[_jax_name] = _make(_onnx_name)


_COMPARE = {"ge": ("GreaterOrEqual", False), "gt": ("Greater", False),
            "le": ("LessOrEqual", False), "lt": ("Less", False),
            "eq": ("Equal", False), "ne": ("Equal", True)}


@_register("ge", "gt", "le", "lt", "eq", "ne")
def _compare(cv, eqn, vals):
    onnx_op, negate = _COMPARE[eqn.primitive.name]
    names = [cv.as_name(v) for v in vals]
    out = cv.b.add_node(onnx_op, names)[0]
    if negate:
        out = cv.b.add_node("Not", [out])[0]
    return _Sym(out)


@_register("rsqrt")
def _rsqrt(cv, eqn, vals):
    s = cv.b.add_node("Sqrt", [cv.as_name(vals[0])])[0]
    return _Sym(cv.b.add_node("Reciprocal", [s])[0])


@_register("square")
def _square(cv, eqn, vals):
    x = cv.as_name(vals[0])
    return _Sym(cv.b.add_node("Mul", [x, x])[0])


@_register("integer_pow")
def _integer_pow(cv, eqn, vals):
    y = eqn.params["y"]
    exp = np.asarray(float(y), np.float32)
    return _Sym(cv.b.add_node(
        "Pow", [cv.as_name(vals[0]), cv.b.constant(exp, "exp")]
    )[0])


@_register("stop_gradient", "copy")
def _identity(cv, eqn, vals):
    return vals[0]


@_register("convert_element_type")
def _convert(cv, eqn, vals):
    to = _onnx_dtype(eqn.params["new_dtype"])
    src = eqn.invars[0].aval.dtype
    if _onnx_dtype(src) == to:
        return vals[0]  # bf16<->f32 collapses
    return _Sym(cv.b.add_node("Cast", [cv.as_name(vals[0])], to=to)[0])


@_register("select_n")
def _select_n(cv, eqn, vals):
    if len(vals) == 3 and eqn.invars[0].aval.dtype == np.bool_:
        pred, on_false, on_true = vals
        return _Sym(cv.b.add_node(
            "Where",
            [cv.as_name(pred), cv.as_name(on_true), cv.as_name(on_false)],
        )[0])
    # integer selector with n cases: a chain of Equal + Where
    # (out = where(which==0, c0, where(which==1, c1, ... c_{n-1})))
    pred, cases = vals[0], vals[1:]
    pred_name = cv.as_name(pred)
    pred_dtype = np.dtype(eqn.invars[0].aval.dtype)
    out = cv.as_name(cases[-1])
    for i in range(len(cases) - 2, -1, -1):
        idx = cv.b.constant(np.asarray(i, pred_dtype), "idx")
        eq = cv.b.add_node("Equal", [pred_name, idx])[0]
        out = cv.b.add_node("Where", [eq, cv.as_name(cases[i]), out])[0]
    return _Sym(out)


@_register("broadcast_in_dim")
def _broadcast(cv, eqn, vals):
    shape = eqn.params["shape"]
    bdims = eqn.params["broadcast_dimensions"]
    in_aval = eqn.invars[0].aval
    name = cv.as_name(vals[0])
    # step 1: reshape to rank(out) with 1s outside broadcast dims
    interim = [1] * len(shape)
    for src_axis, dst_axis in enumerate(bdims):
        interim[dst_axis] = in_aval.shape[src_axis]
    if tuple(interim) != tuple(in_aval.shape):
        shp = cv.b.constant(np.asarray(interim, np.int64), "shape")
        name = cv.b.add_node("Reshape", [name, shp])[0]
    if tuple(interim) != tuple(shape):
        tgt = cv.b.constant(np.asarray(shape, np.int64), "shape")
        name = cv.b.add_node("Expand", [name, tgt])[0]
    return _Sym(name)


@_register("reshape")
def _reshape(cv, eqn, vals):
    if eqn.params.get("dimensions") is not None:
        raise NotImplementedError("reshape with dimensions")
    shp = cv.b.constant(
        np.asarray(eqn.params["new_sizes"], np.int64), "shape"
    )
    return _Sym(cv.b.add_node("Reshape", [cv.as_name(vals[0]), shp])[0])


@_register("squeeze")
def _squeeze(cv, eqn, vals):
    out_shape = eqn.outvars[0].aval.shape
    shp = cv.b.constant(np.asarray(out_shape, np.int64), "shape")
    return _Sym(cv.b.add_node("Reshape", [cv.as_name(vals[0]), shp])[0])


@_register("transpose")
def _transpose(cv, eqn, vals):
    return _Sym(cv.b.add_node(
        "Transpose", [cv.as_name(vals[0])],
        perm=list(eqn.params["permutation"]),
    )[0])


@_register("concatenate")
def _concat(cv, eqn, vals):
    names = [cv.as_name(v) for v in vals]
    return _Sym(cv.b.add_node(
        "Concat", names, axis=int(eqn.params["dimension"])
    )[0])


@_register("slice")
def _slice(cv, eqn, vals):
    starts = eqn.params["start_indices"]
    ends = eqn.params["limit_indices"]
    strides = eqn.params["strides"] or (1,) * len(starts)
    axes = list(range(len(starts)))
    args = [cv.as_name(vals[0])] + [
        cv.b.constant(np.asarray(x, np.int64), h)
        for x, h in ((starts, "starts"), (ends, "ends"),
                     (axes, "axes"), (strides, "steps"))
    ]
    return _Sym(cv.b.add_node("Slice", args)[0])


@_register("pad")
def _pad(cv, eqn, vals):
    cfg = eqn.params["padding_config"]
    x, pad_val = vals
    name = cv.as_name(x)
    shape = list(eqn.invars[0].aval.shape)
    dtype = np.dtype(eqn.invars[0].aval.dtype)

    # interior (dilation) padding: ONNX Pad has no interior mode; emulate
    # per dim by concatenating `interior` zero-planes along an unsqueezed
    # axis, flattening, and slicing off the trailing run:
    #   (.., n, ..) -> (.., n, 1+k, ..) -> (.., n*(1+k), ..) -> drop last k
    for d, (_, _, interior) in enumerate(cfg):
        if interior == 0:
            continue
        n = shape[d]
        pre, post = shape[:d], shape[d + 1:]
        shp1 = cv.b.constant(
            np.asarray(pre + [n, 1] + post, np.int64), "shape"
        )
        name = cv.b.add_node("Reshape", [name, shp1])[0]
        fill = np.broadcast_to(
            np.asarray(pad_val, dtype),  # pad value is concrete (as below)
            tuple(pre + [n, interior] + post),
        )
        zeros = cv.b.constant(np.ascontiguousarray(fill), "interior_fill")
        name = cv.b.add_node("Concat", [name, zeros], axis=d + 1)[0]
        shp2 = cv.b.constant(
            np.asarray(pre + [n * (1 + interior)] + post, np.int64), "shape"
        )
        name = cv.b.add_node("Reshape", [name, shp2])[0]
        args = [name] + [
            cv.b.constant(np.asarray(v, np.int64), h)
            for v, h in (([0], "starts"),
                         ([n * (1 + interior) - interior], "ends"),
                         ([d], "axes"), ([1], "steps"))
        ]
        name = cv.b.add_node("Slice", args)[0]
        shape = pre + [n + (n - 1) * interior] + post

    # negative edge padding is a crop (XLA pad semantics): Slice first,
    # then Pad with the positive remainder
    if any(lo < 0 or hi < 0 for lo, hi, _ in cfg):
        starts = [max(0, -lo) for lo, _, _ in cfg]
        ends = [shape[d] + min(0, hi) for d, (_, hi, _) in enumerate(cfg)]
        axes = list(range(len(shape)))
        args = [name] + [
            cv.b.constant(np.asarray(v, np.int64), h)
            for v, h in ((starts, "starts"), (ends, "ends"),
                         (axes, "axes"), ([1] * len(axes), "steps"))
        ]
        name = cv.b.add_node("Slice", args)[0]

    pads = [max(0, lo) for lo, _, _ in cfg] + [max(0, hi) for _, hi, _ in cfg]
    if all(p == 0 for p in pads):
        return _Sym(name)
    args = [
        name,
        cv.b.constant(np.asarray(pads, np.int64), "pads"),
        cv.as_name(np.asarray(pad_val)),
    ]
    return _Sym(cv.b.add_node("Pad", args, mode="constant")[0])


@_register("gather")
def _gather(cv, eqn, vals):
    """take-along-axis gathers → ONNX Gather(axis=k).

    The pattern `jnp.take(x, idx, axis=k)` (what jax.image.resize
    'nearest' traces to: per-axis row/column index gathers) appears as
    start_index_map == collapsed_slice_dims == (k,), full slice sizes on
    every other dim, and (N, 1) indices whose batch dim lands at output
    position k. General XLA gather stays a loud gap.
    """
    dn = eqn.params["dimension_numbers"]
    slice_sizes = eqn.params["slice_sizes"]
    op_shape = eqn.invars[0].aval.shape
    idx_shape = eqn.invars[1].aval.shape
    ok = (
        len(dn.start_index_map) == 1
        and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)
        and not dn.operand_batching_dims
        and len(idx_shape) == 2 and idx_shape[1] == 1
    )
    if ok:
        k = dn.start_index_map[0]
        ok = slice_sizes[k] == 1 and all(
            slice_sizes[i] == op_shape[i]
            for i in range(len(op_shape)) if i != k
        )
        # the index batch dim must land at output position k
        out_rank = len(op_shape)  # collapsed 1 + inserted 1
        batch_pos = [d for d in range(out_rank) if d not in dn.offset_dims]
        ok = ok and batch_pos == [k]
    if not ok:
        raise NotImplementedError(
            f"general gather (dims {dn}, slices {slice_sizes})"
        )
    data = cv.as_name(vals[0], "x")
    if isinstance(vals[1], _Sym):
        idx = cv.b.add_node(
            "Reshape",
            [str(vals[1]),
             cv.b.constant(np.asarray([idx_shape[0]], np.int64), "shape")],
        )[0]
    else:
        idx = cv.b.constant(
            _np_of(vals[1]).reshape(-1).astype(np.int64), "indices"
        )
    return _Sym(cv.b.add_node("Gather", [data, idx], axis=int(k))[0])


@_register("reduce_sum", "reduce_max", "reduce_min", "reduce_prod")
def _reduce(cv, eqn, vals):
    prim = eqn.primitive.name
    axes = list(eqn.params["axes"])
    x = cv.as_name(vals[0])
    if prim == "reduce_sum":
        # opset 13: ReduceSum takes axes as an input
        ax = cv.b.constant(np.asarray(axes, np.int64), "axes")
        out = cv.b.add_node("ReduceSum", [x, ax], keepdims=0)[0]
    else:
        onnx_op = {"reduce_max": "ReduceMax", "reduce_min": "ReduceMin",
                   "reduce_prod": "ReduceProd"}[prim]
        out = cv.b.add_node(onnx_op, [x], axes=axes, keepdims=0)[0]
    return _Sym(out)


@_register("argmax", "argmin")
def _argreduce(cv, eqn, vals):
    axes = eqn.params["axes"]
    assert len(axes) == 1
    onnx_op = "ArgMax" if eqn.primitive.name == "argmax" else "ArgMin"
    out = cv.b.add_node(
        onnx_op, [cv.as_name(vals[0])], axis=int(axes[0]), keepdims=0,
    )[0]
    want = _onnx_dtype(eqn.params["index_dtype"])
    if want != op.TensorProto.INT64:
        out = cv.b.add_node("Cast", [out], to=want)[0]
    return _Sym(out)


@_register("dot_general")
def _dot_general(cv, eqn, vals):
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs_rank = len(eqn.invars[0].aval.shape)
    rhs_rank = len(eqn.invars[1].aval.shape)
    letters = iter("abcdefghijklmnopqrstuvwxyz")
    lhs_sub = [None] * lhs_rank
    rhs_sub = [None] * rhs_rank
    out_sub = []
    for i, j in zip(lb, rb):  # batch dims (shared, kept)
        c = next(letters)
        lhs_sub[i] = rhs_sub[j] = c
        out_sub.append(c)
    for i, j in zip(lc, rc):  # contracting dims (shared, summed)
        c = next(letters)
        lhs_sub[i] = rhs_sub[j] = c
    lhs_free = [i for i in range(lhs_rank) if lhs_sub[i] is None]
    rhs_free = [j for j in range(rhs_rank) if rhs_sub[j] is None]
    for i in lhs_free:
        lhs_sub[i] = next(letters)
        out_sub.append(lhs_sub[i])
    for j in rhs_free:
        rhs_sub[j] = next(letters)
        out_sub.append(rhs_sub[j])
    equation = f"{''.join(lhs_sub)},{''.join(rhs_sub)}->{''.join(out_sub)}"
    names = [cv.as_name(v, "w") for v in vals]
    return _Sym(cv.b.add_node("Einsum", names, equation=equation)[0])


def _spec_perm(spec, rank):
    """Permutation taking `spec` layout to canonical (N, C, spatial...)."""
    n, c, *spatial = spec
    return [n, c] + list(spatial)


@_register("conv_general_dilated")
def _conv(cv, eqn, vals):
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    if any(d != 1 for d in p["lhs_dilation"]):
        return _conv_transpose(cv, eqn, vals)
    nspatial = len(p["window_strides"])

    x_name = cv.as_name(vals[0], "x")
    # transpose input to NCHW
    perm_in = _spec_perm(lhs_spec, 2 + nspatial)
    if perm_in != list(range(2 + nspatial)):
        x_name = cv.b.add_node("Transpose", [x_name], perm=perm_in)[0]

    # kernel: constant in inference graphs → transpose at export time
    kperm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])  # O, I, spatial
    if isinstance(vals[1], _Sym):
        w_name = cv.b.add_node(
            "Transpose", [cv.as_name(vals[1])], perm=kperm
        )[0]
    else:
        w = np.transpose(_np_of(vals[1]), kperm)
        w_name = cv.b.constant(np.ascontiguousarray(w), "weight")

    pads = [lo for lo, _ in p["padding"]] + [hi for _, hi in p["padding"]]
    conv = cv.b.add_node(
        "Conv", [x_name, w_name],
        strides=list(p["window_strides"]),
        dilations=list(p["rhs_dilation"]),
        pads=pads,
        group=int(p["feature_group_count"]),
    )[0]

    # transpose back to the jaxpr's output layout
    out_perm = _spec_perm(out_spec, 2 + nspatial)
    inv = [0] * len(out_perm)
    for i, j in enumerate(out_perm):
        inv[j] = i
    if inv != list(range(2 + nspatial)):
        conv = cv.b.add_node("Transpose", [conv], perm=inv)[0]
    return _Sym(conv)


def _conv_transpose(cv, eqn, vals):
    """lhs-dilated conv → ONNX ConvTranspose (reference parity:
    keras_to_onnx.py exports Conv2DTranspose models, UNet-Standard).

    XLA semantics: out[o] = Σ_k in[(o - lo + k·dᵣ)/s]·W[k] (correlation of
    the s-dilated input). ONNX ConvTranspose scatters in[i]·W into
    o = i·s - pads + k·dᵣ, i.e. the same sum with the kernel spatially
    FLIPPED and pads = Kₑ-1-lo (Kₑ = (K-1)·dᵣ+1). Padding beyond Kₑ-1 on
    the high side becomes output_padding; on the low side it has no ONNX
    encoding (unused by any registry model) → loud error.
    """
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    nspatial = len(p["window_strides"])
    if any(s != 1 for s in p["window_strides"]):
        raise NotImplementedError(
            "conv with both lhs_dilation and window_strides"
        )
    if int(p["feature_group_count"]) != 1:
        raise NotImplementedError("grouped transposed convolution")
    if isinstance(vals[1], _Sym):
        raise NotImplementedError("non-constant transposed-conv kernel")

    # kernel: jaxpr layout → (O, I, spatial) → flip spatial → (I, O, spatial)
    kperm = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
    w = np.transpose(_np_of(vals[1]), kperm)
    w = w[(slice(None), slice(None)) + (slice(None, None, -1),) * nspatial]
    w = np.swapaxes(w, 0, 1)  # ONNX ConvTranspose wants (I, O/g, kH, kW)
    w_name = cv.b.constant(np.ascontiguousarray(w), "weight")

    rhs_dil = list(p["rhs_dilation"])
    kdims = [eqn.invars[1].aval.shape[rhs_spec[2 + i]] for i in range(nspatial)]
    keff = [(k - 1) * d + 1 for k, d in zip(kdims, rhs_dil)]
    pads_begin, pads_end, out_pad = [], [], []
    for (lo, hi), ke in zip(p["padding"], keff):
        pb, pe = ke - 1 - lo, ke - 1 - hi
        op = 0
        if pe < 0:
            op, pe = -pe, 0
        if pb < 0:
            raise NotImplementedError(
                f"transposed conv low padding {lo} exceeds kernel extent {ke}"
            )
        pads_begin.append(pb)
        pads_end.append(pe)
        out_pad.append(op)

    x_name = cv.as_name(vals[0], "x")
    perm_in = _spec_perm(lhs_spec, 2 + nspatial)
    if perm_in != list(range(2 + nspatial)):
        x_name = cv.b.add_node("Transpose", [x_name], perm=perm_in)[0]
    attrs = dict(
        strides=list(p["lhs_dilation"]),
        dilations=rhs_dil,
        pads=pads_begin + pads_end,
        group=1,
    )
    if any(out_pad):
        attrs["output_padding"] = out_pad
    conv = cv.b.add_node("ConvTranspose", [x_name, w_name], **attrs)[0]
    out_perm = _spec_perm(out_spec, 2 + nspatial)
    inv = [0] * len(out_perm)
    for i, j in enumerate(out_perm):
        inv[j] = i
    if inv != list(range(2 + nspatial)):
        conv = cv.b.add_node("Transpose", [conv], perm=inv)[0]
    return _Sym(conv)


@_register("reduce_window_max")
def _reduce_window_max(cv, eqn, vals):
    return _pool(cv, eqn, vals, "MaxPool")


@_register("reduce_window_sum")
def _reduce_window_sum(cv, eqn, vals):
    # SumPool = AveragePool(count_include_pad) * window_size
    out = _pool(cv, eqn, vals, "AveragePool")
    wdims = eqn.params["window_dimensions"]
    k = float(np.prod([d for d in wdims if d > 1] or [1]))
    scale = cv.b.constant(np.asarray(k, np.float32), "winsize")
    return _Sym(cv.b.add_node("Mul", [str(out), scale])[0])


def _pool(cv, eqn, vals, onnx_op):
    p = eqn.params
    wdims = list(p["window_dimensions"])
    strides = list(p["window_strides"])
    padding = list(p["padding"])
    rank = len(wdims)
    # NHWC pooling: window/strides must be 1 on batch & channel axes
    if rank != 4 or wdims[0] != 1 or wdims[3] != 1:
        raise NotImplementedError(f"{onnx_op}: non-NHWC window {wdims}")
    x = cv.b.add_node(
        "Transpose", [cv.as_name(vals[0])], perm=[0, 3, 1, 2]
    )[0]
    pads = [padding[1][0], padding[2][0], padding[1][1], padding[2][1]]
    attrs = dict(
        kernel_shape=wdims[1:3], strides=strides[1:3], pads=pads,
    )
    if onnx_op == "AveragePool":
        attrs["count_include_pad"] = 1
    pool = cv.b.add_node(onnx_op, [x], **attrs)[0]
    return _Sym(cv.b.add_node("Transpose", [pool], perm=[0, 2, 3, 1])[0])


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def export_onnx(
    fn: Callable,
    example_args: tuple,
    *,
    model_name: str = "deeplabv3p_tpu",
    input_names: list[str] | None = None,
    output_names: list[str] | None = None,
    doc_string: str = "",
) -> op.ModelProto:
    """Trace `fn(*example_args)` and convert to an ONNX ModelProto.

    Reference IO naming convention: input 'image_input', output
    'pred_mask/Softmax' (what the RKNN/MNN consumers expect,
    tensorflow_to_rknn.py:40-41) — pass input_names/output_names to match.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    if input_names is None:
        input_names = [f"input_{i}" for i in range(len(closed.jaxpr.invars))]
    assert len(input_names) == len(closed.jaxpr.invars)

    cv = _Converter()
    out_vals = cv.convert_jaxpr(closed.jaxpr, closed.consts, input_names)

    if output_names is None:
        output_names = [f"output_{i}" for i in range(len(out_vals))]

    graph = op.GraphProto(name=model_name, doc_string=doc_string)
    for name, var in zip(input_names, closed.jaxpr.invars):
        graph.input.append(
            _value_info(name, var.aval.shape, var.aval.dtype)
        )
    for out_name, val, var in zip(output_names, out_vals, closed.jaxpr.outvars):
        if isinstance(val, _Sym):
            # alias the final node's output to the requested name
            ident = op.NodeProto(
                op_type="Identity", input=[str(val)], output=[out_name],
                name=cv.b.fresh("Identity"),
            )
            cv.b.nodes.append(ident)
        else:  # fully-constant output
            cv.b.initializers[out_name] = _tensor_proto(out_name, _np_of(val))
        graph.output.append(
            _value_info(out_name, var.aval.shape, var.aval.dtype)
        )

    graph.node.extend(cv.b.nodes)
    graph.initializer.extend(cv.b.initializers.values())

    model = op.ModelProto(
        ir_version=IR_VERSION,
        producer_name="deeplabv3p_tpu",
        producer_version="1.0",
        graph=graph,
        doc_string=doc_string,
    )
    model.opset_import.add(domain="", version=OPSET_VERSION)
    return model


def save_onnx(model: op.ModelProto, path: str) -> None:
    with open(path, "wb") as f:
        f.write(model.SerializeToString())


def load_onnx(path: str) -> op.ModelProto:
    model = op.ModelProto()
    with open(path, "rb") as f:
        model.ParseFromString(f.read())
    return model
