#!/usr/bin/env python3
"""ONNX graph surgery (reference tools/model_converter/onnx_edit.py:13-53).

The reference editor post-processes tf2onnx output: drops the tail
Transpose, rewires Resize→Softmax, flips the output to NCHW, and sets the
Softmax axis. Our exporter emits clean NHWC graphs directly, so the
equivalent operations here are:

* `remove_trailing_transpose` — if an output is produced by a Transpose,
  bypass it (and fix the declared output shape);
* `add_nchw_output` — append a Transpose(0,3,1,2) so deployment stacks
  expecting NCHW (RKNN and friends) get it;
* `rename_io` — rename graph inputs/outputs in place.

Operates on our vendored ModelProto bindings; file format is standard
ONNX.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from deeplabv3p_tpu.export.onnx import onnx_pb2 as op  # noqa: E402
from deeplabv3p_tpu.export.onnx.convert import load_onnx, save_onnx  # noqa: E402


def _perm_of(node: op.NodeProto) -> list[int]:
    for a in node.attribute:
        if a.name == "perm":
            return list(a.ints)
    return []


def remove_trailing_transpose(model: op.ModelProto) -> bool:
    """Bypass a Transpose that directly produces a graph output
    (reference onnx_edit.py removes tf2onnx's tail NCHW transpose)."""
    graph = model.graph
    changed = False
    producers = {n.output[0]: n for n in graph.node}
    for out in graph.output:
        node = producers.get(out.name)
        if node is None or node.op_type != "Transpose":
            continue
        perm = _perm_of(node)
        src = node.input[0]
        graph.node.remove(node)
        # rewire: anything named out.name now comes from src via Identity
        ident = op.NodeProto(
            op_type="Identity", input=[src], output=[out.name],
            name=f"{out.name}_identity",
        )
        graph.node.append(ident)
        # un-permute the declared output shape
        dims = [d.dim_value for d in out.type.tensor_type.shape.dim]
        if perm and len(dims) == len(perm):
            inv = [0] * len(perm)
            for i, j in enumerate(perm):
                inv[j] = i
            del out.type.tensor_type.shape.dim[:]
            for i in inv:
                out.type.tensor_type.shape.dim.add().dim_value = dims[i]
        changed = True
    return changed


def add_nchw_output(model: op.ModelProto) -> None:
    """Flip each 4-D NHWC graph output to NCHW (reference onnx_edit.py
    'output to NCHW' rewiring)."""
    graph = model.graph
    for out in graph.output:
        dims = [d.dim_value for d in out.type.tensor_type.shape.dim]
        if len(dims) != 4:
            continue
        internal = out.name + "_nhwc"
        # retarget the producer to an internal name
        for node in graph.node:
            for i, o in enumerate(node.output):
                if o == out.name:
                    node.output[i] = internal
        graph.node.append(op.NodeProto(
            op_type="Transpose", input=[internal], output=[out.name],
            name=out.name + "_to_nchw",
            attribute=[_ints_attr("perm", [0, 3, 1, 2])],
        ))
        n, h, w, c = dims
        del out.type.tensor_type.shape.dim[:]
        for d in (n, c, h, w):
            out.type.tensor_type.shape.dim.add().dim_value = d


def _ints_attr(name: str, ints) -> op.AttributeProto:
    a = op.AttributeProto(name=name, type=op.AttributeProto.INTS)
    a.ints.extend(ints)
    return a


def rename_io(model: op.ModelProto, input_name: str | None = None,
              output_name: str | None = None) -> None:
    graph = model.graph
    if input_name and graph.input:
        old = graph.input[0].name
        graph.input[0].name = input_name
        for node in graph.node:
            for i, x in enumerate(node.input):
                if x == old:
                    node.input[i] = input_name
    if output_name and graph.output:
        old = graph.output[0].name
        graph.output[0].name = output_name
        for node in graph.node:
            for i, o in enumerate(node.output):
                if o == old:
                    node.output[i] = output_name


def main():
    parser = argparse.ArgumentParser(description="edit an ONNX model file")
    parser.add_argument("--input_model", required=True)
    parser.add_argument("--output_model", required=True)
    parser.add_argument("--remove_trailing_transpose", action="store_true")
    parser.add_argument("--nchw_output", action="store_true")
    parser.add_argument("--input_name", default=None)
    parser.add_argument("--output_name", default=None)
    args = parser.parse_args()
    model = load_onnx(args.input_model)
    if args.remove_trailing_transpose:
        remove_trailing_transpose(model)
    if args.nchw_output:
        add_nchw_output(model)
    if args.input_name or args.output_name:
        rename_io(model, args.input_name, args.output_name)
    save_onnx(model, args.output_model)
    print(f"wrote {args.output_model}")


if __name__ == "__main__":
    main()
