"""ONNX export (reference tools/model_converter/keras_to_onnx.py:34-56).

No tf2onnx/onnx packages exist in this environment, so this package is a
self-contained ONNX writer: a vendored subset of the public ONNX protobuf
schema (onnx.proto, compiled with protoc) plus a jaxpr→ONNX graph
converter (convert.py) with constant folding, and a numpy reference
interpreter (interp.py) used by the tests to execute the emitted graphs
and check them against the JAX originals.
"""

from deeplabv3p_tpu.export.onnx import onnx_pb2  # noqa: F401
from deeplabv3p_tpu.export.onnx.convert import export_onnx, save_onnx  # noqa: F401
