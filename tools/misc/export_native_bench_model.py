"""Export a 512px inference .onnx for native-engine benchmarking.

The native CLI benchmark target: the reference publishes on-device CPU
invoke times for its C++ apps at 512x512x21
(/root/reference/inference/README.md:137,301 — MNN 111.68 ms,
TFLite 428.07 ms, both x86 4-thread). This exports the matching
artifact for our pure-C++ engine (`deeplabSegment --engine onnx`).

Usage: python tools/misc/export_native_bench_model.py [out.onnx] [model] [size]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from deeplabv3p_tpu.export.onnx.convert import export_onnx, save_onnx  # noqa: E402
from deeplabv3p_tpu.models.factory import build_segmentation_model  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/native_bench_512.onnx"
    name = sys.argv[2] if len(sys.argv) > 2 else "mobilenetv2_lite"
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    model = build_segmentation_model(name, 21, output_stride=16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))

    def fwd(x):
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    x = jnp.zeros((1, size, size, 3), jnp.float32)
    save_onnx(export_onnx(fwd, (x,)), out)
    print("saved", out)


if __name__ == "__main__":
    main()
