#!/usr/bin/env python3
"""Model FLOPs / parameter statistics.

Port of /root/reference/tools/evaluation/model_statistics.py:52-72 (which
uses tf.profiler): here FLOPs come from XLA's own cost analysis of the
compiled forward program, params from the variable pytree — both exact
for the program that actually runs.

Usage:
  python model_statistics.py --model_type=mobilenetv2_lite \
      --model_input_shape=512 [--output_stride=16] [--num_classes=21]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def model_statistics(model_type, num_classes=21, input_shape=(512, 512),
                     output_stride=16):
    import jax
    import jax.numpy as jnp

    # statistics do not need the TPU; run on host
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from deeplabv3p_tpu.models.factory import build_deeplab_model

    model = build_deeplab_model(
        model_type, num_classes, output_stride=output_stride
    )
    x = jnp.zeros((1, *input_shape, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    n_params = sum(
        v.size for v in jax.tree_util.tree_leaves(variables["params"])
    )

    fwd = jax.jit(lambda im: model.apply(variables, im, train=False))
    lowered = fwd.lower(x)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")

    print(f"model_type: {model_type}")
    print(f"input_shape: {input_shape}, output_stride: {output_stride}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {flops / 1e9:.2f} G")
    return n_params, flops


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--num_classes", type=int, default=21)
    p.add_argument("--model_input_shape", type=int, default=512)
    p.add_argument("--output_stride", type=int, default=16)
    from deeplabv3p_tpu.utils.device import add_device_arg, apply_device_arg

    add_device_arg(p)
    args = p.parse_args()
    apply_device_arg(args)
    model_statistics(
        args.model_type, args.num_classes,
        (args.model_input_shape, args.model_input_shape), args.output_stride,
    )


if __name__ == "__main__":
    main()
