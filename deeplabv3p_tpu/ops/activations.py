"""Activation functions used across the model zoo.

hard_sigmoid / hard_swish follow the reference MobileNetV3 definitions
(reference deeplabv3p/models/deeplabv3p_mobilenetv3.py:98-103):
    hard_sigmoid(x) = relu6(x + 3) / 6
    hard_swish(x)   = x * hard_sigmoid(x)
"""

import jax
import jax.numpy as jnp


def relu6(x: jax.Array) -> jax.Array:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def hard_sigmoid(x: jax.Array) -> jax.Array:
    return relu6(x + 3.0) * (1.0 / 6.0)


def hard_swish(x: jax.Array) -> jax.Array:
    return x * hard_sigmoid(x)
