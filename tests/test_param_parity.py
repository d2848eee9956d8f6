"""Architecture parity: parameter counts vs the reference's published
benchmark table (/root/reference/README.md:310-317, 512x512 OS16,
21 classes).

Exact param-count agreement is strong evidence the rebuilt architectures
match layer-for-layer (channel schedules, expansion ratios, head shapes).
Measured once and locked in:

  xception              41.06M   (published 41.06M — exact)
  resnet50              26.72M   (published 26.72M — exact)
  mobilenetv3large       3.51M   (published  3.51M — exact; full head)
  peleenet_lite          2.60M   (published  2.59M)
  mobilenetv2_lite       2.11M   (published  2.11M)
  mobilenetv3small_lite  1.06M   (published  1.06M)

Uses jax.eval_shape — no compute, runs in seconds.
"""

import jax
import jax.numpy as jnp
import pytest

from deeplabv3p_tpu.models.factory import build_deeplab_model

# (model_type, published params in M, tolerance %)
PUBLISHED = [
    ("xception", 41.06, 0.1),
    ("resnet50", 26.72, 0.1),
    ("mobilenetv3large", 3.51, 0.5),
    ("peleenet_lite", 2.59, 1.0),
    ("mobilenetv2_lite", 2.11, 1.0),
    ("mobilenetv3small_lite", 1.06, 1.0),
]


@pytest.mark.parametrize("model_type,published_m,tol", PUBLISHED)
def test_param_count_matches_reference(model_type, published_m, tol):
    model = build_deeplab_model(model_type, 21, output_stride=16)
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 512, 512, 3), jnp.float32),
    )
    n = sum(
        leaf.size for leaf in jax.tree_util.tree_leaves(variables["params"])
    ) / 1e6
    assert abs(n - published_m) / published_m * 100 <= tol, (
        f"{model_type}: {n:.2f}M vs published {published_m}M"
    )
