"""Model export & conversion (reference L6, tools/model_converter/).

The reference exports Keras h5 → frozen pb / ONNX / TFLite / RKNN
(SURVEY.md §2.2 C24-C30). The TPU-native interchange format is serialized
StableHLO via `jax.export` — portable across XLA runtimes (TPU/CPU/GPU)
and versioned — plus the flax `.ckpt` weights format. Post-training int8
quantization (C27) is a calibration pass over a representative dataset.
"""

from deeplabv3p_tpu.export.stablehlo import (  # noqa: F401
    export_model,
    load_exported,
    save_exported,
)
from deeplabv3p_tpu.export.quantize import post_train_quantize  # noqa: F401
