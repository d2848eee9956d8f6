"""Data pipeline: host decode + device-side augmentation graph.

The reference's input pipeline is a single-threaded Python loop doing PIL
decode + 12 augmentation ops + per-image sklearn class weights on CPU
(/root/reference/deeplabv3p/data.py:55-154) — its #1 throughput limiter
(SURVEY.md §3.1). Here the host only decodes and resizes; every
augmentation op and the adaptive class-weight map run inside one jitted
device graph (deeplabv3p_tpu.data.augment.augment_batch).
"""

from deeplabv3p_tpu.data.augment import AugmentConfig, augment_batch  # noqa: F401
from deeplabv3p_tpu.data.pipeline import SegmentationDataset  # noqa: F401
