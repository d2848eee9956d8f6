"""Padding helpers reproducing the reference's TF 'same' conventions.

The reference relies on two distinct padding behaviours:

1. Keras `padding='same'` — input-size-dependent asymmetric padding
   (extra pixel goes bottom/right for even inputs with stride 2). XLA's
   string `'SAME'` padding implements exactly this, so modules use `'SAME'`
   directly.

2. The manual "right 'same' padding for even kernels / strided atrous conv"
   dance in the reference's `SepConv_BN` (reference
   deeplabv3p/models/layers.py:88-95) and `_conv2d_same`
   (deeplabv3p_xception.py:25-54): pad by the *effective* kernel size
   symmetrically (extra on the end), then convolve VALID. That is
   input-size-independent, which matters for strided atrous convs where
   TF-'SAME' and this scheme disagree. `atrous_explicit_pad` reproduces it
   as an explicit padding list for `lax.conv_general_dilated`.
"""

from __future__ import annotations


def same_pad_explicit(kernel_size: int, rate: int = 1) -> tuple[int, int]:
    """Symmetric-ish padding for an (effective) kernel: (beg, end).

    pad_total = k_eff - 1; beg = pad_total // 2; end = pad_total - beg.
    Matches reference layers.py:91-94.
    """
    k_eff = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = k_eff - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    return pad_beg, pad_end


def atrous_explicit_pad(kernel_size: int, rate: int) -> list[tuple[int, int]]:
    """Explicit [(beg, end), (beg, end)] spatial padding for strided atrous
    depthwise conv, equivalent to reference ZeroPadding2D + 'valid'
    (layers.py:88-95)."""
    p = same_pad_explicit(kernel_size, rate)
    return [p, p]
