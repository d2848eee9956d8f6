#!/usr/bin/env python3
"""CRF parity study vs the exact dense mean-field oracle (VERDICT r3 #4).

pydensecrf is not installable here (zero-egress env, reference
postprocess_np.py:10-28), so the ground truth is postprocess.
crf_exact_dense — the brute-force O(N^2) dense mean field that
pydensecrf's permutohedral lattice itself approximates. This study runs
the example/ pairs (downscaled so the N x N kernels fit) through

  * the exact oracle with pydensecrf's RGB bilateral features,
  * the exact oracle with BT.601 LUMA bilateral features (isolates the
    luma-projection error our grid design accepts), and
  * crf_inference's bilateral-grid approximation over a
    (space_step x n_bins) sweep,

and prints per-config agreement tables:
  agree_all   : fraction of pixels where grid argmax == oracle argmax
  agree_delta : same, restricted to pixels the ORACLE changed from the
                input mask (the pixels CRF is actually for; trivially-
                unchanged background would otherwise dominate)
  q_mae       : mean |Q_grid - Q_oracle|

Two parameter regimes per image:
  reference : the reference's exact params (sxy 3/80, srgb 13, 5 iters)
              at the downscaled size — near-global spatial coupling;
  scaled    : sxy_bilateral scaled by the downscale factor — the same
              sigma-to-image ratio as the 512px deployment.

Run on CPU:  python tools/misc/crf_parity_study.py [--size 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from deeplabv3p_tpu.utils.device import (  # noqa: E402
    add_device_arg,
    apply_device_arg,
)


def load_pair(stem: str, h: int, w: int):
    from PIL import Image

    img = Image.open(f"example/{stem}.jpg").resize((w, h), Image.BILINEAR)
    lbl = Image.open(f"example/{stem}.png").resize((w, h), Image.NEAREST)
    return np.asarray(img, np.float32), np.asarray(lbl)


def compact(mask: np.ndarray):
    colors, inv = np.unique(mask, return_inverse=True)
    return inv.reshape(mask.shape).astype(np.int32), len(colors)


def agreement(a, b, sel=None):
    if sel is not None:
        if not sel.any():
            return float("nan")
        a, b = a[sel], b[sel]
    return float((a == b).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128,
                    help="downscaled height (width keeps 4:3)")
    ap.add_argument("--features", choices=("rgb", "luma"), default="rgb",
                    help="bilateral grid color space to sweep: rgb is "
                         "the shipped default (composite n_bins**3 grid, "
                         "no luma-projection error — VERDICT r4 #3); "
                         "luma is the fast path")
    add_device_arg(ap)
    ap.set_defaults(device="cpu")
    args = ap.parse_args()
    apply_device_arg(args)

    import jax.numpy as jnp

    from deeplabv3p_tpu import postprocess as pp

    h = args.size
    w = h * 4 // 3
    stems = ["2007_000039", "2007_000346"]
    # rgb composite grids get cubically wide: cap per-channel bins at 16
    bin_sweep = (4, 8, 16, 32) if args.features == "luma" else (4, 8, 16)
    sweeps = [(ss, nb) for ss in (4, 8, 16, 32) for nb in bin_sweep]

    for stem in stems:
        image, mask = load_pair(stem, h, w)
        labels, n_labels = compact(mask)
        scale = 500.0 / w  # original example/ width is 500
        for regime, sxy_b in (("reference", 80.0), ("scaled", 80.0 / scale)):
            params = dict(
                n_iters=5, sxy_gaussian=3.0, compat_gaussian=3.0,
                sxy_bilateral=sxy_b, srgb_bilateral=13.0,
                compat_bilateral=10.0,
            )
            unary = np.asarray(
                pp.unary_from_labels(jnp.asarray(labels), n_labels)
            )
            t0 = time.time()
            q_rgb = pp.crf_exact_dense(unary, image, **params)
            q_luma = pp.crf_exact_dense(
                unary, image, bilateral_features="luma", **params
            )
            t_oracle = time.time() - t0
            m_rgb = q_rgb.argmax(-1)
            m_luma = q_luma.argmax(-1)
            delta = m_rgb != labels  # pixels the oracle actually changed
            print(f"\n== {stem} {h}x{w} regime={regime} "
                  f"features={args.features} "
                  f"(sxy_b={sxy_b:.1f}, oracle {t_oracle:.0f}s, "
                  f"oracle changed {delta.mean():.2%} of pixels)")
            print(f"   luma-oracle vs rgb-oracle: "
                  f"agree_all={agreement(m_luma, m_rgb):.4f} "
                  f"agree_delta={agreement(m_luma, m_rgb, delta):.4f}")
            print(f"   {'step':>4} {'bins':>4} {'agree_all':>9} "
                  f"{'agree_delta':>11} {'q_mae':>8} {'vs_luma':>8}")
            for ss, nb in sweeps:
                if ss >= h // 2:
                    continue
                q_g = np.asarray(pp.crf_inference(
                    jnp.asarray(unary), jnp.asarray(image),
                    space_step=ss, n_bins=nb,
                    color_features=args.features, **params,
                ))
                m_g = q_g.argmax(-1)
                print(f"   {ss:>4} {nb:>4} "
                      f"{agreement(m_g, m_rgb):>9.4f} "
                      f"{agreement(m_g, m_rgb, delta):>11.4f} "
                      f"{np.abs(q_g - q_rgb).mean():>8.5f} "
                      f"{agreement(m_g, m_luma):>8.4f}")


if __name__ == "__main__":
    main()
