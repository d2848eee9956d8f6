#!/usr/bin/env python3
"""Edge detection on segmentation label masks.

Port of /root/reference/tools/misc/edge_detect.py: extracts class-boundary
edges from label PNGs (canny / sobel / laplacian / gaussian-diff) — used
to build edge-auxiliary supervision data or inspect label quality.
"""

import argparse
import glob
import os

import numpy as np
from PIL import Image

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def canny_edge(image):
    blurred = cv2.GaussianBlur(image, (11, 11), 0)
    return cv2.Canny(blurred, 10, 50, apertureSize=3, L2gradient=False)


def gaussian_edge(image):
    blurred = cv2.GaussianBlur(image, (11, 11), 0)
    edge = image - blurred
    _, edge = cv2.threshold(edge, 127, 255, cv2.THRESH_BINARY)
    return edge


def sobel_edge(image):
    sx = cv2.convertScaleAbs(cv2.Sobel(image, cv2.CV_64F, 1, 0, ksize=3))
    sy = cv2.convertScaleAbs(cv2.Sobel(image, cv2.CV_64F, 0, 1, ksize=3))
    edge = cv2.addWeighted(sx, 0.5, sy, 0.5, 0)
    _, edge = cv2.threshold(edge, 100, 255, cv2.THRESH_BINARY)
    return edge


def laplacian_edge(image):
    lap = cv2.convertScaleAbs(cv2.Laplacian(image, cv2.CV_8U, ksize=3))
    _, edge = cv2.threshold(lap, 80, 255, cv2.THRESH_BINARY)
    return edge


EDGE_FNS = {
    "canny": canny_edge,
    "gaussian": gaussian_edge,
    "sobel": sobel_edge,
    "laplacian": laplacian_edge,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_path", required=True,
                   help="dir of label PNGs (or single file)")
    p.add_argument("--output_path", required=True)
    p.add_argument("--edge_type", default="sobel", choices=sorted(EDGE_FNS))
    args = p.parse_args()
    if cv2 is None:
        raise SystemExit("edge_detect requires cv2")

    files = (
        [args.input_path] if os.path.isfile(args.input_path)
        else sorted(glob.glob(os.path.join(args.input_path, "*.png")))
    )
    os.makedirs(args.output_path, exist_ok=True)
    fn = EDGE_FNS[args.edge_type]
    for f in files:
        label = np.array(Image.open(f).convert("L"))
        edge = fn(label)
        Image.fromarray(edge).save(
            os.path.join(args.output_path, os.path.basename(f))
        )
    print(f"saved {len(files)} edge maps to {args.output_path}")


if __name__ == "__main__":
    main()
