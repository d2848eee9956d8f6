#!/usr/bin/env python3
"""Visualize original PascalVOC instance annotations: bbox from
Annotations/<id>.xml + instance masks from SegmentationObject/<id>.png
(reference voc_visualize.py:65-129), with the same exceed-bbox sanity
check."""

import argparse
import os
import sys
import xml.etree.ElementTree as ET

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from tools.dataset_converter.instance_segment._viz import (  # noqa: E402
    apply_mask,
    draw_box_label,
    get_colors,
)


def voc_visualize(dataset_file: str, dataset_path: str,
                  output_path: str) -> int:
    with open(dataset_file) as f:
        image_ids = f.read().strip().split()
    os.makedirs(output_path, exist_ok=True)

    for image_id in image_ids:
        tree = ET.parse(
            os.path.join(dataset_path, "Annotations", image_id + ".xml")
        )
        objs = tree.findall("object")
        image = np.array(
            Image.open(
                os.path.join(dataset_path, "JPEGImages", image_id + ".jpg")
            ).convert("RGB")
        )
        mask = np.array(
            Image.open(
                os.path.join(dataset_path, "SegmentationObject",
                             image_id + ".png")
            )
        )
        colors = get_colors(len(objs))

        for i, obj in enumerate(objs):
            class_name = obj.find("name").text
            xml_box = obj.find("bndbox")
            box = tuple(
                int(float(xml_box.find(k).text))
                for k in ("xmin", "ymin", "xmax", "ymax")
            )
            draw_box_label(image, class_name, colors[i], box)

            # VOC SegmentationObject instance ids follow xml object order
            ys, xs = np.where(mask == i + 1)
            if len(ys) == 0:
                continue
            if (xs.min() < box[0] - 1 or ys.min() < box[1] - 1
                    or xs.max() > box[2] + 1 or ys.max() > box[3] + 1):
                print(f"in id {image_id}, instance segment outside the bbox")
            apply_mask(image, (mask == i + 1).astype(np.uint8), colors[i])

        Image.fromarray(image).save(
            os.path.join(output_path, image_id + ".jpg")
        )
    return len(image_ids)


def main():
    parser = argparse.ArgumentParser(
        description="Visualize bbox and instance segment label for "
        "PascalVOC dataset"
    )
    parser.add_argument("--dataset_file", required=True,
                        help="txt file listing image ids")
    parser.add_argument("--dataset_path", required=True,
                        help="VOCdevkit year root (Annotations/ JPEGImages/ "
                        "SegmentationObject/)")
    parser.add_argument("--output_path", required=True)
    args = parser.parse_args()
    n = voc_visualize(args.dataset_file, args.dataset_path, args.output_path)
    print(f"visualized {n} images into {args.output_path}")


if __name__ == "__main__":
    main()
