#!/usr/bin/env python3
"""Demo/inference CLI — TPU-native counterpart of /root/reference/deeplab.py.

Interactive single-image segmentation, batch image mode, and video mode,
with optional CRF refinement and model dump.

Examples:
  python deeplab.py --model_type=mobilenetv2_lite \
      --weights_path=logs/000/trained_final.ckpt \
      --classes_path=configs/voc_classes.txt --image
  python deeplab.py ... --input=video.mp4 --output=out.mp4
"""

import argparse

from PIL import Image

from deeplabv3p_tpu.inference import DeepLab


def segment_img_loop(deeplab: DeepLab, output_path=None):
    """Interactive image loop (reference deeplab.py:175-185)."""
    import os

    while True:
        try:
            img_path = input("Input image filename:")
        except EOFError:
            # stdin closed — filenames were piped in; exit cleanly
            return
        try:
            image = Image.open(img_path).convert("RGB")
        except Exception:
            print("Open Error! Try again!")
            continue
        result = deeplab.segment_image(image)
        result.show()
        if output_path:
            os.makedirs(output_path, exist_ok=True)
            result.save(
                os.path.join(output_path, os.path.basename(img_path))
            )


def parse_input_shape(spec):
    parts = str(spec).lower().split("x")
    if len(parts) == 1:
        v = int(parts[0])
        return (v, v)
    return (int(parts[0]), int(parts[1]))


def main(args):
    from deeplabv3p_tpu.utils.compile_cache import enable_compilation_cache
    from deeplabv3p_tpu.utils.device import apply_device_arg

    apply_device_arg(args)
    enable_compilation_cache()
    deeplab = DeepLab(
        model_type=args.model_type,
        classes_path=args.classes_path,
        model_input_shape=parse_input_shape(args.model_input_shape),
        output_stride=args.output_stride,
        weights_path=args.weights_path,
        do_crf=args.do_crf,
    )
    if args.dump_model:
        # reference dump_model_file (deeplab.py:112-120): the inference
        # interchange artifact. '.shlo' exports the full program
        # (StableHLO, weights baked in); '.ckpt' saves the variables.
        if args.output_model_file.endswith(".shlo"):
            from deeplabv3p_tpu.export.stablehlo import (
                export_model,
                save_exported,
            )

            exported = export_model(
                deeplab.model, deeplab.variables,
                deeplab.model_input_shape,
            )
            save_exported(exported, args.output_model_file)
        else:
            from deeplabv3p_tpu.utils.checkpoint import save_variables

            save_variables(args.output_model_file, deeplab.variables)
        print(f"dumped inference model to {args.output_model_file}")
        return
    if args.image:
        segment_img_loop(deeplab, args.output)
    elif args.input:
        deeplab.segment_video(args.input, args.output)
    else:
        raise SystemExit("specify --image, --input, or --dump_model")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_type", default="mobilenetv2_lite")
    p.add_argument("--weights_path", default=None)
    p.add_argument("--classes_path", default="configs/voc_classes.txt")
    p.add_argument("--model_input_shape", default="512x512",
                   help="HxW (e.g. 512x512 or 1024x512) or a single int")
    p.add_argument("--output_stride", type=int, default=16, choices=[8, 16, 32])
    p.add_argument("--do_crf", action="store_true")
    p.add_argument("--image", action="store_true", help="interactive image mode")
    p.add_argument("--input", default=None, help="video path or '0' for webcam")
    p.add_argument("--output", default=None)
    p.add_argument("--dump_model", action="store_true")
    p.add_argument("--output_model_file", default="inference.ckpt")
    from deeplabv3p_tpu.utils.device import add_device_arg

    add_device_arg(p)
    return p.parse_args()


if __name__ == "__main__":
    main(parse_args())
