"""Instance-segmentation dataset converters (reference
/root/reference/tools/dataset_converter/instance_segment/), rebuilt
pycocotools-free on tools.dataset_converter.instance_segment.coco_mask."""
