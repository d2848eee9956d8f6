"""Model zoo: DeepLabV3+ (7 backbone families × full/lite heads), UNet, Fast-SCNN."""
