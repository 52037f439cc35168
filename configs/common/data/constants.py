# Shared data constants (reference: configs/common/data/constants.py — the
# detectron2 pixel statistics used by every model tree).
constants = dict(
    imagenet_rgb256_mean=[123.675, 116.28, 103.53],
    imagenet_rgb256_std=[58.395, 57.12, 57.375],
    imagenet_bgr256_mean=[103.53, 116.28, 123.675],
    imagenet_bgr256_std=[1.0, 1.0, 1.0],
)
