"""Device raster preprocessing: fused rotate + center-crop + normalize."""
from gisnav_tpu.raster.warp import (  # noqa: F401
    compose_crs_after_warp,
    rotate_and_crop_center,
    rotation_about_center,
    warp_affine,
)
