"""Device raster preprocessing: fused rotate + center-crop + normalize."""
from gisnav_tpu.raster.shear import (  # noqa: F401
    rotate_and_crop_center_shear,
)
from gisnav_tpu.raster.warp import (  # noqa: F401
    compose_crs_after_warp,
    rotate_and_crop_center,
    rotation_about_center,
    warp_affine,
)


def rotate_and_crop_auto(stack, angle_deg, crop_shape, zoom=None):
    """Pick the fastest correct rotate+crop for the current backend: the
    Pallas 3-shear path on TPU for square rasters (~68x faster than the XLA
    gather warp), the exact bilinear gather elsewhere. ``zoom`` (GSD-matched
    resampling) forces the gather path (the 3-shear kernel is
    rotation-only); the crop-sized gather is cheap."""
    import jax

    if zoom is not None:
        return rotate_and_crop_center(stack, angle_deg, crop_shape, zoom)
    if (
        jax.default_backend() not in ("cpu",)
        and stack.shape[0] == stack.shape[1]
        and stack.shape[0] % 128 == 0
    ):
        return rotate_and_crop_center_shear(stack, angle_deg, crop_shape)
    return rotate_and_crop_center(stack, angle_deg, crop_shape)
