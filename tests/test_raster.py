"""Parity tests for the fused raster warp vs cv2.warpAffine."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
from gisnav_tpu.raster import (
    compose_crs_after_warp,
    rotate_and_crop_center,
    rotation_about_center,
    warp_affine,
)


def _cv2_rotate_crop(image, angle_deg, crop_shape):
    """Reference-path rotate+crop (stereo_node.py:292-335 semantics)."""
    h, w = image.shape[:2]
    center = (w // 2, h // 2)
    m = cv2.getRotationMatrix2D(center, angle_deg, 1.0)
    rotated = cv2.warpAffine(image, m, (w, h))
    dx = center[0] - crop_shape[1] // 2
    dy = center[1] - crop_shape[0] // 2
    cropped = rotated[dy : dy + crop_shape[0], dx : dx + crop_shape[1]]
    inv = np.linalg.inv(np.vstack([m, [0, 0, 1]]))
    t = np.array([[1, 0, dx], [0, 1, dy], [0, 0, 1.0]])
    return cropped, inv @ t


class TestRotationMatrix:
    def test_matches_cv2(self):
        for angle in (0.0, 17.3, 90.0, -45.0, 180.0, 261.7):
            got = rotation_about_center(480, 640, angle)
            want = cv2.getRotationMatrix2D((640 // 2, 480 // 2), angle, 1.0)
            assert np.allclose(got, want, atol=1e-9), angle


class TestWarpAffine:
    @pytest.mark.parametrize("angle", [0.0, 33.0, 90.0, -120.5])
    def test_rotate_crop_matches_exact_bilinear(self, rng, angle):
        from scipy.ndimage import map_coordinates

        img = rng.integers(0, 255, size=(512, 512, 2), dtype=np.uint8)
        got, got_m = rotate_and_crop_center(jnp.asarray(img), angle, (360, 480))
        got = np.asarray(got)
        _, want_m = _cv2_rotate_crop(img, angle, (360, 480))
        assert got.shape == (360, 480, 2)
        assert np.allclose(got_m, want_m, atol=1e-5)
        # Exact float bilinear golden values via scipy (cv2 itself quantizes
        # coords to 1/32 px, so it is NOT an exact oracle on noise images)
        ys, xs = np.mgrid[0:360, 0:480]
        pts = np.stack([xs.ravel(), ys.ravel(), np.ones(xs.size)])
        src = np.asarray(got_m) @ pts
        # scipy zeroes any partially-outside sample while cv2 (and our warp)
        # blend with the zero border — compare only fully-interior samples
        interior = (
            (src[0] >= 0) & (src[0] <= 510) & (src[1] >= 0) & (src[1] <= 510)
        ).reshape(360, 480)
        assert interior.mean() > 0.5
        for ch in range(2):
            want = map_coordinates(
                img[:, :, ch].astype(np.float64),
                [src[1], src[0]],
                order=1,
                mode="constant",
                cval=0.0,
            ).reshape(360, 480)
            # kernel runs float32; allow f32 coordinate-precision slack
            assert np.abs(got[:, :, ch] - want)[interior].max() < 0.05

    def test_rotate_crop_matches_cv2_smooth(self, rng):
        # On a smooth image cv2's fixed-point interpolation agrees closely
        ys, xs = np.mgrid[0:512, 0:512]
        img = (128 + 100 * np.sin(xs / 40.0) * np.cos(ys / 55.0)).astype(np.uint8)
        img = img[..., None]
        want, _ = _cv2_rotate_crop(img, 33.0, (360, 480))
        got, _ = rotate_and_crop_center(jnp.asarray(img), 33.0, (360, 480))
        diff = np.abs(np.asarray(got)[2:-2, 2:-2, 0] - want[2:-2, 2:-2].astype(float))
        assert diff.mean() < 0.5
        assert np.percentile(diff, 99) <= 1.0

    def test_inverse_matrix_maps_points_back(self, rng):
        # A distinctive bright pixel must be traceable through the matrix
        img = np.zeros((512, 512, 1), dtype=np.float32)
        src_pt = (300, 200)  # x, y
        img[src_pt[1], src_pt[0], 0] = 255.0
        out, m = rotate_and_crop_center(jnp.asarray(img), 30.0, (256, 256))
        out = np.asarray(out)[:, :, 0]
        yx = np.unravel_index(np.argmax(out), out.shape)
        # map the cropped-frame location back to the original frame
        mapped = np.asarray(m) @ np.array([yx[1], yx[0], 1.0])
        assert np.hypot(mapped[0] - src_pt[0], mapped[1] - src_pt[1]) < 1.5

    def test_warp_affine_identity(self, rng):
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        out = warp_affine(jnp.asarray(img), jnp.eye(3), (64, 64))
        assert np.allclose(out, img, atol=1e-5)

    def test_jit_and_traced_angle(self, rng):
        img = jnp.asarray(rng.integers(0, 255, size=(256, 256, 2), dtype=np.uint8))

        @jax.jit
        def f(stack, angle):
            return rotate_and_crop_center(stack, angle, (128, 128))

        out1, m1 = f(img, 25.0)
        out2, m2 = f(img, 55.0)  # no retrace needed for new angle
        assert out1.shape == (128, 128, 2)
        assert not np.allclose(out1, out2)


class TestCRSComposition:
    def test_crs_still_maps_correctly_after_warp(self, rng):
        # Build a synthetic raster CRS, warp the raster, and verify that a
        # pixel in the warped frame maps to the same WGS84 coordinate as its
        # pre-image did under the original CRS.
        h = w = 512
        aff = pixel_to_wgs84_affine(h, w, left=24.0, bottom=60.0, right=24.1, top=60.1)
        img = jnp.asarray(rng.integers(0, 255, (h, w, 1), dtype=np.uint8))
        _, m = rotate_and_crop_center(img, 37.0, (256, 256))
        new_aff = compose_crs_after_warp(aff, np.asarray(m))

        pt_cropped = np.array([100.0, 50.0, 0.0, 1.0])
        # through the new affine directly
        lonlat_direct = new_aff @ pt_cropped
        # manual: cropped -> original pixels -> wgs84
        orig = np.asarray(m) @ np.array([100.0, 50.0, 1.0])
        lonlat_manual = aff @ np.array([orig[0], orig[1], 0.0, 1.0])
        assert np.allclose(lonlat_direct[:2], lonlat_manual[:2], atol=1e-12)
