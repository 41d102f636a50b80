"""Tests for the 3-shear rotation path (jnp fallback; Pallas runs on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gisnav_tpu.raster import rotate_and_crop_center
from gisnav_tpu.raster.shear import rotate_and_crop_center_shear


def _smooth(n=512):
    ys, xs = np.mgrid[0:n, 0:n]
    img = (
        128 + 80 * np.sin(xs / 37.0) * np.cos(ys / 53.0)
        + 40 * np.sin((xs + ys) / 23.0)
    ).astype(np.float32)
    return np.stack([img, img * 0.5], axis=-1)


class TestShearRotation:
    @pytest.mark.parametrize("angle", [0.0, 30.0, -30.0, 45.0, 117.0, -135.0,
                                       350.0])
    def test_matches_gather_on_smooth(self, angle):
        stack = jnp.asarray(_smooth())
        a, ma = rotate_and_crop_center_shear(stack, angle, (256, 320),
                                             use_pallas=False)
        b, mb = rotate_and_crop_center(stack, angle, (256, 320))
        assert np.allclose(np.asarray(ma), np.asarray(mb), atol=1e-4)
        a, b = np.asarray(a), np.asarray(b)
        mask = (a != 0) & (b != 0)
        d = np.abs(a - b)[mask]
        assert d.mean() < 0.2, (angle, d.mean())
        assert np.percentile(d, 99) < 1.0, angle

    @pytest.mark.parametrize("angle", [90.0, 180.0, 270.0, -90.0])
    def test_right_angles_exact(self, angle):
        rng = np.random.default_rng(0)
        stack = jnp.asarray(rng.uniform(0, 255, (512, 512, 2)).astype(np.float32))
        a, _ = rotate_and_crop_center_shear(stack, angle, (256, 320),
                                            use_pallas=False)
        b, _ = rotate_and_crop_center(stack, angle, (256, 320))
        # rot90 itself is interpolation-free; the residual zero-shift shear
        # contributes only f32 frac-rounding noise (~1e-5 of the local
        # gradient)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 0.05

    def test_traced_angle_single_compile(self):
        stack = jnp.asarray(_smooth(256))
        f = jax.jit(lambda s, a: rotate_and_crop_center_shear(
            s, a, (128, 128), use_pallas=False))
        o1, _ = f(stack, jnp.float32(10.0))
        o2, _ = f(stack, jnp.float32(100.0))
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_keypoint_geometry_contract(self):
        # a bright dot must land where the inverse matrix says it does
        img = np.zeros((512, 512, 1), np.float32)
        img[200, 300, 0] = 255.0
        out, m = rotate_and_crop_center_shear(jnp.asarray(img), 30.0,
                                              (256, 256), use_pallas=False)
        out = np.asarray(out)[:, :, 0]
        yx = np.unravel_index(np.argmax(out), out.shape)
        mapped = np.asarray(m) @ np.array([yx[1], yx[0], 1.0])
        assert np.hypot(mapped[0] - 300, mapped[1] - 200) < 2.0
