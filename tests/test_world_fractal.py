"""Texture-generalization gate: a SECOND synthetic world with natural-image
statistics.

All accuracy numbers elsewhere come from one procedural shape-world
(``tests/test_integration.py``). Real orthophotos cannot ship in-repo, but
natural imagery is characterized by its 1/f amplitude spectrum — this module
builds a multi-octave value-noise world (power-law spectrum, no geometric
primitives at all) and requires the bundled deep weights to localize on it
at the same 10 m gate. Passing here means the weights learned texture
matching, not the shape-world's rectangles/circles.
"""
import os

import cv2
import numpy as np
import pytest

import tests.test_integration as ti
from gisnav_tpu.weights import PRETRAINED_PATH

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(PRETRAINED_PATH),
                       reason="bundled weights not present"),
]

W_PX = ti.W_PX


def _make_fractal_world(seed=19, octaves=7):
    """1/f multi-octave value noise, u8. No shapes — pure spectral texture."""
    rng = np.random.default_rng(seed)
    acc = np.zeros((W_PX, W_PX), np.float32)
    amp = 1.0
    for o in range(octaves):
        n = max(2, W_PX >> (octaves - 1 - o))
        grid = rng.standard_normal((n, n)).astype(np.float32)
        up = cv2.resize(grid, (W_PX, W_PX), interpolation=cv2.INTER_CUBIC)
        acc += amp * up
        amp *= 0.55  # ~1/f amplitude falloff across octaves
    lo, hi = np.percentile(acc, [1, 99])
    world = np.clip((acc - lo) / (hi - lo), 0, 1)
    return (world * 255).astype(np.uint8)


WORLD_F = _make_fractal_world()


def _render_frame(world, lon, lat, alt_m, yaw_deg, k_cam):
    cx, cy = ti._lonlat_to_wpx(lon, lat)
    a = np.radians(yaw_deg)
    c, s = np.cos(a), np.sin(a)
    r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
    t = -r @ np.array([cx, cy, -alt_m / ti.M_PER_WPX])
    hm = k_cam @ np.stack([r[:, 0], r[:, 1], t], axis=1)
    return cv2.warpPerspective(world, hm, (640, 480))


class TestFractalWorld:
    def test_spectrum_is_power_law(self):
        """The generator must actually produce 1/f-ish statistics (guards
        the premise, not the pipeline)."""
        f = np.fft.fftshift(np.abs(np.fft.fft2(
            WORLD_F[:1024, :1024].astype(np.float32))))
        cy = cx = 512
        r1 = float(np.mean(f[cy - 8:cy + 8, cx - 8:cx + 8]))   # low freq
        ring = float(np.mean(f[cy - 256:cy + 256:16, cx - 256:cx + 256:16]))
        assert r1 > 10 * ring  # energy concentrated at low frequencies

    def test_deep_weights_localize_on_fractal_texture(self):
        from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
        from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
        from gisnav_tpu.pipeline.runners import make_deep_runner

        lat0, lon0 = 60.02, 24.03
        half_lon = 1400.0 / (111320 * np.cos(np.radians(60)))
        half_lat = 1400.0 / 110574
        bb = (lon0 - half_lon, lat0 - half_lat, lon0 + half_lon,
              lat0 + half_lat)
        x0, y0 = ti._lonlat_to_wpx(bb[0], bb[3])
        x1, y1 = ti._lonlat_to_wpx(bb[2], bb[1])
        crop = WORLD_F[int(y0):int(y1), int(x0):int(x1)]
        ortho = cv2.resize(crop, (1024, 1024), interpolation=cv2.INTER_AREA)
        aff = np.asarray(pixel_to_wgs84_affine(1024, 1024, *bb))
        dem = np.zeros((1024, 1024), np.float32)

        runner = make_deep_runner()
        results = []
        for yaw in (ti.YAW_DEG, 135.0):
            frame = _render_frame(WORLD_F, lon0, lat0, ti.ALT_M, yaw,
                                  ti.K_CAM)
            pose = runner(frame, ortho, dem, yaw, ti.K_CAM, aff,
                          altitude_agl=ti.ALT_M)
            out = geopose_to_wgs84_f64(pose, aff)
            horiz = haversine_m(lat0, lon0, out["lat"], out["lon"])
            results.append((yaw, bool(pose.valid), int(pose.num_inliers),
                            float(horiz)))
        for yaw, valid, inliers, horiz in results:
            assert valid, results
            assert horiz < 10.0, results
