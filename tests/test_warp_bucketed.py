"""Bucketed warp mode: warp-mode accuracy at cached-mode per-frame cost.

``make_bucketed_warp_runner`` quantizes the map-alignment rotation into
``bucket_deg`` buckets, caches the bucket-warped reference features, and
runs only the query through the extractor per frame (the TPU-first
equivalent of the reference's 45-degree rotation-bucket warp cache,
``stereo_node.py:222-267`` in hmakelin/gisnav). Two gates:

1. at bucket CENTERS the bucketed runner must agree with the exact warp
   runner (same warp angle -> same program inputs up to caching);
2. at bucket EDGES (worst-case residual rotation = bucket_deg/2) the fix
   must still clear the 10 m SITL gate — the residual is absorbed by the
   matcher, and this is the accuracy price of leaving the map trunk out
   of the hot path.
"""
import cv2
import numpy as np
import pytest

import tests.test_integration as ti
from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
from gisnav_tpu.pipeline.runners import (
    load_bundled,
    make_bucketed_warp_runner,
    make_deep_runner,
)

pytestmark = pytest.mark.slow

H, W, F = 480, 640, 400.0
ALT = 500.0
K_CAM = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]], np.float32)
LAT0, LON0 = 60.028, 24.045
BUCKET = 15.0


@pytest.fixture(scope="module")
def setup():
    params, cfg = load_bundled("learned_lg9")
    bucketed = make_bucketed_warp_runner(params, cfg, bucket_deg=BUCKET)
    exact = make_deep_runner(params, cfg)

    map_px = 800
    side_wpx = int(round(3.0 * ALT * max(H, W) / F / ti.M_PER_WPX))
    cx, cy = ti._lonlat_to_wpx(LON0, LAT0)
    x0, y0 = int(cx - side_wpx / 2), int(cy - side_wpx / 2)
    crop = ti.WORLD[y0:y0 + side_wpx, x0:x0 + side_wpx]
    ortho = cv2.resize(crop, (map_px, map_px), interpolation=cv2.INTER_AREA)
    left = ti.LEFT + x0 * ti.GSD_LON
    top = ti.TOP - y0 * ti.GSD_LAT
    aff = pixel_to_wgs84_affine(
        map_px, map_px, left, top - side_wpx * ti.GSD_LAT,
        left + side_wpx * ti.GSD_LON, top)
    dem = np.zeros((map_px, map_px), np.float32)
    return bucketed, exact, ortho, dem, aff


def _fly(runner, ortho, dem, aff, yaw, stamp):
    lon = LON0 + 0.0004 * np.cos(np.radians(yaw))
    lat = LAT0 + 0.0002 * np.sin(np.radians(yaw))
    frame = ti._render_frame(lon, lat, ALT, yaw)
    pose = runner(frame, ortho, dem, yaw, K_CAM, aff,
                  map_stamp=stamp, altitude_agl=ALT)
    out = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
    horiz = haversine_m(lat, lon, out["lat"], out["lon"])
    return pose, float(horiz)


def test_bucket_center_matches_exact_warp(setup):
    """At a bucket center the bucketed and exact runners warp at the SAME
    angle; fixes must agree to sub-meter (caching must not change math)."""
    bucketed, exact, ortho, dem, aff = setup
    yaw = 2 * BUCKET  # exactly a bucket center
    p_b, h_b = _fly(bucketed, ortho, dem, aff, yaw, stamp=1)
    p_e, h_e = _fly(exact, ortho, dem, aff, yaw, stamp=1)
    assert bool(p_b.valid) and bool(p_e.valid), (h_b, h_e)
    assert abs(h_b - h_e) < 1.0, (h_b, h_e)
    assert h_b < 10.0


def test_bucket_edges_pass_sitl_gate(setup):
    """Worst-case residual rotation (bucket_deg/2 off every bucket center)
    across the compass must still clear the 10 m gate."""
    bucketed, _, ortho, dem, aff = setup
    rows = []
    for yaw in (BUCKET / 2, 90 + BUCKET / 2, 187.5, 277.5):
        pose, horiz = _fly(bucketed, ortho, dem, aff, yaw, stamp=2)
        rows.append((yaw, bool(pose.valid), int(pose.num_inliers),
                     round(horiz, 2)))
    bad = [r for r in rows if not r[1] or r[3] >= 10.0]
    assert not bad, rows


def test_bucket_cache_reuse(setup):
    """Frames within one bucket reuse the cached reference features (the
    hot path must not silently re-extract): two nearby yaws in the same
    bucket give valid fixes and identical cached m_crop objects."""
    bucketed, _, ortho, dem, aff = setup
    p1, h1 = _fly(bucketed, ortho, dem, aff, 30.0 - 4.0, stamp=3)
    p2, h2 = _fly(bucketed, ortho, dem, aff, 30.0 + 4.0, stamp=3)
    assert bool(p1.valid) and bool(p2.valid)
    assert h1 < 10.0 and h2 < 10.0
    # same bucket -> identical crop affine (cached, not recomputed)
    np.testing.assert_array_equal(np.asarray(p1.m_crop),
                                  np.asarray(p2.m_crop))


def test_bucket_edge_survives_cast_shadows(setup, rng):
    """The production default must keep its appearance robustness with the
    bucketed cache: the hardest battery scenario (cast shadows between
    query and map, tests/test_world_appearance.py) at a worst-case
    bucket-edge yaw must still clear the gate."""
    from tests.test_world_appearance import _sun_shadows

    bucketed, _, ortho, dem, aff = setup
    yaw = 3 * BUCKET + BUCKET / 2
    lon = LON0 + 0.0004 * np.cos(np.radians(yaw))
    lat = LAT0 + 0.0002 * np.sin(np.radians(yaw))
    frame = _sun_shadows(ti._render_frame(lon, lat, ALT, yaw), rng)
    pose = bucketed(frame, ortho, dem, yaw, K_CAM, aff,
                    map_stamp=9, altitude_agl=ALT)
    out = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
    horiz = float(haversine_m(lat, lon, out["lat"], out["lon"]))
    assert bool(pose.valid) and horiz < 10.0, (horiz, int(pose.num_inliers))


def test_pose_node_default_mode_is_bucketed():
    """PoseNode(backend=deep) with no deep_mode param wires the bucketed
    warp runner (the production default the headline bench measures)."""
    from gisnav_tpu.nodes.bus import LocalBus
    from gisnav_tpu.nodes.pose_node import PoseNode

    node = PoseNode(LocalBus(), params={
        "backend": "deep", "weights": "harris_lg5"})
    assert node._deep_runner is not None
    assert "make_bucketed_warp_runner" in (
        node._deep_runner.__qualname__)
