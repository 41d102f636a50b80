"""Edge-dominated (field-boundary) terrain gate for the production path.

Agricultural terrain is rank-1 structure: long low-contrast boundaries
between smooth regions, almost no 2D corners — classically the worst case
for corner detectors (the reference flew a detector-free LoFTR model for
this reason, BASELINE.md row 2). This world has ONLY coarse smooth noise +
sparse long boundary lines + sensor-scale grain; the production default
(learned_lg9 warp) must still localize inside the 10 m SITL gate.

Round-4 measured comparison on this world (CPU): learned_lg9 warp 164
inliers / 1.30 m; the 6k-step bundled LoFTR 3 matches / invalid — the
learned dense conv features extract edge structure the coarse dual-softmax
cells cannot (at the current semidense training budget), so the semidense
variant is NOT gated here; its e2e capability gate lives in
``test_envelope.py`` (shape world, passing).
"""
import cv2
import numpy as np
import pytest

from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
from gisnav_tpu.pipeline.runners import load_bundled, make_deep_runner
from gisnav_tpu.weights import LEARNED_LG9_PATH

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not __import__("os").path.exists(LEARNED_LG9_PATH),
                       reason="bundled weights not present"),
]

W_PX = 4096
M_PER_WPX = 5565.0 / W_PX


def _make_field_world(seed=11):
    rng = np.random.default_rng(seed)
    acc = np.zeros((W_PX, W_PX), np.float32)
    amp = 1.0
    for n in (4, 8, 16, 32):
        acc += amp * cv2.resize(
            rng.standard_normal((n, n)).astype(np.float32),
            (W_PX, W_PX), interpolation=cv2.INTER_CUBIC)
        amp *= 0.7
    lo, hi = np.percentile(acc, [1, 99])
    world = (np.clip((acc - lo) / (hi - lo), 0, 1) * 200 + 25).astype(
        np.uint8)
    # sparse long field-boundary edges (rank-1 structure, no corners)
    for _ in range(250):
        x0, y0 = (int(v) for v in rng.integers(0, W_PX, 2))
        ang = rng.uniform(0, np.pi)
        length = int(rng.integers(400, 2000))
        x1 = int(x0 + length * np.cos(ang))
        y1 = int(y0 + length * np.sin(ang))
        v = int(np.clip(world[min(y0, W_PX - 1), min(x0, W_PX - 1)]
                        * rng.uniform(0.85, 1.15), 0, 255))
        cv2.line(world, (x0, y0), (x1, y1), v, int(rng.integers(3, 14)))
    world = cv2.GaussianBlur(world, (5, 5), 1.2)
    world = np.clip(world.astype(np.float32)
                    + rng.normal(0, 2.5, world.shape), 0, 255)
    return world.astype(np.uint8)


def test_production_path_localizes_on_field_boundaries():
    world = _make_field_world()
    h, w, f = 480, 640, 400.0
    k_cam = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]],
                     np.float32)
    lat0, lon0 = 60.0, 24.0
    m_per_deg_lat = 111320.0
    m_per_deg_lon = m_per_deg_lat * np.cos(np.radians(lat0))
    alt = 500.0
    map_px = 800
    side_wpx = int(round(3.0 * alt * max(h, w) / f / M_PER_WPX))
    cx = cy = W_PX // 2
    x0, y0 = cx - side_wpx // 2, cy - side_wpx // 2
    ortho = cv2.resize(world[y0:y0 + side_wpx, x0:x0 + side_wpx],
                       (map_px, map_px), interpolation=cv2.INTER_AREA)
    gsd_lon = M_PER_WPX / m_per_deg_lon
    gsd_lat = M_PER_WPX / m_per_deg_lat
    left = lon0 - (cx - x0) * gsd_lon
    top = lat0 + (cy - y0) * gsd_lat
    aff = pixel_to_wgs84_affine(
        map_px, map_px, left, top - side_wpx * gsd_lat,
        left + side_wpx * gsd_lon, top)
    dem = np.zeros((map_px, map_px), np.float32)
    runner = make_deep_runner(*load_bundled("learned_lg9"))

    results = []
    for yaw in (15.0, 135.0):
        lon = lon0 + 40.0 / m_per_deg_lon
        lat = lat0 + 20.0 / m_per_deg_lat
        cxq = cx + (lon - lon0) / gsd_lon
        cyq = cy - (lat - lat0) / gsd_lat
        a = np.radians(yaw)
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        t = -r @ np.array([cxq, cyq, -alt / M_PER_WPX])
        hm = k_cam @ np.stack([r[:, 0], r[:, 1], t], axis=1)
        frame = cv2.warpPerspective(world, hm, (w, h))
        pose = runner(frame, ortho, dem, yaw, k_cam, aff,
                      map_stamp=1, altitude_agl=alt)
        out = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
        horiz = haversine_m(lat, lon, out["lat"], out["lon"])
        results.append((yaw, bool(pose.valid), int(pose.num_inliers),
                        round(float(horiz), 2)))
    bad = [r for r in results if not r[1] or r[3] >= 10.0]
    assert not bad, results
