"""Photometric-appearance generalization gate (synthetic->real proxy).

The reference's accuracy table was measured on REAL NAIP orthoimagery whose
query/map pairs differ in appearance: sun-angle shadows, seasonal tone,
JPEG compression, sensor noise, and temporal scene change
(``test/sitl/ulog_analysis/variance_estimation.ipynb`` in hmakelin/gisnav
reports 3.8-5.3 m real-imagery errors). Real rasters cannot ship in-repo,
so this battery perturbs the QUERY side of the shared synthetic world with
each of those appearance factors while the map stays clean — the bundled
production weights must still localize inside the 10 m SITL gate
(``sitl_px4.py:263-280``). Passing here means the matcher tolerates the
appearance gaps real flights exhibit, not just pixel-identical rendering.

One cached-runner compile is shared across all scenarios (the frames all
have the validated 640x480 shape), so the whole battery costs one compile
plus ~12 inference calls.
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

ALT = 500.0
YAWS = (30.0, 135.0)
H, W, F = 480, 640, 400.0
K_CAM = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]], np.float32)
LAT0, LON0 = 60.025, 24.04


def _seasonal_tone(img, rng):
    """Seasonal/radiometric shift: gamma + contrast + brightness offset."""
    x = img.astype(np.float32) / 255.0
    x = np.power(x, 1.35)            # gamma (drier season, darker canopy)
    x = 0.8 * x + 0.12               # contrast compression + haze lift
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def _sun_shadows(img, rng):
    """Sun-angle appearance: sparse directional cast shadows + shading.

    Real orthoimagery has cast shadows next to the minority of TALL
    structures (buildings, trees), not beside every contrast edge — a
    sparse set of sun-vector-offset dark quads models that (phantom dark
    shapes adjacent to real ones), plus a smooth multiplicative
    illumination field (terrain/cloud shading). Affects ~5-8% of pixels.
    """
    h, w = img.shape
    cast = np.zeros((h, w), np.float32)
    for _ in range(25):
        x, y = int(rng.integers(0, w - 70)), int(rng.integers(0, h - 70))
        sx = int(rng.integers(14, 50))
        sy = int(rng.integers(14, 50))
        # shadow quad NE of an imagined structure (sun az 225 deg)
        cv2.rectangle(cast, (x + 8, y - 8 if y >= 8 else 0),
                      (x + 8 + sx, y - 8 + sy), 1.0, -1)
    cast = cv2.GaussianBlur(cast, (0, 0), 1.5)
    shade = np.ones((h, w), np.float32)
    for n, amp in ((6, 0.08), (24, 0.06)):
        field = rng.standard_normal((n, n)).astype(np.float32)
        shade += amp * cv2.resize(field, (w, h),
                                  interpolation=cv2.INTER_CUBIC)
    out = img.astype(np.float32) * np.clip(shade, 0.8, 1.15)
    out *= (1.0 - 0.4 * np.clip(cast, 0, 1))
    return np.clip(out, 0, 255).astype(np.uint8)


def _jpeg(img, rng, quality=40):
    ok, buf = cv2.imencode(".jpg", img,
                           [int(cv2.IMWRITE_JPEG_QUALITY), quality])
    assert ok
    return cv2.imdecode(buf, cv2.IMREAD_GRAYSCALE)


def _sensor_noise(img, rng):
    """Readout noise + mild optical blur (small-sensor UAV camera)."""
    x = cv2.GaussianBlur(img, (0, 0), 0.7).astype(np.float32)
    x += rng.normal(0.0, 6.0, img.shape).astype(np.float32)
    return np.clip(x, 0, 255).astype(np.uint8)


def _temporal_change(img, rng):
    """Scene change since map capture: ~5% of the frame repainted."""
    out = img.copy()
    h, w = out.shape
    for _ in range(6):
        x, y = int(rng.integers(0, w - 60)), int(rng.integers(0, h - 60))
        s = int(rng.integers(20, 60))
        v = int(rng.integers(0, 256))
        cv2.rectangle(out, (x, y), (x + s, y + s), v, -1)
    return out


SCENARIOS = {
    "seasonal_tone": _seasonal_tone,
    "sun_shadows": _sun_shadows,
    "jpeg_q40": _jpeg,
    "sensor_noise": _sensor_noise,
    "temporal_change": _temporal_change,
}


@pytest.fixture(scope="module")
def setup():
    """Shared map + compiled PRODUCTION runner (learned_lg9, warp mode —
    the cli.py run default) for every scenario."""
    from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
    from gisnav_tpu.pipeline.runners import load_bundled, make_deep_runner

    params, cfg = load_bundled("learned_lg9")
    runner = make_deep_runner(params, cfg)

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
    return runner, ortho, dem, aff


def _fly(runner, ortho, dem, aff, transform, rng):
    from gisnav_tpu.geometry.crs import haversine_m
    from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64

    rows = []
    for yaw in YAWS:
        lon = LON0 + 0.0004 * np.cos(np.radians(yaw))
        lat = LAT0 + 0.0002 * np.sin(np.radians(yaw))
        cxq, cyq = ti._lonlat_to_wpx(lon, lat)
        a = np.radians(yaw)
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        t = -r @ np.array([cxq, cyq, -ALT / ti.M_PER_WPX])
        hm = K_CAM @ np.stack([r[:, 0], r[:, 1], t], axis=1)
        frame = cv2.warpPerspective(ti.WORLD, hm, (W, H))
        frame = transform(frame, rng)
        assert frame.shape == (H, W) and frame.dtype == np.uint8
        # warp mode: pass the map-alignment rotation (= +yaw for this
        # renderer; nodes/pose_node.py _rotation_deg) and altitude for
        # the GSD-matched crop
        pose = runner(frame, ortho, dem, yaw, K_CAM, aff,
                      map_stamp=1, altitude_agl=ALT)
        out = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
        horiz = haversine_m(lat, lon, out["lat"], out["lon"])
        rows.append((yaw, bool(pose.valid), int(pose.num_inliers),
                     round(float(horiz), 2)))
    return rows


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_appearance_scenario(setup, name, rng):
    runner, ortho, dem, aff = setup
    rows = _fly(runner, ortho, dem, aff, SCENARIOS[name], rng)
    bad = [r for r in rows if not r[1] or r[3] >= 10.0]
    assert not bad, (name, rows)


def test_harris_cached_shadow_brittleness_documented(rng):
    """The small-config harris path is KNOWN-brittle to cast shadows:
    the parameter-free Harris detector spends its budget on shadow-edge
    corners (measured: 512 -> 144 keypoints, 77% on shadow pixels; 1
    inlier). The production default (learned detector + warp, gated above)
    survives the same scenario with >140 inliers. This test pins the
    *documented* behavior so a silent fix or regression is noticed; if it
    starts passing, promote harris into the strict gate above.
    """
    from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine
    from gisnav_tpu.pipeline.runners import (
        load_bundled,
        make_cached_deep_runner,
    )

    params, cfg = load_bundled("harris_lg5")
    runner = make_cached_deep_runner(params, cfg)
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
    rows = _fly(runner, ortho, dem, aff, SCENARIOS["sun_shadows"], rng)
    bad = [r for r in rows if not r[1] or r[3] >= 10.0]
    if not bad:
        pytest.fail(
            "harris cached now PASSES sun_shadows — promote it into the "
            f"strict appearance gate: {rows}")


def test_perturbations_actually_perturb(rng):
    """Guard the premise: each transform changes the image materially
    (else the battery silently tests nothing)."""
    frame = ti.WORLD[2000:2480, 2000:2640].copy()
    for name, tr in SCENARIOS.items():
        out = tr(frame, np.random.default_rng(7))
        delta = float(np.mean(np.abs(out.astype(np.float32)
                                     - frame.astype(np.float32))))
        # >1 gray level mean-abs change; JPEG on the piecewise-flat world
        # sits near the floor (flat regions compress losslessly)
        assert delta > 1.0, (name, delta)
        assert out.shape == frame.shape
