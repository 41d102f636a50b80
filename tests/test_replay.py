"""Offline replay harness: dataset loading + end-to-end localization.

The harness (``gisnav_tpu/replay.py``) is the stand-in for the reference's
ULog error analysis (``test/sitl/ulog_analysis/variance_estimation.ipynb``):
it accepts a directory of (frame, pose) pairs + a georeferenced orthophoto
and reports per-axis error statistics. These tests generate a dataset from
the synthetic world and assert the deep runner localizes through the full
tool path (file formats included).
"""
import csv
import json
import os

import cv2
import numpy as np
import pytest

import tests.test_integration as ti
from gisnav_tpu.replay import load_dataset, replay, summarize


def _write_dataset(root, n_frames=6, alt=500.0, yaw=25.0):
    """Render a replay dataset from the synthetic world."""
    h, w, f = 480, 640, 400.0
    k_cam = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    lat0, lon0 = 60.025, 24.04

    # orthophoto: production-sized window (3x FOV, camera-diagonal px)
    diag_px = float(np.hypot(h, w))
    map_px = int(np.ceil(diag_px / 8)) * 8
    side_wpx = int(round(3.0 * alt * max(h, w) / f / ti.M_PER_WPX))
    cx, cy = ti._lonlat_to_wpx(lon0, lat0)
    x0, y0 = int(cx - side_wpx / 2), int(cy - side_wpx / 2)
    crop = ti.WORLD[y0:y0 + side_wpx, x0:x0 + side_wpx]
    ortho = cv2.resize(crop, (map_px, map_px), interpolation=cv2.INTER_AREA)
    cv2.imwrite(os.path.join(root, "map.png"), ortho)
    with open(os.path.join(root, "map.json"), "w") as fh:
        json.dump({
            "left": ti.LEFT + x0 * ti.GSD_LON,
            "top": ti.TOP - y0 * ti.GSD_LAT,
            "right": ti.LEFT + (x0 + side_wpx) * ti.GSD_LON,
            "bottom": ti.TOP - (y0 + side_wpx) * ti.GSD_LAT,
            "dem": 0.0,
        }, fh)
    with open(os.path.join(root, "camera.json"), "w") as fh:
        json.dump({"k": k_cam.tolist(), "width": w, "height": h}, fh)

    os.makedirs(os.path.join(root, "frames"))
    rows = []
    for i in range(n_frames):
        stamp = 1_000_000 + i * 500_000
        lon = lon0 + 1e-4 * i
        lat = lat0 + 5e-5 * i
        cxq, cyq = ti._lonlat_to_wpx(lon, lat)
        a = np.radians(yaw)
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        t = -r @ np.array([cxq, cyq, -alt / ti.M_PER_WPX])
        hm = k_cam @ np.stack([r[:, 0], r[:, 1], t], axis=1)
        frame = cv2.warpPerspective(ti.WORLD, hm, (w, h))
        cv2.imwrite(os.path.join(root, "frames", f"{stamp}.png"), frame)
        rows.append({"stamp_us": stamp, "lon": lon, "lat": lat,
                     "alt_ellipsoid_m": alt, "yaw_deg": yaw})
    with open(os.path.join(root, "poses.csv"), "w", newline="") as fh:
        wtr = csv.DictWriter(fh, fieldnames=list(rows[0]))
        wtr.writeheader()
        wtr.writerows(rows)
    return root


class TestLoadDataset:
    def test_roundtrip(self, tmp_path):
        _write_dataset(str(tmp_path), n_frames=2)
        ds = load_dataset(str(tmp_path))
        assert ds["ortho"].ndim == 2
        assert ds["dem"].shape == ds["ortho"].shape
        assert (ds["dem"] == 0).all()
        assert len(ds["poses"]) == 2
        assert ds["image_size"] == (480, 640)

    def test_missing_frame_raises(self, tmp_path):
        _write_dataset(str(tmp_path), n_frames=2)
        os.remove(os.path.join(tmp_path, "frames", "1000000.png"))
        with pytest.raises(FileNotFoundError):
            load_dataset(str(tmp_path))

    def test_dem_image(self, tmp_path):
        _write_dataset(str(tmp_path), n_frames=1)
        dem = np.full((8, 8), 7, np.uint8)
        cv2.imwrite(os.path.join(tmp_path, "dem.png"), dem)
        meta = json.load(open(os.path.join(tmp_path, "map.json")))
        meta["dem"] = "dem.png"
        meta["dem_scale"] = 2.0
        json.dump(meta, open(os.path.join(tmp_path, "map.json"), "w"))
        ds = load_dataset(str(tmp_path))
        assert float(ds["dem"][0, 0]) == 14.0


@pytest.mark.slow
class TestReplayEndToEnd:
    def test_localizes_on_rendered_flight(self, tmp_path):
        _write_dataset(str(tmp_path), n_frames=4)
        report = replay(
            str(tmp_path), weights="harris_lg5", prior="previous",
            fused=True,
        )
        summary = summarize(report)
        assert summary["frames"] == 4
        # the synthetic flight must localize through the FILE-BASED path
        # exactly as the in-memory e2e suite does
        assert summary["valid"] >= 3
        assert summary["pass_10m"] >= 3
        assert summary["mean_horiz_m"] < 10.0
        assert "mean_abs_east_m" in summary
        assert "mean_horiz_150_800m_agl" in summary
        # the UKF-fused track (the reference evaluates EKF2 output) must
        # track at least as tightly once initialized
        assert summary["fused_frames"] >= 3
        assert summary["fused_mean_horiz_m"] < 10.0

    def test_classical_backend_localizes(self, tmp_path):
        """The host-SIFT classical backend (the reference's CPU config)
        through the same file-based harness."""
        _write_dataset(str(tmp_path), n_frames=3)
        report = replay(str(tmp_path), backend="classical")
        summary = summarize(report)
        assert summary["valid"] >= 2
        assert summary["mean_horiz_m"] < 10.0
