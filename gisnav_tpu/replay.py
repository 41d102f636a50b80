"""Offline replay harness: recorded frames + ground truth -> error report.

The reference validated on real NAIP orthophotos + USGS DEM by flying PX4
SITL and post-processing ULogs
(``test/sitl/ulog_analysis/variance_estimation.ipynb`` in hmakelin/gisnav,
the source of BASELINE.md's error table). This module is the equivalent that
needs no simulator: given a directory of recorded camera frames, a
ground-truth pose log and a georeferenced orthophoto, it runs the production
deep runner frame by frame and reports the same statistics the notebook
computes (per-axis mean/std error, per-frame 10 m gate, error vs altitude).

Dataset layout (all paths relative to the dataset directory)::

    map.png        north-up grayscale orthophoto (any cv2-readable format)
    map.json       {"left": lon, "bottom": lat, "right": lon, "top": lat,
                    "dem": "dem.png" | constant_meters (optional, default 0),
                    "dem_scale": meters_per_unit (optional, default 1.0)}
    camera.json    {"k": 3x3 intrinsics, "width": int, "height": int}
    poses.csv      header stamp_us,lon,lat,alt_ellipsoid_m[,yaw_deg]
    frames/        <stamp_us>.png per pose row

GeoTIFF users: export with ``gdal_translate -of PNG`` and put the bounds in
``map.json`` (``gdalinfo`` prints them); the harness deliberately avoids a
GDAL/rasterio dependency.
"""
from __future__ import annotations

import csv
import dataclasses
import json
import os
from typing import Dict, List, Optional

import cv2
import numpy as np

__all__ = ["load_dataset", "replay", "summarize"]


def load_dataset(path: str) -> Dict:
    """Load and validate a replay dataset directory."""
    with open(os.path.join(path, "map.json")) as f:
        map_meta = json.load(f)
    ortho = cv2.imread(os.path.join(path, "map.png"), cv2.IMREAD_GRAYSCALE)
    if ortho is None:
        raise FileNotFoundError(f"no readable map.png under {path}")
    dem_spec = map_meta.get("dem", 0.0)
    dem_scale = float(map_meta.get("dem_scale", 1.0))
    if isinstance(dem_spec, str):
        dem = cv2.imread(os.path.join(path, dem_spec), cv2.IMREAD_UNCHANGED)
        if dem is None:
            raise FileNotFoundError(f"map.json names dem {dem_spec!r} but it "
                                    f"is not readable under {path}")
        dem = dem.astype(np.float32) * dem_scale
    else:
        dem = np.full(ortho.shape[:2], float(dem_spec) * dem_scale,
                      np.float32)
    with open(os.path.join(path, "camera.json")) as f:
        cam = json.load(f)
    k = np.asarray(cam["k"], np.float32)
    rows: List[Dict] = []
    with open(os.path.join(path, "poses.csv")) as f:
        for row in csv.DictReader(f):
            rows.append({
                "stamp_us": int(row["stamp_us"]),
                "lon": float(row["lon"]),
                "lat": float(row["lat"]),
                "alt": float(row["alt_ellipsoid_m"]),
                "yaw_deg": float(row.get("yaw_deg") or 0.0),
            })
    if not rows:
        raise ValueError(f"poses.csv under {path} has no rows")
    frames_dir = os.path.join(path, "frames")
    for r in rows:
        r["frame_path"] = os.path.join(frames_dir, f"{r['stamp_us']}.png")
        if not os.path.exists(r["frame_path"]):
            raise FileNotFoundError(r["frame_path"])
    return {
        "ortho": ortho,
        "dem": dem,
        "bounds": (float(map_meta["left"]), float(map_meta["bottom"]),
                   float(map_meta["right"]), float(map_meta["top"])),
        "k": k,
        "image_size": (int(cam["height"]), int(cam["width"])),
        "poses": rows,
    }


def replay(
    path: str,
    weights: str = "learned_lg9",
    backend: str = "deep",
    prior: str = "previous",
    max_keypoints: Optional[int] = None,
    lightglue_depth: Optional[int] = None,
    fused: bool = False,
    progress=None,
) -> Dict:
    """Run the production runner over a dataset; return per-frame results.

    :param prior: position-prior mode — ``none`` (no gating), ``previous``
        (last valid estimate, production-like dead reckoning), ``truth``
        (ground truth; upper-bounds what a good EKF prior would give)
    :param fused: also run the per-frame poses through the production UKF
        (position-only fusion, innovation gating) and report the FUSED
        track's error per frame — the reference's ULog analysis evaluates
        EKF2's fused output, not raw matcher fixes
    """
    from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
    from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
    from gisnav_tpu.pipeline.runners import (
        load_bundled,
        make_cached_deep_runner,
    )

    ds = load_dataset(path)
    left, bottom, right, top = ds["bounds"]
    oh, ow = ds["ortho"].shape[:2]
    aff = pixel_to_wgs84_affine(oh, ow, left, bottom, right, top)
    ground_m = float(np.mean(ds["dem"]))

    if backend == "deep":
        params, cfg = load_bundled(weights)
        cfg = dataclasses.replace(
            cfg,
            image_shape=ds["image_size"],
            **({"max_keypoints": max_keypoints} if max_keypoints else {}),
            **({"lightglue_depth": lightglue_depth} if lightglue_depth
               else {}),
        )
        runner = make_cached_deep_runner(params, cfg)

        def step(frame, row, agl, use_prior):
            return runner(
                frame, ds["ortho"], ds["dem"], 0.0, ds["k"], aff,
                map_stamp=1, altitude_agl=agl, prior_lonlat=use_prior,
            )
    elif backend == "classical":
        from gisnav_tpu.pipeline import PipelineConfig
        from gisnav_tpu.pipeline.classical import classical_frame_to_geopose

        ccfg = PipelineConfig(image_shape=ds["image_size"],
                              max_keypoints=max_keypoints or 1024)

        def step(frame, row, agl, use_prior):
            # host SIFT wants the reference rotated to the camera yaw
            return classical_frame_to_geopose(
                frame, ds["ortho"], ds["dem"], -row["yaw_deg"],
                ds["k"], aff, config=ccfg,
            )
    else:
        raise ValueError(f"unsupported replay backend {backend!r}")

    ukf = None
    if fused:
        from gisnav_tpu.fusion.filter import PoseFusionFilter, SensorConfig

        # position-only fusion with the production innovation gate; the
        # local frame is ENU meters about the map center
        ukf = PoseFusionFilter(
            {"deep": SensorConfig(
                fuse_mask=(True, True, True, False, False, False),
                rejection_threshold=3.0)},
            backend="ukf",
        )
    lat_c = 0.5 * (bottom + top)
    m_lat = 111_320.0
    m_lon_c = m_lat * np.cos(np.radians(lat_c))
    lon_c = 0.5 * (left + right)

    def to_enu(lon, lat, alt):
        return np.array([(lon - lon_c) * m_lon_c,
                         (lat - lat_c) * m_lat,
                         alt], np.float64)

    results = []
    prior_lonlat = None
    for i, row in enumerate(ds["poses"]):
        frame = cv2.imread(row["frame_path"], cv2.IMREAD_GRAYSCALE)
        agl = row["alt"] - ground_m
        use_prior = None
        if prior == "truth":
            use_prior = (row["lon"], row["lat"])
        elif prior == "previous":
            use_prior = prior_lonlat
        pose = step(frame, row, agl, use_prior)
        # f64 host re-assembly: the device returns f32 lon/lat (~0.2 m
        # quantization); error statistics deserve full precision
        out64 = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
        lla = np.array([out64["lon"], out64["lat"],
                        out64["alt_ellipsoid"]], np.float64)
        valid = bool(pose.valid)
        if not np.all(np.isfinite(lla)):
            lla = np.asarray(pose.lon_lat_alt, np.float64)
            valid = False
        horiz = float(haversine_m(row["lat"], row["lon"], lla[1], lla[0]))
        # per-axis errors like the reference's ULog notebook (ENU meters)
        m_lat = 111_320.0
        m_lon = m_lat * np.cos(np.radians(row["lat"]))
        res = {
            "stamp_us": row["stamp_us"],
            "valid": valid,
            "inliers": int(pose.num_inliers),
            "horiz_m": round(horiz, 3),
            "east_m": round(float((lla[0] - row["lon"]) * m_lon), 3),
            "north_m": round(float((lla[1] - row["lat"]) * m_lat), 3),
            "up_m": round(float(lla[2] - row["alt"]), 3),
            "alt_agl": round(agl, 1),
        }
        if ukf is not None:
            if valid:
                ukf.submit("deep", row["stamp_us"],
                           to_enu(lla[0], lla[1], lla[2]),
                           np.array([0.0, 0.0, 0.0, 1.0]))
            est = ukf.state_at(row["stamp_us"])
            if est is not None:
                err = est["position"] - to_enu(row["lon"], row["lat"],
                                               row["alt"])
                res["fused_horiz_m"] = round(float(np.hypot(*err[:2])), 3)
                res["fused_up_m"] = round(float(err[2]), 3)
        results.append(res)
        if valid and horiz < 200.0:
            prior_lonlat = (float(lla[0]), float(lla[1]))
        if progress:
            progress(i + 1, len(ds["poses"]), res)
    return {"dataset": path, "weights": weights, "frames": results}


def summarize(report: Dict) -> Dict:
    """ULog-notebook-style statistics over a replay report."""
    rows = report["frames"]
    valid = [r for r in rows if r["valid"]]
    out = {
        "frames": len(rows),
        "valid": len(valid),
        "pass_10m": sum(
            1 for r in valid if r["horiz_m"] < 10.0 and abs(r["up_m"]) < 10.0
        ),
    }
    if valid:
        for axis in ("east_m", "north_m", "up_m"):
            vals = np.array([r[axis] for r in valid])
            out[f"mean_abs_{axis}"] = round(float(np.mean(np.abs(vals))), 2)
            out[f"std_{axis}"] = round(float(np.std(vals)), 2)
        out["mean_horiz_m"] = round(
            float(np.mean([r["horiz_m"] for r in valid])), 2)
        out["max_horiz_m"] = round(
            float(np.max([r["horiz_m"] for r in valid])), 2)
        # error vs altitude bands (the notebook's "<150 m" / "<800 m" split)
        for lo, hi in ((0, 150), (150, 800), (800, 1e9)):
            band = [r["horiz_m"] for r in valid if lo <= r["alt_agl"] < hi]
            if band:
                key = f"mean_horiz_{lo}_{'inf' if hi > 1e8 else int(hi)}m_agl"
                out[key] = round(float(np.mean(band)), 2)
    fused = [r for r in rows if "fused_horiz_m" in r]
    if fused:
        out["fused_frames"] = len(fused)
        out["fused_mean_horiz_m"] = round(
            float(np.mean([r["fused_horiz_m"] for r in fused])), 2)
        out["fused_max_horiz_m"] = round(
            float(np.max([r["fused_horiz_m"] for r in fused])), 2)
        out["fused_pass_10m"] = sum(
            1 for r in fused
            if r["fused_horiz_m"] < 10.0 and abs(r["fused_up_m"]) < 10.0)
    return out
