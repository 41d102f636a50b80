#!/usr/bin/env python
"""Generate an example replay dataset for ``gisnav_tpu replay``.

Renders a flight over the synthetic world the e2e suite flies (urban-like
texture; ``tests/test_integration.py``) into the on-disk dataset layout the
replay harness consumes (``gisnav_tpu/replay.py`` docstring), so users can
exercise the full offline-validation path with zero external data:

    python tools/make_replay_dataset.py /tmp/replay_demo --frames 12
    python -m gisnav_tpu replay /tmp/replay_demo --weights harris_lg5

Real-imagery datasets use the identical layout: export a GeoTIFF with
``gdal_translate -of PNG``, put its bounds in map.json, and drop the camera
frames + ground-truth ``poses.csv`` next to it.
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output dataset directory")
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--alt", type=float, default=500.0,
                    help="flight altitude (m, ellipsoid)")
    ap.add_argument("--yaw", type=float, default=25.0)
    ap.add_argument("--image-size", default="640x480")
    args = ap.parse_args()

    import tests.test_integration as ti

    w, h = (int(v) for v in args.image_size.split("x"))
    f = 400.0 * max(w, h) / 640.0
    k_cam = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    lat0, lon0 = 60.025, 24.04

    os.makedirs(os.path.join(args.out, "frames"), exist_ok=True)

    # orthophoto window: 3x FOV around the flight line, camera-diagonal px
    diag_px = float(np.hypot(h, w))
    map_px = int(np.ceil(diag_px / 8)) * 8
    side_wpx = int(round(3.0 * args.alt * max(h, w) / f / ti.M_PER_WPX))
    cx, cy = ti._lonlat_to_wpx(lon0, lat0)
    x0, y0 = int(cx - side_wpx / 2), int(cy - side_wpx / 2)
    crop = ti.WORLD[y0:y0 + side_wpx, x0:x0 + side_wpx]
    ortho = cv2.resize(crop, (map_px, map_px), interpolation=cv2.INTER_AREA)
    cv2.imwrite(os.path.join(args.out, "map.png"), ortho)
    with open(os.path.join(args.out, "map.json"), "w") as fh:
        json.dump({
            "left": ti.LEFT + x0 * ti.GSD_LON,
            "top": ti.TOP - y0 * ti.GSD_LAT,
            "right": ti.LEFT + (x0 + side_wpx) * ti.GSD_LON,
            "bottom": ti.TOP - (y0 + side_wpx) * ti.GSD_LAT,
            "dem": 0.0,
        }, fh, indent=1)
    with open(os.path.join(args.out, "camera.json"), "w") as fh:
        json.dump({"k": k_cam.tolist(), "width": w, "height": h}, fh,
                  indent=1)

    rows = []
    for i in range(args.frames):
        stamp = 1_000_000 + i * 500_000
        lon = lon0 + 1e-4 * i
        lat = lat0 + 5e-5 * i
        cxq, cyq = ti._lonlat_to_wpx(lon, lat)
        a = np.radians(args.yaw)
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        t = -r @ np.array([cxq, cyq, -args.alt / ti.M_PER_WPX])
        hm = k_cam @ np.stack([r[:, 0], r[:, 1], t], axis=1)
        frame = cv2.warpPerspective(ti.WORLD, hm, (w, h))
        cv2.imwrite(os.path.join(args.out, "frames", f"{stamp}.png"), frame)
        rows.append({"stamp_us": stamp, "lon": lon, "lat": lat,
                     "alt_ellipsoid_m": args.alt, "yaw_deg": args.yaw})
    with open(os.path.join(args.out, "poses.csv"), "w", newline="") as fh:
        wtr = csv.DictWriter(fh, fieldnames=list(rows[0]))
        wtr.writeheader()
        wtr.writerows(rows)
    print(f"dataset: {args.out} ({args.frames} frames @ {w}x{h}, "
          f"map {map_px}px)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
