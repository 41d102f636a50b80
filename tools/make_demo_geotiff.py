#!/usr/bin/env python3
"""Render the synthetic demo world into georeferenced GeoTIFFs.

Self-contained replacement for the reference's demo-raster acquisition
(NAIP imagery + USGS DEM downloaded at image build time,
``docker/apache/Dockerfile:47-72`` in hmakelin/gisnav): air-gapped hosts
can't download rasters, so the demo GIS stack renders its own. Output is a
single-band uint8 imagery GeoTIFF and a float32 DEM GeoTIFF over KSQL
airport (the reference demo's location), readable by GDAL — drop them into
``docker/mapserver``'s maps volume (the VRT entrypoint picks them up) or
serve them directly with ``gisnav_tpu gis-serve``.

Usage::

    python tools/make_demo_geotiff.py --out docker/mapserver/maps \
        [--size 4096] [--seed 7]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="docker/mapserver/maps",
                    help="output directory (imagery/ and dem/ subdirs)")
    ap.add_argument("--size", type=int, default=4096,
                    help="imagery size in pixels (square)")
    ap.add_argument("--dem-size", type=int, default=1024,
                    help="DEM size in pixels (square, same extent)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--relief-m", type=float, default=12.0,
                    help="DEM terrain relief amplitude in meters")
    args = ap.parse_args()

    from gisnav_tpu.gis.geotiff import write_geotiff
    from gisnav_tpu.utils.world import (
        DEMO_GEOREF,
        synthetic_dem,
        synthetic_world,
    )

    imagery_dir = os.path.join(args.out, "imagery")
    dem_dir = os.path.join(args.out, "dem")
    os.makedirs(imagery_dir, exist_ok=True)
    os.makedirs(dem_dir, exist_ok=True)

    world = synthetic_world(args.size, seed=args.seed)
    img_path = os.path.join(imagery_dir, "demo_imagery.tif")
    write_geotiff(img_path, world, DEMO_GEOREF.georef(args.size))
    print(f"wrote {img_path} ({args.size}x{args.size} uint8, "
          f"{os.path.getsize(img_path) / 1e6:.1f} MB)")

    dem = synthetic_dem(args.dem_size, seed=args.seed + 4,
                        relief_m=args.relief_m)
    dem_path = os.path.join(dem_dir, "demo_dem.tif")
    write_geotiff(dem_path, dem, DEMO_GEOREF.georef(args.dem_size))
    print(f"wrote {dem_path} ({args.dem_size}x{args.dem_size} float32, "
          f"{os.path.getsize(dem_path) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
