"""Accuracy sweep at the HEADLINE bench config (1088x1920, 2048 kp, LG-9).

Round-2 verdict: throughput was measured at 1080p/2048 kp while accuracy was
only measured at 640x480/512 kp — no single configuration had both numbers.
This tool runs the same cached-reference production runner the bench times,
with the bundled ``learned_lg9`` weights, over the synthetic world of
``tests/test_integration.py`` (8 yaws x 3 altitudes like
``tests/test_envelope.py``), and reports per-pose horizontal error against
the reference SITL 10 m acceptance gate
(``test/sitl/sitl_px4.py:263-280`` in hmakelin/gisnav).

Run on a TPU host (CPU works but is slow):

    python tools/sweep_headline.py [--alts 150 300 500] [--out FILE]

Prints one JSON line; with --out also writes it to a file.
"""
import argparse
import dataclasses
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _MatchedWorld:
    """Synthetic world rendered at a chosen GSD (meters per world pixel).

    The shared test world (``tests/test_integration.WORLD``) is ~1.36 m/px —
    the validated 640x480/f=400 camera's ground sampling at 500 m AGL. A
    1080p/f=1200 query at the same altitude samples at ~0.42 m/px, so
    rendering it from that world is a ~3.3x blurry upsample: accuracy
    measured there confounds the matcher with a fixture artifact. This
    world keeps the same *metric* texture statistics (shape sizes 11-109 m,
    stroke widths ~2.7-11 m, same density per km^2, same style) but rasters
    them at the requested GSD so the query is never sampled beyond native
    resolution.
    """

    def __init__(self, side_m: float, gsd_m: float, lon0: float,
                 lat0: float, seed: int = 7, octave_falloff: float = 0.85):
        import cv2 as _cv2
        import numpy as _np

        w_px = int(_np.ceil(side_m / gsd_m / 8)) * 8
        self.w_px = w_px
        self.gsd_m = gsd_m
        rng = _np.random.default_rng(seed)
        world = _np.full((w_px, w_px), 110, _np.uint8)
        # reference density: 4000 shapes over (5565 m)^2
        n = int(round(4000 * (side_m / 5565.0) ** 2))
        px_per_legacy = 1.358642578125 / gsd_m  # legacy world GSD -> ours
        for _ in range(n):
            x, y = (int(v) for v in rng.integers(0, w_px, 2))
            kind = int(rng.integers(0, 3))
            v = int(rng.integers(0, 256))
            s = int(rng.integers(8, 80) * px_per_legacy)
            if kind == 0:
                _cv2.rectangle(
                    world, (x, y),
                    (x + s, y + int(s * rng.uniform(0.3, 1.5))), v, -1)
            elif kind == 1:
                _cv2.circle(world, (x, y), s // 2, v, -1)
            else:
                x2 = x + int(s * rng.uniform(-2, 2))
                y2 = y + int(s * rng.uniform(-2, 2))
                _cv2.line(world, (x, y), (x2, y2), v,
                          max(2, int(rng.integers(2, 8) * px_per_legacy)))
        # 1/f fractal micro-texture under/over the shapes: the shape layer
        # has a fixed METRIC density (1 shape per ~7700 m^2), so a small
        # low-altitude map crop contains only dozens of features and
        # matching starves — an artifact real orthoimagery doesn't have
        # (natural images carry a 1/f amplitude spectrum with texture at
        # every scale, the same model as tests/test_world_fractal.py).
        # Octave falloff 0.85 (flatter than the 1/f-ideal 0.5): across the
        # ~13 octaves of a city-scale world a steeper slope leaves <1 gray
        # level of contrast in the finest octaves (measured: high-pass std
        # 0.29 at 0.55 vs 5.2 at 0.85 in a 150 m-AGL FOV window), i.e. no
        # matchable detail at low altitude — unlike real orthoimagery whose
        # material texture (grass/asphalt/canopy) keeps local contrast at
        # every GSD.
        # octave_falloff 1.0 = equal amplitude per octave = constant POWER
        # per octave band — the textbook natural-image 1/f statistic; the
        # legacy 0.85 underweights fine octaves, which after the map's
        # INTER_AREA downsample leaves low-altitude FOVs feature-starved
        # (measured: alt-150 matching collapses at 0.85, unlike real
        # orthoimagery whose material texture persists at every GSD)
        octaves = max(2, int(_np.ceil(_np.log2(w_px / 4))))
        acc = _np.zeros((w_px, w_px), _np.float32)
        amp = 1.0
        for o in range(octaves):
            n = max(2, min(w_px, 4 << o))
            grid = rng.standard_normal((n, n)).astype(_np.float32)
            acc += amp * _cv2.resize(grid, (w_px, w_px),
                                     interpolation=_cv2.INTER_CUBIC)
            amp *= octave_falloff
            del grid
        acc *= 20.0 / max(float(acc.std()), 1e-6)
        world = _np.clip(world.astype(_np.float32) + acc, 0, 255)
        del acc
        world = world.astype(_np.uint8)
        self.world = _cv2.GaussianBlur(world, (3, 3), 0.8)
        # georeference: centered on (lon0, lat0)
        m_per_deg_lat = 111320.0
        m_per_deg_lon = m_per_deg_lat * _np.cos(_np.radians(lat0))
        self.gsd_lon = gsd_m / m_per_deg_lon
        self.gsd_lat = gsd_m / m_per_deg_lat
        self.left = lon0 - w_px / 2 * self.gsd_lon
        self.top = lat0 + w_px / 2 * self.gsd_lat

    def lonlat_to_wpx(self, lon, lat):
        return ((lon - self.left) / self.gsd_lon,
                (self.top - lat) / self.gsd_lat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alts", type=float, nargs="+", default=[150, 300, 500])
    ap.add_argument("--yaws", type=float, nargs="+",
                    default=[0, 45, 90, 135, 180, 225, 270, 315])
    ap.add_argument("--weights", default="learned_lg9")
    ap.add_argument("--hw", type=int, nargs=2, default=(1088, 1920))
    ap.add_argument("--kp", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=9)
    ap.add_argument("--world-gsd", default=None,
                    help="render from a world rastered at this GSD "
                         "(m/px); 'auto' matches the query GSD at the "
                         "lowest altitude; default: the legacy shared "
                         "~1.36 m/px test world")
    ap.add_argument("--derotate", action="store_true",
                    help="query-side derotation from the known yaw "
                         "(pipeline/runners.py make_cached_deep_runner)")
    ap.add_argument("--bucket-deg", type=float, default=15.0,
                    help="warp-bucketed mode: rotation bucket width; "
                         "sweep yaws at bucket-edge offsets to measure "
                         "the worst-case residual")
    ap.add_argument("--mode", choices=("cached", "warp", "warp-bucketed"),
                    default="cached",
                    help="cached = production HBM-resident map features; "
                         "warp = StereoNode-parity rotate+crop+re-extract "
                         "per frame (make_deep_runner)")
    ap.add_argument("--prior-m", type=float, default=None,
                    help="cached mode: pass a position prior offset this "
                         "many meters from truth (emulates the EKF fix "
                         "the production pose node feeds back; enables "
                         "the FOV-radius candidate gate)")
    ap.add_argument("--octave-falloff", type=float, default=0.85,
                    help="matched-world texture amplitude falloff per "
                         "octave; 1.0 = constant power per octave band "
                         "(natural-image statistic)")
    ap.add_argument("--threshold-px", type=float, default=None,
                    help="RANSAC inlier threshold override (query px)")
    ap.add_argument("--hypotheses", type=int, default=None,
                    help="RANSAC hypothesis batch override")
    ap.add_argument("--refine-iters", type=int, default=None,
                    help="Gauss-Newton refine iteration override")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gisnav_tpu.utils.jitcache import enable_persistent_cache
    enable_persistent_cache()

    import tests.test_integration as ti
    from gisnav_tpu.geometry.crs import haversine_m, pixel_to_wgs84_affine
    from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64
    from gisnav_tpu.pipeline.runners import (
        load_bundled,
        make_cached_deep_runner,
        make_deep_runner,
    )

    h, w = args.hw
    # same FOV angle as the validated e2e suite (f=400 at 640 wide)
    f = 400.0 * w / 640.0
    k_cam = np.array(
        [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]], np.float32
    )

    # fly near the middle of the world
    lat0, lon0 = 60.025, 24.04
    m_per_deg_lat = 111320.0
    m_per_deg_lon = m_per_deg_lat * np.cos(np.radians(lat0))

    if args.world_gsd is None:
        world_img = ti.WORLD
        world_gsd_m = ti.M_PER_WPX
        lonlat_to_wpx = ti._lonlat_to_wpx
        gsd_lon, gsd_lat = ti.GSD_LON, ti.GSD_LAT
        world_left, world_top = ti.LEFT, ti.TOP
    else:
        gsd = (min(args.alts) / f if args.world_gsd == "auto"
               else float(args.world_gsd))
        # cover the largest map request (3x FOV side) plus flight offsets
        side_m = 3.0 * max(args.alts) * max(h, w) / f * 1.1 + 200.0
        mw = _MatchedWorld(side_m, gsd, lon0, lat0,
                           octave_falloff=args.octave_falloff)
        world_img = mw.world
        world_gsd_m = mw.gsd_m
        lonlat_to_wpx = mw.lonlat_to_wpx
        gsd_lon, gsd_lat = mw.gsd_lon, mw.gsd_lat
        world_left, world_top = mw.left, mw.top
        print(f"matched world: {mw.w_px}x{mw.w_px} px at "
              f"{world_gsd_m:.3f} m/px", flush=True)

    def render_frame(lon, lat, alt_m, yaw_deg):
        """Nadir render from the synthetic world (ti._render_frame
        generalized to this camera)."""
        cx, cy = lonlat_to_wpx(lon, lat)
        alt_wpx = alt_m / world_gsd_m
        a = np.radians(yaw_deg)
        c, s = np.cos(a), np.sin(a)
        r = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])
        cam = np.array([cx, cy, -alt_wpx])
        t = -r @ cam
        hm = k_cam @ np.stack([r[:, 0], r[:, 1], t], axis=1)
        return cv2.warpPerspective(world_img, hm, (w, h))

    diag_px = float(np.hypot(h, w))
    map_px = int(np.ceil(diag_px / 8)) * 8  # camera-diagonal map sizing

    def make_map(alt):
        """North-up map mirroring production sizing: the bbox layer squares
        the FOV and pads by one side length (3x ground coverage,
        ``geometry/bbox.py square_and_pad``), and GISNode requests it at the
        camera-diagonal pixel size (``gis/wms.py orthoimage_size_for_camera``;
        reference ``gis_node.py:360-384``). Matching this keeps the
        reference-keypoint density and map/query GSD ratio production-true."""
        # squared-FOV side = alt * max(w, h) / f; square_and_pad pads by
        # one side length on each side -> 3x ground coverage
        side_m = 3.0 * alt * max(h, w) / float(k_cam[0, 0])
        side_wpx = int(round(side_m / world_gsd_m))
        cx, cy = lonlat_to_wpx(lon0, lat0)
        x0 = int(cx - side_wpx / 2)
        y0 = int(cy - side_wpx / 2)
        crop = world_img[y0:y0 + side_wpx, x0:x0 + side_wpx]
        assert crop.shape == (side_wpx, side_wpx), \
            (crop.shape, side_wpx, "map request exceeds world bounds")
        ortho = cv2.resize(crop, (map_px, map_px),
                           interpolation=cv2.INTER_AREA
                           if side_wpx > map_px else cv2.INTER_LINEAR)
        left = world_left + x0 * gsd_lon
        top = world_top - y0 * gsd_lat
        right = left + side_wpx * gsd_lon
        bottom = top - side_wpx * gsd_lat
        aff = pixel_to_wgs84_affine(map_px, map_px, left, bottom, right, top)
        dem = np.zeros((map_px, map_px), np.float32)
        return ortho, dem, aff

    params, base_cfg = load_bundled(args.weights)
    overrides = dict(
        image_shape=(h, w),
        max_keypoints=args.kp,
        lightglue_depth=args.depth,
    )
    if args.threshold_px is not None:
        overrides["threshold_px"] = args.threshold_px
    if args.hypotheses is not None:
        overrides["num_hypotheses"] = args.hypotheses
    if args.refine_iters is not None:
        overrides["refine_iters"] = args.refine_iters
    cfg = dataclasses.replace(base_cfg, **overrides)
    if args.mode == "warp":
        runner = make_deep_runner(params, cfg)
    elif args.mode == "warp-bucketed":
        from gisnav_tpu.pipeline.runners import make_bucketed_warp_runner

        runner = make_bucketed_warp_runner(params, cfg,
                                           bucket_deg=args.bucket_deg)
    else:
        runner = make_cached_deep_runner(params, cfg,
                                         derotate=args.derotate)

    rows = []
    for ai, alt in enumerate(args.alts):
        ortho, dem, aff = make_map(alt)
        for yaw in args.yaws:
            lon = lon0 + 0.0004 * np.cos(np.radians(yaw))
            lat = lat0 + 0.0002 * np.sin(np.radians(yaw))
            frame = render_frame(lon, lat, alt, yaw)
            # derotation sign: the production value is -heading
            # (nodes/pose_node.py _rotation_deg); rotating the rendered
            # query by -yaw aligns it with map north (render-alignment
            # ncc=1.0 at all yaws; the +yaw sign DOUBLES the content
            # misalignment — the round-3 comment claiming otherwise was
            # measured through the sign bug it introduced).
            kw = {}
            if args.mode == "cached" and args.prior_m is not None:
                # prior = truth displaced by --prior-m meters (bearing
                # varied per pose): emulates feeding back the previous
                # EKF fix like nodes/pose_node.py does via prior_lonlat
                brg = np.radians(yaw + 77.0)
                kw["prior_lonlat"] = (
                    lon + args.prior_m * np.sin(brg) / m_per_deg_lon,
                    lat + args.prior_m * np.cos(brg) / m_per_deg_lat,
                )
            # rotation convention: callers pass the MAP-ALIGNMENT rotation
            # (the image-up compass angle, = +yaw for this renderer;
            # nodes/pose_node.py _rotation_deg). The cached derotation path
            # internally inverts it for the query-side warp.
            rot = yaw if (args.derotate or args.mode.startswith("warp")) else 0.0
            pose = runner(
                frame, ortho, dem, rot,
                k_cam, aff, map_stamp=ai + 1, altitude_agl=alt, **kw,
            )
            # f64 host assembly (device lla is f32, ~0.2 m quantized)
            out64 = geopose_to_wgs84_f64(pose, np.asarray(aff, np.float64))
            lla = np.array([out64["lon"], out64["lat"],
                            out64["alt_ellipsoid"]], np.float64)
            if not np.all(np.isfinite(lla)):
                lla = np.asarray(pose.lon_lat_alt, np.float64)
            horiz = haversine_m(lat, lon, lla[1], lla[0])
            vert = abs(lla[2] - alt)
            rows.append({
                "alt": alt, "yaw": yaw, "valid": bool(pose.valid),
                "inliers": int(pose.num_inliers),
                "horiz_m": round(float(horiz), 2),
                "vert_m": round(float(vert), 2),
            })
            print(f"alt={alt:5.0f} yaw={yaw:5.1f} valid={bool(pose.valid)} "
                  f"inl={int(pose.num_inliers):4d} horiz={horiz:7.2f} m "
                  f"vert={vert:6.2f} m", flush=True)

    ok = [r for r in rows if r["valid"] and r["horiz_m"] < 10.0
          and r["vert_m"] < 10.0]
    horiz = [r["horiz_m"] for r in rows if r["valid"]]
    mode_tag = args.mode + ("_derot" if args.derotate else "") + (
        f"_prior{args.prior_m:g}m" if args.prior_m is not None else "")
    summary = {
        "config": f"{h}x{w}_{args.kp}kp_lg{args.depth}_{args.weights}"
                  f"_{mode_tag}",
        "world_gsd_m": round(float(world_gsd_m), 3),
        "poses": len(rows),
        "valid": sum(r["valid"] for r in rows),
        "pass_10m": len(ok),
        "mean_horiz_m": round(float(np.mean(horiz)), 2) if horiz else None,
        "max_horiz_m": round(float(np.max(horiz)), 2) if horiz else None,
        "rows": rows,
    }
    line = json.dumps(summary)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
