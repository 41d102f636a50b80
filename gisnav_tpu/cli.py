"""Command-line interface.

The reference ships ``gnc``, a Docker-Compose wrapper CLI
(``debian/gisnav/usr/bin/gnc`` in hmakelin/gisnav). This framework runs as a
single process owning the TPU, so the CLI launches the node graph directly:

    python -m gisnav_tpu run --protocol uorb --params params.json
    python -m gisnav_tpu bench
    python -m gisnav_tpu doctor
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_app(args):
    """Construct the production graph from CLI args (separated from
    ``_cmd_run`` so tests can drive the exact CLI-constructed wiring).

    Returns ``(app, ros_adapter_or_None)``. Backend selection mirrors the
    reference launch layer picking node set + protocol at startup
    (``launch/local.launch.py:28-75`` in hmakelin/gisnav): ``--backend deep``
    runs the cached-reference SuperPoint+LightGlue device program the bench
    measures; ``--weights`` picks a bundled set (``harris_lg5`` /
    ``learned_lg9``) or an ``.npz`` path; ``--ros`` bridges the bus to
    rclpy topics (MAVROS / gscam / micro-ros-agent inputs, mock-GPS
    outputs).
    """
    from gisnav_tpu.nodes import GisNavApp
    from gisnav_tpu.nodes.bus import LocalBus, ShmBus

    params = {}
    if args.params:
        with open(args.params) as f:
            params = json.load(f)
    pose_params = dict(params.get("pose_node") or {})
    pose_params.setdefault("backend", args.backend)
    if args.backend == "deep":
        pose_params.setdefault("weights", args.weights)
        pose_params.setdefault("deep_mode", args.deep_mode)
    params["pose_node"] = pose_params

    deep_runner = None
    if args.backend == "deep" and not _is_bundled(args.weights):
        # explicit .npz path: build the runner here (PoseNode's "weights"
        # param only understands bundled names)
        from gisnav_tpu.pipeline.runners import (
            infer_config_from_params,
            make_bucketed_warp_runner,
            make_cached_deep_runner,
            make_deep_runner,
        )
        from gisnav_tpu.weights import load_pretrained

        wparams = load_pretrained(args.weights)
        # the checkpoint carries its architecture (LightGlue depth,
        # detector head) — inferring it beats pinning PRETRAINED_CONFIG,
        # which crashes on a learned_lg9-shaped tree
        cfg = infer_config_from_params(wparams)
        make = {"warp": make_deep_runner,
                "warp-bucketed": make_bucketed_warp_runner}.get(
            args.deep_mode, make_cached_deep_runner)
        deep_runner = make(params=wparams, config=cfg)

    bus = ShmBus(namespace=args.namespace) if args.shm else LocalBus(
        async_dispatch=True
    )
    app = GisNavApp(bus=bus, params=params, protocol=args.protocol,
                    wfst=args.wfst, deep_runner=deep_runner)

    adapter = None
    if args.ros:
        from gisnav_tpu.nodes.ros_adapter import maybe_attach

        adapter = maybe_attach(bus, protocols=(args.protocol,))
        if adapter is None:
            print("[WARN] --ros requested but rclpy is not importable; "
                  "running without the ROS bridge", file=sys.stderr)

    # serial feed to the autopilot (nmea/ubx only; uorb rides the DDS agent)
    serial_tcp = getattr(args, "serial_tcp", None)
    serial_device = getattr(args, "serial_device", None)
    if (serial_tcp or serial_device) and args.protocol in ("nmea", "ubx"):
        from gisnav_tpu.io.serial_bridge import SerialBridge

        app.serial_bridge = SerialBridge(
            bus, protocol=args.protocol,
            tcp=serial_tcp, device=serial_device)
    return app, adapter


def _is_bundled(weights: str) -> bool:
    return weights in ("harris_lg5", "learned_lg9")


def _cmd_run(args) -> int:
    import threading

    app, adapter = build_app(args)
    app.spin(gis_rate_hz=args.gis_rate)
    adapter_thread = None
    if adapter is not None:
        adapter_thread = threading.Thread(
            target=adapter.spin, name="ros-adapter-spin", daemon=True)
        adapter_thread.start()
    print(f"gisnav_tpu running (backend={args.backend}, "
          f"protocol={args.protocol}, "
          f"transport={'shm' if args.shm else 'local'}, "
          f"ros={'on' if adapter else 'off'}); Ctrl-C to stop")
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        bridge = getattr(app, "serial_bridge", None)
        if bridge is not None:
            bridge.close()
        if adapter is not None:
            adapter.close()
            if adapter_thread is not None:
                adapter_thread.join(timeout=3.0)
        stats = app.shutdown()
        print(json.dumps(stats, indent=2, default=str))
    return 0


def _cmd_bench(args) -> int:
    del args
    import bench  # repo-root benchmark

    bench.main()
    return 0


def _cmd_train(args) -> int:
    import logging

    logging.basicConfig(level=logging.INFO)
    from gisnav_tpu.train.loop import train
    from gisnav_tpu.train.steps import TrainConfig

    if args.model == "loftr":
        from gisnav_tpu.train.loftr_steps import LoFTRTrainConfig

        cfg = LoFTRTrainConfig(
            image_shape=tuple(args.image_shape),
            max_matches=args.max_keypoints,
            depth=args.depth,
            learning_rate=args.lr,
        )
    else:
        cfg = TrainConfig(
            image_shape=tuple(args.image_shape),
            max_keypoints=args.max_keypoints,
            lightglue_depth=args.depth,
            learning_rate=args.lr,
            detector_mode=args.detector_mode,
        )
    train(steps=args.steps, batch_size=args.batch, config=cfg,
          ckpt_dir=args.ckpt_dir)
    return 0


def _cmd_replay(args) -> int:
    """Offline replay: recorded frames + ground truth -> error report.

    The in-framework equivalent of the reference's ULog error analysis
    (``test/sitl/ulog_analysis/variance_estimation.ipynb``); dataset layout
    is documented in :mod:`gisnav_tpu.replay`.
    """
    import json as _json

    from gisnav_tpu.replay import replay, summarize

    def progress(i, n, res):
        print(f"[{i}/{n}] stamp={res['stamp_us']} valid={res['valid']} "
              f"inl={res['inliers']:4d} horiz={res['horiz_m']:8.2f} m",
              flush=True)

    report = replay(
        args.dataset,
        weights=args.weights,
        backend=args.backend,
        prior=args.prior,
        max_keypoints=args.max_keypoints,
        lightglue_depth=args.depth,
        fused=args.fused,
        progress=progress if not args.quiet else None,
    )
    summary = summarize(report)
    print(_json.dumps(summary))
    if args.out:
        report["summary"] = summary
        with open(args.out, "w") as f:
            _json.dump(report, f, indent=1)
    return 0 if summary.get("pass_10m", 0) == summary["frames"] else 1


def _cmd_health(args) -> int:
    """Wait for a ``/gisnav/health`` heartbeat on the shm bus; exit 0/1.

    The container healthcheck equivalent of the reference's
    ``ros2 topic echo --once`` compose probes
    (``docker/docker-compose.healthcheck.yaml`` in hmakelin/gisnav): a
    separate process attaches to the running graph's shared-memory bus and
    requires one heartbeat (published every 5 s by ``GisNavApp``) within
    ``--timeout``. With ``--strict``, every node in the report must also be
    healthy.
    """
    import threading

    from gisnav_tpu.nodes.bus import ShmBus

    got = threading.Event()
    report = {}

    def on_health(msg):
        report.update(msg)
        got.set()

    bus = ShmBus(namespace=args.namespace)
    try:
        bus.subscribe("/gisnav/health", on_health)
        if not got.wait(timeout=args.timeout):
            print(f"UNHEALTHY: no heartbeat within {args.timeout:.0f} s")
            return 1
        unhealthy = [n for n, r in report.items() if not r.get("healthy")]
        if args.strict and unhealthy:
            print(f"UNHEALTHY nodes: {', '.join(unhealthy)}")
            return 1
        print(f"healthy ({len(report)} nodes"
              + (f", idle: {', '.join(unhealthy)}" if unhealthy else "")
              + ")")
        return 0
    finally:
        bus.close()


def _cmd_doctor(args) -> int:
    """Environment self-check (devices, native lib, WMS reachability)."""
    import subprocess

    ok = True
    # device enumeration goes over the accelerator transport and can hang
    # indefinitely if the device service is down — a self-check must report
    # that, not inherit the hang. Probe in a SUBPROCESS with a hard
    # deadline: an in-process probe thread would wedge the import lock and
    # interpreter teardown when it never returns.
    probe = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; print(jax.__version__); print(jax.devices())"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        out, _ = probe.communicate(timeout=args.device_timeout)
        if probe.returncode == 0:
            ver, devs = out.strip().split("\n", 1)
            print(f"[ok] jax {ver}, devices: {devs}")
        else:
            print(f"[FAIL] jax device probe exited {probe.returncode}")
            ok = False
    except subprocess.TimeoutExpired:
        probe.kill()
        print(f"[FAIL] jax device enumeration exceeded "
              f"{args.device_timeout:.0f} s — accelerator runtime/tunnel "
              f"unreachable")
        ok = False
    try:
        from gisnav_tpu.nodes.bus import build_native_lib

        print(f"[ok] native shm bus: {build_native_lib()}")
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] native shm bus build: {e}")
        ok = False
    if args.wms_url:
        from gisnav_tpu.gis import WMSClient

        if WMSClient(args.wms_url, timeout_s=3.0).is_available():
            print(f"[ok] WMS reachable: {args.wms_url}")
        else:
            print(f"[WARN] WMS not reachable: {args.wms_url}")
    try:
        import cv2  # noqa: F401

        print("[ok] cv2 (host SIFT / decode available)")
    except Exception:  # noqa: BLE001
        print("[WARN] cv2 missing: classical backend unavailable")
    return 0 if ok else 1


def _cmd_serial(args) -> int:
    """Bridge a running graph's mock-GPS output to a pty GPS port."""
    from gisnav_tpu.io.serial_bridge import SerialBridge
    from gisnav_tpu.nodes.bus import ShmBus

    bus = ShmBus(namespace=args.namespace)
    if args.tcp:
        bridge = SerialBridge(bus, protocol=args.protocol, tcp=args.tcp)
        print(f"serial bridge up: {args.protocol} -> tcp {args.tcp} "
              f"(connected={bridge.connected}); Ctrl-C to stop")
    else:
        bridge = SerialBridge(bus, protocol=args.protocol, link=args.link)
        print(f"serial bridge up: {args.protocol} -> {args.link} "
              f"(pty {bridge.slave_path}); Ctrl-C to stop")
    try:
        while True:
            time.sleep(1.0)
    except KeyboardInterrupt:
        bridge.close()
    return 0


def _cmd_gis_serve(args) -> int:
    """Host the self-contained demo GIS service (WMS + WFS-T).

    Air-gapped equivalent of the reference's MapServer+TinyOWS+PostGIS
    constellation (``docker/apache/`` in hmakelin/gisnav; production
    containers live in ``docker/mapserver/``): serves GetMap for the
    ``imagery``/``dem`` GeoTIFF layers and WFS-T transactions/GetFeature
    for the mock-GPS track, from one Python process.
    """
    import os

    from gisnav_tpu.gis.server import (
        GisServer,
        PostGISStore,
        SQLiteStore,
        load_layers_from_dir,
    )

    layers = {}
    if args.maps:
        if not os.path.isdir(args.maps):
            print(f"maps dir {args.maps!r} not found — generate one with "
                  "tools/make_demo_geotiff.py", file=sys.stderr)
            return 2
        layers = load_layers_from_dir(args.maps)
        if not layers:
            print(f"no GeoTIFFs under {args.maps!r}/imagery or /dem",
                  file=sys.stderr)
            return 2
    store = PostGISStore(args.pg) if args.pg else SQLiteStore(args.db)
    server = GisServer(layers=layers, store=store,
                       host=args.host, port=args.port)
    print(f"GIS server on :{server.port} — WMS layers "
          f"[{', '.join(sorted(layers)) or 'none'}], WFS-T store "
          f"{'postgis' if args.pg else args.db}; Ctrl-C to stop")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.stop()
    return 0


def _fleet_groups(services, hosts):
    """Group services by execution target.

    Mirrors the reference ``gnc`` CLI's ``service[@remote]`` addressing
    (``debian/gisnav/usr/bin/gnc`` in hmakelin/gisnav): a ``@remote``
    suffix sends that service to the ssh target; plain services go to every
    ``--host`` (or locally when none is given). Returns an ordered
    ``{target-or-None: [services]}`` dict.
    """
    groups: dict = {}
    plain = []
    for svc in services:
        if "@" in svc:
            name, target = svc.split("@", 1)
            groups.setdefault(target, []).append(name)
        else:
            plain.append(svc)
    if plain or not groups:
        for target in (hosts or [None]):
            groups.setdefault(target, [])
            groups[target] = plain + groups[target] if target in groups \
                else plain
    return groups


def _cmd_fleet(args) -> int:
    """Fan a docker compose verb out to local/remote hosts.

    The reference's ``gnc`` runs compose services on remote hosts over SSH
    for split topologies (GIS on a companion computer, sim on a
    workstation). Equivalent here, minus its interactive-tty bookkeeping:
    each target runs ``docker compose -p gisnav-tpu -f <file> VERB ...``.
    """
    import shlex
    import subprocess
    from concurrent.futures import ThreadPoolExecutor

    compose_file = args.compose_file
    groups = _fleet_groups(args.services, args.host)

    def build_cmd(target, services):
        if target is None:
            return ["docker", "compose", "-p", "gisnav-tpu",
                    "-f", compose_file, args.verb, *args.extra, *services]
        # remotes use the checkout-relative compose file; leave a leading
        # ~ unquoted so the remote shell expands it
        rp = args.remote_path
        rp_q = ("~" + shlex.quote(rp[1:])) if rp.startswith("~") \
            else shlex.quote(rp)
        base = ["docker", "compose", "-p", "gisnav-tpu",
                "-f", "docker/docker-compose.yaml",
                args.verb, *args.extra, *services]
        remote_cmd = (
            f"cd {rp_q} && " + " ".join(shlex.quote(c) for c in base)
        )
        return ["ssh", "-o", "BatchMode=yes", target, remote_cmd]

    cmds = [(t, build_cmd(t, svcs)) for t, svcs in groups.items()]
    if args.dry_run:
        for target, cmd in cmds:
            print(f"[{target or 'local'}] {' '.join(cmd)}")
        return 0

    def run_one(item):
        target, cmd = item
        proc = subprocess.run(cmd)
        if proc.returncode != 0:
            print(f"[{target or 'local'}] exited {proc.returncode}",
                  file=sys.stderr)
        return proc.returncode

    with ThreadPoolExecutor(max_workers=max(1, len(cmds))) as pool:
        rcs = list(pool.map(run_one, cmds))
    return max(rcs) if rcs else 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="gisnav_tpu")
    try:
        from importlib.metadata import version as _v

        _ver = _v("gisnav-tpu")
    except Exception:  # source checkout without install
        _ver = "0.1.0"
    parser.add_argument("--version", action="version",
                        version=f"gisnav_tpu {_ver}")
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="launch the full node graph")
    run.add_argument("--protocol", choices=("uorb", "nmea", "ubx"),
                     default="uorb")
    run.add_argument("--backend", choices=("classical", "deep", "semidense"),
                     default="deep",
                     help="pose backend; 'deep' (default) is the cached "
                          "SuperPoint+LightGlue device program the bench "
                          "measures")
    run.add_argument("--weights", default="learned_lg9",
                     help="bundled weight set (learned_lg9 | harris_lg5) "
                          "or a path to an .npz checkpoint; learned_lg9 + "
                          "warp-bucketed is the both-gates production "
                          "default (round-4: 8/8 yaws <10 m AND 80 FPS at "
                          "1080p/2048 kp on one v5e chip)")
    run.add_argument("--deep-mode",
                     choices=("cached", "warp", "warp-bucketed"),
                     default="warp-bucketed",
                     help="warp-bucketed: 15-degree rotation-bucketed warp "
                          "cache, query-only per frame (production default "
                          "- 8/8 yaws <10 m at bucket-edge residuals AND "
                          "80 FPS at 1080p/2048 kp); warp: exact per-frame "
                          "rotate/GSD-crop + dual extract (~52 FPS); "
                          "cached: unwarped HBM-resident map features "
                          "(rotation-weaker at high resolution)")
    run.add_argument("--ros", action="store_true",
                     help="bridge the bus to ROS 2 topics (needs rclpy)")
    run.add_argument("--params", help="JSON file with per-node parameters")
    run.add_argument("--shm", action="store_true",
                     help="use the shared-memory bus (multi-process graphs)")
    run.add_argument("--namespace", default="gisnav")
    run.add_argument("--wfst", action="store_true",
                     help="also run the WFS-T telemetry sink")
    run.add_argument("--gis-rate", type=float, default=1.0)
    run.add_argument("--serial-tcp", default=None, metavar="HOST:PORT",
                     help="also bridge the mock-GPS output to a TCP "
                          "listener on the simulation container "
                          "(SITL constellation, e.g. px4:15000)")
    run.add_argument("--serial-device", default=None, metavar="PATH",
                     help="also bridge the mock-GPS output to a real "
                          "serial device (HIL, e.g. /dev/ttyUSB0)")
    run.set_defaults(fn=_cmd_run)

    bench_p = sub.add_parser("bench", help="run the headline benchmark")
    bench_p.set_defaults(fn=_cmd_bench)

    tr = sub.add_parser("train", help="self-supervised matcher training")
    tr.add_argument("--steps", type=int, default=1000)
    tr.add_argument("--batch", type=int, default=8)
    tr.add_argument("--image-shape", type=int, nargs=2, default=(128, 160))
    tr.add_argument("--max-keypoints", type=int, default=256)
    tr.add_argument("--depth", type=int, default=3)
    # depth-5 LightGlue diverges (dustbin collapse) at 3e-4; 1e-4 is stable
    # for every depth tested (measured on-TPU, easy-task probe)
    tr.add_argument("--lr", type=float, default=1e-4)
    tr.add_argument("--detector-mode", default="learned",
                    choices=("learned", "harris"))
    tr.add_argument("--model", default="superpoint_lightglue",
                    choices=("superpoint_lightglue", "loftr"))
    tr.add_argument("--ckpt-dir", default=None)
    tr.set_defaults(fn=_cmd_train)

    rp = sub.add_parser(
        "replay", help="offline replay of recorded frames vs ground truth")
    rp.add_argument("dataset", help="dataset dir (see gisnav_tpu/replay.py)")
    rp.add_argument("--backend", choices=("deep", "classical"),
                    default="deep")
    rp.add_argument("--weights", default="learned_lg9")
    rp.add_argument("--prior", choices=("none", "previous", "truth"),
                    default="previous")
    rp.add_argument("--max-keypoints", type=int, default=None)
    rp.add_argument("--depth", type=int, default=None)
    rp.add_argument("--fused", action="store_true",
                    help="also evaluate the UKF-fused track (the "
                         "reference's ULog analysis evaluates EKF2 output)")
    rp.add_argument("--out", default=None, help="write full JSON report")
    rp.add_argument("--quiet", action="store_true")
    rp.set_defaults(fn=_cmd_replay)

    health = sub.add_parser(
        "health", help="probe a running graph's heartbeat (shm bus)")
    health.add_argument("--namespace", default="gisnav")
    health.add_argument("--timeout", type=float, default=12.0,
                        help="max seconds to wait for one heartbeat "
                             "(published every 5 s)")
    health.add_argument("--strict", action="store_true",
                        help="also require every node to report healthy")
    health.set_defaults(fn=_cmd_health)

    doctor = sub.add_parser("doctor", help="environment self-check")
    doctor.add_argument("--wms-url", default=None)
    doctor.add_argument("--device-timeout", type=float, default=60.0,
                        help="hard deadline for device enumeration "
                             "(a dead accelerator tunnel must fail the "
                             "check, not hang it)")
    doctor.set_defaults(fn=_cmd_doctor)

    serial = sub.add_parser(
        "serial", help="pty bridge: mock-GPS bus output -> autopilot port")
    serial.add_argument("--protocol", choices=("nmea", "ubx"),
                        default="nmea")
    serial.add_argument(
        "--tcp", default=None, metavar="HOST:PORT",
        help="connect a TCP stream instead of opening a pty (the "
             "cross-container topology: socat on the simulation side "
             "turns it back into a serial device)")
    serial.add_argument("--link", default="/tmp/gisnav-gps",
                        help="stable symlink to the pty slave")
    serial.add_argument("--namespace", default="gisnav",
                        help="shared-memory bus namespace of the graph")
    serial.set_defaults(fn=_cmd_serial)

    gis = sub.add_parser(
        "gis-serve",
        help="host the self-contained demo GIS service (WMS + WFS-T)")
    gis.add_argument("--maps", default=None, metavar="DIR",
                     help="maps dir with imagery/ and dem/ GeoTIFFs "
                          "(tools/make_demo_geotiff.py layout)")
    gis.add_argument("--db", default=":memory:",
                     help="SQLite path for the WFS-T feature store")
    gis.add_argument("--pg", default=None, metavar="DSN",
                     help="PostGIS DSN (overrides --db; production wiring)")
    gis.add_argument("--host", default="0.0.0.0")
    gis.add_argument("--port", type=int, default=8080)
    gis.set_defaults(fn=_cmd_gis_serve)

    import os as _os

    fleet = sub.add_parser(
        "fleet", help="fan compose verbs out to local/remote hosts (gnc)")
    fleet.add_argument("--host", action="append", default=None,
                       help="ssh target (user@host); repeatable")
    fleet.add_argument("--remote-path", default="~/gisnav_tpu",
                       help="repo checkout path on remote hosts")
    fleet.add_argument(
        "--compose-file",
        default=_os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "docker", "docker-compose.yaml"))
    fleet.add_argument("--dry-run", action="store_true",
                       help="print the commands without executing")
    fleet.add_argument("verb",
                       help="any docker compose verb (up, down, ps, ...)")
    fleet.add_argument("services", nargs="*",
                       help="service names, optionally service@remote")
    fleet.add_argument("--extra", nargs="*", default=[],
                       help="extra compose args (use = for dashed values, "
                            "e.g. --extra=-d)")
    fleet.set_defaults(fn=_cmd_fleet)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
