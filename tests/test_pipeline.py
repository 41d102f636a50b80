"""End-to-end pipeline tests on a synthetic world.

A textured orthoimage raster with a known pixel->WGS84 affine is "flown over"
by a synthetic nadir camera: the query frame is rendered from the orthoimage
with the ground-truth camera homography, then the pipeline must recover the
camera's WGS84 position to sub-meter accuracy (classical SIFT+MNN path; the
deep path is compile-checked — it needs trained weights for accuracy).
"""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gisnav_tpu.geometry.crs import pixel_to_wgs84_affine, wgs84_to_ecef
from gisnav_tpu.pipeline import (
    PipelineConfig,
    build_frame_to_geopose,
    init_pipeline_params,
)
from gisnav_tpu.pipeline.classical import classical_frame_to_geopose
from gisnav_tpu.pipeline.geopose import geopose_to_wgs84_f64

H_ORTHO = W_ORTHO = 768
# ~1113 x 1106 m: the lat span is chosen so ground pixels are ISOTROPIC
# (~1.45 m/px both axes) like the reference's UTM-squared bboxes
LEFT, BOTTOM, RIGHT, TOP = 24.00, 60.00, 24.02, 60.01
K_CAM = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1.0]])
IMG_SHAPE = (480, 640)


def _world(rng):
    """Synthetic fractal-textured orthoimage + affine (detail at all scales,
    so SIFT finds features at any flight altitude / zoom)."""
    acc = np.zeros((H_ORTHO, W_ORTHO), np.float32)
    for octave in (4, 16, 64, 256, 768):
        layer = rng.uniform(0, 1, (octave, octave)).astype(np.float32)
        acc += cv2.resize(layer, (W_ORTHO, H_ORTHO),
                          interpolation=cv2.INTER_CUBIC)
    acc -= acc.min()
    ortho = np.clip(acc / acc.max() * 255.0, 0, 255).astype(np.uint8)
    aff = pixel_to_wgs84_affine(H_ORTHO, W_ORTHO, LEFT, BOTTOM, RIGHT, TOP)
    return ortho, aff


def _render_query(ortho, aff, cam_px, yaw_deg, alt_m):
    """Render the query frame for a nadir camera at cam_px (raster px) with
    in-plane yaw, using the exact planar homography."""
    gsd = -aff[2, 2]  # meters per pixel-unit
    alt_px = alt_m / gsd
    a = np.radians(yaw_deg)
    c, s = np.cos(a), np.sin(a)
    r_gt = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1.0]])  # raster->camera
    cam_center = np.array([cam_px[0], cam_px[1], -alt_px])
    t_gt = -r_gt @ cam_center
    h = K_CAM @ np.stack([r_gt[:, 0], r_gt[:, 1], t_gt], axis=1)
    query = cv2.warpPerspective(ortho, h, (IMG_SHAPE[1], IMG_SHAPE[0]))
    return query, r_gt, cam_center


class TestClassicalEndToEnd:
    @pytest.mark.parametrize("rotation_deg", [0.0, 28.0])
    def test_recovers_camera_position(self, rng, rotation_deg):
        ortho, aff = _world(rng)
        cam_px = (400.0, 350.0)
        yaw, alt_m = 28.0, 400.0
        query, r_gt, c_gt = _render_query(ortho, aff, cam_px, yaw, alt_m)

        dem = np.zeros((H_ORTHO, W_ORTHO), np.float32)
        cfg = PipelineConfig(image_shape=IMG_SHAPE,
                             ortho_shape=(H_ORTHO, W_ORTHO))
        pose = classical_frame_to_geopose(
            query, ortho, dem, rotation_deg, K_CAM, aff, cfg
        )
        assert bool(pose.valid), int(pose.num_matches)

        out = geopose_to_wgs84_f64(pose, aff)
        want_lla = aff @ np.append([cam_px[0], cam_px[1], -alt_m / -aff[2, 2]], 1.0)
        gsd = -aff[2, 2]
        err_e = (out["lon"] - want_lla[0]) * 111320 * np.cos(np.radians(60))
        err_n = (out["lat"] - want_lla[1]) * 110574
        err_u = out["alt_ellipsoid"] - alt_m
        assert abs(err_e) < 1.0 and abs(err_n) < 1.0, (err_e, err_n)
        assert abs(err_u) < 2.0, err_u
        # ECEF agrees with the lon/lat/alt
        want_ecef = np.array(wgs84_to_ecef(out["lon"], out["lat"],
                                           out["alt_ellipsoid"]))
        assert np.allclose(out["ecef"], want_ecef, atol=1e-6)
        # device f32 ECEF within ~2 m of the f64 one
        assert np.linalg.norm(np.asarray(pose.ecef_position) - want_ecef) < 2.0
        del gsd, r_gt, c_gt

    def test_rotation_invariance(self, rng):
        """The geopose must not depend on the reference-crop rotation angle."""
        ortho, aff = _world(rng)
        query, *_ = _render_query(ortho, aff, (380.0, 380.0), -40.0, 350.0)
        dem = np.zeros((H_ORTHO, W_ORTHO), np.float32)
        cfg = PipelineConfig(image_shape=IMG_SHAPE,
                             ortho_shape=(H_ORTHO, W_ORTHO))
        outs = []
        for rot in (0.0, -40.0, 90.0):
            p = classical_frame_to_geopose(query, ortho, dem, rot, K_CAM, aff, cfg)
            assert bool(p.valid)
            o = geopose_to_wgs84_f64(p, aff)
            outs.append([o["lon"], o["lat"], o["alt_ellipsoid"]])
        outs = np.array(outs)
        scale = np.array([111320 * np.cos(np.radians(60)), 110574])
        spread_m = (np.ptp(outs[:, :2], axis=0) * scale).max()
        assert spread_m < 1.0, outs
        assert np.ptp(outs[:, 2]) < 2.0

    def test_dem_relief_improves_or_holds(self, rng):
        """With relief in the DEM the solver must stay accurate (z-lift sign
        and units correct)."""
        ortho, aff = _world(rng)
        cam_px = (400.0, 350.0)
        query, _, _ = _render_query(ortho, aff, cam_px, 0.0, 400.0)
        # gentle relief: does not change the rendered query (planar render),
        # so use small amplitude and require the solve to stay sub-2 m
        ys, xs = np.mgrid[0:H_ORTHO, 0:W_ORTHO]
        dem = (2.0 * np.sin(xs / 120.0) * np.cos(ys / 90.0)).astype(np.float32)
        cfg = PipelineConfig(image_shape=IMG_SHAPE,
                             ortho_shape=(H_ORTHO, W_ORTHO))
        p = classical_frame_to_geopose(query, ortho, dem, 0.0, K_CAM, aff, cfg)
        assert bool(p.valid)
        o = geopose_to_wgs84_f64(p, aff)
        want_lla = aff @ np.append([cam_px[0], cam_px[1], -400.0 / -aff[2, 2]], 1.0)
        err_m = np.hypot((o["lon"] - want_lla[0]) * 111320 * 0.5,
                         (o["lat"] - want_lla[1]) * 110574)
        assert err_m < 2.0


class TestDeepPipelineCompiles:
    def test_forward_compiles_and_runs(self):
        cfg = PipelineConfig(
            image_shape=(128, 160),
            ortho_shape=(256, 256),
            max_keypoints=128,
            lightglue_depth=2,
            min_matches=4,
        )
        params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(build_frame_to_geopose(cfg))
        rng = np.random.default_rng(0)
        query = jnp.asarray(rng.uniform(0, 1, (128, 160)).astype(np.float32))
        ortho = jnp.asarray(rng.uniform(0, 1, (256, 256)).astype(np.float32))
        dem = jnp.zeros((256, 256), jnp.float32)
        aff = jnp.asarray(
            pixel_to_wgs84_affine(256, 256, LEFT, BOTTOM, RIGHT, TOP),
            jnp.float32,
        )
        pose = fn(params, query, ortho, dem, 15.0, jnp.asarray(K_CAM, jnp.float32),
                  aff, jax.random.PRNGKey(1))
        # random weights -> no meaningful pose; outputs must be well-formed
        # (invalid poses may carry NaN, see GeoPose docs)
        assert pose.ecef_position.shape == (3,)
        if bool(pose.valid):
            assert np.isfinite(np.asarray(pose.lon_lat_alt)).all()
        assert pose.matched_qry.shape == (128, 2)
        # second call with different inputs reuses the compiled program
        pose2 = fn(params, ortho[:128, :160], ortho, dem, -30.0,
                   jnp.asarray(K_CAM, jnp.float32), aff, jax.random.PRNGKey(2))
        assert pose2.num_matches.dtype == jnp.int32


class TestCachedQueryDerotation:
    """Query-side derotation in the cached path (opt-in; for
    rotation-sensitive weight sets, e.g. converted upright-imagery public
    checkpoints)."""

    def _setup(self):
        from gisnav_tpu.pipeline import (
            build_frame_to_geopose_cached,
            build_reference_extractor,
        )

        cfg = PipelineConfig(
            image_shape=(128, 160),
            ortho_shape=(256, 256),
            max_keypoints=128,
            lightglue_depth=2,
            min_matches=4,
        )
        params = init_pipeline_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(3)
        query = jnp.asarray(rng.uniform(0, 1, (128, 160)).astype(np.float32))
        ortho = jnp.asarray(rng.uniform(0, 1, (256, 256)).astype(np.float32))
        dem = jnp.zeros((256, 256), jnp.float32)
        aff = jnp.asarray(
            pixel_to_wgs84_affine(256, 256, LEFT, BOTTOM, RIGHT, TOP),
            jnp.float32,
        )
        ref = jax.jit(build_reference_extractor(cfg))(params, ortho)
        fn = build_frame_to_geopose_cached(cfg)
        k = jnp.asarray(K_CAM, jnp.float32)
        return fn, params, query, ref, dem, k, aff

    def test_zero_rotation_matches_plain_path(self):
        """rotation_deg=0 must reproduce the non-derotated program exactly
        (rot90 k=0 + zero shears = identity; no interpolation)."""
        fn, params, query, ref, dem, k, aff = self._setup()
        plain = jax.jit(fn)(params, query, ref, dem, k, aff,
                            jax.random.PRNGKey(1))
        derot = jax.jit(
            lambda *a: fn(*a, rotation_deg=jnp.float32(0.0))
        )(params, query, ref, dem, k, aff, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(
            np.asarray(plain.matched_qry), np.asarray(derot.matched_qry))
        assert int(plain.num_matches) == int(derot.num_matches)

    def test_rotated_keypoints_map_back_to_camera_frame(self):
        """matched_qry must be in TRUE camera pixels: under a 90-degree
        derotation, the same physical corner detected in the derotated
        frame must land on its camera-frame position."""
        fn, params, query, ref, dem, k, aff = self._setup()
        out = jax.jit(
            lambda *a: fn(*a, rotation_deg=jnp.float32(90.0))
        )(params, query, ref, dem, k, aff, jax.random.PRNGKey(1))
        kp = np.asarray(out.matched_qry)
        assert np.isfinite(kp).all()
        # camera-frame coords stay inside the camera image bounds
        assert (kp[:, 0] >= -0.51).all() and (kp[:, 0] <= 159.51).all()
        assert (kp[:, 1] >= -0.51).all() and (kp[:, 1] <= 127.51).all()
