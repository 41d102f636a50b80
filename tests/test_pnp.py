"""RANSAC-PnP parity tests vs cv2.solvePnPRansac on synthetic correspondences."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gisnav_tpu.pnp import gather_elevation, keypoints_to_3d, project_points, ransac_pnp

K = np.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]])


def _synthetic_scene(rng, n=200, relief=0.0, noise_px=0.5, outlier_frac=0.0,
                     yaw=0.3, pitch=0.1, alt=120.0):
    """Nadir-ish camera above a terrain patch; returns (pts3d, pts2d, R, t)."""
    from scipy.spatial.transform import Rotation

    pts3d = np.zeros((n, 3))
    pts3d[:, 0] = rng.uniform(-100, 100, n)
    pts3d[:, 1] = rng.uniform(-100, 100, n)
    pts3d[:, 2] = rng.uniform(-relief, relief, n) if relief > 0 else 0.0

    # camera looking down: object z up, camera z forward (down) => rotate pi
    # about x, then small perturbations
    r_gt = (
        Rotation.from_euler("xyz", [np.pi + pitch, 0.0, yaw]).as_matrix()
    )
    cam_center = np.array([10.0, -20.0, alt])
    t_gt = -r_gt @ cam_center

    pc = pts3d @ r_gt.T + t_gt
    assert (pc[:, 2] > 0).all(), "all points must be in front of the camera"
    proj = pc @ K.T
    pts2d = proj[:, :2] / proj[:, 2:3]
    pts2d += rng.normal(0, noise_px, pts2d.shape)

    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        pts2d[idx] = rng.uniform(0, 640, (n_out, 2))
    return pts3d, pts2d, r_gt, t_gt


def _pose_errors(r, t, r_gt, t_gt):
    dr = np.asarray(r) @ r_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    # camera center error is the meaningful metric (meters)
    c = -np.asarray(r).T @ np.asarray(t)
    c_gt = -r_gt.T @ t_gt
    return ang, np.linalg.norm(c - c_gt)


class TestRansacPnP:
    def test_planar_clean(self, rng):
        pts3d, pts2d, r_gt, t_gt = _synthetic_scene(rng, noise_px=0.0)
        res = ransac_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        assert bool(res.valid)
        ang, dist = _pose_errors(res.r, res.t, r_gt, t_gt)
        assert ang < 0.05 and dist < 0.05, (ang, dist)

    def test_relief_noise(self, rng):
        pts3d, pts2d, r_gt, t_gt = _synthetic_scene(rng, relief=15.0, noise_px=0.5)
        res = ransac_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        assert bool(res.valid)
        ang, dist = _pose_errors(res.r, res.t, r_gt, t_gt)
        assert ang < 0.3 and dist < 1.0, (ang, dist)

    @pytest.mark.parametrize("outlier_frac", [0.2, 0.4])
    def test_outliers(self, rng, outlier_frac):
        pts3d, pts2d, r_gt, t_gt = _synthetic_scene(
            rng, relief=10.0, noise_px=0.5, outlier_frac=outlier_frac
        )
        res = ransac_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        assert bool(res.valid)
        ang, dist = _pose_errors(res.r, res.t, r_gt, t_gt)
        assert ang < 0.5 and dist < 1.5, (ang, dist)
        # inlier classification should reject most planted outliers
        assert int(res.num_inliers) > 0.5 * len(pts3d)

    def test_matches_cv2(self, rng):
        pts3d, pts2d, r_gt, t_gt = _synthetic_scene(
            rng, relief=10.0, noise_px=0.5, outlier_frac=0.2
        )
        ok, rvec, tvec, _ = cv2.solvePnPRansac(
            pts3d.astype(np.float32),
            pts2d.astype(np.float32),
            K,
            np.zeros((4, 1)),
            useExtrinsicGuess=False,
            iterationsCount=100,
        )
        assert ok
        r_cv, _ = cv2.Rodrigues(rvec)
        ang_cv, dist_cv = _pose_errors(r_cv, tvec.ravel(), r_gt, t_gt)

        res = ransac_pnp(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        ang, dist = _pose_errors(res.r, res.t, r_gt, t_gt)
        # at least as accurate as cv2 up to a small slack
        assert ang <= ang_cv + 0.2, (ang, ang_cv)
        assert dist <= dist_cv + 0.5, (dist, dist_cv)

    def test_padded_mask(self, rng):
        pts3d, pts2d, r_gt, t_gt = _synthetic_scene(rng, relief=5.0, noise_px=0.3)
        n = len(pts3d)
        pad = 56
        pts3d_p = np.vstack([pts3d, np.full((pad, 3), 1e6)])
        pts2d_p = np.vstack([pts2d, np.full((pad, 2), -1e6)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        res = ransac_pnp(
            jnp.asarray(pts3d_p), jnp.asarray(pts2d_p), jnp.asarray(K),
            jnp.asarray(mask),
        )
        assert bool(res.valid)
        ang, dist = _pose_errors(res.r, res.t, r_gt, t_gt)
        assert ang < 0.3 and dist < 1.0
        assert not bool(np.asarray(res.inliers)[n:].any())

    def test_too_few_points_invalid(self, rng):
        pts3d = rng.uniform(-10, 10, (64, 3))
        pts2d = rng.uniform(0, 640, (64, 2))
        mask = np.zeros(64, bool)
        mask[:5] = True
        res = ransac_pnp(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K),
            jnp.asarray(mask), min_inliers=10,
        )
        assert not bool(res.valid)

    def test_jit_compiles_once(self, rng):
        pts3d, pts2d, *_ = _synthetic_scene(rng)
        f = jax.jit(lambda a, b, k: ransac_pnp(a, b, k))
        r1 = f(jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(K))
        pts3d2, pts2d2, *_ = _synthetic_scene(rng, yaw=1.0)
        r2 = f(jnp.asarray(pts3d2), jnp.asarray(pts2d2), jnp.asarray(K))
        assert bool(r1.valid) and bool(r2.valid)


class TestProjectPoints:
    def test_matches_cv2_project(self, rng):
        pts3d, _, r_gt, t_gt = _synthetic_scene(rng, relief=20.0)
        want, _ = cv2.projectPoints(
            pts3d, cv2.Rodrigues(r_gt)[0], t_gt, K, np.zeros(4)
        )
        got = project_points(
            jnp.asarray(pts3d), jnp.asarray(r_gt), jnp.asarray(t_gt), jnp.asarray(K)
        )
        assert np.allclose(got, want.squeeze(), atol=1e-2)


class TestDEM:
    def test_gather_matches_reference_semantics(self, rng):
        dem = rng.integers(0, 255, (64, 96)).astype(np.float32)
        pts = np.stack(
            [rng.uniform(0, 95.9, 50), rng.uniform(0, 63.9, 50)], axis=1
        )
        got = gather_elevation(jnp.asarray(dem), jnp.asarray(pts))
        x, y = np.floor(pts[:, 0]).astype(int), np.floor(pts[:, 1]).astype(int)
        assert np.allclose(got, dem[y, x])

    def test_out_of_bounds_zero(self):
        dem = np.ones((8, 8), np.float32)
        pts = np.array([[-1.0, 2.0], [7.5, 7.5], [100.0, 2.0]])
        got = np.asarray(gather_elevation(jnp.asarray(dem), jnp.asarray(pts)))
        assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 0.0

    def test_keypoints_to_3d_flat(self):
        pts = jnp.asarray(np.array([[1.0, 2.0], [3.0, 4.0]]))
        out = keypoints_to_3d(pts, None)
        assert out.shape == (2, 3)
        assert np.allclose(np.asarray(out)[:, 2], 0.0)
