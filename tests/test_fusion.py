"""EKF fusion tests: convergence, noise rejection, differential VO fusion."""
import numpy as np

from gisnav_tpu.fusion import (
    PoseFusionFilter,
    ekf_init,
    ekf_predict,
    ekf_update_pose,
)
from gisnav_tpu.fusion.filter import SensorConfig
from gisnav_tpu.geometry.quaternion import euler_to_quat


class TestEKFKernels:
    def test_predict_constant_velocity(self):
        x0 = np.zeros(15, np.float32)
        x0[6] = 2.0  # 2 m/s body x, yaw 0 => world x
        s = ekf_init(x0, p0_diag=1e-6)
        q = np.full(15, 1e-3, np.float32)
        for _ in range(10):
            s = ekf_predict(s, np.float32(0.1), q)
        assert np.isclose(float(s.x[0]), 2.0, atol=1e-3)
        assert np.isclose(float(s.x[1]), 0.0, atol=1e-6)

    def test_predict_velocity_follows_yaw(self):
        x0 = np.zeros(15, np.float32)
        x0[5] = np.pi / 2  # yaw 90 deg => body x points to world y
        x0[6] = 1.0
        s = ekf_init(x0, p0_diag=1e-6)
        s = ekf_predict(s, np.float32(1.0), np.full(15, 1e-6, np.float32))
        assert np.isclose(float(s.x[1]), 1.0, atol=1e-5)
        assert abs(float(s.x[0])) < 1e-5

    def test_update_pulls_toward_measurement(self):
        s = ekf_init(np.zeros(15, np.float32), p0_diag=1.0)
        z = np.array([1.0, 2.0, 3.0, 0, 0, 0.5], np.float32)
        s = ekf_update_pose(s, z, np.full(6, 0.01, np.float32),
                            np.ones(6, np.float32))
        assert np.allclose(np.asarray(s.x[:3]), [1, 2, 3], atol=0.05)
        assert np.isclose(float(s.x[5]), 0.5, atol=0.01)

    def test_update_mask_ignores_components(self):
        s = ekf_init(np.zeros(15, np.float32), p0_diag=1.0)
        z = np.array([1.0, 0, 0, 0, 0, 1.0], np.float32)
        mask = np.array([1, 1, 1, 1, 1, 0], np.float32)  # ignore yaw
        s = ekf_update_pose(s, z, np.full(6, 0.01, np.float32), mask)
        assert np.isclose(float(s.x[0]), 1.0, atol=0.05)
        assert abs(float(s.x[5])) < 1e-6

    def test_angle_wrap_in_innovation(self):
        x0 = np.zeros(15, np.float32)
        x0[5] = np.pi - 0.1
        s = ekf_init(x0, p0_diag=1.0)
        z = np.array([0, 0, 0, 0, 0, -np.pi + 0.1], np.float32)  # 0.2 rad away
        s = ekf_update_pose(s, z, np.full(6, 0.01, np.float32),
                            np.array([0, 0, 0, 0, 0, 1], np.float32))
        # must wrap toward +-pi, not spin 2*pi-0.2 backwards
        assert abs(abs(float(s.x[5])) - np.pi) < 0.11


class TestPoseFusionFilter:
    def _fly(self, f, noise, seed=0, n=50, dt_us=200_000):
        """Straight-line flight at 5 m/s east, fused from noisy poses."""
        rng = np.random.default_rng(seed)
        t = 1_000_000
        for i in range(n):
            t += dt_us
            true_pos = np.array([5.0 * (t - 1_000_000) / 1e6, 0.0, 100.0])
            meas = true_pos + rng.normal(0, noise, 3)
            f.submit("deep", t, meas, euler_to_quat(0, 0, 0),
                     np.diag([noise**2] * 3 + [0.01] * 3))
        return t, true_pos

    def test_smooths_noisy_absolute_poses(self):
        f = PoseFusionFilter({"deep": SensorConfig()})
        rng = np.random.default_rng(1)
        t = 1_000_000
        meas_errs, filt_errs, vels = [], [], []
        for i in range(200):
            t += 200_000
            true_pos = np.array([5.0 * (t - 1_000_000) / 1e6, 0.0, 100.0])
            meas = true_pos + rng.normal(0, 3.0, 3)
            f.submit("deep", t, meas, euler_to_quat(0, 0, 0),
                     np.diag([9.0] * 3 + [0.01] * 3))
            out = f.state_at(t)
            if i > 50:  # after settling
                meas_errs.append(np.linalg.norm(meas - true_pos))
                filt_errs.append(np.linalg.norm(out["position"] - true_pos))
                vels.append(out["velocity_body"][0])
        # the filter must beat the raw measurements on average...
        assert np.mean(filt_errs) < 0.75 * np.mean(meas_errs)
        # ...and learn the velocity from positions alone
        assert np.isclose(np.mean(vels), 5.0, atol=1.0)

    def test_rejection_gate_survives_outlier_fix(self):
        """An aliased 500 m PnP jump must be rejected (robot_localization
        pose0_rejection_threshold behavior), and good fixes afterwards must
        still fuse."""
        for backend in ("ekf", "ukf"):
            f = PoseFusionFilter(
                {"deep": SensorConfig(rejection_threshold=3.0)},
                backend=backend,
            )
            t, true_pos = self._fly(f, noise=1.0, n=40)
            # wild outlier
            t += 200_000
            true_pos = true_pos + np.array([1.0, 0, 0])
            f.submit("deep", t, true_pos + np.array([500.0, 0, 0]),
                     euler_to_quat(0, 0, 0),
                     np.diag([1.0] * 3 + [0.01] * 3))
            out = f.state_at(t)
            err = np.linalg.norm(out["position"] - true_pos)
            assert err < 10.0, (backend, err)
            # recovery: good fixes keep fusing
            for _ in range(10):
                t += 200_000
                true_pos = true_pos + np.array([1.0, 0, 0])
                f.submit("deep", t, true_pos, euler_to_quat(0, 0, 0),
                         np.diag([1.0] * 3 + [0.01] * 3))
            out = f.state_at(t)
            err = np.linalg.norm(out["position"] - true_pos)
            assert err < 3.0, (backend, err)

    def test_rejection_disabled_by_default(self):
        f = PoseFusionFilter({"deep": SensorConfig()})
        t, true_pos = self._fly(f, noise=0.5, n=30)
        t += 200_000
        f.submit("deep", t, true_pos + np.array([500.0, 0, 0]),
                 euler_to_quat(0, 0, 0), np.diag([1.0] * 3 + [0.01] * 3))
        out = f.state_at(t)
        # without a gate the outlier DOES move the filter substantially
        assert np.linalg.norm(out["position"] - true_pos) > 50.0

    def test_differential_vo_initializes_after_absolute(self):
        f = PoseFusionFilter({
            "deep": SensorConfig(),
            "vo": SensorConfig(differential=True),
        })
        q = euler_to_quat(0, 0, 0)
        # VO before init must not crash nor initialize
        f.submit("vo", 1_000_000, [0, 0, 0], q)
        assert not f.initialized
        f.submit("deep", 1_100_000, [0, 0, 100], q)
        assert f.initialized
        # now feed VO deltas implying 2 m/s x
        t = 1_100_000
        for i in range(20):
            t += 100_000
            f.submit("vo", t, [2.0 * (t - 1_100_000) / 1e6, 0, 0], q,
                     np.diag([0.01] * 6))
        out = f.state_at(t)
        assert np.isclose(out["velocity_body"][0], 2.0, atol=0.5)

    def test_nonfinite_state_self_heals(self):
        """A diverged (NaN) state must re-seed from the next absolute
        measurement, not poison every subsequent update: without the reset
        the map->odom anchor freezes at its last pre-divergence value and
        every later fix replays a stale offset (observed 10.4 m in the CLI
        e2e hover when the global UKF NaN'd mid-transient)."""
        import dataclasses

        f = PoseFusionFilter({"deep": SensorConfig(),
                              "vo": SensorConfig(differential=True)})
        f.submit("deep", 1_000_000, np.array([1.0, 2.0, 100.0]),
                 euler_to_quat(0, 0, 0))
        # poison the state as a covariance blow-up / singular update would
        bad_x = np.asarray(f._state.x).copy()
        bad_x[3] = np.nan
        f._state = dataclasses.replace(
            f._state, x=type(f._state.x)(bad_x)
        ) if dataclasses.is_dataclass(f._state) else f._state._replace(
            x=bad_x)
        f.submit("deep", 2_000_000, np.array([3.0, 4.0, 100.0]),
                 euler_to_quat(0, 0, 0))
        est = f.state_at(2_000_000)
        assert est is not None
        assert np.all(np.isfinite(est["position"]))
        assert np.allclose(est["position"], [3.0, 4.0, 100.0], atol=1e-3)
        # differential sensors re-arm too (prev pair cleared on reset)
        f.submit("vo", 2_500_000, np.array([3.5, 4.0, 100.0]),
                 euler_to_quat(0, 0, 0))
        est = f.state_at(2_500_000)
        assert np.all(np.isfinite(est["position"]))

    def test_stale_measurements_dropped(self):
        f = PoseFusionFilter({"deep": SensorConfig()})
        q = euler_to_quat(0, 0, 0)
        f.submit("deep", 2_000_000, [0, 0, 0], q)
        f.submit("deep", 1_000_000, [100, 100, 100], q)  # stale
        out = f.state_at(2_000_000)
        assert np.linalg.norm(out["position"]) < 1.0

    def test_state_at_extrapolates(self):
        f = PoseFusionFilter({"deep": SensorConfig()})
        t, true_pos = self._fly(f, noise=0.1)
        out = f.state_at(t + 1_000_000)  # 1 s into the future
        expect_x = true_pos[0] + 5.0
        assert np.isclose(out["position"][0], expect_x, atol=1.0)


class TestUKF:
    def test_predict_matches_ekf_on_smooth_dynamics(self):
        from gisnav_tpu.fusion import ekf_predict, ukf_predict

        x0 = np.zeros(15, np.float32)
        x0[5] = 0.7  # yaw
        x0[6] = 3.0  # body vx
        x0[11] = 0.2  # yaw rate
        # with a tight covariance the sigma spread is tiny, so the unscented
        # mean must coincide with the EKF's propagated mean (with a wide P
        # they legitimately differ — that is the point of the UKF)
        s = ekf_init(x0, p0_diag=1e-6)
        q = np.full(15, 1e-5, np.float32)
        se = ekf_predict(s, np.float32(0.2), q)
        su = ukf_predict(s, np.float32(0.2), q)
        assert np.allclose(np.asarray(se.x), np.asarray(su.x), atol=5e-3)
        assert np.allclose(np.asarray(se.p), np.asarray(su.p), atol=1e-4)

    def test_ukf_update_pulls_toward_measurement(self):
        from gisnav_tpu.fusion import ukf_update_pose

        s = ekf_init(np.zeros(15, np.float32), p0_diag=1.0)
        z = np.array([1.0, 2.0, 3.0, 0, 0, 0.5], np.float32)
        s = ukf_update_pose(s, z, np.full(6, 0.01, np.float32),
                            np.ones(6, np.float32))
        assert np.allclose(np.asarray(s.x[:3]), [1, 2, 3], atol=0.05)
        assert np.isclose(float(s.x[5]), 0.5, atol=0.01)

    def test_full_filter_ukf_backend(self):
        f = PoseFusionFilter({"deep": SensorConfig()}, backend="ukf")
        rng = np.random.default_rng(3)
        t = 1_000_000
        errs = []
        for i in range(100):
            t += 200_000
            true_pos = np.array([5.0 * (t - 1_000_000) / 1e6, 0.0, 100.0])
            meas = true_pos + rng.normal(0, 2.0, 3)
            f.submit("deep", t, meas, euler_to_quat(0, 0, 0),
                     np.diag([4.0] * 3 + [0.01] * 3))
            if i > 40:
                out = f.state_at(t)
                errs.append(np.linalg.norm(out["position"] - true_pos))
        assert np.mean(errs) < 2.0


class TestFilterScaleStability:
    """f32 filters must stay finite and tracking far from the frame origin.

    Regression for three compounding failure modes found at km-scale map
    frames: Merwe weights ~1/alpha^2 amplifying nonlinear-curvature
    residuals, sigma-point angular-rate spreads crossing the euler-rate
    singularity (tan(pitch) -> 1e6 squared into P), and the 1e12
    masked-variance S whose f32 inverse leaks garbage into the live block.
    """

    def _track(self, backend, scale, steps=120):
        import numpy as np

        from gisnav_tpu.fusion.filter import PoseFusionFilter, SensorConfig

        f = PoseFusionFilter(
            {"deep": SensorConfig(fuse_mask=(True,) * 3 + (False,) * 3,
                                  rejection_threshold=3.0)},
            backend=backend)
        errs = []
        for i in range(steps):
            p = np.array([scale + 2.0 * i + np.sin(i),
                          scale * 0.5 + 1.5 * i, 500.0 + 0.1 * i])
            f.submit("deep", 1_000_000 + i * 500_000, p,
                     np.array([0.0, 0.0, 0.0, 1.0]))
            est = f.state_at(1_000_000 + i * 500_000)
            assert np.all(np.isfinite(est["position"])), (
                backend, scale, i)
            errs.append(float(np.linalg.norm(est["position"] - p)))
        return errs

    def test_ukf_finite_and_tracking_at_km_scale(self):
        import numpy as np

        errs = self._track("ukf", 1000.0)
        assert np.mean(errs[-40:]) < 3.0

    def test_ekf_finite_and_tracking_at_km_scale(self):
        import numpy as np

        errs = self._track("ekf", 1000.0)
        assert np.mean(errs[-40:]) < 3.0

    def test_ukf_survives_100km_origin_offset(self):
        import numpy as np

        # far outside the production envelope (the map frame re-anchors at
        # bootstrap); requires bounded f32 degradation, not divergence
        errs = self._track("ukf", 100_000.0, steps=60)
        assert np.mean(errs[-20:]) < 15.0
