"""Host-side fusion filter: sensor routing, timestamps, differential mode.

Wraps the jitted EKF kernels into the robot_localization node behavior the
reference configures (``launch/params/ekf_global_node.yaml`` /
``ekf_local_node.yaml`` in hmakelin/gisnav): absolute 6-DoF pose sensors,
differential pose sensors (consecutive poses -> body-frame velocity), a
fixed output rate, and sensor timeouts.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from gisnav_tpu.fusion.ekf import (
    EKFState,
    ekf_init,
    ekf_predict,
    ekf_update_pose,
    ekf_update_velocity,
)
from gisnav_tpu.geometry.quaternion import (
    quat_inverse,
    quat_mul,
    quat_to_euler,
    quat_to_matrix,
)
from gisnav_tpu.utils.devlock import device_lock

__all__ = ["SensorConfig", "PoseFusionFilter"]

_DEFAULT_Q = np.array(
    [0.05, 0.05, 0.06, 0.03, 0.03, 0.06,  # pose
     0.025, 0.025, 0.04, 0.01, 0.01, 0.02,  # velocity
     0.01, 0.01, 0.015],  # acceleration
    dtype=np.float32,
)
"""robot_localization's default process-noise diagonal."""


@dataclasses.dataclass
class SensorConfig:
    """One pose input (mirrors a ``poseN`` block in the reference YAML)."""

    differential: bool = False
    fuse_mask: Tuple[bool, ...] = (True,) * 6  # x y z roll pitch yaw
    timeout_s: float = 30.0
    # Mahalanobis innovation gate in SDs (robot_localization's
    # ``poseN_rejection_threshold``, ``ekf_global_node.yaml:17``); <= 0
    # disables. Protects against aliased PnP solutions on self-similar
    # terrain yanking the filter hundreds of meters.
    rejection_threshold: float = 0.0


class PoseFusionFilter:
    """Multi-sensor 6-DoF pose fusion with a 15-state EKF.

    Usage::

        f = PoseFusionFilter({"deep": SensorConfig(),
                              "vo": SensorConfig(differential=True)})
        f.submit("deep", t, position, quat_xyzw, covariance6)
        state = f.state_at(t)
    """

    def __init__(
        self,
        sensors: Dict[str, SensorConfig],
        process_noise: Optional[np.ndarray] = None,
        backend: str = "ekf",
        reset_after_s: float = 30.0,
    ):
        """``backend``: "ekf" (default) or "ukf" — the reference runs its
        global filter as a UKF and its local one as an EKF.

        ``reset_after_s``: measurement-gap ceiling. Predicting across a
        multi-minute dropout (e.g. frames dropped while device programs
        compile) grows the covariance beyond f32 range and NaNs the filter;
        past this gap an absolute measurement RE-SEEDS the state instead
        (robot_localization's sensor-timeout behavior), and state queries
        clamp their extrapolation horizon to it."""
        if backend == "ukf":
            from gisnav_tpu.fusion import ukf as _k

            self._predict = _k.ukf_predict
            self._update_pose = _k.ukf_update_pose
            self._update_velocity = _k.ukf_update_velocity
        else:
            self._predict = ekf_predict
            self._update_pose = ekf_update_pose
            self._update_velocity = ekf_update_velocity
        self._sensors = dict(sensors)
        self._q = np.asarray(
            process_noise if process_noise is not None else _DEFAULT_Q,
            np.float32,
        )
        self._state: Optional[EKFState] = None
        self._stamp_us: Optional[int] = None
        self._prev_pose: Dict[str, Tuple[int, np.ndarray, np.ndarray]] = {}
        # submit/state_at run on different bus worker threads plus the
        # fixed-rate output timer; the (x, P) read-modify-write must be
        # atomic — a torn pair NaNs the filter within seconds of flight
        # (jitted kernels release the GIL, so the race is real). The mutex
        # is the PROCESS-WIDE device lock, not a private one: the jitted
        # EKF/UKF kernels dispatch JAX, and concurrent first-touch
        # tracing/lowering from another node thread corrupts jax's MLIR
        # lowering cache (see utils/devlock.py). One shared RLock also
        # removes lock-ordering hazards with handlers that already hold it.
        self._mutex = device_lock
        self._reset_after_s = float(reset_after_s)

    @property
    def initialized(self) -> bool:
        return self._state is not None

    @property
    def latest_stamp_us(self):
        """Stamp of the newest fused measurement (None before init)."""
        with self._mutex:
            return self._stamp_us

    def set_pose(self, stamp_us: int, position, quat_xyzw) -> None:
        """Hard-set the filter pose (the reference seeds its EKF once via the
        /robot_localization/set_pose service, ``pose_node.py:135-168``).

        Pose states start tight; velocity/acceleration start WIDE (the
        vehicle may already be moving fast when the filter initializes —
        with a tiny velocity variance the filter would refuse to learn
        motion and lag badly, then overshoot).
        """
        with self._mutex:
            return self._set_pose_locked(stamp_us, position, quat_xyzw)

    def _set_pose_locked(self, stamp_us: int, position, quat_xyzw) -> None:
        rpy = quat_to_euler(np.asarray(quat_xyzw))
        x0 = np.zeros(15, np.float32)
        x0[0:3] = np.asarray(position)
        x0[3:6] = rpy
        p0 = np.concatenate([
            np.full(6, 1e-4, np.float32),  # pose: trusted
            np.full(3, 25.0, np.float32),  # velocity: unknown (+-5 m/s SD)
            # angular rate: +-1 rad/s SD — NOT 25: sigma-point filters
            # sample sqrt-P-scaled rate deviations through the euler-rate
            # trig, and +-5 rad/s spreads push pitch past the singularity
            np.full(3, 1.0, np.float32),
            np.full(3, 10.0, np.float32),  # acceleration: unknown
        ])
        self._state = ekf_init(x0, p0_diag=p0)
        self._stamp_us = int(stamp_us)

    def _predict_to(self, stamp_us: int) -> None:
        dt = (stamp_us - self._stamp_us) / 1e6
        if dt > 0:
            self._state = self._predict(self._state, np.float32(dt), self._q)
            self._stamp_us = int(stamp_us)

    def submit(self, sensor: str, stamp_us: int, position, quat_xyzw,
               covariance6: Optional[np.ndarray] = None) -> None:
        """Fuse one stamped pose measurement from a configured sensor."""
        cfg = self._sensors[sensor]
        position = np.asarray(position, np.float64)
        quat_xyzw = np.asarray(quat_xyzw, np.float64)
        if covariance6 is None:
            covariance6 = np.diag([9.0, 9.0, 9.0, 0.0027, 0.0027, 0.0027])
        r_diag = np.maximum(np.diag(np.asarray(covariance6)), 1e-9).astype(
            np.float32
        )
        mask = np.asarray(cfg.fuse_mask, np.float32)

        with self._mutex:
            self._submit_locked(cfg, sensor, int(stamp_us), position,
                                quat_xyzw, r_diag, mask)

    def _submit_locked(self, cfg, sensor, stamp_us, position, quat_xyzw,
                       r_diag, mask) -> None:
        if self._state is not None and not (
                np.all(np.isfinite(np.asarray(self._state.x)))
                and np.all(np.isfinite(np.asarray(self._state.p)))):
            # divergence self-heal (robot_localization is likewise reset on
            # divergence): a NaN state otherwise persists forever — every
            # update propagates it — freezing the map->odom anchor at its
            # last (possibly transient-erroneous) value while odometry keeps
            # flowing. Observed: the global UKF NaN'd ~76 s into the CLI
            # e2e hover (sigma points through the euler-rate trig during
            # the wide-covariance convergence transient) and every later
            # fix replayed a stale 10.4 m offset. Drop the state; the next
            # absolute measurement re-seeds it below.
            import logging

            logging.getLogger("gisnav_tpu.fusion").warning(
                "non-finite filter state at %d; resetting for re-seed",
                stamp_us)
            self._state = None
            self._stamp_us = None
            self._prev_pose.clear()
        if self._state is None:
            if cfg.differential:
                # differential sensors cannot initialize an absolute state
                self._prev_pose[sensor] = (int(stamp_us), position, quat_xyzw)
                return
            self._set_pose_locked(stamp_us, position, quat_xyzw)
            return

        if stamp_us < self._stamp_us:
            return  # stale measurement (robot_localization drops these too)

        gap_s = (stamp_us - self._stamp_us) / 1e6
        if gap_s > self._reset_after_s:
            # dropout longer than the trustable prediction horizon: re-seed
            # from an absolute measurement, re-arm a differential one
            if cfg.differential:
                self._prev_pose[sensor] = (int(stamp_us), position,
                                           quat_xyzw)
                return
            self._set_pose_locked(stamp_us, position, quat_xyzw)
            return

        self._predict_to(int(stamp_us))

        if not cfg.differential:
            rpy = quat_to_euler(quat_xyzw)
            z = np.concatenate([position, rpy]).astype(np.float32)
            self._state = self._update_pose(
                self._state, z, r_diag, mask,
                np.float32(cfg.rejection_threshold))
        else:
            prev = self._prev_pose.get(sensor)
            self._prev_pose[sensor] = (int(stamp_us), position, quat_xyzw)
            if prev is None:
                return
            t0, p0, q0 = prev
            dt = (stamp_us - t0) / 1e6
            if dt <= 0 or dt > cfg.timeout_s:
                return
            # world-frame delta -> body-frame velocity at previous attitude
            r0 = quat_to_matrix(q0)
            v_body = r0.T @ (position - p0) / dt
            q_delta = quat_mul(quat_inverse(q0), quat_xyzw)
            w_body = np.asarray(quat_to_euler(q_delta)) / dt
            z = np.concatenate([v_body, w_body]).astype(np.float32)
            self._state = self._update_velocity(
                self._state, z, r_diag / max(dt, 1e-3), mask,
                np.float32(cfg.rejection_threshold)
            )

    def state_at(self, stamp_us: int):
        """Predict (without mutating) to a query time and return the odometry.

        :return: dict with position (3,), quat_xyzw (4,), velocity_body (3,),
            angular_velocity_body (3,), covariance (15, 15) — or None if the
            filter has not been initialized yet.
        """
        with self._mutex:  # consistent (state, stamp) snapshot
            if self._state is None:
                return None
            state = self._state
            dt = (stamp_us - self._stamp_us) / 1e6
        # clamp the extrapolation horizon (a query far past the newest
        # measurement — e.g. wall-clock output timers during a compile
        # stall — must not blow the covariance through f32 range)
        dt = min(dt, self._reset_after_s)
        if dt > 0:
            state = self._predict(state, np.float32(dt), self._q)
        x = np.asarray(state.x, np.float64)
        from gisnav_tpu.geometry.quaternion import euler_to_quat

        return {
            "stamp_us": int(stamp_us),
            "position": x[0:3],
            "quat_xyzw": euler_to_quat(*x[3:6]),
            "velocity_body": x[6:9],
            "angular_velocity_body": x[9:12],
            "covariance": np.asarray(state.p, np.float64),
        }

    # convenience for tests / viz
    def rotation_matrix(self) -> np.ndarray:
        x = np.asarray(self._state.x)
        from gisnav_tpu.geometry.quaternion import euler_to_quat

        return quat_to_matrix(euler_to_quat(*x[3:6]))
