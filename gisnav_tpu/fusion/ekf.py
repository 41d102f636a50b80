"""15-state EKF in JAX (robot_localization-equivalent, jit-compiled).

The reference delegates fusion to the C++ ``robot_localization`` package
(config only, ``launch/params/ekf_global_node.yaml:30-50`` in
hmakelin/gisnav): a 15-state omnidirectional EKF over
(x, y, z, roll, pitch, yaw, vx, vy, vz, vroll, vpitch, vyaw, ax, ay, az)
fusing 6-DoF pose measurements (absolute from the deep matcher, differential
from VO). This is the in-framework JAX equivalent: the nonlinear transition
is written once in jnp and its Jacobian comes from ``jax.jacfwd``, so predict
and update are each a single fused XLA program — no hand-derived Jacobian to
get wrong, and the filter is unit-testable without a ROS graph.

State layout (same as robot_localization):
  [0:3]  position (world frame)
  [3:6]  orientation roll, pitch, yaw (world frame)
  [6:9]  linear velocity (BODY frame)
  [9:12] angular velocity (BODY frame)
  [12:15] linear acceleration (BODY frame)
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EKFState", "ekf_init", "ekf_predict", "ekf_update_pose",
           "ekf_update_velocity"]

STATE_DIM = 15
POSE_DIM = 6


class EKFState(NamedTuple):
    x: jnp.ndarray  # (15,)
    p: jnp.ndarray  # (15, 15)


def _rot_from_rpy(rpy):
    """Body->world rotation from roll, pitch, yaw (ZYX convention)."""
    r, p, y = rpy[0], rpy[1], rpy[2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


def _euler_rate_matrix(rpy):
    """Maps body angular velocity to euler-angle rates.

    tan/sec are clamped to the flyable-pitch regime (|pitch| <~ 84 deg):
    near the euler singularity they reach 1e6 and a SAMPLED covariance
    (UKF sigma points with wide angular-rate spread push pitch through
    +-pi/2) squares that into the state covariance — observed P inflating
    to 1e11 within three predicts. A multicopter/gimbal never flies the
    clamped regime; the EKF's jacobians get the same protection.
    """
    r, p = rpy[0], rpy[1]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp = jnp.maximum(jnp.cos(p), 0.1)
    tp = jnp.clip(jnp.tan(p), -10.0, 10.0)
    return jnp.array(
        [
            [1.0, sr * tp, cr * tp],
            [0.0, cr, -sr],
            [0.0, sr / cp, cr / cp],
        ]
    )


def _transition(x, dt):
    """Nonlinear state transition (constant body acceleration model)."""
    pos, rpy = x[0:3], x[3:6]
    v, w, a = x[6:9], x[9:12], x[12:15]
    rot = _rot_from_rpy(rpy)
    pos_new = pos + rot @ (v * dt + 0.5 * a * dt * dt)
    rpy_new = rpy + _euler_rate_matrix(rpy) @ w * dt
    v_new = v + a * dt
    return jnp.concatenate([pos_new, rpy_new, v_new, w, a])


def _wrap_angle(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def ekf_init(
    x0=None,
    p0_diag: float | jnp.ndarray = 1e-9,
) -> EKFState:
    """Fresh filter state (robot_localization starts with a tiny P)."""
    x = jnp.zeros(STATE_DIM) if x0 is None else jnp.asarray(x0, jnp.float32)
    p = jnp.eye(STATE_DIM) * p0_diag
    return EKFState(x=x, p=p)


@jax.jit
def ekf_predict(state: EKFState, dt, q_diag) -> EKFState:
    """Predict step: integrate the motion model, propagate covariance.

    :param q_diag: (15,) process noise diagonal per second
    """
    # f32 matmul precision: covariance propagation in bf16 operands slowly
    # degrades P's conditioning on TPU; 15x15 matmuls, full precision free
    with jax.default_matmul_precision("float32"):
        f = partial(_transition, dt=dt)
        x_new = f(state.x)
        jac = jax.jacfwd(f)(state.x)
        q = jnp.diag(q_diag) * jnp.maximum(dt, 1e-6)
        p_new = jac @ state.p @ jac.T + q
        x_new = x_new.at[3:6].set(_wrap_angle(x_new[3:6]))
        return EKFState(x=x_new, p=p_new)


@jax.jit
def ekf_update_pose(state: EKFState, z, r_diag, mask,
                    rejection_threshold=0.0) -> EKFState:
    """Update with a 6-DoF pose measurement (x, y, z, roll, pitch, yaw).

    :param z: (6,) measurement in the world frame
    :param r_diag: (6,) measurement noise variances
    :param mask: (6,) 1.0 to fuse a component, 0.0 to ignore (the
        robot_localization per-sensor config vector)
    :param rejection_threshold: Mahalanobis innovation gate (standard
        deviations); <= 0 disables. robot_localization's
        ``poseN_rejection_threshold`` (``ekf_global_node.yaml:17``) — a
        wildly wrong PnP solution (e.g. an aliased match on self-similar
        terrain) must not yank the filter.
    """
    # f32 precision: keep the Joseph-form covariance update exact
    with jax.default_matmul_precision("float32"):
        h = jnp.zeros((POSE_DIM, STATE_DIM)).at[:, :POSE_DIM].set(
            jnp.eye(POSE_DIM))
        # masked components: zero their H rows and unit their R diag — the
        # gain columns become exactly zero and S stays well-conditioned
        # (a 1e12 masked variance makes S's f32 inverse leak error into the
        # live block; see the UKF's identical fix)
        h = h * mask[:, None]
        innov = z - state.x[:POSE_DIM]
        innov = innov.at[3:6].set(_wrap_angle(innov[3:6]))
        innov = innov * mask

        r = jnp.diag(jnp.where(mask > 0, r_diag, 1.0))
        s = h @ state.p @ h.T + r
        s_inv = jnp.linalg.inv(s)
        thr = jnp.asarray(rejection_threshold, jnp.float32)
        d2 = innov @ s_inv @ innov
        accept = jnp.where((thr <= 0.0) | (d2 <= thr * thr), 1.0, 0.0)
        # rejected measurement -> zero gain: x and P pass through unchanged
        k = accept * (state.p @ h.T @ s_inv)
        x_new = state.x + k @ innov
        x_new = x_new.at[3:6].set(_wrap_angle(x_new[3:6]))
        ident = jnp.eye(STATE_DIM)
        # Joseph form for numerical stability
        ikh = ident - k @ h
        p_new = ikh @ state.p @ ikh.T + k @ r @ k.T
        return EKFState(x=x_new, p=p_new)


@jax.jit
def ekf_update_velocity(state: EKFState, z, r_diag, mask,
                        rejection_threshold=0.0) -> EKFState:
    """Update with a 6-DoF body-frame velocity measurement
    (vx, vy, vz, vroll, vpitch, vyaw).

    Used for differential pose sensors: robot_localization's
    ``pose_differential`` mode converts consecutive poses into velocity
    measurements before fusing (the reference fuses VO this way,
    ``ekf_global_node.yaml:41-47``).
    """
    # f32 precision: keep the Joseph-form covariance update exact
    with jax.default_matmul_precision("float32"):
        h = jnp.zeros((POSE_DIM, STATE_DIM)).at[:, 6:12].set(
            jnp.eye(POSE_DIM))
        h = h * mask[:, None]  # see ekf_update_pose
        innov = (z - state.x[6:12]) * mask
        r = jnp.diag(jnp.where(mask > 0, r_diag, 1.0))
        s = h @ state.p @ h.T + r
        s_inv = jnp.linalg.inv(s)
        thr = jnp.asarray(rejection_threshold, jnp.float32)
        d2 = innov @ s_inv @ innov
        accept = jnp.where((thr <= 0.0) | (d2 <= thr * thr), 1.0, 0.0)
        k = accept * (state.p @ h.T @ s_inv)
        x_new = state.x + k @ innov
        x_new = x_new.at[3:6].set(_wrap_angle(x_new[3:6]))
        ident = jnp.eye(STATE_DIM)
        ikh = ident - k @ h
        p_new = ikh @ state.p @ ikh.T + k @ r @ k.T
        return EKFState(x=x_new, p=p_new)