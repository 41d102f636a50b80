"""15-state Unscented Kalman Filter in JAX (sigma-point transform).

The reference's GLOBAL filter is robot_localization's UKF (``ekf_global_node``
— see ``launch/params/ekf_global_node.yaml`` in hmakelin/gisnav; the local
one is an EKF). This mirrors ``fusion.ekf``'s interface with the
Merwe-scaled sigma-point transform, so ``PoseFusionFilter`` can run either
backend. The whole predict/update is a handful of fixed-size matmuls — one
fused XLA program each, like the EKF.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gisnav_tpu.fusion.ekf import (
    EKFState,
    POSE_DIM,
    STATE_DIM,
    _transition,
    _wrap_angle,
)

__all__ = ["ukf_predict", "ukf_update_pose", "ukf_update_velocity"]

# alpha sizes the sigma spread AND the weight magnitudes: w0 = lambda/(n+l)
# grows like -1/alpha^2. robot_localization's alpha=1e-3 assumes f64 — at
# f32 (the TPU compute dtype) weights of +-1e4..1e6 amplify the transition's
# nonlinear-curvature residual into the covariance (observed: P inflated
# 25 -> 1.5e3 and went indefinite in two predicts). alpha=0.5 keeps weights
# at O(1) (w0_m = -3) with a ~1.9-SD spread.
_ALPHA, _BETA, _KAPPA = 0.5, 2.0, 0.0
_LAMBDA = _ALPHA**2 * (STATE_DIM + _KAPPA) - STATE_DIM
_N_SIGMA = 2 * STATE_DIM + 1

# host numpy on purpose: sigma weights are compile-time constants that fold
# into the jitted programs, and module import must never touch the device
# (a first jnp op here would initialize the accelerator backend at import)
_WM = np.concatenate([
    np.array([_LAMBDA / (STATE_DIM + _LAMBDA)], np.float32),
    np.full(2 * STATE_DIM, 0.5 / (STATE_DIM + _LAMBDA), np.float32),
])
_WC = _WM.copy()
_WC[0] += 1.0 - _ALPHA**2 + _BETA


def _sigma_points(x, p):
    """Merwe scaled sigma points (2n+1, n)."""
    # Cholesky of a symmetrized covariance; the jitter is RELATIVE to the
    # covariance scale (f32 rounding noise on a P with 25-scale entries is
    # ~1e-5 — a fixed 1e-9 floor cannot restore PSD-ness)
    psym = 0.5 * (p + p.T)
    jitter = 1e-6 * (jnp.trace(psym) / STATE_DIM) + 1e-9
    psym = psym + jitter * jnp.eye(STATE_DIM)
    sqrt_p = jnp.linalg.cholesky((STATE_DIM + _LAMBDA) * psym)
    deltas = sqrt_p.T  # rows are scaled columns of the sqrt
    return jnp.concatenate([x[None], x[None] + deltas, x[None] - deltas])


@jax.jit
def ukf_predict(state: EKFState, dt, q_diag) -> EKFState:
    """Unscented predict: propagate sigma points through the motion model.

    f32 matmul precision is forced: sigma points carry ABSOLUTE map-frame
    positions, and the TPU MXU's default bf16 operand precision would
    truncate them (~4 m per km of flight) in the ``prop.T @ _WM`` mean —
    15x31 matmuls, full precision is free.
    """
    with jax.default_matmul_precision("float32"):
        sigmas = _sigma_points(state.x, state.p)
        prop = jax.vmap(partial(_transition, dt=dt))(sigmas)
        # CENTERED weighted mean (exact: sum(_WM) == 1). The Merwe weights
        # at alpha=1e-2 are ~1e4-scale with mixed signs; summing them
        # against ABSOLUTE positions (km-scale map frames) builds 1e7-scale
        # f32 intermediates whose cancellation noise destroys P's
        # positive-definiteness within a few steps (NaN cholesky ~1 km from
        # the origin). Centering on sigma point 0 keeps summands at
        # deviation scale.
        x_new = prop[0] + (prop - prop[0][None]).T @ _WM
        diff = prop - x_new[None]
        p_new = jnp.einsum("i,ij,ik->jk", _WC, diff, diff)
        p_new = p_new + jnp.diag(q_diag) * jnp.maximum(dt, 1e-6)
        x_new = x_new.at[3:6].set(_wrap_angle(x_new[3:6]))
        return EKFState(x=x_new, p=p_new)


def _ukf_update(state: EKFState, z, r_diag, mask, obs_slice,
                rejection_threshold=0.0) -> EKFState:
    # f32 precision for the same reason as ukf_predict: z_pred carries
    # absolute positions through a matmul
    with jax.default_matmul_precision("float32"):
        sigmas = _sigma_points(state.x, state.p)
        zs = sigmas[:, obs_slice]  # linear observation of a state slice
        # centered weighted mean — see ukf_predict for why
        z_pred = zs[0] + (zs - zs[0][None]).T @ _WM
        dz = zs - z_pred[None]
        dx = sigmas - state.x[None]
        # masked components: ZERO their observation deviations and unit
        # their R diag rather than inflating R to 1e12 — an S with 1e12 and
        # O(1) diagonal blocks has condition ~1e11 and its f32 inverse
        # leaks garbage into the live block (observed: NaN covariance a few
        # steps into km-scale tracking). This way S is well-conditioned and
        # the masked gain columns are exactly zero.
        dz = dz * (mask > 0)[None, :]
        r = jnp.diag(jnp.where(mask > 0, r_diag, 1.0))
        s = jnp.einsum("i,ij,ik->jk", _WC, dz, dz) + r
        c = jnp.einsum("i,ij,ik->jk", _WC, dx, dz)
        s_inv = jnp.linalg.inv(s)
        innov = z - z_pred
        if obs_slice.start == 0:  # pose observation: wrap angle residuals
            innov = innov.at[3:6].set(_wrap_angle(innov[3:6]))
        innov = innov * mask
        # Mahalanobis innovation gate (robot_localization's
        # poseN_rejection_threshold); <= 0 disables
        thr = jnp.asarray(rejection_threshold, jnp.float32)
        d2 = innov @ s_inv @ innov
        accept = jnp.where((thr <= 0.0) | (d2 <= thr * thr), 1.0, 0.0)
        k = accept * (c @ s_inv)
        x_new = state.x + k @ innov
        x_new = x_new.at[3:6].set(_wrap_angle(x_new[3:6]))
        # Joseph-style 4-term covariance update: algebraically equal to
        # P - K S K' for the exact gain, but stays symmetric/near-PSD under
        # f32 gain error (the standard form subtracts nearly equal matrices
        # and went indefinite within steps when velocity variance was wide)
        p_new = state.p - k @ c.T - c @ k.T + k @ s @ k.T
        p_new = 0.5 * (p_new + p_new.T)
        return EKFState(x=x_new, p=p_new)


@jax.jit
def ukf_update_pose(state: EKFState, z, r_diag, mask,
                    rejection_threshold=0.0) -> EKFState:
    """Unscented update with a 6-DoF pose measurement."""
    return _ukf_update(state, z, r_diag, mask, slice(0, POSE_DIM),
                       rejection_threshold)


@jax.jit
def ukf_update_velocity(state: EKFState, z, r_diag, mask,
                        rejection_threshold=0.0) -> EKFState:
    """Unscented update with a body-frame velocity measurement."""
    return _ukf_update(state, z, r_diag, mask, slice(6, 12),
                       rejection_threshold)
