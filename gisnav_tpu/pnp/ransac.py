"""Batched RANSAC-PnP on device (JAX, jit/vmap-friendly, fixed shapes).

Replaces ``cv2.solvePnPRansac`` in the reference's ``compute_pose``
(``core/_shared.py:89-125`` in hmakelin/gisnav). TPU-first recast:

- data-dependent hypothesis sampling becomes a FIXED-SIZE batch of vmapped
  4-point hypotheses with masked scoring (no early exit);
- each hypothesis solves a plane-induced homography and decomposes it with the
  intrinsics (Zhang/IPPE-style) — exact for the dominant near-planar terrain
  geometry and a good inlier classifier under DEM relief;
- the best hypothesis is polished with fixed-iteration Gauss-Newton on the
  full 3D points with Huber-weighted reprojection residuals (handles relief
  and squeezes out sub-pixel accuracy that a 4-point minimal solve cannot).

Everything is float32-safe: image coordinates are pre-normalized by the
intrinsics and object points are centered/rescaled before solving.

Convention (same as cv2.solvePnP): ``x ~ K (R X + t)`` maps object points
into the camera frame.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["PnPResult", "ransac_pnp", "project_points"]


class PnPResult(NamedTuple):
    r: jnp.ndarray  # (3, 3) rotation, object -> camera
    t: jnp.ndarray  # (3,) translation
    inliers: jnp.ndarray  # (N,) bool inlier mask
    num_inliers: jnp.ndarray  # () int32
    valid: jnp.ndarray  # () bool — enough inliers and finite solution


def project_points(pts3d: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
                   k: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection ``K (R X + t)`` -> (N, 2) pixel coordinates."""
    pc = pts3d @ r.T + t
    pc = pc @ k.T
    return pc[:, :2] / jnp.maximum(pc[:, 2:3], 1e-9)


def _inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse via the adjugate (no LAPACK custom call)."""
    c0 = jnp.cross(m[:, 1], m[:, 2])
    c1 = jnp.cross(m[:, 2], m[:, 0])
    c2 = jnp.cross(m[:, 0], m[:, 1])
    det = jnp.dot(m[:, 0], c0)
    adj = jnp.stack([c0, c1, c2], axis=0)
    return adj / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)


def _orthonormalize(m: jnp.ndarray) -> jnp.ndarray:
    """Project a 3x3 matrix onto SO(3): scaled Newton iteration for the
    polar factor (pure matmuls — the SVD this replaces lowers to a LAPACK
    eigh custom call that cost >1 ms vmapped over RANSAC hypotheses).

    Inputs here are near-rotations by construction (r3 = r1 x r2, det > 0),
    where the polar Newton iteration converges quadratically; degenerate
    hypotheses yield garbage that scores zero inliers, as before.
    """
    def body(x, _):
        xit = _inv3(x).T
        # Frobenius scaling keeps convergence fast when ||x|| is off-scale
        g = jnp.sqrt(
            jnp.maximum(jnp.linalg.norm(xit), 1e-12)
            / jnp.maximum(jnp.linalg.norm(x), 1e-12)
        )
        return 0.5 * (g * x + xit / g), None

    x, _ = jax.lax.scan(body, m, None, length=4)
    return x


def _homography_4pt(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from 4 correspondences src (4,2) -> dst (4,2).

    Solves the 8x8 linear system with h33 = 1.
    """
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros(4, dtype=src.dtype)
    ones = jnp.ones(4, dtype=src.dtype)
    rows_u = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=1)
    rows_v = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)  # (8, 8)
    b = jnp.concatenate([u, v], axis=0)  # (8,)
    # Regularize lightly: degenerate samples produce garbage hypotheses that
    # simply score zero inliers.
    ata = a.T @ a + 1e-8 * jnp.eye(8, dtype=src.dtype)
    h = jnp.linalg.solve(ata, a.T @ b)
    return jnp.concatenate([h, jnp.ones(1, dtype=src.dtype)]).reshape(3, 3)


def _pose_from_homography(h: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decompose a NORMALIZED-coordinate plane homography into (R, t).

    ``h`` maps plane coordinates (X, Y, 1) on z=0 to normalized image coords,
    so ``h ~ [r1 r2 t]``.
    """
    a1, a2, a3 = h[:, 0], h[:, 1], h[:, 2]
    # sign: plane must be in front of the camera (t_z > 0)
    s = jnp.sign(a3[2])
    a1, a2, a3 = a1 * s, a2 * s, a3 * s
    lam = 2.0 / jnp.maximum(jnp.linalg.norm(a1) + jnp.linalg.norm(a2), 1e-9)
    r1, r2 = a1 * lam, a2 * lam
    r3 = jnp.cross(r1, r2)
    r = _orthonormalize(jnp.stack([r1, r2, r3], axis=1))
    t = a3 * lam
    return r, t


def _rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.linalg.norm(w)
    safe = jnp.maximum(theta, 1e-12)
    k = w / safe
    kx, ky, kz = k[0], k[1], k[2]
    kmat = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]],
                     dtype=w.dtype)
    s, c = jnp.sin(theta), jnp.cos(theta)
    r = jnp.eye(3, dtype=w.dtype) + s * kmat + (1.0 - c) * (kmat @ kmat)
    return jnp.where(theta < 1e-9, jnp.eye(3, dtype=w.dtype), r)


def _gauss_newton(r0, t0, pts3d_n, pts2d_n, weights, iters: int,
                  huber_delta: float):
    """Fixed-iteration Gauss-Newton on (so(3) increment, t) minimizing
    Huber-weighted reprojection error in normalized camera coordinates."""

    def step(carry, _):
        r, t = carry
        pc = pts3d_n @ r.T + t  # (N, 3) camera-frame points
        z = jnp.maximum(pc[:, 2], 1e-6)
        proj = pc[:, :2] / z[:, None]
        res = proj - pts2d_n  # (N, 2)

        # Huber IRLS weights on the residual norm
        rn = jnp.linalg.norm(res, axis=1)
        w_huber = jnp.where(rn <= huber_delta, 1.0,
                            huber_delta / jnp.maximum(rn, 1e-12))
        w = weights * w_huber  # (N,)

        # Jacobian of normalized projection wrt camera-frame point
        x, y = pc[:, 0], pc[:, 1]
        inv_z = 1.0 / z
        # d(proj)/d(pc): (N, 2, 3)
        j_proj = jnp.stack(
            [
                jnp.stack([inv_z, jnp.zeros_like(z), -x * inv_z * inv_z], axis=1),
                jnp.stack([jnp.zeros_like(z), inv_z, -y * inv_z * inv_z], axis=1),
            ],
            axis=1,
        )
        # d(pc)/d(omega) with left-multiplied increment R <- exp(w) R:
        # d(exp(w) (R X + t'))/dw = -[pc]_x ; d/dt = I
        px, py, pz = pc[:, 0], pc[:, 1], pc[:, 2]
        zeros = jnp.zeros_like(px)
        skew = jnp.stack(
            [
                jnp.stack([zeros, pz, -py], axis=1),
                jnp.stack([-pz, zeros, px], axis=1),
                jnp.stack([py, -px, zeros], axis=1),
            ],
            axis=1,
        )  # (N, 3, 3) = -[pc]_x
        j_pc = jnp.concatenate([skew, jnp.broadcast_to(
            jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3))], axis=2)  # (N,3,6)
        jac = jnp.einsum("nij,njk->nik", j_proj, j_pc)  # (N, 2, 6)

        jw = jac * w[:, None, None]
        jtj = jnp.einsum("nik,nil->kl", jw, jac) + 1e-6 * jnp.eye(6, dtype=pc.dtype)
        jtr = jnp.einsum("nik,ni->k", jw, res)
        delta = -jnp.linalg.solve(jtj, jtr)
        r_new = _rodrigues(delta[:3]) @ r
        t_new = t + delta[3:]
        return (r_new, t_new), None

    (r, t), _ = jax.lax.scan(step, (r0, t0), None, length=iters)
    return r, t


def ransac_pnp(
    pts3d: jnp.ndarray,
    pts2d: jnp.ndarray,
    k: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    key: jax.Array | None = None,
    num_hypotheses: int = 64,
    threshold_px: float = 8.0,
    min_inliers: int = 10,
    refine_iters: int = 10,
) -> PnPResult:
    """Robust pose from 2D-3D correspondences, fixed shapes throughout.

    All matmuls in here run at true f32 precision: the TPU MXU's DEFAULT
    precision feeds bf16 operands, and raw pixel coordinates (up to ~2048)
    quantize at ~8 px in bf16 — on the k_inv normalization that error EQUALS
    the default 8 px inlier threshold, silently degrading every hypothesis
    score and the Gauss-Newton normal equations. These are tiny (N x 3 and
    8 x 8) matmuls; full precision costs nothing next to the matcher.

    :param pts3d: (N, 3) object points (reference raster frame, z from DEM)
    :param pts2d: (N, 2) query pixel coordinates
    :param k: (3, 3) camera intrinsics
    :param mask: (N,) validity of each correspondence (padded rows -> False)
    :param key: PRNG key for hypothesis sampling (default: deterministic 0)
    :param num_hypotheses: RANSAC hypothesis batch size (all evaluated; the
        reference uses 10 sequential cv2 iterations, ``_shared.py:108-116``)
    :param threshold_px: inlier reprojection threshold in pixels (cv2 default 8)
    :param min_inliers: below this the result is flagged invalid
    :param refine_iters: Gauss-Newton polish iterations
    """
    with jax.default_matmul_precision("float32"):
        n = pts3d.shape[0]
        dtype = jnp.float32
        pts3d = pts3d.astype(dtype)
        pts2d = pts2d.astype(dtype)
        k = k.astype(dtype)
        if mask is None:
            mask = jnp.ones(n, dtype=bool)
        if key is None:
            key = jax.random.PRNGKey(0)

        fmask = mask.astype(dtype)
        count = jnp.maximum(jnp.sum(fmask), 1.0)

        # --- precondition -----------------------------------------------------
        k_inv = jnp.linalg.inv(k)
        ones = jnp.ones((n, 1), dtype=dtype)
        pts2d_n = jnp.concatenate([pts2d, ones], axis=1) @ k_inv.T
        pts2d_n = pts2d_n[:, :2]
        # pixel threshold -> normalized-coordinate threshold
        f_mean = 0.5 * (k[0, 0] + k[1, 1])
        threshold_n = threshold_px / f_mean

        centroid = jnp.sum(pts3d * fmask[:, None], axis=0) / count
        centered = pts3d - centroid
        scale = jnp.sqrt(
            jnp.sum(jnp.sum(centered**2, axis=1) * fmask) / count
        )
        scale = jnp.maximum(scale, 1e-6)
        pts3d_n = centered / scale

        # --- hypotheses -------------------------------------------------------
        probs = fmask / jnp.sum(fmask)
        keys = jax.random.split(key, num_hypotheses)

        def hypothesis(hkey):
            idx = jax.random.choice(hkey, n, shape=(4,), replace=False, p=probs)
            obj = pts3d_n[idx][:, :2]  # plane assumption: drop z at minimal stage
            img = pts2d_n[idx]
            h = _homography_4pt(obj, img)
            r, t = _pose_from_homography(h)
            # score against ALL correspondences (full 3D, masked)
            pc = pts3d_n @ r.T + t
            z = jnp.maximum(pc[:, 2], 1e-6)
            res = pc[:, :2] / z[:, None] - pts2d_n
            err = jnp.linalg.norm(res, axis=1)
            inl = (err < threshold_n) & mask & (pc[:, 2] > 0)
            return jnp.sum(inl), r, t

        scores, rs, ts = jax.vmap(hypothesis)(keys)
        best = jnp.argmax(scores)
        r_best, t_best = rs[best], ts[best]

        # --- polish -----------------------------------------------------------
        # initial inlier weights from the best hypothesis
        pc = pts3d_n @ r_best.T + t_best
        z = jnp.maximum(pc[:, 2], 1e-6)
        err0 = jnp.linalg.norm(pc[:, :2] / z[:, None] - pts2d_n, axis=1)
        w0 = ((err0 < threshold_n) & mask).astype(dtype)
        r_ref, t_ref = _gauss_newton(
            r_best, t_best, pts3d_n, pts2d_n, w0,
            iters=refine_iters, huber_delta=threshold_n,
        )

        # --- final classification & un-precondition ---------------------------
        pc = pts3d_n @ r_ref.T + t_ref
        z = jnp.maximum(pc[:, 2], 1e-6)
        err = jnp.linalg.norm(pc[:, :2] / z[:, None] - pts2d_n, axis=1)
        inliers = (err < threshold_n) & mask & (pc[:, 2] > 0)
        num_inliers = jnp.sum(inliers).astype(jnp.int32)

        t_full = scale * t_ref - r_ref @ centroid
        finite = jnp.all(jnp.isfinite(r_ref)) & jnp.all(jnp.isfinite(t_full))
        valid = (num_inliers >= min_inliers) & finite

        return PnPResult(r=r_ref, t=t_full, inliers=inliers,
                         num_inliers=num_inliers, valid=valid)
