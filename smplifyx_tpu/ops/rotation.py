"""Rotation representations and conversions, fully vectorized for XLA.

Capability parity with the reference (all math re-derived, not translated):
  - axis-angle -> rotation matrix (Rodrigues), used by the SMPL-X forward
    (reference: smplx.lbs.batch_rodrigues, called from smplifyx/fitting.py).
  - rotation matrix -> axis-angle (log map), used for the 180-degree
    dual-orientation trick (reference: cv2.Rodrigues at
    smplifyx/fit_single_frame.py:528-535).
  - rotation matrix -> intrinsic-xyz Euler angles, gimbal-safe and batched,
    used to turn ExPose/PIXIE/PARE rotation matrices into pose vectors
    (reference: smplifyx/utils.py:306-436, which runs on CPU; here it is a
    vectorized device op).

All functions accept arbitrary leading batch dimensions and are jit/vmap/grad
safe (no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def batch_rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle [..., 3] -> rotation matrices [..., 3, 3].

    Uses the Rodrigues formula R = I + sin(t) K + (1 - cos(t)) K^2 with a
    Taylor-safe normalization around t = 0 (sin(t)/t and (1-cos t)/t^2 are
    evaluated through their smooth forms so gradients are finite at zero).
    """
    batch_shape = aa.shape[:-1]
    aa = aa.reshape(-1, 3)
    angle = jnp.sqrt(jnp.sum(aa * aa, axis=-1) + _EPS * _EPS)  # smooth |aa|
    axis = aa / angle[..., None]
    sin = jnp.sin(angle)
    cos = jnp.cos(angle)

    # Every entry of R = I + sin K + (1-cos) K^2 written elementwise on [N]
    # vectors (for a unit axis, K^2 = k k^T - I), with ONE stack at the end.
    # The K-matrix + batched 3x3 matmul form is mathematically identical but
    # lowers to a soup of [N,3,3]-shaped stacks/tiny convs whose trailing
    # (3,3) dims occupy ~2% of a TPU (8,128) vector tile; inside the L-BFGS
    # while_loop this op runs every energy evaluation, and the profiler
    # showed those tiny fusions dominating the non-collision tail of a
    # collision-on stage (docs/ARCHITECTURE.md "Hardware utilization").
    kx, ky, kz = axis[..., 0], axis[..., 1], axis[..., 2]
    c1 = 1.0 - cos
    xx, yy, zz = c1 * kx * kx, c1 * ky * ky, c1 * kz * kz
    xy, xz, yz = c1 * kx * ky, c1 * kx * kz, c1 * ky * kz
    sx, sy, sz = sin * kx, sin * ky, sin * kz
    R = jnp.stack(
        [
            cos + xx, xy - sz, xz + sy,
            xy + sz, cos + yy, yz - sx,
            xz - sy, yz + sx, cos + zz,
        ],
        axis=-1,
    )
    return R.reshape(*batch_shape, 3, 3)


def rotmat_to_aa(R: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] -> axis-angle [..., 3] (log map).

    Numerically safe at angle ~ 0 (returns the skew part) and near pi
    (recovers the axis from the diagonal of R + I).
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)

    # Axis (scaled by 2 sin) from the skew-symmetric part.  Deriving sin from
    # |skew| rather than arccos(trace) keeps the angle well-conditioned near
    # pi, where arccos loses ~half the float32 digits.
    skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin = 0.5 * jnp.sqrt(jnp.sum(skew * skew, axis=-1) + _EPS * _EPS)
    angle = jnp.arctan2(sin, cos)
    generic = skew * (angle / (2.0 * sin + _EPS))[..., None]

    # Near pi: axis^2 from diag(R + I)/2; signs from the off-diagonals.
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag + 1.0) * 0.5, 0.0, None)
    axis_abs = jnp.sqrt(axis_sq)
    # Pick the largest component as reference for the sign resolution.
    # s_ij = (R[i,j] + R[j,i]) / 2 = a_i a_j * (1 - cos); sign(a_i a_j) = sign(s_ij)
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    s12 = R[..., 1, 2] + R[..., 2, 1]
    major = jnp.argmax(axis_abs, axis=-1)
    sign0 = jnp.where(
        major == 0,
        1.0,
        jnp.where(major == 1, jnp.sign(s01), jnp.sign(s02)),
    )
    sign1 = jnp.where(
        major == 0,
        jnp.sign(s01),
        jnp.where(major == 1, 1.0, jnp.sign(s12)),
    )
    sign2 = jnp.where(
        major == 0,
        jnp.sign(s02),
        jnp.where(major == 1, jnp.sign(s12), 1.0),
    )
    sign = jnp.stack([sign0, sign1, sign2], axis=-1)
    sign = jnp.where(sign == 0.0, 1.0, sign)
    axis_pi = axis_abs * sign
    # Overall sign: for theta < pi the skew part points along +axis; align
    # with it so the branch is continuous with the generic one.
    overall = jnp.sign(jnp.sum(axis_pi * skew, axis=-1, keepdims=True))
    overall = jnp.where(overall == 0.0, 1.0, overall)
    near_pi = axis_pi * overall * angle[..., None]

    # Near zero the generic branch already degrades gracefully (skew/2).
    out = jnp.where((jnp.pi - angle)[..., None] < 1e-3, near_pi, generic)
    return out.reshape(*batch_shape, 3)


def euler_xyz_from_rotmat(R: jax.Array) -> jax.Array:
    """Batched intrinsic-xyz Euler angles from rotation matrices.

    Decomposes R = Rx(a) @ Ry(b) @ Rz(c) and returns [..., 3] = (a, b, c).
    Matches the reference's scipy-derived algorithm (smplifyx/utils.py:306-436,
    seq='xyz', intrinsic) on non-degenerate inputs; on gimbal lock (|cos b|
    ~ 0) the third angle is set to zero, same convention as the reference.
    """
    batch_shape = R.shape[:-2]
    R = R.reshape(-1, 3, 3)
    r02 = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    b = jnp.arcsin(r02)
    safe = jnp.abs(r02) < 1.0 - 1e-7

    a_safe = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    c_safe = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])

    # Gimbal lock: b = +/- pi/2, set c = 0.
    # b=+pi/2: R[1,0] = sin(a+c), R[1,1] = cos(a+c) -> a = atan2(R10, R11)
    # b=-pi/2: R[1,0] = sin(c-a), R[1,1] = cos(c-a) -> a = -atan2(R10, R11)
    a_lock = jnp.arctan2(R[..., 1, 0], R[..., 1, 1]) * jnp.sign(r02)

    a = jnp.where(safe, a_safe, a_lock)
    c = jnp.where(safe, c_safe, 0.0)
    out = jnp.stack([a, b, c], axis=-1)
    return out.reshape(*batch_shape, 3)


def flip_global_orient_y(aa: jax.Array) -> jax.Array:
    """Compose a global orientation with a 180-degree rotation about y.

    Reference behavior: cv2.Rodrigues(orient) @ cv2.Rodrigues([0, pi, 0]) then
    back to axis-angle (smplifyx/fit_single_frame.py:528-535), used for the
    dual-orientation retry on side views.
    """
    R = batch_rodrigues(aa)
    flip = batch_rodrigues(jnp.array([0.0, jnp.pi, 0.0], dtype=aa.dtype))
    return rotmat_to_aa(R @ flip)
