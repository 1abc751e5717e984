"""Pinhole perspective camera as a pure function.

Capability parity with the reference PerspectiveCamera module
(smplifyx/camera.py:42-117): points are mapped through the extrinsics
(R @ p + t), divided by depth, scaled by the focal lengths and shifted by the
principal point.  The reference builds the intrinsic 2x2 under no_grad and
never optimizes the rotation (smplifyx/main.py:223-224); here rotation/focal/
center are plain arrays the caller chooses (not) to differentiate through.

Also provides the hardcoded cropped-EHF ground-truth camera used by the
evaluation protocol (reference: PerspectiveCameraCroppedEHFGT,
smplifyx/camera.py:119-128).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_FOCAL_LENGTH = 5000.0


class CameraParams(NamedTuple):
    """Per-frame camera parameters; every field broadcasts over the batch.

    rotation:    [..., 3, 3]
    translation: [..., 3]
    focal:       [..., 2]   (fx, fy)
    center:      [..., 2]   principal point in pixels
    """

    rotation: jax.Array
    translation: jax.Array
    focal: jax.Array
    center: jax.Array


def identity_camera(
    batch_shape: tuple[int, ...] = (),
    focal_length: float = DEFAULT_FOCAL_LENGTH,
    center: jax.Array | None = None,
    dtype=jnp.float32,
) -> CameraParams:
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    transl = jnp.zeros((*batch_shape, 3), dtype=dtype)
    focal = jnp.full((*batch_shape, 2), focal_length, dtype=dtype)
    if center is None:
        center = jnp.zeros((*batch_shape, 2), dtype=dtype)
    return CameraParams(rot, transl, focal, center)


def project_points(camera: CameraParams, points: jax.Array) -> jax.Array:
    """Project 3D points [..., N, 3] to pixel coordinates [..., N, 2].

    p_cam = R @ p + t;  uv = f * p_cam.xy / p_cam.z + c
    """
    p_cam = jnp.einsum("...ij,...nj->...ni", camera.rotation, points)
    p_cam = p_cam + camera.translation[..., None, :]
    z = p_cam[..., 2:3]
    # Keep the divide finite when an optimizer probe pushes a point onto the
    # camera plane; the sign is preserved so the gradient still repels.
    z = jnp.where(jnp.abs(z) < 1e-6, jnp.where(z < 0, -1e-6, 1e-6), z)
    uv = p_cam[..., :2] / z
    return uv * camera.focal[..., None, :] + camera.center[..., None, :]


# Cropped-EHF ground-truth extrinsics/intrinsics (reference camera.py:119-128).
EHF_GT_ROTATION = (
    (0.9992447, -0.0048801, 0.0385517),
    (-0.0107200, -0.9882044, 0.1527655),
    (0.0373514, -0.1530633, -0.9875103),
)
EHF_GT_TRANSLATION = (-0.03609917, 0.43416458, 2.37101226)
EHF_GT_CENTER = (790.263706, 578.90334)
EHF_GT_FOCAL = 1498.22426237
EHF_IMG_SIZE = (800, 600)  # (width, height) visibility bound used by eval


def ehf_gt_camera(xmin: float = 0.0, ymin: float = 0.0, dtype=jnp.float32) -> CameraParams:
    """The EHF GT camera with the principal point shifted by a crop bbox."""
    rot = jnp.asarray(EHF_GT_ROTATION, dtype=dtype)
    transl = jnp.asarray(EHF_GT_TRANSLATION, dtype=dtype)
    center = jnp.asarray(
        [EHF_GT_CENTER[0] - xmin, EHF_GT_CENTER[1] - ymin], dtype=dtype
    )
    focal = jnp.asarray([EHF_GT_FOCAL, EHF_GT_FOCAL], dtype=dtype)
    return CameraParams(rot, transl, focal, center)
