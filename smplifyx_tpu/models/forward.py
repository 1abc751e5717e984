"""Functional SMPL-X forward pass: blendshapes + LBS + landmarks, batched.

Re-designed for TPU from the behavior of the external `smplx` package the
reference drives (model construction at smplifyx/main.py:109-127; forward
invoked per closure eval at smplifyx/fitting.py:248-250).  Differences from
the torch module, by design:

  * pure function over an SMPLXModel pytree + BodyParams pytree — no
    parameter mutation (`reset_params`) or module state;
  * every step is batched matmuls/einsums that XLA tiles onto the MXU:
    blendshapes are [B, K] @ [K, V*3], skinning is [V, J] @ [B, J, 16];
  * the kinematic chain is unrolled over the 55 static parents (no
    data-dependent control flow);
  * dynamic face-contour landmark tables are selected with a gather instead
    of host-side indexing.

Output joints follow the canonical SMPL-X order: 55 skeleton joints, 21
vertex-picked extras, 51 static face landmarks, 17 contour landmarks (=144),
optionally permuted to an annotation format by `joint_map` (reference:
JointMapper, smplifyx/utils.py:68-81).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from smplifyx_tpu.models.bodymodel import SMPLXModel
from smplifyx_tpu.ops.rotation import batch_rodrigues


@struct.dataclass
class BodyParams:
    """Batched SMPL-X parameters, all [B, ...]."""

    global_orient: jax.Array  # [B, 3] axis-angle
    body_pose: jax.Array      # [B, 63] axis-angle (21 joints)
    betas: jax.Array          # [B, num_betas]
    expression: jax.Array     # [B, num_expr]
    jaw_pose: jax.Array       # [B, 3]
    leye_pose: jax.Array      # [B, 3]
    reye_pose: jax.Array      # [B, 3]
    left_hand_pose: jax.Array   # [B, C] PCA coeffs (or [B, 45] if use_pca=False)
    right_hand_pose: jax.Array  # [B, C]

    @classmethod
    def zeros(
        cls,
        batch: int,
        num_betas: int = 10,
        num_expr: int = 10,
        num_pca: int = 12,
        dtype=jnp.float32,
    ) -> "BodyParams":
        z = lambda *s: jnp.zeros((batch, *s), dtype=dtype)
        return cls(
            global_orient=z(3), body_pose=z(63), betas=z(num_betas),
            expression=z(num_expr), jaw_pose=z(3), leye_pose=z(3), reye_pose=z(3),
            left_hand_pose=z(num_pca), right_hand_pose=z(num_pca),
        )


@struct.dataclass
class SMPLXOutput:
    vertices: Optional[jax.Array]  # [B, V, 3] or None if return_verts=False
    joints: jax.Array              # [B, K, 2?3] mapped joints
    full_pose: jax.Array           # [B, 165] axis-angle, 55 joints
    body_pose: jax.Array           # [B, 63]
    betas: jax.Array
    expression: jax.Array
    jaw_pose: jax.Array
    left_hand_pose: jax.Array      # PCA coeffs as given (prior operates on these)
    right_hand_pose: jax.Array


from functools import lru_cache


def _use_pallas_lbs() -> bool:
    """Gate for the fused Pallas skinning kernel (ops/lbs_pallas.py,
    measured 1.4-1.5x over the XLA einsum, bit-exact).

    Opt-in via SMPLIFYX_PALLAS_LBS=1 AND a TPU backend.  Default OFF: with
    the kernel inside the full fit graph (hundreds of instantiations through
    the L-BFGS while_loop trace) the end-to-end TPU compile was observed to
    exceed 10 minutes on the remote-tunnel backend, vs ~1 min for the einsum
    path — the 1.1 ms/eval win does not buy back a pathological compile for
    the default user.  The kernel stays covered by tests/test_lbs_pallas.py
    and available for long-running production sessions where the one-time
    compile amortizes."""
    import os

    if os.environ.get("SMPLIFYX_PALLAS_LBS", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@lru_cache(maxsize=None)
def _tree_levels(parents: tuple) -> tuple:
    """Partition joints by tree depth: ((level_idxs, their_parents), ...).

    Joints at the same depth have independent global transforms given the
    previous level, so each level is ONE batched 4x4 matmul.  This cuts the
    sequential FK (and backward) depth from J=55 chained ops to ~11 — a
    large win inside the optimizer's while_loop where the chain runs
    thousands of times.
    """
    depth = [0] * len(parents)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    levels = []
    for d in range(1, max(depth) + 1):
        idxs = tuple(j for j in range(len(parents)) if depth[j] == d)
        pars = tuple(parents[j] for j in idxs)
        levels.append((idxs, pars))
    return tuple(levels)


def _rigid_transform_chain(
    rot_mats: jax.Array, joints: jax.Array, parents
) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics along the (static) parent tree, level-batched.

    rot_mats: [B, J, 3, 3]; joints: [B, J, 3] rest positions.
    Returns (posed_joints [B, J, 3], rel_transforms [B, J, 4, 4]) where
    rel_transforms map rest-pose vertices to posed space (the "A" matrices of
    classic LBS).
    """
    B, J = joints.shape[:2]
    parents = tuple(parents)
    rel = jnp.concatenate(
        [joints[:, :1], joints[:, 1:] - joints[:, parents[1:]]], axis=1
    )  # joint offsets (scatter-free)

    # All local transforms at once: [B, J, 4, 4].
    T_local = jnp.concatenate([rot_mats, rel[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot_mats.dtype),
        (B, J, 1, 4),
    )
    T_local = jnp.concatenate([T_local, bottom], axis=-2)

    # Scatter-free accumulation: levels are concatenated in BFS order into a
    # growing buffer (parents always live at already-final positions), then
    # one final gather restores joint order.  TPU scatters are far slower
    # than gathers, so .at[].set per level is avoided.
    levels = _tree_levels(parents)
    bfs_order = [0] + [j for idxs, _ in levels for j in idxs]
    pos_of = {j: i for i, j in enumerate(bfs_order)}
    acc = T_local[:, :1]  # root is already global
    for idxs, pars in levels:
        par_pos = jnp.asarray([pos_of[p] for p in pars])
        updated = acc[:, par_pos] @ T_local[:, jnp.asarray(idxs)]
        acc = jnp.concatenate([acc, updated], axis=1)
    inverse = jnp.asarray([pos_of[j] for j in range(J)])
    T_global = acc[:, inverse]

    posed_joints = T_global[..., :3, 3]
    # Subtract the skinned rest-joint contribution: A = T - pack(T @ [j; 0]),
    # built scatter-free by rebuilding the last column via concat.
    correction = jnp.einsum("bjmn,bjn->bjm", T_global[..., :3], joints)
    A = jnp.concatenate(
        [T_global[..., :3], (T_global[..., 3] - correction)[..., None]],
        axis=-1,
    )
    return posed_joints, A


def _head_yaw_bucket(rot_mats: jax.Array, neck_chain, num_buckets: int) -> jax.Array:
    """Yaw bucket index for dynamic contour landmark table selection.

    Aggregates the head's global rotation along the neck kinematic chain and
    quantizes its negative yaw into [0, 39] (looking right) or [40, 78]
    (looking left) — the layout of the dynamic landmark tables.

    Composition order matters and must match the tables' convention (the
    public smplx package's find_dynamic_lmk_idx_and_bcoords): ancestors
    apply on the LEFT, i.e. R_global = R_root @ ... @ R_neck @ R_head.
    neck_chain is ordered head -> root, so each ancestor premultiplies.
    (Caught by the differential oracle in test_smplx_package_parity.py —
    the reversed product picks wrong contour buckets at large head yaws.)
    """
    B = rot_mats.shape[0]
    R = jnp.broadcast_to(jnp.eye(3, dtype=rot_mats.dtype), (B, 3, 3))
    for idx in neck_chain:
        R = rot_mats[:, int(idx)] @ R
    # smplx's bucket key is -rot_mat_to_euler(R) where rot_mat_to_euler
    # returns atan2(-R[2,0], sy); negating gives atan2(+R[2,0], sy)
    # (= +asin(R[2,0]) for orthonormal R).  The key is then
    # round(clamp(deg(key), max=39)) exactly as in smplx's
    # find_dynamic_lmk_idx_and_bcoords.  (A sign flip here mirrors the
    # contour tables left/right for every nonzero head yaw.)
    yaw = jnp.arctan2(
        R[:, 2, 0], jnp.sqrt(R[:, 0, 0] ** 2 + R[:, 1, 0] ** 2)
    )
    deg = jnp.round(jnp.clip(yaw * (180.0 / jnp.pi), max=39.0)).astype(jnp.int32)
    neg = deg < 0
    big_neg = deg < -39
    neg_vals = jnp.where(big_neg, 78, 39 - deg)
    bucket = jnp.where(neg, neg_vals, deg)
    return jnp.clip(bucket, 0, num_buckets - 1)


def _vertices_to_landmarks(
    vertices: jax.Array, faces: jax.Array, lmk_faces_idx: jax.Array,
    lmk_bary: jax.Array,
) -> jax.Array:
    """Barycentric landmark extraction. vertices [B,V,3], faces [F,3],
    lmk_faces_idx [B,L] or [L], lmk_bary [B,L,3] or [L,3] -> [B,L,3]."""
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(
            lmk_faces_idx, (vertices.shape[0], lmk_faces_idx.shape[0])
        )
        lmk_bary = jnp.broadcast_to(
            lmk_bary, (vertices.shape[0], *lmk_bary.shape)
        )
    tri_vids = faces[lmk_faces_idx]  # [B, L, 3]
    tri = jnp.take_along_axis(
        vertices[:, :, None, :], tri_vids[..., None], axis=1
    )  # [B, L, 3(corners), 3(xyz)]
    return jnp.einsum("blc,blcx->blx", lmk_bary, tri)


def smplx_forward(
    model: SMPLXModel,
    params: BodyParams,
    *,
    use_pca: bool = True,
    flat_hand_mean: bool = False,
    use_face_contour: bool = True,
    joint_map: Optional[jax.Array] = None,
    return_verts: bool = True,
    pose2rot: bool = True,
) -> SMPLXOutput:
    """Batched SMPL-X forward. All params [B, ...]; returns SMPLXOutput.

    Mirrors the semantics the reference relies on (shape+expression
    blendshapes, pose-corrective blendshapes, LBS, joint regression, extra
    vertex joints, face landmarks, joint mapping) with everything expressed
    as large batched contractions.
    """
    B = params.global_orient.shape[0]
    dtype = model.v_template.dtype
    V = model.num_verts
    J = model.num_joints

    # --- family-specific full-pose assembly (reference model_type flag:
    # smpl=24 joints, smplh=52, smplx=55; cmd_parser.py:94-97).
    if J in (52, 55):
        # hands: PCA -> full axis-angle [B, 45]
        if use_pca:
            lhand = params.left_hand_pose @ model.left_hand_components
            rhand = params.right_hand_pose @ model.right_hand_components
        else:
            lhand, rhand = params.left_hand_pose, params.right_hand_pose
        if not flat_hand_mean:
            lhand = lhand + model.left_hand_mean
            rhand = rhand + model.right_hand_mean

    if J == 55:  # SMPL-X
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose, params.jaw_pose,
             params.leye_pose, params.reye_pose, lhand, rhand], axis=-1,
        )  # [B, 165]
    elif J == 52:  # SMPL-H: no face joints
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose, lhand, rhand], axis=-1,
        )  # [B, 156]
    elif J == 24:  # SMPL: 23 body joints incl. wrists, no hands/face
        assert params.body_pose.shape[-1] == 69, (
            "SMPL expects a 69-dof body pose (23 joints); pad VPoser's 63 "
            "with zero wrists — the reference's append_wrists behavior "
            "(fitting.py:242-246)"
        )
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose], axis=-1,
        )  # [B, 72]
    else:
        raise ValueError(f"Unsupported joint count {J}")

    # --- blendshapes
    shape_coeffs = jnp.concatenate([params.betas, params.expression], axis=-1)
    shape_dirs = jnp.concatenate([model.shapedirs, model.exprdirs], axis=-1)
    v_shaped = model.v_template + jnp.einsum(
        "bk,vck->bvc", shape_coeffs, shape_dirs
    )  # [B, V, 3]

    joints_rest = jnp.einsum("jv,bvc->bjc", model.J_regressor, v_shaped)

    rot_mats = batch_rodrigues(full_pose.reshape(B, J, 3))  # [B, J, 3, 3]

    eye = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(B, V, 3)

    posed_joints, A = _rigid_transform_chain(rot_mats, joints_rest, model.parents)

    vertices = None
    landmarks_src = None
    if return_verts:
        # Skinning as one [V, J] @ [B, J, 16] matmul.  With
        # SMPLIFYX_PALLAS_LBS=1 on TPU, the fused Pallas kernel keeps the
        # [B, V, 16] transform tensor in VMEM (ops/lbs_pallas.py: 1.4-1.5x
        # over the XLA einsum, bit-exact); default is the einsum reference
        # (see _use_pallas_lbs for the compile-time tradeoff).
        from smplifyx_tpu.ops.lbs_pallas import lbs_apply

        vertices = lbs_apply(
            model.lbs_weights, A.reshape(B, J, 16), v_posed,
            _use_pallas_lbs(),
        )
        landmarks_src = vertices

    # --- output joint set: skeleton + extras + face landmarks
    joints_out = posed_joints
    if return_verts:
        # Extras + static landmarks as ONE matmul (gather-free: MXU instead
        # of the TPU's slow gather path).
        extra_lmk = jnp.einsum(
            "ev,bvc->bec", model.extra_lmk_matrix, vertices
        )  # [B, n_extras + n_lmk, 3]
        parts = [posed_joints, extra_lmk]
        if use_face_contour and model.dyn_lmk_faces_idx.shape[1] > 0:
            bucket = _head_yaw_bucket(
                rot_mats, model.neck_kin_chain, model.dyn_lmk_faces_idx.shape[0]
            )
            dyn_faces = model.dyn_lmk_faces_idx[bucket]       # [B, 17]
            dyn_bary = model.dyn_lmk_bary_coords[bucket]      # [B, 17, 3]
            contour = _vertices_to_landmarks(
                vertices, model.faces, dyn_faces, dyn_bary
            )
            parts.append(contour)
        joints_out = jnp.concatenate(parts, axis=1)  # [B, 144?, 3]

    if joint_map is not None:
        # Permutation as a one-hot matmul (gathers are slow on TPU).
        P = jax.nn.one_hot(joint_map, joints_out.shape[1],
                           dtype=joints_out.dtype)
        joints_out = jnp.einsum("kj,bjc->bkc", P, joints_out)

    return SMPLXOutput(
        vertices=vertices,
        joints=joints_out,
        full_pose=full_pose,
        body_pose=params.body_pose,
        betas=params.betas,
        expression=params.expression,
        jaw_pose=params.jaw_pose,
        left_hand_pose=params.left_hand_pose,
        right_hand_pose=params.right_hand_pose,
    )
