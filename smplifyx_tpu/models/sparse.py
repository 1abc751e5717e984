"""Joints-only SMPL-X forward: full joint set without full-mesh skinning.

The camera-init stage and the similar-triangles depth guess only consume
JOINTS (reference: `return_verts=False` model calls at fitting.py:82-84 and
the camera closure at fit_single_frame.py:480-485), yet the mapped joint set
includes vertex-picked extras and face landmarks, which normally require the
posed mesh.  Observation: those depend on a tiny static subset of vertices —
the 21 extra-joint vertex ids plus the vertices of every (static + dynamic)
landmark triangle, ~1-2% of the mesh — and rest-pose joints are LINEAR in
the shape/expression coefficients, so the joint regressor contracts to a
[J, 3, K] tensor offline.

`build_joints_model` precomputes that reduction; `joints_forward` then runs
blendshapes/pose-correctives/skinning on the subset only, making camera-stage
energy evaluations ~50x cheaper in FLOPs than the full forward.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from smplifyx_tpu.models.bodymodel import SMPLXModel
from smplifyx_tpu.models.forward import (
    BodyParams,
    _head_yaw_bucket,
    _rigid_transform_chain,
)
from smplifyx_tpu.ops.rotation import batch_rodrigues


@struct.dataclass
class JointsModel:
    """Reduced model for joints-only forwards (a pytree)."""

    jr_template: jax.Array      # [J, 3] rest joints of the template
    jr_dirs: jax.Array          # [J, 3, K+E] rest-joint blendshape directions
    sub_template: jax.Array     # [S, 3]
    sub_shapedirs: jax.Array    # [S, 3, K+E]
    sub_posedirs: jax.Array     # [P, S*3]
    sub_lbs: jax.Array          # [S, J]
    left_hand_components: jax.Array
    right_hand_components: jax.Array
    left_hand_mean: jax.Array
    right_hand_mean: jax.Array
    extra_idx: jax.Array        # [21] positions within the subset
    lmk_tri_sub: jax.Array      # [51, 3] subset positions of landmark corners
    lmk_bary: jax.Array         # [51, 3]
    dyn_tri_sub: jax.Array      # [L, 17, 3]
    dyn_bary: jax.Array         # [L, 17, 3]
    parents: tuple = struct.field(pytree_node=False)
    neck_kin_chain: tuple = struct.field(pytree_node=False)
    num_joints: int = struct.field(pytree_node=False)


def build_joints_model(model: SMPLXModel) -> JointsModel:
    """Precompute the vertex subset + contracted joint regressor (host-side)."""
    faces = np.asarray(model.faces)
    extra_vids = np.asarray(model.extra_joint_vids)
    lmk_tris = faces[np.asarray(model.lmk_faces_idx)]          # [51, 3]
    dyn_tris = faces[np.asarray(model.dyn_lmk_faces_idx)]      # [L, 17, 3]

    subset = np.unique(np.concatenate(
        [extra_vids.ravel(), lmk_tris.ravel(), dyn_tris.ravel()]
    ))

    def to_sub(a):
        # subset is sorted-unique and contains every queried id; searchsorted
        # also handles the empty landmark tables of face-less families.
        return np.searchsorted(subset, a).astype(np.int32)

    J_reg = np.asarray(model.J_regressor)
    v_template = np.asarray(model.v_template)
    shape_dirs = np.concatenate(
        [np.asarray(model.shapedirs), np.asarray(model.exprdirs)], axis=-1
    )  # [V, 3, K+E]

    jr_template = J_reg @ v_template                            # [J, 3]
    jr_dirs = np.einsum("jv,vck->jck", J_reg, shape_dirs)       # [J, 3, K+E]

    S = len(subset)
    posedirs = np.asarray(model.posedirs)                       # [P, V*3]
    sub_cols = (subset[:, None] * 3 + np.arange(3)[None]).reshape(-1)
    sub_posedirs = posedirs[:, sub_cols]                        # [P, S*3]

    return JointsModel(
        jr_template=jnp.asarray(jr_template),
        jr_dirs=jnp.asarray(jr_dirs),
        sub_template=jnp.asarray(v_template[subset]),
        sub_shapedirs=jnp.asarray(shape_dirs[subset]),
        sub_posedirs=jnp.asarray(sub_posedirs),
        sub_lbs=jnp.asarray(np.asarray(model.lbs_weights)[subset]),
        left_hand_components=model.left_hand_components,
        right_hand_components=model.right_hand_components,
        left_hand_mean=model.left_hand_mean,
        right_hand_mean=model.right_hand_mean,
        extra_idx=jnp.asarray(to_sub(extra_vids)),
        lmk_tri_sub=jnp.asarray(to_sub(lmk_tris)),
        lmk_bary=model.lmk_bary_coords,
        dyn_tri_sub=jnp.asarray(to_sub(dyn_tris)),
        dyn_bary=model.dyn_lmk_bary_coords,
        parents=model.parents,
        neck_kin_chain=model.neck_kin_chain,
        num_joints=model.num_joints,
    )


def joints_forward(
    jm: JointsModel,
    params: BodyParams,
    *,
    use_pca: bool = True,
    flat_hand_mean: bool = False,
    use_face_contour: bool = True,
    joint_map: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, ...] params -> mapped joints [B, K, 3], no full-mesh skinning.

    Matches smplx_forward(...).joints exactly (tested), at a fraction of the
    cost — used by the camera stage and guess_init.
    """
    B = params.global_orient.shape[0]
    J = jm.num_joints

    # family-specific full-pose assembly, mirroring smplx_forward
    if J in (52, 55):
        if use_pca:
            lhand = params.left_hand_pose @ jm.left_hand_components
            rhand = params.right_hand_pose @ jm.right_hand_components
        else:
            lhand, rhand = params.left_hand_pose, params.right_hand_pose
        if not flat_hand_mean:
            lhand = lhand + jm.left_hand_mean
            rhand = rhand + jm.right_hand_mean

    if J == 55:  # SMPL-X
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose, params.jaw_pose,
             params.leye_pose, params.reye_pose, lhand, rhand], axis=-1,
        )
    elif J == 52:  # SMPL-H: no face joints
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose, lhand, rhand], axis=-1,
        )
    else:  # SMPL: 69-dof body pose incl. wrists
        full_pose = jnp.concatenate(
            [params.global_orient, params.body_pose], axis=-1,
        )
    coeffs = jnp.concatenate([params.betas, params.expression], axis=-1)

    joints_rest = jm.jr_template + jnp.einsum("bk,jck->bjc", coeffs, jm.jr_dirs)
    rot_mats = batch_rodrigues(full_pose.reshape(B, J, 3))
    posed_joints, A = _rigid_transform_chain(rot_mats, joints_rest, jm.parents)

    # Subset skinning.
    eye = jnp.eye(3, dtype=full_pose.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(B, (J - 1) * 9)
    Ssub = jm.sub_template.shape[0]
    v_shaped = jm.sub_template + jnp.einsum(
        "bk,vck->bvc", coeffs, jm.sub_shapedirs
    )
    v_posed = v_shaped + (pose_feature @ jm.sub_posedirs).reshape(B, Ssub, 3)
    T = jnp.einsum("vj,bjmn->bvmn", jm.sub_lbs, A)
    verts_sub = (
        jnp.einsum("bvmn,bvn->bvm", T[..., :3, :3], v_posed) + T[..., :3, 3]
    )

    extras = verts_sub[:, jm.extra_idx]
    tri = verts_sub[:, jm.lmk_tri_sub]                    # [B, 51, 3, 3]
    lmk = jnp.einsum("lc,blcx->blx", jm.lmk_bary, tri)
    parts = [posed_joints, extras, lmk]
    if use_face_contour and jm.dyn_tri_sub.shape[1] > 0:
        bucket = _head_yaw_bucket(
            rot_mats, jm.neck_kin_chain, jm.dyn_tri_sub.shape[0]
        )
        dyn_tri = jm.dyn_tri_sub[bucket]                  # [B, 17, 3]
        dyn_bary = jm.dyn_bary[bucket]
        tri_d = jax.vmap(lambda v, i: v[i])(verts_sub, dyn_tri)  # [B,17,3,3]
        contour = jnp.einsum("blc,blcx->blx", dyn_bary, tri_d)
        parts.append(contour)
    joints = jnp.concatenate(parts, axis=1)
    if joint_map is not None:
        P = jax.nn.one_hot(joint_map, joints.shape[1], dtype=joints.dtype)
        joints = jnp.einsum("kj,bjc->bkc", P, joints)
    return joints
