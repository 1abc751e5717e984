"""Joints-only forward must match the full forward's joints exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.forward import BodyParams, smplx_forward

from tests._jit import jit_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation
from smplifyx_tpu.models.sparse import build_joints_model, joints_forward


class TestJointsForward:
    def test_matches_full_forward(self):
        model = synthetic_model(num_verts=128, seed=0)
        jm = build_joints_model(model)
        joint_map = jnp.asarray(
            model_to_annotation("smplx", True, True, True, "coco25")
        )
        rng = np.random.default_rng(1)
        B = 3
        params = BodyParams(
            global_orient=jnp.asarray(rng.normal(0, 0.3, (B, 3)), jnp.float32),
            body_pose=jnp.asarray(rng.normal(0, 0.2, (B, 63)), jnp.float32),
            betas=jnp.asarray(rng.normal(0, 1.0, (B, 10)), jnp.float32),
            expression=jnp.asarray(rng.normal(0, 1.0, (B, 10)), jnp.float32),
            jaw_pose=jnp.asarray(rng.normal(0, 0.1, (B, 3)), jnp.float32),
            leye_pose=jnp.zeros((B, 3)),
            reye_pose=jnp.zeros((B, 3)),
            left_hand_pose=jnp.asarray(rng.normal(0, 0.5, (B, 12)), jnp.float32),
            right_hand_pose=jnp.asarray(rng.normal(0, 0.5, (B, 12)), jnp.float32),
        )
        full = jit_forward(model, params, use_face_contour=True,
                             joint_map=joint_map)
        sparse = jax.jit(joints_forward, static_argnames=('use_face_contour', 'use_pca', 'flat_hand_mean'))(jm, params, use_face_contour=True,
                                joint_map=joint_map)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(full.joints), atol=3e-5
        )

    def test_no_contour_no_map(self):
        model = synthetic_model(num_verts=96, seed=2)
        jm = build_joints_model(model)
        params = BodyParams.zeros(2)
        full = jit_forward(model, params, use_face_contour=False)
        sparse = jax.jit(joints_forward, static_argnames=('use_face_contour', 'use_pca', 'flat_hand_mean'))(jm, params, use_face_contour=False)
        np.testing.assert_allclose(
            np.asarray(sparse), np.asarray(full.joints), atol=3e-5
        )

    def test_grad_and_jit(self):
        model = synthetic_model(num_verts=96, seed=3)
        jm = build_joints_model(model)

        def loss(body_pose):
            p = BodyParams.zeros(1).replace(body_pose=body_pose)
            return jnp.sum(joints_forward(jm, p) ** 2)

        g = jax.jit(jax.grad(loss))(jnp.full((1, 63), 0.1))
        assert np.isfinite(np.asarray(g)).all()

    def test_subset_is_small(self):
        model = synthetic_model(num_verts=512, seed=4)
        jm = build_joints_model(model)
        # the subset covers extras + landmark triangles only
        assert jm.sub_template.shape[0] < 512
