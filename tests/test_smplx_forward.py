"""SMPL-X forward pass: golden tests vs an independent, loop-based numpy LBS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.models.bodymodel import synthetic_model, SMPLX_PARENTS
from smplifyx_tpu.models.forward import BodyParams, smplx_forward

from tests._jit import jit_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation


def np_rodrigues(aa):
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        return np.eye(3)
    k = aa / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def np_smplx_forward(model, full_pose, betas, expression):
    """Slow, loop-based LBS in float64 — the golden reference."""
    V = model.num_verts
    J = model.num_joints
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    exprdirs = np.asarray(model.exprdirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    J_reg = np.asarray(model.J_regressor, np.float64)
    W = np.asarray(model.lbs_weights, np.float64)
    parents = model.parents

    v_shaped = v_template.copy()
    for k in range(len(betas)):
        v_shaped += shapedirs[:, :, k] * betas[k]
    for k in range(len(expression)):
        v_shaped += exprdirs[:, :, k] * expression[k]

    joints = J_reg @ v_shaped  # [J, 3]

    rots = np.stack([np_rodrigues(full_pose[3 * j:3 * j + 3]) for j in range(J)])
    pose_feature = (rots[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feature @ posedirs).reshape(V, 3)

    # forward kinematics
    T = np.zeros((J, 4, 4))
    T[0] = np.eye(4)
    T[0][:3, :3] = rots[0]
    T[0][:3, 3] = joints[0]
    for j in range(1, J):
        local = np.eye(4)
        local[:3, :3] = rots[j]
        local[:3, 3] = joints[j] - joints[parents[j]]
        T[j] = T[parents[j]] @ local

    posed_joints = T[:, :3, 3].copy()
    A = T.copy()
    for j in range(J):
        A[j][:3, 3] -= T[j][:3, :3] @ joints[j]

    verts = np.zeros((V, 3))
    for v in range(V):
        Tv = np.einsum("j,jmn->mn", W[v], A)
        verts[v] = Tv[:3, :3] @ v_posed[v] + Tv[:3, 3]
    return verts, posed_joints


@pytest.fixture(scope="module")
def model():
    return synthetic_model(num_verts=64, seed=0)


class TestForwardGolden:
    def test_matches_numpy_lbs(self, model):
        rng = np.random.default_rng(0)
        B = 2
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
        out = jit_forward(model, params, use_face_contour=False)
        for b in range(B):
            fp = np.asarray(out.full_pose[b], np.float64)
            verts_np, joints_np = np_smplx_forward(
                model, fp, np.asarray(params.betas[b]), np.asarray(params.expression[b])
            )
            np.testing.assert_allclose(
                np.asarray(out.vertices[b]), verts_np, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.joints[b, :55]), joints_np, atol=2e-5
            )

    def test_zero_pose_identity(self, model):
        params = BodyParams.zeros(1)
        out = jit_forward(model, params, flat_hand_mean=True,
                            use_face_contour=False)
        # zero pose, zero betas, flat hands: vertices == template
        np.testing.assert_allclose(
            np.asarray(out.vertices[0]), np.asarray(model.v_template), atol=1e-5
        )

    def test_hand_pca(self, model):
        B = 1
        params = BodyParams.zeros(B)
        coeffs = jnp.ones((B, 12))
        params = params.replace(left_hand_pose=coeffs)
        out = jit_forward(model, params, use_pca=True, flat_hand_mean=True,
                            use_face_contour=False)
        expect = np.asarray(coeffs @ model.left_hand_components)
        got = np.asarray(out.full_pose[0, 75:120])
        np.testing.assert_allclose(got, expect[0], atol=1e-6)

    def test_output_joint_count(self, model):
        out = jit_forward(model, BodyParams.zeros(3), use_face_contour=True)
        assert out.joints.shape == (3, 144, 3)
        out2 = jit_forward(model, BodyParams.zeros(3), use_face_contour=False)
        assert out2.joints.shape == (3, 127, 3)

    def test_joint_map(self, model):
        jm = model_to_annotation("smplx", True, True, True, "coco25")
        out = jit_forward(
            model, BodyParams.zeros(2), joint_map=jnp.asarray(jm),
            use_face_contour=True,
        )
        assert out.joints.shape == (2, 25 + 42 + 68, 3)

    def test_jit_and_vmap_safe(self, model):
        f = jax.jit(lambda p: jit_forward(model, p).vertices)
        v = f(BodyParams.zeros(2))
        assert v.shape[0] == 2

    def test_grad_flows(self, model):
        def loss(body_pose):
            p = BodyParams.zeros(1).replace(body_pose=body_pose)
            return jnp.sum(jit_forward(model, p).vertices ** 2)

        g = jax.grad(loss)(jnp.full((1, 63), 0.1))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestJointMapping:
    def test_coco25_table(self):
        jm = model_to_annotation("smplx", True, True, False, "coco25")
        assert len(jm) == 25 + 42 + 51
        assert jm[0] == 55  # nose
        assert jm[25] == 20  # left wrist starts left hand block

    def test_halpe_table(self):
        jm = model_to_annotation("smplx", True, True, True, "halpe")
        assert len(jm) == 26 + 42 + 68
        assert jm[0] == 55

    def test_wholebody_table(self):
        jm = model_to_annotation("smplx", True, True, True, "coco_wholebody")
        assert len(jm) == 23 + 42 + 68

    def test_face_block_is_contiguous(self):
        jm = model_to_annotation("smplx", True, True, True, "coco25")
        np.testing.assert_array_equal(jm[-68:], np.arange(76, 144))

    def test_parents_tree_valid(self):
        assert SMPLX_PARENTS[0] == -1
        assert all(SMPLX_PARENTS[j] < j for j in range(1, 55))


class TestModelFamilies:
    """SMPL (24 joints) and SMPL-H (52) forwards against the numpy golden."""

    def _golden_check(self, model_type, body_dim, J, num_out):
        model = synthetic_model(num_verts=64, seed=5, model_type=model_type)
        rng = np.random.default_rng(6)
        B = 2
        params = BodyParams.zeros(B)
        params = params.replace(
            body_pose=jnp.asarray(rng.normal(0, 0.2, (B, body_dim)),
                                  jnp.float32),
            betas=jnp.asarray(rng.normal(0, 0.5, (B, 10)), jnp.float32),
        )
        out = jit_forward(model, params, use_face_contour=False,
                            flat_hand_mean=True)
        assert out.joints.shape == (B, num_out, 3)
        for b in range(B):
            fp = np.asarray(out.full_pose[b], np.float64)
            assert fp.shape == (J * 3,)
            verts_np, joints_np = np_smplx_forward(
                model, fp, np.asarray(params.betas[b]),
                np.asarray(params.expression[b]),
            )
            np.testing.assert_allclose(
                np.asarray(out.vertices[b]), verts_np, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(out.joints[b, :J]), joints_np, atol=2e-5
            )

    def test_smpl(self):
        # 24 joints + 11 extras, no face landmarks
        self._golden_check("smpl", body_dim=69, J=24, num_out=24 + 11)

    def test_smplh(self):
        # 52 joints + 21 extras
        self._golden_check("smplh", body_dim=63, J=52, num_out=52 + 21)

    def test_smpl_mapping_table(self):
        jm = model_to_annotation("smpl", False, False, False, "coco25")
        assert len(jm) == 25
        assert jm.max() <= 34  # 24 joints + 11 extras


class TestHeadYawBucket:
    """Pin the dynamic-contour bucket key to the smplx package convention.

    smplx (lbs.find_dynamic_lmk_idx_and_bcoords): key = -rot_mat_to_euler(R)
    where rot_mat_to_euler = atan2(-R[2,0], sy), i.e. key = atan2(+R[2,0],
    sy).  A sign flip mirrors the contour tables left/right for every
    nonzero head yaw — these hardcoded expectations catch it directly
    (a differential oracle can re-implement the same flip and pass)."""

    def test_known_yaws(self):
        from smplifyx_tpu.models.forward import _head_yaw_bucket

        def ry(deg):
            t = np.deg2rad(deg)
            c, s = np.cos(t), np.sin(t)
            return np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

        # R[2,0] = -sin(theta) for Ry(theta) => key_deg = -theta:
        #   theta=+20 -> key=-20 -> 39 - (-20) = 59
        #   theta=-20 -> key=+20 -> 20
        #   theta=+50 -> key=-50 < -39     -> 78
        #   theta=-50 -> key=+50 clamp->39 -> 39
        thetas = [0.0, 20.0, -20.0, 50.0, -50.0]
        expected = [0, 59, 20, 78, 39]
        rot = jnp.asarray(np.stack([ry(t) for t in thetas])[:, None])
        buckets = _head_yaw_bucket(rot, neck_chain=(0,), num_buckets=79)
        np.testing.assert_array_equal(np.asarray(buckets), expected)
