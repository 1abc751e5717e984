"""End-to-end fitting on synthetic data: generate GT params, render 2D
keypoints with a known camera, fit from neutral init, check recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.fitting.energy import FrameData, StageWeights
from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
from smplifyx_tpu.fitting.params import (
    FitSettings, pack, unpack, camera_stage_mask, body_stage_mask,
    body_params_from_flat,
)
from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch, recover_outputs
from smplifyx_tpu.fitting.stages import build_stage_schedule
from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.forward import BodyParams, smplx_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation
from smplifyx_tpu.ops.camera import CameraParams, project_points

B = 3
FOCAL = 1000.0
H, W = 480.0, 640.0


def identity_decode(b):
    return b


@pytest.fixture(scope="module")
def setup():
    model = synthetic_model(num_verts=96, seed=0)
    settings = FitSettings(
        use_vposer=False, num_body_kp=25, use_joints_conf=True,
        body_prior_type="l2", use_face_contour=True,
        camera_conf_mode="per_joint",
    )
    joint_map = jnp.asarray(model_to_annotation("smplx", True, True, True, "coco25"))
    K = joint_map.shape[0]

    rng = np.random.default_rng(42)
    gt_params = BodyParams(
        global_orient=jnp.asarray(rng.normal(0, 0.1, (B, 3)), jnp.float32),
        body_pose=jnp.asarray(rng.normal(0, 0.15, (B, 63)), jnp.float32),
        betas=jnp.asarray(rng.normal(0, 0.5, (B, 10)), jnp.float32),
        expression=jnp.zeros((B, 10)),
        jaw_pose=jnp.zeros((B, 3)),
        leye_pose=jnp.zeros((B, 3)),
        reye_pose=jnp.zeros((B, 3)),
        left_hand_pose=jnp.zeros((B, 12)),
        right_hand_pose=jnp.zeros((B, 12)),
    )
    gt_cam_t = jnp.asarray(
        np.stack([[0.05, -0.1, 4.0], [-0.1, 0.05, 5.0], [0.0, 0.0, 4.5]]),
        jnp.float32,
    )

    out = smplx_forward(model, gt_params, joint_map=joint_map)
    cam = CameraParams(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        translation=gt_cam_t,
        focal=jnp.full((B, 2), FOCAL),
        center=jnp.broadcast_to(jnp.asarray([W / 2, H / 2]), (B, 2)),
    )
    gt_2d = project_points(cam, out.joints)  # [B, K, 2]

    frames = FrameData(
        gt_joints=gt_2d,
        conf=jnp.ones((B, K)),
        joint_weights=jnp.ones((B, K)),
        focal=jnp.full((B, 2), FOCAL),
        center=jnp.broadcast_to(jnp.asarray([W / 2, H / 2]), (B, 2)),
        data_weight=jnp.full((B,), 1000.0 / H),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None].repeat(B, 0)
        ),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    return model, settings, joint_map, gt_params, gt_cam_t, frames, out


@pytest.mark.slow
class TestFitBatch:
    def test_recovers_synthetic_ground_truth(self, setup):
        model, settings, joint_map, gt_params, gt_cam_t, frames, gt_out = setup

        schedule = build_stage_schedule(
            body_pose_prior_weights=[4.04e2, 57.4, 4.78],
            shape_weights=[1e2, 1e1, 0.5e1],
            expr_weights=[1e2, 1e1, 0.5e1],
            hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
            hand_joints_weights=[0.0, 0.0, 1.0],
            face_joints_weights=[0.0, 0.0, 1.0],
        )
        # Reference budget is up to 30x30=900 L-BFGS iterations per stage
        # (optim_factory maxiters x FittingMonitor maxiters); 150 suffices
        # here.
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=150, history=16, gtol=1e-8, ftol=1e-11),
            camera_lbfgs=LBFGSConfig(max_iters=50, history=10),
            try_both_orient=False,
        )
        # Init near GT, mimicking the regression-prior initialization the
        # real pipeline uses (a zeros init lands in local minima for the
        # reference algorithm too — it is a local optimizer by design).
        rng = np.random.default_rng(7)
        x0 = pack(
            settings,
            cam_t=jnp.zeros((B, 3)),
            global_orient=gt_params.global_orient
            + jnp.asarray(rng.normal(0, 0.05, (B, 3)), jnp.float32),
            body=gt_params.body_pose
            + jnp.asarray(rng.normal(0, 0.05, (B, 63)), jnp.float32),
        )
        edge_idxs = jnp.asarray([[5, 12], [2, 9]])

        fit = jax.jit(
            lambda x0, frames: fit_batch(
                model, settings, options, schedule, frames, x0,
                identity_decode, joint_map, edge_idxs=edge_idxs,
            )
        )
        res = fit(x0, frames)

        out, params, cam_t = recover_outputs(
            model, settings, res.x, identity_decode, joint_map
        )
        # Reprojection error must be small.  It does NOT go to zero: the
        # staged priors (body 404 -> 57 -> 4.78, shape 100 -> 5) pull the
        # optimum away from the zero-reprojection GT configuration — the
        # same trade-off that leaves the reference at ~33mm V2V on EHF.
        # The bound catches optimizer/energy regressions.
        cam = CameraParams(
            rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
            translation=cam_t,
            focal=frames.focal,
            center=frames.center,
        )
        proj = project_points(cam, out.joints)
        reproj = np.asarray(
            jnp.sqrt(jnp.sum((proj - frames.gt_joints) ** 2, -1)).mean(-1)
        )
        assert reproj.max() < 6.0, f"mean reprojection px: {reproj}"

        # Depth is set by the camera stage (similar-triangles estimate +
        # depth-regularized refinement) and frozen afterwards (reference
        # behavior); on a random synthetic skeleton the estimate carries a
        # noticeable bias, so only gross correctness is asserted.  The
        # downstream EHF metrics are Procrustes (scale) aligned anyway.
        np.testing.assert_allclose(
            np.asarray(cam_t[:, 2]), np.asarray(gt_cam_t[:, 2]), rtol=0.3
        )

        # Losses must decrease monotonically across stages on average.
        sl = np.asarray(res.stage_losses)
        assert np.isfinite(sl).all()

    def test_dual_orientation_selection(self, setup):
        model, settings, joint_map, gt_params, gt_cam_t, frames, gt_out = setup
        schedule = build_stage_schedule(
            body_pose_prior_weights=[4.04e2, 4.78],
            shape_weights=[1e2, 0.5e1],
            expr_weights=[1e2, 0.5e1],
            hand_pose_prior_weights=[1e2, 0.5e1],
            hand_joints_weights=[0.0, 1.0],
            face_joints_weights=[0.0, 1.0],
        )
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=25, history=8),
            camera_lbfgs=LBFGSConfig(max_iters=20, history=8),
            try_both_orient=True,
            side_view_thsh=1e9,  # force both orientations to be tried
        )
        x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
                  global_orient=jnp.zeros((B, 3)), body=jnp.zeros((B, 63)))
        res = fit_batch(
            model, settings, options, schedule, frames, x0,
            identity_decode, joint_map, edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
        )
        assert res.x.shape == (B, settings.dim)
        assert res.flipped.shape == (B,)
        assert np.isfinite(np.asarray(res.loss)).all()
        # Work-accounting stats: every executed stage evaluates the
        # objective at least once per lane, camera stage included.
        ev = np.asarray(res.stage_evals)
        assert ev.shape == (2, B) and (ev >= 1).all(), ev
        assert (np.asarray(res.camera_evals) >= 1).all()

    def test_frozen_groups_stay_at_init(self, setup):
        """optim_shape/hands=False must leave betas / hand PCA exactly at
        their initial values through a full fit while everything else
        moves."""
        model, base_settings, joint_map, gt_params, gt_cam_t, frames, _ = setup
        settings = base_settings.replace(optim_shape=False, optim_hands=False)
        schedule = build_stage_schedule(
            body_pose_prior_weights=[4.04e2, 4.78],
            shape_weights=[1e2, 0.5e1],
            expr_weights=[1e2, 0.5e1],
            hand_pose_prior_weights=[1e2, 0.5e1],
            hand_joints_weights=[0.0, 1.0],
            face_joints_weights=[0.0, 1.0],
        )
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=15, history=8),
            camera_lbfgs=LBFGSConfig(max_iters=10, history=8),
        )
        rng = np.random.default_rng(5)
        init_betas = jnp.asarray(rng.normal(0, 0.3, (B, 10)), jnp.float32)
        x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
                  global_orient=gt_params.global_orient,
                  body=gt_params.body_pose, betas=init_betas)
        res = fit_batch(
            model, settings, options, schedule, frames, x0,
            identity_decode, joint_map,
            edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
        )
        seg0 = unpack(settings, x0)
        seg1 = unpack(settings, res.x)
        np.testing.assert_array_equal(np.asarray(seg1["betas"]),
                                      np.asarray(seg0["betas"]))
        np.testing.assert_array_equal(np.asarray(seg1["lhand"]),
                                      np.asarray(seg0["lhand"]))
        # the unfrozen pose did move
        assert float(jnp.abs(seg1["body"] - seg0["body"]).max()) > 1e-4


class TestParams:
    def test_pack_unpack_roundtrip(self):
        settings = FitSettings()
        rng = np.random.default_rng(0)
        vals = {
            "cam_t": jnp.asarray(rng.normal(size=(2, 3)), jnp.float32),
            "body": jnp.asarray(rng.normal(size=(2, 63)), jnp.float32),
            "betas": jnp.asarray(rng.normal(size=(2, 10)), jnp.float32),
        }
        x = pack(settings, **vals)
        assert x.shape == (2, settings.dim)
        seg = unpack(settings, x)
        for k, v in vals.items():
            np.testing.assert_allclose(np.asarray(seg[k]), np.asarray(v))
        np.testing.assert_allclose(np.asarray(seg["jaw"]), 0.0)

    def test_vposer_layout(self):
        settings = FitSettings(use_vposer=True, latent_dim=32)
        assert settings.body_dim == 32
        assert settings.dim == 3 + 3 + 32 + 10 + 10 + 9 + 24

    def test_use_pca_false_hand_segments_are_45(self):
        """Regression: use_pca=False must allocate full 45-dof hand
        segments (smplx create(use_pca=False) semantics); a num_pca-wide
        segment fails full_pose.reshape(B, 55, 3) at trace time."""
        from smplifyx_tpu.models.bodymodel import synthetic_model
        from smplifyx_tpu.models.forward import smplx_forward
        from smplifyx_tpu.fitting.params import body_params_from_flat

        settings = FitSettings(use_pca=False, num_pca=12)
        segs = settings.segments()
        assert segs["lhand"][1] == 45 and segs["rhand"][1] == 45
        model = synthetic_model(num_verts=64, seed=0)
        x = jnp.zeros((2, settings.dim), jnp.float32)
        params, _, _ = body_params_from_flat(settings, x, lambda b: b)
        out = smplx_forward(model, params, use_pca=False, return_verts=True)
        assert out.vertices.shape == (2, 64, 3)

    def test_masks(self):
        settings = FitSettings()
        cm = np.asarray(camera_stage_mask(settings))
        bm = np.asarray(body_stage_mask(settings))
        assert cm.sum() == 6  # cam_t + global_orient
        assert bm[:3].sum() == 0  # camera frozen in body stages
        assert bm[3:].sum() == settings.dim - 3

    def test_optim_group_freezing(self):
        """optim_shape/expression/jaw/hands zero the matching mask segments
        (reference cmd_parser.py:101-110 parses these flags but never reads
        them; here they are live)."""
        for flag, segs in [
            ("optim_shape", ["betas"]),
            ("optim_expression", ["expression"]),
            ("optim_jaw", ["jaw", "leye", "reye"]),
            ("optim_hands", ["lhand", "rhand"]),
        ]:
            settings = FitSettings(**{flag: False})
            bm = np.asarray(body_stage_mask(settings))
            segments = settings.segments()
            frozen = np.zeros(settings.dim, bool)
            for s in segs:
                off, size = segments[s]
                frozen[off : off + size] = True
            assert bm[frozen].sum() == 0, flag
            # everything else (bar the camera) stays free
            assert bm[~frozen][3:].sum() == settings.dim - 3 - frozen.sum()

    def test_body_params_from_flat(self):
        settings = FitSettings()
        x = jnp.arange(2 * settings.dim, dtype=jnp.float32).reshape(2, -1)
        params, cam_t, raw = body_params_from_flat(settings, x, lambda b: b)
        np.testing.assert_allclose(np.asarray(cam_t), np.asarray(x[:, :3]))
        np.testing.assert_allclose(
            np.asarray(params.global_orient), np.asarray(x[:, 3:6])
        )
        assert params.body_pose.shape == (2, 63)


class TestSchedule:
    def test_bending_is_3_17x_body(self):
        s = build_stage_schedule([100.0, 10.0])
        np.testing.assert_allclose(
            np.asarray(s.bending_prior_weight),
            3.17 * np.asarray([100.0, 10.0]), rtol=1e-6,
        )

    def test_jaw_string_parsing(self):
        s = build_stage_schedule(
            [1.0, 2.0], jaw_pose_prior_weights=["10, 100, 100", "1, 5, 5"]
        )
        np.testing.assert_allclose(
            np.asarray(s.jaw_prior_weight), [[10, 100, 100], [1, 5, 5]]
        )

    def test_length_mismatch_raises(self):
        with pytest.raises(AssertionError):
            build_stage_schedule([1.0, 2.0], shape_weights=[1.0])


@pytest.mark.slow
class TestSplitDispatch:
    def test_camera_stage_off_resumes_equivalently(self, setup):
        """Splitting a fit into (camera + stage0) then per-stage dispatches
        with camera_stage=False must produce the same result as the single
        monolithic program (the RPC-deadline splitting used by
        bench_collision.py --split and by checkpoint resume)."""
        import jax.tree_util as jtu

        model, settings, joint_map, gt_params, gt_cam_t, frames, gt_out = setup
        schedule = build_stage_schedule(
            body_pose_prior_weights=[4.04e2, 57.4],
            shape_weights=[1e2, 1e1], expr_weights=[1e2, 1e1],
            hand_pose_prior_weights=[1e2, 1e1],
            hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
        )
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=20, history=8),
            camera_lbfgs=LBFGSConfig(max_iters=10, history=8),
        )
        rng = np.random.default_rng(7)
        x0 = pack(
            settings,
            cam_t=jnp.zeros((B, 3)),
            global_orient=gt_params.global_orient,
            body=gt_params.body_pose
            + jnp.asarray(rng.normal(0, 0.05, (B, 63)), jnp.float32),
        )
        edge_idxs = jnp.asarray([[5, 12], [2, 9]])

        mono = fit_batch(
            model, settings, options, schedule, frames, x0,
            identity_decode, joint_map, edge_idxs=edge_idxs,
        )

        head = fit_batch(
            model, settings, options,
            jtu.tree_map(lambda a: a[0:1], schedule), frames, x0,
            identity_decode, joint_map, edge_idxs=edge_idxs,
        )
        tail = fit_batch(
            model, settings, options.replace(camera_stage=False),
            jtu.tree_map(lambda a: a[1:2], schedule), frames, head.x,
            identity_decode, joint_map, edge_idxs=edge_idxs,
        )
        np.testing.assert_allclose(
            np.asarray(tail.x), np.asarray(mono.x), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(tail.loss), np.asarray(mono.loss), rtol=1e-4
        )
