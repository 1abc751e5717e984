"""Device-mesh sharding: results must match single-device bitwise-close,
with frames sharded over 'data' and optionally vertices over 'model'."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from smplifyx_tpu.fitting.energy import FrameData
from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
from smplifyx_tpu.fitting.params import FitSettings, pack
from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch
from smplifyx_tpu.fitting.stages import build_stage_schedule
from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.forward import BodyParams, smplx_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation
from smplifyx_tpu.ops.camera import CameraParams, project_points
from smplifyx_tpu.parallel.mesh import (
    make_mesh, shard_frames, shard_model, replicate, fit_batch_sharded,
)


def _make_problem(B, V=64, seed=0):
    model = synthetic_model(num_verts=V, seed=seed)
    settings = FitSettings(use_face_contour=True, camera_conf_mode="per_joint")
    joint_map = jnp.asarray(model_to_annotation("smplx", True, True, True, "coco25"))
    K = joint_map.shape[0]
    rng = np.random.default_rng(seed)
    gt = BodyParams.zeros(B)
    gt = gt.replace(
        body_pose=jnp.asarray(rng.normal(0, 0.1, (B, 63)), jnp.float32),
        betas=jnp.asarray(rng.normal(0, 0.3, (B, 10)), jnp.float32),
    )
    cam_t = jnp.asarray(
        np.stack([[0, 0, 4.0 + 0.2 * i] for i in range(B)]), jnp.float32
    )
    out = smplx_forward(model, gt, joint_map=joint_map)
    cam = CameraParams(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), translation=cam_t,
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
    )
    gt2d = project_points(cam, out.joints)
    frames = FrameData(
        gt_joints=gt2d, conf=jnp.ones((B, K)), joint_weights=jnp.ones((B, K)),
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
        data_weight=jnp.full((B,), 1000.0 / 480),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None].repeat(B, 0)
        ),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)), global_orient=jnp.zeros((B, 3)),
              body=jnp.zeros((B, 63)))
    schedule = build_stage_schedule([4.04e2, 4.78], shape_weights=[1e2, 5.0],
                                    expr_weights=[1e2, 5.0],
                                    hand_pose_prior_weights=[1e2, 5.0],
                                    hand_joints_weights=[0.0, 1.0],
                                    face_joints_weights=[0.0, 1.0])
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=10, history=6, max_ls=10),
        camera_lbfgs=LBFGSConfig(max_iters=8, history=6, max_ls=10),
    )
    return model, settings, options, schedule, frames, x0, joint_map


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_make_mesh_shapes(self):
        mesh = make_mesh()
        assert mesh.shape == {"data": 8, "model": 1}
        mesh2 = make_mesh(n_data=4, n_model=2)
        assert mesh2.shape == {"data": 4, "model": 2}


@pytest.mark.slow
class TestDataParallelFit:
    def test_sharded_matches_single_device(self):
        B = 8
        model, settings, options, schedule, frames, x0, joint_map = \
            _make_problem(B)
        edge = jnp.asarray([[5, 12], [2, 9]])

        res_single = fit_batch(
            model, settings, options, schedule, frames, x0,
            lambda b: b, joint_map, edge_idxs=edge,
        )

        mesh = make_mesh()
        res_sharded = fit_batch_sharded(
            mesh, model, settings, options, schedule, frames, x0,
            lambda b: b, joint_map, edge_idxs=edge,
        )
        # Different compilations reduce in different orders; the chaotic
        # L-BFGS trajectories amplify ulp-level noise, so compare reached
        # loss quality rather than exact iterates.
        np.testing.assert_allclose(
            np.asarray(res_sharded.loss), np.asarray(res_single.loss),
            rtol=0.05,
        )

    def test_output_sharding_preserved(self):
        B = 8
        model, settings, options, schedule, frames, x0, joint_map = \
            _make_problem(B)
        mesh = make_mesh()
        res = fit_batch_sharded(
            mesh, model, settings, options, schedule, frames, x0,
            lambda b: b, joint_map, edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
        )
        # The fitted params must still be sharded over the data axis.
        shard_specs = res.x.sharding.spec
        assert shard_specs[0] == "data"


class TestModelParallelForward:
    def test_vertex_sharded_forward_matches(self):
        mesh = make_mesh(n_data=4, n_model=2)
        model = synthetic_model(num_verts=64, seed=1)
        params = BodyParams.zeros(4).replace(
            body_pose=jnp.full((4, 63), 0.05)
        )
        out_ref = smplx_forward(model, params, use_face_contour=True)

        model_sh = shard_model(model, mesh)
        params_sh = shard_frames(params, mesh)
        out_sh = jax.jit(
            lambda m, p: smplx_forward(m, p, use_face_contour=True)
        )(model_sh, params_sh)
        np.testing.assert_allclose(
            np.asarray(out_sh.vertices), np.asarray(out_ref.vertices), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_sh.joints), np.asarray(out_ref.joints), atol=2e-5
        )
