"""Interpenetration term inside the full staged pipeline (small, CPU)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from smplifyx_tpu.fitting.energy import FrameData
from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
from smplifyx_tpu.fitting.params import FitSettings, pack
from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch
from smplifyx_tpu.fitting.stages import build_stage_schedule
from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.forward import BodyParams, smplx_forward
from smplifyx_tpu.models.joint_mapping import model_to_annotation
from smplifyx_tpu.ops.camera import CameraParams, project_points
from smplifyx_tpu.ops.collision import make_collision_fn, synthetic_part_segm

pytestmark = pytest.mark.e2e


def test_pipeline_with_collision_term():
    B = 2
    model = synthetic_model(num_verts=96, seed=0)
    settings = FitSettings(interpenetration=True)
    joint_map = jnp.asarray(
        model_to_annotation("smplx", True, True, True, "coco25")
    )
    K = joint_map.shape[0]
    gt = BodyParams.zeros(B).replace(
        body_pose=jnp.asarray(
            np.random.default_rng(0).normal(0, 0.1, (B, 63)), jnp.float32
        )
    )
    cam_t = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (B, 1)), jnp.float32)
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
        data_weight=jnp.full((B,), 2.0),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None]
            .repeat(B, 0)),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
              global_orient=jnp.zeros((B, 3)), body=jnp.zeros((B, 63)))

    segm, parents = synthetic_part_segm(int(model.faces.shape[0]), seed=1)
    collision_fn = make_collision_fn(
        model.faces, segm=segm, parents=parents, window=8, sigma=1e-3,
    )
    schedule = build_stage_schedule(
        [4.04e2, 4.78], coll_loss_weights=[0.0, 1.0],
        hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
    )
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=8, history=6, max_ls=8),
        camera_lbfgs=LBFGSConfig(max_iters=6, history=4, max_ls=8),
    )
    res = fit_batch(
        model, settings, options, schedule, frames, x0, lambda b: b,
        joint_map, edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
        collision_fn=collision_fn,
    )
    assert np.isfinite(np.asarray(res.loss)).all()
    assert res.x.shape == (B, settings.dim)


def test_per_stage_collision_mask_matches_full():
    """Grouped sparse/full stages must agree with the all-full path."""
    B = 2
    model = synthetic_model(num_verts=96, seed=0)
    settings = FitSettings(interpenetration=True)
    joint_map = jnp.asarray(
        model_to_annotation("smplx", True, True, True, "coco25")
    )
    K = joint_map.shape[0]
    gt = BodyParams.zeros(B).replace(
        body_pose=jnp.asarray(
            np.random.default_rng(1).normal(0, 0.1, (B, 63)), jnp.float32
        )
    )
    cam_t = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (B, 1)), jnp.float32)
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
        data_weight=jnp.full((B,), 2.0),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None]
            .repeat(B, 0)),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
              global_orient=jnp.zeros((B, 3)), body=jnp.zeros((B, 63)))
    segm, parents = synthetic_part_segm(int(model.faces.shape[0]), seed=1)
    collision_fn = make_collision_fn(
        model.faces, segm=segm, parents=parents, window=8, sigma=1e-3,
    )
    schedule = build_stage_schedule(
        [4.04e2, 4.78], coll_loss_weights=[0.0, 1.0],
        hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
    )
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=6, history=6, max_ls=8),
        camera_lbfgs=LBFGSConfig(max_iters=4, history=4, max_ls=8),
        # Exact per-eval broad phase: this test compares two schedules of
        # the SAME optimization, so the iter-hoisted pair refresh would add
        # an extra (legitimate) source of trajectory divergence.
        coll_broad_refresh="eval",
    )
    common = dict(
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), collision_fn=collision_fn,
    )
    res_full = fit_batch(model, settings, options, schedule, frames, x0,
                         lambda b: b, joint_map, **common)
    from smplifyx_tpu.models.sparse import build_joints_model
    res_masked = fit_batch(model, settings, options, schedule, frames, x0,
                           lambda b: b, joint_map,
                           joints_model=build_joints_model(model),
                           coll_stage_mask=(False, True), **common)
    # Stage 0's sparse energy computes identical values modulo fp
    # reassociation; after a handful of chaotic L-BFGS iterations the
    # trajectories diverge at the noise level, so compare loudly-divergent
    # outcomes only (order-of-magnitude agreement of the same minimum —
    # measured divergence ~0.15 rel, so 0.35 separates "same minimum"
    # from a genuinely wrong stage mask, which changes the loss by >>2x).
    np.testing.assert_allclose(
        np.asarray(res_masked.loss), np.asarray(res_full.loss), rtol=0.35
    )
    assert np.isfinite(np.asarray(res_masked.loss)).all()


def test_hoisted_refresh_cadence_matches_exact():
    """coll_broad_every > 1 (stale pair lists between refreshes) must land
    in the same basin as the exact per-eval broad phase: the apply-side
    AABB recheck plus confirm-on-refresh sealing bound the divergence."""
    B = 2
    model = synthetic_model(num_verts=96, seed=0)
    settings = FitSettings(interpenetration=True)
    joint_map = jnp.asarray(
        model_to_annotation("smplx", True, True, True, "coco25")
    )
    K = joint_map.shape[0]
    gt = BodyParams.zeros(B).replace(
        body_pose=jnp.asarray(
            np.random.default_rng(5).normal(0, 0.1, (B, 63)), jnp.float32
        )
    )
    cam_t = jnp.asarray(np.tile([[0.0, 0.0, 4.0]], (B, 1)), jnp.float32)
    out = smplx_forward(model, gt, joint_map=joint_map)
    cam = CameraParams(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)), translation=cam_t,
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
    )
    frames = FrameData(
        gt_joints=project_points(cam, out.joints),
        conf=jnp.ones((B, K)), joint_weights=jnp.ones((B, K)),
        focal=jnp.full((B, 2), 1000.0),
        center=jnp.broadcast_to(jnp.asarray([320.0, 240.0]), (B, 2)),
        data_weight=jnp.full((B,), 2.0),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None]
            .repeat(B, 0)),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
              global_orient=jnp.zeros((B, 3)), body=jnp.zeros((B, 63)))
    segm, parents = synthetic_part_segm(int(model.faces.shape[0]), seed=1)
    collision_fn = make_collision_fn(
        model.faces, segm=segm, parents=parents, sigma=1e-3,
    )
    schedule = build_stage_schedule(
        [4.04e2, 4.78], coll_loss_weights=[0.0, 1.0],
        hand_joints_weights=[0.0, 1.0], face_joints_weights=[0.0, 1.0],
    )
    common = dict(edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
                  collision_fn=collision_fn)

    def run(refresh, every):
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=8, history=6, max_ls=8,
                              aux_every=every),
            camera_lbfgs=LBFGSConfig(max_iters=6, history=4, max_ls=8),
            coll_broad_refresh=refresh,
        )
        return fit_batch(model, settings, options, schedule, frames, x0,
                         lambda b: b, joint_map, **common)

    exact = run("eval", 1)
    hoisted = run("iter", 1)
    coarse = run("iter", 4)
    for res in (hoisted, coarse):
        assert np.isfinite(np.asarray(res.loss)).all()
        # same basin: order-of-magnitude agreement with the exact path
        ratio = np.asarray(res.loss) / np.asarray(exact.loss)
        assert ((ratio > 0.2) & (ratio < 5.0)).all(), ratio
