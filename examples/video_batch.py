"""Batched video-sequence fitting demo (the EgoBody-style scenario).

Synthesizes an animated pose sequence, renders its 2D keypoint tracks, and
fits ALL frames simultaneously as one batch with the interpenetration term
enabled — the configuration the reference fundamentally cannot express
(its batch size is asserted to 1, fit_single_frame.py:119).

Run:  python examples/video_batch.py [num_frames] [cpu|tpu]
(the second arg forces a JAX platform — use `cpu` on machines whose
default backend is a remote accelerator)
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main(num_frames: int = 32, platform: str | None = None):
    if platform:
        jax.config.update("jax_platforms", platform)
    from smplifyx_tpu.fitting.energy import FrameData
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.params import FitSettings, pack
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch, recover_outputs
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.bodymodel import synthetic_model
    from smplifyx_tpu.models.forward import BodyParams, smplx_forward
    from smplifyx_tpu.models.joint_mapping import model_to_annotation
    from smplifyx_tpu.models.sparse import build_joints_model
    from smplifyx_tpu.ops.camera import CameraParams, project_points
    from smplifyx_tpu.ops.collision import make_collision_fn, synthetic_part_segm
    from smplifyx_tpu.evaluation.metrics import procrustes_v2v

    B = num_frames
    model = synthetic_model(num_verts=1024, seed=0)
    joints_model = build_joints_model(model)
    settings = FitSettings(interpenetration=True)
    joint_map = jnp.asarray(model_to_annotation("smplx", True, True, True,
                                                "coco25"))
    K = joint_map.shape[0]

    # --- animate: smooth sinusoidal pose trajectory
    t = np.linspace(0, 2 * np.pi, B, dtype=np.float32)[:, None]
    freq = np.random.default_rng(0).uniform(0.5, 2.0, (1, 63)).astype(np.float32)
    phase = np.random.default_rng(1).uniform(0, np.pi, (1, 63)).astype(np.float32)
    poses = 0.15 * np.sin(freq * t + phase)
    gt = BodyParams.zeros(B).replace(body_pose=jnp.asarray(poses))
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
        data_weight=jnp.full((B,), 1000.0 / 480),
        init_joints_mask=jnp.asarray(
            np.isin(np.arange(K), [9, 12, 2, 5]).astype(np.float32)[None]
            .repeat(B, 0)),
        trans_estimation=jnp.zeros((B, 3)),
        depth_loss_weight=jnp.full((B,), 1e2),
        regression_body=jnp.zeros((B, 63)),
    )
    x0 = pack(settings, cam_t=jnp.zeros((B, 3)),
              global_orient=jnp.zeros((B, 3)), body=jnp.zeros((B, 63)))

    segm, parents = synthetic_part_segm(int(model.faces.shape[0]), seed=2)
    collision_fn = make_collision_fn(
        model.faces, segm=segm, parents=parents,
        ign_part_pairs=["9,16", "9,17"], window=16, sigma=1e-3,
    )
    schedule = build_stage_schedule(
        [4.04e2, 57.4, 4.78],
        coll_loss_weights=[0.0, 0.1, 1.0],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0],
    )
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=40, history=12, ls_soft_accept=6),
        camera_lbfgs=LBFGSConfig(max_iters=20, history=8, ls_soft_accept=6),
    )

    import time
    fit = jax.jit(lambda m, jm2, f, x: fit_batch(
        m, settings, options, schedule, f, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
        collision_fn=collision_fn, joints_model=jm2,
    ))
    model_d = jax.device_put(model)
    jm_d = jax.device_put(joints_model)
    res = fit(model_d, jm_d, frames, x0)
    jax.block_until_ready(res.loss)
    t0 = time.perf_counter()
    res = fit(model_d, jm_d, frames, x0)
    jax.block_until_ready(res.loss)
    dt = time.perf_counter() - t0

    out_fit, _, _ = recover_outputs(model_d, settings, res.x, lambda b: b)
    v2v = np.asarray(procrustes_v2v(out_fit.vertices, out.vertices))
    print(f"fitted {B}-frame sequence in {dt:.2f}s ({B/dt:.1f} frames/s)")
    print(f"PA-V2V vs ground truth: mean {1000*v2v.mean():.1f} mm, "
          f"per-frame max {1000*v2v.mean(-1).max():.1f} mm")
    print(f"losses finite: {np.isfinite(np.asarray(res.loss)).all()}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32,
         sys.argv[2] if len(sys.argv) > 2 else None)
