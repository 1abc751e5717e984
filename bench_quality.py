"""Quality benchmark: fitting accuracy against synthetic ground truth.

Prints one JSON line with Procrustes-aligned V2V error (mm) and 2D
reprojection error (px) of batched fits against known ground-truth bodies,
under a regression-prior-like init (GT pose + noise at published regressor
error levels, ~0.1 rad/joint — the production configs initialize from
ExPose/PIXIE the same way).

This is the artifact-free stand-in for the cropped-EHF protocol (the real
EHF evaluation needs licensed meshes; evaluation/ehf.py implements it).

Uses the SMOOTH identifiable synthetic model (smooth_synthetic_model:
capsule body, affine blendshapes — shape is exactly determined by the
observed joints).  The residual V2V floor is monocular pose-shape
ambiguity under the production priors, the same ambiguity that puts the
reference at ~33 mm PA-V2V on real EHF; the reprojection error is the
directly-optimized quantity and sits at ~2 px.  (The legacy white-noise
model's floor was ~71 mm because off-keypoint vertices were unobservable.)
Run:  python bench_quality.py [B] [wolfe|armijo] [cpu|tpu]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _git_sha() -> str:
    import os.path as osp
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", osp.dirname(osp.abspath(__file__)), "rev-parse",
             "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main(B: int = 64, ls_mode: str = "wolfe", platform: str | None = None,
         out_path: str | None = None, max_evals: int = 0,
         max_iters: int = 30):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import bench
    from smplifyx_tpu.evaluation.metrics import procrustes_v2v
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.params import pack, unpack
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch, recover_outputs
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.forward import BodyParams, smplx_forward
    from smplifyx_tpu.models.sparse import build_joints_model

    model, settings, frames, x0, joint_map = bench.build_problem(
        B, smooth=True
    )
    joints_model = build_joints_model(model)

    # Ground truth used by build_problem (same seeds).
    rng = np.random.default_rng(0)
    gt = BodyParams.zeros(B).replace(
        body_pose=jnp.asarray(rng.normal(0, 0.12, (B, 63)), jnp.float32),
        betas=jnp.asarray(rng.normal(0, 0.5, (B, 10)), jnp.float32),
        global_orient=jnp.asarray(rng.normal(0, 0.1, (B, 3)), jnp.float32),
    )
    gt_out = smplx_forward(model, gt)

    # Regression-like init: GT pose + 0.1 rad noise, unknown shape/camera.
    rng2 = np.random.default_rng(42)
    seg = unpack(settings, x0)
    seg["global_orient"] = gt.global_orient + jnp.asarray(
        rng2.normal(0, 0.05, (B, 3)), jnp.float32
    )
    seg["body"] = gt.body_pose + jnp.asarray(
        rng2.normal(0, 0.1, (B, 63)), jnp.float32
    )
    x0 = pack(settings, **seg)

    schedule = build_stage_schedule(
        body_pose_prior_weights=[4.04e2, 57.4, 4.78],
        shape_weights=[1e2, 1e1, 0.5e1], expr_weights=[1e2, 1e1, 0.5e1],
        hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0],
    )
    options = FitOptions(
        # ls_mode/max_evals apply to the body stages only — the camera
        # stage stays on strong Wolfe, matching bench.py's flagship
        # configuration.  max_iters must mirror the benched budget: Armijo
        # steps are cheaper but lower-quality per iteration (no curvature
        # condition feeding the L-BFGS history), so judging it at a
        # truncated iteration budget understates the converged quality —
        # measured 42.7 mm V2V at 30 iters vs in-gate at the flagship's 60.
        lbfgs=LBFGSConfig(max_iters=max_iters, history=10, ftol=1e-9,
                          gtol=1e-9, ls_soft_accept=6, ls_mode=ls_mode,
                          max_evals=max_evals,
                          # Mirror the production fast profile's Armijo
                          # trial cap (Config.resolved_max_line_search);
                          # Wolfe keeps the reference's 25.
                          max_ls=4 if ls_mode == "armijo" else 25),
        camera_lbfgs=LBFGSConfig(max_iters=max(15, max_iters // 2),
                                 history=8, ls_soft_accept=6),
    )
    fit = jax.jit(
        lambda m, jm, f, x: fit_batch(
            m, settings, options, schedule, f, x, lambda b: b, joint_map,
            edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        )
    )
    model_d = jax.device_put(model)
    jm_d = jax.device_put(joints_model)

    t0 = time.time()
    res = fit(model_d, jm_d, frames, x0)
    out, params, cam_t = recover_outputs(model_d, settings, res.x,
                                         lambda b: b)
    jax.block_until_ready(out.vertices)

    v2v = np.asarray(procrustes_v2v(out.vertices, gt_out.vertices))
    per_frame_mm = 1000.0 * v2v.mean(axis=-1)

    # --- per-part PA-V2V + PA-MPJPE-14, mirroring the reference's cropped-
    # EHF report columns (eval.py:140-146: Body/Face/Hands + PA-MPJPE-14,
    # each part Procrustes-aligned on its own subset — the same semantics
    # as evaluation/ehf.evaluate_frame).  The licensed MANO/FLAME/BODY
    # vertex-id artifacts are absent here; on the smooth synthetic model
    # every vertex samples a capsule around a bone, so the dominant LBS
    # weight assigns it a joint and the joint assigns it the part the real
    # artifacts would (hands = wrist+finger joints, face = neck/head/jaw/
    # eye joints).
    dom_joint = np.argmax(np.asarray(model.lbs_weights), axis=1)  # [V]
    lhand_ids = np.where(np.isin(dom_joint, [20, *range(25, 40)]))[0]
    rhand_ids = np.where(np.isin(dom_joint, [21, *range(40, 55)]))[0]
    face_ids = np.where(np.isin(dom_joint, [12, 15, 22, 23, 24]))[0]
    body_ids = np.setdiff1d(
        np.arange(dom_joint.shape[0]),
        np.concatenate([lhand_ids, rhand_ids, face_ids]))

    def part_mm(ids):
        e = np.asarray(procrustes_v2v(out.vertices[:, ids],
                                      gt_out.vertices[:, ids]))
        return 1000.0 * e.mean(axis=-1)          # [B]

    body_mm = part_mm(body_ids)
    face_mm = part_mm(face_ids)
    hands_mm = 0.5 * (part_mm(lhand_ids) + part_mm(rhand_ids))

    # LSP-14 stand-in for the J14 regressor: the corresponding SMPL-X
    # skeleton joints (ankles/knees/hips/wrists/elbows/shoulders/neck/head),
    # evaluated identically on fit and GT forwards.
    J14 = np.array([8, 5, 2, 1, 4, 7, 21, 19, 17, 16, 18, 20, 12, 15])
    fit_j = smplx_forward(model_d, params).joints[:, J14]
    gt_j = smplx_forward(model_d, gt).joints[:, J14]
    pa_mpjpe14 = 1000.0 * np.asarray(
        procrustes_v2v(fit_j, gt_j)).mean(axis=-1)  # [B]

    # 2D reprojection of the fitted params against the target keypoints.
    from smplifyx_tpu.ops.camera import CameraParams, project_points

    fit_out = smplx_forward(model_d, params, joint_map=joint_map)
    cam = CameraParams(
        rotation=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        translation=cam_t, focal=frames.focal, center=frames.center,
    )
    proj = project_points(cam, fit_out.joints)
    reproj_px = np.asarray(
        jnp.sqrt(jnp.sum((proj - frames.gt_joints) ** 2, -1))
    ).mean(-1)

    record = {
        "metric": "synthetic_gt_pa_v2v_mm",
        "value": round(float(per_frame_mm.mean()), 3),
        "unit": "mm",
        "ls_mode": ls_mode,
        "max_evals": max_evals,
        "max_iters": max_iters,
        "platform": jax.devices()[0].platform,
        "git": _git_sha(),
        "p90_mm": round(float(np.percentile(per_frame_mm, 90)), 3),
        "max_mm": round(float(per_frame_mm.max()), 3),
        "body_mm": round(float(body_mm.mean()), 3),
        "face_mm": round(float(face_mm.mean()), 3),
        "hands_mm": round(float(hands_mm.mean()), 3),
        "pa_mpjpe14_mm": round(float(pa_mpjpe14.mean()), 3),
        "reproj_px_mean": round(float(reproj_px.mean()), 3),
        "reproj_px_max": round(float(reproj_px.max()), 3),
        "stage_evals_mean": [round(float(m), 1)
                             for m in np.asarray(res.stage_evals).mean(1)],
        "num_frames": B,
        "num_verts": int(model.v_template.shape[0]),
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(record))
    if out_path:
        # Per-round committed artifact (QUALITY_r0N.json):
        # tests/test_quality_artifact.py asserts the calibrated thresholds
        # on the latest one, so a TPU-numerics quality regression between
        # rounds fails the suite instead of passing silently.
        with open(out_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(B=int(a[0]) if a else 64,
         ls_mode=a[1] if len(a) > 1 else "wolfe",
         platform=a[2] if len(a) > 2 else None,
         out_path=a[3] if len(a) > 3 else None,
         max_evals=int(a[4]) if len(a) > 4 else 0,
         max_iters=int(a[5]) if len(a) > 5 else 30)
