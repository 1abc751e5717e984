"""Application driver: config -> dataset -> batched fit -> result files.

The counterpart of the reference's main.py:51-328 + the host-side parts of
fit_single_frame, re-architected around batching: instead of a serial
per-image loop re-creating cameras/optimizers per frame, ALL frames are
grouped (by gender), assembled into FrameData batches, and fitted by one
jit-compiled program per group; results are then written per frame.

Preserved reference behaviors (SURVEY.md §7 quirks list):
  * the output folder is wiped on start (main.py:54-55) and the resolved
    config is dumped to conf.yaml (:59-61);
  * only person 0 of each frame is fitted (:245-246);
  * per-image default focal length sqrt(W^2+H^2) (:212-214);
  * results are a per-frame pickle of every camera/model parameter plus a
    vertices PLY when save_vertices is set (fit_single_frame.py:641-677).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from smplifyx_tpu.utils.config import Config, save_config
from smplifyx_tpu.utils.timing import FitStats


@dataclass
class AppResult:
    names: list
    losses: np.ndarray
    result_files: list
    mesh_files: list
    elapsed_s: float
    frames_per_sec: float
    # aggregate work/quality stats (FitStats.summary()); None when no
    # frame was fitted
    stats: Optional[dict] = None


def run(cfg: Config, model=None, max_frames: Optional[int] = None) -> AppResult:
    """Fit every frame in cfg.data_folder and write results.

    `model` overrides body-model loading (e.g. a synthetic model when the
    licensed SMPL-X artifacts are unavailable); otherwise
    {model_folder}/smplx/SMPLX_{GENDER}.npz is loaded per gender.
    """
    import jax

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    import jax.numpy as jnp

    from smplifyx_tpu.data.keypoints import create_dataset
    from smplifyx_tpu.data.regressors import (
        build_regression_prior, load_expose, load_pare, load_pixie,
    )
    from smplifyx_tpu.fitting.pipeline import recover_outputs
    from smplifyx_tpu.fitting.prepare import prepare_batch
    from smplifyx_tpu.session import build_fit_session
    from smplifyx_tpu.utils.io import save_result_pickle, write_ply, write_obj
    from smplifyx_tpu.fitting.params import unpack

    t_start = time.time()

    # --- session: validation, models, priors, schedule, jitted program
    # (shared with the serving path; see smplifyx_tpu/session.py)
    sess = build_fit_session(cfg, model=model)
    settings = sess.settings
    vposer = sess.vposer
    gmm = sess.gmm
    decode_body = sess.decode_body
    get_model = sess.get_model

    # --- output dirs (wipe + conf dump, reference main.py:52-75)
    out = osp.expandvars(cfg.output_folder)
    if osp.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    save_config(cfg, osp.join(out, "conf.yaml"))
    result_dir = osp.join(out, cfg.result_folder)
    mesh_dir = osp.join(out, cfg.mesh_folder)
    os.makedirs(result_dir, exist_ok=True)
    os.makedirs(mesh_dir, exist_ok=True)

    # --- dataset
    dataset = create_dataset(
        format=cfg.format, data_folder=cfg.data_folder,
        img_folder=cfg.img_folder, keyp_folder=cfg.keyp_folder,
        use_hands=cfg.use_hands, use_face=cfg.use_face,
        use_face_contour=cfg.use_face_contour,
        joints_to_ign=cfg.joints_to_ign,
    )
    records = list(dataset)
    if max_frames:
        records = records[:max_frames]
    assert records, f"no frames found under {cfg.data_folder}"

    # --- gender grouping (annotation > classifier > cfg.gender default)
    from smplifyx_tpu.data.gender import group_by_gender, load_homogenus

    classifier = None
    if cfg.use_gender_classifier and cfg.homogeneous_ckpt:
        classifier = load_homogenus(cfg.homogeneous_ckpt)
    gender_groups = group_by_gender(
        records, default=cfg.gender, classifier=classifier
    )

    def load_regression(group_records):
        if not cfg.regression_prior:
            return None
        out = []
        for rec in group_records:
            H, W = rec.img_size
            focal = cfg.focal_length or float(np.sqrt(W * W + H * H))
            expose = pixie = pare = None
            if cfg.expose_results_directory:
                expose = load_expose(cfg.expose_results_directory, rec.fn)
            if cfg.pixie_results_directory:
                pixie = load_pixie(cfg.pixie_results_directory, rec.fn)
            if cfg.pare_results_directory:
                pare = load_pare(cfg.pare_results_directory, rec.fn)
            out.append(build_regression_prior(
                cfg.regression_prior, focal, expose=expose, pixie=pixie,
                pare=pare, use_camera_prior=cfg.use_camera_prior,
            ))
        return out

    # --- fit, one batch per gender group
    all_names, all_losses, result_files, mesh_files = [], [], [], []
    all_evals, all_flipped = [], []
    total_real = 0
    from smplifyx_tpu.fitting.prepare import pad_prepared
    from smplifyx_tpu.models.sparse import build_joints_model

    # ONE jitted pipeline shared by every gender group (sess.fit): the
    # model is an argument, so groups with equal (bucketed) batch sizes
    # reuse the same executable instead of paying a recompile per gender.
    for gender, group_records in sorted(gender_groups.items()):
        group_model = jax.device_put(get_model(gender))
        joints_model = jax.device_put(build_joints_model(group_model))

        batch = prepare_batch(
            cfg, group_records, dataset.get_joint_weights(),
            regression=load_regression(group_records),
            vposer=vposer, gmm=gmm,
            all_persons=cfg.fit_all_persons,
        )
        if cfg.resume_from:
            from smplifyx_tpu.fitting.checkpoint import warm_start_from_results

            x_prev, found = warm_start_from_results(
                osp.expandvars(cfg.resume_from), batch.names, settings,
                vposer=vposer,
            )
            x0_np = np.asarray(batch.x0).copy()
            x0_np[: len(found)][found] = x_prev[found]
            batch.x0 = x0_np

        # Bucket the batch to the next power of two (floor cfg.batch_size):
        # mixed-gender runs with uneven group sizes then share compiled
        # executables across buckets instead of recompiling per exact size.
        target = max(batch.num_real, cfg.batch_size, 1)
        bucket = 1 << (target - 1).bit_length()   # next power of two
        batch = pad_prepared(batch, bucket)

        res = sess.fit(group_model, joints_model, batch.frames,
                       jnp.asarray(batch.x0))
        out_fwd, params, cam_t = recover_outputs(
            group_model, settings, res.x, decode_body, joint_map=None
        )
        jax.block_until_ready(out_fwd.vertices)

        # --- write results per real frame
        losses = np.asarray(res.loss)[: batch.num_real]
        vertices = np.asarray(out_fwd.vertices)
        cam_t_np = np.asarray(cam_t)
        seg = unpack(settings, res.x)
        decoded_pose = np.asarray(decode_body(seg["body"]))
        faces_np = np.asarray(group_model.faces)

        viz_records = {}
        if cfg.visualize:
            # final-fit overlay renders (reference fit_single_frame.py:
            # 509-520, 614-626 via pyrender; here the pure-numpy
            # rasterizer in viz/render.py)
            os.makedirs(osp.join(out, "images"), exist_ok=True)
            viz_records = {rec.fn: rec for rec in group_records}

        for i, name in enumerate(batch.names):
            frame_result_dir = osp.join(result_dir, name)
            os.makedirs(frame_result_dir, exist_ok=True)
            H, W = batch.img_sizes[i]
            pkl_path = osp.join(frame_result_dir, "000.pkl")
            stage_dicts = None
            if res.stage_x is not None:
                # Per-stage snapshots ride the pickle so the WebGL viewer
                # can scrub the optimization (reference mesh_viewer live
                # updates, mesh_viewer.py:82-97).
                seg_s = unpack(settings, res.stage_x[:, i])
                dec_s = np.asarray(decode_body(seg_s["body"]))
                stage_dicts = [
                    {
                        "camera_translation": np.asarray(seg_s["cam_t"][s]),
                        "global_orient": np.asarray(
                            seg_s["global_orient"][s]),
                        "body_pose": dec_s[s],
                        "betas": np.asarray(seg_s["betas"][s]),
                        "expression": np.asarray(seg_s["expression"][s]),
                        "jaw_pose": np.asarray(seg_s["jaw"][s]),
                        "leye_pose": np.asarray(seg_s["leye"][s]),
                        "reye_pose": np.asarray(seg_s["reye"][s]),
                        "left_hand_pose": np.asarray(seg_s["lhand"][s]),
                        "right_hand_pose": np.asarray(seg_s["rhand"][s]),
                    }
                    for s in range(res.stage_x.shape[0])
                ]
            save_result_pickle(
                pkl_path,
                camera_translation=cam_t_np[i],
                camera_center=np.asarray(batch.frames.center[i]),
                focal_length=batch.focals[i],
                H=H, W=W,
                params={
                    "global_orient": np.asarray(seg["global_orient"][i]),
                    "betas": np.asarray(seg["betas"][i]),
                    "expression": np.asarray(seg["expression"][i]),
                    "jaw_pose": np.asarray(seg["jaw"][i]),
                    "leye_pose": np.asarray(seg["leye"][i]),
                    "reye_pose": np.asarray(seg["reye"][i]),
                    "left_hand_pose": np.asarray(seg["lhand"][i]),
                    "right_hand_pose": np.asarray(seg["rhand"][i]),
                },
                body_pose=decoded_pose[i],
                loss=float(losses[i]),
                stages=stage_dicts,
            )
            result_files.append(pkl_path)

            frame_mesh_dir = osp.join(mesh_dir, name)
            os.makedirs(frame_mesh_dir, exist_ok=True)
            if cfg.save_meshes:
                obj_path = osp.join(frame_mesh_dir, "000.obj")
                write_obj(obj_path, vertices[i], faces_np)
                mesh_files.append(obj_path)
            if cfg.save_vertices:
                write_ply(
                    osp.join(frame_result_dir, "vertices.ply"), vertices[i]
                )
            if cfg.visualize:
                from smplifyx_tpu.data.keypoints import load_image
                from smplifyx_tpu.ops.camera import CameraParams
                from smplifyx_tpu.viz.render import render_mesh_overlay

                rec = viz_records.get(name.split("/")[0])
                img = None
                if rec is not None:
                    img = rec.img if rec.img is not None else load_image(
                        rec.img_path
                    )
                camera = CameraParams(
                    rotation=np.eye(3, dtype=np.float32),
                    translation=cam_t_np[i],
                    focal=np.full(2, batch.focals[i], np.float32),
                    center=np.asarray(batch.frames.center[i]),
                )
                overlay = render_mesh_overlay(
                    img, vertices[i], faces_np, camera, img_size=(H, W)
                )
                img_dir = osp.join(out, "images", name)
                os.makedirs(img_dir, exist_ok=True)
                from PIL import Image

                Image.fromarray(overlay).save(
                    osp.join(img_dir, "output.png")
                )
                # per-stage overlays (reference fit_single_frame.py:509-520
                # renders the mesh after every stage)
                if res.stage_x is not None:
                    for s in range(res.stage_x.shape[0]):
                        s_out, _, s_cam_t = recover_outputs(
                            group_model, settings, res.stage_x[s, i : i + 1],
                            decode_body, joint_map=None,
                        )
                        s_camera = camera._replace(
                            translation=np.asarray(s_cam_t[0])
                        )
                        s_overlay = render_mesh_overlay(
                            img, np.asarray(s_out.vertices[0]), faces_np,
                            s_camera, img_size=(H, W),
                        )
                        Image.fromarray(s_overlay).save(
                            osp.join(img_dir, f"stage_{s:02d}.png")
                        )
                # VPoser pose grid (reference fit_single_frame.py:263-271
                # renders the decoded latent pose via render_smpl_params
                # when visualizing a vposer fit)
                if vposer is not None:
                    from smplifyx_tpu.fitting.params import unpack
                    from smplifyx_tpu.viz.pose_grid import render_pose_grid

                    seg_i = unpack(settings, res.x[i : i + 1])
                    pose_i = np.asarray(decode_body(seg_i["body"]))
                    pg = render_pose_grid(group_model, pose_i, tile=256)
                    Image.fromarray(pg).save(
                        osp.join(img_dir, "pose_grid.png")
                    )
        all_names.extend(batch.names)
        all_losses.append(losses)
        all_evals.append(np.asarray(res.stage_evals)[:, : batch.num_real])
        all_flipped.append(np.asarray(res.flipped)[: batch.num_real])
        total_real += batch.num_real

    elapsed = time.time() - t_start
    losses_np = np.concatenate(all_losses)
    stats = None
    if all_evals and all(e.shape[0] == all_evals[0].shape[0]
                         for e in all_evals):
        stats = FitStats(
            losses=losses_np,
            flipped=np.concatenate(all_flipped),
            stage_evals=np.concatenate(all_evals, axis=1),
        ).summary()
    if cfg.interactive:
        evals_txt = (
            f", evals/stage: {[round(m, 1) for m in stats['stage_evals_mean']]}"
            if stats else ""
        )
        print(
            f"fitted {total_real} frame(s) in {elapsed:.2f}s "
            f"({total_real / elapsed:.2f} frames/s), "
            f"losses: {np.round(losses_np, 2).tolist()}" + evals_txt
        )
    return AppResult(
        names=all_names, losses=losses_np,
        result_files=result_files, mesh_files=mesh_files,
        elapsed_s=elapsed, frames_per_sec=total_real / elapsed,
        stats=stats,
    )
