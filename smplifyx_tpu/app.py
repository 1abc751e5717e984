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


@dataclass
class AppResult:
    names: list
    losses: np.ndarray
    result_files: list
    mesh_files: list
    elapsed_s: float
    frames_per_sec: float


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
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch, recover_outputs
    from smplifyx_tpu.fitting.prepare import prepare_batch, settings_from_config
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.bodymodel import load_body_model
    from smplifyx_tpu.models.joint_mapping import (
        model_to_annotation, SHOULDER_IDXS_BY_FORMAT,
    )
    from smplifyx_tpu.ops.collision import load_part_segm, make_collision_fn
    from smplifyx_tpu.priors.priors import load_gmm_pickle
    from smplifyx_tpu.utils.io import save_result_pickle, write_ply, write_obj
    from smplifyx_tpu.fitting.params import unpack

    t_start = time.time()

    # --- config validation of knobs that gate unsupported paths
    if cfg.float_dtype != "float32":
        # The reference's float64 selector is dead, buggy code
        # (main.py:77-84 maps float32 -> float64 and is overridden at
        # :99-105); this framework is f32-only by design (TPU MXU/bf16).
        raise NotImplementedError(
            f"float_dtype={cfg.float_dtype!r}: only float32 is supported"
        )
    if cfg.camera_type != "persp":
        raise NotImplementedError(
            f"camera_type={cfg.camera_type!r}: only 'persp' is supported "
            "(matching reference create_camera, camera.py:35-40)"
        )

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

    # --- model loading, one per gender present in the data
    settings = settings_from_config(cfg)

    def get_model(gender: str):
        if model is not None:
            return model  # explicit override (tests / synthetic runs)
        if cfg.synthetic_model:
            from smplifyx_tpu.models.bodymodel import synthetic_model

            return synthetic_model(
                num_verts=cfg.synthetic_num_verts,
                num_betas=cfg.num_betas,
                num_expression_coeffs=cfg.num_expression_coeffs,
                num_pca_comps=cfg.num_pca_comps,
                model_type=cfg.model_type,
            )
        # {model_folder}/{family}/{FAMILY}_{GENDER}.{npz|pkl}, the layout
        # smplx.create resolves in the reference (main.py:109-127).
        stem = osp.join(
            cfg.model_folder, cfg.model_type,
            f"{cfg.model_type.upper()}_{gender.upper()}",
        )
        path = next(
            (p for p in (stem + ".npz", stem + ".pkl") if osp.exists(p)),
            stem + ".npz",
        )
        return load_body_model(
            path, cfg.model_type, num_betas=cfg.num_betas,
            num_expression_coeffs=cfg.num_expression_coeffs,
            num_pca_comps=cfg.num_pca_comps,
        )

    joint_map = jnp.asarray(model_to_annotation(
        cfg.model_type, cfg.use_hands, cfg.use_face, cfg.use_face_contour,
        cfg.format,
    ))

    # --- priors
    gmm = None
    if cfg.body_prior_type == "gmm":
        gmm = load_gmm_pickle(
            osp.join(cfg.prior_folder, f"gmm_{cfg.num_gaussians:02d}.pkl")
        )
    # Hand GMM priors over the PCA coefficients: the reference keys their
    # mixture size to num_pca_comps (main.py:148-164, gmm_{num_pca:02d}.pkl).
    from smplifyx_tpu.fitting.prepare import _norm_prior

    def _hand_gmm(prior_type):
        if _norm_prior(prior_type) != "gmm":
            return None
        path = osp.join(cfg.prior_folder, f"gmm_{cfg.num_pca_comps:02d}.pkl")
        prior = load_gmm_pickle(path)
        dim = prior.means.shape[-1]
        if dim != cfg.num_pca_comps:
            # The shipped reference priors are BODY-pose GMMs keyed by
            # num_gaussians (gmm_08.pkl = 8 components over 69 dims); a
            # num_pca_comps filename collision (e.g. 8) would otherwise
            # trace a 69-dim mixture against 12-dim hand coefficients and
            # die with an opaque shape error mid-jit.
            raise ValueError(
                f"hand GMM prior {path} models {dim}-dim poses but "
                f"num_pca_comps={cfg.num_pca_comps}; no compatible public "
                "artifact ships with the reference — use an 'l2' hand "
                "prior or provide a hand-PCA GMM with matching dimension"
            )
        return prior

    lhand_gmm = _hand_gmm(cfg.left_hand_prior_type)
    rhand_gmm = _hand_gmm(cfg.right_hand_prior_type)
    vposer = None
    decode_body = lambda b: b
    if cfg.use_vposer:
        if str(cfg.vposer_ckpt).lower() in ("", "synthetic"):
            # Licensed-artifact escape hatch, like synthetic_model: random
            # decoder weights exercise the full latent-optimization path.
            from smplifyx_tpu.models.vposer import VPoser, random_params

            vposer = VPoser(random_params(0))
        else:
            from smplifyx_tpu.models.vposer import load_vposer

            vposer = load_vposer(cfg.vposer_ckpt)
        decode_body = vposer.decode

    segm = parents = None
    if cfg.interpenetration and cfg.part_segm_fn:
        segm, parents = load_part_segm(osp.expandvars(cfg.part_segm_fn))

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

    schedule = build_stage_schedule(
        cfg.body_pose_prior_weights, cfg.shape_weights, cfg.expr_weights,
        cfg.hand_pose_prior_weights, cfg.jaw_pose_prior_weights,
        cfg.hand_joints_weights, cfg.face_joints_weights,
        cfg.coll_loss_weights,
    )
    ls, rs = SHOULDER_IDXS_BY_FORMAT[cfg.format.lower()]
    # Reference budget: maxiters outer x maxiters inner with ftol/gtol early
    # exit; one flat budget here (overridable via lbfgs_iters_per_stage).
    lbfgs_iters = cfg.lbfgs_iters_per_stage or cfg.maxiters * 5
    options = FitOptions(
        lbfgs=LBFGSConfig(
            max_iters=lbfgs_iters, history=cfg.history_size,
            max_ls=cfg.max_line_search, lr=cfg.lr,
            ftol=cfg.ftol, gtol=cfg.gtol,
            aux_every=cfg.coll_broad_every,
        ),
        camera_lbfgs=LBFGSConfig(
            max_iters=cfg.maxiters * 2, history=8, lr=cfg.lr,
            ftol=cfg.ftol, gtol=cfg.gtol,
        ),
        optim_type=cfg.optim_type,
        try_both_orient=True,
        side_view_thsh=cfg.side_view_thsh,
        left_shoulder_idx=ls, right_shoulder_idx=rs,
        use_camera_prior=cfg.use_camera_prior and bool(cfg.regression_prior),
    )
    edge_idxs = jnp.asarray(cfg.body_tri_pairs)

    # --- fit, one batch per gender group
    all_names, all_losses, result_files, mesh_files = [], [], [], []
    total_real = 0
    from smplifyx_tpu.fitting.prepare import pad_prepared
    from smplifyx_tpu.models.sparse import build_joints_model

    coll_stage_mask = None
    if cfg.interpenetration:
        weights = cfg.coll_loss_weights or [0.0] * cfg.num_stages
        coll_stage_mask = tuple(float(v) > 0 for v in weights)

    # ONE jitted pipeline shared by every gender group: the model is an
    # argument, so groups with equal (bucketed) batch sizes reuse the same
    # executable instead of paying a recompile per gender.  The collision
    # tables are built from the first group's faces — the gendered SMPL-X
    # models share mesh topology, which this relies on.
    collision_fn = None
    fitted = None

    def make_fitted(first_model):
        nonlocal collision_fn
        if cfg.interpenetration:
            # window/max_pairs are oracle-calibrated (test_collision_oracle);
            # the narrow-phase budget honors at least the reference's
            # max_collisions (fit_single_frame.py:300-328, default 128).
            collision_fn = make_collision_fn(
                first_model.faces, segm=segm, parents=parents,
                ign_part_pairs=cfg.ign_part_pairs,
                window=cfg.collision_window,
                max_pairs=max(cfg.max_coll_pairs, cfg.max_collisions),
                sigma=cfg.df_cone_height,
                penalize_outside=cfg.penalize_outside,
                point2plane=cfg.point2plane,
            )
        return jax.jit(
            lambda model, joints_model, frames, x0: fit_batch(
                model, settings, options, schedule, frames, x0,
                decode_body, joint_map, gmm=gmm, edge_idxs=edge_idxs,
                collision_fn=collision_fn, joints_model=joints_model,
                coll_stage_mask=coll_stage_mask,
                lhand_gmm=lhand_gmm, rhand_gmm=rhand_gmm,
            )
        )

    for gender, group_records in sorted(gender_groups.items()):
        group_model = jax.device_put(get_model(gender))
        joints_model = jax.device_put(build_joints_model(group_model))
        if fitted is None:
            fitted = make_fitted(group_model)

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

        res = fitted(group_model, joints_model, batch.frames,
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
        all_names.extend(batch.names)
        all_losses.append(losses)
        total_real += batch.num_real

    elapsed = time.time() - t_start
    losses_np = np.concatenate(all_losses)
    if cfg.interactive:
        print(
            f"fitted {total_real} frame(s) in {elapsed:.2f}s "
            f"({total_real / elapsed:.2f} frames/s), "
            f"losses: {np.round(losses_np, 2).tolist()}"
        )
    return AppResult(
        names=all_names, losses=losses_np,
        result_files=result_files, mesh_files=mesh_files,
        elapsed_s=elapsed, frames_per_sec=total_real / elapsed,
    )
