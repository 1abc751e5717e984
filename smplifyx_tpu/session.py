"""Reusable fit session: config -> models, priors, schedule, jitted program.

Extracted from the app driver so batch CLI runs (`app.run`) and persistent
serving (`smplifyx_tpu.serve`) share ONE setup path: body-model resolution
per gender, priors (GMM/VPoser/hand GMMs), the stage schedule, optimizer
options, the collision term, and the single jit-compiled fit program
(model passed as an argument so gender groups and repeated service calls
share the executable; reference counterpart: main.py:51-328 setup).
"""

from __future__ import annotations

import os.path as osp
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from smplifyx_tpu.utils.config import Config


@dataclass
class FitSession:
    """Everything needed to fit prepared batches under one compiled program.

    Build with `build_fit_session`.  `fit(...)` lazily compiles the shared
    pipeline on first use (collision tables come from the first model's
    faces — gendered SMPL-X models share mesh topology, which this relies
    on, exactly like the app driver did).
    """

    cfg: Config
    settings: object
    options: object
    schedule: object
    joint_map: object
    edge_idxs: object
    decode_body: Callable
    vposer: object
    gmm: object
    lhand_gmm: object
    rhand_gmm: object
    segm: Optional[np.ndarray]
    parents: Optional[np.ndarray]
    coll_stage_mask: Optional[tuple]
    get_model: Callable[[str], object]
    collision_fn: object = None
    _fitted: Optional[Callable] = field(default=None, repr=False)
    _staged: dict = field(default_factory=dict, repr=False)

    def fitted(self, first_model):
        """The shared jitted fit program (compiled once per batch shape)."""
        if self._fitted is None:
            self._fitted = self._make_fitted(first_model)
        return self._fitted

    def _make_fitted(self, first_model):
        import jax

        from smplifyx_tpu.fitting.pipeline import fit_batch
        from smplifyx_tpu.ops.collision import make_collision_fn

        cfg = self.cfg
        if cfg.interpenetration:
            # window/max_pairs are oracle-calibrated (test_collision_oracle);
            # the narrow-phase budget honors at least the reference's
            # max_collisions (fit_single_frame.py:300-328, default 128).
            self.collision_fn = make_collision_fn(
                first_model.faces, segm=self.segm, parents=self.parents,
                ign_part_pairs=cfg.ign_part_pairs,
                window=cfg.collision_window,
                max_pairs=max(cfg.max_coll_pairs, cfg.max_collisions),
                sigma=cfg.df_cone_height,
                penalize_outside=cfg.penalize_outside,
                point2plane=cfg.point2plane,
            )
        return jax.jit(
            lambda model, joints_model, frames, x0: fit_batch(
                model, self.settings, self.options, self.schedule, frames,
                x0, self.decode_body, self.joint_map, gmm=self.gmm,
                edge_idxs=self.edge_idxs, collision_fn=self.collision_fn,
                joints_model=joints_model,
                coll_stage_mask=self.coll_stage_mask,
                lhand_gmm=self.lhand_gmm, rhand_gmm=self.rhand_gmm,
            )
        )

    def fit(self, model, joints_model, frames, x0):
        """Run the staged fit on a prepared (bucketed) batch."""
        return self.fitted(model)(model, joints_model, frames, x0)

    def fit_stages(self, model, joints_model, frames, x0):
        """Split-dispatch fit: yields (stage_idx, FitResult) after the HEAD
        dispatch (camera init + stage 0) and after every further body stage.

        Each yield is a synchronized device round-trip, so callers can
        stream intermediate meshes while the fit runs — the TPU counterpart
        of the reference's live MeshViewer updating during optimization
        (mesh_viewer.py:82-97); viz/viewer.py --live renders the stream.
        Also the path for splitting one long fit into several dispatches
        that each stay under a remote-execution RPC deadline.

        Semantics vs the monolithic fit(): identical staging, except the
        dual-orientation selection (try_both_orient) resolves after the
        HEAD dispatch instead of after the last stage — body stages then
        refine the winning orientation only.  Stages sharing a collision
        flag share ONE compiled executable (weights are a traced argument).
        """
        import jax
        import jax.tree_util as jtu

        from smplifyx_tpu.fitting.pipeline import fit_batch

        if self.cfg.interpenetration and self.collision_fn is None:
            self.fitted(model)  # builds collision tables as a side effect
        schedule = self.schedule
        num_stages = jtu.tree_leaves(schedule)[0].shape[0]
        if self.coll_stage_mask is not None:
            mask = tuple(self.coll_stage_mask)
        else:
            on = bool(self.settings.interpenetration
                      and self.collision_fn is not None)
            mask = (on,) * num_stages

        def program(kind, coll):
            key = (kind, coll)
            if key not in self._staged:
                if kind == "head":
                    opts = self.options
                else:
                    opts = self.options.replace(camera_stage=False,
                                                try_both_orient=False)
                self._staged[key] = jax.jit(
                    lambda m, jm, fr, x, w, o=opts, c=coll: fit_batch(
                        m, self.settings, o, w, fr, x, self.decode_body,
                        self.joint_map, gmm=self.gmm,
                        edge_idxs=self.edge_idxs,
                        collision_fn=self.collision_fn,
                        joints_model=jm, coll_stage_mask=(c,),
                        lhand_gmm=self.lhand_gmm, rhand_gmm=self.rhand_gmm,
                    )
                )
            return self._staged[key]

        def stage_w(k):
            return jtu.tree_map(lambda a: a[k:k + 1], schedule)

        res = program("head", mask[0])(
            model, joints_model, frames, x0, stage_w(0))
        jax.block_until_ready(res.loss)
        yield 0, res
        for k in range(1, num_stages):
            res = program("stage", mask[k])(
                model, joints_model, frames, res.x, stage_w(k))
            jax.block_until_ready(res.loss)
            yield k, res

    def joint_weights(self) -> np.ndarray:
        """Base per-keypoint weights for this config's format/flags —
        the dataset-free equivalent of dataset.get_joint_weights()."""
        from smplifyx_tpu.data.keypoints import NUM_BODY_JOINTS_BY_FORMAT

        cfg = self.cfg
        n = NUM_BODY_JOINTS_BY_FORMAT[cfg.format.lower()]
        if cfg.use_hands:
            n += 42
        if cfg.use_face:
            n += 51 + 17 * bool(cfg.use_face_contour)
        w = np.ones(n, np.float32)
        if cfg.joints_to_ign and -1 not in cfg.joints_to_ign:
            w[np.asarray(cfg.joints_to_ign)] = 0.0
        return w


def build_fit_session(cfg: Config, model=None) -> FitSession:
    """Validate the config and assemble a FitSession (no dataset IO)."""
    import jax

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    import jax.numpy as jnp

    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.pipeline import FitOptions
    from smplifyx_tpu.fitting.prepare import _norm_prior, settings_from_config
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.bodymodel import load_body_model
    from smplifyx_tpu.models.joint_mapping import (
        SHOULDER_IDXS_BY_FORMAT, model_to_annotation,
    )
    from smplifyx_tpu.ops.collision import load_part_segm
    from smplifyx_tpu.priors.priors import load_gmm_pickle

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

    coll_stage_mask = None
    if cfg.interpenetration:
        weights = cfg.coll_loss_weights or [0.0] * cfg.num_stages
        coll_stage_mask = tuple(float(v) > 0 for v in weights)

    schedule = build_stage_schedule(
        cfg.body_pose_prior_weights, cfg.shape_weights, cfg.expr_weights,
        cfg.hand_pose_prior_weights, cfg.jaw_pose_prior_weights,
        cfg.hand_joints_weights, cfg.face_joints_weights,
        cfg.coll_loss_weights,
    )
    ls, rs = SHOULDER_IDXS_BY_FORMAT[cfg.format.lower()]
    # Line-search knobs come from cfg.profile (fast: Armijo value-only
    # trials + eval cap + soft accept — the A/B-proven throughput config;
    # reference: strong Wolfe, unlimited) unless set explicitly.
    soft = cfg.resolved_ls_soft_accept
    soft_kw = {} if soft is None else {"ls_soft_accept": soft}
    options = FitOptions(
        lbfgs=LBFGSConfig(
            max_iters=cfg.resolved_lbfgs_iters, history=cfg.history_size,
            max_ls=cfg.resolved_max_line_search, lr=cfg.lr,
            ftol=cfg.ftol, gtol=cfg.gtol,
            aux_every=cfg.resolved_coll_broad_every,
            ls_mode=cfg.resolved_ls_mode,
            max_evals=cfg.resolved_max_evals,
            **soft_kw,
        ),
        # The camera stage stays on strong Wolfe in both profiles (the
        # measured A/B config: the sub-problem is tiny and its convergence
        # seeds every later stage), but fast's soft-accept applies.
        camera_lbfgs=LBFGSConfig(
            max_iters=cfg.maxiters * 2, history=8, lr=cfg.lr,
            ftol=cfg.ftol, gtol=cfg.gtol,
            **soft_kw,
        ),
        optim_type=cfg.optim_type,
        try_both_orient=cfg.try_both_orient,
        side_view_thsh=cfg.side_view_thsh,
        left_shoulder_idx=ls, right_shoulder_idx=rs,
        use_camera_prior=cfg.use_camera_prior and bool(cfg.regression_prior),
        # Per-stage param snapshots feed the per-stage overlay renders
        # (reference fit_single_frame.py:509-520); only kept when the app
        # will actually draw them.
        keep_stage_params=cfg.visualize,
    )
    edge_idxs = jnp.asarray(cfg.body_tri_pairs)

    return FitSession(
        cfg=cfg, settings=settings, options=options, schedule=schedule,
        joint_map=joint_map, edge_idxs=edge_idxs, decode_body=decode_body,
        vposer=vposer, gmm=gmm, lhand_gmm=lhand_gmm, rhand_gmm=rhand_gmm,
        segm=segm, parents=parents, coll_stage_mask=coll_stage_mask,
        get_model=get_model,
    )
