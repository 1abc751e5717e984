"""Host-side assembly of frame batches for the jitted fitting pipeline.

Covers the glue the reference does per image inside main.py:207-318 and
fit_single_frame.py:119-294/359-411 — keypoint selection (person 0 only,
main.py:245-246), per-image focal length sqrt(W^2+H^2) (main.py:212-214),
data_weight = 1000/H (fit_single_frame.py:450), confidence-threshold masking
of body keypoints (:285-287), camera-init joint trimming (:289-294),
regression-prior pose/camera initialization (:209-235, :359-411), and
VPoser-latent or GMM-mean pose init (:237-252) — but batched: every frame
becomes a row of FrameData/x0 and heterogeneity (image sizes, focal lengths,
confidences) is data, not shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from smplifyx_tpu.data.keypoints import FrameRecord
from smplifyx_tpu.data.regressors import RegressionPrior
from smplifyx_tpu.fitting.energy import FrameData
from smplifyx_tpu.fitting.params import FitSettings, pack
from smplifyx_tpu.utils.config import Config


@dataclass
class PreparedBatch:
    frames: FrameData          # batched pytree [B, ...]
    x0: np.ndarray             # [B, D]
    names: list[str]           # real frame names (<= B; rest is padding)
    num_real: int
    img_sizes: list[tuple[int, int]]
    focals: list[float]


def _norm_prior(t) -> str:
    """Normalize prior-type strings: 'mog' is an alias for 'gmm' (the
    reference CLI's default spelling, which its own factory rejects —
    prior.py:36-50); 'None'/'' mean none."""
    t = (t or "none").lower()
    return {"mog": "gmm", "": "none"}.get(t, t)


def settings_from_config(cfg: Config) -> FitSettings:
    return FitSettings(
        use_vposer=cfg.use_vposer,
        latent_dim=cfg.vposer_latent_dim,
        num_betas=cfg.num_betas,
        num_expr=cfg.num_expression_coeffs,
        num_pca=cfg.num_pca_comps,
        use_hands=cfg.use_hands,
        use_face=cfg.use_face,
        use_face_contour=cfg.use_face_contour,
        use_pca=cfg.use_pca,
        flat_hand_mean=cfg.flat_hand_mean,
        num_body_kp={"coco25": 25, "coco19": 19, "halpe": 26,
                     "coco_wholebody": 23}[cfg.format.lower()],
        body_pose_dof=69 if cfg.model_type == "smpl" else 63,
        use_joints_conf=cfg.use_joints_conf,
        rho=cfg.rho,
        body_prior_type=cfg.body_prior_type,
        left_hand_prior_type=_norm_prior(cfg.left_hand_prior_type),
        right_hand_prior_type=_norm_prior(cfg.right_hand_prior_type),
        jaw_prior_type=_norm_prior(cfg.jaw_prior_type),
        has_regression_prior=cfg.regression_prior is not None,
        camera_conf_mode=(
            "global_scale" if cfg.use_conf_for_camera_init else "none"
        ),
        interpenetration=cfg.interpenetration,
        optim_shape=cfg.optim_shape,
        optim_expression=cfg.optim_expression,
        optim_jaw=cfg.optim_jaw,
        optim_hands=cfg.optim_hands,
    )


def prepare_batch(
    cfg: Config,
    records: Sequence[FrameRecord],
    base_joint_weights: np.ndarray,          # [K] from the dataset
    regression: Optional[Sequence[Optional[RegressionPrior]]] = None,
    vposer=None,
    gmm=None,
    batch_size: Optional[int] = None,
    person_id: int = 0,
    all_persons: bool = False,
) -> PreparedBatch:
    """Build FrameData + x0 for a list of frames (padded to batch_size).

    By default only `person_id` (0) of each frame is fitted — the reference
    quirk (main.py:245-246).  `all_persons=True` lifts that restriction by
    turning every detected person into a batch row named
    `<frame>/p<idx>` (capped by cfg.max_persons), which the batched design
    makes free — another thing the per-image reference cannot express.
    """
    settings = settings_from_config(cfg)
    K = len(base_joint_weights)
    nb = settings.num_body_kp
    names, rows, x0_rows = [], [], []
    img_sizes, focals = [], []

    work = []
    for i, rec in enumerate(records):
        if all_persons:
            n = rec.keypoints.shape[0]
            if cfg.max_persons > 0:
                n = min(n, cfg.max_persons)
            for pid in range(n):
                work.append((i, rec, pid, f"{rec.fn}/p{pid}" if n > 1 else rec.fn))
        else:
            if rec.keypoints.shape[0] > person_id:
                work.append((i, rec, person_id, rec.fn))

    for i, rec, pid, row_name in work:
        kp = rec.keypoints[pid]                  # [K, 3]
        assert kp.shape[0] == K, (kp.shape, K)
        H, W = rec.img_size
        focal = cfg.focal_length or float(np.sqrt(W * W + H * H))
        gt = kp[:, :2].astype(np.float32)
        conf = kp[:, 2].astype(np.float32)

        # confidence threshold applies to body keypoints only (:285-287)
        low_conf = np.zeros(K, bool)
        low_conf[:nb] = conf[:nb] < cfg.confidence_threshold
        joint_w = base_joint_weights.copy()
        joint_w[low_conf] = 0.0

        # trimmed camera-init joints (:289-294)
        init_mask = np.zeros(K, np.float32)
        for idx in cfg.init_joints_idxs:
            if gt[idx, 0] != 0 and gt[idx, 1] != 0 and not low_conf[idx]:
                init_mask[idx] = 1.0

        reg = regression[i] if regression is not None else None
        center = np.array([W / 2.0, H / 2.0], np.float32)
        cam_t0 = np.zeros(3, np.float32)
        if reg is not None and cfg.use_camera_prior:
            if reg.init_translation is not None:
                cam_t0 = reg.init_translation.astype(np.float32)
            if reg.center is not None:
                center = reg.center.astype(np.float32)

        # --- body pose init (:237-252)
        if reg is not None:
            pose0 = reg.body_pose.astype(np.float32)
            global0 = reg.global_orient.astype(np.float32)
            if cfg.use_vposer:
                assert vposer is not None, "use_vposer requires a VPoser"
                z0 = np.asarray(
                    vposer.encode_mean(jnp.asarray(pose0)[None])[0],
                    np.float32,
                )
                body0 = z0
            else:
                body0 = pose0
        else:
            global0 = np.zeros(3, np.float32)
            if cfg.use_vposer:
                body0 = np.zeros(cfg.vposer_latent_dim, np.float32)
            elif cfg.body_prior_type == "gmm" and gmm is not None:
                body0 = np.asarray(gmm.mean_pose(), np.float32)
            else:
                body0 = np.zeros(settings.body_dim, np.float32)

        rows.append(dict(
            gt_joints=gt, conf=conf, joint_weights=joint_w.astype(np.float32),
            focal=np.array([focal, focal], np.float32), center=center,
            data_weight=np.float32(1000.0 / H),
            init_joints_mask=init_mask,
            trans_estimation=cam_t0,
            depth_loss_weight=np.float32(cfg.depth_loss_weight),
            regression_body=body0 if reg is not None
            else np.zeros(settings.body_dim, np.float32),
        ))
        x0_rows.append(dict(cam_t=cam_t0, global_orient=global0, body=body0))
        names.append(row_name)
        img_sizes.append((H, W))
        focals.append(focal)

    num_real = len(rows)
    assert num_real > 0, "no fittable frames in batch"
    B = batch_size or num_real
    assert B >= num_real, "batch_size smaller than number of frames"
    while len(rows) < B:  # pad with copies of the last frame
        rows.append(rows[-1])
        x0_rows.append(x0_rows[-1])

    def stack(key):
        return jnp.asarray(np.stack([r[key] for r in rows]))

    frames = FrameData(
        gt_joints=stack("gt_joints"), conf=stack("conf"),
        joint_weights=stack("joint_weights"), focal=stack("focal"),
        center=stack("center"), data_weight=stack("data_weight"),
        init_joints_mask=stack("init_joints_mask"),
        trans_estimation=stack("trans_estimation"),
        depth_loss_weight=stack("depth_loss_weight"),
        regression_body=stack("regression_body"),
    )
    x0 = pack(
        settings,
        cam_t=jnp.asarray(np.stack([r["cam_t"] for r in x0_rows])),
        global_orient=jnp.asarray(
            np.stack([r["global_orient"] for r in x0_rows])
        ),
        body=jnp.asarray(np.stack([r["body"] for r in x0_rows])),
    )
    return PreparedBatch(
        frames=frames, x0=np.asarray(x0), names=names, num_real=num_real,
        img_sizes=img_sizes, focals=focals,
    )


def pad_prepared(batch: PreparedBatch, B: int) -> PreparedBatch:
    """Pad an assembled batch to B rows by repeating the last row.

    Used for batch-size bucketing (pad gender groups to a power of two so
    the jitted pipeline compiles once per bucket, not once per exact group
    size).  Only frames/x0 are padded; names/num_real keep describing the
    real rows, so result writing is unaffected."""
    import jax.tree_util as jtu

    cur = batch.x0.shape[0]
    if B <= cur:
        assert B == cur or B >= batch.num_real, (B, batch.num_real)
        return batch
    reps = B - cur

    def pad(a):
        a = np.asarray(a)
        return np.concatenate([a, np.repeat(a[-1:], reps, axis=0)], axis=0)

    return PreparedBatch(
        frames=jtu.tree_map(lambda a: jnp.asarray(pad(a)), batch.frames),
        x0=pad(batch.x0),
        names=batch.names, num_real=batch.num_real,
        img_sizes=batch.img_sizes, focals=batch.focals,
    )
