"""Fitting energies: the SMPLify objective and the camera-init objective.

Pure per-frame scalar functions of a flat parameter vector; weights arrive as
a pytree (one entry per stage is scanned over), so re-weighting between
stages is data, not a module mutation (contrast reference
`reset_loss_weights`, smplifyx/fitting.py:363-373).

Term-by-term parity with reference SMPLifyLoss.forward (fitting.py:375-461):
  data        sum(w^2 * gmof(gt - proj)) * data_weight^2, w = joint_w * conf
  pose prior  vposer:  ||z||^2 * w^2  (or ||z - z_reg||^2 on the LAST stage
              when a regression prior exists, fitting.py:391-397)
              direct+regression: ||pose - pose_reg||^2 * w^2
              direct+gmm: GMM-NLL(body_pose) * w^2
  shape       sum(betas^2) * w^2
  bending     angle_prior(full_pose[3:66]) * bending_w   (NOT squared)
  hands       sum(pca^2) * w^2 each side
  expression  sum(expr^2) * w^2
  jaw         sum((jaw * jaw_w_vec)^2)   (3-vector weight, fitting.py:431-435)
  collision   cone-distance-field penalty * coll_w (ops/collision.py)

Camera-init parity with SMPLifyCameraInitLoss (fitting.py:464-520) including
the reference's conf-weighting broadcast quirk (see `camera_conf_mode`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from smplifyx_tpu.fitting.params import FitSettings, body_params_from_flat
from smplifyx_tpu.models.bodymodel import SMPLXModel
from smplifyx_tpu.models.forward import smplx_forward
from smplifyx_tpu.ops.camera import CameraParams, project_points
from smplifyx_tpu.ops.robustifier import gmof
from smplifyx_tpu.priors.priors import GMMPrior, angle_prior


@struct.dataclass
class StageWeights:
    """Per-stage loss weights (scalars unless noted). Stack to [S, ...] and
    scan.  Mirrors the per-stage dicts of fit_single_frame.py:330-353."""

    body_pose_weight: jax.Array
    shape_weight: jax.Array
    bending_prior_weight: jax.Array  # 3.17 * body_pose_weight (ref :567-568)
    hand_prior_weight: jax.Array
    expr_prior_weight: jax.Array
    jaw_prior_weight: jax.Array      # [3] elementwise jaw weight
    coll_loss_weight: jax.Array
    hand_weight: jax.Array           # 2D-keypoint weight for hand slots
    face_weight: jax.Array           # 2D-keypoint weight for face slots

    @classmethod
    def single(cls, body=1.0, shape=1.0, hand_prior=1.0, expr=1.0,
               jaw=(1.0, 1.0, 1.0), coll=0.0, hand=1.0, face=1.0,
               bending=None, dtype=jnp.float32):
        f = lambda v: jnp.asarray(v, dtype)
        return cls(
            body_pose_weight=f(body), shape_weight=f(shape),
            bending_prior_weight=f(3.17 * body if bending is None else bending),
            hand_prior_weight=f(hand_prior), expr_prior_weight=f(expr),
            jaw_prior_weight=f(jaw), coll_loss_weight=f(coll),
            hand_weight=f(hand), face_weight=f(face),
        )


@struct.dataclass
class FrameData:
    """Per-frame observation data (stack to [B, ...] and vmap)."""

    gt_joints: jax.Array        # [K, 2] 2D keypoints
    conf: jax.Array             # [K] detection confidences
    joint_weights: jax.Array    # [K] base weights: ones, joints_to_ign and
                                #     low-confidence body slots zeroed
    focal: jax.Array            # [2]
    center: jax.Array           # [2]
    data_weight: jax.Array      # scalar, 1000/H (reference :450, :566)
    init_joints_mask: jax.Array  # [K] 1.0 on trimmed camera-init joints
    trans_estimation: jax.Array  # [3] depth-regularizer target
    depth_loss_weight: jax.Array  # scalar
    regression_body: jax.Array  # [body_dim] target for deviation penalty
                                #     (zeros when has_regression_prior=False)


def make_camera(frame: FrameData, cam_t: jax.Array) -> CameraParams:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cam_t.dtype), (3, 3))
    return CameraParams(
        rotation=eye, translation=cam_t, focal=frame.focal, center=frame.center
    )


def stage_joint_weights(
    settings: FitSettings, frame: FrameData, w: StageWeights
) -> jax.Array:
    """Assemble the per-keypoint weight vector for a stage: body slots keep
    the base weights, hand/face slots are ASSIGNED the stage's hand/face
    weights wholesale — matching the reference exactly
    (fit_single_frame.py:569-574 assigns into the joint-weight tensor, so a
    joints_to_ign entry naming a hand/face slot is overwritten there too;
    only low-confidence BODY slots stay zeroed, and those live in the body
    range this assignment never touches)."""
    K = frame.joint_weights.shape[-1]
    nb = settings.num_body_kp
    idx = jnp.arange(K)
    wvec = frame.joint_weights
    if settings.use_hands:
        in_hand = (idx >= nb) & (idx < nb + 42)
        wvec = jnp.where(in_hand, w.hand_weight, wvec)
    if settings.use_face:
        in_face = idx >= nb + 42
        wvec = jnp.where(in_face, w.face_weight, wvec)
    return wvec


def smplify_energy_terms(
    x: jax.Array,
    settings: FitSettings,
    model: SMPLXModel,
    frame: FrameData,
    w: StageWeights,
    stage_idx: jax.Array,
    num_stages: int,
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: jax.Array,
    gmm: Optional[GMMPrior] = None,
    collision_fn: Optional[Callable] = None,
    joints_model=None,
    lhand_gmm: Optional[GMMPrior] = None,
    rhand_gmm: Optional[GMMPrior] = None,
    collision_aux=None,
) -> dict:
    """Per-term SMPLify objective breakdown for ONE frame.

    Returns a dict of scalar terms whose sum is `smplify_energy`; key ->
    reference counterpart in SMPLifyLoss.forward (fitting.py:375-461):
      data        joint_loss            (:386-388)
      pose_prior  pprior_loss           (:390-401, incl. the last-stage
                                         deviation rule under vposer+reg)
      shape       shape_loss            (:403-404)
      bending     angle_prior_loss      (:407-408, weight NOT squared)
      hands       left+right hand prior (:411-422)
      expression  expression_loss       (:425-429)
      jaw         jaw_prior_loss        (:431-435)
      collision   pen_loss              (:437-455)
    The per-term reference differential lives in
    tests/test_reference_parity.py::TestSMPLifyLossParity, which isolates
    each reference term by zeroing every other weight through the actual
    SMPLifyLoss.forward.
    """
    params, cam_t, body_raw = body_params_from_flat(
        settings, x[None], lambda b: decode_body(b)
    )
    use_sparse = joints_model is not None and not settings.interpenetration
    if use_sparse:
        from smplifyx_tpu.models.sparse import joints_forward

        joints = joints_forward(
            joints_model, params,
            use_pca=settings.use_pca,
            flat_hand_mean=settings.flat_hand_mean,
            use_face_contour=settings.use_face_contour,
            joint_map=joint_map,
        )
        vertices = None
        body_pose_aa = params.body_pose
    else:
        out = smplx_forward(
            model, params,
            use_pca=settings.use_pca,
            flat_hand_mean=settings.flat_hand_mean,
            use_face_contour=settings.use_face_contour,
            joint_map=joint_map,
            return_verts=True,
        )
        joints = out.joints
        vertices = out.vertices
        body_pose_aa = out.body_pose
    camera = make_camera(frame, cam_t[0])
    proj = project_points(camera, joints[0])  # [K, 2]

    joint_w = stage_joint_weights(settings, frame, w)
    weights = joint_w * frame.conf if settings.use_joints_conf else joint_w
    diff = gmof(frame.gt_joints - proj, settings.rho)  # [K, 2]
    joint_loss = jnp.sum(weights[:, None] ** 2 * diff) * frame.data_weight**2

    # --- pose prior
    body_seg = body_raw[0]
    if settings.use_vposer:
        if settings.has_regression_prior:
            dev = jnp.sum((body_seg - frame.regression_body) ** 2)
            base = jnp.sum(body_seg**2)
            is_last = stage_idx == num_stages - 1
            pprior = jnp.where(is_last, dev, base) * w.body_pose_weight**2
        else:
            pprior = jnp.sum(body_seg**2) * w.body_pose_weight**2
    elif settings.has_regression_prior:
        pprior = (
            jnp.sum((body_seg - frame.regression_body) ** 2)
            * w.body_pose_weight**2
        )
    elif settings.body_prior_type == "gmm" and gmm is not None:
        pprior = jnp.sum(gmm(body_pose_aa[0][None])) * w.body_pose_weight**2
    else:  # plain l2 on the pose
        pprior = jnp.sum(body_seg**2) * w.body_pose_weight**2

    shape_loss = jnp.sum(params.betas[0] ** 2) * w.shape_weight**2

    # full_pose[:, 3:66] is exactly the decoded body pose
    bend = jnp.sum(angle_prior(body_pose_aa)) * w.bending_prior_weight

    # --- hand priors over the PCA coefficients (reference fitting.py:411-422
    # applies left/right_hand_prior to the model output's hand pose, which
    # under use_pca IS the coefficient vector); per-side type from settings.
    def _hand_term(coeffs, prior_type, hand_gmm):
        if not settings.use_hands or prior_type == "none":
            return 0.0
        if prior_type == "gmm" and hand_gmm is not None:
            return jnp.sum(hand_gmm(coeffs[None])) * w.hand_prior_weight**2
        return jnp.sum(coeffs**2) * w.hand_prior_weight**2

    hand_loss = (
        _hand_term(params.left_hand_pose[0],
                   settings.left_hand_prior_type, lhand_gmm)
        + _hand_term(params.right_hand_pose[0],
                     settings.right_hand_prior_type, rhand_gmm)
    )

    expr_loss = jnp.asarray(0.0)
    jaw_loss = jnp.asarray(0.0)
    if settings.use_face:
        expr_loss = jnp.sum(params.expression[0] ** 2) * w.expr_prior_weight**2
        if settings.jaw_prior_type != "none":
            # L2 on jaw_pose scaled elementwise by the 3-vector jaw weight
            # (reference fitting.py:431-435)
            jaw_loss = jnp.sum((params.jaw_pose[0] * w.jaw_prior_weight) ** 2)

    pen_loss = 0.0
    if settings.interpenetration and collision_fn is not None:
        # collision_aux: a broad-phase pair list hoisted out of the line
        # search (lbfgs aux_fn); None means exact per-eval broad phase.
        if collision_aux is not None:
            pen = collision_fn.apply(vertices[0], collision_aux)
        else:
            pen = collision_fn(vertices[0])
        pen_loss = w.coll_loss_weight * pen

    return {
        "data": joint_loss,
        "pose_prior": pprior,
        "shape": shape_loss,
        "bending": bend,
        "hands": hand_loss,
        "expression": expr_loss,
        "jaw": jaw_loss,
        "collision": pen_loss,
    }


def smplify_energy(*args, **kwargs) -> jax.Array:
    """Full SMPLify objective for ONE frame (flat params [D] -> scalar):
    the sum of `smplify_energy_terms` (XLA fuses the breakdown away).

    vmap over (x, frame) for the batch; `decode_body`, `model`, tables are
    closed over.  stage_idx is traced so one compilation serves all stages.

    Every term except the collision penalty depends on the params and the
    MAPPED JOINTS only, so when a JointsModel is available and the collision
    term is off, the full-mesh skinning is skipped entirely (measured
    5.3 -> 1.6 ms per energy evaluation at B=64, V=10475 on v5e).
    """
    terms = smplify_energy_terms(*args, **kwargs)
    return (terms["data"] + terms["pose_prior"] + terms["shape"]
            + terms["bending"] + terms["hands"] + terms["expression"]
            + terms["jaw"] + terms["collision"])


def _mapped_joints(settings: FitSettings, model, params, joint_map,
                   joints_model=None) -> jax.Array:
    """Mapped joints via the cheap joints-only forward when available."""
    if joints_model is not None:
        from smplifyx_tpu.models.sparse import joints_forward

        return joints_forward(
            joints_model, params,
            use_pca=settings.use_pca,
            flat_hand_mean=settings.flat_hand_mean,
            use_face_contour=settings.use_face_contour,
            joint_map=joint_map,
        )
    return smplx_forward(
        model, params,
        use_pca=settings.use_pca,
        flat_hand_mean=settings.flat_hand_mean,
        use_face_contour=settings.use_face_contour,
        joint_map=joint_map,
        return_verts=True,
    ).joints


def camera_init_energy(
    x: jax.Array,
    settings: FitSettings,
    model: SMPLXModel,
    frame: FrameData,
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: jax.Array,
    joints_model=None,
) -> jax.Array:
    """Stage-0 camera objective (reference SMPLifyCameraInitLoss).

    Squared 2D error over the trimmed torso joints (+conf weighting) scaled
    by data_weight^2, plus the squared-depth regularizer pulling t_z to the
    similar-triangles estimate.  Uses the joints-only sparse forward when a
    JointsModel is supplied (~50x fewer FLOPs than the full mesh).
    """
    params, cam_t, _ = body_params_from_flat(
        settings, x[None], lambda b: decode_body(b)
    )
    joints = _mapped_joints(settings, model, params, joint_map, joints_model)
    camera = make_camera(frame, cam_t[0])
    proj = project_points(camera, joints[0])

    err = (frame.gt_joints - proj) ** 2  # [K, 2]
    masked = err * frame.init_joints_mask[:, None]
    if settings.camera_conf_mode == "per_joint":
        joint_loss = jnp.sum(masked * frame.conf[:, None] ** 2)
    elif settings.camera_conf_mode == "global_scale":
        # Bug-for-bug with the reference broadcast (fitting.py:509-511):
        # the conf^2 factor decouples from the per-joint error and becomes a
        # global scale sum(conf^2 over init joints) on the data term.
        conf_sq = jnp.sum((frame.conf * frame.init_joints_mask) ** 2)
        joint_loss = jnp.sum(masked) * conf_sq
    else:  # 'none'
        joint_loss = jnp.sum(masked)
    joint_loss = joint_loss * frame.data_weight**2

    depth = frame.depth_loss_weight**2 * jnp.sum(
        (cam_t[0, 2] - frame.trans_estimation[2]) ** 2
    )
    return joint_loss + depth


def guess_camera_depth(
    settings: FitSettings,
    model: SMPLXModel,
    x0: jax.Array,
    gt_joints: jax.Array,
    edge_idxs: jax.Array,
    focal_length: jax.Array,
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: jax.Array,
    joints_model=None,
) -> jax.Array:
    """Similar-triangles depth init (reference guess_init, fitting.py:36-110).

    x0 [D] initial flat params; gt_joints [K, 2]; edge_idxs [E, 2] keypoint
    index pairs; returns [3] = (0, 0, focal * mean|edge3d| / mean|edge2d|).
    """
    params, _, _ = body_params_from_flat(
        settings, x0[None], lambda b: decode_body(b)
    )
    joints = _mapped_joints(settings, model, params, joint_map, joints_model)
    j3d = joints[0]  # [K, 3]
    d3 = j3d[edge_idxs[:, 0]] - j3d[edge_idxs[:, 1]]          # [E, 3]
    d2 = gt_joints[edge_idxs[:, 0]] - gt_joints[edge_idxs[:, 1]]  # [E, 2]
    len3 = jnp.sqrt(jnp.sum(d3**2, axis=-1))
    len2 = jnp.sqrt(jnp.sum(d2**2, axis=-1))
    est_d = focal_length * (jnp.mean(len3) / jnp.maximum(jnp.mean(len2), 1e-9))
    return jnp.stack([jnp.zeros_like(est_d), jnp.zeros_like(est_d), est_d])
