"""The staged fitting pipeline: camera init -> (optional dual orientation) ->
scanned body stages, all inside one jit-compiled program over a frame batch.

Reference counterpart: fit_single_frame (smplifyx/fit_single_frame.py:59-677),
re-architected for TPU:

  * the whole batch of frames is fitted simultaneously — every reference
    Python loop becomes either a vmap (frames), a lax.scan (stages), or a
    batch doubling (the 180-degree dual-orientation retry, reference
    :527-538/:662-668, becomes argmin-selection over a [2B] batch);
  * per-frame early stopping lives inside the vmapped L-BFGS while_loop, so
    there are zero host synchronizations between the first and last
    iteration of a fit (the reference syncs every outer iteration,
    fitting.py:186-192).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from smplifyx_tpu.fitting.energy import (
    FrameData,
    StageWeights,
    camera_init_energy,
    guess_camera_depth,
    smplify_energy,
)
from smplifyx_tpu.fitting.lbfgs import LBFGSConfig, minimize
from smplifyx_tpu.fitting.params import (
    FitSettings,
    body_params_from_flat,
    body_stage_mask,
    camera_stage_mask,
    unpack,
    pack,
)
from smplifyx_tpu.models.bodymodel import SMPLXModel
from smplifyx_tpu.models.forward import smplx_forward
from smplifyx_tpu.ops.rotation import flip_global_orient_y


@struct.dataclass
class FitOptions:
    """Static pipeline options."""

    lbfgs: LBFGSConfig = struct.field(default_factory=LBFGSConfig)
    camera_lbfgs: LBFGSConfig = struct.field(default_factory=LBFGSConfig)
    try_both_orient: bool = struct.field(pytree_node=False, default=False)
    # Optimizer driving every stage (reference optim_factory.py:27-65):
    # 'lbfgs'/'lbfgsls' -> native strong-Wolfe L-BFGS; 'adam'/'sgd'/'rmsprop'
    # -> masked fixed-step first-order loop (fitting/optimizers.py) with the
    # same ftol/gtol/NaN termination.  First-order runs use the exact
    # per-evaluation collision broad phase (no line search to hoist out of).
    optim_type: str = struct.field(pytree_node=False, default="lbfgsls")
    # Run the stage-0 camera fit (+ guess-init).  Disable when resuming the
    # body stages from an already-camera-fitted x0 — e.g. when splitting
    # one fit into several smaller dispatches (each jitted call stays under
    # remote-execution RPC deadlines; see bench_collision.py --split) or
    # when warm-starting from checkpointed params.
    camera_stage: bool = struct.field(pytree_node=False, default=True)
    side_view_thsh: float = struct.field(pytree_node=False, default=25.0)
    left_shoulder_idx: int = struct.field(pytree_node=False, default=2)
    right_shoulder_idx: int = struct.field(pytree_node=False, default=5)
    use_camera_prior: bool = struct.field(pytree_node=False, default=False)
    # Collision broad-phase refresh cadence: "iter" rebuilds the candidate
    # pair list once per L-BFGS iteration and reuses it across that
    # iteration's line search (pairs are AABB-rechecked per evaluation, see
    # ops/collision.py apply); "eval" reruns the full broad phase in every
    # energy evaluation (exact reference semantics, ~5x the collision cost).
    coll_broad_refresh: str = struct.field(pytree_node=False, default="iter")
    # Persist the Morton sort across broad-phase refreshes within a stage:
    # each refresh reuses the stage-initial triangle ordering and re-runs
    # only the AABB funnel (collision_fn.build_refresh).  Exact up to the
    # pair budgets for any ordering — staleness only loosens the spatial
    # groupings (more survivors), never drops a contacting pair outright —
    # and poses drift little within one stage.  Saves the batched argsort
    # (the most expensive single broad-phase op) on every refresh.
    coll_morton_persist: bool = struct.field(pytree_node=False, default=True)
    # Keep the per-stage parameter snapshots ([S, B, D] in
    # FitResult.stage_x) — the reference's per-stage visualization hook
    # (fit_single_frame.py:509-520 renders the mesh after every stage).
    # Off by default: S extra [B, D] buffers are pure overhead otherwise.
    keep_stage_params: bool = struct.field(pytree_node=False, default=False)
    # Matmul precision for everything traced inside fit_batch.  The TPU's
    # default single-pass bf16 MXU mode costs real quality AND speed on
    # this workload: gradient noise from bf16 contractions degrades 2D
    # reprojection 2.3x (5.0 -> 2.16 px on the full-scale synthetic-GT
    # bench, where f32 matches CPU bit-for-bit-level quality: 42.9 vs
    # 42.7 mm V2V) and the noisier line searches burn ~40% more
    # evaluations (231 -> 245 fps at B=128 when switching to f32).  The
    # reference runs f32 CUDA throughout, so this is also the parity
    # default.  None leaves the backend default (single-pass bf16).
    matmul_precision: Optional[str] = struct.field(
        pytree_node=False, default="highest")


class FitResult(struct.PyTreeNode):
    x: jax.Array             # [B, D] final flat params (winning orientation)
    loss: jax.Array          # [B] final total energy
    camera_loss: jax.Array   # [B] stage-0 final energy
    flipped: jax.Array       # [B] bool: the 180-degree orientation won
    stage_losses: jax.Array  # [S, B] energy after each body stage
    # Objective evaluations per body stage (winning orientation, like
    # stage_losses).  Lanes advance in lockstep, so batch wall-clock tracks
    # the max over lanes; the per-lane counts expose line-search behavior
    # (strong Wolfe vs Armijo) and convergence spread across the batch.
    stage_evals: jax.Array   # [S, B] int32
    camera_evals: jax.Array  # [B] int32, 0 when the camera stage is skipped
    # [S, B, D] params after each stage (winning orientation); None unless
    # FitOptions.keep_stage_params
    stage_x: Optional[jax.Array] = None


def fit_batch(
    model: SMPLXModel,
    settings: FitSettings,
    options: FitOptions,
    stage_weights: StageWeights,      # stacked: every leaf [S, ...]
    frames: FrameData,                # batched: every leaf [B, ...]
    x0: jax.Array,                    # [B, D] initial flat params
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: jax.Array,
    gmm=None,
    edge_idxs: Optional[jax.Array] = None,
    collision_fn: Optional[Callable] = None,
    joints_model=None,
    coll_stage_mask: Optional[tuple] = None,
    lhand_gmm=None,
    rhand_gmm=None,
) -> FitResult:
    """Fit a batch of frames — see _fit_batch_impl for the full docstring.

    This shim only pins `options.matmul_precision` (default f32; see the
    FitOptions field note) around the trace.  Pallas kernels are
    unaffected — they pin their own operand precisions internally.
    """
    args = (model, settings, options, stage_weights, frames, x0,
            decode_body, joint_map, gmm, edge_idxs, collision_fn,
            joints_model, coll_stage_mask, lhand_gmm, rhand_gmm)
    if options.matmul_precision is None:
        return _fit_batch_impl(*args)
    with jax.default_matmul_precision(options.matmul_precision):
        return _fit_batch_impl(*args)


def _fit_batch_impl(
    model: SMPLXModel,
    settings: FitSettings,
    options: FitOptions,
    stage_weights: StageWeights,      # stacked: every leaf [S, ...]
    frames: FrameData,                # batched: every leaf [B, ...]
    x0: jax.Array,                    # [B, D] initial flat params
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: jax.Array,
    gmm=None,
    edge_idxs: Optional[jax.Array] = None,
    collision_fn: Optional[Callable] = None,
    joints_model=None,
    coll_stage_mask: Optional[tuple] = None,
    lhand_gmm=None,
    rhand_gmm=None,
) -> FitResult:
    """Fit a batch of frames.  Fully jit-able; vmap/pjit-friendly.

    `decode_body` maps [*, body_dim] -> [*, 63] (identity reshape or VPoser).
    `stage_weights` leaves are stacked along a leading stage axis S.

    `coll_stage_mask` (static tuple[bool], one per stage) marks which stages
    actually apply the collision penalty: all four reference presets run
    interpenetration only in their LAST stages (coll_loss_weights start at
    0), so earlier stages can use the ~3x-cheaper joints-only energy even in
    collision-enabled configs.  Stages are grouped into consecutive runs of
    equal mask value, one lax.scan per run (2 compiled stage bodies max).
    """
    B, D = x0.shape
    num_stages = jax.tree_util.tree_leaves(stage_weights)[0].shape[0]

    cam_mask = camera_stage_mask(settings)
    body_mask = body_stage_mask(settings)

    use_lbfgs = options.optim_type.lower() in ("lbfgs", "lbfgsls")
    if use_lbfgs:
        def run_min(fun, x, mask, cfg, aux_fn=None, aux_refresh_fn=None):
            return minimize(fun, x, mask=mask, cfg=cfg, aux_fn=aux_fn,
                            aux_refresh_fn=aux_refresh_fn)
    else:
        from smplifyx_tpu.fitting.optimizers import (
            make_optax_optimizer, minimize_first_order,
        )

        def run_min(fun, x, mask, cfg, aux_fn=None, aux_refresh_fn=None):
            # aux_fn ignored: first-order steps have no line search, so the
            # broad phase is recomputed per evaluation (reference semantics).
            opt = make_optax_optimizer(options.optim_type, cfg.lr)
            return minimize_first_order(
                fun, x, opt, mask=mask, max_iters=cfg.max_iters,
                ftol=cfg.ftol, gtol=cfg.gtol,
            )

    # ---- camera translation init (guess_init path) --------------------
    if not options.use_camera_prior and options.camera_stage:
        assert edge_idxs is not None
        init_t = jax.vmap(
            lambda x, f: guess_camera_depth(
                settings, model, x, f.gt_joints, edge_idxs, f.focal[0],
                decode_body, joint_map, joints_model=joints_model,
            )
        )(x0, frames)
        frames = frames.replace(trans_estimation=init_t)
        seg = unpack(settings, x0)
        seg["cam_t"] = init_t
        x0 = pack(settings, **seg)

    # ---- stage 0: camera ----------------------------------------------
    if options.camera_stage:
        def cam_fit_one(x, frame):
            fun = lambda xx: camera_init_energy(
                xx, settings, model, frame, decode_body, joint_map,
                joints_model=joints_model,
            )
            return run_min(fun, x, cam_mask, options.camera_lbfgs)

        cam_res = jax.vmap(cam_fit_one)(x0, frames)
        x_cam = cam_res.x
        # NOTE: recorded BEFORE the dual-orientation doubling, so for a
        # frame whose 180-degree flip wins the body fit,
        # FitResult.camera_loss still describes the (shared) unflipped
        # camera stage — the flip reuses the fitted camera translation
        # (reference fit_single_frame.py:527-538).
        camera_loss = cam_res.f
        camera_evals = cam_res.n_evals.astype(jnp.int32)
    else:
        x_cam = x0
        camera_loss = jnp.zeros((B,), x0.dtype)
        camera_evals = jnp.zeros((B,), jnp.int32)

    # ---- optional dual orientation: double the batch -------------------
    if options.try_both_orient:
        seg = unpack(settings, x_cam)
        flipped_orient = flip_global_orient_y(seg["global_orient"])
        seg_f = dict(seg)
        seg_f["global_orient"] = flipped_orient
        x_flip = pack(settings, **seg_f)
        xs = jnp.concatenate([x_cam, x_flip], axis=0)          # [2B, D]
        frames2 = jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a, a], axis=0), frames
        )
    else:
        xs = x_cam
        frames2 = frames

    # ---- body stages: scan over the weight schedule --------------------
    def make_stage_step(with_collision: bool):
        # Without collision in this group, the joints-only sparse energy is
        # valid (settings.interpenetration only gates the sparse path, so
        # override it per group via a shallow settings copy).
        group_settings = settings
        if settings.interpenetration and not with_collision:
            group_settings = settings.replace(interpenetration=False)

        hoist_broad = (
            with_collision
            and options.coll_broad_refresh == "iter"
            and hasattr(collision_fn, "build")
        )

        def vertices_of(z):
            params, _, _ = body_params_from_flat(
                settings, z[None], lambda b: decode_body(b)
            )
            out = smplx_forward(
                model, params,
                use_pca=settings.use_pca,
                flat_hand_mean=settings.flat_hand_mean,
                use_face_contour=settings.use_face_contour,
                return_verts=True,
            )
            return out.vertices[0]

        def stage_step(x, scan_in):
            stage_idx, w = scan_in

            def fit_one(xx, frame):
                def fun(z, aux=None):
                    return smplify_energy(
                        z, group_settings, model, frame, w, stage_idx,
                        num_stages, decode_body, joint_map, gmm=gmm,
                        collision_fn=collision_fn if with_collision else None,
                        joints_model=joints_model,
                        lhand_gmm=lhand_gmm, rhand_gmm=rhand_gmm,
                        collision_aux=aux,
                    )

                aux_fn = (
                    (lambda z: collision_fn.build(vertices_of(z)))
                    if hoist_broad and use_lbfgs else None
                )
                aux_refresh_fn = (
                    (lambda z, aux: collision_fn.build_refresh(
                        vertices_of(z), aux))
                    if (aux_fn is not None and options.coll_morton_persist
                        and hasattr(collision_fn, "build_refresh"))
                    else None
                )
                return run_min(fun, xx, body_mask, options.lbfgs,
                               aux_fn=aux_fn, aux_refresh_fn=aux_refresh_fn)

            res = jax.vmap(fit_one)(x, frames2)
            snap = res.x if options.keep_stage_params else jnp.zeros((0,))
            return res.x, (res.f, res.n_evals.astype(jnp.int32), snap)

        return stage_step

    if coll_stage_mask is None:
        coll_stage_mask = tuple(
            [settings.interpenetration and collision_fn is not None]
            * num_stages
        )
    assert len(coll_stage_mask) == num_stages

    # Group consecutive stages with the same collision flag.
    groups = []
    start = 0
    for i in range(1, num_stages + 1):
        if i == num_stages or coll_stage_mask[i] != coll_stage_mask[start]:
            groups.append((start, i, coll_stage_mask[start]))
            start = i

    x_cur = xs
    loss_chunks = []
    eval_chunks = []
    snap_chunks = []
    for lo, hi, with_coll in groups:
        w_group = jax.tree_util.tree_map(lambda a: a[lo:hi], stage_weights)
        x_cur, (losses, evals, snaps) = jax.lax.scan(
            make_stage_step(with_coll), x_cur,
            (jnp.arange(lo, hi), w_group),
        )
        loss_chunks.append(losses)
        eval_chunks.append(evals)
        snap_chunks.append(snaps)
    x_final = x_cur
    stage_losses = jnp.concatenate(loss_chunks, axis=0)
    stage_evals = jnp.concatenate(eval_chunks, axis=0)
    stage_x = (jnp.concatenate(snap_chunks, axis=0)
               if options.keep_stage_params else None)
    final_loss = stage_losses[-1]

    # ---- orientation selection -----------------------------------------
    if options.try_both_orient:
        loss_orig, loss_flip = final_loss[:B], final_loss[B:]
        ls = options.left_shoulder_idx
        rs = options.right_shoulder_idx
        shoulder_dist = jnp.linalg.norm(
            frames.gt_joints[:, ls] - frames.gt_joints[:, rs], axis=-1
        )
        eligible = shoulder_dist < options.side_view_thsh
        take_flip = eligible & (loss_flip < loss_orig)
        x_out = jnp.where(take_flip[:, None], x_final[B:], x_final[:B])
        loss_out = jnp.where(take_flip, loss_flip, loss_orig)
        stage_losses_out = jnp.where(
            take_flip[None, :], stage_losses[:, B:], stage_losses[:, :B]
        )
        stage_evals_out = jnp.where(
            take_flip[None, :], stage_evals[:, B:], stage_evals[:, :B]
        )
        stage_x_out = (
            jnp.where(take_flip[None, :, None], stage_x[:, B:], stage_x[:, :B])
            if stage_x is not None else None
        )
    else:
        take_flip = jnp.zeros((B,), bool)
        x_out, loss_out, stage_losses_out = x_final, final_loss, stage_losses
        stage_evals_out = stage_evals
        stage_x_out = stage_x

    return FitResult(
        x=x_out, loss=loss_out, camera_loss=camera_loss,
        flipped=take_flip, stage_losses=stage_losses_out,
        stage_evals=stage_evals_out, camera_evals=camera_evals,
        stage_x=stage_x_out,
    )


def recover_outputs(
    model: SMPLXModel,
    settings: FitSettings,
    x: jax.Array,
    decode_body: Callable[[jax.Array], jax.Array],
    joint_map: Optional[jax.Array] = None,
):
    """Final forward pass on fitted params: (vertices, joints, BodyParams,
    cam_t, decoded body pose).

    Runs under f32 matmul precision like fit_batch: the recovered mesh is
    the deliverable, and a single-pass bf16 LBS perturbs vertices at the
    millimetre scale."""
    with jax.default_matmul_precision("highest"):
        return _recover_outputs_impl(model, settings, x, decode_body,
                                     joint_map)


def _recover_outputs_impl(model, settings, x, decode_body, joint_map):
    params, cam_t, body_raw = body_params_from_flat(settings, x, decode_body)
    out = smplx_forward(
        model, params,
        use_pca=settings.use_pca,
        flat_hand_mean=settings.flat_hand_mean,
        use_face_contour=settings.use_face_contour,
        joint_map=joint_map,
        return_verts=True,
    )
    return out, params, cam_t
