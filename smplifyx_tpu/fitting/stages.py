"""Stage weight-schedule assembly from config lists.

Mirrors the reference's per-stage weight dict construction
(fit_single_frame.py:330-353) and its in-loop overrides: the bending prior
weight is always 3.17x the body pose weight (:567-568), and the data weight
is the per-frame 1000/H (:450, :566 — it lives in FrameData here, not in the
schedule; the config's `data_weights` list is dead in the reference and is
preserved only for config compatibility).  The reference's
`global_orient_weights` knob is dead there too (fit_single_frame.py:162,343
— SMPLifyLoss has no matching buffer, so reset_loss_weights' hasattr check
silently drops it); this framework deliberately does not expose it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from smplifyx_tpu.fitting.energy import StageWeights

BENDING_FACTOR = 3.17


def build_stage_schedule(
    body_pose_prior_weights: Sequence[float],
    shape_weights: Sequence[float] | None = None,
    expr_weights: Sequence[float] | None = None,
    hand_pose_prior_weights: Sequence[float] | None = None,
    jaw_pose_prior_weights: Sequence[Sequence[float]] | None = None,
    hand_joints_weights: Sequence[float] | None = None,
    face_joints_weights: Sequence[float] | None = None,
    coll_loss_weights: Sequence[float] | None = None,
    dtype=jnp.float32,
) -> StageWeights:
    """Stack per-stage weights into a StageWeights pytree with leading [S].

    Defaults follow the reference's fallbacks (fit_single_frame.py:136-207).
    `jaw_pose_prior_weights` entries are 3-vectors (or scalars, broadcast).
    """
    S = len(body_pose_prior_weights)

    def dflt(x, default):
        if x is None:
            x = default
        assert len(x) == S, f"schedule length mismatch: {len(x)} != {S}"
        return x

    shape_weights = dflt(shape_weights, [1e2, 5e1, 1e1, 0.5e1][:S] if S <= 4
                         else [1e2] * S)
    expr_weights = dflt(expr_weights, list(shape_weights))
    hand_pose_prior_weights = dflt(hand_pose_prior_weights,
                                   [1e2, 5e1, 1e1, 0.5e1][:S] if S <= 4
                                   else [1e2] * S)
    if jaw_pose_prior_weights is None:
        jaw_pose_prior_weights = [[x] * 3 for x in shape_weights]
    jaw = []
    for entry in jaw_pose_prior_weights:
        if isinstance(entry, str):
            entry = [float(v) for v in entry.split(",")]
        elif np.isscalar(entry):
            entry = [float(entry)] * 3
        jaw.append(list(entry))
    assert len(jaw) == S
    hand_joints_weights = dflt(hand_joints_weights, [0.0] * (S - 1) + [1.0])
    face_joints_weights = dflt(face_joints_weights, [0.0] * (S - 1) + [1.0])
    coll_loss_weights = dflt(coll_loss_weights, [0.0] * S)

    body = np.asarray(body_pose_prior_weights, np.float32)
    return StageWeights(
        body_pose_weight=jnp.asarray(body, dtype),
        shape_weight=jnp.asarray(shape_weights, dtype),
        bending_prior_weight=jnp.asarray(BENDING_FACTOR * body, dtype),
        hand_prior_weight=jnp.asarray(hand_pose_prior_weights, dtype),
        expr_prior_weight=jnp.asarray(expr_weights, dtype),
        jaw_prior_weight=jnp.asarray(jaw, dtype),
        coll_loss_weight=jnp.asarray(coll_loss_weights, dtype),
        hand_weight=jnp.asarray(hand_joints_weights, dtype),
        face_weight=jnp.asarray(face_joints_weights, dtype),
    )
