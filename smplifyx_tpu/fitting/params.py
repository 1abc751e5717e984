"""Flat parameter vector layout and per-stage free-parameter masks.

The reference mutates torch module parameters and rebuilds the optimizer over
`requires_grad`-filtered lists each stage (fit_single_frame.py:553-563).  The
TPU design instead packs every optimizable quantity into one flat [D] vector
per frame — camera translation, global orientation, body pose (either the
direct 63-dof axis-angle or a VPoser latent), shape, expression, jaw, eyes,
hand PCA coefficients — and freezes/frees segments with 0/1 masks consumed by
the masked L-BFGS (fitting/lbfgs.py).  This keeps every stage the same
compiled program: stage changes are data (weights + masks), not code.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from smplifyx_tpu.models.forward import BodyParams


@struct.dataclass
class FitSettings:
    """Static fitting configuration (hashable; changes trigger recompiles)."""

    use_vposer: bool = struct.field(pytree_node=False, default=False)
    latent_dim: int = struct.field(pytree_node=False, default=32)
    num_betas: int = struct.field(pytree_node=False, default=10)
    num_expr: int = struct.field(pytree_node=False, default=10)
    num_pca: int = struct.field(pytree_node=False, default=12)
    use_hands: bool = struct.field(pytree_node=False, default=True)
    use_face: bool = struct.field(pytree_node=False, default=True)
    use_face_contour: bool = struct.field(pytree_node=False, default=True)
    use_pca: bool = struct.field(pytree_node=False, default=True)
    flat_hand_mean: bool = struct.field(pytree_node=False, default=False)
    num_body_kp: int = struct.field(pytree_node=False, default=25)
    use_joints_conf: bool = struct.field(pytree_node=False, default=True)
    rho: float = struct.field(pytree_node=False, default=100.0)
    # 'gmm' | 'l2' | 'none'; 'l2' on the latent when use_vposer
    body_prior_type: str = struct.field(pytree_node=False, default="l2")
    # Hand priors over the PCA coefficients: 'gmm' | 'l2' | 'none'.  The
    # reference exposes these as left/right_hand_prior_type whose CLI
    # default 'mog' its own factory REJECTS (prior.py:36-50 raises on
    # 'mog'; every shipped preset uses l2) — here 'mog' is accepted as an
    # alias for 'gmm', making the advertised capability actually work.
    left_hand_prior_type: str = struct.field(pytree_node=False, default="l2")
    right_hand_prior_type: str = struct.field(pytree_node=False, default="l2")
    # 'l2' | 'none' (reference jaw_prior_type choices, cmd_parser.py:151-155)
    jaw_prior_type: str = struct.field(pytree_node=False, default="l2")
    has_regression_prior: bool = struct.field(pytree_node=False, default=False)
    # reference bug-for-bug switch for camera-init conf weighting
    camera_conf_mode: str = struct.field(pytree_node=False, default="global_scale")
    interpenetration: bool = struct.field(pytree_node=False, default=False)
    # axis-angle body dofs: 63 for smplx/smplh (21 joints), 69 for smpl
    # (23 joints incl. wrists — reference append_wrists, fitting.py:242-246)
    body_pose_dof: int = struct.field(pytree_node=False, default=63)
    # Per-group freezing (reference cmd_parser.py:101-110 parses these but
    # the fork never consumes them — dead flags; here they are live and
    # implemented as 0-entries in the body-stage gradient mask, which
    # provably confines L-BFGS directions to the free subspace).
    # optim_jaw also gates the eye poses: jaw/leye/reye are the face
    # articulation block and none is observable without face keypoints.
    optim_shape: bool = struct.field(pytree_node=False, default=True)
    optim_expression: bool = struct.field(pytree_node=False, default=True)
    optim_jaw: bool = struct.field(pytree_node=False, default=True)
    optim_hands: bool = struct.field(pytree_node=False, default=True)

    @property
    def body_dim(self) -> int:
        return self.latent_dim if self.use_vposer else self.body_pose_dof

    @property
    def hand_dim(self) -> int:
        """Per-hand segment width: PCA coefficients, or the full 45-dof
        axis-angle pose when use_pca=False (reference --use_pca false;
        smplx create(use_pca=False) takes [B, 45] hand poses)."""
        return self.num_pca if self.use_pca else 45

    def segments(self) -> Dict[str, tuple[int, int]]:
        """Name -> (offset, size) of every segment in the flat vector."""
        sizes = [
            ("cam_t", 3),
            ("global_orient", 3),
            ("body", self.body_dim),
            ("betas", self.num_betas),
            ("expression", self.num_expr),
            ("jaw", 3),
            ("leye", 3),
            ("reye", 3),
            ("lhand", self.hand_dim),
            ("rhand", self.hand_dim),
        ]
        out, off = {}, 0
        for name, size in sizes:
            out[name] = (off, size)
            off += size
        return out

    @property
    def dim(self) -> int:
        segs = self.segments()
        last = segs["rhand"]
        return last[0] + last[1]


def pack(settings: FitSettings, **values) -> jax.Array:
    """Pack named segments (each [B, size]) into flat [B, D]; missing -> 0."""
    segs = settings.segments()
    some = next(iter(values.values()))
    B = some.shape[0]
    dtype = some.dtype
    parts = []
    for name, (_, size) in segs.items():
        v = values.get(name)
        if v is None:
            v = jnp.zeros((B, size), dtype)
        parts.append(v.reshape(B, size))
    return jnp.concatenate(parts, axis=-1)


def unpack(settings: FitSettings, x: jax.Array) -> Dict[str, jax.Array]:
    """Flat [..., D] -> dict of segment arrays [..., size]."""
    segs = settings.segments()
    return {
        name: jax.lax.dynamic_slice_in_dim(x, off, size, axis=-1)
        for name, (off, size) in segs.items()
    }


def body_params_from_flat(
    settings: FitSettings, x: jax.Array, decode_body
) -> tuple[BodyParams, jax.Array, jax.Array]:
    """Flat [B, D] -> (BodyParams, cam_t [B,3], body_raw [B, body_dim]).

    decode_body maps the packed body segment to 63-dof axis-angle — identity
    when not using VPoser, the Flax decoder otherwise.
    """
    seg = unpack(settings, x)
    body_pose = decode_body(seg["body"])
    params = BodyParams(
        global_orient=seg["global_orient"],
        body_pose=body_pose,
        betas=seg["betas"],
        expression=seg["expression"],
        jaw_pose=seg["jaw"],
        leye_pose=seg["leye"],
        reye_pose=seg["reye"],
        left_hand_pose=seg["lhand"],
        right_hand_pose=seg["rhand"],
    )
    return params, seg["cam_t"], seg["body"]


def segment_mask(settings: FitSettings, names: list[str], dtype=jnp.float32) -> jax.Array:
    """[D] mask with ones over the named segments."""
    segs = settings.segments()
    mask = np.zeros(settings.dim, dtype=np.float32)
    for n in names:
        off, size = segs[n]
        mask[off : off + size] = 1.0
    return jnp.asarray(mask, dtype)


def camera_stage_mask(settings: FitSettings) -> jax.Array:
    """Stage 0 frees only camera translation + global orientation
    (reference fit_single_frame.py:469-473)."""
    return segment_mask(settings, ["cam_t", "global_orient"])


def body_stage_mask(settings: FitSettings) -> jax.Array:
    """Body stages free all body-model params + pose embedding, but NOT the
    camera (reference final_params, fit_single_frame.py:554-559), minus any
    group frozen via optim_shape/expression/jaw/hands."""
    names = ["global_orient", "body"]
    if settings.optim_shape:
        names.append("betas")
    if settings.optim_expression:
        names.append("expression")
    if settings.optim_jaw:
        names += ["jaw", "leye", "reye"]
    if settings.use_hands and settings.optim_hands:
        names += ["lhand", "rhand"]
    return segment_mask(settings, names)
