"""Device-mesh parallelism for batched fitting.

The reference is strictly single-GPU, batch-size-1 (SURVEY.md §2: no
torch.distributed anywhere; `assert batch_size == 1` at
fit_single_frame.py:119).  The TPU framework's scaling axes:

  * **data**: frames are independent optimization problems — the batch
    dimension shards across chips with zero inter-chip traffic in the hot
    loop (each chip's L-BFGS while_loop runs on its own frames; the only
    collective is the loop-termination reduction XLA inserts, riding ICI).
  * **model**: for very large vertex counts the SMPL-X forward's big
    matmuls ([B,K]x[K,V*3] blendshapes, [V,J]x[B,J,16] skinning) shard the
    vertex dimension; XLA's SPMD partitioner inserts the all-gather /
    reduce-scatter for the joint-regressor contraction automatically from
    the sharding annotations (no hand-written collectives).

Everything goes through `jax.jit` + `NamedSharding` — the compiler owns the
communication schedule.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smplifyx_tpu.models.bodymodel import SMPLXModel


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """A ("data", "model") mesh; defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_frames(tree, mesh: Mesh):
    """Shard leading (batch) dim of every leaf over the data axis."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)


def shard_model(model: SMPLXModel, mesh: Mesh) -> SMPLXModel:
    """Vertex-shard the big model tensors over the model axis.

    v_template/shapedirs/exprdirs/lbs_weights shard dim 0 (V); posedirs
    shards its V*3 output dim; J_regressor shards its V input dim.  Index
    tables (faces, landmark/extra-vertex ids) stay replicated — they gather
    across shards, which XLA turns into all-gathers of the (small) gathered
    results.
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return model.replace(
        v_template=put(model.v_template, P("model", None)),
        shapedirs=put(model.shapedirs, P("model", None, None)),
        exprdirs=put(model.exprdirs, P("model", None, None)),
        posedirs=put(model.posedirs, P(None, "model")),
        J_regressor=put(model.J_regressor, P(None, "model")),
        lbs_weights=put(model.lbs_weights, P("model", None)),
        faces=replicate(model.faces, mesh),
        left_hand_components=replicate(model.left_hand_components, mesh),
        right_hand_components=replicate(model.right_hand_components, mesh),
        left_hand_mean=replicate(model.left_hand_mean, mesh),
        right_hand_mean=replicate(model.right_hand_mean, mesh),
        extra_joint_vids=replicate(model.extra_joint_vids, mesh),
        extra_lmk_matrix=put(model.extra_lmk_matrix, P(None, "model")),
        lmk_faces_idx=replicate(model.lmk_faces_idx, mesh),
        lmk_bary_coords=replicate(model.lmk_bary_coords, mesh),
        dyn_lmk_faces_idx=replicate(model.dyn_lmk_faces_idx, mesh),
        dyn_lmk_bary_coords=replicate(model.dyn_lmk_bary_coords, mesh),
    )


def fit_batch_sharded(
    mesh: Mesh,
    model: SMPLXModel,
    settings,
    options,
    stage_weights,
    frames,
    x0,
    decode_body,
    joint_map,
    shard_model_axis: bool = False,
    **kwargs,
):
    """Shard inputs over the mesh and run the jitted fit.

    Frames/params shard over "data"; the model is replicated (default) or
    vertex-sharded over "model".  The jit'd program is identical to the
    single-chip one — parallelism comes entirely from input shardings.
    """
    from smplifyx_tpu.fitting.pipeline import fit_batch

    frames = shard_frames(frames, mesh)
    x0 = shard_frames(x0, mesh)
    model = shard_model(model, mesh) if shard_model_axis else replicate(model, mesh)
    stage_weights = replicate(stage_weights, mesh)
    joint_map = replicate(joint_map, mesh)
    # Non-array kwargs (collision_fn callable, coll_stage_mask tuple, ...)
    # are trace-time statics — bind them into the jitted partial; array
    # kwargs replicate over the mesh and stay runtime arguments.
    static_kwargs = {
        k: v for k, v in kwargs.items()
        if not isinstance(v, jax.Array)
        and not any(isinstance(l, jax.Array)
                    for l in jax.tree_util.tree_leaves(v))
    }
    array_kwargs = {
        k: replicate(v, mesh) for k, v in kwargs.items()
        if k not in static_kwargs
    }

    fitted = jax.jit(
        partial(fit_batch, settings=settings, options=options,
                decode_body=decode_body, **static_kwargs)
    )
    return fitted(
        model, stage_weights=stage_weights, frames=frames, x0=x0,
        joint_map=joint_map, **array_kwargs,
    )
