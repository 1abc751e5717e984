"""On-chip timing breakdown of the collision-stage energy components.

Times, at a given batch size, steady-state per-call wall clock of:
  * build   : vmapped broad phase (Morton sort -> 3-level compaction)
  * apply   : vmapped cone penalty on a fixed pair list (AABB recheck)
  * lbs     : full-mesh SMPL-X forward (what collision stages pay per eval)
  * energy  : full smplify_energy with collision_aux (one line-search eval)
  * egrad   : value_and_grad of that energy (the real per-eval cost)

Usage: python tools/profile_collision.py [B]
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(B):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import bench
    from smplifyx_tpu.fitting.energy import smplify_energy
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.forward import smplx_forward
    from smplifyx_tpu.models.sparse import build_joints_model
    from smplifyx_tpu.fitting.params import body_params_from_flat
    from smplifyx_tpu.ops.collision import make_collision_fn, synthetic_part_segm

    model, settings, frames, x0, joint_map = bench.build_problem(B)
    settings = settings.replace(interpenetration=True)
    joints_model = build_joints_model(model)
    rng = np.random.default_rng(7)
    F = 20908
    faces = rng.integers(0, model.num_verts, size=(F, 3)).astype(np.int32)
    segm, parents = synthetic_part_segm(F, num_parts=27, seed=0)
    cfn = make_collision_fn(jnp.asarray(faces), segm=segm, parents=parents,
                            max_pairs=4096, sigma=1e-4,
                            penalize_outside=False)
    schedule = build_stage_schedule(
        [4.04e2, 57.4, 4.78], shape_weights=[1e2, 1e1, 0.5e1],
        expr_weights=[1e2, 1e1, 0.5e1], hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0], face_joints_weights=[0.0, 0.0, 1.0],
        coll_loss_weights=[0.0, 0.1, 1.0])
    import jax.tree_util as jtu
    w2 = jtu.tree_map(lambda a: a[2], schedule)

    model = jax.device_put(model)
    joints_model = jax.device_put(joints_model)
    _ = np.asarray(jnp.zeros(()))  # force true-sync dispatch mode

    def verts_of(x):
        params, _, _ = body_params_from_flat(settings, x[None], lambda b: b)
        return smplx_forward(model, params, use_face_contour=True,
                             return_verts=True).vertices[0]

    verts_fn = jax.jit(jax.vmap(verts_of))
    V = verts_fn(x0)
    print(f"B={B} lbs+fwd: {timeit(verts_fn, x0)*1e3:.1f} ms", flush=True)

    build_fn = jax.jit(jax.vmap(cfn.build))
    aux = build_fn(V)
    print(f"B={B} build : {timeit(build_fn, V)*1e3:.1f} ms", flush=True)

    apply_fn = jax.jit(jax.vmap(cfn.apply))
    print(f"B={B} apply : {timeit(apply_fn, V, aux)*1e3:.1f} ms", flush=True)

    def energy_one(x, frame, aux1):
        return smplify_energy(
            x, settings, model, frame, w2, jnp.asarray(2), 3, lambda b: b,
            joint_map, collision_fn=cfn, joints_model=joints_model,
            collision_aux=aux1)

    e_fn = jax.jit(jax.vmap(energy_one))
    print(f"B={B} energy: {timeit(e_fn, x0, frames, aux)*1e3:.1f} ms",
          flush=True)

    eg_fn = jax.jit(jax.vmap(jax.value_and_grad(energy_one)))
    print(f"B={B} egrad : {timeit(eg_fn, x0, frames, aux)*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
