"""Collision-on throughput bench: staged fit with the interpenetration term.

Usage: python bench_collision.py [B] [iters_per_stage] [coll_broad_every]

Companion to bench.py (which reports the flagship collision-off number):
SMPL-X-scale faces (20908 tris) + synthetic parts segmentation, 3-stage
schedule with collision active in stages 2-3 (the flagship preset's
semantics), Morton broad phase hoisted to every `coll_broad_every`-th
L-BFGS iteration.  Collision-enabled fits are HBM-bound at B<=32 per chip
(docs/ARCHITECTURE.md); through the remote-TPU tunnel keep single
dispatches short (B*iters small) or they hit the RPC deadline.
"""
import json, sys, time
import numpy as np

def main(B, iters, aux_every, refresh):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import bench
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.sparse import build_joints_model
    from smplifyx_tpu.ops.collision import make_collision_fn, synthetic_part_segm

    model, settings, frames, x0, joint_map = bench.build_problem(B)
    joints_model = build_joints_model(model)
    rng = np.random.default_rng(7)
    F = 20908
    faces = rng.integers(0, model.num_verts, size=(F, 3)).astype(np.int32)
    segm, parents = synthetic_part_segm(F, num_parts=27, seed=0)
    collision_fn = make_collision_fn(
        jnp.asarray(faces), segm=segm, parents=parents,
        max_pairs=4096, sigma=1e-4, penalize_outside=False)
    schedule = build_stage_schedule(
        body_pose_prior_weights=[4.04e2, 57.4, 4.78],
        shape_weights=[1e2, 1e1, 0.5e1], expr_weights=[1e2, 1e1, 0.5e1],
        hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0],
        coll_loss_weights=[0.0, 0.1, 1.0])
    settings = settings.replace(interpenetration=True)
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=iters, history=16, ftol=1e-9, gtol=1e-9,
                          ls_soft_accept=6, aux_every=aux_every),
        camera_lbfgs=LBFGSConfig(max_iters=10, history=8, ls_soft_accept=6),
        coll_broad_refresh=refresh)
    fit = jax.jit(lambda m, jm, fr, x: fit_batch(
        m, settings, options, schedule, fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(False, True, True)))
    model = jax.device_put(model); joints_model = jax.device_put(joints_model)
    t0 = time.perf_counter()
    lowered = fit.lower(model, joints_model, frames, x0)
    print(json.dumps({"lowered_s": round(time.perf_counter()-t0, 1)}), flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(json.dumps({"compile_s": round(time.perf_counter()-t0, 1)}), flush=True)
    t0 = time.perf_counter()
    res = compiled(model, joints_model, frames, x0)
    import jax as j; j.block_until_ready(res.loss)
    dt = time.perf_counter() - t0
    loss = np.asarray(res.loss)
    print(json.dumps({"B": B, "iters": iters, "aux_every": aux_every,
                      "first_run_s": round(dt, 1),
                      "fps": round(B/dt, 2),
                      "loss_mean": float(loss.mean())}), flush=True)
    t0 = time.perf_counter()
    res = compiled(model, joints_model, frames, x0)
    j.block_until_ready(res.loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"steady_s": round(dt, 2), "fps": round(B/dt, 2)}), flush=True)

if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 8, int(a[1]) if len(a) > 1 else 30,
         int(a[2]) if len(a) > 2 else 8, a[3] if len(a) > 3 else "iter")
