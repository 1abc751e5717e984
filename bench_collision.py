"""Collision-on throughput bench: staged fit with the interpenetration term.

Usage: python bench_collision.py [B] [iters_per_stage] [coll_broad_every]
                                 [mono|split] [wolfe|armijo] [max_evals]

Companion to bench.py (which reports the flagship collision-off number):
SMPL-X-scale faces (20908 tris) + synthetic parts segmentation, 3-stage
schedule with collision active in stages 2-3 (the flagship preset's
semantics), Morton broad phase hoisted to every `coll_broad_every`-th
L-BFGS iteration.  Collision-enabled fits are HBM-bound at B<=32 per chip
(docs/ARCHITECTURE.md).

`split` mode runs the fit as SEPARATE dispatches — (camera + collision-off
stage) first, then one dispatch per collision stage (FitOptions
camera_stage=False resumes from the previous dispatch's x) — so each RPC
through a remote-TPU tunnel stays under the per-dispatch deadline.  The
computed result is the same program split at stage boundaries; steady-state
timing sums the dispatches.
"""
import json, sys, time
import numpy as np

def build(B, iters, aux_every, refresh, ls_mode="wolfe", max_evals=0,
          warm_start=False, max_ls=25):
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import bench
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.pipeline import FitOptions
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.sparse import build_joints_model
    from smplifyx_tpu.ops.collision import make_collision_fn, synthetic_part_segm

    model, settings, frames, x0, joint_map = bench.build_problem(B)
    joints_model = build_joints_model(model)
    rng = np.random.default_rng(7)
    F = 20908
    faces = rng.integers(0, model.num_verts, size=(F, 3)).astype(np.int32)
    segm, parents = synthetic_part_segm(F, num_parts=27, seed=0)
    import os
    collision_fn = make_collision_fn(
        jnp.asarray(faces), segm=segm, parents=parents,
        max_pairs=4096, sigma=1e-4, penalize_outside=False,
        max_tris=int(os.environ.get("BENCH_MAX_TRIS", "2048")))
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
                          ls_soft_accept=6, aux_every=aux_every,
                          ls_mode=ls_mode, max_evals=max_evals,
                          warm_start_step=warm_start, max_ls=max_ls),
        camera_lbfgs=LBFGSConfig(max_iters=10, history=8, ls_soft_accept=6),
        coll_broad_refresh=refresh)
    return (jax, jnp, model, settings, frames, x0, joint_map, joints_model,
            collision_fn, schedule, options)


def run_mono(B, iters, aux_every, refresh, ls_mode="wolfe", max_evals=0,
             warm_start=False, max_ls=25):
    from smplifyx_tpu.fitting.pipeline import fit_batch
    (jax, jnp, model, settings, frames, x0, joint_map, joints_model,
     collision_fn, schedule, options) = build(B, iters, aux_every, refresh,
                                              ls_mode, max_evals,
                                              warm_start, max_ls)
    fit = jax.jit(lambda m, jm, fr, x: fit_batch(
        m, settings, options, schedule, fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(False, True, True)))
    model = jax.device_put(model); joints_model = jax.device_put(joints_model)
    # Force true-sync dispatch: on the axon tunnel backend block_until_ready
    # does not actually wait until the process has performed one device->host
    # transfer; without this, timings can read up to ~200x too fast.
    _ = np.asarray(jnp.zeros(()))
    t0 = time.perf_counter()
    res = fit(model, joints_model, frames, x0)
    jax.block_until_ready(res.loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": "mono", "B": B, "first_run_s": round(dt, 1),
                      "fps": round(B / dt, 2)}), flush=True)
    t0 = time.perf_counter()
    res = fit(model, joints_model, frames, x0)
    jax.block_until_ready(res.loss)
    dt = time.perf_counter() - t0
    ev = np.asarray(res.stage_evals)
    print(json.dumps({"mode": "mono", "B": B, "steady_s": round(dt, 2),
                      "fps": round(B / dt, 2),
                      "loss_mean": float(np.asarray(res.loss).mean()),
                      "stage_evals_mean": [round(float(m), 1)
                                           for m in ev.mean(axis=1)],
                      "stage_evals_max": [int(m) for m in ev.max(axis=1)]}),
          flush=True)
    return B / dt


def run_split(B, iters, aux_every, refresh, ls_mode="wolfe", max_evals=0,
              warm_start=False, max_ls=25):
    import jax.tree_util as jtu
    from smplifyx_tpu.fitting.pipeline import fit_batch
    (jax, jnp, model, settings, frames, x0, joint_map, joints_model,
     collision_fn, schedule, options) = build(B, iters, aux_every, refresh,
                                              ls_mode, max_evals,
                                              warm_start, max_ls)

    def head_sched():
        return jtu.tree_map(lambda a: a[0:1], schedule)

    def stage_sched(k):
        return jtu.tree_map(lambda a: a[k:k + 1], schedule)

    # dispatch 1: camera + stage 0 (collision off -> sparse energy)
    fit_head = jax.jit(lambda m, jm, fr, x: fit_batch(
        m, settings, options, head_sched(), fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(False,)))
    # dispatches 2..S: one collision stage each, no camera re-fit
    opt_body = options.replace(camera_stage=False)
    fit_stage = jax.jit(lambda m, jm, fr, x, w: fit_batch(
        m, settings, opt_body, w, fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(True,)))

    model = jax.device_put(model); joints_model = jax.device_put(joints_model)
    _ = np.asarray(jnp.zeros(()))  # true-sync dispatch mode (see run_mono)

    def one_round():
        times, evals = [], []
        t0 = time.perf_counter()
        res = fit_head(model, joints_model, frames, x0)
        jax.block_until_ready(res.loss)
        times.append(time.perf_counter() - t0)
        evals.append(np.asarray(res.stage_evals)[0])
        x = res.x
        for k in (1, 2):
            t0 = time.perf_counter()
            res = fit_stage(model, joints_model, frames, x, stage_sched(k))
            jax.block_until_ready(res.loss)
            times.append(time.perf_counter() - t0)
            evals.append(np.asarray(res.stage_evals)[0])
            x = res.x
        return times, evals, res

    times, evals, res = one_round()   # compile + warmup
    print(json.dumps({"mode": "split", "B": B,
                      "first_run_s": [round(t, 1) for t in times]}),
          flush=True)
    times, evals, res = one_round()
    total = sum(times)
    print(json.dumps({"mode": "split", "B": B, "ls_mode": options.lbfgs.ls_mode,
                      "warm_start": options.lbfgs.warm_start_step,
                      "max_ls": options.lbfgs.max_ls,
                      "steady_s": [round(t, 2) for t in times],
                      "total_s": round(total, 2),
                      "fps": round(B / total, 2),
                      "loss_mean": float(np.asarray(res.loss).mean()),
                      "stage_evals_mean": [round(float(e.mean()), 1)
                                           for e in evals],
                      "stage_evals_max": [int(e.max()) for e in evals]}),
          flush=True)
    return B / total


if __name__ == "__main__":
    a = sys.argv[1:]
    B = int(a[0]) if a else 8
    iters = int(a[1]) if len(a) > 1 else 30
    aux_every = int(a[2]) if len(a) > 2 else 8
    mode = a[3] if len(a) > 3 else "mono"
    ls_mode = a[4] if len(a) > 4 else "wolfe"
    max_evals = int(a[5]) if len(a) > 5 else 0
    warm_start = len(a) > 6 and a[6] in ("warm", "warm1", "1", "true")
    max_ls = int(a[7]) if len(a) > 7 else 25
    refresh = "iter"
    runner = run_split if mode == "split" else run_mono
    ls_modes = ("wolfe", "armijo") if ls_mode == "both" else (ls_mode,)
    for ls in ls_modes:
        runner(B, iters, aux_every, refresh, ls, max_evals, warm_start,
               max_ls)
