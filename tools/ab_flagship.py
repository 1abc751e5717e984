"""Interleaved A/B benchmark of flagship (collision-off) fit configurations.

Tunnel timing variance between separate processes is large (round-3/4
sessions measured the SAME binary 10% apart minutes later), so this runs
every candidate config in ONE process and interleaves their timed rounds
(A, B, C, A, B, C, ...), reporting per-config median round time, fps, and
final-loss mean (the quality check: configs must agree with the baseline
loss to ~1e-3 relative or they are not viable bench configs).

Usage: python tools/ab_flagship.py [B] [rounds] [config ...]
  config grammar: name=ls_mode:max_evals[:max_iters[:warm]]   e.g.
    wolfe=wolfe:0  armijo=armijo:0  wolfe_me90=wolfe:90  warm=wolfe:0:60:warm
Defaults: B=128, rounds=5, configs = wolfe:0, armijo:0, wolfe:90.
"""
import json
import os.path as osp
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    a = sys.argv[1:]
    B = int(a[0]) if a else 128
    rounds = int(a[1]) if len(a) > 1 else 5
    specs = a[2:] or ["wolfe=wolfe:0", "armijo=armijo:0",
                      "wolfe_me90=wolfe:90"]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import bench
    from smplifyx_tpu.fitting.lbfgs import LBFGSConfig
    from smplifyx_tpu.fitting.pipeline import FitOptions, fit_batch
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.sparse import build_joints_model

    model, settings, frames, x0, joint_map = bench.build_problem(B)
    joints_model = build_joints_model(model)
    schedule = build_stage_schedule(
        body_pose_prior_weights=[4.04e2, 57.4, 4.78],
        shape_weights=[1e2, 1e1, 0.5e1], expr_weights=[1e2, 1e1, 0.5e1],
        hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0])

    fits = {}
    for spec in specs:
        name, rest = spec.split("=")
        parts = rest.split(":")
        ls_mode = parts[0]
        max_evals = int(parts[1]) if len(parts) > 1 else 0
        max_iters = int(parts[2]) if len(parts) > 2 else 60
        warm = len(parts) > 3 and parts[3] == "warm"
        options = FitOptions(
            lbfgs=LBFGSConfig(max_iters=max_iters, history=16, ftol=1e-9,
                              gtol=1e-9, ls_soft_accept=6, ls_mode=ls_mode,
                              max_evals=max_evals, warm_start_step=warm),
            camera_lbfgs=LBFGSConfig(max_iters=30, history=8,
                                     ls_soft_accept=6, warm_start_step=warm))
        fits[name] = jax.jit(
            lambda model, joints_model, frames, x0, options=options:
            fit_batch(model, settings, options, schedule, frames, x0,
                      lambda b: b, joint_map,
                      edge_idxs=jnp.asarray([[5, 12], [2, 9]]),
                      joints_model=joints_model))

    model = jax.device_put(model)
    joints_model = jax.device_put(joints_model)
    np.asarray(jnp.zeros(()))  # true-sync dispatch (docs/ARCHITECTURE.md)

    loss = {}
    evals = {}
    for name, fit in fits.items():  # compile + warmup
        t0 = time.perf_counter()
        res = fit(model, joints_model, frames, x0)
        jax.block_until_ready(res.loss)
        loss[name] = float(np.asarray(res.loss).mean())
        ev = np.asarray(res.stage_evals)
        evals[name] = [round(float(m), 1) for m in ev.mean(axis=1)]
        print(json.dumps({"config": name, "first_run_s":
                          round(time.perf_counter() - t0, 1)}), flush=True)

    times = {name: [] for name in fits}
    for r in range(rounds):
        for name, fit in fits.items():
            t0 = time.perf_counter()
            res = fit(model, joints_model, frames, x0)
            jax.block_until_ready(res.loss)
            times[name].append(time.perf_counter() - t0)
        print(json.dumps({"round": r, **{n: round(t[-1], 3)
                                         for n, t in times.items()}}),
              flush=True)

    base = specs[0].split("=")[0]
    for name in fits:
        med = statistics.median(times[name])
        print(json.dumps({
            "config": name, "B": B, "median_s": round(med, 3),
            "fps": round(B / med, 2),
            "loss_mean": loss[name],
            "loss_rel_vs_first": round(abs(loss[name] - loss[base])
                                       / abs(loss[base]), 6),
            "stage_evals_mean": evals[name],
        }), flush=True)


if __name__ == "__main__":
    main()
