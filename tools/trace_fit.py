"""Trace the WHOLE flagship fit program (collision-off, bench problem) and
aggregate device-op durations — where does the ~1 s/batch at B=128 go?

Usage: python tools/trace_fit.py [B]
"""
import glob
import gzip
import json
import os.path as osp
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

_OP = re.compile(r"^[a-z][a-z0-9_\-]*(\.\d+)?$")  # HLO op event names
_PROG = re.compile(r"^jit_")


def main(B):
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
    # EXACTLY bench.py's program so the persistent compile cache hits.
    schedule = build_stage_schedule(
        body_pose_prior_weights=[4.04e2, 57.4, 4.78],
        shape_weights=[1e2, 1e1, 0.5e1],
        expr_weights=[1e2, 1e1, 0.5e1],
        hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0])
    options = FitOptions(
        lbfgs=LBFGSConfig(max_iters=60, history=16, ftol=1e-9, gtol=1e-9,
                          ls_soft_accept=6),
        camera_lbfgs=LBFGSConfig(max_iters=30, history=8, ls_soft_accept=6))
    fit = jax.jit(lambda m, jm, fr, x: fit_batch(
        m, settings, options, schedule, fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm))
    model = jax.device_put(model)
    joints_model = jax.device_put(joints_model)
    _ = np.asarray(jnp.zeros(()))  # true-sync dispatch mode
    res = fit(model, joints_model, frames, x0)
    jax.block_until_ready(res.loss)

    logdir = "/tmp/trace_fit"
    jax.profiler.start_trace(logdir)
    res = fit(model, joints_model, frames, x0)
    jax.block_until_ready(res.loss)
    _ = np.asarray(res.loss[0])
    jax.profiler.stop_trace()

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    files.sort(key=osp.getmtime)
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)

    agg = defaultdict(lambda: [0.0, 0])
    prog_ms = 0.0
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3
        if _PROG.match(name):
            prog_ms = max(prog_ms, dur)
            continue
        if not _OP.match(name):
            continue
        # collapse numeric suffixes so repeated loop ops aggregate
        base = name.split(".")[0]
        agg[base][0] += dur
        agg[base][1] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
    print(f"program event: {prog_ms:.1f} ms")
    for name, (ms, n) in rows:
        print(f"{ms:9.2f} ms  x{n:<6d} {name}")
    print(f"{total:9.2f} ms  TOTAL op events")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
