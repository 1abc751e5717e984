"""Trace ONE collision-stage dispatch (bench_collision split mode, stage k)
and aggregate ALL device-op durations by base name.

Answers "where do the ~4 s of a 30-iteration collision stage at B=64 go":
broad-phase build ops vs per-eval narrow/cone ops vs LBS vs line-search
bookkeeping vs idle (wall - sum(ops)).

Usage: python tools/trace_collstage.py [B] [iters] [aux_every] [ls_mode] [k]
"""
import glob
import gzip
import json
import os.path as osp
import re
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

_OP = re.compile(r"^[a-z][a-z0-9_\-]*(\.\d+)?$")
_PROG = re.compile(r"^jit_")


def main(B, iters, aux_every, ls_mode, k):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    import bench_collision
    from smplifyx_tpu.fitting.pipeline import fit_batch

    (jax, jnp, model, settings, frames, x0, joint_map, joints_model,
     collision_fn, schedule, options) = bench_collision.build(
        B, iters, aux_every, "iter", ls_mode, 0)

    def head_sched():
        return jtu.tree_map(lambda a: a[0:1], schedule)

    def stage_sched(j):
        return jtu.tree_map(lambda a: a[j:j + 1], schedule)

    fit_head = jax.jit(lambda m, jm, fr, x: fit_batch(
        m, settings, options, head_sched(), fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(False,)))
    opt_body = options.replace(camera_stage=False)
    fit_stage = jax.jit(lambda m, jm, fr, x, w: fit_batch(
        m, settings, opt_body, w, fr, x, lambda b: b, joint_map,
        edge_idxs=jnp.asarray([[5, 12], [2, 9]]), joints_model=jm,
        collision_fn=collision_fn, coll_stage_mask=(True,)))

    model = jax.device_put(model)
    joints_model = jax.device_put(joints_model)
    _ = np.asarray(jnp.zeros(()))  # true-sync dispatch mode

    res = fit_head(model, joints_model, frames, x0)
    jax.block_until_ready(res.loss)
    x = res.x
    # warm up the stage program
    res = fit_stage(model, joints_model, frames, x, stage_sched(k))
    jax.block_until_ready(res.loss)

    logdir = "/tmp/trace_collstage"
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    res = fit_stage(model, joints_model, frames, x, stage_sched(k))
    jax.block_until_ready(res.loss)
    _ = np.asarray(res.loss[0])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    ev = np.asarray(res.stage_evals)[0]
    print(f"wall {wall:.2f} s   evals mean {ev.mean():.1f} max {ev.max()}")

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    files.sort(key=osp.getmtime)
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)

    agg = defaultdict(lambda: [0.0, 0])
    meta = {}
    prog_ms = 0.0
    total = 0.0
    for evt in tr.get("traceEvents", []):
        if evt.get("ph") != "X":
            continue
        name = evt.get("name", "")
        dur = evt.get("dur", 0) / 1e3
        if _PROG.match(name):
            prog_ms = max(prog_ms, dur)
            continue
        if not _OP.match(name):
            continue
        base = name.split(".")[0]
        agg[base][0] += dur
        agg[base][1] += 1
        total += dur
        a = evt.get("args", {}) or {}
        info = a.get("long_name") or a.get("tf_op") or ""
        if info and base not in meta:
            meta[base] = str(info)[:130]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
    print(f"program event: {prog_ms:.1f} ms")
    for name, (ms, n) in rows:
        print(f"{ms:9.2f} ms  x{n:<6d} {name}  {meta.get(name, '')}")
    print(f"{total:9.2f} ms  TOTAL op events   (wall {wall*1e3:.0f} ms -> "
          f"idle/untraced {wall*1e3-total:.0f} ms)")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64,
         int(a[1]) if len(a) > 1 else 30,
         int(a[2]) if len(a) > 2 else 8,
         a[3] if len(a) > 3 else "armijo",
         int(a[4]) if len(a) > 4 else 2)
