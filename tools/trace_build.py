"""Real-profiler op breakdown of the collision broad-phase build.

jax.profiler.trace around the vmapped build at batch B, then aggregate
device-event durations by op name from the trace protobuf/JSON.  This is
the trustworthy alternative to the truncated-variant cumulative timings in
profile_build.py (XLA can DCE/refuse to split the real program the same
way; see docs/ARCHITECTURE.md "Timing methodology").

Usage: python tools/trace_build.py [B]
"""
import glob
import gzip
import json
import os.path as osp
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main(B):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from smplifyx_tpu.ops import collision as C

    V, F = 10475, 20908
    rng = np.random.default_rng(7)
    verts = jnp.asarray(rng.normal(0, 0.3, (B, V, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)).astype(np.int32))
    segm, parents = C.synthetic_part_segm(F, num_parts=27, seed=0)
    _ = np.asarray(verts[0, 0])  # true-sync dispatch mode

    cfn = C.make_collision_fn(faces, segm=segm, parents=parents,
                              max_pairs=4096)
    build = jax.jit(jax.vmap(cfn.build))
    out = build(verts)
    jax.block_until_ready(out)

    logdir = "/tmp/trace_build"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = build(verts)
    jax.block_until_ready(out)
    _ = np.asarray(out[2][0, 0])
    jax.profiler.stop_trace()

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    files.sort(key=osp.getmtime)
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    # Keep only device-lane complete events; aggregate by name.
    agg = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        args = ev.get("args", {}) or {}
        # device op events carry run ids / hlo categories; host python rows
        # have 'tid' names we can't see here, so filter on plausible op names
        if not name or name.startswith("Thread") or "tsl" in name:
            continue
        if not (name.startswith("fusion") or name.startswith("sort")
                or name.startswith("copy") or name.startswith("concatenate")
                or "fusion" in name):
            continue
        key = name
        agg[key] += dur
        total += dur
    meta = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("name") in agg:
            a = ev.get("args", {}) or {}
            info = a.get("long_name") or a.get("tf_op") or a.get(
                "source") or a.get("hlo_op") or ""
            if info:
                meta[ev["name"]] = str(info)[:160]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    for name, ms in rows:
        print(f"{ms/3:9.2f} ms  {name}  {meta.get(name, '')}")
    print(f"{total/3:9.2f} ms  TOTAL (all events /3 runs; includes host rows)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
