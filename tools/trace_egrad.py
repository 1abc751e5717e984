"""Real-profiler op breakdown of one collision-stage energy+grad eval.

Same methodology as trace_build.py but around value_and_grad of the full
smplify energy with collision aux — the per-line-search-eval cost that
dominates collision-on stages (~5 evals/iter vs one broad-phase build per
8 iterations).

Usage: python tools/trace_egrad.py [B]
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

    import bench
    from smplifyx_tpu.fitting.energy import smplify_energy
    from smplifyx_tpu.fitting.params import body_params_from_flat
    from smplifyx_tpu.fitting.stages import build_stage_schedule
    from smplifyx_tpu.models.forward import smplx_forward
    from smplifyx_tpu.models.sparse import build_joints_model
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
        expr_weights=[1e2, 1e1, 0.5e1],
        hand_pose_prior_weights=[1e2, 1e1, 0.5e1],
        hand_joints_weights=[0.0, 0.0, 1.0],
        face_joints_weights=[0.0, 0.0, 1.0],
        coll_loss_weights=[0.0, 0.1, 1.0])
    import jax.tree_util as jtu
    w2 = jtu.tree_map(lambda a: a[2], schedule)

    model = jax.device_put(model)
    joints_model = jax.device_put(joints_model)
    _ = np.asarray(jnp.zeros(()))  # true-sync dispatch mode

    def verts_of(x):
        params, _, _ = body_params_from_flat(settings, x[None], lambda b: b)
        return smplx_forward(model, params, use_face_contour=True,
                             return_verts=True).vertices[0]

    V = jax.jit(jax.vmap(verts_of))(x0)
    aux = jax.jit(jax.vmap(cfn.build))(V)

    def energy_one(x, frame, aux1):
        return smplify_energy(
            x, settings, model, frame, w2, jnp.asarray(2), 3, lambda b: b,
            joint_map, collision_fn=cfn, joints_model=joints_model,
            collision_aux=aux1)

    eg_fn = jax.jit(jax.vmap(jax.value_and_grad(energy_one)))
    out = eg_fn(x0, frames, aux)
    jax.block_until_ready(out)

    logdir = "/tmp/trace_egrad"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = eg_fn(x0, frames, aux)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][0])
    jax.profiler.stop_trace()

    files = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
    files.sort(key=osp.getmtime)
    with gzip.open(files[-1], "rt") as f:
        tr = json.load(f)
    agg = defaultdict(float)
    total = 0.0
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if not (name.startswith("fusion") or name.startswith("sort")
                or name.startswith("copy") or name.startswith("concatenate")
                or "fusion" in name or name.startswith("convolution")
                or name.startswith("dot") or "custom-call" in name
                or name.startswith("dynamic")):
            continue
        agg[name] += ev.get("dur", 0) / 1e3
        total += ev.get("dur", 0) / 1e3
    meta = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("name") in agg:
            a = ev.get("args", {}) or {}
            info = a.get("long_name") or a.get("tf_op") or ""
            if info:
                meta[ev["name"]] = str(info)[:150]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    for name, ms in rows:
        print(f"{ms/3:9.2f} ms  {name}  {meta.get(name, '')}")
    print(f"{total/3:9.2f} ms  TOTAL device-op events /3 runs")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
