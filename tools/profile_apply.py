"""Micro-breakdown of the collision apply path at batch B.

Times (steady state, jit+vmap):
  * gather_f     : tri corner gather vertices[va] forward only
  * gather_vjp   : value_and_grad of sum(gathered) — isolates the
                   scatter-add VJP of the gather
  * cone_f       : cone penalty on pre-gathered triangles
  * cone_vjp     : grad of cone penalty w.r.t. the GATHERED triangles
  * apply_f      : full apply forward
  * apply_vjp    : grad of full apply w.r.t. vertices

Usage: python tools/profile_apply.py [B]
"""
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timeit(fn, *args, n=10):
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

    from smplifyx_tpu.ops.collision import (
        _cone_penalty_pairs, make_collision_fn, synthetic_part_segm,
    )

    V, F, P = 10475, 20908, 4096
    rng = np.random.default_rng(7)
    verts = jnp.asarray(rng.normal(0, 0.3, (B, V, 3)), jnp.float32)
    _ = np.asarray(verts[0, 0])  # force true-sync dispatch mode
    faces = rng.integers(0, V, size=(F, 3)).astype(np.int32)
    segm, parents = synthetic_part_segm(F, num_parts=27, seed=0)
    cfn = make_collision_fn(jnp.asarray(faces), segm=segm, parents=parents,
                            max_pairs=P, sigma=1e-4, penalize_outside=False)
    aux = jax.jit(jax.vmap(cfn.build))(verts)
    idx_a, idx_b, valid = aux  # since the corner-id hoist: va, vb, valid

    def gather_one(v, ia, ib):
        return v[ia], v[ib]

    g_f = jax.jit(jax.vmap(lambda v, ia, ib: sum(
        jnp.sum(t) for t in gather_one(v, ia, ib))))
    print(f"B={B} gather_f   : {timeit(g_f, verts, idx_a, idx_b)*1e3:.2f} ms",
          flush=True)

    g_vjp = jax.jit(jax.vmap(jax.grad(lambda v, ia, ib: sum(
        jnp.sum(t) for t in gather_one(v, ia, ib))), in_axes=(0, 0, 0)))
    print(f"B={B} gather_vjp : {timeit(g_vjp, verts, idx_a, idx_b)*1e3:.2f} ms",
          flush=True)

    ta, tb = jax.jit(jax.vmap(gather_one))(verts, idx_a, idx_b)

    c_f = jax.jit(jax.vmap(
        lambda a, b: jnp.sum(_cone_penalty_pairs(a, b, 1e-4, False))))
    print(f"B={B} cone_f     : {timeit(c_f, ta, tb)*1e3:.2f} ms", flush=True)

    c_vjp = jax.jit(jax.vmap(jax.grad(
        lambda a, b: jnp.sum(_cone_penalty_pairs(a, b, 1e-4, False)))))
    print(f"B={B} cone_vjp   : {timeit(c_vjp, ta, tb)*1e3:.2f} ms", flush=True)

    a_f = jax.jit(jax.vmap(cfn.apply))
    print(f"B={B} apply_f    : {timeit(a_f, verts, aux)*1e3:.2f} ms", flush=True)

    a_vjp = jax.jit(jax.vmap(jax.grad(cfn.apply), in_axes=(0, 0)))
    print(f"B={B} apply_vjp  : {timeit(a_vjp, verts, aux)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
