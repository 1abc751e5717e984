"""Break down the collision broad-phase build cost at batch B.

Times each stage of candidate_pairs cumulatively (sort, level0, level1,
level2, final compactions) by building truncated variants.

Usage: python tools/profile_build.py [B]
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

    from smplifyx_tpu.ops import collision as C

    V, F = 10475, 20908
    rng = np.random.default_rng(7)
    verts = jnp.asarray(rng.normal(0, 0.3, (B, V, 3)), jnp.float32)
    faces = jnp.asarray(rng.integers(0, V, size=(F, 3)).astype(np.int32))
    segm, parents = C.synthetic_part_segm(F, num_parts=27, seed=0)
    _ = np.asarray(verts[0, 0])  # sync mode

    _BLK, _SUP = C._BLK, C._SUP
    nb = -(-F // _BLK)
    Fp = nb * _BLK
    ns = -(-nb // _SUP)
    Ps, Pb, Ph, P = 8192, 28672, 4096, 4096

    def tris_aabb(v):
        tris = v[faces]
        return jnp.min(tris, axis=1), jnp.max(tris, axis=1)

    t = timeit(jax.jit(jax.vmap(lambda v: sum(
        jnp.sum(a) for a in tris_aabb(v)))), verts) * 1e3
    print(f"B={B} aabb           : {t:7.1f} ms", flush=True)

    def morton_sorted(v):
        amin, amax = tris_aabb(v)
        cent = 0.5 * (amin + amax)
        lo = jnp.min(cent, axis=0)
        span = jnp.maximum(jnp.max(cent, axis=0) - lo, 1e-9)
        qc = jnp.clip((cent - lo) / span * 1023.0, 0.0, 1023.0)
        qi = qc.astype(jnp.uint32)
        code = (C._interleave3(qi[:, 0])
                | (C._interleave3(qi[:, 1]) << 1)
                | (C._interleave3(qi[:, 2]) << 2))
        order = jnp.argsort(code)
        return amin, amax, order

    t = timeit(jax.jit(jax.vmap(lambda v: sum(
        jnp.sum(a) for a in morton_sorted(v)))), verts) * 1e3
    print(f"B={B} +morton sort   : {t:7.1f} ms", flush=True)

    def to_level0(v):
        amin, amax, order = morton_sorted(v)
        big = jnp.asarray(1e30, amin.dtype)
        pad = Fp - F
        amin_s = jnp.concatenate([amin[order], jnp.full((pad, 3), big)], 0)
        amax_s = jnp.concatenate([amax[order], jnp.full((pad, 3), -big)], 0)
        bmin = amin_s.reshape(nb, _BLK, 3).min(axis=1)
        bmax = amax_s.reshape(nb, _BLK, 3).max(axis=1)
        spad = ns * _SUP - nb
        smin = jnp.concatenate([bmin, jnp.full((spad, 3), big)], 0
                               ).reshape(ns, _SUP, 3).min(axis=1)
        smax = jnp.concatenate([bmax, jnp.full((spad, 3), -big)], 0
                               ).reshape(ns, _SUP, 3).max(axis=1)
        iu = jnp.arange(ns)
        ms = iu[:, None] <= iu[None, :]
        for k in range(3):
            ms &= (smin[:, k][:, None] <= smax[:, k][None, :]) \
                & (smax[:, k][:, None] >= smin[:, k][None, :])
        posS, validS = C._compact(ms.reshape(-1), Ps)
        return posS, validS

    t = timeit(jax.jit(jax.vmap(lambda v: sum(
        jnp.sum(a) for a in to_level0(v)))), verts) * 1e3
    print(f"B={B} +lvl0 compact  : {t:7.1f} ms", flush=True)

    # isolate: level-1-style row gathers ([Ps, 8] x 12) and the big top_k
    si = jnp.asarray(rng.integers(0, ns, size=(B, Ps)), jnp.int32)
    tbl = jnp.asarray(rng.normal(size=(B, ns, 8)), jnp.float32)

    t = timeit(jax.jit(lambda s, tb: jnp.sum(jax.vmap(
        lambda ss, tt: sum(tt[ss].sum() for _ in range(12)))(s, tb))),
        si, tbl) * 1e3
    print(f"B={B} 12x [Ps,8] gath: {t:7.1f} ms", flush=True)

    bi = jnp.asarray(rng.integers(0, nb, size=(B, Pb)), jnp.int32)
    tbl2 = jnp.asarray(rng.normal(size=(B, nb, 8)), jnp.float32)
    t = timeit(jax.jit(lambda s, tb: jnp.sum(jax.vmap(
        lambda ss, tt: sum(tt[ss].sum() for _ in range(12)))(s, tb))),
        bi, tbl2) * 1e3
    print(f"B={B} 12x [Pb,8] gath: {t:7.1f} ms", flush=True)

    mask = jnp.asarray(rng.random((B, Ps * 64)) < 0.05)
    t = timeit(jax.jit(lambda m: jnp.sum(jax.vmap(
        lambda mm: C._compact(mm, Pb)[0])(m))), mask) * 1e3
    print(f"B={B} topk 524k k=28k: {t:7.1f} ms", flush=True)

    mask2 = jnp.asarray(rng.random((B, Ph * 64)) < 0.05)
    t = timeit(jax.jit(lambda m: jnp.sum(jax.vmap(
        lambda mm: C._compact(mm, P)[0])(m))), mask2) * 1e3
    print(f"B={B} topk 262k k=4k : {t:7.1f} ms", flush=True)

    # full build, for reference
    cfn = C.make_collision_fn(faces, segm=segm, parents=parents,
                              max_pairs=P, max_block_pairs=Pb,
                              max_sup_pairs=Ps, max_hit_pairs=Ph)
    t = timeit(jax.jit(jax.vmap(lambda v: sum(
        jnp.sum(jnp.asarray(a, jnp.float32)) for a in cfn.build(v)))),
        verts) * 1e3
    print(f"B={B} full build     : {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
