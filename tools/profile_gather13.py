"""Two-level one-hot matmul GATHER with Precision.HIGHEST, L sweep, at
collision-apply scale (R=24576 rows/lane from V=10475).

Usage: python tools/profile_gather13.py [B]
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

    V, R = 10475, 24576
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, size=(B, R)), jnp.int32)
    verts = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)
    _ = np.asarray(verts[0, 0])  # sync mode

    want = jax.jit(jax.vmap(lambda vv, ii: vv[ii]))(verts, ids)

    t = timeit(jax.jit(lambda v, i: jnp.sum(
        jax.vmap(lambda vv, ii: vv[ii])(v, i))), verts, ids) * 1e3
    print(f"B={B} serial          : {t:7.2f} ms", flush=True)

    for L in (32, 64, 128):
        H = -(-V // L)
        Vp = H * L
        iota_h = jnp.arange(H, dtype=jnp.int32)
        iota_l = jnp.arange(L, dtype=jnp.int32)

        def mm(vv, ii, L=L, H=H, Vp=Vp, iota_h=iota_h, iota_l=iota_l):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = (hi[:, None] == iota_h[None, :]).astype(jnp.float32)
            vr = jnp.concatenate(
                [vv, jnp.zeros((Vp - V, 3), jnp.float32)]).reshape(H, L * 3)
            tmp = jnp.einsum("rh,hf->rf", oh_hi, vr,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(tmp.reshape(R, L, 3) * oh_lo[:, :, None], axis=1)

        jfn = jax.jit(lambda v, i: jax.vmap(mm)(v, i))
        got = jfn(verts, ids)
        err = float(jnp.max(jnp.abs(got - want)))
        ms = timeit(lambda v, i: jnp.sum(jfn(v, i)), verts, ids) * 1e3
        print(f"B={B} mm L={L:<4}       : {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
