"""Sweep the hi/lo split factor L for the one-hot matmul scatter at the
collision-apply scale: R = 6 * max_pairs = 24576 rows/lane, V = 10475.

Usage: python tools/profile_gather12.py [B]
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
    cts = jnp.asarray(rng.normal(size=(B, R, 3)), jnp.float32)
    _ = np.asarray(cts[0, 0])  # sync mode

    want = jax.jit(jax.vmap(
        lambda ii, cc: jnp.zeros((V, 3), jnp.float32).at[ii].add(cc)))(
        ids, cts)

    t = timeit(jax.jit(lambda i, c: jnp.sum(jax.vmap(
        lambda ii, cc: jnp.zeros((V, 3), jnp.float32).at[ii].add(cc)
    )(i, c))), ids, cts) * 1e3
    print(f"B={B} serial          : {t:7.2f} ms", flush=True)

    for L in (32, 64, 128, 256):
        H = -(-V // L)
        Vp = H * L
        iota_h = jnp.arange(H, dtype=jnp.int32)
        iota_l = jnp.arange(L, dtype=jnp.int32)

        def mm(ii, cc, L=L, H=H, Vp=Vp, iota_h=iota_h, iota_l=iota_l):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = (hi[:, None] == iota_h[None, :]).astype(jnp.float32)
            tmp = (oh_lo[:, :, None] * cc[:, None, :]).reshape(R, L * 3)
            out = jnp.einsum("ph,pf->hf", oh_hi, tmp,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            return out.reshape(Vp, 3)[:V]

        jfn = jax.jit(lambda i, c: jax.vmap(mm)(i, c))
        got = jfn(ids, cts)
        err = float(jnp.max(jnp.abs(got - want)))
        ms = timeit(lambda i, c: jnp.sum(jfn(i, c)), ids, cts) * 1e3
        print(f"B={B} mm L={L:<4}       : {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
