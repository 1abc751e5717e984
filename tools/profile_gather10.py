"""Two-level one-hot (hi/lo split) matmul gather & scatter prototypes.

id = hi * L + lo, L = 128.
scatter: tmp[p, l*3+c] = onehot_lo[p, l] * g[p, c]   (VPU broadcast)
         out[hi, l*3+c] = onehot_hi[hi, p] @ tmp     (MXU)
gather:  tmp[p, l*3+c] = onehot_hi[p, :] @ vr[:, l*3+c]  (MXU)
         out[p, c] = sum_l onehot_lo[p, l] * tmp[p, l*3+c]  (VPU)

Usage: python tools/profile_gather10.py [B]
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

    L = 128
    V, P = 10496, 12288          # V padded to a multiple of L
    H = V // L                   # 82
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 10475, size=(B, P)), jnp.int32)
    cts = jnp.asarray(rng.normal(size=(B, P, 3)), jnp.float32)
    _ = np.asarray(verts[0, 0])  # sync mode

    def t(name, fn, *args, n=10):
        ms = timeit(jax.jit(fn), *args, n=n) * 1e3
        print(f"B={B} {name:<28}: {ms:8.2f} ms", flush=True)

    iota_h = jnp.arange(H, dtype=jnp.int32)
    iota_l = jnp.arange(L, dtype=jnp.int32)

    def mm_scatter(i, c):
        def one(ii, cc):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = (hi[:, None] == iota_h[None, :]).astype(jnp.float32)
            tmp = (oh_lo[:, :, None] * cc[:, None, :]).reshape(P, L * 3)
            out = jnp.einsum("ph,pf->hf", oh_hi, tmp,
                             preferred_element_type=jnp.float32)
            return out.reshape(H, L, 3).reshape(V, 3)
        return jnp.sum(jax.vmap(one)(i, c))
    t("mm_scatter", mm_scatter, ids, cts)

    def mm_gather(v, i):
        def one(vv, ii):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = (hi[:, None] == iota_h[None, :]).astype(jnp.float32)
            vr = vv.reshape(H, L * 3)
            tmp = jnp.einsum("ph,hf->pf", oh_hi, vr,
                             preferred_element_type=jnp.float32)
            out = jnp.sum(tmp.reshape(P, L, 3) * oh_lo[:, :, None], axis=1)
            return out
        return jnp.sum(jax.vmap(one)(v, i))
    t("mm_gather", mm_gather, verts, ids)

    # reference: serial gather / scatter
    t("serial_gather", lambda v, i: jnp.sum(
        jax.vmap(lambda vv, ii: vv[ii])(v, i)), verts, ids)
    t("serial_scatter", lambda i, c: jnp.sum(jax.vmap(
        lambda ii, cc: jnp.zeros((V, 3), jnp.float32).at[ii].add(cc)
    )(i, c)), ids, cts)

    # correctness spot check
    got = jax.jit(lambda i, c: jax.vmap(
        lambda ii, cc: jnp.einsum(
            "ph,pf->hf",
            (ii // L)[:, None] == iota_h[None, :],
            ((((ii % L)[:, None] == iota_l[None, :])[:, :, None])
             * cc[:, None, :]).reshape(P, L * 3),
            preferred_element_type=jnp.float32).reshape(V, 3))(i, c))(
        ids, cts)
    want = jax.jit(jax.vmap(
        lambda ii, cc: jnp.zeros((V, 3), jnp.float32).at[ii].add(cc)))(
        ids, cts)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"scatter max abs err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
