"""Two-level one-hot matmul gather/scatter vs the native serial forms, with
a hi/lo split-factor (L) sweep, at collision-apply scale (R = 6*max_pairs =
24576 rows/lane over V = 10475 vertices).

This is the experiment behind ops/collision.py's apply path: TPU lowers
`vv[ii]` gathers and `.at[ii].add` scatters onto the serial scalar core
(~10 / ~41 ns per row-lane); rewriting both as
    id = hi * L + lo;  one_hot(lo) VPU broadcast + one_hot(hi) MXU matmul
vectorizes them.  Precision.HIGHEST on the contraction is f32-exact AND
faster than the default bf16 pass (the op is bandwidth-bound on the
[R, L*3] temp).  Measured on v5e at B=32: scatter 34.5 -> 5.5 ms, gather
8.3 -> 5.3 ms (L=128 best for both); full narrow-phase VJP 60.5 -> 9.0 ms.

Usage: python tools/profile_onehot.py [gather|scatter|both] [B]
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


def split3(x):
    """f32 -> three bf16 arrays whose f32 sum reconstructs x BIT-EXACTLY.

    hi/mid take the top 2x~9 mantissa bits; the residual has <= 8
    significant bits left (f32 mantissa is 24), so bf16 holds it exactly.
    A one-hot matmul against the three parts with f32 accumulation then
    reproduces Precision.HIGHEST results at single-pass bf16 MXU speed
    (3 passes vs HIGHEST's 6)."""
    import jax.numpy as jnp

    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def run_scatter(B):
    import jax
    import jax.numpy as jnp

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
    print(f"scatter B={B} serial    : {t:7.2f} ms", flush=True)

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
        err = float(jnp.max(jnp.abs(jfn(ids, cts) - want)))
        ms = timeit(lambda i, c: jnp.sum(jfn(i, c)), ids, cts) * 1e3
        print(f"scatter B={B} mm L={L:<4}: {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)

        def mm3(ii, cc, L=L, H=H, Vp=Vp, iota_h=iota_h, iota_l=iota_l):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = (hi[:, None] == iota_h[None, :]).astype(jnp.bfloat16)
            tmp = (oh_lo[:, :, None] * cc[:, None, :]).reshape(R, L * 3)
            out = 0.0
            for part in split3(tmp):
                out += jnp.einsum("ph,pf->hf", oh_hi, part,
                                  preferred_element_type=jnp.float32)
            return out.reshape(Vp, 3)[:V]

        jfn = jax.jit(lambda i, c: jax.vmap(mm3)(i, c))
        err = float(jnp.max(jnp.abs(jfn(ids, cts) - want)))
        ms = timeit(lambda i, c: jnp.sum(jfn(i, c)), ids, cts) * 1e3
        print(f"scatter B={B} m3 L={L:<4}: {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)


def run_gather(B):
    import jax
    import jax.numpy as jnp

    V, R = 10475, 24576
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, size=(B, R)), jnp.int32)
    verts = jnp.asarray(rng.normal(size=(B, V, 3)), jnp.float32)
    _ = np.asarray(verts[0, 0])  # sync mode

    want = jax.jit(jax.vmap(lambda vv, ii: vv[ii]))(verts, ids)

    t = timeit(jax.jit(lambda v, i: jnp.sum(
        jax.vmap(lambda vv, ii: vv[ii])(v, i))), verts, ids) * 1e3
    print(f"gather  B={B} serial    : {t:7.2f} ms", flush=True)

    for L in (32, 64, 128):
        H = -(-V // L)
        Vp = H * L
        iota_l = jnp.arange(L, dtype=jnp.int32)

        def mm(vv, ii, L=L, H=H, Vp=Vp, iota_l=iota_l):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = jax.nn.one_hot(hi, H, dtype=jnp.float32)
            vr = jnp.concatenate(
                [vv, jnp.zeros((Vp - V, 3), jnp.float32)]).reshape(H, L * 3)
            tmp = jnp.einsum("rh,hf->rf", oh_hi, vr,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(tmp.reshape(R, L, 3) * oh_lo[:, :, None], axis=1)

        jfn = jax.jit(lambda v, i: jax.vmap(mm)(v, i))
        err = float(jnp.max(jnp.abs(jfn(verts, ids) - want)))
        ms = timeit(lambda v, i: jnp.sum(jfn(v, i)), verts, ids) * 1e3
        print(f"gather  B={B} mm L={L:<4}: {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)

        def mm3(vv, ii, L=L, H=H, Vp=Vp, iota_l=iota_l):
            hi, lo = ii // L, ii % L
            oh_lo = (lo[:, None] == iota_l[None, :]).astype(jnp.float32)
            oh_hi = jax.nn.one_hot(hi, H, dtype=jnp.bfloat16)
            vr = jnp.concatenate(
                [vv, jnp.zeros((Vp - V, 3), jnp.float32)]).reshape(H, L * 3)
            tmp = 0.0
            for part in split3(vr):
                tmp += jnp.einsum("rh,hf->rf", oh_hi, part,
                                  preferred_element_type=jnp.float32)
            return jnp.sum(tmp.reshape(R, L, 3) * oh_lo[:, :, None], axis=1)

        jfn = jax.jit(lambda v, i: jax.vmap(mm3)(v, i))
        err = float(jnp.max(jnp.abs(jfn(verts, ids) - want)))
        ms = timeit(lambda v, i: jnp.sum(jfn(v, i)), verts, ids) * 1e3
        print(f"gather  B={B} m3 L={L:<4}: {ms:7.2f} ms  maxerr {err:.2e}",
              flush=True)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if which in ("scatter", "both"):
        run_scatter(B)
    if which in ("gather", "both"):
        run_gather(B)
