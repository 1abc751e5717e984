"""Jitted wrappers for library entry points that tests would otherwise call
eagerly.

On the forced-CPU test backend, eager op-by-op dispatch of a full SMPL-X
forward costs ~1-12 s PER CALL (each tiny op compiles its own executable,
and conftest's per-module clear_caches() drops them); one whole-graph jit
compiles in a fraction of that and lands in the persistent compilation
cache (/tmp/jax_cache_tests), so repeat suite runs skip even that.
Semantics are identical — every wrapped function is pure.
"""

import jax

from smplifyx_tpu.models.forward import smplx_forward

jit_forward = jax.jit(
    smplx_forward,
    static_argnames=(
        "use_pca",
        "flat_hand_mean",
        "use_face_contour",
        "return_verts",
        "pose2rot",
    ),
)
