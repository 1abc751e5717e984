"""VPoser pose-grid renders: tile decoded body poses into one image.

Reference behavior covered: when `visualize` is on and VPoser drives the
body pose, the reference renders the current latent's decoded pose via
human_body_prior's `render_smpl_params` into a grid image
(`fit_single_frame.py:263-271` — `vposer.decode(...)` ->
`render_smpl_params(body_model, ...)` -> `imagearray2file`).  This module
reproduces that artifact with the repo's own software rasterizer
(viz/render.py) instead of pyrender: each pose is skinned on a neutral
body, rendered frontally on a white tile, and the tiles are packed
row-major into one uint8 image.

Batch-first on the accelerator: all N poses run through ONE
`smplx_forward` call (the [N, 63] batch is a single fused device program);
only the per-tile rasterization is host numpy, same as every other
offline render in viz/.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import numpy as np


def render_pose_grid(
    model,
    body_poses,                        # [N, 63] axis-angle body poses
    cols: Optional[int] = None,
    tile: int = 256,
    distance: float = 2.6,
    color: Sequence[float] = (0.65, 0.65, 0.8),
) -> np.ndarray:
    """Render each pose on a neutral-shape body; return [R*tile, C*tile, 3]
    uint8 grid (white background, row-major)."""
    import jax.numpy as jnp

    from smplifyx_tpu.models.forward import BodyParams, smplx_forward
    from smplifyx_tpu.ops.camera import CameraParams
    from smplifyx_tpu.viz.render import render_mesh_overlay

    body_poses = np.asarray(body_poses, np.float32).reshape(-1, 63)
    N = body_poses.shape[0]
    cols = cols or max(1, int(math.ceil(math.sqrt(N))))
    rows = int(math.ceil(N / cols))

    params = BodyParams.zeros(N).replace(body_pose=jnp.asarray(body_poses))
    out = smplx_forward(model, params, flat_hand_mean=True,
                        use_face_contour=False)
    verts = np.asarray(out.vertices)               # [N, V, 3]
    faces = np.asarray(model.faces)

    # Frontal pinhole camera; focal sized so a ~1.8 m body fills ~85% of
    # the tile at the given distance.
    focal = 0.85 * tile * distance / 1.8
    cam = CameraParams(
        rotation=jnp.eye(3),
        translation=jnp.asarray([0.0, 0.0, distance], jnp.float32),
        focal=jnp.asarray([focal, focal], jnp.float32),
        center=jnp.asarray([tile / 2.0, tile / 2.0], jnp.float32),
    )

    grid = np.full((rows * tile, cols * tile, 3), 255, np.uint8)
    for i in range(N):
        # Flip y (image y grows downward) and center on the pelvis so
        # every tile frames its body identically.
        v = verts[i] - verts[i].mean(axis=0, keepdims=True)
        v = v * np.asarray([1.0, -1.0, 1.0])
        img = render_mesh_overlay(None, v, faces, cam, color=color,
                                  img_size=(tile, tile))
        r, c = divmod(i, cols)
        grid[r * tile:(r + 1) * tile, c * tile:(c + 1) * tile] = img
    return grid


def render_latent_grid(
    model,
    decode: Callable,                  # [N, Z] -> [N, 63] (VPoser.decode)
    latents,                           # [N, Z]
    **kw,
) -> np.ndarray:
    """Decode VPoser latents and render the grid (the reference's
    `render_smpl_params(vposer.decode(z))` path)."""
    import jax.numpy as jnp

    poses = np.asarray(decode(jnp.asarray(np.asarray(latents, np.float32))))
    return render_pose_grid(model, poses, **kw)


def main(argv: Optional[list] = None) -> None:
    """CLI: sample latent poses from a seed and write a grid PNG.

    python -m smplifyx_tpu.viz.pose_grid out.png \
        [--n 9] [--seed 0] [--model-folder DIR | synthetic] [--tile 256]
    """
    import argparse

    from smplifyx_tpu.models.vposer import VPoser, load_vposer, random_params

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("out")
    p.add_argument("--n", type=int, default=9)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_folder", default=None,
                   help="SMPL-X artifact dir; synthetic geometry if absent")
    p.add_argument("--vposer_ckpt", default=None,
                   help="converted VPoser npz; random weights if absent")
    p.add_argument("--synthetic_num_verts", type=int, default=512)
    p.add_argument("--tile", type=int, default=256)
    a = p.parse_args(argv)

    if a.model_folder:
        from smplifyx_tpu.models.bodymodel import load_body_model

        model = load_body_model(a.model_folder, model_type="smplx")
    else:
        from smplifyx_tpu.models.bodymodel import synthetic_model

        model = synthetic_model(num_verts=a.synthetic_num_verts, seed=0)

    if a.vposer_ckpt:
        vp = load_vposer(a.vposer_ckpt)
    else:
        vp = VPoser(random_params(seed=a.seed))

    rng = np.random.default_rng(a.seed)
    z = rng.normal(0, 1, (a.n, 32)).astype(np.float32)
    grid = render_latent_grid(model, vp.decode, z, tile=a.tile)

    from PIL import Image

    Image.fromarray(grid).save(a.out)
    print(f"wrote {a.out} ({grid.shape[0]}x{grid.shape[1]})")


if __name__ == "__main__":
    main()
