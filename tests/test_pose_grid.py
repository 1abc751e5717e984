"""VPoser pose-grid render (reference fit_single_frame.py:263-271 parity:
render_smpl_params grid of decoded latent poses)."""

import numpy as np
import jax
import jax.numpy as jnp

from smplifyx_tpu.models.bodymodel import synthetic_model
from smplifyx_tpu.models.vposer import VPoser, random_params
from smplifyx_tpu.viz.pose_grid import render_latent_grid, render_pose_grid


class TestPoseGrid:
    def test_grid_shape_and_content(self):
        model = synthetic_model(num_verts=128, seed=0)
        rng = np.random.default_rng(0)
        poses = rng.normal(0, 0.2, (5, 63)).astype(np.float32)
        grid = render_pose_grid(model, poses, tile=64)
        # 5 poses -> ceil(sqrt(5)) = 3 cols, 2 rows
        assert grid.shape == (2 * 64, 3 * 64, 3)
        assert grid.dtype == np.uint8
        # Bodies actually rendered: tiles are not all white.
        assert (grid < 250).any()
        # The 6th (empty) tile stays white.
        assert (grid[64:, 2 * 64:] == 255).all()

    def test_latent_grid_decodes(self):
        model = synthetic_model(num_verts=128, seed=0)
        vp = VPoser(random_params())
        z = np.zeros((2, 32), np.float32) + 0.3
        grid = render_latent_grid(model, jax.jit(vp.decode), z, tile=48)
        assert grid.shape == (48, 2 * 48, 3)
        assert (grid < 250).any()

    def test_distinct_poses_render_distinct_tiles(self):
        model = synthetic_model(num_verts=128, seed=0)
        poses = np.zeros((2, 63), np.float32)
        poses[1, :3] = 1.2  # bend the first body joint hard
        grid = render_pose_grid(model, poses, tile=64, cols=2)
        a, b = grid[:, :64], grid[:, 64:]
        assert (a != b).any()
