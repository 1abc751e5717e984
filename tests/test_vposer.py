"""VPoser v1 Flax port: shapes, rotation decoding, torch-ckpt conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplifyx_tpu.models.vposer import (
    VPoser, VPoserDecoder, VPoserEncoder, rot6d_to_rotmat,
    random_params, convert_torch_snapshot, LATENT_DIM, POSE_DIM,
)


class TestRot6D:
    def test_orthonormal(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        R = np.asarray(rot6d_to_rotmat(x))
        eye = np.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_identity_from_canonical(self):
        # First two identity-matrix columns -> identity rotation.  The 6D
        # layout is column-interleaved (torch view(-1, 3, 2) convention):
        # [a1x, a2x, a1y, a2y, a1z, a2z].
        x = jnp.asarray([[1, 0, 0, 1, 0, 0]], jnp.float32)
        R = np.asarray(rot6d_to_rotmat(x))[0]
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


class TestVPoser:
    def test_decode_shapes_and_range(self):
        vp = VPoser(random_params())
        # z must be nonzero: with zero Dense biases, z=0 gives a degenerate
        # all-zero 6D vector whose rotation is undefined.
        rng = np.random.default_rng(0)
        z = jnp.asarray(rng.normal(0, 1, (4, LATENT_DIM)), jnp.float32)
        pose = jax.jit(vp.decode)(z)
        assert pose.shape == (4, POSE_DIM)
        # axis-angle per joint has magnitude <= pi
        aa = np.asarray(pose).reshape(4, 21, 3)
        assert np.linalg.norm(aa, axis=-1).max() <= np.pi + 1e-4

    def test_encode_shapes(self):
        vp = VPoser(random_params())
        mu, sigma = jax.jit(vp.encode)(jnp.zeros((2, POSE_DIM)))
        assert mu.shape == (2, LATENT_DIM)
        assert sigma.shape == (2, LATENT_DIM)
        assert (np.asarray(sigma) > 0).all()

    def test_decode_is_deterministic_and_jittable(self):
        vp = VPoser(random_params())
        z = jnp.ones((1, LATENT_DIM)) * 0.3
        a = np.asarray(vp.decode(z))
        b = np.asarray(jax.jit(vp.decode)(z))
        # jit fuses differently (fma/reassociation); only ulp-level drift.
        np.testing.assert_allclose(a, b, atol=5e-5)

    def test_decode_grad_flows(self):
        vp = VPoser(random_params())
        g = jax.jit(jax.grad(lambda z: jnp.sum(vp.decode(z) ** 2)))(
            jnp.ones((1, LATENT_DIM)) * 0.1
        )
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestTorchConversion:
    def test_matches_torch_reference_impl(self):
        """Build a torch v1-style VPoser, convert, compare decode outputs."""
        torch = pytest.importorskip("torch")
        torch.manual_seed(0)

        fc1 = torch.nn.Linear(LATENT_DIM, 512)
        fc2 = torch.nn.Linear(512, 512)
        out = torch.nn.Linear(512, 21 * 6)

        state_dict = {
            "bodyprior_dec_fc1.weight": fc1.weight, "bodyprior_dec_fc1.bias": fc1.bias,
            "bodyprior_dec_fc2.weight": fc2.weight, "bodyprior_dec_fc2.bias": fc2.bias,
            "bodyprior_dec_out.weight": out.weight, "bodyprior_dec_out.bias": out.bias,
            # encoder (unused in this test but required by the converter)
            "bodyprior_enc_fc1.weight": torch.zeros(512, POSE_DIM),
            "bodyprior_enc_fc1.bias": torch.zeros(512),
            "bodyprior_enc_fc2.weight": torch.zeros(512, 512),
            "bodyprior_enc_fc2.bias": torch.zeros(512),
            "bodyprior_enc_mu.weight": torch.zeros(LATENT_DIM, 512),
            "bodyprior_enc_mu.bias": torch.zeros(LATENT_DIM),
            "bodyprior_enc_logvar.weight": torch.zeros(LATENT_DIM, 512),
            "bodyprior_enc_logvar.bias": torch.zeros(LATENT_DIM),
            "bodyprior_enc_bn1.weight": torch.ones(POSE_DIM),
            "bodyprior_enc_bn1.bias": torch.zeros(POSE_DIM),
            "bodyprior_enc_bn1.running_mean": torch.zeros(POSE_DIM),
            "bodyprior_enc_bn1.running_var": torch.ones(POSE_DIM),
            "bodyprior_enc_bn2.weight": torch.ones(512),
            "bodyprior_enc_bn2.bias": torch.zeros(512),
            "bodyprior_enc_bn2.running_mean": torch.zeros(512),
            "bodyprior_enc_bn2.running_var": torch.ones(512),
        }
        vp = VPoser(convert_torch_snapshot(state_dict))

        z = torch.randn(3, LATENT_DIM)
        with torch.no_grad():
            x = torch.nn.functional.leaky_relu(fc1(z), 0.2)
            x = torch.nn.functional.leaky_relu(fc2(x), 0.2)
            x6 = out(x).reshape(-1, 3, 2)
            # torch 6D -> rotmat (same construction)
            b1 = torch.nn.functional.normalize(x6[:, :, 0], dim=1)
            dot = torch.sum(b1 * x6[:, :, 1], dim=1, keepdim=True)
            b2 = torch.nn.functional.normalize(x6[:, :, 1] - dot * b1, dim=1)
            b3 = torch.cross(b1, b2, dim=1)
            R_torch = torch.stack([b1, b2, b3], dim=-1).reshape(3, 21, 3, 3)

        pose = np.asarray(jax.jit(vp.decode)(jnp.asarray(z.numpy())))
        # Compare induced rotations, not the (sign-ambiguous) axis-angle.
        from smplifyx_tpu.ops.rotation import batch_rodrigues
        R_ours = np.asarray(batch_rodrigues(jnp.asarray(pose.reshape(3, 21, 3))))
        np.testing.assert_allclose(R_ours, R_torch.numpy(), atol=2e-4)

    def test_encoder_bn_conversion(self):
        torch = pytest.importorskip("torch")
        torch.manual_seed(1)
        sd = {}
        for name, (o, i) in {
            "bodyprior_dec_fc1": (512, LATENT_DIM),
            "bodyprior_dec_fc2": (512, 512),
            "bodyprior_dec_out": (126, 512),
            "bodyprior_enc_fc1": (512, POSE_DIM),
            "bodyprior_enc_fc2": (512, 512),
            "bodyprior_enc_mu": (LATENT_DIM, 512),
            "bodyprior_enc_logvar": (LATENT_DIM, 512),
        }.items():
            sd[name + ".weight"] = torch.randn(o, i) * 0.05
            sd[name + ".bias"] = torch.randn(o) * 0.05
        for name, n in {"bodyprior_enc_bn1": POSE_DIM, "bodyprior_enc_bn2": 512}.items():
            sd[name + ".weight"] = torch.rand(n) + 0.5
            sd[name + ".bias"] = torch.randn(n) * 0.1
            sd[name + ".running_mean"] = torch.randn(n) * 0.1
            sd[name + ".running_var"] = torch.rand(n) + 0.5
        vp = VPoser(convert_torch_snapshot(sd))

        pose = torch.randn(2, POSE_DIM)
        with torch.no_grad():
            x = torch.nn.functional.batch_norm(
                pose, sd["bodyprior_enc_bn1.running_mean"],
                sd["bodyprior_enc_bn1.running_var"],
                sd["bodyprior_enc_bn1.weight"], sd["bodyprior_enc_bn1.bias"],
                training=False, eps=1e-5,
            )
            x = torch.nn.functional.leaky_relu(
                torch.nn.functional.linear(
                    x, sd["bodyprior_enc_fc1.weight"], sd["bodyprior_enc_fc1.bias"]
                ), 0.2)
            x = torch.nn.functional.batch_norm(
                x, sd["bodyprior_enc_bn2.running_mean"],
                sd["bodyprior_enc_bn2.running_var"],
                sd["bodyprior_enc_bn2.weight"], sd["bodyprior_enc_bn2.bias"],
                training=False, eps=1e-5,
            )
            x = torch.nn.functional.leaky_relu(
                torch.nn.functional.linear(
                    x, sd["bodyprior_enc_fc2.weight"], sd["bodyprior_enc_fc2.bias"]
                ), 0.2)
            mu_torch = torch.nn.functional.linear(
                x, sd["bodyprior_enc_mu.weight"], sd["bodyprior_enc_mu.bias"]
            )
        mu, sigma = jax.jit(vp.encode)(jnp.asarray(pose.numpy()))
        np.testing.assert_allclose(np.asarray(mu), mu_torch.numpy(), atol=2e-5)
