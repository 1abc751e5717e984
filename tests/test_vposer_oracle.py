"""Independent VPoser v1 oracle: a from-scratch torch implementation of the
published human_body_prior v1 architecture, differential-tested against
models/vposer.py and its checkpoint converter.

The reference loads the real v1 snapshot at fit_single_frame.py:241-249 and
decodes the latent in every fitting closure (fitting.py:236-238) — this is
the geometry path of the classic preset.  tests/test_vposer.py's torch
"reference" was assembled from the same module-level description as the Flax
port, so a shared architecture-level misunderstanding would pass there.  The
oracle here is written independently of models/vposer.py:

  * the network is plain torch nn modules named and wired per the published
    v1 source (`train/vposer_smpl.py` in human_body_prior v1): BatchNorm1d /
    Linear / leaky_relu(0.2) / dropout(eval), the ContinousRotReprDecoder
    6D->rotmat Gram-Schmidt, and rotmat->axis-angle;
  * rotmat->axis-angle goes through scipy.spatial.transform.Rotation, NOT
    this repo's ops.rotation;
  * the state_dict fed to `convert_torch_snapshot` comes from torch's own
    Module.state_dict(), with randomized (non-trivial) BatchNorm running
    stats so a mean/var <-> scale/bias mapping mixup cannot cancel out.

Checked: decode (z -> aa pose) parity, encode (mu, sigma) parity, and the
converter round-trip on a full snapshot-style state_dict.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


LATENT_DIM = 32
NUM_NEURONS = 512
NUM_JOINTS = 21


class OracleContinousRotReprDecoder(nn.Module):
    """6D -> rotation matrices (Zhou et al.), per the published v1 module."""

    def forward(self, module_input):
        reshaped_input = module_input.view(-1, 3, 2)
        b1 = F.normalize(reshaped_input[:, :, 0], dim=1)
        dot_prod = torch.sum(b1 * reshaped_input[:, :, 1], dim=1,
                             keepdim=True)
        b2 = F.normalize(reshaped_input[:, :, 1] - dot_prod * b1, dim=-1)
        b3 = torch.cross(b1, b2, dim=1)
        return torch.stack([b1, b2, b3], dim=-1)


class OracleVPoser(nn.Module):
    """VPoser v1 ('snapshot' generation), written from the published
    human_body_prior v1 architecture: module names, layer sizes, activation
    order, and the continuous-6D decoder head."""

    def __init__(self, num_neurons=NUM_NEURONS, latentD=LATENT_DIM,
                 data_shape=(1, NUM_JOINTS, 3)):
        super().__init__()
        self.latentD = latentD
        n_features = int(np.prod(data_shape))
        self.num_joints = data_shape[1]

        self.bodyprior_enc_bn1 = nn.BatchNorm1d(n_features)
        self.bodyprior_enc_fc1 = nn.Linear(n_features, num_neurons)
        self.bodyprior_enc_bn2 = nn.BatchNorm1d(num_neurons)
        self.bodyprior_enc_fc2 = nn.Linear(num_neurons, num_neurons)
        self.bodyprior_enc_mu = nn.Linear(num_neurons, latentD)
        self.bodyprior_enc_logvar = nn.Linear(num_neurons, latentD)
        self.dropout = nn.Dropout(p=0.1, inplace=False)

        self.bodyprior_dec_fc1 = nn.Linear(latentD, num_neurons)
        self.bodyprior_dec_fc2 = nn.Linear(num_neurons, num_neurons)
        self.rot_decoder = OracleContinousRotReprDecoder()
        self.bodyprior_dec_out = nn.Linear(num_neurons, self.num_joints * 6)

    def encode(self, Pin):
        Xout = Pin.view(Pin.size(0), -1)
        Xout = self.bodyprior_enc_bn1(Xout)
        Xout = F.leaky_relu(self.bodyprior_enc_fc1(Xout), negative_slope=0.2)
        Xout = self.bodyprior_enc_bn2(Xout)
        Xout = self.dropout(Xout)
        Xout = F.leaky_relu(self.bodyprior_enc_fc2(Xout), negative_slope=0.2)
        return torch.distributions.normal.Normal(
            self.bodyprior_enc_mu(Xout),
            F.softplus(self.bodyprior_enc_logvar(Xout)),
        )

    def decode(self, Zin, output_type="matrot"):
        Xout = F.leaky_relu(self.bodyprior_dec_fc1(Zin), negative_slope=0.2)
        Xout = self.dropout(Xout)
        Xout = F.leaky_relu(self.bodyprior_dec_fc2(Xout), negative_slope=0.2)
        Xout = self.bodyprior_dec_out(Xout)
        Xout = self.rot_decoder(Xout)  # [B*21, 3, 3]
        if output_type == "aa":
            return _oracle_matrot2aa(Xout).reshape(-1, self.num_joints * 3)
        return Xout.view(-1, 1, self.num_joints, 9)


def _oracle_matrot2aa(rotmats: torch.Tensor) -> torch.Tensor:
    """Rotation matrices [N, 3, 3] -> axis-angle [N, 3] via scipy (an
    implementation independent of both torchgeometry and ops/rotation.py)."""
    from scipy.spatial.transform import Rotation

    return torch.from_numpy(
        Rotation.from_matrix(rotmats.detach().numpy())
        .as_rotvec().astype(np.float32)
    )


@pytest.fixture(scope="module")
def oracle_and_ours():
    """A randomly-initialized oracle (non-trivial BN stats) and our VPoser
    built from its state_dict through the production converter."""
    from smplifyx_tpu.models.vposer import VPoser, convert_torch_snapshot

    torch.manual_seed(7)
    oracle = OracleVPoser()
    # Randomize BN running stats: freshly-initialized stats (mean 0, var 1)
    # make the BN affine-only and would hide a mean<->bias or var<->scale
    # mapping error in the converter.
    with torch.no_grad():
        oracle.bodyprior_enc_bn1.running_mean.normal_(0.1, 0.3)
        oracle.bodyprior_enc_bn1.running_var.uniform_(0.5, 2.0)
        oracle.bodyprior_enc_bn2.running_mean.normal_(-0.2, 0.4)
        oracle.bodyprior_enc_bn2.running_var.uniform_(0.3, 3.0)
        # non-default affine too
        oracle.bodyprior_enc_bn1.weight.uniform_(0.5, 1.5)
        oracle.bodyprior_enc_bn1.bias.normal_(0, 0.2)
        oracle.bodyprior_enc_bn2.weight.uniform_(0.5, 1.5)
        oracle.bodyprior_enc_bn2.bias.normal_(0, 0.2)
    oracle.eval()
    ours = VPoser(convert_torch_snapshot(oracle.state_dict()))
    return oracle, ours


class TestDecodeParity:
    def test_aa_pose(self, oracle_and_ours):
        import jax.numpy as jnp

        oracle, ours = oracle_and_ours
        rng = np.random.default_rng(0)
        z = rng.normal(0, 1.0, (16, LATENT_DIM)).astype(np.float32)
        with torch.no_grad():
            ref = oracle.decode(torch.from_numpy(z), output_type="aa")
        got = np.asarray(ours.decode(jnp.asarray(z)))
        np.testing.assert_allclose(
            got, ref.numpy().reshape(16, -1), rtol=1e-4, atol=2e-4
        )

    def test_rotmats_match_before_aa(self, oracle_and_ours):
        """Pin the 6D head separately from the axis-angle conversion."""
        import jax.numpy as jnp

        from smplifyx_tpu.models.vposer import (
            VPoserDecoder, rot6d_to_rotmat,
        )

        oracle, ours = oracle_and_ours
        rng = np.random.default_rng(1)
        z = rng.normal(0, 1.0, (8, LATENT_DIM)).astype(np.float32)
        with torch.no_grad():
            ref_mats = oracle.decode(
                torch.from_numpy(z)).numpy().reshape(-1, 3, 3)

        # our decoder's pre-aa rotmats: re-run the raw 6D head
        x = jnp.asarray(z)
        p = ours.params["decoder"]
        h = jnp.maximum(0.2 * (x @ p["fc1"]["kernel"] + p["fc1"]["bias"]),
                        x @ p["fc1"]["kernel"] + p["fc1"]["bias"])
        h = jnp.maximum(0.2 * (h @ p["fc2"]["kernel"] + p["fc2"]["bias"]),
                        h @ p["fc2"]["kernel"] + p["fc2"]["bias"])
        out6 = h @ p["out"]["kernel"] + p["out"]["bias"]
        mats = np.asarray(
            rot6d_to_rotmat(out6.reshape(-1, NUM_JOINTS, 6))
        ).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            mats, ref_mats, rtol=1e-4, atol=2e-5
        )
        del VPoserDecoder  # imported for locality of reference only

    def test_aa_convention_across_angle_range(self, oracle_and_ours):
        """rotmat->aa agreement can hide at small angles; check rotations
        spread over (0, pi) by round-tripping our decode through scipy."""
        from scipy.spatial.transform import Rotation

        import jax.numpy as jnp

        oracle, ours = oracle_and_ours
        rng = np.random.default_rng(2)
        z = rng.normal(0, 3.0, (8, LATENT_DIM)).astype(np.float32)  # wilder
        with torch.no_grad():
            ref_mats = oracle.decode(
                torch.from_numpy(z)).numpy().reshape(-1, 3, 3)
        angles = np.linalg.norm(
            Rotation.from_matrix(ref_mats).as_rotvec(), axis=-1)
        assert angles.max() > 1.0, "test poses too tame to exercise aa"
        got = np.asarray(ours.decode(jnp.asarray(z))).reshape(-1, 3)
        ref_aa = Rotation.from_matrix(ref_mats).as_rotvec()
        np.testing.assert_allclose(got, ref_aa, rtol=1e-3, atol=1e-4)


class TestEncodeParity:
    def test_mu_sigma(self, oracle_and_ours):
        import jax.numpy as jnp

        oracle, ours = oracle_and_ours
        rng = np.random.default_rng(3)
        pose = rng.normal(0, 0.4, (16, NUM_JOINTS * 3)).astype(np.float32)
        with torch.no_grad():
            dist = oracle.encode(torch.from_numpy(pose))
        mu, sigma = ours.encode(jnp.asarray(pose))
        np.testing.assert_allclose(
            np.asarray(mu), dist.loc.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sigma), dist.scale.numpy(), rtol=1e-4, atol=1e-5
        )

    def test_bn_stats_actually_loaded(self, oracle_and_ours):
        """Guard against silently-default running stats: zeroing them in our
        converted tree must CHANGE the encoder output."""
        import jax.numpy as jnp
        import jax

        oracle, ours = oracle_and_ours
        from smplifyx_tpu.models.vposer import VPoser

        wiped = jax.tree_util.tree_map(lambda a: a, ours.params)
        wiped = {
            "decoder": wiped["decoder"],
            "encoder": wiped["encoder"],
            "encoder_stats": jax.tree_util.tree_map(
                jnp.zeros_like, wiped["encoder_stats"]
            ),
        }
        pose = jnp.asarray(
            np.random.default_rng(4).normal(0, 0.4, (4, 63)), jnp.float32
        )
        mu_real, _ = ours.encode(pose)
        mu_wiped, _ = VPoser(wiped).encode(pose)
        assert not np.allclose(np.asarray(mu_real), np.asarray(mu_wiped))


class TestSnapshotRoundtrip:
    def test_load_vposer_from_saved_checkpoint(self, oracle_and_ours,
                                               tmp_path):
        """The production loader path: torch.save(state_dict) ->
        load_vposer -> same decode as the oracle."""
        import jax.numpy as jnp

        from smplifyx_tpu.models.vposer import load_vposer

        oracle, _ = oracle_and_ours
        ckpt = tmp_path / "snapshot.pt"
        torch.save(oracle.state_dict(), str(ckpt))
        loaded = load_vposer(str(ckpt))
        rng = np.random.default_rng(5)
        z = rng.normal(0, 1.0, (4, LATENT_DIM)).astype(np.float32)
        with torch.no_grad():
            ref = oracle.decode(torch.from_numpy(z), output_type="aa")
        got = np.asarray(loaded.decode(jnp.asarray(z)))
        np.testing.assert_allclose(
            got, ref.numpy().reshape(4, -1), rtol=1e-4, atol=2e-4
        )
