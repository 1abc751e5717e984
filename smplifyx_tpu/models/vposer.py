"""VPoser v1 (the SMPLify-X pose VAE) in Flax, with torch-ckpt conversion.

The reference drives the external `human_body_prior` package: latent-space
body-pose optimization decodes z -> 21-joint axis-angle in every closure
eval (smplifyx/fitting.py:236-238), the latent is initialized by encoding the
regression-prior pose (fit_single_frame.py:241-249), and `load_vposer` reads
a torch snapshot checkpoint.

Architecture (v1 'snapshot' generation):
  encoder:  BN(63) -> leaky_relu(fc 63->512) -> BN(512) -> dropout ->
            leaky_relu(fc 512->512) -> (mu, softplus(logvar)) heads (32)
  decoder:  leaky_relu(fc 32->512) -> dropout -> leaky_relu(fc 512->512) ->
            fc 512->21*6 -> continuous-6D -> rotation matrices -> axis-angle

Inference runs with BN in running-stats mode and dropout disabled — i.e. a
deterministic pure function, which is what the fitting energy needs.

`convert_torch_snapshot` maps a human_body_prior v1 state_dict into these
parameters so real checkpoints load when the user provides one;
`random_params` builds a structurally identical random network for tests.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from smplifyx_tpu.ops.rotation import rotmat_to_aa

LATENT_DIM = 32
NUM_NEURONS = 512
NUM_JOINTS = 21
POSE_DIM = NUM_JOINTS * 3


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """Continuous 6D rotation representation -> [..., 3, 3] (Zhou et al.;
    the reference's ContinousRotReprDecoder)."""
    x = x.reshape(*x.shape[:-1], 3, 2)
    a1, a2 = x[..., 0], x[..., 1]
    # Smooth eps-in-sqrt norms, NOT norm().clip(): clip saves the VALUE at
    # a degenerate input but the gradient of ||a|| at a = 0 is 0/0 = NaN,
    # which poisoned whole fits through the optimizer's free coordinates.
    def _safe_normalize(v):
        return v * jax.lax.rsqrt(
            jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)

    b1 = _safe_normalize(a1)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _safe_normalize(a2 - a2_proj)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


class VPoserDecoder(nn.Module):
    """z [B, 32] -> body pose axis-angle [B, 63]."""

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        x = nn.leaky_relu(nn.Dense(NUM_NEURONS, name="fc1")(z), 0.2)
        x = nn.leaky_relu(nn.Dense(NUM_NEURONS, name="fc2")(x), 0.2)
        x = nn.Dense(NUM_JOINTS * 6, name="out")(x)
        rotmats = rot6d_to_rotmat(x.reshape(-1, NUM_JOINTS, 6))
        aa = rotmat_to_aa(rotmats)
        return aa.reshape(-1, POSE_DIM)


class VPoserEncoder(nn.Module):
    """pose [B, 63] -> (mu [B, 32], sigma [B, 32]); BN in inference mode."""

    @nn.compact
    def __call__(self, pose: jax.Array) -> tuple[jax.Array, jax.Array]:
        x = pose.reshape(pose.shape[0], -1)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = nn.leaky_relu(nn.Dense(NUM_NEURONS, name="fc1")(x), 0.2)
        x = nn.BatchNorm(use_running_average=True, name="bn2")(x)
        x = nn.leaky_relu(nn.Dense(NUM_NEURONS, name="fc2")(x), 0.2)
        mu = nn.Dense(LATENT_DIM, name="mu")(x)
        logvar = nn.Dense(LATENT_DIM, name="logvar")(x)
        return mu, jax.nn.softplus(logvar)


class VPoser:
    """Bundled encoder/decoder with bound params (a convenience wrapper;
    the underlying functions stay pure)."""

    def __init__(self, params: Dict[str, Any]):
        self.params = params
        self._dec = VPoserDecoder()
        self._enc = VPoserEncoder()

    def decode(self, z: jax.Array) -> jax.Array:
        """z [..., 32] -> axis-angle pose [..., 63]."""
        flat = z.reshape(-1, LATENT_DIM)
        out = self._dec.apply({"params": self.params["decoder"]}, flat)
        return out.reshape(*z.shape[:-1], POSE_DIM)

    def encode(self, pose: jax.Array) -> tuple[jax.Array, jax.Array]:
        """pose [..., 63] -> (mu, sigma) [..., 32]."""
        flat = pose.reshape(-1, POSE_DIM)
        variables = {
            "params": self.params["encoder"],
            "batch_stats": self.params["encoder_stats"],
        }
        mu, sigma = self._enc.apply(variables, flat)
        return (mu.reshape(*pose.shape[:-1], LATENT_DIM),
                sigma.reshape(*pose.shape[:-1], LATENT_DIM))

    def encode_mean(self, pose: jax.Array) -> jax.Array:
        return self.encode(pose)[0]


def random_params(seed: int = 0) -> Dict[str, Any]:
    """Random, structurally-complete VPoser params for tests."""
    dec = VPoserDecoder().init(
        jax.random.PRNGKey(seed), jnp.zeros((1, LATENT_DIM))
    )["params"]
    enc_vars = VPoserEncoder().init(
        jax.random.PRNGKey(seed + 1), jnp.zeros((1, POSE_DIM))
    )
    return {
        "decoder": dec,
        "encoder": enc_vars["params"],
        "encoder_stats": enc_vars["batch_stats"],
    }


# torch state_dict name -> (tree path), weights transposed for Dense.
_DECODER_MAP = {
    "bodyprior_dec_fc1": "fc1",
    "bodyprior_dec_fc2": "fc2",
    "bodyprior_dec_out": "out",
}
_ENCODER_MAP = {
    "bodyprior_enc_fc1": "fc1",
    "bodyprior_enc_fc2": "fc2",
    "bodyprior_enc_mu": "mu",
    "bodyprior_enc_logvar": "logvar",
}
_BN_MAP = {"bodyprior_enc_bn1": "bn1", "bodyprior_enc_bn2": "bn2"}


def convert_torch_snapshot(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a human_body_prior v1 snapshot state_dict (torch tensors or numpy
    arrays) into this module's parameter pytree."""
    def arr(v):
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, jnp.float32)

    decoder, encoder, stats = {}, {}, {}
    for tname, fname in _DECODER_MAP.items():
        decoder[fname] = {
            "kernel": arr(state_dict[tname + ".weight"]).T,
            "bias": arr(state_dict[tname + ".bias"]),
        }
    for tname, fname in _ENCODER_MAP.items():
        encoder[fname] = {
            "kernel": arr(state_dict[tname + ".weight"]).T,
            "bias": arr(state_dict[tname + ".bias"]),
        }
    for tname, fname in _BN_MAP.items():
        encoder[fname] = {
            "scale": arr(state_dict[tname + ".weight"]),
            "bias": arr(state_dict[tname + ".bias"]),
        }
        stats[fname] = {
            "mean": arr(state_dict[tname + ".running_mean"]),
            "var": arr(state_dict[tname + ".running_var"]),
        }
    return {"decoder": decoder, "encoder": encoder, "encoder_stats": stats}


def load_vposer(ckpt_path: str) -> VPoser:
    """Load a torch snapshot checkpoint (reference load_vposer equivalent,
    fit_single_frame.py:241)."""
    import torch

    sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return VPoser(convert_torch_snapshot(sd))
