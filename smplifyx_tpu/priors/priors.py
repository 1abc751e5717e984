"""Pose/shape priors: max-of-Gaussians (GMM), L2, and the bending-angle prior.

Capability parity with reference smplifyx/prior.py:
  * MaxMixturePrior (prior.py:100-231): 8-component GMM over the 69-dim SMPL
    body pose; NLL ~ min over components of (0.5 quadratic - log nll_weight)
    where nll_weight = w_k / (const * sqrtdet_k / min sqrtdet)  (the "merged"
    path, prior.py:181-196).  Here the GMM is a pytree of precomputed arrays
    and the min-over-components is one batched einsum.
  * L2Prior (prior.py:92-97): sum of squares.
  * SMPLifyAnglePrior (prior.py:53-89): exp(theta * sign)^2 on elbows/knees,
    full-pose indices [55, 58, 12, 15] with signs [1, -1, -1, -1]; when the
    input pose excludes the global orient the indices shift by -3.

The reference loads gmm_08.pkl artifacts; `load_gmm_pickle` reads the same
format, and `synthetic_gmm` builds a structurally-identical random mixture for
tests/benchmarks (the licensed artifact does not ship with this repo).
"""

from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

# Elbow/knee flexion indices into the FULL pose vector (with global orient).
ANGLE_PRIOR_IDXS_FULL = np.array([55, 58, 12, 15], dtype=np.int32)
ANGLE_PRIOR_SIGNS = np.array([1.0, -1.0, -1.0, -1.0], dtype=np.float32)


@struct.dataclass
class GMMPrior:
    """Max-of-Gaussians negative log-likelihood prior (a pytree)."""

    means: jax.Array        # [K, D]
    precisions: jax.Array   # [K, D, D]
    weights: jax.Array      # [K]
    log_nll_weights: jax.Array  # [K]  log(w_k / (const * sqrtdet_k / min_k'))

    def __call__(self, pose: jax.Array, betas: jax.Array | None = None) -> jax.Array:
        """pose [..., D] -> NLL [...] (min over components)."""
        diff = pose[..., None, :] - self.means            # [..., K, D]
        quad = jnp.einsum(
            "...kd,kde,...ke->...k", diff, self.precisions, diff
        )
        ll = 0.5 * quad - self.log_nll_weights
        return jnp.min(ll, axis=-1)

    def mean_pose(self) -> jax.Array:
        """Mixture mean, used as pose init when nothing better exists
        (reference fit_single_frame.py:252)."""
        return self.weights @ self.means


def _gmm_from_arrays(means: np.ndarray, covs: np.ndarray, weights: np.ndarray,
                     dtype=jnp.float32) -> GMMPrior:
    precisions = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    # Reference quirk, preserved for loss-level parity: prior.py:154 hardcodes
    # the Gaussian normalizer exponent to 69 (the SMPL body-pose dim) even
    # when the mixture has another dimensionality — a pure constant offset of
    # ((69 - D)/2) * log(2*pi) on the NLL, no gradient effect.
    const = (2 * np.pi) ** (69 / 2.0)
    nll_weights = weights / (const * (sqrdets / sqrdets.min()))
    return GMMPrior(
        means=jnp.asarray(means, dtype=dtype),
        precisions=jnp.asarray(precisions, dtype=dtype),
        weights=jnp.asarray(weights, dtype=dtype),
        log_nll_weights=jnp.asarray(np.log(nll_weights), dtype=dtype),
    )


def load_gmm_pickle(path: str, dtype=jnp.float32) -> GMMPrior:
    """Load a gmm_{K}.pkl artifact (dict or sklearn GMM, same as reference)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        means, covs, weights = gmm["means"], gmm["covars"], gmm["weights"]
    else:  # sklearn.mixture GMM object
        means, covs, weights = gmm.means_, gmm.covars_, gmm.weights_
    return _gmm_from_arrays(
        np.asarray(means, np.float64),
        np.asarray(covs, np.float64),
        np.asarray(weights, np.float64),
        dtype=dtype,
    )


def synthetic_gmm(num_components: int = 8, dim: int = 69, seed: int = 0,
                  dtype=jnp.float32) -> GMMPrior:
    """Random well-conditioned mixture with the same structure as gmm_08.pkl."""
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=0.3, size=(num_components, dim))
    covs = []
    for _ in range(num_components):
        A = rng.normal(size=(dim, dim)) * 0.05
        covs.append(A @ A.T + np.eye(dim) * 0.1)
    weights = rng.dirichlet(np.ones(num_components))
    return _gmm_from_arrays(means, np.stack(covs), weights, dtype=dtype)


def l2_prior(x: jax.Array) -> jax.Array:
    """Sum of squares over all non-batch axes -> [...] per-sample scalars."""
    return jnp.sum(x * x, axis=tuple(range(1, x.ndim)))


def angle_prior(pose: jax.Array, with_global_pose: bool = False) -> jax.Array:
    """Bending prior on elbows/knees: exp(pose[idx] * sign)^2, summed.

    pose: [..., >=66] axis-angle body pose (with or without global orient).
    Returns [...] per-sample scalars.
    """
    idxs = ANGLE_PRIOR_IDXS_FULL - (0 if with_global_pose else 3)
    signs = jnp.asarray(ANGLE_PRIOR_SIGNS, dtype=pose.dtype)
    # Clamp the exponent so wild line-search probes can't overflow float32
    # (exp(40)^2 ~ 5e34 is still finite and steeply increasing).
    vals = jnp.clip(pose[..., idxs] * signs, -40.0, 40.0)
    return jnp.sum(jnp.exp(vals) ** 2, axis=-1)
