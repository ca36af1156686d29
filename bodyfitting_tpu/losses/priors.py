"""Pose priors: GMM max-mixture, L2, angle (reference smplify/prior.py).

The 8-component Gaussian-mixture prior over the 69-dim SMPL body pose is
precomputed on the host in float64 (matrix inverses, determinants —
reference prior.py:146-171 does the same with numpy) and stored float32 as
a pytree, so evaluation inside jit is a batched quadratic form + min.
"""

from __future__ import annotations

import dataclasses
import pickle

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MaxMixturePrior:
    """Max-of-Gaussians negative log-likelihood, as in SMPLify.

    ``nll(pose) = min_k [ 0.5 * (pose-mu_k)^T P_k (pose-mu_k) - log w'_k ]``
    with ``w'_k = w_k / (const * sqrtdet_k / min_j sqrtdet_j)``
    (reference prior.py:152-159,181-196).
    """

    means: jax.Array           # [K, D]
    precisions: jax.Array      # [K, D, D]
    log_nll_weights: jax.Array  # [K]
    mean_pose: jax.Array       # [D] mixture-weighted mean, weights @ means

    def __call__(self, pose: jax.Array) -> jax.Array:
        """pose ``[..., D]`` -> nll ``[...]``."""
        diff = pose[..., None, :] - self.means              # [..., K, D]
        pd = jnp.einsum(
            "kij,...kj->...ki", self.precisions, diff,
            preferred_element_type=jnp.promote_types(
                self.precisions.dtype, diff.dtype
            ),
        )
        quad = jnp.sum(pd * diff, axis=-1)                  # [..., K]
        nll = 0.5 * quad - self.log_nll_weights
        return jnp.min(nll, axis=-1)

    def get_mean(self) -> jax.Array:
        """Mixture-weighted mean pose (reference prior.py:176-179)."""
        return self.mean_pose


jax.tree_util.register_dataclass(
    MaxMixturePrior,
    data_fields=["means", "precisions", "log_nll_weights", "mean_pose"],
    meta_fields=[],
)


def _build(means: np.ndarray, covs: np.ndarray, weights: np.ndarray,
           dtype=jnp.float32) -> MaxMixturePrior:
    means = np.asarray(means, np.float64)
    covs = np.asarray(covs, np.float64)
    weights = np.asarray(weights, np.float64)
    D = means.shape[1]
    precisions = np.stack([np.linalg.inv(c) for c in covs])
    sqrdets = np.array([np.sqrt(np.linalg.det(c)) for c in covs])
    const = (2 * np.pi) ** (D / 2.0)
    nll_weights = weights / (const * (sqrdets / sqrdets.min()))
    return MaxMixturePrior(
        means=jnp.asarray(means, dtype),
        precisions=jnp.asarray(precisions, dtype),
        log_nll_weights=jnp.asarray(np.log(nll_weights), dtype),
        mean_pose=jnp.asarray(weights @ means, dtype),
    )


def load_gmm_prior(path: str, dtype=jnp.float32) -> MaxMixturePrior:
    """Load ``gmm_08.pkl`` (dict or legacy sklearn GMM pickle)."""
    with open(path, "rb") as f:
        gmm = pickle.load(f, encoding="latin1")
    if isinstance(gmm, dict):
        means, covs, weights = gmm["means"], gmm["covars"], gmm["weights"]
    else:  # sklearn.mixture.gmm.GMM object
        means, covs, weights = gmm.means_, gmm.covars_, gmm.weights_
    return _build(means, covs, weights, dtype)


def synthetic_gmm_prior(
    num_gaussians: int = 8, dim: int = 69, seed: int = 0, dtype=jnp.float32
) -> MaxMixturePrior:
    """Random but well-conditioned mixture for tests and asset-free runs."""
    rng = np.random.default_rng(seed)
    means = rng.normal(scale=0.3, size=(num_gaussians, dim))
    covs = []
    for _ in range(num_gaussians):
        A = rng.normal(size=(dim, dim)) * 0.05
        covs.append(A @ A.T + np.eye(dim) * 0.25)
    weights = rng.dirichlet(np.ones(num_gaussians))
    return _build(means, np.stack(covs), weights, dtype)


def l2_prior(x: jax.Array) -> jax.Array:
    """Sum-of-squares prior (reference prior.py:92-97)."""
    return jnp.sum(x ** 2)

