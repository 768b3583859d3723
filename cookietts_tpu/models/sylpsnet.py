"""SylpsNet — speaking-rate (syllables/sec) VAE conditioning head.

Rebuild of CookieTTS/_2_ttm/tacotron2_ssvae/nets/SylpsNet.py:7-61:
a tiny residual MLP maps (sylps, ln sylps) -> (mu, logvar); the
reparameterized 1-d latent ``syl_zu`` conditions the decoder memory, letting
inference control speaking speed directly (``infer_controlled``).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class SylpsNet(nn.Module):
    layer_dims: Sequence[int] = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def _res_params(self, sylps: jnp.ndarray) -> jnp.ndarray:
        """[B] sylps -> [B, 2] (mu, logvar) via residual MLP."""
        ln_sylps = jnp.log(jnp.maximum(sylps, 1e-6))
        x = jnp.stack([sylps, ln_sylps], axis=1)          # [B, 2]
        h = x
        n = len(self.layer_dims)
        for i, dim in enumerate(self.layer_dims):
            # the LAST layer outputs 1 and broadcasts onto (mu, logvar) —
            # reference SylpsNet.py:16-19,38 adds the same scalar residual
            # to both channels
            out_dim = 1 if i == n - 1 else dim
            h = nn.Dense(out_dim, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform())(h)
            if i != n - 1:
                h = nn.leaky_relu(h, negative_slope=0.05)
        res_weight = self.param("res_weight",
                                nn.initializers.constant(0.01), ())
        return x + res_weight * h                          # [B,2]+[B,1]

    def __call__(self, sylps: jnp.ndarray, key: jax.Array | None = None,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (syl_zu [B, 1], mu [B], logvar [B])."""
        params = self._res_params(sylps)
        mu, logvar = params[:, 0], params[:, 1]
        if deterministic or key is None:
            zu = mu
        else:
            std = jnp.exp(0.5 * logvar)
            zu = mu + std * jax.random.normal(key, mu.shape)
        return zu[:, None], mu, logvar

    def infer_controlled(self, batch: int, mu: float = 0.0) -> jnp.ndarray:
        return jnp.full((batch, 1), mu, self.dtype)
