"""Suwa-Todo rejection-free update (PRL 105, 120603), JAX version.

Reference: `vmc_basic/monte_carlo_tools/suwa_todo_update.h:56` — geometric
overlap on a ring with the maximum weight swapped to index 0. This version is
branch-free (jnp.where) so it vmaps over chains/bonds.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def suwa_todo_pick(weights: jnp.ndarray, current: jnp.ndarray,
                   key: jax.Array) -> jnp.ndarray:
    """Pick the next state given non-negative weights [K] and current state.

    Requires weights[current] > 0 (guaranteed when weights are |psi|^2 of the
    current configuration's candidates). Returns int32 index.
    """
    k = weights.shape[0]
    kmax = jnp.argmax(weights)
    w0 = weights[0]
    wmax = weights[kmax]
    w = weights.at[0].set(wmax).at[kmax].set(w0)
    cur = jnp.where(current == kmax, 0,
                    jnp.where(current == 0, kmax, current))
    s = jnp.cumsum(w)
    total = s[k - 1]
    s_im1 = jnp.where(cur == 0, 0.0, s[jnp.maximum(cur - 1, 0)])
    start = s_im1 + w[0]
    start = jnp.where(start >= total, start - total, start)
    u = jax.random.uniform(key, (), dtype=weights.dtype)
    x = start + u * w[cur]
    x = jnp.where(x >= total, x - total, x)
    j = jnp.searchsorted(s, x, side="right").astype(jnp.int32)
    j = jnp.minimum(j, k - 1)
    final = jnp.where(j == 0, kmax, jnp.where(j == kmax, 0, j)).astype(jnp.int32)
    return final
