"""Dominant-eigenpair solvers (power method + small Krylov refinement).

Reference: `two_dim_tn/peps/arnoldi_solver.h` (ArnoldiSolver used by the
loop-update weighted-trace gauge fixing). On TPU a jit-friendly power
iteration with fixed iteration count covers the gauge-fixing use case; the
Krylov variant builds a small Hessenberg matrix and solves it with
jnp.linalg.eig on the host-dispatchable path.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def power_method(matvec: Callable, v0: jnp.ndarray, iters: int = 50):
    """Dominant eigenpair by power iteration (fixed iteration count).

    Returns (eigenvalue, eigenvector) with unit-norm eigenvector."""

    def step(v, _):
        w = matvec(v)
        n = jnp.maximum(jnp.linalg.norm(w), jnp.finfo(w.real.dtype).tiny)
        return w / n, n

    v, ns = jax.lax.scan(step, v0 / jnp.maximum(jnp.linalg.norm(v0), 1e-300),
                         None, length=iters)
    lam = jnp.vdot(v, matvec(v)) / jnp.vdot(v, v)
    return lam, v


def arnoldi_dominant(matvec: Callable, v0: jnp.ndarray, krylov: int = 20):
    """Dominant eigenpair via an Arnoldi decomposition of dimension `krylov`.

    Builds V (orthonormal) and Hessenberg H with A V_k ~ V_k H; the dominant
    Ritz pair approximates the dominant eigenpair. Static shapes; suitable
    for jit."""
    n = v0.size
    dtype = v0.dtype
    v = v0.reshape(-1) / jnp.maximum(jnp.linalg.norm(v0), 1e-300)
    vs = jnp.zeros((krylov + 1, n), dtype).at[0].set(v)
    h = jnp.zeros((krylov + 1, krylov), dtype)

    def body(carry, j):
        vs, h = carry
        w = matvec(vs[j].reshape(v0.shape)).reshape(-1)
        # modified Gram-Schmidt against all previous vectors (masked)
        def orth(w, i):
            coeff = jnp.where(i <= j, jnp.vdot(vs[i], w), 0.0)
            return w - coeff * vs[i], coeff
        w, coeffs = jax.lax.scan(orth, w, jnp.arange(krylov + 1))
        nrm = jnp.linalg.norm(w)
        vs = vs.at[j + 1].set(jnp.where(nrm > 1e-12, w / nrm, 0.0))
        h = h.at[:, j].set(coeffs.at[j + 1].set(nrm)[:krylov + 1])
        return (vs, h), None

    (vs, h), _ = jax.lax.scan(body, (vs, h), jnp.arange(krylov))
    hk = h[:krylov, :krylov]
    # Ritz values of the (small) Hessenberg matrix
    evals, evecs = jnp.linalg.eig(hk.astype(jnp.complex128 if dtype == jnp.float64
                                            else jnp.complex64))
    idx = jnp.argmax(jnp.abs(evals))
    ritz = evecs[:, idx]
    vec = (ritz[None, :] @ vs[:krylov]).reshape(-1)
    lam = evals[idx]
    return lam, vec.reshape(v0.shape)
