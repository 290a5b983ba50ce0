"""Matrix-free distributed MinSR: Lanczos evaluation of the soft
pseudo-inverse  nat = A^H f(T) eps  with  T = A A^H  never materialized.

TPU-native counterpart of the reference's ScaLAPACK "Path A"
(minsr_scalapack.h:1-9: distributed pdsyev over a BLACS grid to cut
per-rank memory from O(Ns^2) to O(Ns^2/P)). The reference distributes the
dense [Ns, Ns] Gram eigensolve; on a TPU mesh the natural equivalent goes
one step further and never forms the Gram at all: every Lanczos matvec
T v = A (A^H v) is two matmuls over the sample-sharded A whose contraction
XLA lowers to a psum across the mesh. Per-device memory is
O(Ns*P / n_dev + Ns*m) — the [Ns, Ns] matrix appears in no intermediate
(asserted against the compiled HLO in tests/test_krylov_minsr.py).

Exactness: Lanczos with full reorthogonalization reproduces f(T) b exactly
once m reaches the number of distinct T-eigenvalues represented in b
(m = Ns always suffices); for m < Ns it is the optimal-degree polynomial
approximation of f on the spectrum, with CG-like convergence: the
iteration count tracks the number of well-separated Gram eigenvalues
ABOVE the pseudo-inverse cutoff (clustered/decaying spectra converge in
far fewer than Ns steps; a flat near-singular spectrum does not — there
the dense path or SR-CG is the right tool). The same soft filter as the
dense path
(minsr_eigensolve.h:44, lam^5/(lam^6 + c^6)) is applied to the Ritz
spectrum, with the cutoff scale c anchored to the largest Ritz value —
which converges to lambda_max(T) first, so the two paths agree on c to
machine precision well before the interior spectrum converges.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lanczos_fn_apply(matvec, b: jnp.ndarray, m: int, filter_fn):
    """Return f(T) b for Hermitian PSD T given only `matvec` (v -> T v).

    Lanczos with full reorthogonalization (two Gram-Schmidt passes per
    step against the whole stored basis) in static shapes: the basis
    buffer is [m+1, Ns] with unfilled rows exactly zero, so the
    reorthogonalization needs no masking. Breakdown (an invariant
    subspace found early, beta ~ 0) zeroes the next basis vector; the
    trailing tridiagonal block then decouples and carries no e1 weight,
    so its spurious eigenpairs contribute nothing.

    filter_fn(lam) maps the Ritz values [m] to the spectral filter values
    (e.g. the MinSR soft pseudo-inverse).
    """
    ns = b.shape[0]
    dtype = b.dtype
    rdtype = jnp.real(b).dtype
    nb = jnp.sqrt(jnp.real(jnp.vdot(b, b)))
    tiny = jnp.asarray(jnp.finfo(rdtype).tiny, rdtype)
    eps_r = jnp.finfo(rdtype).eps
    q0 = jnp.where(nb > tiny, 1.0 / jnp.maximum(nb, tiny), 0.0) * b

    qbuf0 = jnp.zeros((m + 1, ns), dtype).at[0].set(q0)

    def step(carry, j):
        qbuf, beta_prev = carry
        qj = qbuf[j]
        w = matvec(qj).astype(dtype)
        alpha = jnp.real(jnp.vdot(qj, w))
        w = w - alpha.astype(dtype) * qj - beta_prev.astype(dtype) \
            * qbuf[jnp.maximum(j - 1, 0)] * (j > 0)
        # full reorthogonalization, twice (zero rows contribute nothing)
        for _ in range(2):
            coeffs = jnp.conj(qbuf) @ w               # [m+1]
            w = w - qbuf.T @ coeffs
        beta = jnp.sqrt(jnp.real(jnp.vdot(w, w)))
        # breakdown guard: beta below roundoff of the running scale ends
        # the recurrence cleanly (next vector = 0)
        ok = beta > eps_r * jnp.maximum(jnp.abs(alpha), 1.0)
        qn = jnp.where(ok, 1.0 / jnp.maximum(beta, tiny), 0.0) * w
        beta = jnp.where(ok, beta, 0.0)
        qbuf = qbuf.at[j + 1].set(qn)
        return (qbuf, beta), (alpha, beta)

    (qbuf, _), (alphas, betas) = jax.lax.scan(
        step, (qbuf0, jnp.zeros((), rdtype)), jnp.arange(m))

    tm = (jnp.diag(alphas)
          + jnp.diag(betas[:-1], 1)
          + jnp.diag(betas[:-1], -1))                 # [m, m] real
    lam, u = jnp.linalg.eigh(tm)
    fil = filter_fn(lam).astype(u.dtype)
    y = u @ (fil * u[0, :])                           # f(T_m) e1
    x = qbuf[:m].T @ (nb.astype(dtype) * y.astype(dtype))
    return x


def minsr_krylov_natural_gradient(o_samples: jnp.ndarray,
                                  e_samples: jnp.ndarray,
                                  pseudo_inverse_cutoff: float,
                                  m: int, shape):
    """MinSR natural gradient nat = A^H f(A A^H) eps without the Gram.

    Same spectral filter as `optimizer.minsr_natural_gradient` (the dense
    eigh path): f(lam) = lam^5 / (lam^6 + c^6), c = cutoff * lam_max.
    `m` = Krylov dimension (m >= Ns reproduces the dense path exactly).
    """
    a = o_samples                                     # [Ns, P] (rows shardable)
    eps = e_samples.astype(a.dtype)                   # [Ns]

    def matvec(v):
        return a @ (jnp.conj(a.T) @ v)

    def soft_filter(lam):
        c = pseudo_inverse_cutoff * jnp.maximum(jnp.max(lam), 1e-300)
        return lam ** 5 / (lam ** 6 + c ** 6)

    x = lanczos_fn_apply(matvec, eps, m, soft_filter)
    nat = jnp.conj(a.T) @ x
    return nat.reshape(shape)
