"""Conjugate-gradient solver for Hermitian PSD operators (matrix-free).

Reference: `utility/conjugate_gradient_solver.h` (serial :183 and MPI
master/slave :297-370). TPU version: the matvec is a pure function (inside
jit the sample axis can be device-sharded, with psum reductions replacing the
reference's instruction-broadcast protocol), the iteration is a
`lax.while_loop`.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CGParams:
    max_iter: int = 100
    tol: float = 1e-6          # relative residual tolerance
    restart_every: int = 0     # 0 = never explicitly recompute residual


class CGResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray


def cg_solve(matvec: Callable, b: jnp.ndarray, x0: jnp.ndarray | None,
             params: CGParams) -> CGResult:
    """Solve A x = b for Hermitian positive (semi)definite A."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    p = r
    rs = jnp.real(jnp.vdot(r, r))
    b_norm = jnp.sqrt(jnp.maximum(jnp.real(jnp.vdot(b, b)),
                                  jnp.finfo(b.real.dtype).tiny))
    tol2 = (params.tol * b_norm) ** 2

    def cond(state):
        x, r, p, rs, it = state
        return (rs > tol2) & (it < params.max_iter)

    def body(state):
        x, r, p, rs, it = state
        ap = matvec(p)
        pap = jnp.real(jnp.vdot(p, ap))
        alpha = rs / jnp.maximum(pap, jnp.finfo(rs.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.real(jnp.vdot(r, r))
        beta = rs_new / jnp.maximum(rs, jnp.finfo(rs.dtype).tiny)
        p = r + beta * p
        return x, r, p, rs_new, it + 1

    x, r, p, rs, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.zeros((), jnp.int32)))
    return CGResult(x, it, jnp.sqrt(rs))
