"""Matrix-free distributed MinSR (optimizer/krylov.py) — the TPU-native
replacement for the reference's ScaLAPACK "Path A" eigensolve
(minsr_scalapack.h:8: distributed pdsyev, per-rank memory O(Ns^2/P)).

Coverage: exact agreement with the dense eigh path at full Krylov
dimension (real + complex), convergence at m < Ns, an 8-device
sample-sharded run matching the dense result, a compiled-HLO assertion
that NO [Ns, Ns] intermediate exists anywhere in the program (the memory
claim, checked mechanically), and end-to-end optimizer convergence on the
exact-sum evaluator."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.krylov import (lanczos_fn_apply,
                                       minsr_krylov_natural_gradient)

pytestmark = pytest.mark.fast

NDEV = 8


def _problem(ns, p, rng, complex_dtype=False, clusters=0):
    """Random [ns, p] sample matrix; `clusters` > 0 imposes that many
    distinct Gram eigenvalues (Lanczos exhausts the Krylov space after
    ~clusters steps — the m << Ns convergence regime)."""
    a = rng.normal(size=(ns, p))
    if complex_dtype:
        a = a + 1j * rng.normal(size=(ns, p))
    u, s, vt = np.linalg.svd(a, full_matrices=False)
    if clusters:
        vals = 1.0 + np.arange(clusters) / clusters
        s = np.sqrt(vals[np.arange(len(s)) % clusters])
    a = (u * s) @ vt / np.sqrt(ns)
    eps = rng.normal(size=(ns,))
    if complex_dtype:
        eps = eps + 1j * rng.normal(size=(ns,))
    return jnp.asarray(a), jnp.asarray(eps)


def _dense_nat(a, eps, cutoff, shape):
    ev = opt.Evaluation(energy=jnp.zeros(()), gradient=jnp.zeros(shape),
                        o_samples=a, e_samples=eps)
    return opt.minsr_natural_gradient(
        ev, opt.MinSRParams(pseudo_inverse_cutoff=cutoff), shape)


@pytest.mark.parametrize("complex_dtype", [False, True])
def test_full_krylov_matches_dense_eigh(complex_dtype):
    """m = Ns reproduces the dense eigh + soft-filter path to near machine
    precision (Lanczos is exact once the Krylov space is exhausted)."""
    ns, p = 24, 40
    rng = np.random.default_rng(3)
    a, eps = _problem(ns, p, rng, complex_dtype)
    ref = _dense_nat(a, eps, 1e-8, (p,))
    got = jax.jit(lambda a, eps: minsr_krylov_natural_gradient(
        a, eps, 1e-8, ns, (p,)))(a, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-9, atol=1e-11)


def test_moderate_krylov_converges():
    """m << Ns: convergence is governed by the number of distinct Gram
    eigenvalues above the cutoff (CG-like); with 12 clusters, m = 14 is
    already machine-exact while m = 8 is a rough approximation."""
    ns, p, r = 64, 48, 12
    rng = np.random.default_rng(5)
    a, eps = _problem(ns, p, rng, clusters=r)
    ref = np.asarray(_dense_nat(a, eps, 1e-6, (p,)))
    errs = []
    for m in (8, r + 2):
        got = np.asarray(jax.jit(
            lambda a, eps, m=m: minsr_krylov_natural_gradient(
                a, eps, 1e-6, m, (p,)))(a, eps))
        errs.append(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert errs[0] < 1e-3, errs          # partial Krylov: decent
    assert errs[1] < 1e-12, errs         # exhausted Krylov: exact
    assert errs[1] < errs[0], errs


def test_breakdown_low_rank_is_exact():
    """Rank-deficient A (Krylov space exhausted early): the breakdown guard
    ends the recurrence and the result is still exact."""
    ns, p, r = 32, 40, 5
    rng = np.random.default_rng(7)
    left = rng.normal(size=(ns, r))
    right = rng.normal(size=(r, p))
    a = jnp.asarray(left @ right / np.sqrt(ns))
    eps = jnp.asarray(rng.normal(size=(ns,)))
    ref = _dense_nat(a, eps, 1e-8, (p,))
    got = jax.jit(lambda a, eps: minsr_krylov_natural_gradient(
        a, eps, 1e-8, ns, (p,)))(a, eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-10)


def test_sharded_matches_dense_and_no_gram_intermediate():
    """Sample-sharded A over the 8-device mesh: (a) the result matches the
    dense single-device path; (b) the compiled HLO contains NO tensor of
    shape [Ns, Ns] — the Gram is never materialized on any device, the
    memory contract the reference buys with ScaLAPACK block-cyclic
    distribution (minsr_scalapack.h:8)."""
    assert len(jax.devices()) >= NDEV
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:NDEV]), ("chains",))
    ns, p, m = 96, 56, 24   # ns distinctive so [ns, ns] is greppable; m < ns
    rng = np.random.default_rng(11)
    a, eps = _problem(ns, p, rng, clusters=16)
    ref = _dense_nat(a, eps, 1e-8, (p,))

    rowshard = NamedSharding(mesh, P("chains", None))
    vecshard = NamedSharding(mesh, P("chains"))
    f = jax.jit(lambda a, eps: minsr_krylov_natural_gradient(
        a, eps, 1e-8, m, (p,)), in_shardings=(rowshard, vecshard))
    a_sh = jax.device_put(a, rowshard)
    eps_sh = jax.device_put(eps, vecshard)
    hlo = f.lower(a_sh, eps_sh).compile().as_text()
    assert not re.search(rf"f64\[{ns},{ns}\]", hlo), \
        "Gram-sized [Ns, Ns] intermediate found in compiled HLO"
    got = f(a_sh, eps_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-11)


def test_optimizer_minsr_krylov_reaches_ed_energy():
    """End to end: MinSR with the Krylov path on the exact-sum evaluator
    reaches the ED energy like the dense path does."""
    from tests.test_optimizer import CHI, TP, make_eval, setup
    mt, e_ed, tps, configs = setup()
    params = opt.OptimizerParams(
        max_iters=100,
        algorithm=opt.MinSRParams(pseudo_inverse_cutoff=1e-8,
                                  krylov_iters=48),
        lr=0.2)
    result = opt.iterative_optimize(tps, make_eval(mt, configs, True),
                                    params)
    assert result.lowest_energy < e_ed + 1e-3 * abs(e_ed), \
        (result.lowest_energy, e_ed)


def test_lanczos_fn_apply_generic_function():
    """lanczos_fn_apply computes general spectral functions: exp(T) b
    against the dense reference."""
    n = 20
    rng = np.random.default_rng(13)
    h = rng.normal(size=(n, n))
    t = jnp.asarray((h @ h.T) / n)
    b = jnp.asarray(rng.normal(size=(n,)))
    lam, u = np.linalg.eigh(np.asarray(t))
    ref = u @ (np.exp(lam) * (u.T @ np.asarray(b)))
    got = lanczos_fn_apply(lambda v: t @ v, b, n, jnp.exp)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-9, atol=1e-10)
