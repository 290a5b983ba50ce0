"""BMPS contraction engine vs brute-force exact contraction.

Reference analogue: tests/test_2d_tn/test_bmps_contractor.cpp (SURVEY.md §4.1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.contraction import bmps
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import exact_contract, project, random_tps

DTYPES = [jnp.float64, jnp.complex128]


def _random_tn(key, ly, lx, d, D, dtype):
    tps = random_tps(key, ly, lx, d, D, dtype=dtype, scale=0.7)
    config = jax.random.randint(jax.random.fold_in(key, 7), (ly, lx), 0, d)
    return project(tps, config), tps, config


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("ly,lx,D", [(2, 2, 2), (3, 3, 2), (3, 4, 3), (4, 3, 2)])
def test_amplitude_matches_exact(dtype, ly, lx, D):
    key = jax.random.PRNGKey(ly * 100 + lx * 10 + D)
    tn, _, _ = _random_tn(key, ly, lx, 2, D, dtype)
    exact = exact_contract(np.asarray(tn))
    chi = min(D ** lx, 32)  # >= max Schmidt rank: no real truncation
    mant, logw = bmps.amplitude(tn, chi, TruncParams(chi, 1, 0.0))
    got = complex(mant) * np.exp(float(logw))
    assert np.abs(got - complex(exact)) < 1e-8 * max(1.0, abs(complex(exact)))


@pytest.mark.parametrize("dtype", [jnp.float64])
def test_truncation_accuracy(dtype):
    """Moderate chi should still reproduce the amplitude to good accuracy."""
    key = jax.random.PRNGKey(0)
    tn, _, _ = _random_tn(key, 4, 4, 2, 3, dtype)
    exact = exact_contract(np.asarray(tn))
    mant, logw = bmps.amplitude(tn, 9, TruncParams(9, 1, 1e-10))
    got = float(mant) * np.exp(float(logw))
    assert np.abs(got - float(exact)) < 1e-6 * abs(float(exact))


@pytest.mark.parametrize("dtype", DTYPES)
def test_row_trace_consistency(dtype):
    """psi evaluated from any row sandwich & any column closure must agree
    (the reference's psi-consistency monitor, psi_consistency.h)."""
    key = jax.random.PRNGKey(3)
    ly, lx, D, chi = 3, 4, 2, 16
    tn, _, _ = _random_tn(key, ly, lx, 2, D, dtype)
    tp = TruncParams(chi, 1, 0.0)
    exact = complex(exact_contract(np.asarray(tn)))
    stacks = bmps.all_env_stacks(tn, chi, tp)
    for y in range(ly):
        envs = bmps.row_envs(stacks.tops[y], stacks.bots[y + 1], tn[y])
        logw = stacks.log_tops[y] + stacks.log_bots[y + 1]
        for x in range(lx + 1):
            mant = complex(bmps.row_trace(envs, x))
            lw = float(envs.log_lefts[x] + envs.log_rights[x] + logw)
            got = mant * np.exp(lw)
            assert np.abs(got - exact) < 1e-8 * abs(exact), (y, x)


@pytest.mark.smoke
@pytest.mark.parametrize("dtype", DTYPES)
def test_punch_hole_is_site_derivative(dtype):
    """hole[y,x] contracted with the site tensor must give psi; and it must
    equal the exact derivative d psi / d tn[y,x] (probe test, analogue of
    PunchHoleBaselineByProbingForTest in test_trg_contractor.cpp)."""
    key = jax.random.PRNGKey(11)
    ly, lx, D, chi = 3, 3, 2, 16
    tn, _, _ = _random_tn(key, ly, lx, 2, D, dtype)
    tp = TruncParams(chi, 1, 0.0)
    exact = complex(exact_contract(np.asarray(tn)))
    stacks = bmps.all_env_stacks(tn, chi, tp)
    for y in range(ly):
        envs = bmps.row_envs(stacks.tops[y], stacks.bots[y + 1], tn[y])
        holes = bmps.punch_holes_row(envs, stacks.tops[y], stacks.bots[y + 1])
        logw = float(stacks.log_tops[y] + stacks.log_bots[y + 1])
        for x in range(lx):
            lw = float(envs.log_lefts[x] + envs.log_rights[x + 1]) + logw
            psi_from_hole = complex(jnp.einsum("uldr,uldr->", holes[x], tn[y, x]))
            got = psi_from_hole * np.exp(lw)
            assert np.abs(got - exact) < 1e-8 * abs(exact), (y, x)
            # probe: derivative against a random direction
            probe = np.asarray(jax.random.normal(
                jax.random.fold_in(key, 97 + 10 * y + x), holes[x].shape)).astype(np.complex128 if dtype == jnp.complex128 else np.float64)
            eps = 1e-6
            tn_p = np.asarray(tn).copy()
            tn_p[y, x] = tn_p[y, x] + eps * probe
            fd = (complex(exact_contract(tn_p)) - exact) / eps
            anl = complex(jnp.einsum("uldr,uldr->", holes[x], jnp.asarray(probe))) * np.exp(lw)
            assert np.abs(fd - anl) < 1e-4 * max(1.0, abs(fd)), (y, x)


@pytest.mark.parametrize("dtype", DTYPES)
def test_replace_traces(dtype):
    """Replace-one-site and replace-NN traces vs brute force."""
    key = jax.random.PRNGKey(21)
    ly, lx, D, d, chi = 3, 3, 2, 2, 16
    tn, tps, config = _random_tn(key, ly, lx, d, D, dtype)
    tp = TruncParams(chi, 1, 0.0)
    stacks = bmps.all_env_stacks(tn, chi, tp)
    y = 1
    envs = bmps.row_envs(stacks.tops[y], stacks.bots[y + 1], tn[y])
    logw = float(stacks.log_tops[y] + stacks.log_bots[y + 1])

    cands = tps[y]  # [Lx, d, u, l, d, r]
    ones = bmps.replace_one_site_traces(envs, stacks.tops[y], stacks.bots[y + 1], cands)
    for x in range(lx):
        lw = float(envs.log_lefts[x] + envs.log_rights[x + 1]) + logw
        for p in range(d):
            tn_mod = np.asarray(tn).copy()
            tn_mod[y, x] = np.asarray(tps[y, x, p])
            want = complex(exact_contract(tn_mod))
            got = complex(ones[x, p]) * np.exp(lw)
            assert np.abs(got - want) < 1e-8 * max(1.0, abs(want)), (x, p)

    nn = bmps.replace_nn_site_traces(envs, stacks.tops[y], stacks.bots[y + 1],
                                     cands[:-1], cands[1:])
    for x in range(lx - 1):
        lw = float(envs.log_lefts[x] + envs.log_rights[x + 2]) + logw
        for p1 in range(d):
            for p2 in range(d):
                tn_mod = np.asarray(tn).copy()
                tn_mod[y, x] = np.asarray(tps[y, x, p1])
                tn_mod[y, x + 1] = np.asarray(tps[y, x + 1, p2])
                want = complex(exact_contract(tn_mod))
                got = complex(nn[x, p1, p2]) * np.exp(lw)
                assert np.abs(got - want) < 1e-8 * max(1.0, abs(want)), (x, p1, p2)


@pytest.mark.fast
def test_entanglement_entropy_matches_dense():
    """BMPS entanglement entropy across every cut vs dense Schmidt values
    (reference: bmps_impl.h:266)."""
    rng = np.random.default_rng(0)
    chi, dv, lx = 3, 2, 4
    mps = np.zeros((lx, chi, dv, chi))
    mps[0, 0] = rng.normal(size=(dv, chi))
    mps[lx - 1, :, :, 0] = rng.normal(size=(chi, dv))
    for i in range(1, lx - 1):
        mps[i] = rng.normal(size=(chi, dv, chi))
    v = mps[0, 0]
    for i in range(1, lx):
        v = np.tensordot(v, mps[i], axes=([-1], [0]))
    v = v[..., 0].reshape(dv ** lx)
    for x in (1, 2, 3):
        s = np.linalg.svd(v.reshape(dv ** x, dv ** (lx - x)),
                          compute_uv=False)
        p = s ** 2 / np.sum(s ** 2)
        ref = -np.sum(np.where(p > 1e-300,
                               p * np.log(np.maximum(p, 1e-300)), 0))
        got = float(bmps.entanglement_entropy(jnp.asarray(mps), x))
        assert abs(got - ref) < 1e-10, (x, got, ref)


@pytest.mark.parametrize("scheme", ["svd", "fast", "var1", "var2"])
def test_amplitude_grad_differentiable_all_schemes(scheme):
    """AD holes through every BMPS compression scheme. The 'svd' scheme's
    right-edge LQ is a TALL factorization whose transposed QR is wide —
    JAX's QR derivative is unimplemented there (NotImplementedError), so
    linalg.lq routes tall inputs through svd_safe. Gradient checked against
    central finite differences."""
    key = jax.random.PRNGKey(7)
    ly, lx, d, D, chi = 3, 3, 2, 2, 4
    tps = random_tps(key, ly, lx, d, D, dtype=jnp.float64, scale=0.7)
    cfg = jnp.asarray(np.indices((ly, lx)).sum(0) % 2, dtype=jnp.int32)
    tp = TruncParams(chi, 1, 0.0, scheme=scheme)

    def logpsi(t):
        mant, logw = bmps.amplitude(project(t, cfg), chi, tp)
        return jnp.log(jnp.abs(mant)) + logw

    g = jax.grad(logpsi)(tps)
    assert bool(jnp.all(jnp.isfinite(g)))
    f0 = logpsi(tps)
    assert bool(jnp.isfinite(f0))
    rng = np.random.default_rng(3)
    flat = np.asarray(g).reshape(-1)
    order = np.argsort(np.abs(flat))[::-1]
    picks = list(order[:2]) + list(rng.integers(0, flat.size, 2))
    eps = 1e-6
    for ti in picks:
        pos = tuple(int(i) for i in np.unravel_index(int(ti), tps.shape))
        fp = float(logpsi(tps.at[pos].add(eps)))
        fm = float(logpsi(tps.at[pos].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        assert abs(flat[ti] - fd) < 1e-5 * max(1.0, abs(fd)), \
            (scheme, pos, flat[ti], fd)
