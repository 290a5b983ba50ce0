"""Variational BMPS compression schemes vs SVD compression."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.contraction import bmps
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import exact_contract, project, random_tps


def _full_state(mps):
    lx, m, D, _ = mps.shape
    v = np.zeros(m); v[0] = 1
    w = np.tensordot(v, np.asarray(mps[0]), axes=([0], [0]))
    for x in range(1, lx):
        w = np.tensordot(w, np.asarray(mps[x]), axes=([-1], [0]))
    return w[..., 0]


@pytest.mark.parametrize("scheme", ["var2", "var1"])
def test_variational_not_worse_than_svd(scheme):
    key = jax.random.PRNGKey(4)
    lx, m, D, chi = 5, 9, 3, 4
    mps = jax.random.normal(key, (lx, m, D, m), jnp.float64)
    mask0 = jnp.zeros(m).at[0].set(1.0)
    mps = mps.at[0].multiply(mask0[:, None, None]).at[lx - 1].multiply(
        mask0[None, None, :])
    full = _full_state(mps)

    res_svd = bmps.compress(mps, chi, TruncParams(chi, 1, 0.0))
    sv = _full_state(res_svd.bmps) * np.exp(float(res_svd.log_norm))
    res_var = bmps.compress_variational(
        mps, chi, TruncParams(chi, 1, 0.0, scheme=scheme, var_sweeps=3),
        two_site=(scheme == "var2"))
    vr = _full_state(res_var.bmps) * np.exp(float(res_var.log_norm))

    def fid(a, b):
        return abs(np.vdot(a, b)) / np.sqrt(np.vdot(a, a) * np.vdot(b, b))

    f_svd, f_var = fid(full, sv), fid(full, vr)
    assert f_var >= f_svd - 1e-9, (f_svd, f_var)


def test_amplitude_with_variational_scheme_exact():
    key = jax.random.PRNGKey(9)
    ly, lx, D = 3, 3, 2
    tps = random_tps(key, ly, lx, 2, D, dtype=jnp.float64, scale=0.7)
    config = jax.random.randint(jax.random.fold_in(key, 1), (ly, lx), 0, 2)
    tn = project(tps, config)
    want = exact_contract(np.asarray(tn))
    chi = 8
    tp = TruncParams(chi, 1, 0.0, scheme="var2", var_sweeps=2)
    mant, logw = bmps.amplitude(tn, chi, tp)
    got = float(mant) * np.exp(float(logw))
    assert abs(got - want) < 1e-8 * max(1.0, abs(want))


@pytest.mark.smoke
@pytest.mark.fast
def test_sketch_scheme_amplitude_accuracy():
    """Randomized two-sided (Nystrom) compression: near-exact when chi covers
    the rank; bounded error in the truncating regime."""
    key = jax.random.PRNGKey(47)
    tps = random_tps(key, 4, 4, 2, 3, dtype=jnp.float64, scale=0.7)
    config = jax.random.randint(jax.random.fold_in(key, 1), (4, 4), 0, 2)
    tn = project(tps, config)
    want = exact_contract(np.asarray(tn))
    mant, logw = bmps.amplitude(tn, 9, TruncParams(9, 1, 0.0, scheme="sketch"))
    got = float(mant) * np.exp(float(logw))
    assert abs(got - want) < 1e-5 * abs(want)
    # truncating regime: oblique projection noise stays within a modest
    # multiple of the optimal (svd) truncation error
    mant_k, logw_k = bmps.amplitude(tn, 6, TruncParams(6, 1, 0.0,
                                                       scheme="sketch"))
    mant_s, logw_s = bmps.amplitude(tn, 6, TruncParams(6, 1, 0.0))
    err_k = abs(float(mant_k) * np.exp(float(logw_k)) - want) / abs(want)
    err_s = abs(float(mant_s) * np.exp(float(logw_s)) - want) / abs(want)
    assert err_k < 10 * err_s + 1e-3, (err_k, err_s)


@pytest.mark.fast
def test_sketch_scheme_small_widths():
    """Edge cases Lx = 2, 3 (no/one inner core) stay exact for chi >= rank."""
    key = jax.random.PRNGKey(11)
    for lx in (2, 3):
        tps = random_tps(key, 3, lx, 2, 2, dtype=jnp.float64, scale=0.8)
        config = jax.random.randint(jax.random.fold_in(key, lx), (3, lx), 0, 2)
        tn = project(tps, config)
        want = exact_contract(np.asarray(tn))
        mant, logw = bmps.amplitude(tn, 8, TruncParams(8, 1, 0.0,
                                                       scheme="sketch"))
        got = float(mant) * np.exp(float(logw))
        assert abs(got - want) < 1e-8 * max(1.0, abs(want)), (lx, got, want)


def test_fast_scheme_amplitude_accuracy():
    """Matmul-only ("fast") compression: near-lossless when chi >= rank and
    on par with SVD in the truncating regime."""
    key = jax.random.PRNGKey(43)
    tps = random_tps(key, 4, 4, 2, 3, dtype=jnp.float64, scale=0.7)
    config = jax.random.randint(jax.random.fold_in(key, 1), (4, 4), 0, 2)
    tn = project(tps, config)
    want = exact_contract(np.asarray(tn))
    mant, logw = bmps.amplitude(tn, 9, TruncParams(9, 1, 0.0, scheme="fast"))
    got = float(mant) * np.exp(float(logw))
    assert abs(got - want) < 1e-5 * abs(want)
    # truncating regime: compare infidelity against the svd scheme
    mant_f, logw_f = bmps.amplitude(tn, 6, TruncParams(6, 1, 0.0, scheme="fast"))
    mant_s, logw_s = bmps.amplitude(tn, 6, TruncParams(6, 1, 0.0))
    err_f = abs(float(mant_f) * np.exp(float(logw_f)) - want) / abs(want)
    err_s = abs(float(mant_s) * np.exp(float(logw_s)) - want) / abs(want)
    assert err_f < 3 * err_s + 1e-3, (err_f, err_s)


@pytest.mark.fast
def test_absorb_row_sketch_equals_unfused():
    """The fused absorb (never materializing the grown MPS) represents the
    SAME state as multiply_mpo -> compress_sketch: identical Gaussian mixing
    blocks and bond pinv, only the contraction order differs (advisor
    round-2 ask: pin the fused path to the unfused reference)."""
    key = jax.random.PRNGKey(23)
    lx, chi_in, du, dl, chi = 4, 5, 3, 3, 6
    boundary = jax.random.normal(key, (lx, chi_in, du, chi_in), jnp.float64)
    mask0 = jnp.zeros(chi_in).at[0].set(1.0)
    boundary = boundary.at[0].multiply(mask0[:, None, None]) \
        .at[lx - 1].multiply(mask0[None, None, :])
    row = jax.random.normal(jax.random.fold_in(key, 1),
                            (lx, du, dl, du, dl), jnp.float64)
    mask0l = jnp.zeros(dl).at[0].set(1.0)
    row = row.at[0].multiply(mask0l[None, :, None, None]) \
        .at[lx - 1].multiply(mask0l[None, None, None, :])

    tp = TruncParams(chi, 1, 0.0, scheme="sketch")
    fused = bmps.absorb_row_sketch(boundary, row, chi, tp)
    unfused = bmps.compress_sketch(bmps.multiply_mpo(boundary, row), chi, tp)

    sf = _full_state(fused.bmps) * np.exp(float(fused.log_norm))
    su = _full_state(unfused.bmps) * np.exp(float(unfused.log_norm))
    scale = np.max(np.abs(su))
    np.testing.assert_allclose(sf, su, atol=1e-9 * scale)
