import pytest
"""Public API surface imports and exposes everything advertised."""
import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu import api


@pytest.mark.smoke
def test_api_surface():
    for name in api.__all__:
        assert hasattr(api, name), name


def test_wavefunction_sum_superposes():
    """Bond-dimension direct-sum superposition (reference: WaveFunctionSum,
    tps.h:159-216): amplitudes add with the given coefficients."""
    import itertools
    from peps_tpu.tps import exact_amplitude, wavefunction_sum
    a = api.random_tps(jax.random.PRNGKey(0), 2, 3, 2, 2, dtype=jnp.float64)
    b = api.random_tps(jax.random.PRNGKey(1), 2, 3, 2, 3, dtype=jnp.float64)
    s = wavefunction_sum(a, b, 0.7, -1.3)
    for cfg in itertools.islice(itertools.product(range(2), repeat=6), 12):
        c = np.array(cfg).reshape(2, 3)
        va = exact_amplitude(np.asarray(a), c)
        vb = exact_amplitude(np.asarray(b), c)
        vs = exact_amplitude(np.asarray(s), c)
        assert abs(vs - (0.7 * va - 1.3 * vb)) < 1e-9 * max(
            abs(va) + abs(vb), 1.0)


def test_expand_bond_dim_preserves_state():
    """Zero-pad embedding into a larger D (reference: qlten Expand) keeps
    every amplitude exactly; the noisy variant perturbs only O(noise)."""
    import itertools
    from peps_tpu.tps import exact_amplitude, expand_bond_dim
    a = api.random_tps(jax.random.PRNGKey(2), 2, 3, 2, 2, dtype=jnp.float64)
    big = expand_bond_dim(a, 5)
    noisy = expand_bond_dim(a, 5, noise=1e-8, key=jax.random.PRNGKey(3))
    for cfg in itertools.islice(itertools.product(range(2), repeat=6), 8):
        c = np.array(cfg).reshape(2, 3)
        va = exact_amplitude(np.asarray(a), c)
        vb = exact_amplitude(np.asarray(big), c)
        vn = exact_amplitude(np.asarray(noisy), c)
        assert abs(vb - va) < 1e-12 * max(abs(va), 1.0), (va, vb)
        assert abs(vn - va) < 1e-5 * max(abs(va), 1.0), (va, vn)
