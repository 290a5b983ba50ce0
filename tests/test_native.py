"""Native C++ sampler-support library vs numpy implementations."""
import numpy as np
import pytest

from peps_tpu.algorithm.exact_sum import sector_configs
from peps_tpu.montecarlo.statistics import (integrated_autocorrelation_time,
                                            mean_and_binned_error)
from peps_tpu.utils import native



pytestmark = pytest.mark.fast

def test_native_library_builds():
    assert native._build_and_load() is not None, "g++ build failed"


def test_sector_enumeration_matches_python():
    got = native.sector_configs_native(2, 3, {0: 4, 1: 2})
    want = sector_configs(2, 3, {0: 4, 1: 2})
    assert got.shape == want.shape
    assert np.array_equal(np.sort(got.reshape(len(got), -1), axis=0),
                          np.sort(want.reshape(len(want), -1), axis=0))


@pytest.mark.smoke
def test_binned_stats_match():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 8)) + 3.0
    m_n, e_n = native.binned_stats_native(x)
    import jax.numpy as jnp
    m_p, e_p = mean_and_binned_error(jnp.asarray(x))
    assert abs(m_n - float(m_p)) < 1e-12
    assert abs(e_n - float(e_p)) < 1e-10


def test_autocorr_time_close():
    rng = np.random.default_rng(1)
    # AR(1) process with known tau
    n = 4000
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = 0.8 * x[i - 1] + rng.normal()
    t_n = native.autocorr_time_native(x)
    t_p = integrated_autocorrelation_time(x)
    assert abs(t_n - t_p) < 0.35 * max(t_p, 1.0), (t_n, t_p)
