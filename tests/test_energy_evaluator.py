"""Exact-summation evaluator vs ED for arbitrary (random) states, plus
finite-difference gradient checks. This is the strongest correctness test of
the whole L2-L4 stack: for ANY state, sum_s |psi(s)|^2 E_loc(s) / Z == <H>.

Reference analogue: test_exact_summation_evaluator.cpp (SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import all_configs, exact_sum_energy_gradient
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.tps import random_tps
from tests.ed_oracle import build_hamiltonian, wavefunction_from_tps

CHI = 16
TP = TruncParams(CHI, 1, 0.0)


def _ed_energy_of_state(tps, model):
    ly, lx = tps.shape[:2]
    psi = wavefunction_from_tps(np.asarray(tps))
    h = build_hamiltonian(model, ly, lx)
    return float(np.real(np.vdot(psi, h @ psi) / np.vdot(psi, psi)))


MODELS = [
    ("heisenberg", spin.heisenberg(1.0)),
    ("tfim", spin.transverse_field_ising(1.0, 2.0)),
    ("j1j2", spin.j1j2_xxz(1.0, 1.0, 0.5, 0.5)),
    ("triangle", spin.triangle_heisenberg(1.0)),
    ("xxz", spin.xxz(1.3, 0.7)),
]


@pytest.mark.parametrize("dtype", [jnp.float64, jnp.complex128])
@pytest.mark.parametrize("name,model", MODELS)
def test_exact_sum_energy_matches_ed(name, model, dtype):
    ly, lx = 2, 3
    key = jax.random.PRNGKey(hash(name) % 2**31)
    tps = random_tps(key, ly, lx, model.phys_dim, 3, dtype=dtype, scale=0.8)
    mt = ModelTensors.from_model(model, dtype)
    configs = jnp.asarray(all_configs(ly, lx, model.phys_dim))
    res = exact_sum_energy_gradient(tps, configs, mt, CHI, TP, with_grad=False)
    want = _ed_energy_of_state(tps, model)
    assert abs(float(res.energy) - want) < 1e-8 * max(1.0, abs(want)), name


@pytest.mark.parametrize("dtype", [jnp.float64])
@pytest.mark.parametrize("name,model", MODELS[:3])
def test_exact_sum_gradient_finite_difference(name, model, dtype):
    ly, lx = 2, 3
    key = jax.random.PRNGKey(42)
    tps = random_tps(key, ly, lx, model.phys_dim, 2, dtype=dtype, scale=0.8)
    mt = ModelTensors.from_model(model, dtype)
    configs = jnp.asarray(all_configs(ly, lx, model.phys_dim))
    res = exact_sum_energy_gradient(tps, configs, mt, CHI, TP)
    # random probe direction, restricted to non-padded slots
    from peps_tpu.lattice import boundary_mask
    mask = jnp.asarray(boundary_mask(ly, lx, model.phys_dim, 2), dtype)
    v = jax.random.normal(jax.random.PRNGKey(7), tps.shape, dtype) * mask
    eps = 1e-6
    ep = exact_sum_energy_gradient(tps + eps * v, configs, mt, CHI, TP,
                                   with_grad=False).energy
    em = exact_sum_energy_gradient(tps - eps * v, configs, mt, CHI, TP,
                                   with_grad=False).energy
    fd = (float(ep) - float(em)) / (2 * eps)
    anl = float(jnp.vdot(res.gradient, v).real)
    assert abs(fd - anl) < 1e-5 * max(1.0, abs(fd)), (name, fd, anl)


def test_exact_sum_gradient_complex_descends():
    """For complex parameters, a small step against the returned gradient
    must lower the energy (Wirtinger-convention check)."""
    ly, lx = 2, 2
    model = spin.heisenberg(1.0)
    tps = random_tps(jax.random.PRNGKey(1), ly, lx, 2, 2,
                     dtype=jnp.complex128, scale=0.8)
    mt = ModelTensors.from_model(model, jnp.complex128)
    configs = jnp.asarray(all_configs(ly, lx, 2))
    res = exact_sum_energy_gradient(tps, configs, mt, CHI, TP)
    e0 = float(res.energy)
    step = 1e-3 / max(1e-12, float(jnp.linalg.norm(res.gradient)))
    e1 = float(exact_sum_energy_gradient(tps - step * res.gradient, configs,
                                         mt, CHI, TP, with_grad=False).energy)
    assert e1 < e0


def test_psi_consistency_monitor():
    from peps_tpu.algorithm.energy import psi_consistency_check
    tps = random_tps(jax.random.PRNGKey(9), 3, 3, 2, 2, dtype=jnp.float64,
                     scale=0.8)
    cfg = jax.random.randint(jax.random.PRNGKey(10), (3, 3), 0, 2)
    rel, logs = psi_consistency_check(tps, cfg, 16, TruncParams(16, 1, 0.0))
    assert float(rel) < 1e-10, float(rel)


@pytest.mark.fast
def test_vertical_fast_path_matches_bten2():
    """The transposed-frame vertical-bond fast path (taken when no diagonal
    couplings are present) must agree with the two-row BTen2 route (forced
    here by a zero diagonal coupling) to float precision."""
    import dataclasses
    import jax
    from peps_tpu.algorithm.energy import local_energy_and_holes
    from peps_tpu.tps import random_tps

    model = spin.heisenberg(1.0)
    mt = ModelTensors.from_model(model, jnp.float64)
    mt_bten2 = mt._replace(h_d=jnp.zeros_like(mt.h_h))  # forces BTen2 route
    tps = random_tps(jax.random.PRNGKey(11), 3, 4, 2, 3,
                     dtype=jnp.float64, scale=0.7)
    chi = 12
    tp = TruncParams(chi, 1, 0.0)
    for seed in range(3):
        cfg = jax.random.randint(jax.random.PRNGKey(seed), (3, 4), 0, 2)
        e_fast = float(local_energy_and_holes(tps, cfg, mt, chi, tp,
                                              with_holes=False).e_loc)
        e_bt2 = float(local_energy_and_holes(tps, cfg, mt_bten2, chi, tp,
                                             with_holes=False).e_loc)
        assert abs(e_fast - e_bt2) < 1e-9 * max(1.0, abs(e_bt2)), \
            (seed, e_fast, e_bt2)
