"""sqrt5-distance and third-NN two-site traces + the TRUE triangle J1-J2
model (reference: ReplaceTNNSiteTrace / ReplaceSqrt5DistTwoSiteTrace,
bmps_contractor.h:904,923, consumed by
spin_onehalf_triangle_heisenbergJ1J2_sqrpeps.h). Oracle: brute-force
<psi|H|psi> of the same TPS."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.energy import ModelTensors
from peps_tpu.algorithm.exact_sum import all_configs, exact_sum_energy_gradient
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.models.spin import SquareLatticeModel, heisenberg_bond
from peps_tpu.tps import random_tps
from tests.ed_oracle import build_hamiltonian, energy_of_tps

pytestmark = pytest.mark.fast


def _exact_sum_energy(tps, model, chi):
    mt = ModelTensors.from_model(model, tps.dtype)
    ly, lx = tps.shape[0], tps.shape[1]
    configs = jnp.asarray(all_configs(ly, lx, tps.shape[2]))
    res = exact_sum_energy_gradient(
        tps, configs, mt, chi, TruncParams(chi, 1, 0.0), with_grad=False)
    return float(res.energy)


@pytest.mark.parametrize("ly,lx", [(2, 3), (3, 3)])
def test_triangle_j1j2_true_model_vs_brute_force(ly, lx):
    """The reference triangle J1-J2 Hamiltonian (J1: h+v+anti-diagonal,
    J2: diagonal + both sqrt5 families) evaluated by the trace machinery
    equals brute force to 1e-8."""
    model = spin.triangle_j1j2_heisenberg(1.0, 0.5)
    tps = random_tps(jax.random.PRNGKey(0), ly, lx, 2, 2,
                     dtype=jnp.float64, scale=0.7)
    e_ref = energy_of_tps(np.asarray(tps), model)
    e_xs = _exact_sum_energy(tps, model, chi=16)
    assert abs(e_xs - e_ref) < 1e-8 * max(abs(e_ref), 1.0), (e_xs, e_ref)


def test_tnn_traces_vs_brute_force():
    """Third-NN in-row and in-column couplings via ReplaceTNNSiteTrace
    machinery vs brute force (3x3, both orientations)."""
    hb = heisenberg_bond(0.7)
    model = SquareLatticeModel(2, h_h=heisenberg_bond(1.0),
                               h_v=heisenberg_bond(1.0),
                               h_tnn_h=hb, h_tnn_v=0.4 * hb,
                               name="tnn_test")
    tps = random_tps(jax.random.PRNGKey(1), 3, 3, 2, 2,
                     dtype=jnp.float64, scale=0.7)
    e_ref = energy_of_tps(np.asarray(tps), model)
    e_xs = _exact_sum_energy(tps, model, chi=16)
    assert abs(e_xs - e_ref) < 1e-8 * max(abs(e_ref), 1.0), (e_xs, e_ref)


def test_sqrt5_families_individually():
    """Each sqrt5 family alone agrees with brute force (catches index-order
    mistakes that cancel for symmetric Hamiltonians): use an ASYMMETRIC
    two-site coupling."""
    rng = np.random.default_rng(0)
    m = rng.normal(size=(4, 4))
    m = m + m.T                      # hermitian but NOT swap-symmetric
    h_asym = m.reshape(2, 2, 2, 2)
    for field in ("h_s5a", "h_s5b"):
        model = SquareLatticeModel(2, h_h=heisenberg_bond(1.0),
                                   **{field: h_asym}, name=f"s5_{field}")
        tps = random_tps(jax.random.PRNGKey(2), 3, 3, 2, 3,
                         dtype=jnp.float64, scale=0.7)
        e_ref = energy_of_tps(np.asarray(tps), model)
        e_xs = _exact_sum_energy(tps, model, chi=16)
        assert abs(e_xs - e_ref) < 1e-8 * max(abs(e_ref), 1.0), \
            (field, e_xs, e_ref)


def test_triangle_j1j2_ground_state_energy_reachable():
    """Sanity: the true model's ED ground energy on 3x3 is frustrated
    (higher per site than unfrustrated Heisenberg)."""
    model = spin.triangle_j1j2_heisenberg(1.0, 0.0)
    h = build_hamiltonian(model, 3, 3)
    import scipy.sparse.linalg as spla
    w = spla.eigsh(h, k=1, which="SA", return_eigenvectors=False)
    # triangular-lattice 3x3 OBC Heisenberg: between -6 and -4 per the
    # frustrated coordination (vs square-lattice -4.7493 for NN-only 3x3)
    assert -8.0 < float(w[0]) < -4.0, float(w[0])
