"""Simple update: imaginary-time evolution lowers true (exactly contracted)
energy toward the ED ground state on small lattices.

Reference analogue: simple-update integration tests + 2x2 golden data
(SURVEY.md §4.6, tests/test_data/SIMPLE_UPDATE_DATA_SPEC.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.peps import (PEPS, SimpleUpdateParams, fold_site_into_bonds,
                           product_peps, simple_update, to_tps)
from tests.ed_oracle import energy_of_tps, ground_energy


def neel_occupancy(ly, lx):
    return np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)


@pytest.mark.parametrize("ly,lx,D,tol", [(2, 2, 4, 2e-3), (2, 3, 4, 2e-2)])
def test_heisenberg_su_energy(ly, lx, D, tol):
    model = spin.heisenberg(1.0)
    e_ed = ground_energy(model, ly, lx)
    peps = product_peps(ly, lx, D, neel_occupancy(ly, lx), 2, dtype=jnp.float64)
    for tau in (0.2, 0.05, 0.01):
        res = simple_update(peps, model.h_h, model.h_v,
                            SimpleUpdateParams(steps=200, tau=tau,
                                               trunc=TruncParams(D, 1, 1e-12),
                                               energy_abs_tol=1e-9, min_steps=20))
        peps = res.peps
    e_true = energy_of_tps(np.asarray(to_tps(peps)), model)
    assert e_true < 0
    assert abs(e_true - e_ed) < tol * abs(e_ed), (e_true, e_ed)
    # the mean-field per-bond estimate should be in the right ballpark too
    assert abs(res.estimated_e0 - e_ed) < 0.15 * abs(e_ed)


def test_tfim_su_energy():
    ly, lx, D = 2, 3, 4
    model = spin.transverse_field_ising(1.0, 3.0)
    e_ed = ground_energy(model, ly, lx)
    hh, hv = fold_site_into_bonds(model.h_h, model.h_v, model.h_site, ly, lx)
    peps = product_peps(ly, lx, D, np.zeros((ly, lx), int), 2, dtype=jnp.float64)
    for tau in (0.1, 0.02):
        res = simple_update(peps, hh, hv,
                            SimpleUpdateParams(steps=300, tau=tau,
                                               trunc=TruncParams(D, 1, 1e-12),
                                               energy_abs_tol=1e-10, min_steps=20))
        peps = res.peps
    e_true = energy_of_tps(np.asarray(to_tps(peps)), model)
    assert abs(e_true - e_ed) < 2e-2 * abs(e_ed), (e_true, e_ed)


def test_su_preserves_boundary_padding():
    ly, lx, D = 2, 3, 3
    model = spin.heisenberg()
    peps = product_peps(ly, lx, D, neel_occupancy(ly, lx), 2, dtype=jnp.float64)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=5, tau=0.1,
                                           trunc=TruncParams(D, 1, 1e-12)))
    tps = np.asarray(to_tps(res.peps))
    from peps_tpu.lattice import boundary_mask
    mask = boundary_mask(ly, lx, 2, D)
    assert np.all(tps * (1 - mask) == 0.0)


# ---------------- PBC (torus) simple update ----------------

def test_pbc_product_state_roundtrip():
    """to_tps_pbc of a product PEPS reproduces the product amplitudes
    exactly under periodic contraction."""
    from peps_tpu.peps import product_peps_pbc, to_tps_pbc
    from peps_tpu.tps import exact_contract_pbc, project
    ly, lx, D = 2, 3, 3
    occ = neel_occupancy(ly, lx)
    peps = product_peps_pbc(ly, lx, D, occ, 2, dtype=jnp.float64)
    tps = to_tps_pbc(peps)
    amp = exact_contract_pbc(np.asarray(project(tps, jnp.asarray(occ))))
    assert abs(amp - 1.0) < 1e-12
    other = (occ + 1) % 2
    amp0 = exact_contract_pbc(np.asarray(project(tps, jnp.asarray(other))))
    assert abs(amp0) < 1e-12


def test_pbc_heisenberg_su_energy():
    """Torus simple update approaches the PBC ED ground state (reference:
    square_lattice_nn_simple_update.h Periodic ham-set branch). Loops on a
    torus bias the mean-field environment more than OBC (every site has
    coordination 4): measured plateau at 2x4/D=4 is ~3.7% of |E_ED|."""
    from peps_tpu.peps import product_peps_pbc, to_tps_pbc
    from tests.ed_oracle import energy_of_tps_pbc
    ly, lx, D, tol = 2, 4, 4, 5e-2
    model = spin.heisenberg(1.0)
    e_ed = ground_energy(model, ly, lx, periodic=True)
    peps = product_peps_pbc(ly, lx, D, neel_occupancy(ly, lx), 2,
                            dtype=jnp.float64)
    for tau in (0.2, 0.05, 0.01):
        res = simple_update(peps, model.h_h, model.h_v,
                            SimpleUpdateParams(steps=200, tau=tau,
                                               trunc=TruncParams(D, 1, 1e-12),
                                               energy_abs_tol=1e-9,
                                               min_steps=20))
        peps = res.peps
    e_true = energy_of_tps_pbc(np.asarray(to_tps_pbc(peps)), model)
    assert e_true < 0
    assert abs(e_true - e_ed) < tol * abs(e_ed), (e_true, e_ed)


@pytest.mark.smoke
@pytest.mark.parametrize("l", [2, 3, 4, 5, 6, 7])
def test_pbc_bond_groups_cover_all_bonds(l):
    """Every ring bond appears in exactly one group and every group is
    site-disjoint (regression for the odd-ring schedule dropping bond
    l-2: lambdas on that bond stayed frozen at one-hot)."""
    from peps_tpu.peps import _pbc_bond_groups
    groups = _pbc_bond_groups(l)
    bonds = [x for g in groups for x in g]
    assert sorted(bonds) == list(range(l))
    for g in groups:
        sites = [s for x in g for s in (x, (x + 1) % l)]
        assert len(sites) == len(set(sites)), (l, g)


def test_pbc_su_odd_ring_builds_entanglement():
    """On a 3x3 Heisenberg torus every bond lambda must leave one-hot
    after SU — with the dropped-bond schedule bug, lam_h[:, 2] and
    lam_v[2, :] stayed exactly one-hot forever."""
    from peps_tpu.peps import product_peps_pbc
    ly = lx = 3
    D = 3
    model = spin.heisenberg(1.0)
    peps = product_peps_pbc(ly, lx, D, neel_occupancy(ly, lx), 2,
                            dtype=jnp.float64)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=60, tau=0.1,
                                           trunc=TruncParams(D, 1, 1e-12)))
    lam_h = np.asarray(res.peps.lam_h)
    lam_v = np.asarray(res.peps.lam_v)
    # second singular value > 0 on EVERY bond (one-hot means it is 0)
    assert float(np.min(lam_h[:, :, 1])) > 1e-3, lam_h[:, :, 1]
    assert float(np.min(lam_v[:, :, 1])) > 1e-3, lam_v[:, :, 1]


@pytest.mark.parametrize("ly,lx,tol", [(2, 4, 3e-2), (3, 3, 3e-2)])
def test_pbc_su_tfim_with_site_fields(ly, lx, tol):
    """PBC SU with the uniform-coordination site folding (z=4 on a torus).
    3x3 has odd rings, exercising the 3-group wrap-bond schedule (the
    unfrustrated TFIM isolates the schedule from odd-torus spin
    frustration; measured errors 0.6% / 1.3%)."""
    from peps_tpu.peps import product_peps_pbc, to_tps_pbc
    from tests.ed_oracle import energy_of_tps_pbc
    D = 4
    model = spin.transverse_field_ising(1.0, 3.0)
    e_ed = ground_energy(model, ly, lx, periodic=True)
    d = 2
    eye = np.eye(d)
    hs = np.asarray(model.h_site)
    # torus: every site has coordination 4 -> 1/4 of the field per bond end
    hb = (np.asarray(model.h_h) + np.einsum("ac,bd->abcd", hs / 4, eye)
          + np.einsum("ac,bd->abcd", eye, hs / 4))
    peps = product_peps_pbc(ly, lx, D, np.zeros((ly, lx), int), d,
                            dtype=jnp.float64)
    for tau in (0.1, 0.02):
        res = simple_update(peps, hb, hb,
                            SimpleUpdateParams(steps=300, tau=tau,
                                               trunc=TruncParams(D, 1, 1e-12),
                                               energy_abs_tol=1e-10,
                                               min_steps=20))
        peps = res.peps
    e_true = energy_of_tps_pbc(np.asarray(to_tps_pbc(peps)), model)
    assert abs(e_true - e_ed) < tol * abs(e_ed), (e_true, e_ed)
