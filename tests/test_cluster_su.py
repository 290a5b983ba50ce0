"""3-site cluster simple update: NNN (J1-J2) and triangle models.

Reference analogue: NNN / triangle simple-update executors (SURVEY.md §2.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.peps import SimpleUpdateParams, product_peps, to_tps
from peps_tpu.peps_cluster import simple_update_nnn, simple_update_triangle
from tests.ed_oracle import energy_of_tps, ground_energy


def neel(ly, lx):
    return np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)


@pytest.mark.parametrize("model,tol", [
    (spin.j1j2_xxz(1.0, 1.0, 0.3, 0.3), 0.05),
    (spin.triangle_heisenberg(1.0), 0.08),
])
def test_nnn_cluster_su_lowers_energy(model, tol):
    ly, lx, D = 2, 3, 4
    e_ed = ground_energy(model, ly, lx)
    peps = product_peps(ly, lx, D, neel(ly, lx), 2, dtype=jnp.float64)
    res = peps
    for tau in (0.2, 0.05):
        out = simple_update_nnn(res if isinstance(res, type(peps)) else res.peps,
                                model,
                                SimpleUpdateParams(steps=120, tau=tau,
                                                   trunc=TruncParams(D, 1, 1e-12),
                                                   energy_abs_tol=1e-9,
                                                   min_steps=20))
        res = out
    e_true = energy_of_tps(np.asarray(to_tps(out.peps)), model)
    assert e_true < 0
    assert abs(e_true - e_ed) < tol * abs(e_ed), (e_true, e_ed)


def test_triangle_cluster_su_runs_and_improves():
    model = spin.triangle_heisenberg(1.0)
    ly, lx, D = 3, 3, 4
    e_ed = ground_energy(model, ly, lx)
    peps = product_peps(ly, lx, D, neel(ly, lx), 2, dtype=jnp.float64)
    e_start = energy_of_tps(np.asarray(to_tps(peps)), model)
    out = simple_update_triangle(peps, model,
                                 SimpleUpdateParams(steps=120, tau=0.1,
                                                    trunc=TruncParams(D, 1, 1e-12)))
    e_end = energy_of_tps(np.asarray(to_tps(out.peps)), model)
    assert e_end < e_start
    assert abs(e_end - e_ed) < 0.15 * abs(e_ed), (e_start, e_end, e_ed)


def test_triangle_j1j2_su_step_matches_exact_evolution():
    """The h_ad (J2) anti-diagonal term must actually be evolved (advisor
    finding: it was read but never applied). Oracle: one untruncated
    triangle-SU step at small tau must match exact exp(-tau H)|psi> on the
    FULL J1-J2 Hamiltonian with per-step infidelity scaling like the
    Trotter error (~tau^4 for 1-|overlap| after one step)."""
    import scipy.linalg as sla
    from tests.ed_oracle import build_hamiltonian, wavefunction_from_tps

    ly, lx, D = 2, 3, 8      # D=8: no truncation on 2x3
    model = spin.triangle_j1j2_nnn(1.0, 0.5)
    h = build_hamiltonian(model, ly, lx).toarray()
    peps = product_peps(ly, lx, D, neel(ly, lx), 2, dtype=jnp.float64)
    psi0 = wavefunction_from_tps(np.asarray(to_tps(peps)))
    psi0 = psi0 / np.linalg.norm(psi0)
    errs = []
    for tau in (0.05, 0.025):
        out = simple_update_triangle(
            peps, model,
            SimpleUpdateParams(steps=1, tau=tau, trunc=TruncParams(D, 1, 0.0)))
        psi1 = wavefunction_from_tps(np.asarray(to_tps(out.peps)))
        psi1 = psi1 / np.linalg.norm(psi1)
        psi_ex = sla.expm(-tau * h) @ psi0
        psi_ex = psi_ex / np.linalg.norm(psi_ex)
        errs.append(1.0 - abs(np.vdot(psi_ex, psi1)))
    assert errs[0] < 1e-6, errs
    # halving tau must cut the infidelity by ~16x (allow slack: >=8x)
    assert errs[1] < errs[0] / 8.0, errs
