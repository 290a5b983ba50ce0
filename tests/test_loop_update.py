"""Loop update: plaquette evolution with weighted-trace-gauge truncation.

Reference analogue: loop-update tests (SURVEY.md §2.5 LoopUpdateExecutor)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.linalg import TruncParams
from peps_tpu.loop_update import LoopUpdateParams, loop_update
from peps_tpu.models import spin
from peps_tpu.peps import SimpleUpdateParams, product_peps, simple_update, to_tps
from tests.ed_oracle import energy_of_tps, ground_energy


def _su_state():
    model = spin.heisenberg(1.0)
    ly, lx, D = 2, 3, 4
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)
    peps = product_peps(ly, lx, D, occ, 2, dtype=jnp.float64)
    res = simple_update(peps, model.h_h, model.h_v,
                        SimpleUpdateParams(steps=30, tau=0.2,
                                           trunc=TruncParams(D, 1, 1e-12)))
    return model, res.peps, D


def test_loop_update_identity_preserves_state():
    """tau=0 plaquette steps (grow + weighted truncation + regauge) must be
    exactly state-preserving — validates the whole kernel chain."""
    model, peps, D = _su_state()
    e0 = energy_of_tps(np.asarray(to_tps(peps)), model)
    out = loop_update(peps, model.h_h, model.h_v,
                      LoopUpdateParams(steps=3, tau=0.0, bond_dim=D,
                                       fet_sweeps=1))
    e1 = energy_of_tps(np.asarray(to_tps(out.peps)), model)
    assert abs(e1 - e0) < 1e-8, (e0, e1)


def test_loop_update_single_step_improves():
    """One small-tau loop step lowers the variational energy (the one-shot
    weighted truncation is EXPERIMENTAL for long evolutions: the reference's
    CG-based full-environment truncation is future work — and the reference
    itself flags loop update as abandoned for efficiency,
    docs/dev/design/arch/overview_cn.md §2)."""
    model, peps, D = _su_state()
    e0 = energy_of_tps(np.asarray(to_tps(peps)), model)
    out = loop_update(peps, model.h_h, model.h_v,
                      LoopUpdateParams(steps=1, tau=0.05, bond_dim=D,
                                       fet_sweeps=1))
    e1 = energy_of_tps(np.asarray(to_tps(out.peps)), model)
    assert e1 < e0, (e0, e1)


@pytest.mark.slow
def test_loop_update_long_evolution_reaches_su_quality():
    """4x4 Heisenberg, >= 100 CG-FET loop steps from a short-SU warm start:
    the evolution must reach an energy at or below the fully converged
    simple-update energy at the same D and stay stable (finite, no
    blow-up). Best-state tracking mirrors the reference executors'
    convergence-stop machinery (simple_update.h:34-79): at fixed tau the
    truncation-noise equilibrium sits near e_su, and the best state along
    the trajectory is the executor's product."""
    model = spin.heisenberg(1.0)
    ly = lx = 4
    D = 4
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)
    peps0 = product_peps(ly, lx, D, occ, 2, dtype=jnp.float64)
    su = simple_update(peps0, model.h_h, model.h_v,
                       SimpleUpdateParams(steps=400, tau=0.05,
                                          trunc=TruncParams(D, 1, 1e-12),
                                          energy_abs_tol=1e-9, min_steps=50))
    e_su = energy_of_tps(np.asarray(to_tps(su.peps)), model)

    # loop update from a SHORT simple-update warm start (same protocol as
    # the reference executor: SU init, then loop refinement)
    warm = simple_update(peps0, model.h_h, model.h_v,
                         SimpleUpdateParams(steps=60, tau=0.2,
                                            trunc=TruncParams(D, 1, 1e-12)))
    peps = warm.peps
    energies = []
    best_e, best_peps = np.inf, peps
    for chunk in range(12):                    # 120 steps total
        out = loop_update(peps, model.h_h, model.h_v,
                          LoopUpdateParams(steps=10, tau=0.05, bond_dim=D,
                                           fet_cg_iters=25,
                                           fet_alternations=2))
        peps = out.peps
        e = energy_of_tps(np.asarray(to_tps(peps)), model)
        energies.append(e)
        if e < best_e:
            best_e, best_peps = e, peps
    e_ed = ground_energy(model, ly, lx)
    assert np.all(np.isfinite(energies)), energies
    # loop update BEATS converged simple update (the method's entire point,
    # PRB 102,075147): strictly below e_su and strictly closer to ED
    assert best_e < e_su - 1e-4, (best_e, e_su, e_ed, energies)
    assert abs(best_e - e_ed) < abs(e_su - e_ed), (best_e, e_su, e_ed)
    # stability: the fixed-tau equilibrium stays in a tight band around
    # e_su (no runaway degradation, the old fet_sweeps=2 failure mode)
    assert energies[-1] < e_su + 0.05, (energies[-1], e_su)
