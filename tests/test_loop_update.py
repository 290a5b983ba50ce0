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


def test_exponential_ring_split_exact():
    """The kExponential gate's chain-SVD split (loop_update.h:35-37,86) must
    reproduce exp(-tau H_plaq) EXACTLY when the four ring site-operators are
    recontracted: op1(k12) op2(k12,k23) op3(k23,k34) op4(k34) with the chain
    indices riding the ring bonds."""
    from peps_tpu.loop_update import (_embed_pair, _ring_ops_exponential,
                                      expm_taylor)
    model = spin.heisenberg(1.0)
    hh = np.asarray(model.h_h, np.float64)
    hv = np.asarray(model.h_v, np.float64)
    d, tau, w = 2, 0.13, (1.0, 0.7, 1.3, 0.9)
    op1, op2, op3, op4 = _ring_ops_exponential(hh, hv, tau, w, d)
    g = np.einsum("apq,bars,cbtu,cvw->pqrstuvw", op1[:, 0], op2, op3,
                  op4[0])
    g = g.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(d ** 4, d ** 4)
    h_plaq = (_embed_pair(hh * w[0], 0, 1, d)
              + _embed_pair(hv * w[1], 1, 2, d)
              + _embed_pair(hh * w[2], 3, 2, d)
              + _embed_pair(hv * w[3], 0, 3, d))
    ref = np.asarray(expm_taylor(jnp.asarray(-tau * h_plaq, jnp.float64)))
    assert np.abs(g - ref).max() < 1e-13


def test_loop_update_exponential_identity_preserves_state():
    """tau=0 exponential-gate steps must be state-preserving — validates the
    4-operator absorb path (non-uniform ring-bond growth k=(1,d^2,d^4,d^2))
    through truncation and regauging."""
    model, peps, D = _su_state()
    e0 = energy_of_tps(np.asarray(to_tps(peps)), model)
    out = loop_update(peps, model.h_h, model.h_v,
                      LoopUpdateParams(steps=2, tau=0.0, bond_dim=D,
                                       gate_type="exponential"))
    e1 = energy_of_tps(np.asarray(to_tps(out.peps)), model)
    assert abs(e1 - e0) < 1e-8, (e0, e1)


def test_loop_update_exponential_exact_on_2x2():
    """On a single plaquette (2x2) the exponential gate IS the exact
    propagator: N steps from a product state must match exp(-N tau H)
    applied by ED, up to bond truncation at D=4 (exactly representable)."""
    from scipy.linalg import expm

    from tests.ed_oracle import build_hamiltonian, wavefunction_from_tps
    model = spin.heisenberg(1.0)
    ly = lx = 2
    D, tau, n_steps = 4, 0.05, 10
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)
    peps = product_peps(ly, lx, D, occ, 2, dtype=jnp.float64)
    out = loop_update(peps, model.h_h, model.h_v,
                      LoopUpdateParams(steps=n_steps, tau=tau, bond_dim=D,
                                       gate_type="exponential"))
    psi = wavefunction_from_tps(np.asarray(to_tps(out.peps)))
    psi /= np.linalg.norm(psi)
    H = np.asarray(build_hamiltonian(model, ly, lx).todense())
    ref = expm(-n_steps * tau * H) @ wavefunction_from_tps(
        np.asarray(to_tps(peps)))
    ref /= np.linalg.norm(ref)
    fid = abs(np.vdot(psi, ref))
    assert fid > 1 - 1e-8, fid


@pytest.mark.slow
def test_loop_update_exponential_at_least_first_order_quality():
    """4x4 Heisenberg at equal tau: the exponential gate (no intra-plaquette
    Trotter error) must reach an energy <= the first-order gate's best
    energy (+ truncation-noise tolerance) over the same short trajectory
    from the same warm start (reference loop_update.h:35-37 kExponential vs
    kFirstOrder)."""
    model = spin.heisenberg(1.0)
    ly = lx = 4
    D = 4
    occ = np.fromfunction(lambda y, x: (y + x) % 2, (ly, lx), dtype=int)
    peps0 = product_peps(ly, lx, D, occ, 2, dtype=jnp.float64)
    warm = simple_update(peps0, model.h_h, model.h_v,
                         SimpleUpdateParams(steps=60, tau=0.2,
                                            trunc=TruncParams(D, 1, 1e-12)))
    best = {}
    for gate_type in ("first", "exponential"):
        peps, best_e = warm.peps, np.inf
        for _ in range(4):                     # 20 steps, tracked in chunks
            out = loop_update(peps, model.h_h, model.h_v,
                              LoopUpdateParams(steps=5, tau=0.05,
                                               bond_dim=D,
                                               gate_type=gate_type))
            peps = out.peps
            e = energy_of_tps(np.asarray(to_tps(peps)), model)
            best_e = min(best_e, e)
        best[gate_type] = best_e
    assert np.isfinite(best["exponential"]), best
    assert best["exponential"] <= best["first"] + 2e-4, best


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
