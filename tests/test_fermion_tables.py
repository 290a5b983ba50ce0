"""Environment-shared fermionic ratio tables vs the full-recompute oracle
(reference: fermionic Replace*Trace inside BMPSContractor with the local
psi recompute contract, fermion-sign-in-bmps-contraction.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peps_tpu.algorithm.exact_sum import sector_configs
from peps_tpu.fermion.peps import (fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion)
from peps_tpu.fermion.tables import fermion_ratio_tables
from peps_tpu.fermion.vmc import (_replaced_ratio_tables,
                                  log_abs_psi_fermion)
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import spinless_fermion, tj_model
from peps_tpu.peps import SimpleUpdateParams

pytestmark = pytest.mark.fast

CASES = [
    (spinless_fermion(1.0, 0.5), 2, 3, 4,
     np.array([[1, 0, 0], [0, 0, 1]]), {1: 2, 0: 4}),
    # 3 rows: exercises the ODD-row snake direction (prefix flips on the
    # LEFT side of the two-row window)
    (spinless_fermion(1.0), 3, 3, 2,
     np.array([[1, 0, 1], [0, 0, 0], [1, 0, 1]]), {1: 4, 0: 5}),
    (tj_model(3.0, 1.0), 2, 2, 4, np.array([[1, 2], [2, 1]]), {1: 2, 2: 2}),
]


@pytest.mark.parametrize("case", CASES, ids=["spinless2x3", "spinless3x3",
                                             "tj2x2"])
def test_env_shared_tables_match_full_recompute(case):
    model, ly, lx, D, occ0, secs = case
    space = space_for_model(model, D)
    peps = product_fermion_peps(ly, lx, space, occ0)
    out = fermion_simple_update(
        peps, model, space,
        SimpleUpdateParams(steps=40, tau=0.2, trunc=TruncParams(D, 1,
                                                                1e-12)))
    tps = to_tps_fermion(out.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    chi = 16
    tp = TruncParams(chi, 1, 0.0, scheme="fast")
    configs = sector_configs(ly, lx, secs)
    d = model.phys_dim
    ppar = np.array([(model.n_up[i] + model.n_dn[i]) % 2 for i in range(d)],
                    dtype=int)
    pc_pair = (ppar[:, None] + ppar[None, :]) % 2
    checked = 0
    for cfg in configs[:8]:
        cfg = jnp.asarray(cfg)
        log0, mant0 = log_abs_psi_fermion(tps, cfg, space, chi, tp)
        if float(log0) < -20:      # zero-amplitude config: zero-weighted
            continue
        rh0, rv0, rd0, rad0 = _replaced_ratio_tables(
            tps, cfg, space, chi, tp, log0, mant0, want_diag=True)
        t = fermion_ratio_tables(tps, cfg, space, chi, tp, want_diag=True)
        cfg_np = np.asarray(cfg)
        for a, b, c1, c2 in ((rh0, t.ratio_h, cfg_np[:, :lx - 1],
                              cfg_np[:, 1:]),
                             (rv0, t.ratio_v, cfg_np[:ly - 1], cfg_np[1:]),
                             (rd0, t.ratio_d, cfg_np[:ly - 1, :lx - 1],
                              cfg_np[1:, 1:]),
                             (rad0, t.ratio_ad, cfg_np[1:, :lx - 1],
                              cfg_np[:ly - 1, 1:])):
            a, b = np.asarray(a), np.asarray(b)
            for idx in np.ndindex(a.shape[:2]):
                # only parity-conserving entries carry physics (others
                # multiply vanishing Hamiltonian elements)
                mask = pc_pair == (ppar[c1[idx]] + ppar[c2[idx]]) % 2
                err = np.abs(a[idx] - b[idx])[mask].max()
                assert err < 1e-6, (idx, err)
        checked += 1
    assert checked >= 3
