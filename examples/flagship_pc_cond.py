"""Support-conditioned pair-correlation pass for the 6x6 t-J flagship.

The brute-force <Delta^dag Delta> estimator is supported on configurations
with both holes on one bond (~0.2% of samples at this doping), so the
published decay entries were zero-consistent at any affordable statistics
(VERDICT r4 weak #2). This pass conditions the sampler on the bound-pair
sector and reassembles the unconditioned answer exactly:

    C = P(A) * E[table | A]

* A = "the two holes are Chebyshev-adjacent" (diagonals INCLUDED: with
  strict-NN conditioning the pair cannot move through ordinary sweep
  moves; through diagonal intermediates it diffuses everywhere).
* The conditioned chain is the ordinary env-shared graded sweep with the
  HARD hole-attraction dress (kappa=50): unbinding moves get acceptance
  exactly 0, in-sector moves have delta-J = 0 — i.e. |psi|^2 restricted
  to A, no reweighting. Validated against the exact sector sum on a 2x4
  ladder (tests/test_pair_corr.py::test_conditioned_pair_corr_matches_
  exact_sum).
* P(A) is counted from an UNCONDITIONED run — config inspection only, no
  tables, no energies, so counting samples are ~50x cheaper than
  measured samples.

Every conditioned sample supports the estimator (the old pass wasted
99.8% of its walker evaluations on zero table rows), so at equal wall
clock the error on the d=2 entries shrinks by ~sqrt(1/P(A)).

Usage: python examples/flagship_pc_cond.py [n_cond] [n_count] [cpu]
Resumable per block (re-run after a tunnel drop). Updates summary.json
with pair_corr_{row,col}_decay_cond fields.

Reference diagnostic: singlet_pair_correlation_measurement_mixin.h.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_flagship")
COND_DIR = os.path.join(OUT_DIR, "pc_cond")


def make_adjacent(cfg):
    """Relocate the holes of one config to a horizontally adjacent pair
    (swap contents), for conditioned-chain starts."""
    cfg = np.array(cfg)
    holes = np.argwhere(cfg == 0)
    if len(holes) != 2:
        return cfg
    (y0, x0), (y1, x1) = holes
    if max(abs(y0 - y1), abs(x0 - x1)) <= 1:
        return cfg
    ty, tx = (y0, x0 + 1) if x0 + 1 < cfg.shape[1] else (y0, x0 - 1)
    cfg[y1, x1], cfg[ty, tx] = cfg[ty, tx], cfg[y1, x1]
    return cfg


def main(n_cond=200, n_count=2000, cpu=False):
    from peps_tpu.algorithm.measure_fermion import (
        graded_env_shared, tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.peps import FermionSpace, space_for_model
    from peps_tpu.fermion.vmc import GradedFermionModel
    from peps_tpu.fermion.sweep import mc_sweep_fermion_shared
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.montecarlo.jastrow import (hole_attraction_dress,
                                             holes_adjacent)
    from peps_tpu.montecarlo.statistics import mean_and_binned_error_batch

    os.makedirs(COND_DIR, exist_ok=True)
    ly = lx = 6
    chi, nchains = 32, 32
    model = tj_model(3.0, 1.0)
    space4 = space_for_model(model, 4)
    space8 = FermionSpace(space4.phys_parity, 4, 4)
    hole_vals = [1.0, 0.0, 0.0]

    z = np.load(os.path.join(OUT_DIR, "vmc.npz"))
    state = jnp.asarray(z["lowest_state"])
    gm = GradedFermionModel.from_model(model, space8, state.dtype)
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    # chain starts: last sample of the brute pc pass when present, else the
    # VMC final configs — either way equilibrated w.r.t. |psi|^2, which is
    # what phase A's unconditioned counting chain needs
    pc_cfg_path = os.path.join(OUT_DIR, "pc160_configs_vmc.npz")
    if os.path.exists(pc_cfg_path):
        base_cfgs = np.load(pc_cfg_path)["configs"][-1]
    else:
        base_cfgs = np.asarray(z["final_configs"])
    t0 = time.time()

    # ---------------- phase A: P(A) by counting (unconditioned) ----------
    @partial(jax.jit, static_argnames=("ns",))
    def count_block(cfgs, k, ns):
        def body(carry, _):
            cfgs, k = carry
            ks = jax.random.split(k, nchains + 1)
            cfgs, _, _ = jax.vmap(
                mc_sweep_fermion_shared,
                in_axes=(None, None, 0, 0, None, None))(
                state, gm.space, cfgs, ks[1:], chi, trunc)
            ind = jax.vmap(lambda c: holes_adjacent(
                c, jnp.asarray(hole_vals)))(cfgs)
            return (cfgs, ks[0]), ind
        (cfgs, _), inds = jax.lax.scan(body, (cfgs, k), None, length=ns)
        return cfgs, inds

    # small blocks: the TPU worker behind the tunnel can crash mid-dispatch
    # (seen round 5); ~25 s dispatches bound the loss and the retry loop
    # resumes from the last finished block
    blk = 50
    n_blocks_a = -(-n_count // blk)
    cfgs_cur = jnp.asarray(base_cfgs)
    ind_parts = []
    for bi in range(n_blocks_a):
        bpath = os.path.join(COND_DIR, f"count_{blk}_{bi:03d}.npz")
        if os.path.exists(bpath):
            zb = np.load(bpath)
            ind_parts.append(zb["inds"])
            cfgs_cur = jnp.asarray(zb["last"])
            continue
        cfgs_cur, inds = count_block(
            cfgs_cur, jax.random.fold_in(jax.random.PRNGKey(31), bi), blk)
        inds = np.asarray(inds)
        np.savez(bpath, inds=inds, last=np.asarray(cfgs_cur))
        ind_parts.append(inds)
        print(f"[count] block {bi + 1}/{n_blocks_a} "
              f"({time.time() - t0:.0f}s)", flush=True)
    inds = np.concatenate(ind_parts, axis=0)[:, :, None]
    pa_m, pa_e = mean_and_binned_error_batch(jnp.asarray(inds))
    pa, pa_err = float(pa_m[0]), float(pa_e[0])
    print(f"P(A_fat) = {pa:.5f} +- {pa_err:.5f} "
          f"({inds.shape[0] * nchains} counting samples)", flush=True)

    # ---------------- phase B: conditioned tables ------------------------
    hard = hole_attraction_dress(hole_vals, ly, lx, 50.0, diagonal=True)

    @partial(jax.jit, static_argnames=("warm", "ns"))
    def cond_block(cfgs, k, warm, ns):
        def body(carry, _):
            cfgs, k = carry
            ks = jax.random.split(k, nchains + 1)
            cfgs, _, _ = jax.vmap(
                lambda c, kk: mc_sweep_fermion_shared(
                    state, gm.space, c, kk, chi, trunc, dress=hard))(
                cfgs, ks[1:])
            return (cfgs, ks[0]), cfgs
        (cfgs, _), trail = jax.lax.scan(body, (cfgs, k), None,
                                        length=warm + ns)
        return cfgs, trail[warm:]

    @jax.jit
    def pc_walkers(cs):
        def one(c):
            bundle = graded_env_shared(state, c, gm.space, chi, trunc)
            return (tj_singlet_pair_corr_graded_rowshared(
                        state, c, gm.space, chi, trunc, shared=bundle),
                    tj_singlet_pair_corr_graded_colshared(
                        state, c, gm.space, chi, trunc, shared=bundle))
        return jax.lax.map(one, cs, batch_size=8)

    cfgs_b = jnp.asarray(np.stack([make_adjacent(c) for c in base_cfgs]))
    blk_b = 10
    n_blocks_b = -(-n_cond // blk_b)
    rows_l, cols_l = [], []
    for bi in range(n_blocks_b):
        bpath = os.path.join(COND_DIR, f"cond_{blk_b}_{bi:03d}.npz")
        if os.path.exists(bpath):
            zb = np.load(bpath)
            rows_l.append(zb["rows"]); cols_l.append(zb["cols"])
            cfgs_b = jnp.asarray(zb["last"])
            continue
        cfgs_b, trail = cond_block(
            cfgs_b, jax.random.fold_in(jax.random.PRNGKey(37), bi),
            20 if bi == 0 else 0, blk_b)
        trail = np.asarray(trail)
        # sanity: conditioning held
        for c in trail[-1]:
            assert float(holes_adjacent(jnp.asarray(c),
                                        jnp.asarray(hole_vals))) > 0.5
        flat = jnp.asarray(trail.reshape(-1, ly, lx))
        # sub-chunked dispatches (~20 s each) for the same crash-resilience
        # reason as blk above
        parts = [jax.tree.map(np.asarray, pc_walkers(flat[i:i + 80]))
                 for i in range(0, flat.shape[0], 80)]
        r = np.concatenate([p[0] for p in parts], axis=0)
        c = np.concatenate([p[1] for p in parts], axis=0)
        r = r.reshape((blk_b, nchains) + r.shape[1:])
        c = c.reshape((blk_b, nchains) + c.shape[1:])
        np.savez(bpath, rows=r, cols=c, last=np.asarray(cfgs_b))
        rows_l.append(r); cols_l.append(c)
        print(f"[cond] block {bi + 1}/{n_blocks_b} "
              f"({time.time() - t0:.0f}s)", flush=True)

    def bond_decay(parts, nlines, nb):
        """Translation-averaged decay: per SAMPLE, average every
        (line, i, j) entry at bond distance |i - j| = d, then bin the
        per-sample scalars over the chain trajectories. Averaging inside
        the sample handles cross-entry correlation exactly; binning
        handles autocorrelation. (The first aggregation attempt weighted
        ENTRIES by their own inverse variance — on sparse heavy-tailed
        tables that returns the minimum-variance entry, i.e. whichever
        entry saw only numerical dust, not the translation average.)"""
        a = np.concatenate(parts, axis=0).astype(np.float64)   # [S,C,l,i,j]
        decay, decay_err = {}, {}
        for dist in range(2, nb):
            mask = np.abs(np.subtract.outer(np.arange(nb),
                                            np.arange(nb))) == dist
            u = a[:, :, :, mask].mean(axis=(2, 3))             # [S, C]
            mv, ev = mean_and_binned_error_batch(
                jnp.asarray(u[:, :, None]))
            m, e = float(mv[0]), float(ev[0])
            # C = P(A) * E[.|A]; independent runs -> quadrature
            decay[dist] = float(f"{pa * m:.3g}")
            decay_err[dist] = float(
                f"{float(np.sqrt((pa * e) ** 2 + (m * pa_err) ** 2)):.3g}")
        return decay, decay_err

    ns_b = sum(p.shape[0] for p in rows_l) * nchains
    rd, rde = bond_decay(rows_l, ly, lx - 1)
    cd, cde = bond_decay(cols_l, lx, ly - 1)
    spath = os.path.join(OUT_DIR, "summary.json")
    summary = json.load(open(spath)) if os.path.exists(spath) else {}
    summary.update({
        "pa_fat_adjacent": float(f"{pa:.4g}"),
        "pa_fat_adjacent_err": float(f"{pa_err:.4g}"),
        "n_pc_cond_samples": ns_b,
        "n_count_samples": int(inds.shape[0] * nchains),
        "pair_corr_row_decay_cond": rd,
        "pair_corr_row_decay_cond_err": rde,
        "pair_corr_col_decay_cond": cd,
        "pair_corr_col_decay_cond_err": cde,
        "pair_corr_cond_note": (
            "Support-conditioned estimator: C = P(A) * E[table|A]; "
            "hard Chebyshev-adjacency conditioning via the "
            "hole-attraction dress, P(A) from table-free counting. "
            "Per-sample translation average at each bond distance, "
            "binned over trajectories; supersedes the zero-consistent "
            "brute-force decay fields."),
        # keep the compute run's wall when this invocation only
        # re-aggregated existing blocks
        "wall_pc_cond_s": max(round(time.time() - t0, 1),
                              summary.get("wall_pc_cond_s", 0.0)),
    })
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps({k: summary[k] for k in (
        "pa_fat_adjacent", "pair_corr_row_decay_cond",
        "pair_corr_row_decay_cond_err", "pair_corr_col_decay_cond",
        "pair_corr_col_decay_cond_err")}, indent=1), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "cpu"]
    cpu = "cpu" in sys.argv[1:]
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT_DIR), "..",
                                   ".jax_cache"))
    main(n_cond=int(args[0]) if args else 200,
         n_count=int(args[1]) if len(args) > 1 else 2000, cpu=cpu)
