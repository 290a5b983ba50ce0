"""Flagship fermionic pipeline: 6x6 t-J with 2 holes, D=8 graded VMC.

Mirrors the reference's flagship fixture configuration
(tests/test_data/tps_tJ_6x6Hole2_J0.3_D8_fU1: 6x6, 2 holes, J=0.3, D=8,
fermionic U(1) tensors) end to end on TPU:

1. graded simple update at D=4 with U(1)-resolved truncation (exact
   particle-number conservation) from a 2-hole product start;
2. parity-block bond expansion D=4 -> 8 (qlten Expand analogue) with
   even-sector noise to seed the enlarged variational space;
3. SR VMC on the graded state (env-shared sweep, AD holes, CG natural
   gradient) at fixed particle number;
4. Monte Carlo measurement incl. the singlet pair correlators
   <Delta^dag Delta> (the reference's superconducting-order diagnostic,
   singlet_pair_correlation_measurement_mixin.h).

Run: python examples/flagship_tj_6x6.py [quick|cpu] [resume]
Phase checkpoints land in examples/out_flagship/; `resume` skips SU+VMC
and re-enters at the measurement phase from the saved lowest state.
`cpu` forces the CPU backend and runs a reduced configuration
(chi=24, 16 chains, 60 SR iterations) sized for an 8-vCPU host — the
fallback used when the TPU tunnel is down.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from peps_tpu.algorithm.mc_evaluator import MCParams
from peps_tpu.algorithm.measure import MeasurementParams, measure
from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
from peps_tpu.fermion.peps import (FermionSpace, expand_bond_dim_graded,
                                   fermion_simple_update,
                                   product_fermion_peps, space_for_model,
                                   to_tps_fermion, u1_charges_for)
from peps_tpu.fermion.vmc import GradedFermionModel
from peps_tpu.linalg import TruncParams
from peps_tpu.models.fermion import tj_model
from peps_tpu.optimizer import optimizer as opt
from peps_tpu.optimizer.cg import CGParams
from peps_tpu.peps import SimpleUpdateParams


OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_flagship")


def main(quick=False, resume=False, cpu=False, nopc=False):
    ly = lx = 6
    d_su, d_vmc = 4, 8
    chi = 24 if cpu else 32
    t, j_ex = 3.0, 1.0
    model = tj_model(t, j_ex)
    nchains = 16 if cpu else 32
    n_iters_full = 60 if cpu else 120
    n_meas_full = 60 if cpu else 100
    n_pc_full = 12 if cpu else 160

    # 2-hole doping: holes at (2,2) and (3,2); Neel-ish spin background
    occ0 = (np.indices((ly, lx)).sum(0) % 2 + 1).astype(int)  # 1/2 checker
    occ0[2, 2] = 0   # removes an up spin
    occ0[3, 2] = 0   # removes a down spin -> Sz = 0 at 2 holes
    n_up = int((occ0 == 1).sum())
    n_dn = int((occ0 == 2).sum())
    print(f"== {ly}x{lx} t-J, t={t} J={j_ex}, N_up={n_up} N_dn={n_dn} "
          f"holes={ly * lx - n_up - n_dn} ==", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    name = "vmc_quick.npz" if quick else ("vmc_cpu.npz" if cpu else "vmc.npz")
    ckpt = os.path.join(OUT_DIR, name)
    space4 = space_for_model(model, d_su)
    space8 = FermionSpace(space4.phys_parity, 4, 4)
    n_sites = ly * lx

    if resume and os.path.exists(ckpt):
        z = np.load(ckpt)
        lowest_state = jnp.asarray(z["lowest_state"])
        final_configs = jnp.asarray(z["final_configs"])
        lowest_energy = float(z["lowest_energy"])
        t_su = float(z["t_su"])
        t_vmc = float(z["t_vmc"])
        gm = GradedFermionModel.from_model(model, space8, lowest_state.dtype)
        print(f"resumed from {ckpt}: lowest {lowest_energy:.4f} "
              f"({lowest_energy / n_sites:.5f}/site)", flush=True)
    else:
        t0 = time.time()
        charges = u1_charges_for(model, space4, occ0)
        peps = product_fermion_peps(ly, lx, space4, occ0)
        sched = [(40, 0.2), (40, 0.05)] if quick else [(120, 0.2),
                                                       (120, 0.05),
                                                       (80, 0.02)]
        for steps, tau in sched:
            out = fermion_simple_update(
                peps, model, space4,
                SimpleUpdateParams(steps=steps, tau=tau,
                                   trunc=TruncParams(d_su, 1, 1e-12)),
                charges=charges)
            peps = out.peps
        t_su = time.time() - t0
        print(f"SU(D={d_su}, U1) done in {t_su:.0f}s, "
              f"E0~{out.estimated_e0:.4f}", flush=True)

        tps4 = to_tps_fermion(peps).astype(jnp.float32)
        tps4 = tps4 / jnp.max(jnp.abs(tps4))
        tps = expand_bond_dim_graded(tps4, space4, space8, noise=1e-3,
                                     key=jax.random.PRNGKey(11))
        gm = GradedFermionModel.from_model(model, space8, tps.dtype)

        t0 = time.time()
        n_iters = 10 if quick else n_iters_full
        vp = VMCParams(
            chi=chi, trunc=TruncParams(chi, 1, 1e-6, scheme="sketch"),
            mc=MCParams(num_samples=1,
                        num_warmup_sweeps=30 if quick else 100,
                        nchains=nchains, eval_chunk=8),
            optimizer=opt.OptimizerParams(
                max_iters=n_iters,
                algorithm=opt.SRParams(cg=CGParams(max_iter=40, tol=1e-5),
                                       diag_shift=1e-3),
                lr=0.05),
            occupancy=((0, ly * lx - n_up - n_dn), (1, n_up), (2, n_dn)))
        res = vmc_optimize(tps, gm, vp, jax.random.PRNGKey(5))
        t_vmc = time.time() - t0
        print(f"VMC(SR, D={d_vmc}) {n_iters} iters in {t_vmc:.0f}s: "
              f"E = {res.energies[-1]:.4f}, lowest {res.lowest_energy:.4f} "
              f"({res.lowest_energy / n_sites:.5f}/site)", flush=True)
        final_configs = res.final_configs
        lowest_energy = float(res.lowest_energy)

        # Candidate selection by RE-MEASURED energies, not the raw noisy
        # per-iteration minimum: at num_samples=1/chain/iter the trajectory
        # minimum is a selection-biased order statistic (~2.5 sigma low over
        # 120 iters). Validate both the final and the lowest-trajectory
        # state with independent short MC estimates and keep the winner.
        def _quick_e(state, tag):
            mm = measure(state, gm,
                         MeasurementParams(num_samples=6 if quick else 24,
                                           num_warmup_sweeps=20,
                                           nchains=nchains, eval_chunk=8,
                                           chunk_size=6),
                         chi, TruncParams(chi, 1, 1e-6, scheme="sketch"),
                         None, final_configs, jax.random.PRNGKey(17))
            ev, ee = mm.stats["energy"]
            print(f"selection check [{tag}]: E = {float(ev):.4f} "
                  f"+- {float(ee):.4f}", flush=True)
            return float(ev), float(ee)

        e_final = _quick_e(res.state, "final iterate")
        e_lowest = _quick_e(res.lowest_state, "lowest trajectory iterate")
        if e_lowest[0] <= e_final[0]:
            lowest_state, e_sel, sel_tag = res.lowest_state, e_lowest, \
                "lowest"
        else:
            lowest_state, e_sel, sel_tag = res.state, e_final, "final"
        print(f"selected state: {sel_tag} (validated "
              f"E = {e_sel[0]:.4f} +- {e_sel[1]:.4f})", flush=True)
        np.savez(ckpt, lowest_state=np.asarray(lowest_state),
                 final_configs=np.asarray(final_configs),
                 lowest_energy=lowest_energy,
                 energies=np.asarray(res.energies), t_su=t_su, t_vmc=t_vmc)
        print(f"checkpoint -> {ckpt}", flush=True)

    # energy-pass checkpoint: the flaky device tunnel can kill a multi-
    # phase run mid-measurement; don't redo a finished phase on resume
    n_meas = 20 if quick else n_meas_full
    meas_ckpt = os.path.join(OUT_DIR, "meas_" + name)
    if resume and os.path.exists(meas_ckpt):
        z = np.load(meas_ckpt)
        e_mean, e_err = float(z["e_mean"]), float(z["e_err"])
        t_meas = float(z["t_meas"])
        t_sampling = float(z["t_sampling"]) if "t_sampling" in z else t_meas

        class _M:          # stats carrier for the summary section below
            stats = {"energy": (e_mean, e_err)}
        m = _M()
        print(f"resumed measure phase from {meas_ckpt}: "
              f"E = {e_mean:.4f} +- {e_err:.4f}", flush=True)
    else:
        t0 = time.time()
        m = measure(lowest_state, gm,
                    MeasurementParams(num_samples=n_meas,
                                      num_warmup_sweeps=30,
                                      nchains=nchains,
                                      measure_pair_corr=False,
                                      eval_chunk=8, chunk_size=5,
                                      handle_signals=True, progress=True),
                    chi, TruncParams(chi, 1, 1e-6, scheme="sketch"), None,
                    final_configs, jax.random.PRNGKey(9))
        t_meas = time.time() - t0
        e_mean, e_err = m.stats["energy"]
        t_sampling = float(getattr(m, "sampling_wall_s", t_meas))
        np.savez(meas_ckpt, e_mean=float(e_mean), e_err=float(e_err),
                 t_meas=t_meas, t_sampling=t_sampling)
        print(f"measure {n_meas} samples in {t_meas:.0f}s: "
              f"E = {e_mean:.4f} +- {e_err:.4f} "
              f"({e_mean / n_sites:.5f} +- {e_err / n_sites:.5f} /site)",
              flush=True)

    # `nopc` mode: stop after the energy pass and MERGE into the existing
    # summary.json. The brute-force pair-corr fields stay as the recorded
    # (zero-consistent, superseded) diagnostic; the support-conditioned
    # estimator (flagship_pc_cond.py) is the production pass — running the
    # brute walkers again would spend ~20 min of chip time on an estimator
    # whose d=2 error cannot reach the signal at this support (~0.2%).
    if nopc:
        spath = os.path.join(OUT_DIR, "summary.json")
        summary = json.load(open(spath)) if os.path.exists(spath) else {}
        summary.update({
            "config": (f"{ly}x{lx} t-J t={t} J={j_ex} {n_up + n_dn}e/2h "
                       f"D={d_vmc} chi={chi} nchains={nchains}"),
            "e_per_site": round(float(e_mean) / n_sites, 5),
            "e_per_site_err": round(float(e_err) / n_sites, 5),
            "e_vmc_lowest_per_site_noisy_diagnostic":
                round(lowest_energy / n_sites, 5),
            "wall_su_s": round(t_su, 1), "wall_vmc_s": round(t_vmc, 1),
            "wall_meas_s": round(t_meas, 1), "n_meas": n_meas,
            # steady-state rate: the sampling loop alone. The phase wall
            # additionally carries one-time executable builds/loads and any
            # axon-tunnel stall windows (10-25 min outages several times an
            # hour on this box — NOTES.md round-4 infra)
            "meas_sampling_wall_s": round(t_sampling, 1),
            "meas_samples_per_sec": round(n_meas * nchains / t_sampling, 2),
        })
        with open(spath, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
        print(json.dumps(summary), flush=True)
        return summary

    # pair correlators: env-shared graded walkers in both frames (shared
    # row envs; excited-BMPS propagation for the vertical pairs), both
    # hole/pair orientations collected per entry. Support at 2-hole doping
    # is configs with both holes adjacent, so this pass runs at FULL chain
    # count and bench-scale samples (round-3 ran 8x40 and measured exactly
    # zero support — the reference's flagship diagnostic needs statistics,
    # singlet_pair_correlation_measurement_mixin.h).
    # The pass is RESUMABLE at chunk granularity (the tunnel drops for
    # 10-25 min windows): configs are sampled once and saved, then the
    # env-walker pass runs in chunks whose partial results land on disk.
    t0 = time.time()
    n_pc = 4 if quick else n_pc_full
    pc_trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    pc_cfg_path = os.path.join(OUT_DIR, f"pc{n_pc}_configs_" + name)
    if resume and os.path.exists(pc_cfg_path):
        pc_cfgs = np.load(pc_cfg_path)["configs"]      # [S, C, Ly, Lx]
        print(f"resumed pair-corr configs from {pc_cfg_path}", flush=True)
    else:
        from functools import partial

        from peps_tpu.fermion.vmc import mc_sweep_fermion_shared

        # block-resumable sampling: one long chained scan is a single
        # dispatch the tunnel can kill; ~20-sweep blocks are durable
        @partial(jax.jit, static_argnames=("warm", "ns"))
        def pc_sample_block(cfgs, k, warm, ns):
            def body(carry, _):
                cfgs, k = carry
                ks = jax.random.split(k, nchains + 1)
                cfgs, _, _ = jax.vmap(
                    mc_sweep_fermion_shared,
                    in_axes=(None, None, 0, 0, None, None))(
                    lowest_state, gm.space, cfgs, ks[1:], chi, pc_trunc)
                return (cfgs, ks[0]), cfgs
            (cfgs, _), trail = jax.lax.scan(body, (cfgs, k), None,
                                            length=warm + ns)
            return cfgs, trail[warm:]

        blk = 20
        n_blocks = -(-n_pc // blk)
        cfgs_cur, trails = final_configs, []
        for bi in range(n_blocks):
            bpath = os.path.join(OUT_DIR,
                                 f"pc{n_pc}_cfgblk{bi:02d}_" + name)
            ns = min(blk, n_pc - bi * blk)
            if resume and os.path.exists(bpath):
                z = np.load(bpath)
                trails.append(z["trail"])
                cfgs_cur = jnp.asarray(z["last"])
                continue
            cfgs_cur, trail = pc_sample_block(
                cfgs_cur, jax.random.fold_in(jax.random.PRNGKey(13), bi),
                10 if bi == 0 else 0, ns)
            trail = np.asarray(trail)
            np.savez(bpath, trail=trail, last=np.asarray(cfgs_cur))
            trails.append(trail)
            print(f"[pair-corr] sample block {bi + 1}/{n_blocks} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        pc_cfgs = np.concatenate(trails, axis=0)
        np.savez(pc_cfg_path, configs=pc_cfgs)
        print(f"pair-corr sampling: {n_pc} x {nchains} configs "
              f"({time.time() - t0:.0f}s) -> {pc_cfg_path}", flush=True)

    from peps_tpu.algorithm.measure_fermion import (
        graded_env_shared, tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)

    @jax.jit
    def pc_walkers(cs):
        def one(c):
            bundle = graded_env_shared(lowest_state, c, gm.space, chi,
                                       pc_trunc)
            return (tj_singlet_pair_corr_graded_rowshared(
                        lowest_state, c, gm.space, chi, pc_trunc,
                        shared=bundle),
                    tj_singlet_pair_corr_graded_colshared(
                        lowest_state, c, gm.space, chi, pc_trunc,
                        shared=bundle))
        return jax.lax.map(one, cs, batch_size=8)

    flat = jnp.asarray(pc_cfgs.reshape(-1, ly, lx))
    pc_chunk = 64
    n_chunks = -(-flat.shape[0] // pc_chunk)
    rows_l, cols_l = [], []
    for ci in range(n_chunks):
        part = os.path.join(OUT_DIR, f"pc{n_pc}_part{ci:03d}_" + name)
        if resume and os.path.exists(part):
            z = np.load(part)
            rows_l.append(z["rows"]); cols_l.append(z["cols"])
            continue
        cs = flat[ci * pc_chunk:(ci + 1) * pc_chunk]
        r, c = jax.tree.map(np.asarray, pc_walkers(cs))
        np.savez(part, rows=r, cols=c)
        rows_l.append(r); cols_l.append(c)
        print(f"[pair-corr] chunk {ci + 1}/{n_chunks} "
              f"({time.time() - t0:.0f}s)", flush=True)
    from peps_tpu.montecarlo.statistics import mean_and_binned_error_batch

    def pc_stats(parts):
        a = np.concatenate(parts, axis=0)              # [S*C, ...]
        a = a.reshape((n_pc, nchains) + a.shape[1:])
        mv, ev = mean_and_binned_error_batch(
            jnp.asarray(a.reshape(n_pc, nchains, -1)))
        shape = a.shape[2:]
        return (np.asarray(mv, np.float64).reshape(shape),
                np.asarray(ev, np.float64).reshape(shape))

    m.stats["pair_corr_row"] = pc_stats(rows_l)
    m.stats["pair_corr_col"] = pc_stats(cols_l)
    t_pc = time.time() - t0
    print(f"pair-corr pass {n_pc} samples x {nchains} chains "
          f"in {t_pc:.0f}s", flush=True)

    # THE energy is the measured one (direct MC estimate on the selected
    # state with binned errors). The raw per-iteration VMC minimum is a
    # selection-biased order statistic of a noisy estimator (num_samples=1
    # per chain per iteration) — kept only as a trajectory diagnostic.
    summary = {
        "config": (f"{ly}x{lx} t-J t={t} J={j_ex} {n_up + n_dn}e/2h "
                   f"D={d_vmc} chi={chi} nchains={nchains}"
                   + (" [cpu fallback]" if cpu else "")),
        "e_per_site": round(float(e_mean) / n_sites, 5),
        "e_per_site_err": round(float(e_err) / n_sites, 5),
        "e_vmc_lowest_per_site_noisy_diagnostic":
            round(lowest_energy / n_sites, 5),
        "wall_su_s": round(t_su, 1), "wall_vmc_s": round(t_vmc, 1),
        "wall_meas_s": round(t_meas, 1), "wall_pc_s": round(t_pc, 1),
        "n_meas": n_meas, "n_pc_samples": n_pc * nchains,
    }
    # bond-distance decay of <Delta^dag_i Delta_k> averaged over lines
    # (entries exist for |i-k| >= 2, non-overlapping bond pairs), with
    # propagated standard errors and BOTH triangles (the estimator
    # collects both hole/pair orientations). 3 significant digits (NOT
    # fixed decimals: at 2-hole doping the correlators are ~1e-5).
    def bond_decay(key, nlines, nb):
        pc, pc_err = m.stats[key]               # [nlines, nb, nb]
        decay, decay_err = {}, {}
        for dist in range(2, nb):
            idx = [(r, i, j) for r in range(nlines)
                   for i in range(nb) for j in range(nb)
                   if abs(i - j) == dist]
            vals = np.array([pc[a] for a in idx])
            errs = np.array([pc_err[a] for a in idx])
            decay[dist] = float(f"{float(np.mean(vals)):.3g}")
            decay_err[dist] = float(
                f"{float(np.sqrt(np.sum(errs ** 2)) / len(idx)):.3g}")
        return decay, decay_err

    if "pair_corr_row" in m.stats:
        summary["pair_corr_row_decay"], summary["pair_corr_row_decay_err"] \
            = bond_decay("pair_corr_row", ly, lx - 1)
    if "pair_corr_col" in m.stats:
        summary["pair_corr_col_decay"], summary["pair_corr_col_decay_err"] \
            = bond_decay("pair_corr_col", lx, ly - 1)
    print(json.dumps(summary), flush=True)
    with open(os.path.join(
            OUT_DIR, "summary_quick.json" if quick
            else ("summary_cpu.json" if cpu else "summary.json")),
            "w") as f:
        json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    if "cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache on EVERY backend: a fresh process otherwise
    # recompiles ~2 min of measurement graphs per run (the in-process
    # measure() executable cache only helps repeat calls within one run)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT_DIR), "..",
                                   ".jax_cache"))
    main(quick="quick" in sys.argv[1:], resume="resume" in sys.argv[1:],
         cpu="cpu" in sys.argv[1:], nopc="nopc" in sys.argv[1:])
