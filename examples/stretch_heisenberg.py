"""Stretch-scale Heisenberg OBC physics run: 12x12 D=10 chi=40 (default).

VERDICT r4 #7: run the stretch configuration as PHYSICS, not just a
benchmark row — full pipeline (graded-free bosonic path) SU -> SR VMC ->
independent MC measurement, with per-phase checkpoints that survive the
flaky device tunnel, publishing E/site with binned errors next to the
8x8 (-0.6175/site) and 10x10 (-0.62795/site) numbers.

This scale is the point of the TPU design: a single v5e chip runs a
12x12 D=10 chi=40 (or 16x16 D=12 chi=48) SR optimization in-core, where
the reference's MPI setup distributes chains across ranks of a CPU
cluster (BASELINE.md stretch goal; mc_peps_optimizer docs).

Usage: python examples/stretch_heisenberg.py [ly lx D chi iters] [resume]
Checkpoints/summary land in examples/out_stretch/. Re-run with `resume`
after a tunnel drop: finished phases are skipped, a partially finished
VMC restarts from the last periodic state checkpoint.
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

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "out_stretch")


def main(ly=12, lx=12, d_bond=10, chi=40, n_iters=40, resume=False):
    from peps_tpu.algorithm.mc_evaluator import MCParams
    from peps_tpu.algorithm.measure import MeasurementParams, measure
    from peps_tpu.algorithm.vmc_optimize import VMCParams, vmc_optimize
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.optimizer import optimizer as opt
    from peps_tpu.optimizer.cg import CGParams
    from peps_tpu.peps import (SimpleUpdateParams, product_peps,
                               simple_update, to_tps)

    os.makedirs(OUT_DIR, exist_ok=True)
    tag = f"{ly}x{lx}_D{d_bond}_chi{chi}"
    n_sites = ly * lx
    nchains = 32
    model = spin.heisenberg(1.0)
    trunc_mc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    n_up = n_sites // 2

    # ---------------- phase 1: simple update ----------------------------
    su_ckpt = os.path.join(OUT_DIR, f"su_{tag}.npz")
    if resume and os.path.exists(su_ckpt):
        z = np.load(su_ckpt)
        tps, t_su = jnp.asarray(z["tps"]), float(z["t_su"])
        print(f"resumed SU from {su_ckpt}", flush=True)
    else:
        t0 = time.time()
        occ = np.indices((ly, lx)).sum(0) % 2
        peps = product_peps(ly, lx, d_bond, occ, 2, dtype=jnp.float32)
        for steps, tau in ((150, 0.1), (150, 0.05), (100, 0.02)):
            su = simple_update(
                peps, model.h_h, model.h_v,
                SimpleUpdateParams(steps=steps, tau=tau,
                                   trunc=TruncParams(d_bond, 1, 1e-8)))
            peps = su.peps
        t_su = time.time() - t0
        tps = to_tps(peps)
        tps = tps / jnp.max(jnp.abs(tps))
        print(f"SU(D={d_bond}) done in {t_su:.0f}s, "
              f"E0~{su.estimated_e0:.4f} "
              f"({su.estimated_e0 / n_sites:.5f}/site)", flush=True)
        np.savez(su_ckpt, tps=np.asarray(tps), t_su=t_su)

    # ---------------- phase 2: SR VMC ------------------------------------
    vmc_ckpt = os.path.join(OUT_DIR, f"vmc_{tag}.npz")
    ckpt_dir = os.path.join(OUT_DIR, f"vmc_steps_{tag}")
    if resume and os.path.exists(vmc_ckpt):
        z = np.load(vmc_ckpt)
        state = jnp.asarray(z["state"])
        final_configs = jnp.asarray(z["final_configs"])
        t_vmc = float(z["t_vmc"])
        energies = list(np.asarray(z["energies"]))
        print(f"resumed VMC from {vmc_ckpt}: last E = {energies[-1]:.4f}",
              flush=True)
    else:
        # restart from the last periodic state checkpoint if one exists
        start_tps, done = tps, 0
        if resume and os.path.isdir(ckpt_dir):
            steps = sorted(
                (int(f[len("state_step"):-len(".npy")]), f)
                for f in os.listdir(ckpt_dir) if f.startswith("state_step"))
            if steps:
                done, f = steps[-1]
                start_tps = jnp.asarray(np.load(os.path.join(ckpt_dir, f)))
                print(f"VMC restart from periodic checkpoint step {done}",
                      flush=True)
        t0 = time.time()
        vp = VMCParams(
            chi=chi, trunc=trunc_mc,
            # 12x32=384 samples/step: at num_samples=1 the SR step at this
            # parameter count (~1.2M) is noise-dominated and the state
            # walked away from the SU start (-0.62 -> -0.03/site over 57
            # iters, round-5 first attempt). Spike resample+rollback guards
            # the remaining heavy-tailed steps.
            mc=MCParams(num_samples=8, num_warmup_sweeps=60,
                        nchains=nchains, eval_chunk=8),
            optimizer=opt.OptimizerParams(
                max_iters=n_iters - done,
                algorithm=opt.SRParams(cg=CGParams(max_iter=40, tol=1e-5),
                                       diag_shift=1e-3),
                lr=0.03,
                spike=opt.SpikeParams(
                    enabled=True, enable_rollback=True,
                    log_csv=os.path.join(OUT_DIR, f"spikes_{tag}.csv")),
                checkpoint_every=10, checkpoint_path=ckpt_dir,
                trajectory_csv=os.path.join(OUT_DIR, f"traj_{tag}.csv")),
            rule=rule,
            occupancy=((0, n_up), (1, n_sites - n_up)))
        res = vmc_optimize(
            start_tps, model, vp, jax.random.PRNGKey(done + 5),
            callback=lambda rec, s: print(
                f"iter {done + rec.step}: E = {rec.energy:.4f} "
                f"+- {rec.energy_error:.4f} "
                f"({rec.energy / n_sites:.5f}/site)", flush=True))
        t_vmc = time.time() - t0
        state, final_configs = res.state, res.final_configs
        energies = list(res.energies)
        print(f"VMC(SR) {n_iters - done} iters in {t_vmc:.0f}s: "
              f"E = {energies[-1]:.4f} ({energies[-1] / n_sites:.5f}/site)",
              flush=True)
        np.savez(vmc_ckpt, state=np.asarray(state),
                 final_configs=np.asarray(final_configs), t_vmc=t_vmc,
                 energies=np.asarray(energies))

    # ---------------- phase 3: independent MC measurement ---------------
    meas_ckpt = os.path.join(OUT_DIR, f"meas_{tag}.npz")
    n_meas = 60
    if resume and os.path.exists(meas_ckpt):
        z = np.load(meas_ckpt)
        e_mean, e_err, t_meas = (float(z["e_mean"]), float(z["e_err"]),
                                 float(z["t_meas"]))
        t_sampling = float(z["t_sampling"]) if "t_sampling" in z else t_meas
        print(f"resumed measure from {meas_ckpt}", flush=True)
    else:
        t0 = time.time()
        m = measure(state, model,
                    MeasurementParams(num_samples=n_meas,
                                      num_warmup_sweeps=30,
                                      nchains=nchains, eval_chunk=8,
                                      chunk_size=5, handle_signals=True,
                                      progress=True),
                    chi, trunc_mc, rule, final_configs,
                    jax.random.PRNGKey(9))
        t_meas = time.time() - t0
        e_mean, e_err = map(float, m.stats["energy"])
        t_sampling = float(getattr(m, "sampling_wall_s", t_meas))
        np.savez(meas_ckpt, e_mean=e_mean, e_err=e_err, t_meas=t_meas,
                 t_sampling=t_sampling)
    print(f"measured E = {e_mean:.4f} +- {e_err:.4f} "
          f"({e_mean / n_sites:.5f} +- {e_err / n_sites:.5f} /site) "
          f"in {t_meas:.0f}s", flush=True)

    summary = {
        "config": f"{ly}x{lx} Heisenberg OBC D={d_bond} chi={chi} "
                  f"nchains={nchains}",
        "e_per_site": round(e_mean / n_sites, 5),
        "e_per_site_err": round(e_err / n_sites, 5),
        "e_vmc_last_per_site": round(energies[-1] / n_sites, 5),
        "n_iters": n_iters, "n_meas": n_meas,
        # steady-state sampling-loop rate (excludes one-time executable
        # builds/loads and tunnel stalls; see NOTES.md round-4 infra)
        "meas_sampling_wall_s": round(t_sampling, 1),
        "meas_samples_per_sec": round(n_meas * nchains / t_sampling, 2),
        "wall_su_s": round(t_su, 1), "wall_vmc_s": round(t_vmc, 1),
        "wall_meas_s": round(t_meas, 1),
    }
    spath = os.path.join(OUT_DIR, f"summary_{tag}.json")
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
        f.write("\n")
    print(json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    if "cpu" in sys.argv[1:]:
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; the
        # config flag wins (tests/conftest.py note)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT_DIR), "..",
                                   ".jax_cache"))
    args = [a for a in sys.argv[1:] if a not in ("resume", "cpu")]
    kw = {}
    if args:
        ly, lx, d_bond, chi, n_iters = (int(a) for a in args[:5])
        kw = dict(ly=ly, lx=lx, d_bond=d_bond, chi=chi, n_iters=n_iters)
    main(resume="resume" in sys.argv[1:], **kw)
