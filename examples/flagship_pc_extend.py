"""Extend the flagship pair-correlation statistics with more samples.

The 6x6 2-hole t-J <Delta^dag Delta> estimator is heavy-tailed (support =
configs with both holes adjacent; rare tiny-amplitude configs contribute
large ratios), so error bars shrink only with brute statistics. This
script resumes from the flagship VMC checkpoint (examples/out_flagship/
vmc.npz), samples `n_more` additional configuration rounds with a fresh
seed, runs the same env-shared pair-corr walkers, then MERGES the new
parts with the original pc160 parts and rewrites summary.json's pair-corr
fields with the combined statistics. Block/chunk-resumable like the main
script (re-run with the same n_more to continue after a tunnel drop).

Usage: python examples/flagship_pc_extend.py [n_more] [cpu]
Reference diagnostic: singlet_pair_correlation_measurement_mixin.h.
"""
import glob
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


def main(n_more=160, cpu=False):
    from peps_tpu.algorithm.measure_fermion import (
        graded_env_shared, tj_singlet_pair_corr_graded_colshared,
        tj_singlet_pair_corr_graded_rowshared)
    from peps_tpu.fermion.peps import FermionSpace, space_for_model
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      mc_sweep_fermion_shared)
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.montecarlo.statistics import mean_and_binned_error_batch

    ly = lx = 6
    chi, nchains = 32, 32
    model = tj_model(3.0, 1.0)
    space4 = space_for_model(model, 4)
    space8 = FermionSpace(space4.phys_parity, 4, 4)

    ckpt = os.path.join(OUT_DIR, "vmc.npz")
    z = np.load(ckpt)
    lowest_state = jnp.asarray(z["lowest_state"])
    gm = GradedFermionModel.from_model(model, space8, lowest_state.dtype)
    pc_trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")

    # start chains from the END of the original pc pass (equilibrated)
    base_cfgs = np.load(os.path.join(OUT_DIR, "pc160_configs_vmc.npz"))[
        "configs"]
    cfgs_cur = jnp.asarray(base_cfgs[-1])
    t0 = time.time()

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
    n_blocks = -(-n_more // blk)
    trails = []
    for bi in range(n_blocks):
        bpath = os.path.join(OUT_DIR, f"pcext{n_more}_cfgblk{bi:02d}.npz")
        ns = min(blk, n_more - bi * blk)
        if os.path.exists(bpath):
            zz = np.load(bpath)
            trails.append(zz["trail"])
            cfgs_cur = jnp.asarray(zz["last"])
            continue
        cfgs_cur, trail = pc_sample_block(
            cfgs_cur, jax.random.fold_in(jax.random.PRNGKey(14), bi),
            5 if bi == 0 else 0, ns)
        trail = np.asarray(trail)
        np.savez(bpath, trail=trail, last=np.asarray(cfgs_cur))
        trails.append(trail)
        print(f"[pc-ext] sample block {bi + 1}/{n_blocks} "
              f"({time.time() - t0:.0f}s)", flush=True)
    pc_cfgs = np.concatenate(trails, axis=0)        # [n_more, C, Ly, Lx]
    print(f"pc-ext sampling: {n_more} x {nchains} configs "
          f"({time.time() - t0:.0f}s)", flush=True)

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
    for ci in range(n_chunks):
        part = os.path.join(OUT_DIR, f"pcext{n_more}_part{ci:03d}.npz")
        if os.path.exists(part):
            continue
        cs = flat[ci * pc_chunk:(ci + 1) * pc_chunk]
        r, c = jax.tree.map(np.asarray, pc_walkers(cs))
        np.savez(part, rows=r, cols=c)
        print(f"[pc-ext] chunk {ci + 1}/{n_chunks} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- merge with the original pc160 parts and recompute stats ----
    def load_parts(pattern):
        rows_l, cols_l = [], []
        for p in sorted(glob.glob(os.path.join(OUT_DIR, pattern))):
            zz = np.load(p)
            rows_l.append(zz["rows"])
            cols_l.append(zz["cols"])
        return rows_l, cols_l

    rows0, cols0 = load_parts("pc160_part*_vmc.npz")
    rows1, cols1 = load_parts(f"pcext{n_more}_part*.npz")
    rows = np.concatenate(rows0 + rows1, axis=0)
    cols = np.concatenate(cols0 + cols1, axis=0)
    n_tot = rows.shape[0] // nchains
    print(f"combined samples: {n_tot} x {nchains}", flush=True)

    def pc_stats(a):
        a = a.reshape((n_tot, nchains) + a.shape[1:])
        mv, ev = mean_and_binned_error_batch(
            jnp.asarray(a.reshape(n_tot, nchains, -1)))
        shape = a.shape[2:]
        return (np.asarray(mv, np.float64).reshape(shape),
                np.asarray(ev, np.float64).reshape(shape))

    stats = {"pair_corr_row": pc_stats(rows), "pair_corr_col": pc_stats(cols)}

    def bond_decay(key, nlines, nb):
        pc, pc_err = stats[key]
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

    spath = os.path.join(OUT_DIR, "summary.json")
    with open(spath) as f:
        summary = json.load(f)
    summary["n_pc_samples"] = n_tot * nchains
    summary["pair_corr_row_decay"], summary["pair_corr_row_decay_err"] = \
        bond_decay("pair_corr_row", ly, lx - 1)
    summary["pair_corr_col_decay"], summary["pair_corr_col_decay_err"] = \
        bond_decay("pair_corr_col", lx, ly - 1)
    summary["wall_pc_ext_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary), flush=True)
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    if "cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache on every backend: retry runs after tunnel
    # drops re-enter with warm executables
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(OUT_DIR), "..",
                                   ".jax_cache"))
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    main(n_more=int(nums[0]) if nums else 160, cpu="cpu" in sys.argv[1:])
