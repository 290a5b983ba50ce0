"""Profile the measurement path vs the evaluator at the flagship config.

VERDICT r3 #4: flagship measurement ran ~12x slower per sample than the
evaluator's train-step sampling at the same 6x6 t-J D=8 chi=32 config.
This script times the pieces separately on the attached TPU:

  1. graded sweep (vmapped, 32 chains)          -- shared by both paths
  2. per-sample local energy, with_holes=False  -- the measure eval
  3. per-sample local energy, with_holes=True   -- the evaluator eval
  4. one full measure-collect step (sweep+eval) at chunk sizes 5/10/25
  5. one full evaluator step (sweep+eval+SR)

Timing on the axon tunnel: block_until_ready does not await remote
completion, so every segment chains k in-graph repetitions via lax.scan
with per-iteration-varying inputs and fetches a scalar.

Run: python scripts/profile_measure.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.linalg import TruncParams


def timed(fn, *args, k: int = 3):
    out = fn(*args)
    _ = jax.tree.map(lambda x: np.asarray(x), out)   # warm + compile
    t0 = time.time()
    out = fn(*args)
    _ = jax.tree.map(lambda x: np.asarray(x), out)
    dt1 = time.time() - t0
    t0 = time.time()
    for _ in range(k):
        out = fn(*args)
        _ = jax.tree.map(lambda x: np.asarray(x), out)
    return (time.time() - t0) / k, dt1


def main():
    from peps_tpu.fermion.peps import (FermionSpace, expand_bond_dim_graded,
                                       fermion_simple_update,
                                       product_fermion_peps, space_for_model,
                                       to_tps_fermion, u1_charges_for)
    from peps_tpu.fermion.vmc import (GradedFermionModel,
                                      local_energy_and_holes_graded,
                                      mc_sweep_fermion_shared)
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.peps import SimpleUpdateParams

    ly = lx = 6
    chi, nchains = 32, 32
    model = tj_model(3.0, 1.0)
    occ0 = (np.indices((ly, lx)).sum(0) % 2 + 1).astype(int)
    occ0[2, 2] = 0
    occ0[3, 2] = 0
    space4 = space_for_model(model, 4)
    space8 = FermionSpace(space4.phys_parity, 4, 4)
    charges = u1_charges_for(model, space4, occ0)
    peps = product_fermion_peps(ly, lx, space4, occ0)
    out = fermion_simple_update(
        peps, model, space4,
        SimpleUpdateParams(steps=60, tau=0.1,
                           trunc=TruncParams(4, 1, 1e-12)),
        charges=charges)
    tps4 = to_tps_fermion(out.peps).astype(jnp.float32)
    tps4 = tps4 / jnp.max(jnp.abs(tps4))
    tps = expand_bond_dim_graded(tps4, space4, space8, noise=1e-3,
                                 key=jax.random.PRNGKey(11))
    gm = GradedFermionModel.from_model(model, space8, tps.dtype)
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    n_up = int((occ0 == 1).sum())
    n_dn = int((occ0 == 2).sum())
    cfgs = init_configs_occupancy(
        jax.random.PRNGKey(1), nchains, ly, lx,
        {0: ly * lx - n_up - n_dn, 1: n_up, 2: n_dn})

    # 1. sweep only, k chained
    def sweep_k(cfgs, key, k):
        def body(carry, _):
            cfgs, key = carry
            ks = jax.random.split(key, nchains + 1)
            out, _, st = jax.vmap(
                mc_sweep_fermion_shared,
                in_axes=(None, None, 0, 0, None, None))(
                tps, space8, cfgs, ks[1:], chi, trunc)
            return (out, ks[0]), jnp.sum(st.accepted)
        (cfgs, _), accs = jax.lax.scan(body, (cfgs, key), None, length=k)
        return cfgs, accs[-1]

    f = jax.jit(sweep_k, static_argnames=("k",))
    dt, dt1 = timed(lambda: f(cfgs, jax.random.PRNGKey(2), 4))
    print(f"sweep x4 (32 chains): {dt:.3f}s avg -> {dt / 4 * 1e3:.0f} "
          f"ms/sweep-step (first {dt1:.3f})", flush=True)

    # 2/3. eval pass at eval_chunk=8, holes off/on
    for with_holes in (False, True):
        def eval_all(cfgs):
            fn = lambda c: local_energy_and_holes_graded(
                tps, c, gm, chi, trunc, with_holes=with_holes)
            res = jax.lax.map(fn, cfgs, batch_size=8)
            return res.e_loc
        fe = jax.jit(eval_all)
        dt, dt1 = timed(lambda: fe(cfgs))
        print(f"eval (32 chains, chunk 8, holes={with_holes}): "
              f"{dt * 1e3:.0f} ms (first {dt1:.3f}s)", flush=True)

    # 2b. eval at larger chunks
    for bs in (16, 32):
        def eval_all2(cfgs, bs=bs):
            fn = lambda c: local_energy_and_holes_graded(
                tps, c, gm, chi, trunc, with_holes=False)
            if bs == nchains:
                return jax.vmap(fn)(cfgs).e_loc
            return jax.lax.map(fn, cfgs, batch_size=bs).e_loc
        fe = jax.jit(eval_all2)
        try:
            dt, dt1 = timed(lambda: fe(cfgs))
            print(f"eval (holes=False, chunk {bs}): {dt * 1e3:.0f} ms "
                  f"(first {dt1:.3f}s)", flush=True)
        except Exception as ex:
            print(f"eval chunk {bs}: ERR {str(ex)[:80]}", flush=True)

    # 4. full measure-collect step via the public API, small sample counts
    from peps_tpu.algorithm.measure import MeasurementParams, measure
    for (ns, cs) in ((10, 5), (10, 10)):
        t0 = time.time()
        m = measure(tps, gm,
                    MeasurementParams(num_samples=ns, num_warmup_sweeps=2,
                                      nchains=nchains, eval_chunk=8,
                                      chunk_size=cs,
                                      measure_pair_corr=False),
                    chi, trunc, None, cfgs, jax.random.PRNGKey(9))
        dt = time.time() - t0
        print(f"measure {ns} samples chunk_size={cs}: {dt:.1f}s "
              f"-> {ns * nchains / dt:.2f} samples/s (incl compile on "
              f"first call)", flush=True)


if __name__ == "__main__":
    main()
