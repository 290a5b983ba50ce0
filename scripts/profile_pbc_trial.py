"""Op-level device profile of ONE trial/commit bond step (PBC MC hot path).

The 8x8 PBC trial sweep runs at 0.20 chain-sweeps/s = ~37 ms per
(chain, bond) decision at group=1; this captures a jax.profiler trace of
the per-bond executable (montecarlo/sweep_pbc._trial_bond_step_exchange)
and prints the top HLO ops by self time, to locate where the replay's
wall actually goes (absorb matmuls vs transposes vs gather/scatter).

Also times the bond step at group in {1, 2} to test whether the chi^5
absorb-temp memory model (_trial_group_auto budget 6e8) is leaving
throughput on the table.

Usage: python scripts/profile_pbc_trial.py [out_dir] [cpu]
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


def main(out_dir, cpu=False):
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.montecarlo.sweep_pbc import (_build_caches,
                                               _trial_bond_step_exchange)
    from peps_tpu.peps import (SimpleUpdateParams, product_peps,
                               simple_update, to_tps)

    os.makedirs(out_dir, exist_ok=True)
    ly = lx = 8 if not cpu else 4
    D, chi, nch = (8, 32, 32) if not cpu else (4, 16, 8)
    model = spin.heisenberg(1.0)
    # same state recipe as scripts/bench_table.py's PBC rows, so the
    # group=1 timing is comparable with the published 0.20 chain-sweeps/s
    occ = np.indices((ly, lx)).sum(0) % 2
    peps = product_peps(ly, lx, D, occ, 2, dtype=jnp.float32)
    su = simple_update(peps, model.h_h, model.h_v,
                       SimpleUpdateParams(steps=40, tau=0.1,
                                          trunc=TruncParams(D, 1, 1e-8)))
    tps = to_tps(su.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    trunc = TruncParams(chi, 1, 1e-6, scheme="fast", rsvd_power=1)
    n = ly * lx
    configs = init_configs_occupancy(jax.random.PRNGKey(1), nch, ly, lx,
                                     {0: n // 2, 1: n - n // 2})
    keys = jax.random.split(jax.random.PRNGKey(2), nch)
    t0 = time.time()
    caches = _build_caches(tps, configs, chi, trunc)
    caches = jax.tree.map(lambda a: a.block_until_ready(), caches)
    print(f"cache build: {time.time() - t0:.1f}s", flush=True)

    anchor = jnp.asarray([2, 3], jnp.int32)
    results = {}
    for group in (1, 2):
        try:
            # warm/compile
            c2, cfg2, k2, a, t = _trial_bond_step_exchange(
                tps, caches, configs, keys, anchor, chi, trunc, True,
                False, group)
            _ = float(jnp.sum(a))
            # donation consumed `caches`; rebuild a fresh set per trial
            caches = _build_caches(tps, configs, chi, trunc)
            # timed: chain 16 bond steps in sequence (different anchors so
            # dispatch memoization through the tunnel cannot fire)
            anchors = [jnp.asarray([i % ly, (2 * i + 1) % lx], jnp.int32)
                       for i in range(16)]
            cc, cf, kk = caches, configs, keys
            t0 = time.time()
            for aa in anchors:
                cc, cf, kk, a, t = _trial_bond_step_exchange(
                    tps, cc, cf, kk, aa, chi, trunc, True, False, group)
            _ = float(jnp.sum(a)) + float(jnp.sum(cf))
            dt = (time.time() - t0) / 16
            results[f"group{group}_ms_per_bond"] = round(dt * 1000, 1)
            results[f"group{group}_chain_sweeps_per_s"] = round(
                nch / (dt * 2 * n), 3)
            print(f"group={group}: {dt * 1000:.0f} ms/bond "
                  f"-> {nch / (dt * 2 * n):.3f} chain-sweeps/s", flush=True)
            caches = _build_caches(tps, configs, chi, trunc)
        except Exception as e:
            print(f"group={group}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            results[f"group{group}_error"] = str(e)[:200]
            caches = _build_caches(tps, configs, chi, trunc)

    # device trace of 4 bond steps at group=1
    trace_dir = os.path.join(out_dir, "trace")
    cc, cf, kk = caches, configs, keys
    with jax.profiler.trace(trace_dir):
        for i in range(4):
            aa = jnp.asarray([(3 * i) % ly, (i + 1) % lx], jnp.int32)
            cc, cf, kk, a, t = _trial_bond_step_exchange(
                tps, cc, cf, kk, aa, chi, trunc, True, False, 1)
        _ = float(jnp.sum(a))
    print(f"trace captured in {trace_dir}", flush=True)

    with open(os.path.join(out_dir, "trial_step_timing.json"), "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "cpu"]
    main(args[0] if args else "examples/out_profile_pbc",
         cpu="cpu" in sys.argv[1:])
