"""Regenerate the README sweep-throughput table (single chip, f32).

Run on the TPU: python scripts/bench_table.py [quick]
Prints the markdown table; every README number comes from this script.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.lattice import BoundaryCondition, transpose_tps
from peps_tpu.linalg import TruncParams
from peps_tpu.models import spin
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
from peps_tpu.montecarlo.sweep_pbc import (mc_sweep_pbc_host, mc_sweep_pbc_trial)
from peps_tpu.peps import (SimpleUpdateParams, product_peps, simple_update,
                           to_tps)

NCH = 32
DTYPE = jnp.float32

# PBC rows run the HOST-DRIVEN bond sweep (montecarlo/sweep_pbc.py): the
# XLA TPU backend cannot compile the fully scanned TRG bond-sweep graph
# (docs/tpu_engineering.md "TPU TRG compile pathology"), so one per-bond
# executable is driven from the host — the same auto-selection the MC
# evaluator and measurer make on TPU.
CONFIGS = [
    # (label, ly, lx, D, chi, bc)
    ("8x8", 8, 8, 8, 32, "obc"),
    ("10x10", 10, 10, 8, 32, "obc"),
    ("16x16", 16, 16, 8, 32, "obc"),
    ("12x12", 12, 12, 10, 40, "obc"),
    ("16x16 (stretch)", 16, 16, 12, 48, "obc"),
    ("4x4 PBC (TRG)", 4, 4, 4, 16, "pbc"),
    ("8x8 PBC (TRG)", 8, 8, 8, 32, "pbc"),
]


def su_state(ly, lx, D, steps=60):
    model = spin.heisenberg(1.0)
    occ = np.indices((ly, lx)).sum(0) % 2
    peps0 = product_peps(ly, lx, D, occ, 2, dtype=DTYPE)
    su = simple_update(peps0, model.h_h, model.h_v,
                       SimpleUpdateParams(steps=steps, tau=0.1,
                                          trunc=TruncParams(D, 1, 1e-8)))
    tps = to_tps(su.peps)
    return tps / jnp.max(jnp.abs(tps))


def measure_row(label, ly, lx, D, chi, bc, quick):
    tps = su_state(ly, lx, D, steps=30 if quick else 60)
    n = ly * lx
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    configs = init_configs_occupancy(jax.random.PRNGKey(1), NCH, ly, lx,
                                     {0: n // 2, 1: n - n // 2})
    keys0 = jax.random.PRNGKey(2)
    if bc == "pbc":
        # TRG with matmul-only "fast" projectors (jittered-Cholesky Gram
        # factors + randomized bond SVD): the exact-SVD path costs
        # 1.26 s/amplitude at 8x8 chi=32 on v5e (~95% in qdwh SVD)
        trunc = TruncParams(chi, 1, 1e-6, scheme="fast", rsvd_power=1)
        keys = jax.random.split(keys0, NCH)
        la0s = None

        # Production path (PBC_TRIAL=1, default): the trial/commit cache
        # (pbc_trial.py) — one projector refresh per sweep + matmul-only
        # influence-cone replays per bond. PBC_TRIAL=0 measures the
        # full-recompute host loop (the bit-identical oracle path).
        trial = os.environ.get("PBC_TRIAL", "1") != "0"
        # fuse_bonds > 1 batches sequential bond decisions into one
        # executable (k-fold fewer dispatches; bit-identical trajectories).
        # Keep k small enough that the unrolled TRG body stays clear of
        # the XLA:TPU compile pathology (validate at your lattice size).
        fuse = int(os.environ.get("PBC_FUSE_BONDS", "8"))

        def run_k(configs, keys, la0s, k):
            acc = 0.0
            for _ in range(k):
                if trial:
                    configs, keys, a, _ = mc_sweep_pbc_trial(
                        tps, configs, keys, chi, trunc, rule)
                else:
                    configs, keys, la0s, a, _ = mc_sweep_pbc_host(
                        tps, configs, keys, chi, trunc, rule, la0s,
                        fuse_bonds=fuse)
                acc = acc + jnp.sum(a)
            return configs, keys, la0s, acc

        k = 1 if quick else 2
        configs, keys, la0s, a = run_k(configs, keys, la0s, k)   # warm
        _ = float(jnp.sum(configs)) + float(a)
        t0 = time.time()
        configs, keys, la0s, a = run_k(configs, keys, la0s, k)
        _ = float(jnp.sum(configs)) + float(a)
        dt = time.time() - t0
        rate = NCH * k / dt
        print(f"| {label} | {D} | {chi} | {rate:.2f} |", flush=True)
        return rate
    else:
        tps_t = transpose_tps(tps)

        def sweep_k(configs, key, k):
            def body(carry, _):
                configs, key = carry
                ks = jax.random.split(key, NCH + 1)
                out, _, st = jax.vmap(
                    mc_sweep,
                    in_axes=(None, None, 0, 0, None, None, None))(
                    tps, tps_t, configs, ks[1:], chi, trunc, rule)
                return (out, ks[0]), jnp.sum(st.accepted)
            (configs, _), accs = jax.lax.scan(body, (configs, key), None,
                                              length=k)
            return configs, accs[-1]

    f = jax.jit(sweep_k, static_argnames=("k",))
    k = 2 if quick else 4
    out, a = f(configs, keys0, k)
    _ = float(jnp.sum(out)) + float(a)
    t0 = time.time()
    out, a = f(out, jax.random.PRNGKey(3), k)
    _ = float(jnp.sum(out)) + float(a)
    dt = time.time() - t0
    rate = NCH * k / dt
    print(f"| {label} | {D} | {chi} | {rate:.1f} |", flush=True)
    return rate


def pbc_fuse_scaling(quick=False):
    """Fused-bond dispatch scaling for the host-driven PBC sweep: sweeps/s
    and ms per host->device dispatch at fuse_bonds k = 1/4/8. If the rate
    saturates with k, the path is dispatch-floor-bound and the floor is the
    printed ms/dispatch (VERDICT r3 #3: quantify, don't anecdote)."""
    print("\n| PBC config | fuse k | chain-sweeps/sec | dispatches/sweep "
          "| ms/dispatch |")
    print("|---|---|---|---|---|")
    for (label, ly, lx, D, chi) in (("4x4 D=4 chi=16", 4, 4, 4, 16),
                                    ("8x8 D=8 chi=32", 8, 8, 8, 32)):
        tps = su_state(ly, lx, D, steps=20 if quick else 40)
        trunc = TruncParams(chi, 1, 1e-6, scheme="fast", rsvd_power=1)
        rule = UpdateRule("exchange")
        n = ly * lx
        n_bonds = 2 * n                       # torus: Ly*Lx h + Ly*Lx v
        configs = init_configs_occupancy(jax.random.PRNGKey(1), NCH, ly, lx,
                                         {0: n // 2, 1: n - n // 2})
        keys = jax.random.split(jax.random.PRNGKey(2), NCH)
        for fuse in (1, 4, 8):
            try:
                cfgs, ks, la0s = configs, keys, None
                cfgs, ks, la0s, a, _ = mc_sweep_pbc_host(
                    tps, cfgs, ks, chi, trunc, rule, la0s,
                    fuse_bonds=fuse)                       # warm/compile
                _ = float(jnp.sum(cfgs)) + float(jnp.sum(a))
                k = 1 if quick else 2
                t0 = time.time()
                for _ in range(k):
                    cfgs, ks, la0s, a, _ = mc_sweep_pbc_host(
                        tps, cfgs, ks, chi, trunc, rule, la0s,
                        fuse_bonds=fuse)
                    _ = float(jnp.sum(cfgs)) + float(jnp.sum(a))
                dt = time.time() - t0
                disp = -(-n_bonds // fuse)
                print(f"| {label} | {fuse} | {NCH * k / dt:.2f} | {disp} "
                      f"| {1e3 * dt / (k * disp):.1f} |", flush=True)
            except Exception as ex:
                print(f"| {label} | {fuse} | ERR {str(ex)[:50]} | | |",
                      flush=True)


def main(quick=False):
    print("| lattice | D | chi | chain-sweeps/sec |")
    print("|---|---|---|---|")
    for cfg in CONFIGS:
        try:
            measure_row(*cfg, quick)
        except Exception as ex:
            print(f"| {cfg[0]} | {cfg[3]} | {cfg[4]} | ERR "
                  f"{str(ex)[:60]} |", flush=True)
    pbc_fuse_scaling(quick)


if __name__ == "__main__":
    main(quick=(len(sys.argv) > 1 and sys.argv[1] == "quick"))
