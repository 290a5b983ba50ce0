"""Benchmark: MC sweeps/sec/chip, 8x8 Heisenberg D=8 (BASELINE.json north star).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation (BASELINE.md): the reference's recorded run gives order
10-50 MC sweeps/sec/rank at 3x4 lattice, D<=8, on an M3 Pro core. Scaling the
per-sweep contraction cost from 3x4/D~6 to 8x8/D=8/chi=32 (cost ~ Lx*Ly*
chi^2*D^2*(D^2+chi) per sweep) gives an estimated ~1 sweep/sec/core for the
C++ reference at the benchmark config; we use 1.0 chain-sweeps/sec as the
single-core baseline anchor. vs_baseline = our sweeps/sec/chip / 1.0.
"""
import json
import time

import jax
import jax.numpy as jnp

LY = LX = 8
D = 8
CHI = 32
NCHAINS = 128
SCHEME = "fast"   # matmul-only compression (see contraction/bmps.py)
DTYPE = jnp.float32
BASELINE_SWEEPS_PER_SEC = 1.0


def main():
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.linalg import TruncParams
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
    from peps_tpu.tps import random_tps

    key = jax.random.PRNGKey(0)
    tps = random_tps(key, LY, LX, 2, D, dtype=DTYPE, scale=0.6)
    n = LY * LX
    configs = init_configs_occupancy(jax.random.PRNGKey(1), NCHAINS, LY, LX,
                                     {0: n // 2, 1: n - n // 2})
    trunc = TruncParams(CHI, 1, 1e-6, scheme=SCHEME)
    rule = UpdateRule("exchange")
    tps_t = transpose_tps(tps)

    def sweepn(t, tt, c, k, nst):
        def body(carry, _):
            c, k = carry
            k, ks = jax.random.split(k)
            keys = jax.random.split(ks, c.shape[0])
            cn, _, st = jax.vmap(
                mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
                t, tt, c, keys, CHI, trunc, rule)
            return (cn, k), st.accepted.sum()
        (c, k), accs = jax.lax.scan(body, (c, k), None, length=nst)
        return c, accs

    f = jax.jit(sweepn, static_argnames=("nst",))
    # warm-up / compile
    out = f(tps, tps_t, configs, jax.random.PRNGKey(2), 1)
    jax.block_until_ready(out)
    cfgs = out[0]

    n_meas = 5
    t0 = time.time()
    out = f(tps, tps_t, cfgs, jax.random.PRNGKey(3), n_meas)
    jax.block_until_ready(out)
    dt = time.time() - t0
    sweeps_per_sec = n_meas * NCHAINS / dt

    print(json.dumps({
        "metric": "mc_chain_sweeps_per_sec_8x8_heisenberg_D8_chi32",
        "value": round(sweeps_per_sec, 3),
        "unit": "chain-sweeps/sec/chip",
        "vs_baseline": round(sweeps_per_sec / BASELINE_SWEEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
