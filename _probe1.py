"""Sweep-only chains-scaling probe (TPU)."""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

LY = LX = 8
D = 8
CHI = 32
DTYPE = jnp.float32


def main(counts):
    from peps_tpu.linalg import TruncParams
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.tps import random_tps

    tps = random_tps(jax.random.PRNGKey(0), LY, LX, 2, D, dtype=DTYPE,
                     scale=0.6)
    tps = tps / jnp.max(jnp.abs(tps))
    tps_t = transpose_tps(tps)
    n = LY * LX
    trunc = TruncParams(CHI, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")

    def sweep_only(configs, key, k):
        nc = configs.shape[0]

        def body(carry, _):
            configs, key = carry
            keys = jax.random.split(key, nc + 1)
            cfgs, _, st = jax.vmap(
                mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
                tps, tps_t, configs, keys[1:], CHI, trunc, rule)
            return (cfgs, keys[0]), jnp.sum(st.accepted)

        (configs, _), accs = jax.lax.scan(body, (configs, key), None,
                                          length=k)
        return configs, accs[-1]

    f_sweep = jax.jit(sweep_only, static_argnames=("k",))
    for nch in counts:
        configs = init_configs_occupancy(
            jax.random.PRNGKey(1), nch, LY, LX, {0: n // 2, 1: n - n // 2})
        k = 4
        t_c = time.time()
        cfgs, a = f_sweep(configs, jax.random.PRNGKey(2), k)
        _ = float(a) + float(jnp.sum(cfgs))
        compile_s = time.time() - t_c
        t0 = time.time()
        cfgs2, a = f_sweep(cfgs, jax.random.PRNGKey(3), k)
        _ = float(a) + float(jnp.sum(cfgs2))
        dt = time.time() - t0
        rec = {"nchains": nch, "sweeps_per_sec": round(nch * k / dt, 2),
               "sec_per_sweepstep": round(dt / k, 4),
               "compile_s": round(compile_s, 1)}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [32, 128, 512]
    main(counts)
