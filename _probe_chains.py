"""Chains-scaling probe on the real TPU: sweep-only and full-step
throughput at several chain counts, plus bytes-accessed accounting."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LY = LX = 8
D = 8
CHI = 32
DTYPE = jnp.float32


def main():
    from peps_tpu.algorithm.energy import ModelTensors
    from peps_tpu.algorithm.mc_evaluator import _mc_collect
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.peps import (SimpleUpdateParams, product_peps,
                               simple_update, to_tps)

    model_su = spin.heisenberg(1.0)
    occ = np.indices((LY, LX)).sum(0) % 2
    peps0 = product_peps(LY, LX, D, occ, 2, dtype=DTYPE)
    su = simple_update(peps0, model_su.h_h, model_su.h_v,
                       SimpleUpdateParams(steps=60, tau=0.1,
                                          trunc=TruncParams(D, 1, 1e-8)))
    tps = to_tps(su.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    tps_t = transpose_tps(tps)
    n = LY * LX
    model = ModelTensors.from_model(spin.heisenberg(1.0), DTYPE)
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

    out = {}
    for nch in (32, 64, 128, 256):
        configs = init_configs_occupancy(
            jax.random.PRNGKey(1), nch, LY, LX, {0: n // 2, 1: n - n // 2})
        k = 4
        cfgs, a = f_sweep(configs, jax.random.PRNGKey(2), k)
        _ = float(a) + float(jnp.sum(cfgs))
        t0 = time.time()
        cfgs2, a = f_sweep(cfgs, jax.random.PRNGKey(3), k)
        _ = float(a) + float(jnp.sum(cfgs2))
        dt = time.time() - t0
        out[nch] = {"sweeps_per_sec": round(nch * k / dt, 2),
                    "sec_per_sweepstep": round(dt / k, 4)}
        # bytes + flops of ONE sweep step at this chain count
        try:
            low = jax.jit(lambda c, kk: sweep_only(c, kk, 1)).lower(
                configs, jax.random.PRNGKey(0))
            cost = low.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            out[nch]["flops"] = float(cost.get("flops", float("nan")))
            out[nch]["bytes"] = float(cost.get("bytes accessed",
                                               float("nan")))
        except Exception as e:
            out[nch]["err"] = str(e)[:80]
        print(json.dumps({str(nch): out[nch]}), flush=True)

    # full eval (energy+holes) scaling
    for nch in (32, 64, 128, 256):
        configs = init_configs_occupancy(
            jax.random.PRNGKey(1), nch, LY, LX, {0: n // 2, 1: n - n // 2})
        chunk = 8 if nch <= 64 else 16

        def step(tps_, configs_, key):
            cfgs, key, acc, tri, outs = _mc_collect(
                tps_, configs_, key, model, CHI, trunc, rule,
                n_samples=1, sweeps_between=1, with_sr=False,
                with_grad=True, eval_chunk=chunk)
            return cfgs, outs[0]

        f = jax.jit(step)
        cfgs, el = f(tps, configs, jax.random.PRNGKey(2))
        _ = float(jnp.sum(el)) + float(jnp.sum(cfgs))
        t0 = time.time()
        cfgs2, el = f(tps, cfgs, jax.random.PRNGKey(3))
        _ = float(jnp.sum(el)) + float(jnp.sum(cfgs2))
        dt = time.time() - t0
        print(json.dumps({f"evalstep_{nch}": {
            "samples_per_sec": round(nch / dt, 2),
            "sec": round(dt, 4)}}), flush=True)


if __name__ == "__main__":
    main()
