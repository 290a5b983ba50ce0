"""Benchmark: FULL VMC training steps/sec, 8x8 Heisenberg D=8 chi=32.

Prints ONE JSON line. Headline metric = full training steps per second,
where one step = [one MC sweep per chain over all 32 chains] + [local
energy + gradient holes for every chain] + [SR natural gradient via
matrix-free CG] + [parameter update] — the reference's per-iteration work
(mc_energy_grad_evaluator.h + optimizer SR path), not just the sweep.

Extra fields:
  flops_per_step / mfu_bf16  — XLA cost_analysis FLOPs and the fraction of
      a v5e chip's 197 TFLOP/s bf16 peak (conservative: we run f32).
  accuracy_rel_diff          — |E_sketch - E_svd| / |E_svd| of the local
      energies on identical configurations: the accuracy gate for the
      matmul-only randomized "sketch" compression used by the bench.
  samples_per_sec            — chains x steps / sec (the unit the baseline
      chain of inference is expressed in).
  baseline_estimated: true   — the reference CANNOT be built here (its
      qlten/qlmps dependencies are external CMake packages, not vendored,
      and this machine has no network egress), so vs_baseline rests on the
      reference's only published wall-clock log (BASELINE.md: 3x4
      Heisenberg D=8, 40 SR iters x 100 samples + 1000 measure samples in
      159.5 s on 4 MPI ranks, Apple M3 Pro) scaled by the standard BMPS
      cost model; every factor of that chain is computed below in
      `baseline_samples_per_sec()`.
"""
import json
import time

import jax
import jax.numpy as jnp

LY = LX = 8
D = 8
CHI = 32
NCHAINS = 32
DTYPE = jnp.float32
PEAK_BF16 = 197e12        # v5e chip peak (TFLOP/s)


def baseline_samples_per_sec():
    """Estimated reference MC-sample throughput at the bench config.

    Chain of inference (all numbers from BASELINE.md's recorded run):
      - 159.5 s for 40 SR iterations x 100 samples + 1000 measurement
        samples on 4 ranks => 5000 sweeps total (sweep == sample there)
        => 5000/159.5 = 31.3 samples/s across 4 ranks at 3x4, D<=8, small
        chi (the run log does not state chi; D'=6 after SU, chi' ~ 2D').
      - BMPS sweep cost model (SURVEY.md section 3.3):
        cost ~ N * chi^2 * D^2 * (D^2 + chi) per sweep.
        3x4:  12 * 12^2 * 6^2 * (36 + 12)   = 2.99e6
        8x8:  64 * 32^2 * 8^2 * (64 + 32)   = 4.03e8
        ratio ~ 134.8.
      - => baseline ~ 31.3 / 134.8 = 0.232 samples/s (4 M3 cores), i.e.
        0.058 samples/s per core; we compare a TPU chip against the 4-rank
        figure (chip vs. laptop-package).
    """
    samples_per_sec_3x4 = 5000.0 / 159.5
    cost_3x4 = 12 * 12 ** 2 * 6 ** 2 * (6 ** 2 + 12)
    cost_8x8 = 64 * CHI ** 2 * D ** 2 * (D ** 2 + CHI)
    return samples_per_sec_3x4 * (cost_3x4 / cost_8x8)


def main():
    from peps_tpu.algorithm.energy import ModelTensors
    from peps_tpu.algorithm.mc_evaluator import _mc_collect
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule
    from peps_tpu.optimizer.cg import CGParams, cg_solve

    import numpy as np
    from peps_tpu.peps import (SimpleUpdateParams, product_peps,
                               simple_update, to_tps)

    # physical initial state: short simple update (random states at this
    # size are pathologically conditioned and make both the benchmark and
    # the accuracy gate meaningless)
    model_su = spin.heisenberg(1.0)
    occ = np.indices((LY, LX)).sum(0) % 2
    peps0 = product_peps(LY, LX, D, occ, 2, dtype=DTYPE)
    su = simple_update(peps0, model_su.h_h, model_su.h_v,
                       SimpleUpdateParams(steps=100, tau=0.1,
                                          trunc=TruncParams(D, 1, 1e-8)))
    tps = to_tps(su.peps)
    tps = tps / jnp.max(jnp.abs(tps))
    n = LY * LX
    configs = init_configs_occupancy(jax.random.PRNGKey(1), NCHAINS, LY, LX,
                                     {0: n // 2, 1: n - n // 2})
    model = ModelTensors.from_model(spin.heisenberg(1.0), DTYPE)
    trunc = TruncParams(CHI, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    diag_shift = 1e-3
    lr = 0.05

    def train_step(tps, configs, key):
        """Sweep + energy/holes + SR CG + update (one optimizer iteration)."""
        cfgs, key, acc, tri, outs = _mc_collect(
            tps, configs, key, model, CHI, trunc, rule,
            n_samples=1, sweeps_between=1, with_sr=True, eval_chunk=8)
        e_locs, o_full, _, _, _ = outs
        ns = e_locs.size
        energy = jnp.mean(jnp.real(e_locs))
        o_flat = o_full.reshape(ns, -1)
        obar = jnp.mean(o_flat, axis=0)
        a = (o_flat - obar[None, :]) / jnp.sqrt(ns * 1.0).astype(o_flat.dtype)
        eps = 2.0 * (e_locs.reshape(ns) - energy).astype(o_flat.dtype) \
            / jnp.sqrt(ns * 1.0).astype(o_flat.dtype)
        grad = a.T @ eps

        def matvec(v):
            return a.T @ (a @ v) + diag_shift * v

        res = cg_solve(matvec, grad, None, CGParams(max_iter=30, tol=1e-5))
        new_tps = tps - lr * res.x.reshape(tps.shape).astype(tps.dtype)
        # per-step O(1) renormalization (NormalizeStateOrder1's role in the
        # real pipeline): without it amplitudes ~ s^64 overflow f32 within
        # a few updates
        new_tps = new_tps / jnp.max(jnp.abs(new_tps))
        return new_tps, cfgs, key, energy

    def run_steps(tps, configs, key, k):
        def body(carry, _):
            tps, configs, key = carry
            tps, configs, key, e = train_step(tps, configs, key)
            return (tps, configs, key), e
        (tps, configs, key), es = jax.lax.scan(body, (tps, configs, key),
                                               None, length=k)
        return es[-1], configs

    f = jax.jit(run_steps, static_argnames=("k",))
    n_steps = 4
    # compile + warm-up with the SAME static k as the timed call.
    # Synchronize by MATERIALIZING host values: on remote-attached TPU
    # runtimes (axon tunnel) jax.block_until_ready can be a no-op — only a
    # device->host transfer reliably fences the timing.
    e, cfgs = f(tps, configs, jax.random.PRNGKey(2), n_steps)
    _ = float(e) + float(jnp.sum(cfgs))

    t0 = time.time()
    e, cfgs2 = f(tps, cfgs, jax.random.PRNGKey(3), n_steps)
    e_host = float(e) + 0.0 * float(jnp.sum(cfgs2))
    dt = time.time() - t0
    assert np.isfinite(e_host), f"training-step energy not finite: {e}"
    steps_per_sec = n_steps / dt
    samples_per_sec = steps_per_sec * NCHAINS

    # FLOP accounting
    try:
        lowered = jax.jit(train_step).lower(tps, configs,
                                            jax.random.PRNGKey(4))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    mfu = (flops * steps_per_sec / PEAK_BF16) if flops == flops else None

    # accuracy gate: fast vs svd mean local energy on identical configs
    from peps_tpu.algorithm.energy import local_energy_and_holes
    sub = cfgs[:16]
    tr_svd = TruncParams(CHI, 1, 1e-6, scheme="svd")

    def e_locs_of(tr):
        f_e = jax.jit(lambda c: jax.lax.map(
            lambda cc: local_energy_and_holes(
                tps, cc, model, CHI, tr, with_holes=False).e_loc,
            c, batch_size=4))
        return np.asarray(f_e(sub))

    ef = e_locs_of(trunc)
    es_ = e_locs_of(tr_svd)
    finite = np.isfinite(ef) & np.isfinite(es_)
    n_bad = int((~finite).sum())
    if finite.any():
        acc_rel = float(np.max(np.abs(ef[finite] - es_[finite])
                               / np.maximum(np.abs(es_[finite]), 1e-12)))
    else:
        acc_rel = float("nan")

    base = baseline_samples_per_sec()
    print(json.dumps({
        "metric": "vmc_full_train_steps_per_sec_8x8_heisenberg_D8_chi32",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip (1 step = 32-chain sweep + energy/holes + SR-CG + update)",
        "vs_baseline": round(samples_per_sec / base, 2),
        "samples_per_sec": round(samples_per_sec, 2),
        "baseline_samples_per_sec_estimated": round(base, 4),
        "baseline_estimated": True,
        "flops_per_step": flops,
        "mfu_bf16": round(mfu, 4) if mfu is not None else None,
        "accuracy_rel_diff_sketch_vs_svd": round(acc_rel, 8),
        "accuracy_nonfinite_configs": n_bad,
    }))


if __name__ == "__main__":
    main()
