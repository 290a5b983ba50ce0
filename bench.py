"""Benchmark: FULL VMC training steps/sec, 8x8 Heisenberg D=8 chi=32.

Prints ONE JSON line. Headline metric = full training steps per second,
where one step = [one MC sweep per chain over all 32 chains] + [local
energy + gradient holes for every chain] + [SR natural gradient via
matrix-free CG] + [parameter update] — the reference's per-iteration work
(mc_energy_grad_evaluator.h + optimizer SR path), not just the sweep.

Round-3 accounting fields (VERDICT r2 ask):
  sweeps_per_sec_sweep_only  — MC chain-sweeps/s, sweep kernel alone (the
      round-1 metric, for round-over-round comparability).
  chains_scaling             — samples/s at 32 and 128 chains. Measured
      flat (linear time growth): the sweep+eval work is genuinely
      per-chain compute, NOT a latency floor — more chains per chip do
      not help; scale chains ACROSS chips (parallel/mesh.py).
  flops_per_step / mfu_bf16  — XLA cost_analysis FLOPs; fraction of the
      197 TFLOP/s bf16 peak.
  bytes_per_step / mbu_hbm   — cost_analysis bytes accessed; fraction of
      the 819 GB/s v5e HBM peak. Both utilizations are low (<1% MFU,
      ~10% MBU): at chi=32/D=8 the physical tensors are [32,8,32]-sized
      and the program is bound by op-granularity on such shapes, not by
      either roofline (docs/tpu_engineering.md "Round-3 measurements").
  graded_tj_6x6_D8           — secondary fermionic config: full graded
      train step (env-shared fermionic sweep + AD holes + SR) on a 6x6
      t-J state with 2 holes at D=8 chi=32.
  accuracy_rel_diff          — |E_sketch - E_svd| / |E_svd| on identical
      configurations: the accuracy gate for the randomized "sketch"
      compression used by the bench.
  baseline_estimated: true   — the reference CANNOT be built here (its
      qlten/qlmps dependencies are external CMake packages, not vendored,
      and this machine has no network egress), so vs_baseline rests on the
      reference's only published wall-clock log (BASELINE.md) scaled by
      the standard BMPS cost model; see `baseline_samples_per_sec()`.
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
PEAK_HBM = 819e9          # v5e HBM bandwidth (bytes/s)


def baseline_samples_per_sec():
    """Estimated reference MC-sample throughput at the bench config.

    Chain of inference (all numbers from BASELINE.md's recorded run):
      - 159.5 s for 40 SR iterations x 100 samples + 1000 measurement
        samples on 4 ranks => 5000 sweeps total => 31.3 samples/s across
        4 ranks at 3x4, D<=8, small chi.
      - BMPS sweep cost model (SURVEY.md section 3.3):
        cost ~ N * chi^2 * D^2 * (D^2 + chi) per sweep; ratio 3x4 -> 8x8
        at the bench chi/D ~ 134.8.
      - => baseline ~ 31.3 / 134.8 = 0.232 samples/s (4 M3 cores)."""
    samples_per_sec_3x4 = 5000.0 / 159.5
    cost_3x4 = 12 * 12 ** 2 * 6 ** 2 * (6 ** 2 + 12)
    cost_8x8 = 64 * CHI ** 2 * D ** 2 * (D ** 2 + CHI)
    return samples_per_sec_3x4 * (cost_3x4 / cost_8x8)


def _sync(*xs):
    """Fence by materializing host scalars (block_until_ready is a no-op
    through the axon tunnel)."""
    return sum(float(jnp.sum(x)) for x in xs)


def _cost(fn, *args):
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", float("nan"))),
                float(cost.get("bytes accessed", float("nan"))),
                _padding_factor(compiled))
    except Exception:
        return float("nan"), float("nan"), float("nan")


_SHAPE_RE = __import__("re").compile(
    r"\b(pred|s8|u8|s16|u16|s32|u32|s64|u64|bf16|f16|f32|f64|c64|c128)"
    r"\[([0-9,]*)\]\{([^}]*)\}")
_ITEM = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
         "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
         "f64": 8, "c64": 8, "c128": 16}


def _padding_factor(compiled) -> float:
    """Physical/logical byte ratio of the compiled program's buffers.

    cost_analysis() reports LOGICAL bytes; on TPU every buffer is laid out
    in (8, 128)-element tiles (x(2,1) sub-tiles for 16-bit types), so a
    [.., 32]-minor f32 buffer physically moves 4x its logical bytes. This
    walks every shape+layout token of the optimized HLO and returns
    sum(padded)/sum(logical) — an instruction-weighted estimate (loop trip
    counts weight both sums identically, so the RATIO is the meaningful
    number; the r4 verdict's 'MBU uses logical bytes' gap)."""
    try:
        text = compiled.as_text()
    except Exception:
        return float("nan")
    logical = padded = 0
    for m in _SHAPE_RE.finditer(text):
        dt, dims_s, layout = m.group(1), m.group(2), m.group(3)
        dims = [int(x) for x in dims_s.split(",") if x]
        if not dims:
            continue
        item = _ITEM[dt]
        lsz = item
        for d in dims:
            lsz *= d
        tile = None
        ti = layout.find("T(")
        if ti >= 0:
            tpart = layout[ti + 2:]
            tdims = tpart.split(")")[0]
            try:
                tile = [int(x) for x in tdims.split(",")]
            except ValueError:
                tile = None
        pdims = list(dims)
        if tile and len(tile) >= 2:
            # layout minor-to-major permutation: first index = minor dim
            try:
                perm = [int(x) for x in layout.split(":")[0].split(",")]
            except ValueError:
                perm = list(range(len(dims)))[::-1]
            sub = 1
            if ")(" in layout:           # 16-bit sub-tile (2,1)
                sub = 2
            if len(perm) >= 1:
                mi = perm[0]
                pdims[mi] = -(-pdims[mi] // tile[-1]) * tile[-1]
            if len(perm) >= 2:
                mi2 = perm[1]
                t2 = tile[-2] * sub
                pdims[mi2] = -(-pdims[mi2] // t2) * t2
        psz = item
        for d in pdims:
            psz *= d
        logical += lsz
        padded += psz
    return padded / logical if logical else float("nan")


def _su_tps(ly, lx, D, su_steps):
    """Physical initial state: short simple update (random states at this
    size are pathologically conditioned)."""
    import numpy as np
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.peps import (SimpleUpdateParams, product_peps,
                               simple_update, to_tps)
    model_su = spin.heisenberg(1.0)
    occ = np.indices((ly, lx)).sum(0) % 2
    peps0 = product_peps(ly, lx, D, occ, 2, dtype=DTYPE)
    su = simple_update(peps0, model_su.h_h, model_su.h_v,
                       SimpleUpdateParams(steps=su_steps, tau=0.1,
                                          trunc=TruncParams(D, 1, 1e-8)))
    tps = to_tps(su.peps)
    return tps / jnp.max(jnp.abs(tps))


def _make_train_step(model, chi, trunc, rule, diag_shift=1e-3, lr=0.05,
                     eval_chunk=8):
    """Sweep + energy/holes + SR CG + update (one optimizer iter)."""
    from peps_tpu.algorithm.mc_evaluator import _mc_collect
    from peps_tpu.optimizer.cg import CGParams, cg_solve

    def train_step(tps, configs, key):
        cfgs, key, acc, tri, outs = _mc_collect(
            tps, configs, key, model, chi, trunc, rule,
            n_samples=1, sweeps_between=1, with_sr=True,
            eval_chunk=eval_chunk)
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
        new_tps = new_tps / jnp.max(jnp.abs(new_tps))
        return new_tps, cfgs, key, energy

    return train_step


def _train_metrics(ly, lx, D, chi, nchains, su_steps=60, n_steps=4,
                   eval_chunk=8):
    """Full-train-step throughput + roofline accounting at one config.
    Returns (metrics dict, final tps, final configs)."""
    import numpy as np
    from peps_tpu.algorithm.energy import ModelTensors
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule

    tps = _su_tps(ly, lx, D, su_steps)
    n = ly * lx
    model = ModelTensors.from_model(spin.heisenberg(1.0), DTYPE)
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    configs = init_configs_occupancy(jax.random.PRNGKey(1), nchains, ly, lx,
                                     {0: n // 2, 1: n - n // 2})
    train_step = _make_train_step(model, chi, trunc, rule,
                                  eval_chunk=eval_chunk)

    def run_steps(tps, configs, key, k):
        def body(carry, _):
            tps, configs, key = carry
            tps, configs, key, e = train_step(tps, configs, key)
            return (tps, configs, key), e
        (tps, configs, key), es = jax.lax.scan(body, (tps, configs, key),
                                               None, length=k)
        return es[-1], configs

    f = jax.jit(run_steps, static_argnames=("k",))
    e, cfgs = f(tps, configs, jax.random.PRNGKey(2), n_steps)
    _sync(e, cfgs)
    t0 = time.time()
    e, cfgs2 = f(tps, cfgs, jax.random.PRNGKey(3), n_steps)
    e_host = float(e) + 0.0 * _sync(cfgs2)
    dt = time.time() - t0
    assert np.isfinite(e_host), f"training-step energy not finite: {e}"
    steps_per_sec = n_steps / dt
    flops, bytes_, pad = _cost(train_step, tps, configs,
                               jax.random.PRNGKey(4))
    metrics = {
        "config": f"{ly}x{lx} D={D} chi={chi}, {nchains} chains",
        "steps_per_sec": round(steps_per_sec, 4),
        "samples_per_sec": round(steps_per_sec * nchains, 2),
        "flops_per_step": flops,
        "bytes_per_step": bytes_,
        "mfu_bf16": round(flops * steps_per_sec / PEAK_BF16, 5),
        "mbu_hbm": round(bytes_ * steps_per_sec / PEAK_HBM, 4),
        # physical (tile-padded) traffic estimate — see _padding_factor
        "hbm_padding_factor": round(pad, 3),
        "mbu_hbm_physical_est": round(
            bytes_ * pad * steps_per_sec / PEAK_HBM, 4),
    }
    return metrics, tps, cfgs


def main():
    import numpy as np

    from peps_tpu.algorithm.energy import ModelTensors, local_energy_and_holes
    from peps_tpu.lattice import transpose_tps
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models import spin
    from peps_tpu.montecarlo.engine import init_configs_occupancy
    from peps_tpu.montecarlo.sweep import UpdateRule, mc_sweep

    # ---- headline: full train step at 32 chains, north-star config ----
    head, tps, cfgs = _train_metrics(LY, LX, D, CHI, NCHAINS, su_steps=100)
    steps_per_sec = head["steps_per_sec"]
    samples_per_sec = head["samples_per_sec"]
    flops, bytes_ = head["flops_per_step"], head["bytes_per_step"]
    mfu, mbu = head["mfu_bf16"], head["mbu_hbm"]

    # ---- MFU-vs-size curve (VERDICT r3 #1): does utilization climb with
    # (L, D, chi)? The README sweep table already runs these sizes; this
    # adds the train-step roofline accounting at each.
    mfu_by_config = [head]
    # 16x16 D=12 chi=48 at eval_chunk=8 OOMs HBM (19.3 GB holes/table
    # intermediates vs 16 GB v5e) — chunk 2 keeps the per-chunk peak flat
    for (ly2, lx2, d2, chi2, ec) in ((12, 12, 10, 40, 8),
                                     (16, 16, 12, 48, 2)):
        try:
            m2, _, _ = _train_metrics(ly2, lx2, d2, chi2, NCHAINS,
                                      su_steps=30, n_steps=2, eval_chunk=ec)
            mfu_by_config.append(m2)
        except Exception as ex:            # keep the headline alive
            mfu_by_config.append({
                "config": f"{ly2}x{lx2} D={d2} chi={chi2}",
                "error": str(ex)[:200]})

    n = LY * LX
    trunc = TruncParams(CHI, 1, 1e-6, scheme="sketch")
    rule = UpdateRule("exchange")
    model = ModelTensors.from_model(spin.heisenberg(1.0), DTYPE)
    tps_t = transpose_tps(tps)

    def make_configs(nch):
        return init_configs_occupancy(jax.random.PRNGKey(1), nch, LY, LX,
                                      {0: n // 2, 1: n - n // 2})

    # ---- sweep-only throughput (round-1 metric) + chains scaling ----
    def sweep_k(configs, key, k):
        nc = configs.shape[0]

        def body(carry, _):
            configs, key = carry
            keys = jax.random.split(key, nc + 1)
            out, _, st = jax.vmap(
                mc_sweep, in_axes=(None, None, 0, 0, None, None, None))(
                tps, tps_t, configs, keys[1:], CHI, trunc, rule)
            return (out, keys[0]), jnp.sum(st.accepted)

        (configs, _), accs = jax.lax.scan(body, (configs, key), None,
                                          length=k)
        return configs, accs[-1]

    fs = jax.jit(sweep_k, static_argnames=("k",))
    chains_scaling = {}
    sweeps_only_32 = None
    for nch in (32, 128):
        cfgs_n = make_configs(nch)
        k = 4
        out, a = fs(cfgs_n, jax.random.PRNGKey(5), k)
        _sync(out, a)
        t0 = time.time()
        out, a = fs(out, jax.random.PRNGKey(6), k)
        _sync(out, a)
        dtn = time.time() - t0
        chains_scaling[str(nch)] = {
            "sweeps_per_sec": round(nch * k / dtn, 1),
            "sec_per_sweep_step": round(dtn / k, 4)}
        if nch == 32:
            sweeps_only_32 = nch * k / dtn

    # ---- graded fermionic secondary config: 6x6 t-J 2 holes D=8 ----
    graded = {}
    try:
        graded = _graded_config()
    except Exception as ex:             # keep the headline alive
        graded = {"error": str(ex)[:200]}

    # ---- accuracy gate: sketch vs svd local energies ----
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
    acc_rel = (float(np.max(np.abs(ef[finite] - es_[finite])
                            / np.maximum(np.abs(es_[finite]), 1e-12)))
               if finite.any() else float("nan"))

    base = baseline_samples_per_sec()
    print(json.dumps({
        "metric": "vmc_full_train_steps_per_sec_8x8_heisenberg_D8_chi32",
        "value": round(steps_per_sec, 4),
        "unit": "steps/sec/chip (1 step = 32-chain sweep + energy/holes + SR-CG + update)",
        "vs_baseline": round(samples_per_sec / base, 2),
        "samples_per_sec": round(samples_per_sec, 2),
        "sweeps_per_sec_sweep_only": round(sweeps_only_32, 1),
        "chains_scaling": chains_scaling,
        "baseline_samples_per_sec_estimated": round(base, 4),
        "baseline_estimated": True,
        "flops_per_step": flops,
        "bytes_per_step": bytes_,
        "mfu_bf16": round(mfu, 5),
        "mbu_hbm": round(mbu, 4),
        "hbm_padding_factor": head.get("hbm_padding_factor"),
        "mbu_hbm_physical_est": head.get("mbu_hbm_physical_est"),
        "mfu_by_config": mfu_by_config,
        "graded_tj_6x6_D8": graded,
        "accuracy_rel_diff_sketch_vs_svd": round(acc_rel, 8),
        "accuracy_nonfinite_configs": n_bad,
    }))


def _graded_config():
    """Full graded train step on 6x6 t-J, 2 holes, D=8 chi=32, 32 chains
    (VERDICT r2 #3 done criterion). State: graded SU at D=4 with U(1)
    charges, parity-block-expanded to D=8."""
    import numpy as np

    from peps_tpu.algorithm.mc_evaluator import _mc_collect
    from peps_tpu.fermion.peps import (FermionSpace, expand_bond_dim_graded,
                                       fermion_simple_update,
                                       product_fermion_peps,
                                       space_for_model, to_tps_fermion,
                                       u1_charges_for)
    from peps_tpu.fermion.vmc import GradedFermionModel
    from peps_tpu.linalg import TruncParams
    from peps_tpu.models.fermion import tj_model
    from peps_tpu.optimizer.cg import CGParams, cg_solve
    from peps_tpu.peps import SimpleUpdateParams

    ly = lx = 6
    chi = 32
    nchains = 32
    model = tj_model(3.0, 1.0)
    occ0 = (np.indices((ly, lx)).sum(0) % 2 + 1).astype(int)
    occ0[2, 2] = 0   # removes an up spin
    occ0[3, 2] = 0   # removes a down spin -> Sz = 0 (same doping as
    #                  examples/flagship_tj_6x6.py)
    space4 = space_for_model(model, 4)
    charges = u1_charges_for(model, space4, occ0)
    peps = product_fermion_peps(ly, lx, space4, occ0)
    out = fermion_simple_update(
        peps, model, space4,
        SimpleUpdateParams(steps=40, tau=0.1, trunc=TruncParams(4, 1, 1e-12)),
        charges=charges)
    tps4 = to_tps_fermion(out.peps).astype(DTYPE)
    tps4 = tps4 / jnp.max(jnp.abs(tps4))
    space8 = FermionSpace(space4.phys_parity, 4, 4)
    tps = expand_bond_dim_graded(tps4, space4, space8, noise=1e-3,
                                 key=jax.random.PRNGKey(11))
    gm = GradedFermionModel.from_model(model, space8, tps.dtype)
    trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
    cfgs = jnp.asarray(np.stack(
        [occ0, occ0[::-1], occ0[:, ::-1], occ0[::-1, ::-1]] * (nchains // 4)
    ).astype(np.int32))

    def train_step(tps, configs, key):
        cfgs, key, acc, tri, outs = _mc_collect(
            tps, configs, key, gm, chi, trunc, None,
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
            return a.T @ (a @ v) + 1e-3 * v

        res = cg_solve(matvec, grad, None, CGParams(max_iter=30, tol=1e-5))
        return tps - 0.05 * res.x.reshape(tps.shape), cfgs, key, energy

    f = jax.jit(train_step)
    new_tps, c2, _, e = f(tps, cfgs, jax.random.PRNGKey(2))
    _sync(c2)
    e0 = float(e)
    t0 = time.time()
    k = 3
    cur = cfgs
    for i in range(k):
        new_tps, cur, _, e = f(tps, cur, jax.random.fold_in(
            jax.random.PRNGKey(3), i))
    e_host = float(e) + 0.0 * _sync(cur)
    dt = (time.time() - t0) / k
    import numpy as _np
    assert _np.isfinite(e_host), "graded bench energy not finite"
    return {"config": "6x6 tJ 2holes D=8 chi=32, 32 chains",
            "steps_per_sec": round(1.0 / dt, 4),
            "samples_per_sec": round(nchains / dt, 2)}


def _device_alive(timeout_s: int = 150) -> bool:
    """Probe the backend in a SUBPROCESS with a timeout. The axon TPU
    tunnel can wedge such that the first device op hangs forever (worker
    crash); probing in-process would hang the whole bench."""
    import subprocess
    import sys
    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((128, 128));"
            "print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _device_alive_with_retry() -> bool:
    """Retry the probe with backoff (~35 min total) so a transient tunnel
    outage cannot zero a round's bench artifact (it did in round 3; round-4
    observed dead windows of 10-25 min)."""
    import os
    import sys
    waits = (30, 60, 120, 240, 300, 300, 300, 300, 300)
    if _device_alive():
        return True
    if os.environ.get("BENCH_NO_RETRY"):
        return False
    for i, w in enumerate(waits):
        print(f"device probe failed; retry {i + 1}/{len(waits)} "
              f"in {w}s", file=sys.stderr, flush=True)
        time.sleep(w)
        if _device_alive():
            return True
    return False


def _run_with_crash_retries() -> None:
    """Run the bench body in a SUBPROCESS with up to 3 attempts: the tunnel
    worker can crash MID-RUN (seen round 4), which wedges the in-process
    jax client — a fresh process per attempt is the only clean recovery.
    Forwards the successful attempt's stdout (the JSON line) verbatim."""
    import os
    import subprocess
    import sys
    attempts = 1 if os.environ.get("BENCH_NO_RETRY") else 3
    for i in range(attempts):
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--inner"], capture_output=True, text=True,
                           timeout=7200)
        sys.stderr.write(r.stderr[-4000:])
        if r.returncode == 0 and '"metric"' in r.stdout:
            sys.stdout.write(r.stdout)
            return
        print(f"bench attempt {i + 1}/{attempts} failed "
              f"(rc={r.returncode}); tail: {r.stdout[-300:]!r}",
              file=sys.stderr, flush=True)
        # defensive: if the failure smells like a poisoned persistent
        # compile-cache entry (partial write by a crashed worker), wipe the
        # cache so the next attempt recompiles from scratch instead of
        # re-reading the bad artifact on every retry
        low = (r.stderr or "").lower()
        if any(s in low for s in ("deserializ", "cache_entry", "corrupt",
                                  "failed to load compilation cache")):
            import shutil
            cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
            shutil.rmtree(cache, ignore_errors=True)
            print("cleared .jax_cache/ (cache-read error in stderr)",
                  file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(240)
    print(json.dumps({
        "metric": "vmc_full_train_steps_per_sec",
        "value": 0.0,
        "unit": "steps/sec/chip",
        "vs_baseline": 0.0,
        "error": "device backend unreachable or crashed mid-run on every "
                 "attempt (axon TPU tunnel; probed with ~35 min backoff, "
                 "3 full-run attempts). Last measured values are recorded "
                 "in README.md 'Benchmark' and BENCH-local runs."}))


if __name__ == "__main__":
    import sys as _sys
    if "--inner" in _sys.argv[1:]:
        if not _device_alive_with_retry():
            raise SystemExit(3)
        # persistent compile cache: a crash-retry attempt (fresh process)
        # re-enters with the prior attempt's executables already built
        import os as _os
        jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                          ".jax_cache"))
        main()
    else:
        _run_with_crash_retries()
