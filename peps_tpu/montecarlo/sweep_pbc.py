"""Monte Carlo sweep for periodic lattices (coarse-graining contractor).

Reference: the PBC sweep base picks random bonds with TRG trial/commit
(`square_nn_updater.h:90-128`, `BeginTrialWithReplacement`/`CommitTrial`).
TPU version: a deterministic scan over all NN bonds; each bond computes its
full [d, d] candidate amplitude table by batched recompute of the
contraction, then applies Metropolis-exchange or Suwa-Todo. Full recompute
per bond is O(n^2 d^2) contractions per sweep — embarrassingly batched, no
cache invalidation logic.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from peps_tpu.contraction.pbc import contract_pbc
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.suwa_todo import suwa_todo_pick
from peps_tpu.montecarlo.sweep import SweepStats, UpdateRule
from peps_tpu.tps import project


def _all_nn_bonds(ly, lx):
    h = [[y, x, y, (x + 1) % lx] for y in range(ly) for x in range(lx)]
    v = [[y, x, (y + 1) % ly, x] for y in range(ly) for x in range(lx)]
    return np.array(h + v, dtype=np.int32)


def mc_sweep_pbc(tps, config, key, chi: int, trunc: TruncParams,
                 rule: UpdateRule):
    """One full sweep over all PBC NN bonds. Returns (config', key', stats)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    bonds = jnp.asarray(_all_nn_bonds(ly, lx))
    cmask = rule.mask_array(d)

    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)

    def bond_table(config, bond):
        tn = project(tps, config)

        def one(s):
            t = tn.at[bond[0], bond[1]].set(tps[bond[0], bond[1], s[0]])
            t = t.at[bond[2], bond[3]].set(tps[bond[2], bond[3], s[1]])
            mant, logw = contract_pbc(t, chi, trunc)
            return mant, logw

        mants, logws = jax.vmap(one)(pq)
        lmax = jnp.max(logws)
        return (mants * jnp.exp(logws - lmax)).reshape(d, d)

    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    def log_abs(config):
        mant, logw = contract_pbc(project(tps, config), chi, trunc)
        return jnp.log(jnp.maximum(jnp.abs(mant),
                                   jnp.finfo(rdt).tiny)) + logw

    if rule.mode == "exchange":
        # fast path: carry log|psi| of the CURRENT config; each exchange
        # proposal needs ONE contraction (the swapped config), not a d x d
        # table — a d^2-fold cut of the O(2N d^2) per-sweep recompute cost
        # flagged by the reference trial/commit comparison
        def bond_step(carry, bond):
            config, la0, key, acc, tri = carry
            key, k_pick = jax.random.split(key)
            c1 = config[bond[0], bond[1]]
            c2 = config[bond[2], bond[3]]
            cand = config.at[bond[0], bond[1]].set(c2) \
                         .at[bond[2], bond[3]].set(c1)
            la1 = log_abs(cand)
            ratio2 = jnp.exp(2.0 * (la1 - la0))
            u = jax.random.uniform(k_pick, (), rdt)
            differ = c1 != c2
            accept = differ & (u < ratio2)
            config = jnp.where(accept, cand, config)
            la0 = jnp.where(accept, la1, la0)
            acc = acc + accept.astype(jnp.int32)
            tri = tri + differ.astype(jnp.int32)
            return (config, la0, key, acc, tri), None

        init = (config, log_abs(config), key,
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (config, _, key, acc, tri), _ = jax.lax.scan(bond_step, init, bonds)
        return config, key, SweepStats(acc, tri)

    def bond_step(carry, bond):
        config, key, acc, tri = carry
        key, k_pick = jax.random.split(key)
        table = bond_table(config, bond)
        c1 = config[bond[0], bond[1]]
        c2 = config[bond[2], bond[3]]
        cur_idx = (c1 * d + c2).astype(jnp.int32)
        w = jnp.abs(table.reshape(-1)) ** 2
        if cmask is not None:
            w = w * cmask[cur_idx].astype(w.dtype)
        new_idx = suwa_todo_pick(w, cur_idx, k_pick)
        new1 = (new_idx // d).astype(config.dtype)
        new2 = (new_idx % d).astype(config.dtype)
        acc = acc + (new_idx != cur_idx).astype(jnp.int32)
        tri = tri + 1
        config = config.at[bond[0], bond[1]].set(new1)
        config = config.at[bond[2], bond[3]].set(new2)
        return (config, key, acc, tri), None

    init = (config, key, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    (config, key, acc, tri), _ = jax.lax.scan(bond_step, init, bonds)
    return config, key, SweepStats(acc, tri)


# ---------------------------------------------------------------------------
# Host-driven PBC sweep (the TPU path).
#
# The XLA TPU backend cannot compile a lax.scan whose body contains the
# whole TRG contraction (compiler RET_CHECK crash at 8x8; >45 min compile
# at 4x4 — docs/tpu_engineering.md "TPU TRG compile pathology"). The fix is
# structural: compile ONE per-bond step (bond passed as a traced array, so
# a single executable serves every bond) and drive the 2N-bond Metropolis
# sequence from the host. Sequential semantics, per-chain key streams and
# accept decisions are IDENTICAL to mc_sweep_pbc — tested bit-for-bit.
# ---------------------------------------------------------------------------

from functools import partial as _partial



def _pbc_map_batch(ly: int, lx: int) -> int:
    """lax.map batch size for per-config TRG contractions. Large tori must
    map with batch 1: late-stage RG temps scale with the lattice (8x8
    chi=32: ~2 GB padded per in-flight config), and the XLA:TPU compile of
    a batched TRG graph degenerates (batch 1 compiles in ~50 s at 8x8,
    batch 2 did not finish in 19 min — docs/tpu_engineering.md "TPU TRG
    compile pathology")."""
    n = ly * lx
    return 1 if n > 36 else (2 if n > 16 else 4)

@_partial(jax.jit, static_argnames=("chi", "trunc"))
def _pbc_log_abs_batch(tps, configs, chi, trunc):
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    def one(c):
        mant, logw = contract_pbc(project(tps, c), chi, trunc)
        return jnp.log(jnp.maximum(jnp.abs(mant),
                                   jnp.finfo(rdt).tiny)) + logw

    return jax.lax.map(one, configs,
                       batch_size=_pbc_map_batch(tps.shape[0], tps.shape[1]))


def _exchange_decision(tps, config, la0, key, bond, chi, trunc, rdt):
    """One exchange-Metropolis decision for one chain. Returns
    (config', la0', key', accept, differ); key' is the carried key after
    the per-decision split (one split per bond, matching mc_sweep_pbc)."""
    key, k_pick = jax.random.split(key)
    c1 = config[bond[0], bond[1]]
    c2 = config[bond[2], bond[3]]
    cand = config.at[bond[0], bond[1]].set(c2) \
                 .at[bond[2], bond[3]].set(c1)
    mant, logw = contract_pbc(project(tps, cand), chi, trunc)
    la1 = jnp.log(jnp.maximum(jnp.abs(mant),
                              jnp.finfo(rdt).tiny)) + logw
    ratio2 = jnp.exp(2.0 * (la1 - la0))
    u = jax.random.uniform(k_pick, (), rdt)
    differ = c1 != c2
    accept = differ & (u < ratio2)
    return (jnp.where(accept, cand, config),
            jnp.where(accept, la1, la0), key,
            accept.astype(jnp.int32), differ.astype(jnp.int32))


@_partial(jax.jit, static_argnames=("chi", "trunc"))
def _pbc_exchange_bond_step(tps, configs, la0s, keys, bond, chi, trunc):
    """One exchange-Metropolis decision at `bond` for all chains."""
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    def one(config, la0, key):
        return _exchange_decision(tps, config, la0, key, bond, chi, trunc,
                                  rdt)

    outs = jax.lax.map(lambda args: one(*args), (configs, la0s, keys),
                       batch_size=_pbc_map_batch(tps.shape[0], tps.shape[1]))
    return outs


@_partial(jax.jit, static_argnames=("chi", "trunc", "k"))
def _pbc_exchange_bond_chunk(tps, configs, la0s, keys, bonds, chi, trunc,
                             k):
    """k sequential exchange decisions (bonds[0..k-1]) in ONE executable.

    Cuts the host-driven sweep's dispatch count k-fold (NOTES limitation:
    PBC on TPU is dispatch-bound). The TRG body is UNROLLED k times, so k
    must stay small enough for the XLA:TPU compile pathology
    (docs/tpu_engineering.md) not to bite — callers opt in via
    MCParams/MeasurementParams.fuse_bonds and should validate compile time
    at their lattice size. Bit-identical to k calls of
    _pbc_exchange_bond_step (same per-chain key stream)."""
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype

    def one(config, la0, key):
        acc = jnp.zeros((), jnp.int32)
        tri = jnp.zeros((), jnp.int32)
        for i in range(k):      # static unroll
            config, la0, key, a, t = _exchange_decision(
                tps, config, la0, key, bonds[i], chi, trunc, rdt)
            acc = acc + a
            tri = tri + t
        return config, la0, key, acc, tri

    return jax.lax.map(lambda args: one(*args), (configs, la0s, keys),
                       batch_size=_pbc_map_batch(tps.shape[0], tps.shape[1]))


def _table_decision(tps, config, key, bond, chi, trunc, d, cmask, pq):
    """One full-space (Suwa-Todo) decision for one chain at `bond`."""
    key, k_pick = jax.random.split(key)
    tn = project(tps, config)

    def amp(s):
        t = tn.at[bond[0], bond[1]].set(tps[bond[0], bond[1], s[0]])
        t = t.at[bond[2], bond[3]].set(tps[bond[2], bond[3], s[1]])
        return contract_pbc(t, chi, trunc)

    mants, logws = jax.vmap(amp)(pq)
    lmax = jnp.max(logws)
    table = (mants * jnp.exp(logws - lmax)).reshape(d, d)
    c1 = config[bond[0], bond[1]]
    c2 = config[bond[2], bond[3]]
    cur_idx = (c1 * d + c2).astype(jnp.int32)
    w = jnp.abs(table.reshape(-1)) ** 2
    if cmask is not None:
        w = w * cmask[cur_idx].astype(w.dtype)
    new_idx = suwa_todo_pick(w, cur_idx, k_pick)
    new1 = (new_idx // d).astype(config.dtype)
    new2 = (new_idx % d).astype(config.dtype)
    config = config.at[bond[0], bond[1]].set(new1)
    config = config.at[bond[2], bond[3]].set(new2)
    return (config, key, (new_idx != cur_idx).astype(jnp.int32),
            jnp.ones((), jnp.int32))


@_partial(jax.jit, static_argnames=("chi", "trunc", "d", "rule"))
def _pbc_table_bond_step(tps, configs, keys, bond, chi, trunc, d, rule):
    """One full-space (Suwa-Todo) decision at `bond` for all chains."""
    cmask = rule.mask_array(d)
    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)

    def one(config, key):
        return _table_decision(tps, config, key, bond, chi, trunc, d,
                               cmask, pq)

    return jax.lax.map(lambda args: one(*args), (configs, keys),
                       batch_size=1)


@_partial(jax.jit, static_argnames=("chi", "trunc", "d", "rule", "k"))
def _pbc_table_bond_chunk(tps, configs, keys, bonds, chi, trunc, d, rule,
                          k):
    """k sequential Suwa-Todo decisions (bonds[0..k-1]) in ONE executable.

    Full-space analogue of _pbc_exchange_bond_chunk: cuts dispatches
    k-fold, unrolls the d^2-candidate TRG table k times (keep k small —
    the table step is d^2 heavier per bond than the exchange step).
    Bit-identical to k calls of _pbc_table_bond_step."""
    cmask = rule.mask_array(d)
    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)

    def one(config, key):
        acc = jnp.zeros((), jnp.int32)
        tri = jnp.zeros((), jnp.int32)
        for i in range(k):      # static unroll
            config, key, a, t = _table_decision(
                tps, config, key, bonds[i], chi, trunc, d, cmask, pq)
            acc = acc + a
            tri = tri + t
        return config, key, acc, tri

    return jax.lax.map(lambda args: one(*args), (configs, keys),
                       batch_size=1)


# ---------------------------------------------------------------------------
# Trial/commit PBC sweep (the production TPU path).
#
# Reference: TRGContractor::BeginTrialWithReplacement / CommitTrial
# (trg_contractor.h:350-421) — per bond decision only the influence cone is
# re-propagated, not the whole torus. Here the proposal replay goes through
# the FROZEN multi-scale projector cache (pbc_trial.py): the dirty window
# never dilates (~2 nodes/stage), the graph is matmul-only (so unlike the
# full TRG it compiles as a lax.scan over bonds and vmaps over chains), and
# the projector map is re-derived from the current configuration once per
# sweep. Amplitude-ratio semantics match the OBC BMPS sweep's environment
# reuse (ratios through one consistent truncated map). exact=True instead
# re-propagates with fresh projectors (reference trial semantics, equal to
# full recompute to round-off) — slower, used for parity tests and small
# lattices.
# ---------------------------------------------------------------------------

from peps_tpu.contraction.pbc_trial import (begin_trial, build_cache,
                                            commit_trial, replace_sites,
                                            trial_log_abs)


def _oriented_bonds(ly, lx):
    """(anchor-site lists) for horizontal then vertical NN bonds, matching
    _all_nn_bonds order."""
    h = np.array([[y, x] for y in range(ly) for x in range(lx)],
                 dtype=np.int32)
    return h, h.copy()    # anchors are all sites for both orientations


def _build_caches(tps, configs, chi, trunc):
    """Per-chain trial caches, chains mapped at batch 1 (the projector
    build contains the SVD-bearing TRG graph — see the compile pathology
    note above mc_sweep_pbc_host)."""
    return jax.lax.map(
        lambda c: build_cache(project(tps, c), chi, trunc), configs,
        batch_size=_pbc_map_batch(tps.shape[0], tps.shape[1]))


def _trial_group_auto(chi: int, trunc: TruncParams, nc: int,
                      n_replays: int, itemsize: int) -> int:
    """Chains vmapped together per trial-sweep executable.

    The frozen absorb materializes one rank-5 ~chi^5 temp per window node
    (pairwise contraction of pb*a*b*pt cannot do better); at chi < 128 the
    32-wide minor axes tile-pad 4x, so 32 chains x 2 nodes at 8x8 chi=32
    is ~17 GB of HLO temp — an OOM on a 16 GB chip. Chains are therefore
    swept in groups via lax.map: same math, same total work, bounded peak."""
    pad = 1 if chi % 128 == 0 else 4
    per_chain = 2 * (chi ** 5) * itemsize * pad * max(1, n_replays)
    # conservative budget: the per-chain multi-scale caches (~chi^4 * nodes
    # per chain, ~4.3 GB at 8x8 chi=32 x32 chains, resident as the donated
    # argument), XLA temp double-buffering and the allocator's ~31%
    # fragmentation at these window shapes (measured: group=3 at 8x8 chi=32
    # compiled to an 11.8 GB temp requirement and OOMed the 16 GB chip;
    # group=1 fits) all share HBM with these temps
    budget = 6e8
    return max(1, min(nc, int(budget // max(per_chain, 1))))


@_partial(jax.jit, static_argnames=("chi", "trunc", "horizontal", "exact",
                                    "group"))
def _trial_sweep_exchange(tps, caches, configs, keys, anchors, chi, trunc,
                          horizontal, exact, group):
    """Exchange-Metropolis decisions over one bond orientation: ONE
    executable (lax.map over chain groups of a lax.scan over bonds, vmap
    over the chains inside each group)."""
    ly, lx = tps.shape[0], tps.shape[1]
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype
    (wr, wc), (dy, dx) = ((1, 2), (0, 1)) if horizontal else ((2, 1), (1, 0))

    def one(cache, config, key, anchor):
        key, k_pick = jax.random.split(key)
        y, x = anchor[0], anchor[1]
        y2, x2 = (y + dy) % ly, (x + dx) % lx
        c1, c2 = config[y, x], config[y2, x2]
        blk = replace_sites(tps, config, [(0, 0), (dy, dx)],
                            [c2, c1], y, x, wr, wc)
        trial = begin_trial(cache, blk, y, x, chi=chi, trunc=trunc,
                            exact=exact)
        la0 = cache.log_abs
        la1 = trial_log_abs(cache, trial)
        ratio2 = jnp.exp(2.0 * (la1 - la0))
        u = jax.random.uniform(k_pick, (), rdt)
        differ = c1 != c2
        accept = differ & (u < ratio2)
        config = jnp.where(
            accept, config.at[y, x].set(c2).at[y2, x2].set(c1), config)
        cache = commit_trial(cache, trial, accept=accept)
        return (cache, config, key, accept.astype(jnp.int32),
                differ.astype(jnp.int32))

    def sweep_chain(args):
        cache, config, key = args

        def body(carry, anchor):
            cache, config, key, acc, tri = carry
            cache, config, key, a, t = one(cache, config, key, anchor)
            return (cache, config, key, acc + a, tri + t), None

        init = (cache, config, key, jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))
        (cache, config, key, acc, tri), _ = jax.lax.scan(body, init,
                                                         anchors)
        return cache, config, key, acc, tri

    # lax.map = scan of vmaps: chains are vectorized `group` at a time, so
    # the chi^5 absorb temps stay bounded (see _trial_group_auto)
    return jax.lax.map(sweep_chain, (caches, configs, keys),
                       batch_size=min(group, configs.shape[0]))


@_partial(jax.jit, static_argnames=("chi", "trunc", "d", "rule",
                                    "horizontal", "exact", "group"))
def _trial_sweep_table(tps, caches, configs, keys, anchors, chi, trunc, d,
                       rule, horizontal, exact, group):
    """Full-space (Suwa-Todo) decisions over one bond orientation via d^2
    vmapped trial replays per bond."""
    ly, lx = tps.shape[0], tps.shape[1]
    (wr, wc), (dy, dx) = ((1, 2), (0, 1)) if horizontal else ((2, 1), (1, 0))
    cmask = rule.mask_array(d)
    pp, qq = jnp.meshgrid(jnp.arange(d), jnp.arange(d), indexing="ij")
    pq = jnp.stack([pp.reshape(-1), qq.reshape(-1)], axis=1)

    def one(cache, config, key, anchor):
        key, k_pick = jax.random.split(key)
        y, x = anchor[0], anchor[1]
        y2, x2 = (y + dy) % ly, (x + dx) % lx

        def cand(s):
            blk = replace_sites(tps, config, [(0, 0), (dy, dx)],
                                [s[0], s[1]], y, x, wr, wc)
            return begin_trial(cache, blk, y, x, chi=chi, trunc=trunc,
                               exact=exact)

        trials = jax.vmap(cand)(pq)
        las = jax.vmap(lambda t: trial_log_abs(cache, t))(trials)
        w = jnp.exp(2.0 * (las - jnp.max(las)))
        c1, c2 = config[y, x], config[y2, x2]
        cur_idx = (c1 * d + c2).astype(jnp.int32)
        if cmask is not None:
            w = w * cmask[cur_idx].astype(w.dtype)
        new_idx = suwa_todo_pick(w, cur_idx, k_pick)
        chosen = jax.tree.map(lambda a: a[new_idx], trials)
        config = config.at[y, x].set((new_idx // d).astype(config.dtype))
        config = config.at[y2, x2].set((new_idx % d).astype(config.dtype))
        cache = commit_trial(cache, chosen)
        return (cache, config, key,
                (new_idx != cur_idx).astype(jnp.int32),
                jnp.ones((), jnp.int32))

    def sweep_chain(args):
        cache, config, key = args

        def body(carry, anchor):
            cache, config, key, acc, tri = carry
            cache, config, key, a, t = one(cache, config, key, anchor)
            return (cache, config, key, acc + a, tri + t), None

        init = (cache, config, key, jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32))
        (cache, config, key, acc, tri), _ = jax.lax.scan(body, init,
                                                         anchors)
        return cache, config, key, acc, tri

    return jax.lax.map(sweep_chain, (caches, configs, keys),
                       batch_size=min(group, configs.shape[0]))


@_partial(jax.jit, static_argnames=("chi", "trunc", "horizontal", "exact",
                                    "group"), donate_argnums=(1,))
def _trial_bond_step_exchange(tps, caches, configs, keys, anchor, chi,
                              trunc, horizontal, exact, group):
    """One bond decision for ALL chains (traced anchor -> ONE executable
    serves every bond position; the host drives the bond order). The
    caches argument is donated so the multi-GB multi-scale cache updates
    in place instead of double-buffering."""
    ly, lx = tps.shape[0], tps.shape[1]
    rdt = tps.real.dtype if jnp.iscomplexobj(tps) else tps.dtype
    (wr, wc), (dy, dx) = ((1, 2), (0, 1)) if horizontal else ((2, 1), (1, 0))

    def one(args):
        cache, config, key = args
        key, k_pick = jax.random.split(key)
        y, x = anchor[0], anchor[1]
        y2, x2 = (y + dy) % ly, (x + dx) % lx
        c1, c2 = config[y, x], config[y2, x2]
        blk = replace_sites(tps, config, [(0, 0), (dy, dx)],
                            [c2, c1], y, x, wr, wc)
        trial = begin_trial(cache, blk, y, x, chi=chi, trunc=trunc,
                            exact=exact)
        la0 = cache.log_abs
        la1 = trial_log_abs(cache, trial)
        ratio2 = jnp.exp(2.0 * (la1 - la0))
        u = jax.random.uniform(k_pick, (), rdt)
        differ = c1 != c2
        accept = differ & (u < ratio2)
        config = jnp.where(
            accept, config.at[y, x].set(c2).at[y2, x2].set(c1), config)
        cache = commit_trial(cache, trial, accept=accept)
        return (cache, config, key, accept.astype(jnp.int32),
                differ.astype(jnp.int32))

    return jax.lax.map(one, (caches, configs, keys),
                       batch_size=min(group, configs.shape[0]))


def _trial_sweep_host(tps, caches, configs, keys, chi, trunc, rule, exact,
                      group):
    """Host-driven trial/commit sweep: the scanned-over-bonds executable
    (_trial_sweep_exchange) is mathematically identical but its giant
    scan-of-map graph can hit the XLA:TPU TRG compile pathology (hours);
    this drives the same per-bond `one` step from the host — 2*Ly*Lx
    dispatches per sweep instead of thousands (full-recompute host path),
    and a per-bond executable that compiles in seconds. Bit-identical
    trajectories to mc_sweep_pbc_trial's scanned path (same key stream,
    same bond order)."""
    ly, lx = tps.shape[0], tps.shape[1]
    nc = configs.shape[0]
    acc = jnp.zeros((nc,), jnp.int32)
    tri = jnp.zeros((nc,), jnp.int32)
    if rule.mode != "exchange":
        raise NotImplementedError(
            "host-driven trial sweep: exchange rule only (use the scanned "
            "path for full-space rules)")
    h_anchors, v_anchors = _oriented_bonds(ly, lx)
    for horizontal, anchors in ((True, h_anchors), (False, v_anchors)):
        for a in anchors:
            caches, configs, keys, a1, t1 = _trial_bond_step_exchange(
                tps, caches, configs, keys, jnp.asarray(a), chi, trunc,
                horizontal, exact, group)
            acc, tri = acc + a1, tri + t1
    return caches, configs, keys, acc, tri


def mc_sweep_pbc_trial(tps, configs, keys, chi: int, trunc: TruncParams,
                       rule: UpdateRule, caches=None, exact: bool = False,
                       return_caches: bool = False, group: int | None = None,
                       host_driven: bool | None = None):
    """One full PBC sweep for ALL chains through the trial/commit cache.

    configs: [C, Ly, Lx]; keys: [C]. Bond order matches mc_sweep_pbc /
    mc_sweep_pbc_host (all horizontal, then all vertical). `caches` (from a
    previous call with return_caches=True) skips the per-sweep projector
    refresh — pass them only if a stale frozen map over >1 sweep is
    acceptable. `group` bounds how many chains one executable sweeps at
    once (None = auto from a chi^5-temp memory model — see
    _trial_group_auto). Returns (configs', keys', acc [C], tri [C]) and,
    with return_caches=True, the committed caches as a 5th element.

    host_driven (None = auto: on for TPU backends with the exchange rule)
    drives the per-bond step from the host through ONE traced-anchor
    executable instead of the scanned-over-bonds graph, whose compile
    time on XLA:TPU is pathological at production sizes (the same
    pathology that forces mc_sweep_pbc_host)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    if caches is None:
        caches = _build_caches(tps, configs, chi, trunc)
    h_anchors, v_anchors = _oriented_bonds(ly, lx)
    nc = configs.shape[0]
    itemsize = 2 if trunc.scheme in ("fast", "sketch") else \
        jnp.zeros((), tps.dtype).real.dtype.itemsize
    if host_driven is None:
        host_driven = (jax.default_backend() == "tpu"
                       and rule.mode == "exchange")
    if host_driven and rule.mode == "exchange":
        g = group or _trial_group_auto(chi, trunc, nc, 1, itemsize)
        caches, configs, keys, acc, tri = _trial_sweep_host(
            tps, caches, configs, keys, chi, trunc, rule, exact, g)
        out = (configs, keys, acc, tri)
        return out + (caches,) if return_caches else out
    if rule.mode == "exchange":
        g = group or _trial_group_auto(chi, trunc, nc, 1, itemsize)
        caches, configs, keys, a1, t1 = _trial_sweep_exchange(
            tps, caches, configs, keys, jnp.asarray(h_anchors), chi, trunc,
            True, exact, g)
        caches, configs, keys, a2, t2 = _trial_sweep_exchange(
            tps, caches, configs, keys, jnp.asarray(v_anchors), chi, trunc,
            False, exact, g)
    else:
        g = group or _trial_group_auto(chi, trunc, nc, d * d, itemsize)
        caches, configs, keys, a1, t1 = _trial_sweep_table(
            tps, caches, configs, keys, jnp.asarray(h_anchors), chi, trunc,
            d, rule, True, exact, g)
        caches, configs, keys, a2, t2 = _trial_sweep_table(
            tps, caches, configs, keys, jnp.asarray(v_anchors), chi, trunc,
            d, rule, False, exact, g)
    out = (configs, keys, a1 + a2, t1 + t2)
    return out + (caches,) if return_caches else out


def mc_sweep_pbc_host(tps, configs, keys, chi: int, trunc: TruncParams,
                      rule: UpdateRule, la0s=None, fuse_bonds: int = 1):
    """One full PBC sweep for ALL chains, host loop over bonds.

    configs: [C, Ly, Lx]; keys: [C] per-chain PRNG keys. Returns
    (configs', keys', la0s' or None, acc [C], tri [C]). Matches
    mc_sweep_pbc's per-chain trajectories exactly when each chain's key
    equals the scanned version's input key. fuse_bonds > 1 dispatches that
    many sequential bond decisions per executable (exchange and full-space
    rules; same trajectories, k-fold fewer dispatches)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    bonds = _all_nn_bonds(ly, lx)
    nc = configs.shape[0]
    acc = jnp.zeros((nc,), jnp.int32)
    tri = jnp.zeros((nc,), jnp.int32)
    if rule.mode == "exchange":
        if la0s is None:
            la0s = _pbc_log_abs_batch(tps, configs, chi, trunc)
        k = max(1, int(fuse_bonds))
        if k > 1:
            for i0 in range(0, len(bonds), k):
                chunk = bonds[i0:i0 + k]
                configs, la0s, keys, a, t = _pbc_exchange_bond_chunk(
                    tps, configs, la0s, keys, jnp.asarray(chunk), chi,
                    trunc, len(chunk))
                acc = acc + a
                tri = tri + t
            return configs, keys, la0s, acc, tri
        for b in bonds:
            configs, la0s, keys, a, t = _pbc_exchange_bond_step(
                tps, configs, la0s, keys, jnp.asarray(b), chi, trunc)
            acc = acc + a
            tri = tri + t
        return configs, keys, la0s, acc, tri
    k = max(1, int(fuse_bonds))
    if k > 1:
        for i0 in range(0, len(bonds), k):
            chunk = bonds[i0:i0 + k]
            configs, keys, a, t = _pbc_table_bond_chunk(
                tps, configs, keys, jnp.asarray(chunk), chi, trunc, d,
                rule, len(chunk))
            acc = acc + a
            tri = tri + t
        return configs, keys, None, acc, tri
    for b in bonds:
        configs, keys, a, t = _pbc_table_bond_step(
            tps, configs, keys, jnp.asarray(b), chi, trunc, d, rule)
        acc = acc + a
        tri = tri + t
    return configs, keys, None, acc, tri
