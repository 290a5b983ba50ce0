"""VMC on graded fermionic TPS: amplitudes, local energy, holes, MC sweep.

The state is a graded TPS (dense [Ly, Lx, d, D..] + FermionSpace); its
amplitude is the plain bosonic BMPS contraction of the DRESSED projection
(peps_tpu/fermion/convert.py), in the snake-order JW basis. Consequences:

* String signs of the NN channels are SNAKE strings: horizontal bonds are
  JW-adjacent (no string); vertical bonds carry the product of local Z's
  over the row-suffix (even rows) / row-prefix (odd rows) of BOTH rows.
* NN ratio tables come from SHARED boundary environments by default
  (peps_tpu/fermion/tables.py — the graded Replace*Trace analogue,
  exploiting that snake prefix-parity flips stay inside the bond's own
  row pair); a batched full-recompute path remains as the validation
  oracle (env_sharing=False).
* Gradient holes come from jax.grad of log psi — the contraction is
  multilinear in the dense tensor entries with constant sign masks, so raw
  autodiff IS the reference's PunchHole + CalGTenForFermionicTensors +
  ActFermionPOps pipeline (mc_energy_grad_evaluator.h:262-268) in one line.

Reference: fermionic model solvers `square_spinless_fermion.h`,
`square_tJ_model.h`, `square_hubbard_model.h`; sign path-consistency
contract `fermion-sign-in-bmps-contraction.md` (ratios here are trivially
path-consistent: every amplitude uses the same canonical contraction).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.energy import EnergyHoles, rdtype
from peps_tpu.algorithm.energy_fermion import FermionTensors
from peps_tpu.contraction import bmps
from peps_tpu.fermion.convert import fermion_project
from peps_tpu.fermion.peps import FermionSpace
from peps_tpu.linalg import TruncParams


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GradedFermionModel:
    """Fermionic model bound to a graded TPS space. `ft` carries the NN
    channel tables (shared with the JW path); `space` is static."""
    ft: FermionTensors
    space: FermionSpace

    def tree_flatten(self):
        children, aux = self.ft.tree_flatten()
        return children, (aux, self.space)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(FermionTensors.tree_unflatten(aux[0], children), aux[1])

    @classmethod
    def from_model(cls, model, space: FermionSpace, dtype):
        return cls(FermionTensors.from_model(model, dtype), space)


def amplitude_fermion(tps, config, space: FermionSpace, chi: int,
                      trunc: TruncParams):
    """(mantissa, log_weight): psi = mant * exp(log_weight)."""
    net = fermion_project(tps, config, space)
    return bmps.amplitude(net, chi, trunc)


def log_abs_psi_fermion(tps, config, space, chi, trunc):
    mant, logw = amplitude_fermion(tps, config, space, chi, trunc)
    return jnp.log(jnp.maximum(jnp.abs(mant),
                               jnp.finfo(rdtype(tps)).tiny)) + logw, mant


def snake_string_signs(config, ft: FermionTensors, rdt):
    """Snake-order JW string signs per bond/channel. Horizontal NN bonds are
    JW-adjacent (no string). Vertical bonds (y,x)-(y+1,x): the modes between
    them along the snake are the sites to the RIGHT in both rows (even y)
    or to the LEFT in both rows (odd y)."""
    zu = 1.0 - 2.0 * ft.n_up[config].astype(rdt)
    zd = 1.0 - 2.0 * ft.n_dn[config].astype(rdt)
    zt = zu if ft.spinless else zu * zd
    ly, lx = config.shape
    rev_cum = jnp.cumprod(zt[:, ::-1], axis=1)[:, ::-1]
    suffix = jnp.concatenate([rev_cum[:, 1:], jnp.ones((ly, 1), rdt)],
                             axis=1)          # prod_{x' > x}
    cum = jnp.cumprod(zt, axis=1)
    prefix = jnp.concatenate([jnp.ones((ly, 1), rdt), cum[:, :-1]],
                             axis=1)          # prod_{x' < x}
    even_row = (jnp.arange(ly - 1) % 2 == 0)[:, None]
    between_v = jnp.where(even_row, suffix[:-1] * suffix[1:],
                          prefix[:-1] * prefix[1:])
    # diagonal bond i=(y,x), j=(y+1,x+1): snake sites strictly between are
    # (even y) row-y cols > x + row-(y+1) cols > x+1; (odd y) the prefixes
    between_d = jnp.where(even_row, suffix[:-1, :-1] * suffix[1:, 1:],
                          prefix[:-1, :-1] * prefix[1:, 1:])
    # anti-diagonal: JW-earlier i=(y,x+1), later j=(y+1,x)
    between_ad = jnp.where(even_row, suffix[:-1, 1:] * suffix[1:, :-1],
                           prefix[:-1, 1:] * prefix[1:, :-1])
    out = {}
    ones_h = jnp.ones((ly, lx - 1), rdt)
    ones_diag = jnp.ones((ly - 1, lx - 1), rdt)
    if ft.spinless:
        out[("h", "up")] = ones_h
        out[("v", "up")] = between_v
        out[("d", "up")] = between_d
        out[("ad", "up")] = between_ad
    else:
        # species-internal adjacency within a site: up before down.
        # horizontal neighbors: between c_up(i) and c_up(j) sits dn of the
        # JW-EARLIER site; between dn(i) and dn(j) sits up of the LATER
        # site (matrix elements are built in the ordered two-site basis,
        # gates.bond_h2, so only these intra-pair Z factors appear). The
        # JW-earlier site follows the snake: lattice-LEFT on even rows,
        # lattice-RIGHT on odd rows (odd rows traverse R->L).
        even_h = (jnp.arange(ly) % 2 == 0)[:, None]
        out[("h", "up")] = jnp.where(even_h, zd[:, :-1], zd[:, 1:])
        out[("h", "dn")] = jnp.where(even_h, zu[:, 1:], zu[:, :-1])
        out[("v", "up")] = zd[:-1] * between_v
        out[("v", "dn")] = between_v * zu[1:]
        # endpoint Z factors: up-hop carries zd at the JW-earlier site i,
        # dn-hop zu at the later site j (i is always the row-y site)
        out[("d", "up")] = zd[:-1, :-1] * between_d
        out[("d", "dn")] = between_d * zu[1:, 1:]
        out[("ad", "up")] = zd[:-1, 1:] * between_ad
        out[("ad", "dn")] = between_ad * zu[1:, :-1]
    out[("h", "none")] = ones_h
    out[("v", "none")] = jnp.ones((ly - 1, lx), rdt)
    out[("d", "none")] = ones_diag
    out[("ad", "none")] = ones_diag
    return out


def _replaced_ratio_tables(tps, config, space, chi, trunc, log0, mant0,
                           want_diag: bool = False):
    """Full d x d ratio tables for every NN bond by BATCHED full recomputes:
    ratio[y, x, a, b] = psi(S with bond sites -> (a, b)) / psi(S).
    want_diag adds the NNN diagonal/anti-diagonal tables (same index
    conventions as fermion/tables.py FermionTables)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]

    def phase(m):
        if jnp.iscomplexobj(m):
            return m / jnp.maximum(jnp.abs(m), jnp.finfo(rdtype(tps)).tiny)
        return jnp.sign(m)

    ph0 = phase(mant0)
    inv_ph0 = jnp.conj(ph0) if jnp.iscomplexobj(mant0) else ph0

    def ratio_of(cfg):
        la, mant = log_abs_psi_fermion(tps, cfg, space, chi, trunc)
        # clip: psi(S)=0 configs have log0 = log(tiny); their e_loc is
        # zero-weighted by the evaluators, so any finite value works
        return phase(mant) * inv_ph0 * jnp.exp(jnp.minimum(la - log0, 60.0))

    ab = jnp.stack(jnp.meshgrid(jnp.arange(d), jnp.arange(d),
                                indexing="ij"), -1).reshape(-1, 2) \
        .astype(config.dtype)   # scatter values must match the config dtype

    def h_bond(y, x, a, b):
        return config.at[y, x].set(a).at[y, x + 1].set(b)

    def v_bond(y, x, a, b):
        return config.at[y, x].set(a).at[y + 1, x].set(b)

    ys_h, xs_h = jnp.meshgrid(jnp.arange(ly), jnp.arange(lx - 1),
                              indexing="ij")
    cfg_h = jax.vmap(lambda y, x: jax.vmap(
        lambda p: h_bond(y, x, p[0], p[1]))(ab))(
        ys_h.reshape(-1), xs_h.reshape(-1))       # [Nh, d*d, Ly, Lx]
    ys_v, xs_v = jnp.meshgrid(jnp.arange(ly - 1), jnp.arange(lx),
                              indexing="ij")
    cfg_v = jax.vmap(lambda y, x: jax.vmap(
        lambda p: v_bond(y, x, p[0], p[1]))(ab))(
        ys_v.reshape(-1), xs_v.reshape(-1))
    parts = [cfg_h.reshape(-1, ly, lx), cfg_v.reshape(-1, ly, lx)]
    if want_diag:
        def d_bond(y, x, a, b):     # a at (y,x), b at (y+1,x+1)
            return config.at[y, x].set(a).at[y + 1, x + 1].set(b)

        def ad_bond(y, x, a, b):    # a at (y+1,x), b at (y,x+1)
            return config.at[y + 1, x].set(a).at[y, x + 1].set(b)

        ys_d, xs_d = jnp.meshgrid(jnp.arange(ly - 1), jnp.arange(lx - 1),
                                  indexing="ij")
        for bond in (d_bond, ad_bond):
            cfg_d = jax.vmap(lambda y, x: jax.vmap(
                lambda p: bond(y, x, p[0], p[1]))(ab))(
                ys_d.reshape(-1), xs_d.reshape(-1))
            parts.append(cfg_d.reshape(-1, ly, lx))
    all_cfg = jnp.concatenate(parts, 0)
    ratios = jax.vmap(ratio_of)(all_cfg)
    nh = ly * (lx - 1) * d * d
    nv = (ly - 1) * lx * d * d
    ratio_h = ratios[:nh].reshape(ly, lx - 1, d, d)
    ratio_v = ratios[nh:nh + nv].reshape(ly - 1, lx, d, d)
    if not want_diag:
        return ratio_h, ratio_v
    nd = (ly - 1) * (lx - 1) * d * d
    ratio_d = ratios[nh + nv:nh + nv + nd].reshape(ly - 1, lx - 1, d, d)
    ratio_ad = ratios[nh + nv + nd:].reshape(ly - 1, lx - 1, d, d)
    return ratio_h, ratio_v, ratio_d, ratio_ad


def local_energy_and_holes_graded(tps, config, model: GradedFermionModel,
                                  chi: int, trunc: TruncParams,
                                  with_holes: bool = True,
                                  env_sharing: bool = True,
                                  dress=None) -> EnergyHoles:
    """E_loc(S) + O tensor for a graded fermionic TPS. Same interface as
    the bosonic/JW local evaluators, so every evaluator/executor upstream
    works unchanged.

    env_sharing=True (default) builds the NN ratio tables from shared
    boundary environments (peps_tpu/fermion/tables.py) — same O(N) cost
    structure as the bosonic evaluator; False falls back to batched full
    recomputes (the original validation path).

    dress: optional JastrowDress — amplitude ratios pick up the density
    Jastrow factor exp(J(s') - J(s)) and log|psi| gains J(s) (reference:
    the Jastrow-dressed t-J solvers,
    square_nnn_energy_solver_jastrow_dressed.h; the O tensor w.r.t. the
    TPS parameters is unchanged by the dress)."""
    ft, space = model.ft, model.space
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    rdt = rdtype(tps)
    want_diag = ft.has_diag and lx > 1 and ly > 1
    ratio_d = ratio_ad = None
    if env_sharing:
        from peps_tpu.fermion.tables import fermion_ratio_tables
        tabs = fermion_ratio_tables(tps, config, space, chi, trunc,
                                    want_diag=want_diag)
        ratio_h, ratio_v = tabs.ratio_h, tabs.ratio_v
        ratio_d, ratio_ad = tabs.ratio_d, tabs.ratio_ad
        log0, mant0 = tabs.log_abs_psi, tabs.psi_mant
    else:
        log0, mant0 = log_abs_psi_fermion(tps, config, space, chi, trunc)
        tabs = _replaced_ratio_tables(tps, config, space, chi,
                                      trunc, log0, mant0,
                                      want_diag=want_diag)
        ratio_h, ratio_v = tabs[0], tabs[1]
        if want_diag:
            ratio_d, ratio_ad = tabs[2], tabs[3]
    if dress is not None:
        from peps_tpu.montecarlo.jastrow import two_site_log_ratios
        flat = jnp.arange(ly * lx).reshape(ly, lx)

        def dress_pair(table, idx1, idx2):
            if table is None:
                return None
            lr = two_site_log_ratios(dress, config, idx1.reshape(-1),
                                     idx2.reshape(-1))
            return table * jnp.exp(lr).reshape(table.shape).astype(
                table.dtype)

        ratio_h = dress_pair(ratio_h, flat[:, :lx - 1], flat[:, 1:])
        ratio_v = dress_pair(ratio_v, flat[:ly - 1], flat[1:])
        if want_diag:
            ratio_d = dress_pair(ratio_d, flat[:ly - 1, :lx - 1],
                                 flat[1:, 1:])
            ratio_ad = dress_pair(ratio_ad, flat[1:, :lx - 1],
                                  flat[:ly - 1, 1:])
        log0 = log0 + dress.log_factor(config)
    # the diagonal of each table is psi(S)/psi(S) = 1 numerically by
    # construction (same canonical path) — sign consistency for free
    signs = snake_string_signs(config, ft, rdt)
    e = jnp.zeros((), rdt)
    c1h, c2h = config[:, :lx - 1], config[:, 1:]
    for key, h in (("none", ft.h_h_none), ("up", ft.h_h_up),
                   ("dn", ft.h_h_dn)):
        if h is None:
            continue
        contrib = jnp.sum(h[c1h, c2h] * ratio_h, axis=(-1, -2))
        e = e + jnp.sum(signs[("h", key)] * contrib)
    c1v, c2v = config[:ly - 1], config[1:]
    for key, h in (("none", ft.h_v_none), ("up", ft.h_v_up),
                   ("dn", ft.h_v_dn)):
        if h is None:
            continue
        contrib = jnp.sum(h[c1v, c2v] * ratio_v, axis=(-1, -2))
        e = e + jnp.sum(signs[("v", key)] * contrib)
    if want_diag:
        c1d, c2d = config[:ly - 1, :lx - 1], config[1:, 1:]
        for key, h in (("none", ft.h_d_none), ("up", ft.h_d_up),
                       ("dn", ft.h_d_dn)):
            if h is None:
                continue
            contrib = jnp.sum(h[c1d, c2d] * ratio_d, axis=(-1, -2))
            e = e + jnp.sum(signs[("d", key)] * contrib)
        c1a, c2a = config[1:, :lx - 1], config[:ly - 1, 1:]
        for key, h in (("none", ft.h_ad_none), ("up", ft.h_ad_up),
                       ("dn", ft.h_ad_dn)):
            if h is None:
                continue
            contrib = jnp.sum(h[c1a, c2a] * ratio_ad, axis=(-1, -2))
            e = e + jnp.sum(signs[("ad", key)] * contrib)
    if ft.h_site is not None:
        e = e + jnp.sum(ft.h_site[config, config])

    o_tensor = None
    if with_holes:
        def logpsi(t):
            la, _ = log_abs_psi_fermion(t, config, space, chi, trunc)
            return la
        o_tensor = jax.grad(logpsi)(tps)
        if not jnp.iscomplexobj(tps):
            # bosonic convention stores O = dlnpsi/dA (not 2x); the
            # evaluators multiply the factor 2 for real dtypes themselves
            pass
    return EnergyHoles(e, o_tensor, log0, mant0)


def mc_sweep_fermion(tps, space: FermionSpace, config, key, chi,
                     trunc: TruncParams):
    """One Metropolis sweep over all NN bonds (exchange moves) with full
    amplitude recomputes (sign-consistent by construction). Returns
    (config', log_abs_psi', stats) like the bosonic mc_sweep.

    No conserve_mask parameter: exchange moves conserve every occupation
    number by construction (the bosonic sweep's mask restricts full-space
    Suwa-Todo proposals, which this sweep never makes)."""
    from peps_tpu.montecarlo.sweep import SweepStats

    ly, lx = config.shape
    log0, _ = log_abs_psi_fermion(tps, config, space, chi, trunc)

    bonds = ([(y, x, 0) for y in range(ly) for x in range(lx - 1)]
             + [(y, x, 1) for y in range(ly - 1) for x in range(lx)])
    bonds = jnp.asarray(bonds)

    def step(carry, bond):
        config, log0, key, acc, tri = carry
        y, x, vert = bond[0], bond[1], bond[2]
        y2 = y + vert
        x2 = x + (1 - vert)
        s1 = config[y, x]
        s2 = config[y2, x2]
        cand = config.at[y, x].set(s2).at[y2, x2].set(s1)
        log1, _ = log_abs_psi_fermion(tps, cand, space, chi, trunc)
        key, k = jax.random.split(key)
        ratio2 = jnp.exp(2.0 * (log1 - log0))
        differs = s1 != s2
        accept = differs & (jax.random.uniform(k) < jnp.minimum(1.0, ratio2))
        config = jnp.where(accept, cand, config)
        log0 = jnp.where(accept, log1, log0)
        return ((config, log0, key, acc + accept.astype(jnp.int32),
                 tri + differs.astype(jnp.int32)), None)

    (config, log0, key, acc, tri), _ = jax.lax.scan(
        step, (config, log0, key, jnp.zeros((), jnp.int32),
               jnp.zeros((), jnp.int32)), bonds)
    return config, log0, SweepStats(acc, tri)


def amplitudes_fermion(tps, configs, space, chi, trunc):
    """Batched (mantissa, log_weight) over chains [C, Ly, Lx]."""
    return jax.vmap(lambda c: amplitude_fermion(tps, c, space, chi,
                                                trunc))(configs)


@partial(jax.jit, static_argnames=("space", "chi", "trunc"))
def ensure_validity_fermion(tps, configs, key, space, chi, trunc):
    """Graded analogue of engine.ensure_validity (donor rescue of
    zero-amplitude chains)."""
    mant, _ = amplitudes_fermion(tps, configs, space, chi, trunc)
    valid = mant != 0
    n_valid = jnp.sum(valid)
    order = jnp.argsort(~valid)
    donors = jax.random.randint(key, (configs.shape[0],), 0,
                                jnp.maximum(n_valid, 1))
    donor_idx = order[donors]
    rescued = jnp.where(valid[:, None, None], configs,
                        configs[donor_idx])
    return rescued, jnp.sum(~valid)


# env-shared production sweep (fermion/sweep.py); the full-recompute
# mc_sweep_fermion above remains as the validation fallback
from peps_tpu.fermion.sweep import mc_sweep_fermion_shared  # noqa: E402


@partial(jax.jit, static_argnames=("space", "chi", "trunc"))
def normalize_state_order1_fermion(tps, configs, space, chi, trunc):
    mant, logw = amplitudes_fermion(tps, configs, space, chi, trunc)
    log_abs = jnp.log(jnp.maximum(jnp.abs(mant), 1e-300)) + logw
    max_log = jnp.max(log_abs)
    n_sites = tps.shape[0] * tps.shape[1]
    return tps * jnp.exp(-max_log / n_sites)
