"""Local energy + holes for fermionic models (Jordan-Wigner channels).

Reference: fermionic branches of the evaluator/model stack
(`mc_energy_grad_evaluator.h:262-268` ActFermionPOps O* path,
`square_tJ_model.h`, `square_hubbard_model.h`, fermion sign path-consistency
`bmps_contractor.h:808-829`). In the JW representation (see
models/fermion.py) the gradient O-tensor is the plain bosonic one — no
fermionic R* correction is needed — and hopping strings reduce to
configuration-dependent signs multiplying the same amplitude-ratio tables.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from peps_tpu.algorithm.energy import EnergyHoles, compute_ratio_tables, rdtype
from peps_tpu.linalg import TruncParams


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FermionTensors:
    """Channel tables grouped by string type (channels with equal string specs
    are summed). Any array field may be None. `spinless` is static pytree
    aux data (it selects code paths at trace time).

    Diagonal (d) tables act on ((y,x), (y+1,x+1)); anti-diagonal (ad) tables
    on ((y+1,x), (y,x+1)) — reference NNN channels
    (square_spinless_fermion.h:181, square_tJ_model.h:168)."""
    n_up: jnp.ndarray
    n_dn: jnp.ndarray
    h_h_none: jnp.ndarray | None
    h_h_up: jnp.ndarray | None
    h_h_dn: jnp.ndarray | None
    h_v_none: jnp.ndarray | None
    h_v_up: jnp.ndarray | None
    h_v_dn: jnp.ndarray | None
    h_site: jnp.ndarray | None
    spinless: bool
    h_d_none: jnp.ndarray | None = None
    h_d_up: jnp.ndarray | None = None
    h_d_dn: jnp.ndarray | None = None
    h_ad_none: jnp.ndarray | None = None
    h_ad_up: jnp.ndarray | None = None
    h_ad_dn: jnp.ndarray | None = None

    def tree_flatten(self):
        children = (self.n_up, self.n_dn, self.h_h_none, self.h_h_up,
                    self.h_h_dn, self.h_v_none, self.h_v_up, self.h_v_dn,
                    self.h_site, self.h_d_none, self.h_d_up, self.h_d_dn,
                    self.h_ad_none, self.h_ad_up, self.h_ad_dn)
        return children, self.spinless

    @classmethod
    def tree_unflatten(cls, aux, children):
        (n_up, n_dn, hh0, hh1, hh2, hv0, hv1, hv2, hs,
         hd0, hd1, hd2, ha0, ha1, ha2) = children
        return cls(n_up, n_dn, hh0, hh1, hh2, hv0, hv1, hv2, hs, aux,
                   hd0, hd1, hd2, ha0, ha1, ha2)

    @property
    def has_diag(self):
        return any(t is not None for t in
                   (self.h_d_none, self.h_d_up, self.h_d_dn,
                    self.h_ad_none, self.h_ad_up, self.h_ad_dn))

    @classmethod
    def from_model(cls, model, dtype):
        def group(channels):
            out = {"none": None, "up": None, "dn": None}
            for ch in channels:
                cur = out[ch.string]
                out[ch.string] = ch.h if cur is None else cur + ch.h
            return {k: (None if v is None else jnp.asarray(v, dtype))
                    for k, v in out.items()}

        gh = group(model.channels_h)
        gv = group(model.channels_v)
        gd = group(getattr(model, "channels_d", ()))
        gad = group(getattr(model, "channels_ad", ()))
        # occupation tables are integers; keep them at the REAL dtype so the
        # JW string-sign kernels never cast complex -> real (imag is exactly
        # zero, but the cast is deprecated and hides genuine bugs)
        rdt = jnp.zeros((), dtype).real.dtype
        return cls(jnp.asarray(model.n_up, rdt),
                   jnp.asarray(model.n_dn, rdt),
                   gh["none"], gh["up"], gh["dn"],
                   gv["none"], gv["up"], gv["dn"],
                   None if model.h_site is None else jnp.asarray(model.h_site, dtype),
                   bool(model.spinless),
                   gd["none"], gd["up"], gd["dn"],
                   gad["none"], gad["up"], gad["dn"])


def _string_signs(config, ft: FermionTensors, rdt):
    """Per-bond string signs for each orientation/species.

    Returns dict with keys (orient, string) -> sign array
    ([Ly, Lx-1] for "h", [Ly-1, Lx] for "v")."""
    zu = 1.0 - 2.0 * ft.n_up[config].astype(rdt)     # [Ly, Lx]
    zd = 1.0 - 2.0 * ft.n_dn[config].astype(rdt)
    zt = zu if ft.spinless else zu * zd
    ly, lx = config.shape
    # suffix[y, x] = prod_{x' > x} zt[y, x'];  prefix[y, x] = prod_{x' < x}
    rev_cum = jnp.cumprod(zt[:, ::-1], axis=1)[:, ::-1]
    suffix = jnp.concatenate([rev_cum[:, 1:], jnp.ones((ly, 1), rdt)], axis=1)
    cum = jnp.cumprod(zt, axis=1)
    prefix = jnp.concatenate([jnp.ones((ly, 1), rdt), cum[:, :-1]], axis=1)

    out = {}
    ones_h = jnp.ones((ly, lx - 1), rdt)
    between_v = suffix[:-1] * prefix[1:]             # [Ly-1, Lx]
    # diagonal bond i=(y,x), j=(y+1,x+1): sites strictly between in
    # row-major order = row-y suffix beyond x + row-(y+1) prefix before x+1
    between_d = suffix[:-1, :-1] * prefix[1:, 1:]    # [Ly-1, Lx-1]
    # anti-diagonal bond: JW-earlier site i=(y,x+1), later j=(y+1,x)
    between_ad = suffix[:-1, 1:] * prefix[1:, :-1]   # [Ly-1, Lx-1]
    if ft.spinless:
        out[("h", "up")] = ones_h
        out[("v", "up")] = between_v
        out[("d", "up")] = between_d
        out[("ad", "up")] = between_ad
    else:
        out[("h", "up")] = zd[:, :-1]                # {i_dn}
        out[("h", "dn")] = zu[:, 1:]                 # {j_up}
        out[("v", "up")] = zd[:-1] * between_v
        out[("v", "dn")] = between_v * zu[1:]
        out[("d", "up")] = zd[:-1, :-1] * between_d
        out[("d", "dn")] = between_d * zu[1:, 1:]
        out[("ad", "up")] = zd[:-1, 1:] * between_ad
        out[("ad", "dn")] = between_ad * zu[1:, :-1]
    out[("h", "none")] = ones_h
    out[("v", "none")] = jnp.ones((ly - 1, lx), rdt)
    out[("d", "none")] = jnp.ones((ly - 1, lx - 1), rdt)
    out[("ad", "none")] = jnp.ones((ly - 1, lx - 1), rdt)
    return out


def local_energy_and_holes_fermion(tps: jnp.ndarray, config: jnp.ndarray,
                                   ft: FermionTensors, chi: int,
                                   trunc: TruncParams,
                                   with_holes: bool = True) -> EnergyHoles:
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    rdt = rdtype(tps)
    need = ("v", "d", "ad") if ft.has_diag else ("v",)
    tables = compute_ratio_tables(tps, config, chi, trunc, need=need,
                                  with_holes=with_holes)
    signs = _string_signs(config, ft, rdt)
    e = jnp.zeros((), rdt)

    c1h, c2h = config[:, :lx - 1], config[:, 1:]
    for key, h in (("none", ft.h_h_none), ("up", ft.h_h_up),
                   ("dn", ft.h_h_dn)):
        if h is None:
            continue
        contrib = jnp.sum(h[c1h, c2h] * tables.ratio_h, axis=(-1, -2))
        e = e + jnp.sum(signs[("h", key)] * contrib)

    c1v, c2v = config[:ly - 1], config[1:]
    for key, h in (("none", ft.h_v_none), ("up", ft.h_v_up),
                   ("dn", ft.h_v_dn)):
        if h is None:
            continue
        contrib = jnp.sum(h[c1v, c2v] * tables.ratio_v, axis=(-1, -2))
        e = e + jnp.sum(signs[("v", key)] * contrib)

    if ft.has_diag and lx > 1 and ly > 1:
        # diagonal (y,x)-(y+1,x+1): ratio_d[y, x, a, b] with a at (y,x)
        c1d, c2d = config[:ly - 1, :lx - 1], config[1:, 1:]
        for key, h in (("none", ft.h_d_none), ("up", ft.h_d_up),
                       ("dn", ft.h_d_dn)):
            if h is None:
                continue
            contrib = jnp.sum(h[c1d, c2d] * tables.ratio_d, axis=(-1, -2))
            e = e + jnp.sum(signs[("d", key)] * contrib)
        # anti-diagonal: ratio_ad[y, x, a, b] with a at (y+1,x), b at (y,x+1)
        c1a, c2a = config[1:, :lx - 1], config[:ly - 1, 1:]
        for key, h in (("none", ft.h_ad_none), ("up", ft.h_ad_up),
                       ("dn", ft.h_ad_dn)):
            if h is None:
                continue
            contrib = jnp.sum(h[c1a, c2a] * tables.ratio_ad, axis=(-1, -2))
            e = e + jnp.sum(signs[("ad", key)] * contrib)

    if ft.h_site is not None:
        e = e + jnp.sum(ft.h_site[config] * tables.ratio1)

    return EnergyHoles(e, tables.o_tensor, tables.log_abs_psi,
                       tables.psi_mant)
