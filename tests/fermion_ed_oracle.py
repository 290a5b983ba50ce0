"""Exact diagonalization for fermionic lattice models — INDEPENDENT of the
Jordan-Wigner channel machinery (direct second-quantized parity counting),
so it cross-checks the JW string signs in peps_tpu/models/fermion.py.

Mode order: m = n_species * (y*Lx + x) + species (species 0 = up, 1 = down).
Local-basis encodings match models/fermion.py (n_up/n_dn lookups).
"""
from __future__ import annotations

import itertools

import numpy as np
import scipy.sparse as sp

from peps_tpu.models.fermion import FermionModel


def _site_sequence(ly, lx, order):
    """Site (y, x) list in JW order: "row" = row-major, "snake" =
    boustrophedon (even rows left-to-right, odd rows right-to-left) — the
    planar-compatible order used by the graded PEPS backend."""
    out = []
    for y in range(ly):
        xs = range(lx) if (order == "row" or y % 2 == 0) \
            else range(lx - 1, -1, -1)
        for x in xs:
            out.append((y, x))
    return out


def _config_to_occ(config, n_up, n_dn, spinless, order="row"):
    """Flatten a lattice config to the mode occupation vector (JW order)."""
    ly, lx = config.shape
    occ = []
    for (y, x) in _site_sequence(ly, lx, order):
        s = config[y, x]
        if spinless:
            occ.append(int(n_up[s]))
        else:
            occ.append(int(n_up[s]))
            occ.append(int(n_dn[s]))
    return np.array(occ, dtype=np.int8)


def _occ_to_config(occ, d, n_up, n_dn, spinless, n_sites, seq=None,
                   shape=None):
    """Inverse mapping; returns None if some site pattern is not in the local
    basis (e.g. double occupancy for t-J). With `seq`/`shape`, returns the
    [ly, lx] lattice config for that site sequence; else a flat row-major
    config."""
    table = {}
    for s in range(d):
        key = (int(n_up[s]),) if spinless else (int(n_up[s]), int(n_dn[s]))
        table[key] = s
    states = []
    for i in range(n_sites):
        if spinless:
            key = (int(occ[i]),)
        else:
            key = (int(occ[2 * i]), int(occ[2 * i + 1]))
        if key not in table:
            return None
        states.append(table[key])
    if seq is None:
        return np.array(states)
    cfg = np.zeros(shape, dtype=np.int64)
    for (y, x), s in zip(seq, states):
        cfg[y, x] = s
    return cfg.ravel()


def _apply_c(occ, m):
    """Apply annihilation at mode m. Returns (sign, new_occ) or None."""
    if occ[m] == 0:
        return None
    sign = (-1) ** int(np.sum(occ[:m]))
    new = occ.copy()
    new[m] = 0
    return sign, new


def _apply_cdag(occ, m):
    if occ[m] == 1:
        return None
    sign = (-1) ** int(np.sum(occ[:m]))
    new = occ.copy()
    new[m] = 1
    return sign, new


def _apply_ops(occ, ops):
    """ops: list of ("c"|"cdag", mode), applied right-to-left."""
    sign = 1
    cur = occ
    for kind, m in reversed(ops):
        r = _apply_c(cur, m) if kind == "c" else _apply_cdag(cur, m)
        if r is None:
            return None
        s, cur = r
        sign *= s
    return sign, cur


def build_fermion_hamiltonian(model: FermionModel, ly: int, lx: int,
                              order: str = "row",
                              restrict_configs=None) -> sp.csr_matrix:
    """restrict_configs: optional iterable of site-state tuples limiting the
    SOURCE configurations enumerated (full-dim indexing is kept). Valid only
    when the model conserves the quantity defining the restriction (e.g. a
    fixed (N_up, N_dn) sector for t-J/Hubbard): matrix columns outside the
    set are simply absent, so callers must sub-select rows/cols to the same
    sector before diagonalizing."""
    d = model.phys_dim
    n_sites = ly * lx
    ns = 1 if model.spinless else 2
    dim = d ** n_sites
    rows, cols, vals = [], [], []
    seq = _site_sequence(ly, lx, order)
    rank = {s: i for i, s in enumerate(seq)}

    def mode(y, x, sp_):
        return ns * rank[(y, x)] + sp_

    def add(row_cfg, col_cfg, v):
        r = int(np.ravel_multi_index(row_cfg, (d,) * n_sites))
        c = int(np.ravel_multi_index(col_cfg, (d,) * n_sites))
        rows.append(r); cols.append(c); vals.append(v)

    # Build generic operators from the model's channel tables interpreted in
    # second quantization: hopping channels -> explicit c^dag c; "none"
    # channels + h_site -> matrix elements in the local basis with on-site
    # spin-flip terms treated as the 4-fermion exchange operator.
    bonds = ([((y, x), (y, x + 1), "h") for y in range(ly) for x in range(lx - 1)]
             + [((y, x), (y + 1, x), "v") for y in range(ly - 1) for x in range(lx)]
             # diagonal ((y,x),(y+1,x+1)) and anti-diagonal ((y+1,x),(y,x+1))
             # NNN bonds, in the channel tables' index order
             + [((y, x), (y + 1, x + 1), "d")
                for y in range(ly - 1) for x in range(lx - 1)]
             + [((y + 1, x), (y, x + 1), "ad")
                for y in range(ly - 1) for x in range(lx - 1)])

    configs = (list(itertools.product(range(d), repeat=n_sites))
               if restrict_configs is None else list(restrict_configs))
    for cfg_t in configs:
        cfg = np.array(cfg_t)
        occ = _config_to_occ(cfg.reshape(ly, lx), model.n_up, model.n_dn,
                             model.spinless, order)
        for (s1y, s1x), (s2y, s2x), orient in bonds:
            channels = {"h": model.channels_h, "v": model.channels_v,
                        "d": getattr(model, "channels_d", ()),
                        "ad": getattr(model, "channels_ad", ())}[orient]
            i1, i2 = s1y * lx + s1x, s2y * lx + s2x
            for ch in channels:
                if ch.string in ("up", "dn"):
                    spidx = 0 if (ch.string == "up" or model.spinless) else 1
                    # amplitude from the table: -t entries; we only need the
                    # scalar hop amplitude: read it off the table
                    # <occupied',empty'|h|...>: use generic: apply both hop
                    # directions with the table's amplitude on a reference
                    # transition.
                    amp = _hop_amplitude(ch.h, model, ch.string)
                    for (a, b) in ((mode(s1y, s1x, spidx), mode(s2y, s2x, spidx)),
                                   (mode(s2y, s2x, spidx), mode(s1y, s1x, spidx))):
                        r = _apply_ops(occ, [("cdag", a), ("c", b)])
                        if r is None:
                            continue
                        sgn, new_occ = r
                        new_cfg = _occ_to_config(new_occ, d, model.n_up,
                                                 model.n_dn, model.spinless,
                                                 n_sites, seq, (ly, lx))
                        if new_cfg is None:
                            continue
                        add(new_cfg, cfg, amp * sgn)
                else:
                    # local (string-free) channel. Diagonal entries are added
                    # directly; off-diagonal entries (spin exchange) are
                    # applied via explicit 4-fermion operators with full
                    # parity counting — independently checking the claim that
                    # they carry no net string sign.
                    s1, s2 = cfg[i1], cfg[i2]
                    h = ch.h
                    dloc = h.shape[0]
                    for p in range(dloc):
                        for q in range(dloc):
                            v = h[p, q, s1, s2]
                            if v == 0:
                                continue
                            if p == s1 and q == s2:
                                add(cfg, cfg, v)
                                continue
                            assert not model.spinless, "unexpected offdiag"
                            ops = []
                            for site_idx, (snew, sold) in (( (s1y, s1x), (p, s1)),
                                                            ((s2y, s2x), (q, s2))):
                                # canonical per-site order: creation before
                                # annihilation (S^- = c^dag_dn c_up etc.)
                                site_cdag, site_c = [], []
                                for spi, nvec in ((0, model.n_up), (1, model.n_dn)):
                                    dn_ = int(nvec[snew]) - int(nvec[sold])
                                    if dn_ == 1:
                                        site_cdag.append(("cdag", mode(site_idx[0], site_idx[1], spi)))
                                    elif dn_ == -1:
                                        site_c.append(("c", mode(site_idx[0], site_idx[1], spi)))
                                ops.extend(site_cdag + site_c)
                            r = _apply_ops(occ, ops)
                            if r is None:
                                continue
                            sgn, new_occ = r
                            new_cfg = _occ_to_config(new_occ, dloc, model.n_up,
                                                     model.n_dn, model.spinless,
                                                     n_sites, seq, (ly, lx))
                            if new_cfg is None:
                                continue
                            add(new_cfg, cfg, v * sgn)
        if model.h_site is not None:
            hs = model.h_site
            for i in range(n_sites):
                s = cfg[i]
                for p in range(d):
                    v = hs[p, s]
                    if v == 0:
                        continue
                    new_cfg = cfg.copy()
                    new_cfg[i] = p
                    add(new_cfg, cfg, v)
    return sp.coo_matrix((vals, (rows, cols)), shape=(dim, dim)).tocsr()


def _hop_amplitude(h, model, string):
    """Extract the scalar hop amplitude from a hop channel table (the table
    is amp * (create x destroy + h.c.))."""
    d = h.shape[0]
    n = model.n_up if (string == "up" or model.spinless) else model.n_dn
    other = model.n_dn if (string == "up" or model.spinless) else model.n_up
    for p in range(d):
        for q in range(d):
            for s1 in range(d):
                for s2 in range(d):
                    v = h[p, q, s1, s2]
                    if v != 0:
                        return float(v)
    return 0.0
