"""Exact-diagonalization oracle for small lattices (test-only).

Plays the role of the reference's python ED generators
(`tests/tools/pbc_benchmarks.py`, quspin scripts — SURVEY.md §4.6), but
implemented independently with scipy sparse so conventions are self-consistent
with peps_tpu's model spec.
"""
from __future__ import annotations

import itertools

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from peps_tpu.models.spin import SquareLatticeModel


def _site_index(y, x, lx):
    return y * lx + x


def _embed_two_site(h4, i, j, n_sites, d):
    """Embed h[d,d,d,d] acting on sites i, j into the full Hilbert space."""
    dim = d ** n_sites
    h2 = np.asarray(h4).reshape(d * d, d * d)
    rows, cols, vals = [], [], []
    # iterate over basis states grouped by the (i, j) subspace
    others = [k for k in range(n_sites) if k not in (i, j)]
    for env in itertools.product(range(d), repeat=len(others)):
        base = [0] * n_sites
        for k, s in zip(others, env):
            base[k] = s
        for si in range(d):
            for sj in range(d):
                col_state = list(base)
                col_state[i], col_state[j] = si, sj
                col = int(np.ravel_multi_index(col_state, (d,) * n_sites))
                for ti in range(d):
                    for tj in range(d):
                        v = h2[ti * d + tj, si * d + sj]
                        if v != 0:
                            row_state = list(base)
                            row_state[i], row_state[j] = ti, tj
                            row = int(np.ravel_multi_index(row_state, (d,) * n_sites))
                            rows.append(row)
                            cols.append(col)
                            vals.append(v)
    return sp.coo_matrix((vals, (rows, cols)), shape=(dim, dim))


def _embed_one_site(h2, i, n_sites, d):
    dim = d ** n_sites
    mats = [sp.identity(d, format="coo")] * n_sites
    mats[i] = sp.coo_matrix(np.asarray(h2))
    out = mats[0]
    for m in mats[1:]:
        out = sp.kron(out, m, format="coo")
    assert out.shape == (dim, dim)
    return out


def build_hamiltonian(model: SquareLatticeModel, ly: int, lx: int,
                      periodic: bool = False) -> sp.csr_matrix:
    d = model.phys_dim
    n = ly * lx
    dim = d ** n
    h = sp.csr_matrix((dim, dim), dtype=np.complex128 if any(
        m is not None and np.iscomplexobj(m)
        for m in (model.h_h, model.h_v, model.h_d, model.h_ad, model.h_site))
        else np.float64)
    xs_h = range(lx if periodic else lx - 1)
    ys_v = range(ly if periodic else ly - 1)
    if model.h_h is not None:
        for y in range(ly):
            for x in xs_h:
                h = h + _embed_two_site(model.h_h, _site_index(y, x, lx),
                                        _site_index(y, (x + 1) % lx, lx), n, d).tocsr()
    if model.h_v is not None:
        for y in ys_v:
            for x in range(lx):
                h = h + _embed_two_site(model.h_v, _site_index(y, x, lx),
                                        _site_index((y + 1) % ly, x, lx), n, d).tocsr()
    if model.h_d is not None:  # (y,x)-(y+1,x+1)
        for y in (range(ly) if periodic else range(ly - 1)):
            for x in (range(lx) if periodic else range(lx - 1)):
                h = h + _embed_two_site(model.h_d, _site_index(y, x, lx),
                                        _site_index((y + 1) % ly, (x + 1) % lx, lx), n, d).tocsr()
    if model.h_ad is not None:  # (y+1,x)-(y,x+1)
        for y in (range(ly) if periodic else range(ly - 1)):
            for x in (range(lx) if periodic else range(lx - 1)):
                h = h + _embed_two_site(model.h_ad, _site_index((y + 1) % ly, x, lx),
                                        _site_index(y, (x + 1) % lx, lx), n, d).tocsr()
    h_s5a = getattr(model, "h_s5a", None)
    if h_s5a is not None:   # (y+1,x)-(y,x+2), OBC only
        for y in range(ly - 1):
            for x in range(lx - 2):
                h = h + _embed_two_site(h_s5a, _site_index(y + 1, x, lx),
                                        _site_index(y, x + 2, lx), n,
                                        d).tocsr()
    h_s5b = getattr(model, "h_s5b", None)
    if h_s5b is not None:   # (y+2,x)-(y,x+1), OBC only
        for y in range(ly - 2):
            for x in range(lx - 1):
                h = h + _embed_two_site(h_s5b, _site_index(y + 2, x, lx),
                                        _site_index(y, x + 1, lx), n,
                                        d).tocsr()
    h_tnn_h = getattr(model, "h_tnn_h", None)
    if h_tnn_h is not None:  # (y,x)-(y,x+2)
        for y in range(ly):
            for x in range(lx - 2):
                h = h + _embed_two_site(h_tnn_h, _site_index(y, x, lx),
                                        _site_index(y, x + 2, lx), n,
                                        d).tocsr()
    h_tnn_v = getattr(model, "h_tnn_v", None)
    if h_tnn_v is not None:  # (y,x)-(y+2,x)
        for y in range(ly - 2):
            for x in range(lx):
                h = h + _embed_two_site(h_tnn_v, _site_index(y, x, lx),
                                        _site_index(y + 2, x, lx), n,
                                        d).tocsr()
    if model.h_site is not None:
        for i in range(n):
            h = h + _embed_one_site(model.h_site, i, n, d).tocsr()
    return h


def ground_energy(model: SquareLatticeModel, ly: int, lx: int,
                  periodic: bool = False) -> float:
    h = build_hamiltonian(model, ly, lx, periodic)
    if h.shape[0] <= 256:
        w = np.linalg.eigvalsh(h.toarray())
        return float(w[0])
    w = spla.eigsh(h, k=1, which="SA", return_eigenvectors=False)
    return float(w[0])


def wavefunction_from_tps(tps: np.ndarray) -> np.ndarray:
    """Enumerate all configurations and contract exactly -> state vector in
    the computational basis (row-major over sites, config index = state)."""
    from peps_tpu.tps import exact_amplitude
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    n = ly * lx
    psi = np.zeros(d ** n, dtype=np.complex128 if np.iscomplexobj(tps) else np.float64)
    for idx, cfg in enumerate(itertools.product(range(d), repeat=n)):
        config = np.array(cfg).reshape(ly, lx)
        psi[idx] = exact_amplitude(tps, config)
    return psi


def energy_of_tps(tps: np.ndarray, model: SquareLatticeModel,
                  periodic: bool = False) -> float:
    ly, lx = tps.shape[:2]
    psi = wavefunction_from_tps(tps)
    h = build_hamiltonian(model, ly, lx, periodic)
    nrm = np.vdot(psi, psi)
    return float(np.real(np.vdot(psi, h @ psi) / nrm))


def energy_of_tps_pbc(tps: np.ndarray, model: SquareLatticeModel) -> float:
    """Exact torus energy: amplitudes by brute-force PERIODIC contraction,
    Hamiltonian with wrap bonds."""
    import jax.numpy as jnp
    from peps_tpu.tps import exact_contract_pbc, project
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    n = ly * lx
    psi = np.zeros(d ** n,
                   dtype=np.complex128 if np.iscomplexobj(tps) else np.float64)
    tps_j = jnp.asarray(tps)
    for idx, cfg in enumerate(itertools.product(range(d), repeat=n)):
        config = np.array(cfg).reshape(ly, lx)
        psi[idx] = exact_contract_pbc(np.asarray(project(tps_j, jnp.asarray(config))))
    h = build_hamiltonian(model, ly, lx, periodic=True)
    return float(np.real(np.vdot(psi, h @ psi) / np.vdot(psi, psi)))
