"""TPS / SplitIndexTPS state container.

One dense array ``[Ly, Lx, d, D, D, D, D]`` with site axes (p, u, l, d, r) is
both the reference's ``TPS`` (`include/qlpeps/two_dim_tn/tps/tps.h:76`) and its
``SplitIndexTPS`` (`split_index_tps.h:81`): axis 2 is the split physical index.
Being a single array, the whole VMC parameter vector supports vector-space ops
(+, -, scalar *, inner product), elementwise transforms for AdaGrad/Adam, and
sharding — with no per-site bookkeeping.

Boundary bonds are padded (content at index 0, exact zeros elsewhere); masks
come from :func:`peps_tpu.lattice.boundary_mask`.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.lattice import BoundaryCondition, boundary_mask


@dataclasses.dataclass(frozen=True)
class TPSMeta:
    ly: int
    lx: int
    phys_dim: int
    bond_dim: int
    bc: BoundaryCondition = BoundaryCondition.OPEN


def random_tps(key: jax.Array, ly: int, lx: int, phys_dim: int, bond_dim: int,
               dtype=jnp.float32, bc: BoundaryCondition = BoundaryCondition.OPEN,
               scale: float = 1.0) -> jnp.ndarray:
    """Random TPS with boundary padding masked to exact zeros."""
    shape = (ly, lx, phys_dim, bond_dim, bond_dim, bond_dim, bond_dim)
    if jnp.issubdtype(dtype, jnp.complexfloating):
        kr, ki = jax.random.split(key)
        real_dt = jnp.float64 if dtype == jnp.complex128 else jnp.float32
        arr = (jax.random.normal(kr, shape, real_dt)
               + 1j * jax.random.normal(ki, shape, real_dt)).astype(dtype)
    else:
        arr = jax.random.normal(key, shape, dtype)
    mask = jnp.asarray(boundary_mask(ly, lx, phys_dim, bond_dim, bc), dtype=arr.real.dtype)
    return arr * scale * mask


def project(tps: jnp.ndarray, config: jnp.ndarray) -> jnp.ndarray:
    """Project onto a classical configuration: tn[y,x] = tps[y,x,config[y,x]].

    tps: [Ly, Lx, d, D, D, D, D], config: [Ly, Lx] int -> [Ly, Lx, D, D, D, D].
    Reference: `TPS::Project`, tps_impl.h.
    """
    idx = config[:, :, None, None, None, None, None]
    return jnp.take_along_axis(tps, idx, axis=2).squeeze(2)


def inner_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Flattened Euclidean inner product <a|b> (conjugating a), the
    reference's SplitIndexTPS operator* (`split_index_tps.h:370`)."""
    return jnp.vdot(a, b)


def norm_square(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.real(jnp.vdot(a, a))


def save_tps(path: str, tps: np.ndarray | jnp.ndarray, meta: TPSMeta) -> None:
    """Dump to <path>.npz + JSON meta (reference: tps_meta.txt + per-tensor
    binaries, `split_index_tps.h:567-588`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", tps=np.asarray(tps))
    meta_path = (path[:-4] if path.endswith(".npz") else path) + "_meta.json"
    with open(meta_path, "w") as f:
        json.dump({"ly": meta.ly, "lx": meta.lx, "phys_dim": meta.phys_dim,
                   "bond_dim": meta.bond_dim, "bc": meta.bc.value}, f)


def load_tps(path: str):
    base = path[:-4] if path.endswith(".npz") else path
    arr = np.load(base + ".npz")["tps"]
    with open(base + "_meta.json") as f:
        m = json.load(f)
    meta = TPSMeta(m["ly"], m["lx"], m["phys_dim"], m["bond_dim"],
                   BoundaryCondition(m["bc"]))
    return jnp.asarray(arr), meta


# ---------------------------------------------------------------------------
# Brute-force oracles (tests only; exponential in lattice size)
# ---------------------------------------------------------------------------

def exact_contract(tn: np.ndarray) -> complex:
    """Exactly contract a small projected network [Ly, Lx, u, l, d, r] by
    absorbing rows into a dense top boundary (no truncation). Boundary legs
    are closed at index 0. Test oracle for the BMPS engine."""
    tn = np.asarray(tn)
    ly, lx, D = tn.shape[0], tn.shape[1], tn.shape[2]
    # boundary vector over the Lx down-legs, starts as index-0 product
    v = np.zeros((D,) * lx, dtype=tn.dtype)
    v[(0,) * lx] = 1.0
    for y in range(ly):
        # absorb row y: contract each column's u leg, chain l/r bonds
        # state w has open legs: (d_0 .. d_{x-1}, r_{x-1}, u_x .. u_{Lx-1})
        w = v
        for x in range(lx):
            s = tn[y, x]  # [u, l, d, r]
            if x == 0:
                s = s[:, 0, :, :]  # close left edge -> [u, d, r]
                # w axes: (u_0, u_1, .., u_{Lx-1}); contract u_0
                w = np.tensordot(s, w, axes=([0], [0]))  # axes (d0, r0, u1, ...)
            else:
                # w axes: (d_0..d_{x-1}, r_{x-1}, u_x, ..)
                w = np.tensordot(w, tn[y, x], axes=([x, x + 1], [1, 0]))
                # result axes: (d_0..d_{x-1}, u_{x+1}.., d_x, r_x)
                w = np.moveaxis(w, -2, x)      # bring d_x after d_{x-1}
                w = np.moveaxis(w, -1, x + 1)  # bring r_x next
        # close right edge
        idx = [slice(None)] * lx + [0]
        v = w[tuple(idx)]
    # close all bottom legs at index 0
    return v[(0,) * lx]


def exact_amplitude(tps: np.ndarray, config: np.ndarray) -> complex:
    return exact_contract(np.asarray(project(jnp.asarray(tps), jnp.asarray(config))))


def exact_contract_pbc(tn: np.ndarray) -> complex:
    """Exactly contract a small PERIODIC network [n, n, u, l, d, r] by
    building row transfer matrices over the vertical-bond product space and
    tracing. Test oracle for the PBC contractor (exponential in n)."""
    tn = np.asarray(tn)
    ly, lx, D = tn.shape[0], tn.shape[1], tn.shape[2]
    # row y transfer operator: M[(u_0..u_{lx-1}), (d_0..)] summed over the
    # periodic horizontal bonds of the row
    total = None
    for y in range(ly):
        # chain of tensors over x with l/r contracted periodically:
        # start with T[y,0] legs (u0, l0, d0, r0); absorb x=1..lx-1
        w = tn[y, 0]  # [u, l, d, r]
        w = np.moveaxis(w, 1, 0)  # [l0, u0, d0, r0]
        for x in range(1, lx):
            w = np.tensordot(w, tn[y, x], axes=([-1], [1]))
            # w: [l0, u0, d0, .., u_x, d_x, r_x]
        # close horizontal PBC: contract r_{lx-1} with l0
        w = np.trace(w, axis1=0, axis2=w.ndim - 1)
        # w axes: (u0, d0, u1, d1, ..., u_{lx-1}, d_{lx-1})
        perm = list(range(0, 2 * lx, 2)) + list(range(1, 2 * lx, 2))
        w = np.transpose(w, perm).reshape(D ** lx, D ** lx)
        total = w if total is None else total @ w
    return np.trace(total)


def wavefunction_sum(a: jnp.ndarray, b: jnp.ndarray,
                     ca: float = 1.0, cb: float = 1.0) -> jnp.ndarray:
    """Superposition ca*|a> + cb*|b> as a TPS via bond-dimension direct sum
    (reference: WaveFunctionSum, tps.h:159-216). a, b: [Ly, Lx, d, D..];
    returns a TPS with bond dimension Da + Db. Boundary bonds keep the
    padded-at-slot-0 convention by embedding each state's boundary content
    in its own block and summing the rank-1 boundary closures."""
    ly, lx, d = a.shape[0], a.shape[1], a.shape[2]
    da, db = a.shape[3], b.shape[3]
    dn = da + db
    out = jnp.zeros((ly, lx, d, dn, dn, dn, dn),
                    jnp.result_type(a.dtype, b.dtype))
    # interior: block-diagonal embedding
    out = out.at[:, :, :, :da, :da, :da, :da].set(a)
    out = out.at[:, :, :, da:, da:, da:, da:].set(b)
    # boundary legs are 1-dimensional (content at index 0): both blocks'
    # boundary slots must merge onto slot 0 so the closure "take index 0"
    # sums the two states. Move block-b's boundary content from slot da to
    # slot 0 on each boundary leg (u of row 0, l of col 0, d of row Ly-1,
    # r of col Lx-1), scaling in the amplitudes.
    out = out * jnp.asarray(1.0, out.dtype)

    def move(arr, axis_idx, rows=None, cols=None):
        idx = [slice(None)] * 7
        if rows is not None:
            idx[0] = rows
        if cols is not None:
            idx[1] = cols
        sl_from = list(idx)
        sl_from[axis_idx] = slice(da, da + 1)
        sl_to = list(idx)
        sl_to[axis_idx] = slice(0, 1)
        blk = arr[tuple(sl_from)]
        arr = arr.at[tuple(sl_to)].add(blk)
        arr = arr.at[tuple(sl_from)].set(0.0)
        return arr

    # scale the two blocks: fold ca / cb into ONE site of each block
    # (site (0,0); scaling more sites would raise the coefficient to the
    # number of scaled sites)
    out = out.at[0, 0, :, :da].multiply(jnp.asarray(ca, out.dtype))
    out = out.at[0, 0, :, da:].multiply(jnp.asarray(cb, out.dtype))
    out = move(out, 3, rows=0)                 # u legs of row 0
    out = move(out, 4, cols=0)                 # l legs of col 0
    out = move(out, 5, rows=ly - 1)            # d legs of row Ly-1
    out = move(out, 6, cols=lx - 1)            # r legs of col Lx-1
    from peps_tpu.lattice import boundary_mask
    mask = jnp.asarray(boundary_mask(ly, lx, d, dn), dtype=out.real.dtype)
    return out * mask


def expand_bond_dim(tps: jnp.ndarray, new_bond_dim: int,
                    noise: float = 0.0, key: jax.Array | None = None
                    ) -> jnp.ndarray:
    """Embed a TPS into a larger bond dimension (reference: qlten `Expand`
    as used for D-increase workflows). Zero-pads every virtual leg to
    new_bond_dim, preserving the represented state exactly; optional small
    Gaussian noise on the new slots seeds the enlarged variational space
    (noise is masked off boundary legs so the padded-at-index-0 convention
    is preserved)."""
    ly, lx, d = tps.shape[0], tps.shape[1], tps.shape[2]
    db = tps.shape[3]
    assert new_bond_dim >= db, (new_bond_dim, db)
    pad = new_bond_dim - db
    out = jnp.pad(tps, ((0, 0), (0, 0), (0, 0)) + ((0, pad),) * 4)
    if noise > 0.0:
        assert key is not None, "noise > 0 needs a PRNG key"
        from peps_tpu.lattice import boundary_mask
        full = jax.random.normal(key, out.shape, out.dtype) * noise
        keep_old = jnp.zeros(out.shape, bool)
        keep_old = keep_old.at[:, :, :, :db, :db, :db, :db].set(True)
        mask = jnp.asarray(boundary_mask(ly, lx, d, new_bond_dim),
                           dtype=out.real.dtype)
        out = out + jnp.where(keep_old, 0.0, full) * mask
    return out
