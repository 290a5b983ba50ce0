"""t-J singlet pair correlator vs explicit second-quantized ED."""
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from peps_tpu.algorithm.measure_fermion import (tj_singlet_pair_corr_col,
                                                tj_singlet_pair_corr_row)
from peps_tpu.linalg import TruncParams
from peps_tpu.tps import random_tps
from tests.ed_oracle import wavefunction_from_tps
from tests.fermion_ed_oracle import _apply_ops, _config_to_occ, _occ_to_config

N_UP = np.array([0, 1, 0])
N_DN = np.array([0, 0, 1])


def _pair_op_matrix(ly, lx, site_i, site_j, site_k, site_l):
    """Dense matrix of Delta^dag_{(i,j)} Delta_{(k,l)} in the d=3 basis
    (flat row-major site indices; (i,j) and (k,l) are the two bonds)."""
    d = 3
    n = ly * lx
    dim = d ** n
    mat = np.zeros((dim, dim))

    def mode(site, sp):
        return 2 * site + sp

    for cfg_t in itertools.product(range(d), repeat=n):
        cfg = np.array(cfg_t)
        occ = _config_to_occ(cfg.reshape(ly, lx), N_UP, N_DN, False)
        col = int(np.ravel_multi_index(cfg, (d,) * n))
        for sa, ca in ((0, 1.0), (1, -1.0)):       # Delta^dag channels
            for sb, cb in ((0, 1.0), (1, -1.0)):   # Delta channels
                ops = [("cdag", mode(site_j, 1 - sa)),
                       ("cdag", mode(site_i, sa)),
                       ("c", mode(site_k, sb)),
                       ("c", mode(site_l, 1 - sb))]
                r = _apply_ops(occ, ops)
                if r is None:
                    continue
                sgn, new_occ = r
                new_cfg = _occ_to_config(new_occ, d, N_UP, N_DN, False, n)
                if new_cfg is None:
                    continue
                row = int(np.ravel_multi_index(new_cfg, (d,) * n))
                mat[row, col] += 0.5 * ca * cb * sgn
    return mat


def test_pair_corr_matches_ed():
    ly, lx = 2, 4
    d = 3
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(3), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    psi = wavefunction_from_tps(np.asarray(tps))
    z = np.vdot(psi, psi)

    # estimator: sum_s |psi(s)|^2 O(s) / Z
    configs = np.array(list(itertools.product(range(d), repeat=ly * lx)),
                       dtype=np.int32).reshape(-1, ly, lx)

    def one(cfg):
        return tj_singlet_pair_corr_row(tps, cfg, chi, tp)

    tables = jax.lax.map(one, jnp.asarray(configs), batch_size=256)
    w = np.abs(psi) ** 2
    got = np.einsum("s,syik->yik", w, np.asarray(tables)) / z

    for y in range(ly):
        for (i, k) in [(0, 2)]:
            op = _pair_op_matrix(ly, lx, y * lx + i, y * lx + i + 1,
                                 y * lx + k, y * lx + k + 1)
            want = float(np.real(psi @ op @ psi) / z)
            assert abs(got[y, i, k] - want) < 1e-8 * max(1.0, abs(want)), \
                (y, i, k, got[y, i, k], want)
            assert abs(want) > 1e-12, "trivially-zero oracle"


def test_pair_corr_col_matches_ed():
    """Vertical-bond pairs in one column (transposed-frame walker) vs ED."""
    ly, lx = 4, 2
    d = 3
    chi = 16
    tp = TruncParams(chi, 1, 0.0)
    tps = random_tps(jax.random.PRNGKey(5), ly, lx, d, 2,
                     dtype=jnp.float64, scale=0.8)
    psi = wavefunction_from_tps(np.asarray(tps))
    z = np.vdot(psi, psi)
    configs = np.array(list(itertools.product(range(d), repeat=ly * lx)),
                       dtype=np.int32).reshape(-1, ly, lx)

    def one(cfg):
        return tj_singlet_pair_corr_col(tps, cfg, chi, tp)

    tables = jax.lax.map(one, jnp.asarray(configs), batch_size=256)
    w = np.abs(psi) ** 2
    got = np.einsum("s,sxik->xik", w, np.asarray(tables)) / z

    for x in range(lx):
        for (i, k) in [(0, 2)]:
            op = _pair_op_matrix(ly, lx, i * lx + x, (i + 1) * lx + x,
                                 k * lx + x, (k + 1) * lx + x)
            want = float(np.real(psi @ op @ psi) / z)
            assert abs(got[x, i, k] - want) < 1e-8 * max(1.0, abs(want)), \
                (x, i, k, got[x, i, k], want)
            assert abs(want) > 1e-12, "trivially-zero oracle"
