import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from peps_tpu.linalg import TruncParams
from peps_tpu.montecarlo.engine import init_configs_occupancy
from peps_tpu.montecarlo.sweep import UpdateRule
from peps_tpu.montecarlo.sweep_pbc import mc_sweep_pbc
from peps_tpu.peps import SimpleUpdateParams, product_peps, simple_update, to_tps
from peps_tpu.models import spin

NCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ly = lx = 8; D = 8; chi = 32
model = spin.heisenberg(1.0)
occ = np.indices((ly, lx)).sum(0) % 2
peps0 = product_peps(ly, lx, D, occ, 2, dtype=jnp.float32)
su = simple_update(peps0, model.h_h, model.h_v,
                   SimpleUpdateParams(steps=40, tau=0.1,
                                      trunc=TruncParams(D, 1, 1e-8)))
tps = to_tps(su.peps); tps = tps / jnp.max(jnp.abs(tps))
n = ly * lx
trunc = TruncParams(chi, 1, 1e-6, scheme="sketch")
rule = UpdateRule("exchange")
configs = init_configs_occupancy(jax.random.PRNGKey(1), NCH, ly, lx,
                                 {0: n // 2, 1: n - n // 2})

def sweep1(configs, key):
    ks = jax.random.split(key, NCH + 1)
    out, _, st = jax.vmap(
        mc_sweep_pbc, in_axes=(None, 0, 0, None, None, None))(
        tps, configs, ks[1:], chi, trunc, rule)
    return out, jnp.sum(st.accepted)

f = jax.jit(sweep1)
out, a = f(configs, jax.random.PRNGKey(2))
_ = float(jnp.sum(out)) + float(a)
t0 = time.time()
k = 2
for i in range(k):
    out, a = f(out, jax.random.fold_in(jax.random.PRNGKey(3), i))
_ = float(jnp.sum(out)) + float(a)
dt = (time.time() - t0) / k
print(f"PBC 8x8 D=8 chi=32 nch={NCH}: {NCH/dt:.1f} chain-sweeps/s", flush=True)
