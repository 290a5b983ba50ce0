"""Multi-chip distribution: chains sharded over a device mesh.

The reference scales by one MPI rank per Markov chain plus cooperative linear
algebra (SURVEY.md §2.6). Here the SAME program runs on every chip under jit:

* chains axis  -> sharded over the mesh "chains" axis (pure data parallelism,
  gradient/energy means become psums inserted by XLA);
* SR sample buffers [Ns, P] -> rows sharded over "chains" too, so the CG
  matvec A^H (A v) reduces with one psum per iteration (the reference's
  master/slave CG protocol, conjugate_gradient_solver.h:297);
* MinSR Gram matrix A A^H -> all-gather of row blocks + sharded matmul
  (replacing the MPI ring exchange, minsr_tmatrix.h:79).

No explicit collectives are written here: we annotate shardings and let XLA
insert all_gather/psum over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chains_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"chains_mesh: need {n_devices} devices, have {len(devs)} "
                f"(platform {devs[0].platform}); for host testing set "
                f"JAX_PLATFORMS=cpu and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("chains",))


def shard_chains(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Shard the leading (chain) axis; other axes replicated."""
    spec = P("chains", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, P()))
