"""Package-consumer smoke test (reference: tests/package_consumer/ +
`verify-package` CMake target, SURVEY.md section 4 tier 7).

Builds a wheel from the repo (no network: --no-deps --no-build-isolation),
unpacks it into a temp dir, and imports + exercises the library from a
subprocess whose cwd is OUTSIDE the repo — so only the wheel contents are
on the path. Verifies the packaged native source (peps_tpu/csrc/) builds
and loads through the ctypes path too.
"""
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONSUMER = r"""
import sys
import peps_tpu
assert sys.modules["peps_tpu"].__file__.startswith(sys.argv[1]), \
    sys.modules["peps_tpu"].__file__

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from peps_tpu import api                       # facade imports everything
from peps_tpu.models import spin
from peps_tpu.linalg import TruncParams
from peps_tpu.peps import (SimpleUpdateParams, product_peps, simple_update,
                           to_tps)

model = spin.heisenberg(1.0)
occ = np.indices((2, 2)).sum(0) % 2
p0 = product_peps(2, 2, 2, occ, 2, dtype=jnp.float32)
su = simple_update(p0, model.h_h, model.h_v,
                   SimpleUpdateParams(steps=20, tau=0.2,
                                      trunc=TruncParams(2, 1, 1e-10)))
tps = to_tps(su.peps)
assert np.isfinite(float(jnp.sum(tps)))

# native source ships in the wheel: the ctypes path must find + build it
# (or cleanly fall back); either way the result must match pure numpy
from peps_tpu.utils import native
x = np.sin(np.arange(400, dtype=np.float64) * 0.1)
t = native.autocorr_time_native(x)
assert np.isfinite(t) and t > 0
src = sys.modules["peps_tpu"].__file__.replace("__init__.py",
                                               "csrc/peps_native.cpp")
import os
assert os.path.exists(src), src
print("CONSUMER_OK")
"""


def test_wheel_consumer(tmp_path):
    wheel_dir = tmp_path / "wheel"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir), REPO],
        capture_output=True, text=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"pip wheel unavailable: {r.stderr[-300:]}")
    wheels = list(wheel_dir.glob("peps_tpu-*.whl"))
    assert wheels, r.stdout + r.stderr
    site = tmp_path / "site"
    with zipfile.ZipFile(wheels[0]) as z:
        z.extractall(site)
    assert (site / "peps_tpu" / "csrc" / "peps_native.cpp").exists()

    script = tmp_path / "consumer.py"
    script.write_text(CONSUMER)
    env = dict(os.environ, PYTHONPATH=str(site),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, str(script), str(site)],
                       capture_output=True, text=True, timeout=600,
                       cwd=str(tmp_path), env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "CONSUMER_OK" in r.stdout
