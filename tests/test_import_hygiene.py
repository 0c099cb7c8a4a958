"""Importing the package must not initialize any JAX backend.

A module-level `jnp.*` constant runs a device op at import time, which
initializes the backend — on the axon TPU relay that turns `import
vstar_tpu.search.compiled` into an unbounded hang whenever the relay
tunnel is down (observed r3: 26 minutes inside the import before
UNAVAILABLE), and it robs every entry point of the chance to choose a
backend first (bench.py's degraded-mode probe runs BEFORE the imports
for exactly this reason). Module-level numpy scalars trace identically
inside jit and are the sanctioned pattern (search/compiled.py:64).

The sweep runs in a subprocess so this test is independent of whatever
backend the rest of the suite already initialized.
"""

import subprocess
import sys

SWEEP = r"""
import pkgutil, importlib
import jax
import vstar_tpu
failed = []
for m in pkgutil.walk_packages(vstar_tpu.__path__, "vstar_tpu."):
    try:
        importlib.import_module(m.name)
    except Exception as e:          # import errors are a separate failure
        failed.append(f"{m.name}: {type(e).__name__}: {e}")
from jax._src import xla_bridge
inited = sorted(xla_bridge._backends)
print("INITED=" + ",".join(inited))
print("FAILED=" + ";".join(failed))
"""


def test_no_backend_init_on_import():
    out = subprocess.run(
        [sys.executable, "-c", SWEEP],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "",
             "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = dict(l.split("=", 1) for l in out.stdout.splitlines()
                 if "=" in l)
    assert lines.get("FAILED", "") == "", lines["FAILED"]
    assert lines.get("INITED", "") == "", (
        f"importing vstar_tpu initialized backend(s): {lines['INITED']} — "
        "a module-level jnp constant/op crept in; use numpy scalars")
