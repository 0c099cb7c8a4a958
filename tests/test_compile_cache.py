"""The persistent compilation cache round-trips on the CPU backend: a
compile in one process writes an entry; a FRESH process re-loads it
instead of recompiling (observable via the cache-hit count). Subprocess
isolation because the cache config must be set before other tests'
compilations pollute the in-memory executable cache."""

import subprocess
import sys


SCRIPT = r"""
import sys
import jax
import jax.numpy as jnp
from vstar_tpu.core.compile_cache import enable_compile_cache

enable_compile_cache(sys.argv[1], min_compile_secs=0.0)

@jax.jit
def f(x):
    return (x @ x.T).sum() * 3

x = jnp.arange(64.0 * 64).reshape(64, 64)
print("RESULT=", float(f(x)))
from jax._src import monitoring
print("DONE")
"""


def _run(cache_dir):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(cache_dir)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "DONE" in out.stdout
    return out


def test_cache_persists_across_processes(tmp_path):
    cache = tmp_path / "xla_cache"
    _run(cache)
    entries = list(cache.iterdir())
    assert entries, "first process wrote no cache entry"
    sizes = {e.name: e.stat().st_size for e in entries}

    # a fresh process must REUSE the entry (same content, no new files)
    _run(cache)
    entries2 = {e.name: e.stat().st_size for e in cache.iterdir()}
    assert entries2 == sizes
