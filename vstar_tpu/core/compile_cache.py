"""Persistent XLA compilation-cache switch.

Serving warmup compiles every (mode x batch x prompt x canvas) program,
which costs 20-230 s per program through the relay's remote compiler
(PARITY.md perf notes). JAX's persistent compilation cache serializes
compiled executables keyed on (HLO, compile options, backend version),
so a RESTARTED server with an unchanged model/config reloads them
instead of recompiling — warmup becomes IO-bound.

Opt-in via --compile-cache on the serving/eval CLIs. Unvalidated on the
axon relay (the remote compiler may bypass local serialization — if the
backend does not support executable serialization JAX silently skips
the cache, so enabling it is harmless); validated on CPU in
tests/test_compile_cache.py.

Reference counterpart: none — torch eagerly builds CUDA kernels and the
reference never compiles whole programs; this cost class is
TPU/XLA-specific, so the mitigation is too.
"""

from __future__ import annotations


def enable_compile_cache(path: str,
                         min_compile_secs: float = 1.0) -> None:
    """Enable the persistent compilation cache at `path`.

    Call BEFORE the first jit compilation (after backend selection is
    fine). min_compile_secs: skip caching trivial programs — keeps the
    cache directory to the handful of multi-second engine programs.
    """
    import os

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
