"""One-shot TPU re-measure after the r3 late-round changes.

Runs, in order, with outputs appended to --out (default
/tmp/r3_remeasure.log):
  1. a relay probe (subprocess, deadline) — aborts cleanly if down
  2. scripts/seal_throughput.py (plain, --kv-int8 --prompt-lookup) —
     picks up the u8 image uploads + fused multiple-choice program
  3. bench.py (headline search p50)
  4. compile-cache A/B: one tiny-but-slow-to-compile program compiled
     cold vs reloaded through --compile-cache, THROUGH THE RELAY's
     remote compiler (answers whether jax's persistent cache applies
     to the axon backend at all)

Run under the repo root with the axon site on the path:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_remeasure.py
Each stage is its own subprocess so a hang/failure in one does not lose
the others' numbers; every stage gets a generous timeout.
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name, cmd, out, timeout, env=None):
    print(f"[{time.strftime('%H:%M:%S')}] stage {name}: {' '.join(cmd)}",
          flush=True)
    out.write(f"\n===== {name} ({time.strftime('%H:%M:%S')}) =====\n")
    out.flush()
    t0 = time.time()
    try:
        r = subprocess.run(cmd, stdout=out, stderr=subprocess.STDOUT,
                           timeout=timeout, env=env or os.environ.copy())
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = "TIMEOUT"
    out.write(f"----- {name}: rc={rc} in {time.time() - t0:.0f}s -----\n")
    out.flush()
    print(f"[{time.strftime('%H:%M:%S')}] stage {name}: rc={rc} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return rc


CACHE_PROBE = r"""
import sys, time
import jax, jax.numpy as jnp
if len(sys.argv) > 1:
    from vstar_tpu.core.compile_cache import enable_compile_cache
    enable_compile_cache(sys.argv[1], min_compile_secs=0.5)
t0 = time.time()

@jax.jit
def blk(x, w):
    for _ in range(12):
        x = jnp.tanh(x @ w) + x
    return x.sum()

out = blk(jnp.ones((256, 2048), jnp.bfloat16),
          jnp.ones((2048, 2048), jnp.bfloat16))
print("sum=", float(out))           # scalar fetch = real sync on relay
print("COMPILE_AND_RUN_S=%.2f" % (time.time() - t0))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/r3_remeasure.log")
    ap.add_argument("--skip-seal", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    # 1. probe
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('PLAT='+jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=150)
        plat = [l for l in p.stdout.splitlines() if l.startswith("PLAT=")]
    except subprocess.TimeoutExpired:
        plat = []
    if not plat or plat[0][5:] != "tpu":
        print(f"relay not available ({plat}) — nothing measured")
        return 1
    print("relay up:", plat[0])

    out = open(args.out, "a")
    out.write(f"\n########## r3_remeasure {time.strftime('%F %T')} "
              f"##########\n")
    py = sys.executable
    scripts = os.path.join(REPO, "scripts")

    if not args.skip_seal:
        run_stage("seal_plain", [py, os.path.join(
            scripts, "seal_throughput.py")], out, 3600)
        run_stage("seal_optins", [py, os.path.join(
            scripts, "seal_throughput.py"), "--kv-int8",
            "--prompt-lookup"], out, 3600)
    if not args.skip_bench:
        run_stage("bench", [py, os.path.join(REPO, "bench.py")], out, 5400)

    # compile-cache A/B through the relay's remote compiler
    cdir = "/tmp/r3_xla_cache"
    run_stage("cache_cold", [py, "-c", CACHE_PROBE, cdir], out, 1200)
    run_stage("cache_warm_new_proc", [py, "-c", CACHE_PROBE, cdir],
              out, 1200)
    run_stage("cache_off_baseline", [py, "-c", CACHE_PROBE], out, 1200)
    out.close()
    print("all stages done ->", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
