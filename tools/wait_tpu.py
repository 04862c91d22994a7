"""Block until the TPU backend actually EXECUTES, or a deadline passes.

    python tools/wait_tpu.py [max_wait_s=2400]

The axon-tunneled runtime wedges after client disconnects (even clean
exits): `jax.devices()` answers while every execution hangs, and the
queue drains on its own after minutes to ~an hour (tools/
NOTES_r4_forest_hang.md).  Each probe runs a tiny reduction in a
THROWAWAY subprocess with a 90 s timeout so this process can never be
wedged itself.  Exit 0 as soon as a probe succeeds; exit 1 at deadline.
"""
import subprocess
import sys
import time

MAX_WAIT = float(sys.argv[1]) if len(sys.argv) > 1 else 2400.0
PROBE_TIMEOUT = 90
SLEEP_BETWEEN = 20

t0 = time.time()
attempt = 0
while time.time() - t0 < MAX_WAIT:
    attempt += 1
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "assert float(jnp.arange(8.0).sum()) == 28.0; "
             "print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT)
        if r.returncode == 0 and r.stdout.strip():
            print(f"[wait_tpu] up after {time.time() - t0:.0f}s "
                  f"(attempt {attempt}): {r.stdout.strip()}", flush=True)
            sys.exit(0)
        print(f"[wait_tpu] attempt {attempt}: rc={r.returncode} "
              f"{r.stderr.strip()[-200:]}", file=sys.stderr, flush=True)
    except subprocess.TimeoutExpired:
        print(f"[wait_tpu] attempt {attempt}: probe timed out "
              f"({time.time() - t0:.0f}s elapsed)", file=sys.stderr,
              flush=True)
    time.sleep(SLEEP_BETWEEN)
print(f"[wait_tpu] deadline after {time.time() - t0:.0f}s", flush=True)
sys.exit(1)
