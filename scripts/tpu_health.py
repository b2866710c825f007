"""Staged TPU-tunnel health probe (axon relay).

The axon backend registers via sitecustomize at interpreter start, so a
dead relay makes EVERY python process hang before main() — which looks
identical to a dead backend, a wedged pool, or a slow claim. This probe
separates the stages with per-stage timestamps and hard timeouts so an
operator (or the next agent session) can tell which leg is stuck:

  stage 1  interpreter + axon registration (sitecustomize dial)
  stage 2  jax.devices() (PJRT client / pool claim)
  stage 3  one tiny jit matmul dispatched + host-synced

Usage:
    python scripts/tpu_health.py [--timeout 120]

Exit codes: 0 healthy, 2 + a one-line diagnosis otherwise. Runs itself in
a child process (the parent must NOT import jax: a hung registration in
the parent would turn the health check into the hang it diagnoses).
"""
import argparse
import os
import subprocess
import sys
import time

_CHILD = r"""
import sys, time
t0 = time.time()
def mark(stage):
    print(f"[{time.time()-t0:7.2f}s] {stage}", flush=True)
mark("interpreter up (sitecustomize/axon registration done)")
import jax
mark("jax imported")
devs = jax.devices()
mark(f"devices: {devs}")
import jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.bfloat16))
v = float(np.asarray(y)[0, 0])
mark(f"dispatch + host sync ok (value {v})")
"""


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=120.0)
    args = ap.parse_args(argv)

    env = dict(os.environ)
    # never strip the default PYTHONPATH — the axon sitecustomize lives
    # there (CLAUDE.md: replacing it looks exactly like a dead tunnel)
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", _CHILD], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        out, _ = proc.communicate(timeout=args.timeout)
        print(out, end="")
        if proc.returncode == 0:
            print(f"TUNNEL HEALTHY ({time.time()-t0:.1f}s end to end)")
            return 0
        print(f"probe exited rc={proc.returncode}")
        return 2
    except subprocess.TimeoutExpired:
        proc.kill()
        out = proc.stdout.read() if proc.stdout else ""
        print(out, end="")
        if "interpreter up" not in out:
            print(f"STUCK IN AXON REGISTRATION (> {args.timeout:.0f}s): the "
                  "relay is not answering the sitecustomize dial — tunnel "
                  "down/wedged. Nothing python-side will work; wait it out.")
        elif "devices:" not in out:
            print(f"STUCK IN POOL CLAIM (> {args.timeout:.0f}s): relay "
                  "answered but no chip grant — pool busy or grant leg "
                  "wedged (a killed-mid-op client can cause this; it "
                  "usually clears in minutes).")
        else:
            print(f"STUCK IN DISPATCH (> {args.timeout:.0f}s): claim ok but "
                  "the program never retired — likely a wedged executor; "
                  "retry after a few minutes.")
        return 2


if __name__ == "__main__":
    sys.exit(main())
