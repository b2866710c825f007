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
if devs[0].platform == "cpu":
    # axon failed to register and jax fell back to CPU (classic cause: a
    # clobbered PYTHONPATH dropping the sitecustomize) — the probe would
    # otherwise "pass" without ever touching the tunnel
    mark("FALLBACK TO CPU: axon backend not registered — check PYTHONPATH "
         "includes /root/.axon_site and JAX_PLATFORMS")
    sys.exit(3)
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
    # defensively restore the default PYTHONPATH head — the axon
    # sitecustomize lives there, and a calling shell that replaced it
    # would otherwise turn this probe into a CPU no-op (CLAUDE.md)
    axon_site = "/root/.axon_site"
    if os.path.isdir(axon_site):
        parts = env.get("PYTHONPATH", "").split(os.pathsep)
        if axon_site not in parts:
            env["PYTHONPATH"] = os.pathsep.join([axon_site] + [p for p in parts if p])
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
        if proc.returncode == 3:
            print("NOT HEALTHY: probe fell back to CPU (axon unregistered)")
        else:
            print(f"probe exited rc={proc.returncode}")
        return 2
    except subprocess.TimeoutExpired as e:
        proc.kill()
        # the pre-timeout child output lives in the exception, NOT in
        # proc.stdout (communicate() already drained the pipe into its
        # internal buffer); a second communicate() collects the remainder
        out = e.output or ""
        if isinstance(out, bytes):  # TimeoutExpired.output stays bytes on
            out = out.decode(errors="replace")  # some versions despite text=True
        try:
            rest, _ = proc.communicate(timeout=5)
            out += rest or ""
        except Exception:
            pass
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
