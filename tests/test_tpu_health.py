"""Staged-diagnosis logic of scripts/tpu_health.py: the parent must
attribute a hang to the right leg from the child's pre-timeout output
(which lives in TimeoutExpired.output, not the drained pipe) and must
not report a CPU fallback as a healthy tunnel."""
import importlib.util
import os

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "tpu_health.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("tpu_health", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run(mod, child_src, timeout="3", monkeypatch=None):
    monkeypatch.setattr(mod, "_CHILD", child_src)
    return mod.main(["--timeout", timeout])


def _run_stuck(mod, child_src, expect, monkeypatch, capsys):
    """Run a sleeps-forever child and return (rc, out) once the probe
    blames `expect`. The stuck-leg children must get their pre-sleep
    prints out BEFORE the probe timeout; on a loaded 1-core host bare
    interpreter startup can exceed 3 s, which misdiagnoses the hang as
    the earlier registration leg (observed in CI). Escalate the timeout
    until the child started in time; a genuine probe-logic bug still
    fails on the final, generous attempt."""
    for t in ("3", "15", "45"):
        rc = _run(mod, child_src, timeout=t, monkeypatch=monkeypatch)
        out = capsys.readouterr().out
        if expect in out:
            return rc, out
    return rc, out


def test_healthy_path(capsys, monkeypatch):
    mod = _load()
    # generous timeout: the child must FINISH here, and bare interpreter
    # startup can exceed 3 s on a loaded CI host (the stuck-leg tests below
    # keep short timeouts — their children sleep past any deadline)
    rc = _run(mod, """
print("interpreter up", flush=True)
print("jax imported", flush=True)
print("devices: fake", flush=True)
print("dispatch + host sync ok", flush=True)
""", timeout="60", monkeypatch=monkeypatch)
    out = capsys.readouterr().out
    assert rc == 0 and "TUNNEL HEALTHY" in out


def test_stuck_in_registration(capsys, monkeypatch):
    mod = _load()
    rc = _run(mod, "import time; time.sleep(60)", monkeypatch=monkeypatch)
    out = capsys.readouterr().out
    assert rc == 2 and "STUCK IN AXON REGISTRATION" in out


def test_stuck_in_claim_uses_pre_timeout_output(capsys, monkeypatch):
    """The pre-timeout prints arrive via TimeoutExpired.output — the probe
    must see them and blame the claim leg, not registration."""
    mod = _load()
    rc, out = _run_stuck(mod, """
import time
print("interpreter up", flush=True)
print("jax imported", flush=True)
time.sleep(120)
""", "STUCK IN POOL CLAIM", monkeypatch, capsys)
    assert rc == 2
    assert "STUCK IN POOL CLAIM" in out and "interpreter up" in out


def test_stuck_in_dispatch(capsys, monkeypatch):
    mod = _load()
    rc, out = _run_stuck(mod, """
import time
print("interpreter up", flush=True)
print("devices: fake", flush=True)
time.sleep(120)
""", "STUCK IN DISPATCH", monkeypatch, capsys)
    assert rc == 2 and "STUCK IN DISPATCH" in out


def test_cpu_fallback_is_not_healthy(capsys, monkeypatch):
    mod = _load()
    rc = _run(mod, """
import sys
print("interpreter up", flush=True)
print("devices: cpu", flush=True)
sys.exit(3)
""", timeout="60", monkeypatch=monkeypatch)
    out = capsys.readouterr().out
    assert rc == 2 and "fell back to CPU" in out
