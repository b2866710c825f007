"""End-to-end smoke of scripts/bench_serve.py in --tiny mode: the serving
load benchmark must drive concurrent closed-loop clients through the
batching engine and report a complete metrics line (the reference has no
serving stack; this pins the beyond-parity measurement harness)."""
import importlib.util
import os

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "bench_serve.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("bench_serve", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_serve_tiny_end_to_end(capsys):
    bench = _load()
    result = bench.main([
        "--tiny", "--clients", "3", "--requests", "2",
        "--max_batch", "4", "--max_wait_ms", "30",
    ])
    assert result["requests"] == 6
    assert result["throughput_rps"] > 0
    assert result["actions_per_sec"] >= result["throughput_rps"]  # chunk >= 1
    assert result["latency_ms_p50"] is not None
    assert result["latency_ms_p95"] >= result["latency_ms_p50"]
    assert 1.0 <= result["mean_batch_occupancy"] <= 4.0
    assert 0.0 <= result["pad_fraction"] < 1.0
    # the printed line is the JSON the driver/judge reads
    out = capsys.readouterr().out.strip().splitlines()[-1]
    import json

    assert json.loads(out) == result


def test_bench_serve_tiny_split_end_to_end(capsys):
    """--split drives the split-phase engine (persistent decode slots):
    the run completes with the split-specific occupancy columns and the
    per-request math intact."""
    bench = _load()
    result = bench.main([
        "--tiny", "--split", "--bits", "8", "--clients", "3",
        "--requests", "2", "--max_batch", "3", "--pad_multiple", "64",
        "--max_prompt_len", "128", "--decode_block", "2",
    ])
    assert result["requests"] == 6
    assert result["throughput_rps"] > 0
    assert result["decode_dispatches"] > 0
    assert 0.0 < result["mean_slot_occupancy"] <= 3.0
    assert result["mean_prefill_rows"] >= 1.0
    import json

    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out) == result


def test_bench_serve_overload_mode_counts_drops(capsys):
    bench = _load()
    # a sub-microsecond dispatch deadline expires every request
    # deterministically: the run must complete (no hang, no crash), report
    # the overload columns, and account for every submitted request
    result = bench.main([
        "--tiny", "--clients", "2", "--requests", "2",
        "--max_batch", "4", "--max_wait_ms", "5",
        "--deadline_ms", "0.0001",
    ])
    assert result["requests"] == 4
    assert result["completed"] + result["shed"] + result["expired"] == 4
    assert result["expired"] > 0
    if result["completed"] == 0:
        assert result["latency_ms_p50"] is None
