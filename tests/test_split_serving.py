"""Split-phase continuous-batching engine (serve/split_engine.py): token
parity against the monolithic predict path, staggered slot admission,
per-request unnorm keys, and construction guards — on the real tiny policy
(reference-style fabricated checkpoint), with the fused decode kernel in
interpret mode (CPU).

Parity matters because the split engine rebuilds serving from different
programs: a standalone prefill (prefill_for_serving) emitting cache rows
sized to the persistent state, device-side slot admission, and a
decode-steps program over ALL slots with per-row cache positions. The
monolithic path is itself pinned token-identical to the HF reference
decode (tests/test_vla_golden_reference.py), so equality here chains the
split engine to the reference contract."""
import dataclasses
import threading
import time

import numpy as np
import pytest

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

UNNORM = "bridge_orig/1.0.0"

INSTRUCTIONS = [
    "go",
    "pick up the green cup",
    "push the bowl to the left side",
    "close the drawer",
    "stack the red block on the blue block",
]


@pytest.fixture(scope="module")
def qpolicy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("split_ckpt")
    _build_reference_style_checkpoint(d)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)
    # widen the window so the serving cache fits it (the fused kernel treats
    # window and global layers identically below the window, as at 4b scale)
    policy.config = dataclasses.replace(
        policy.config,
        text=dataclasses.replace(policy.config.text, sliding_window=512),
    )
    return policy.quantize(8, vision_bits=None)


def _images(policy, n, seed=3):
    rng = np.random.RandomState(seed)
    s = policy.config.vision.image_size
    return [(rng.rand(s, s, 3) * 255).astype(np.uint8) for _ in range(n)]


def _engine(policy, **kw):
    from spatialvla_tpu.serve import SplitServingEngine

    kw.setdefault("n_slots", 3)
    # pad multiple 64 puts every pool prompt (<= 55 tokens) in ONE padded-T
    # bucket, so the expected side below sees the exact program shapes the
    # engine dispatches
    kw.setdefault("max_prompt_len", 64)
    kw.setdefault("prompt_pad_multiple", 64)
    kw.setdefault("prefill_buckets", (1, 2))
    kw.setdefault("decode_block", 2)
    return SplitServingEngine(policy, **kw)


def _expected_fused(policy, img, instr, T_pad=64, unnorm_key=UNNORM):
    """Monolithic padded predict through the SAME decode kernel the split
    engine uses (fused, interpret on CPU). The XLA decode path is NOT
    bit-equal to the fused kernel in general (different reduction orders;
    on this near-flat random tiny model that flips argmax after a few
    tokens), so the parity contract is split-engine == monolithic-fused —
    and monolithic-fused == XLA is pinned separately at matched shapes by
    tests/test_spatialvla.py::test_padded_fused_decode_matches_xla_path."""
    import functools

    import jax.numpy as jnp

    from spatialvla_tpu.models import spatialvla
    from spatialvla_tpu.ops import decode_step as ds

    inputs = policy.processor(img, instr, unnorm_key=unnorm_key)
    ids = np.asarray(inputs["input_ids"])
    pad_id = policy.processor.text_tokenizer.pad_id
    pids = np.full((1, T_pad), pad_id, np.int32)
    attn = np.zeros((1, T_pad), np.int32)
    pids[0, : ids.shape[1]] = ids[0]
    attn[0, : ids.shape[1]] = 1
    orig = ds.fused_decode_step
    ds.fused_decode_step = functools.partial(orig, interpret=True)
    try:
        gen, margins = spatialvla.generate_greedy(
            policy.params, policy.config, jnp.asarray(pids),
            pixel_values=jnp.asarray(inputs["pixel_values"]),
            intrinsic=jnp.asarray(inputs["intrinsic"]),
            attention_mask=jnp.asarray(attn),
            max_new_tokens=3 * policy.processor.action_chunk_size,
            token_range=(
                policy.config.action_token_begin_idx,
                policy.config.spatial_token_num,
            ),
            use_fused_decode=True,
            kv_bits=getattr(policy, "kv_bits", None),
            return_margins=True,
        )
    finally:
        ds.fused_decode_step = orig
    out = policy.processor.decode_actions(np.asarray(gen), unnorm_key=unnorm_key)
    return {"actions": out["actions"][0], "action_ids": out["action_ids"][0],
            "margins": np.asarray(margins, np.float32)[0]}


# a conditioning flip is only explainable as fusion-rounding noise when the
# monolithic argmax margin at the flip step is a near-tie; larger flips are
# real numeric divergences and must fail (round-4 VERDICT directive 3: the
# 'near-flat logits' explanation, measured)
FLIP_MARGIN_EPS = 0.5


def _assert_flip_margin_small(res_ids, exp):
    got = np.asarray(res_ids)
    want = np.asarray(exp["action_ids"])
    if (got == want).all():
        return True
    t = int(np.argmax(got != want))
    margin = float(exp["margins"][t])
    assert margin < FLIP_MARGIN_EPS, (
        f"split-vs-monolithic flip at step {t} with argmax margin "
        f"{margin:.4f} >= {FLIP_MARGIN_EPS}: not a near-tie — a real "
        f"numeric divergence ({got} vs {want})"
    )
    return False


def test_split_programs_match_monolithic_fused(qpolicy):
    """At matched program shapes (one slot, one-row prefill, the same
    padded T and cache length), the split engine's prefill + persistent-
    state decode reproduce the monolithic padded fused-decode path.

    Semantics are identical; what CAN differ on CPU is XLA fusion of the
    inter-kernel glue (embed gather / logits dequant) inside the monolithic
    scan body vs the standalone decode program — deterministic rounding
    that flips near-tie argmax on this random near-flat model, after which
    greedy conditioning diverges arbitrarily (the quant-gate flatness
    caveat, NOTES_ROUND3). So the sound CPU assertions are: the FIRST
    token exact for every request (prefill + head numerics, which have no
    conditioning), and full sequences exact whenever no flip occurs (the
    majority — asserted as at least one full 12/12 match). EXACT
    split-vs-monolithic sequence parity at serving shapes is asserted on
    the REAL chip by scripts/bench_serve.py --parity_check every bench
    run, and exact scheduling-invariance is pinned below."""
    images = _images(qpolicy, 3)
    full_matches = 0
    with _engine(
        qpolicy, n_slots=1, prefill_buckets=(1,), decode_block=1
    ) as engine:
        for img, instr in zip(images, INSTRUCTIONS[:3]):
            res = engine.predict(img, instr, unnorm_key=UNNORM)
            exp = _expected_fused(qpolicy, img, instr)
            assert res["action_ids"][0] == exp["action_ids"][0]
            # any flip must sit at a near-tie margin (measured, not assumed)
            full_matches += int(_assert_flip_margin_small(res["action_ids"], exp))
    assert full_matches >= 1


def test_split_engine_scheduling_invariance(qpolicy):
    """Per-request tokens are invariant to scheduling: 5 requests submitted
    concurrently (co-decoding through shared dispatches, slots reused as
    rows retire) equal the same 5 requests submitted one-at-a-time through
    the same engine configuration. Every program shape is pinned equal
    across the two runs (prefill always at bucket 2, decode always over all
    3 slots), so any difference would be admission/retirement bookkeeping
    corrupting a row — the failure mode continuous batching must exclude."""
    images = _images(qpolicy, len(INSTRUCTIONS))

    def run(serial):
        with _engine(qpolicy, prefill_buckets=(2,)) as engine:
            if serial:
                out = [
                    engine.predict(img, instr, unnorm_key=UNNORM)
                    for img, instr in zip(images, INSTRUCTIONS)
                ]
                stats = engine.stats()
            else:
                futs = [
                    engine.submit(img, instr, unnorm_key=UNNORM)
                    for img, instr in zip(images, INSTRUCTIONS)
                ]
                out = [f.result(timeout=600) for f in futs]
                stats = engine.stats()
        return out, stats

    serial, _ = run(serial=True)
    concurrent, stats = run(serial=False)
    for a, b in zip(serial, concurrent):
        np.testing.assert_array_equal(a["action_ids"], b["action_ids"])
        np.testing.assert_allclose(a["actions"], b["actions"])
    assert stats["requests"] == len(INSTRUCTIONS)
    # 5 requests through 3 slots: some decode dispatch must have co-decoded
    # more than one active slot, or batching never happened
    assert stats["mean_slot_occupancy"] > 1.0


def test_split_engine_staggered_admission(qpolicy):
    """A second wave submitted while the first is mid-decode joins free
    slots of the RUNNING batch; results still match the serial baseline."""
    images = _images(qpolicy, 4, seed=11)
    instrs = INSTRUCTIONS[:4]
    with _engine(qpolicy, n_slots=2, prefill_buckets=(2,)) as baseline:
        expected = [
            baseline.predict(img, instr, unnorm_key=UNNORM)
            for img, instr in zip(images, instrs)
        ]
    with _engine(qpolicy, n_slots=2, prefill_buckets=(2,)) as engine:
        futs = [
            engine.submit(images[i], instrs[i], unnorm_key=UNNORM)
            for i in range(2)
        ]
        time.sleep(0.3)  # first wave is decoding (interpret mode is slow)
        futs += [
            engine.submit(images[i], instrs[i], unnorm_key=UNNORM)
            for i in range(2, 4)
        ]
        results = [f.result(timeout=600) for f in futs]
    for res, exp in zip(results, expected):
        np.testing.assert_array_equal(res["action_ids"], exp["action_ids"])


def test_split_engine_prefill_deferral(qpolicy):
    """prefill_min_free (batch-forming hysteresis) preserves token parity
    and liveness: with the threshold at n_slots, prefill only happens when
    every slot is free (waves), yet all requests complete and match the
    immediate-admission engine. Exercises the no-deadlock argument in
    _dispatch_loop (active slots always advance; an idle engine admits
    unconditionally)."""
    images = _images(qpolicy, len(INSTRUCTIONS), seed=17)

    def run(min_free):
        with _engine(
            qpolicy, prefill_buckets=(2,), prefill_min_free=min_free
        ) as engine:
            futs = [
                engine.submit(img, instr, unnorm_key=UNNORM)
                for img, instr in zip(images, INSTRUCTIONS)
            ]
            out = [f.result(timeout=600) for f in futs]
            return out, engine.stats()

    base, _ = run(0)
    deferred, stats = run(3)  # = n_slots: admit only into an empty batch
    for a, b in zip(base, deferred):
        np.testing.assert_array_equal(a["action_ids"], b["action_ids"])
    assert stats["requests"] == len(INSTRUCTIONS)


def test_split_engine_idle_burst_gather(qpolicy):
    """prefill_wait_ms: an idle engine holds its first arrival to gather a
    client burst into ONE prefill group (here: 2 requests, bucket 2, one
    prefill batch), with tokens identical to the no-wait engine. Liveness:
    a lone request still completes after the window closes."""
    images = _images(qpolicy, 2, seed=23)

    def run(wait_ms):
        with _engine(qpolicy, n_slots=2, prefill_wait_ms=wait_ms) as engine:
            futs = [
                engine.submit(images[i], INSTRUCTIONS[i], unnorm_key=UNNORM)
                for i in range(2)
            ]
            out = [f.result(timeout=600) for f in futs]
            return out, engine.stats()

    base, _ = run(0)
    gathered, stats = run(10_000)  # >> the submit stagger
    for a, b in zip(base, gathered):
        np.testing.assert_array_equal(a["action_ids"], b["action_ids"])
    # the burst formed one bucket-2 prefill batch instead of two singles
    assert stats["prefill_batches"] == 1
    assert stats["mean_prefill_rows"] == 2.0
    # liveness: a single request is admitted once the window expires
    with _engine(qpolicy, n_slots=2, prefill_wait_ms=50) as engine:
        res = engine.predict(images[0], INSTRUCTIONS[0], unnorm_key=UNNORM)
    np.testing.assert_array_equal(res["action_ids"], base[0]["action_ids"])


def test_split_engine_reset_stats(qpolicy):
    """reset_stats() zeroes the measured-window counters (bench_serve calls
    it after warmup/parity) without touching engine state: a request served
    after the reset is counted from zero and still decodes correctly."""
    images = _images(qpolicy, 1, seed=29)
    with _engine(qpolicy) as engine:
        exp = engine.predict(images[0], "go", unnorm_key=UNNORM)
        assert engine.stats()["requests"] == 1
        engine.reset_stats()
        s = engine.stats()
        assert s["requests"] == 0 and s["decode_dispatches"] == 0
        assert s["latency_ms_p50"] is None
        res = engine.predict(images[0], "go", unnorm_key=UNNORM)
        assert engine.stats()["requests"] == 1
    np.testing.assert_array_equal(res["action_ids"], exp["action_ids"])


def test_split_engine_per_request_unnorm_keys(qpolicy):
    """Co-batched requests decode with their own statistics."""
    stats = qpolicy.processor.statistics
    key2 = "fractal_like/1.0.0"
    if key2 not in stats:
        base = stats[UNNORM]["action"]
        stats[key2] = {
            "action": {
                "q01": (np.asarray(base["q01"]) * 2).tolist(),
                "q99": (np.asarray(base["q99"]) * 2).tolist(),
                "mask": base["mask"],
            }
        }
    img = _images(qpolicy, 1, seed=5)[0]
    with _engine(qpolicy) as engine:
        fa = engine.submit(img, "go", unnorm_key=UNNORM)
        fb = engine.submit(img, "go", unnorm_key=key2)
        ra, rb = fa.result(timeout=600), fb.result(timeout=600)
    # identical observation -> identical tokens; key2's doubled q01/q99
    # must double the unnormalized actions exactly on the masked dims
    np.testing.assert_array_equal(ra["action_ids"], rb["action_ids"])
    mask = np.asarray(qpolicy.processor.statistics[UNNORM]["action"]["mask"], bool)
    np.testing.assert_allclose(
        rb["actions"][:, mask], 2.0 * ra["actions"][:, mask], rtol=1e-6
    )
    np.testing.assert_allclose(
        rb["actions"][:, ~mask], ra["actions"][:, ~mask], rtol=0
    )


def test_split_engine_warmup_compiles_programs(qpolicy):
    """warmup() pre-compiles prefill/admit/decode; subsequent submits reuse
    the cached programs (no assertion on compile counts — this pins the
    warmup path executes end-to-end and serving still works after it)."""
    images = _images(qpolicy, 1, seed=7)
    with _engine(qpolicy) as baseline:
        exp = baseline.predict(images[0], "go", unnorm_key=UNNORM)
    with _engine(qpolicy) as engine:
        engine.warmup(images[0], ["go", "pick up the green cup"])
        res = engine.predict(images[0], "go", unnorm_key=UNNORM)
    np.testing.assert_array_equal(res["action_ids"], exp["action_ids"])


def test_split_engine_rejects_bf16_policy(tmp_path):
    from spatialvla_tpu.inference import SpatialVLAPolicy
    from spatialvla_tpu.serve import SplitServingEngine

    _build_reference_style_checkpoint(tmp_path)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(tmp_path), param_dtype=None)
    with pytest.raises(ValueError, match="fused-quantized"):
        SplitServingEngine(policy)


def test_split_engine_rejects_overlong_prompt(qpolicy):
    """A prompt padding past max_prompt_len fails ITS submit with guidance
    instead of corrupting the persistent cache."""
    img = _images(qpolicy, 1, seed=9)[0]
    with _engine(qpolicy) as engine:  # max_prompt_len=64
        with pytest.raises(ValueError, match="max_prompt_len"):
            # 69 prompt tokens pad to 128 > 64
            engine.submit(img, "an instruction long enough to pad past the "
                               "tiny cap", unnorm_key=UNNORM)


def test_split_engine_overload_and_deadline(qpolicy):
    """Admission bound sheds (EngineOverloaded); an expired deadline fails
    the request before dispatch (RequestExpired)."""
    from spatialvla_tpu.serve import EngineOverloaded, RequestExpired

    img = _images(qpolicy, 1, seed=13)[0]
    with _engine(qpolicy, max_queue=1) as engine:
        # saturate: the dispatch thread is busy compiling/decoding the
        # first request, so immediate extra submits pile into the queue
        futs = [engine.submit(img, "go", unnorm_key=UNNORM)]
        shed = 0
        try:
            for _ in range(50):
                futs.append(
                    engine.submit(img, "go", unnorm_key=UNNORM,
                                  deadline_ms=0.001)
                )
        except EngineOverloaded:
            shed = 1
        outcomes = []
        for f in futs:
            try:
                f.result(timeout=600)
                outcomes.append("ok")
            except RequestExpired:
                outcomes.append("expired")
        assert outcomes[0] == "ok"
        assert shed or "expired" in outcomes


def test_http_front_end_over_split_engine(qpolicy):
    """scripts/serve.py --engine split over a live socket: the HTTP handler
    is engine-agnostic, so the production split-phase path (serve.py:243-
    262) must serve /predict, /stats (split-engine keys), and /health
    through the same make_handler the monolithic test exercises."""
    import importlib.util
    import json
    import os
    import urllib.request
    from http.server import ThreadingHTTPServer

    spec = importlib.util.spec_from_file_location(
        "serve_script",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "serve.py"),
    )
    serve_script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_script)

    images = _images(qpolicy, 3, seed=29)
    with _engine(qpolicy) as engine:
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), serve_script.make_handler(engine)
        )
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            def post(path, payload):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        return r.status, json.loads(r.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            results = {}

            def client(i):
                results[i] = post("/predict", {
                    "image": images[i].tolist(),
                    "instruction": INSTRUCTIONS[i],
                    "unnorm_key": UNNORM,
                })

            threads = [
                threading.Thread(target=client, args=(i,)) for i in range(3)
            ]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=600)
            assert sorted(results) == [0, 1, 2]
            chunk = qpolicy.processor.action_chunk_size
            for code, body in results.values():
                assert code == 200
                assert np.asarray(body["actions"]).shape == (chunk, 7)

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30
            ) as r:
                assert json.loads(r.read()) == {"ok": True}
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30
            ) as r:
                stats = json.loads(r.read())
            assert stats["requests"] == 3
            # split-engine counters (not the monolithic keys): every request
            # decoded through the persistent slots
            assert stats["decode_dispatches"] > 0
            assert stats["mean_slot_occupancy"] > 0
        finally:
            server.shutdown()
            server.server_close()


def test_u8_pixel_transport_is_exact():
    """The split engine ships processor pixels as uint8 and rescales
    on-device (split_engine._put_pixels): device u8/255 must equal host
    u8/255 bit-for-bit over ALL 256 byte values, or the u8 transport would
    perturb the model inputs vs the monolithic f32 path. Also pins the
    grid check: off-grid f32 pixels must ship as f32, not get quantized."""
    import jax.numpy as jnp

    from spatialvla_tpu.serve.split_engine import _put_pixels

    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    host = u8.astype(np.float32) / 255.0
    dev = np.asarray(jnp.asarray(u8).astype(jnp.float32) / 255.0)
    np.testing.assert_array_equal(dev, host)

    shipped = _put_pixels(host)
    assert shipped.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(shipped), u8)

    off_grid = host + np.float32(1e-4)
    shipped = _put_pixels(off_grid)
    assert shipped.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(shipped), off_grid)


@pytest.fixture(scope="module")
def qpolicy_kv8m4(tmp_path_factory):
    """The mixed serving config (int8 attention/head + int4 MLP + int8 KV
    cache) on the split engine — the exact knob set whose on-chip split run
    crashed in MEASURE_ROUND4 serve_16c_split_mixed while the MONOLITHIC
    engine served it fine (MEASURE_ROUND3 serve_16c_mixed_fixed_sync):
    the split-only programs (prefill-with-kv8 emission, scale admission,
    standalone decode) had zero coverage."""
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("split_ckpt_kv8m4")
    _build_reference_style_checkpoint(d)
    policy = SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)
    policy.config = dataclasses.replace(
        policy.config,
        text=dataclasses.replace(policy.config.text, sliding_window=512),
    )
    return policy.quantize(8, vision_bits=None, mlp_bits=4, kv_bits=8)


def test_split_engine_mixed_kv8_mlp4(qpolicy_kv8m4):
    """kv8+mlp4 split serving: prefill emits int8 cache rows + per-slot
    scales, admission scatters them, and the persistent decode program
    consumes the int8 state — first token exact vs the monolithic fused
    kv8 path per request, full sequences subject to the same near-tie
    caveat as test_split_programs_match_monolithic_fused."""
    policy = qpolicy_kv8m4
    images = _images(policy, 2, seed=31)
    full_matches = 0
    with _engine(
        policy, n_slots=2, prefill_buckets=(1, 2), decode_block=2
    ) as engine:
        futs = [
            engine.submit(images[i], INSTRUCTIONS[i], unnorm_key=UNNORM)
            for i in range(2)
        ]
        results = [f.result(timeout=600) for f in futs]
        stats = engine.stats()
    for i, res in enumerate(results):
        exp = _expected_fused(policy, images[i], INSTRUCTIONS[i])
        assert res["action_ids"][0] == exp["action_ids"][0]
        full_matches += int(_assert_flip_margin_small(res["action_ids"], exp))
    assert full_matches >= 1
    assert stats["requests"] == 2


def test_split_engine_quiet_gap_gather(qpolicy):
    """prefill_quiet_ms: the gather window closes early once arrivals stop
    (cap untouched). Burst case: two back-to-back submits (spacing << quiet
    gap) form ONE prefill batch under a 60 s cap. Early-close case: with the
    same 60 s cap, a second request arriving long after the quiet gap finds
    the first already admitted — TWO prefill batches. Without early close,
    the 60 s cap would have gathered both into one batch, so the split
    proves the quiet gap, not the cap."""
    images = _images(qpolicy, 2, seed=37)
    with _engine(
        qpolicy, n_slots=2, prefill_wait_ms=60_000, prefill_quiet_ms=10_000
    ) as engine:
        futs = [
            engine.submit(images[i], INSTRUCTIONS[i], unnorm_key=UNNORM)
            for i in range(2)
        ]
        [f.result(timeout=600) for f in futs]
        assert engine.stats()["prefill_batches"] == 1
    with _engine(
        qpolicy, n_slots=2, prefill_wait_ms=60_000, prefill_quiet_ms=200
    ) as engine:
        f1 = engine.submit(images[0], INSTRUCTIONS[0], unnorm_key=UNNORM)
        time.sleep(3.0)  # >> the 200 ms quiet gap
        f2 = engine.submit(images[1], INSTRUCTIONS[1], unnorm_key=UNNORM)
        f1.result(timeout=600), f2.result(timeout=600)
        assert engine.stats()["prefill_batches"] == 2
