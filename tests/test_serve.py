"""Serving engine (spatialvla_tpu/serve): batch assembly math, dispatch
plumbing parity against a direct call on the identical assembled batch,
per-request unnorm_key decoding, and batching/shutdown behavior — all on
the real tiny policy (reference-style fabricated checkpoint). The
reference has no serving stack (test/test_huggingface.py is single-shot);
this is beyond-parity infrastructure."""
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

UNNORM = "bridge_orig/1.0.0"


@pytest.fixture(scope="module")
def policy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("serve_ckpt")
    _build_reference_style_checkpoint(d)
    return SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)


def _image(rng, policy):
    s = policy.config.vision.image_size
    return (rng.rand(s, s, 3) * 255).astype(np.uint8)


def _requests(policy, instructions):
    from spatialvla_tpu.serve.engine import _Request

    rng = np.random.RandomState(3)
    reqs = []
    for instr in instructions:
        inputs = policy.processor(_image(rng, policy), instr, unnorm_key=UNNORM)
        reqs.append(
            _Request(
                ids=np.asarray(inputs["input_ids"]),
                pixel_values=np.asarray(inputs["pixel_values"]),
                intrinsic=np.asarray(inputs["intrinsic"]),
                unnorm_key=UNNORM,
            )
        )
    return reqs


def test_assemble_batch_bucketing(policy):
    """T rounds up to the pad multiple, B to the next batch bucket, filler
    rows replicate request 0, and every row's mask covers exactly its
    prompt."""
    from spatialvla_tpu.serve import assemble_batch

    reqs = _requests(policy, ["go", "pick up the green cup", "push left"])
    lens = [r.ids.shape[1] for r in reqs]
    ids, attn, px, intr = assemble_batch(
        reqs, pad_id=policy.processor.text_tokenizer.pad_id,
        prompt_pad_multiple=16, batch_buckets=(1, 2, 4, 8),
    )
    assert ids.shape[0] == 4 and ids.shape[1] % 16 == 0
    assert ids.shape[1] >= max(lens) and ids.shape[1] - max(lens) < 16
    for i, r in enumerate(reqs):
        t = lens[i]
        np.testing.assert_array_equal(ids[i, :t], r.ids[0])
        assert attn[i, :t].all() and not attn[i, t:].any()
    np.testing.assert_array_equal(ids[3], ids[0])  # filler row
    assert px.shape[0] == 4 and intr.shape[0] == 4


def test_engine_matches_direct_batched_call(policy):
    """Engine results (futures, per-request decode, filler-row dropping)
    are exactly what a direct pad-aware predict on the identical assembled
    batch produces — the engine adds plumbing, not numerics."""
    from spatialvla_tpu.serve import ServingEngine, assemble_batch

    instrs = ["go", "pick up the green cup", "push the bowl left"]
    reqs = _requests(policy, instrs)
    ids, attn, px, intr = assemble_batch(
        reqs, pad_id=policy.processor.text_tokenizer.pad_id,
        prompt_pad_multiple=16,
    )
    fn = policy._jitted_predict(
        ids.shape[1], policy.processor.action_chunk_size, padded=True
    )
    generated = np.asarray(
        fn(policy.params, jnp.asarray(ids), jnp.asarray(px),
           jnp.asarray(intr), jnp.asarray(attn))
    )
    expected = [
        policy.processor.decode_actions(generated[i : i + 1], unnorm_key=UNNORM)
        for i in range(len(reqs))
    ]

    rng = np.random.RandomState(3)  # same stream as _requests
    images = [_image(rng, policy) for _ in instrs]
    with ServingEngine(policy, max_batch_size=4, max_wait_ms=500.0) as engine:
        futs = []
        for img, instr in zip(images, instrs):
            futs.append(engine.submit(img, instr, unnorm_key=UNNORM))
        results = [f.result(timeout=120) for f in futs]
        stats = engine.stats()

    for res, exp in zip(results, expected):
        np.testing.assert_array_equal(res["action_ids"], exp["action_ids"][0])
        np.testing.assert_allclose(res["actions"], exp["actions"][0])
    # the 500 ms window must have coalesced the burst into one batch
    assert stats["batches"] == 1 and stats["requests"] == 3
    assert stats["mean_batch_occupancy"] == 3.0


def test_engine_per_request_unnorm_keys(policy):
    """Requests against different datasets batch together; each decodes
    with its own statistics."""
    from spatialvla_tpu.serve import ServingEngine

    stats = policy.processor.statistics
    scaled = {
        "action": dict(
            stats[UNNORM]["action"],
            q01=(np.asarray(stats[UNNORM]["action"]["q01"]) * 10).tolist(),
            q99=(np.asarray(stats[UNNORM]["action"]["q99"]) * 10).tolist(),
        )
    }
    stats["scaled/1.0.0"] = scaled
    try:
        rng = np.random.RandomState(7)
        img = _image(rng, policy)
        with ServingEngine(policy, max_batch_size=2, max_wait_ms=500.0) as eng:
            f1 = eng.submit(img, "lift", unnorm_key=UNNORM)
            f2 = eng.submit(img, "lift", unnorm_key="scaled/1.0.0")
            r1, r2 = f1.result(timeout=120), f2.result(timeout=120)
        # identical rows in one batch -> identical tokens, different unnorm
        np.testing.assert_array_equal(r1["action_ids"], r2["action_ids"])
        mask = np.asarray(stats[UNNORM]["action"]["mask"], dtype=bool)
        assert not np.allclose(r1["actions"][:, mask], r2["actions"][:, mask])
    finally:
        stats.pop("scaled/1.0.0")


def test_warmup_buckets_precompiles_serving_programs(policy):
    """warmup_buckets must populate the policy's predict cache with one
    padded program per (padded-T, B) bucket, so a fresh engine serves its
    first request without compiling."""
    from spatialvla_tpu.serve import ServingEngine, warmup_buckets

    policy._predict_cache.clear()
    rng = np.random.RandomState(5)
    warmup_buckets(
        policy, sample_image=_image(rng, policy),
        instructions=("go", "pick up the green cup"),
        prompt_pad_multiple=16, batch_buckets=(1, 2),
        unnorm_key=UNNORM,
    )
    warmed = set(policy._predict_cache)
    assert warmed, "warmup compiled nothing"
    assert all(key[2] for key in warmed)  # all padded-path programs
    # a request whose padded length matches a warmed bucket adds no program
    with ServingEngine(policy, max_batch_size=1, max_wait_ms=1.0) as eng:
        eng.predict(_image(rng, policy), "go", unnorm_key=UNNORM)
    assert set(policy._predict_cache) == warmed


def test_http_front_end_end_to_end(policy):
    """scripts/serve.py over a live socket: concurrent POST /predict
    clients coalesce into batched dispatches, /stats and /health respond,
    and malformed requests return a 500 without killing the server."""
    import importlib.util
    import json
    import os
    import urllib.request
    from http.server import ThreadingHTTPServer

    from spatialvla_tpu.serve import ServingEngine

    spec = importlib.util.spec_from_file_location(
        "serve_script",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "serve.py"),
    )
    serve_script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_script)

    rng = np.random.RandomState(21)
    s = policy.config.vision.image_size
    with ServingEngine(policy, max_batch_size=4, max_wait_ms=200.0) as engine:
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
                    with urllib.request.urlopen(req, timeout=300) as r:
                        return r.status, json.loads(r.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            results = {}

            def client(i):
                results[i] = post("/predict", {
                    "image": (rng.rand(s, s, 3) * 255).astype(np.uint8).tolist(),
                    "instruction": f"task {i}",
                    "unnorm_key": UNNORM,
                })

            threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=300)
            assert sorted(results) == [0, 1, 2]
            chunk = policy.processor.action_chunk_size
            for code, body in results.values():
                assert code == 200
                assert np.asarray(body["actions"]).shape == (chunk, 7)
                assert body["latency_ms"] > 0

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30
            ) as r:
                assert json.loads(r.read()) == {"ok": True}
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30
            ) as r:
                stats = json.loads(r.read())
            assert stats["requests"] == 3
            # the 200 ms window must have batched the burst (<= 2 dispatches
            # even if one client raced ahead of the others)
            assert stats["batches"] <= 2

            code, body = post("/predict", {"instruction": "no image"})
            assert code == 500 and "error" in body
            # server survives the bad request
            code, body = post("/predict", {
                "image": (rng.rand(s, s, 3) * 255).astype(np.uint8).tolist(),
                "instruction": "after error",
                "unnorm_key": UNNORM,
            })
            assert code == 200
        finally:
            server.shutdown()
            server.server_close()


def test_engine_mixed_observation_shapes_split_batches(policy):
    """A multi-view request (list of images -> (1, k, H, W, 3) pixels)
    cannot share a batch with single-view requests: the engine's shape
    check holds it over into its own dispatch, and both still resolve."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(17)
    img = _image(rng, policy)
    with ServingEngine(policy, max_batch_size=4, max_wait_ms=300.0) as eng:
        f1 = eng.submit(img, "single view", unnorm_key=UNNORM)
        f2 = eng.submit([img, _image(rng, policy)], "two views",
                        unnorm_key=UNNORM)
        r1 = f1.result(timeout=300)
        r2 = f2.result(timeout=300)
        stats = eng.stats()
    chunk = policy.processor.action_chunk_size
    assert r1["actions"].shape == (chunk, 7)
    assert r2["actions"].shape == (chunk, 7)
    assert np.isfinite(r1["actions"]).all() and np.isfinite(r2["actions"]).all()
    # incompatible observation shapes must not coalesce
    assert stats["batches"] == 2 and stats["requests"] == 2


def test_engine_threaded_submit_and_shutdown(policy):
    """Concurrent client threads all get results; shutdown drains; submit
    after shutdown fails loudly."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(11)
    images = [_image(rng, policy) for _ in range(5)]
    engine = ServingEngine(policy, max_batch_size=4, max_wait_ms=20.0)
    results = {}

    def client(i):
        results[i] = engine.predict(images[i], f"task {i}", unnorm_key=UNNORM)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    engine.shutdown()

    assert sorted(results) == list(range(5))
    chunk = policy.processor.action_chunk_size
    for r in results.values():
        assert r["actions"].shape == (chunk, 7)
        assert np.isfinite(r["actions"]).all()
    assert engine.stats()["requests"] == 5
    with pytest.raises(RuntimeError):
        engine.submit(images[0], "late", unnorm_key=UNNORM)
