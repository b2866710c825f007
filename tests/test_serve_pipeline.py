"""Pipelined dispatch (ServingEngine pipeline_depth > 1): the dispatch
thread launches batch N+1 while a completion thread syncs batch N, so the
device queue stays non-empty across host-side collect/decode windows (and,
on the axon tunnel, across the 1-2 ms per-dispatch round-trip). These
tests pin result parity against the synchronous engine, FIFO future
resolution, per-batch error isolation at both launch and sync time, and
shutdown draining of in-flight batches. The reference serves single-shot
(test/test_huggingface.py); this is beyond-parity serving infrastructure."""
import threading
import time

import numpy as np
import pytest

from tests.test_hf_checkpoint import _build_reference_style_checkpoint

UNNORM = "bridge_orig/1.0.0"


@pytest.fixture(scope="module")
def policy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("serve_pl_ckpt")
    _build_reference_style_checkpoint(d)
    return SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)


def _image(rng, policy):
    s = policy.config.vision.image_size
    return (rng.rand(s, s, 3) * 255).astype(np.uint8)


def test_depth1_has_no_completion_thread(policy):
    from spatialvla_tpu.serve import ServingEngine

    with ServingEngine(policy, max_batch_size=2, pipeline_depth=1) as eng:
        assert eng._completer is None


def test_pipelined_matches_sync_engine(policy):
    """Same request stream through a depth-2 engine and a depth-1 engine:
    identical per-request actions, and every future resolves."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(31)
    images = [_image(rng, policy) for _ in range(6)]
    instrs = [f"task {i}" for i in range(6)]

    def run(depth):
        out = {}
        # max_wait 0 so the stream breaks into several single/small batches
        # and the pipeline actually overlaps consecutive dispatches
        with ServingEngine(
            policy, max_batch_size=2, max_wait_ms=0.0, pipeline_depth=depth
        ) as eng:
            futs = [
                eng.submit(img, t, unnorm_key=UNNORM)
                for img, t in zip(images, instrs)
            ]
            for i, f in enumerate(futs):
                out[i] = f.result(timeout=300)
            stats = eng.stats()
        return out, stats

    sync_out, _ = run(1)
    pipe_out, stats = run(2)
    assert sorted(pipe_out) == list(range(6))
    for i in range(6):
        np.testing.assert_array_equal(
            pipe_out[i]["action_ids"], sync_out[i]["action_ids"]
        )
        np.testing.assert_allclose(pipe_out[i]["actions"], sync_out[i]["actions"])
    assert stats["requests"] == 6 and stats["batches"] >= 2


def test_pipelined_launch_error_isolated(policy):
    """A batch whose launch raises (e.g. tracing failure) fails only its
    own futures; the engine keeps serving subsequent batches."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(33)
    img = _image(rng, policy)
    real = policy._jitted_predict
    calls = {"n": 0}

    def flaky(prefix_len, chunk, padded=False):
        fn = real(prefix_len, chunk, padded)

        def wrapper(*args):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected launch failure")
            return fn(*args)

        return wrapper

    policy._jitted_predict = flaky
    try:
        with ServingEngine(
            policy, max_batch_size=1, max_wait_ms=0.0, pipeline_depth=2
        ) as eng:
            f1 = eng.submit(img, "first", unnorm_key=UNNORM)
            with pytest.raises(RuntimeError, match="injected launch failure"):
                f1.result(timeout=300)
            r2 = eng.predict(img, "second", unnorm_key=UNNORM)
        assert np.isfinite(r2["actions"]).all()
    finally:
        policy._jitted_predict = real


def test_pipelined_sync_error_isolated(policy):
    """A batch whose device sync fails (np.asarray raises in the completion
    thread) fails only its own futures; later batches still resolve."""
    from spatialvla_tpu.serve import ServingEngine

    class Poison:
        def __array__(self, *a, **k):
            raise RuntimeError("injected sync failure")

    rng = np.random.RandomState(34)
    img = _image(rng, policy)
    real = policy._jitted_predict
    calls = {"n": 0}

    def flaky(prefix_len, chunk, padded=False):
        fn = real(prefix_len, chunk, padded)

        def wrapper(*args):
            calls["n"] += 1
            if calls["n"] == 1:
                return Poison()
            return fn(*args)

        return wrapper

    policy._jitted_predict = flaky
    try:
        with ServingEngine(
            policy, max_batch_size=1, max_wait_ms=0.0, pipeline_depth=2
        ) as eng:
            f1 = eng.submit(img, "poisoned", unnorm_key=UNNORM)
            f2 = eng.submit(img, "clean", unnorm_key=UNNORM)
            with pytest.raises(RuntimeError, match="injected sync failure"):
                f1.result(timeout=300)
            r2 = f2.result(timeout=300)
        assert np.isfinite(r2["actions"]).all()
    finally:
        policy._jitted_predict = real


def test_pipelined_shutdown_drains_inflight(policy):
    """shutdown() resolves every already-submitted future, including
    batches sitting in the completion queue."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(35)
    images = [_image(rng, policy) for _ in range(4)]
    eng = ServingEngine(
        policy, max_batch_size=1, max_wait_ms=0.0, pipeline_depth=2
    )
    futs = [
        eng.submit(img, f"task {i}", unnorm_key=UNNORM)
        for i, img in enumerate(images)
    ]
    eng.shutdown()
    for f in futs:
        r = f.result(timeout=300)
        assert np.isfinite(r["actions"]).all()
    assert eng.stats()["requests"] == 4
    with pytest.raises(RuntimeError):
        eng.submit(images[0], "late", unnorm_key=UNNORM)


def test_pipelined_concurrent_clients(policy):
    """Threaded closed-loop clients against a depth-2 engine: all resolve,
    counts add up, latency stats populate."""
    from spatialvla_tpu.serve import ServingEngine

    rng = np.random.RandomState(36)
    images = [_image(rng, policy) for _ in range(8)]
    results = {}
    with ServingEngine(
        policy, max_batch_size=4, max_wait_ms=10.0, pipeline_depth=3
    ) as eng:

        def client(i):
            results[i] = eng.predict(images[i], f"task {i}", unnorm_key=UNNORM)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        stats = eng.stats()
    assert sorted(results) == list(range(8))
    for r in results.values():
        assert np.isfinite(r["actions"]).all()
    assert stats["requests"] == 8
    assert stats["latency_ms_p50"] is not None


def test_admission_shedding_max_queue(policy):
    """With max_queue set, submits beyond the bound raise EngineOverloaded
    (HTTP 503 at the front-end) instead of queueing unboundedly; admitted
    requests still resolve and the shed counter records the rejections."""
    from spatialvla_tpu.serve import EngineOverloaded, ServingEngine

    rng = np.random.RandomState(41)
    img = _image(rng, policy)
    eng = ServingEngine(
        policy, max_batch_size=1, max_wait_ms=0.0, pipeline_depth=1,
        max_queue=1,
    )
    try:
        # occupy the dispatch thread: the first request compiles/executes
        # while we flood the admission queue
        futs = [eng.submit(img, "task 0", unnorm_key=UNNORM)]
        shed = 0
        for i in range(1, 40):
            try:
                futs.append(eng.submit(img, f"task {i}", unnorm_key=UNNORM))
            except EngineOverloaded:
                shed += 1
        assert shed > 0, "queue never filled — bound not enforced"
        for f in futs:
            r = f.result(timeout=300)
            assert np.isfinite(r["actions"]).all()
        assert eng.stats()["shed"] == shed
    finally:
        eng.shutdown()


def test_request_deadline_expires_stale_frames(policy):
    """A request whose deadline_ms elapses before dispatch fails with
    RequestExpired; fresh requests keep serving. (Robot-loop semantics:
    a stale action is worse than none.)"""
    import time as _time

    from spatialvla_tpu.serve import RequestExpired, ServingEngine

    rng = np.random.RandomState(42)
    img = _image(rng, policy)
    eng = ServingEngine(policy, max_batch_size=1, max_wait_ms=0.0,
                        pipeline_depth=1)
    try:
        # head-of-line request occupies the dispatcher; the stale one ages
        # out behind it
        f_head = eng.submit(img, "head of line", unnorm_key=UNNORM)
        f_stale = eng.submit(img, "stale frame", unnorm_key=UNNORM,
                             deadline_ms=0.01)
        _time.sleep(0.05)  # guarantee the deadline passes before dispatch
        with pytest.raises(RequestExpired):
            f_stale.result(timeout=300)
        assert np.isfinite(f_head.result(timeout=300)["actions"]).all()
        fresh = eng.predict(img, "fresh frame", unnorm_key=UNNORM,
                            deadline_ms=60_000.0)
        assert np.isfinite(fresh["actions"]).all()
        assert eng.stats()["expired"] == 1
    finally:
        eng.shutdown()
