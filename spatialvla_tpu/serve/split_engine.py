"""Split-phase continuous-batching engine: persistent decode slots.

The monolithic engine (engine.py) dispatches one predict program per batch:
every batch monolithically re-pays the vision front + prefill and then
decodes at the ARRIVAL group's occupancy — measured 126 actions/sec at 16
clients vs 207.8 device-side at B=16 (MEASURE_ROUND3), because a batch
cannot start decoding until its whole front finishes and new arrivals
cannot join a running decode.

This engine decouples the phases (the reference's own prefill/decode split
over a static cache, /root/reference/model/modeling_gemma2.py:712-720,
extended to continuous batching):

- A PREFILL program (models/spatialvla.py:prefill_for_serving) runs per
  arrival group — vision front + prefix attention + first token — emitting
  cache rows already shaped for the persistent decode state.
- A persistent decode batch of ``n_slots`` rows advances ``decode_block``
  fused decode steps per dispatch (decode_steps_serving over the per-row-
  cache-position kernel, ops/decode_step.py). Newly-prefilled rows are
  admitted into free slots BETWEEN decode dispatches (admit_rows_serving,
  device-side scatter — the prefill output never round-trips the host) and
  retire after exactly 3*chunk tokens.

The decode weight stream (~2 GB/step int8) is therefore amortized over
~n_slots rows regardless of arrival-group size, and an arrival waits at
most one decode dispatch (~decode_block steps) to join — not a whole
front+prefill+decode cycle.

Host/device pipelining: the dispatch thread only launches programs (JAX
dispatch is asynchronous); a completion thread syncs retired rows' token
buffers and resolves futures. Run-ahead is bounded by syncing a tiny
per-dispatch handle once more than ``max_ahead`` dispatches are in flight.

Token parity with the monolithic path is semantically exact (see the
parity note in models/spatialvla.py); tests/test_split_serving.py pins
first-token exactness + exact scheduling-invariance on CPU, and
scripts/bench_serve.py --parity_check pins first-token exactness (all
prompts) on the real chip — exact full sequences when serving real
checkpoint weights, where logit margins rule out fusion-rounding flips.
"""
from __future__ import annotations

import collections
import functools
import queue
import threading
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .engine import (
    EngineOverloaded,
    RequestExpired,
    _Request,
    _round_up,
    _safe_resolve,
)

DEFAULT_PREFILL_BUCKETS = (1, 2, 4, 8, 16)


def _put_pixels(px: np.ndarray, u8: Optional[np.ndarray] = None):
    """Ship pixels device-resident at submit time, on the CLIENT thread.

    The dispatch thread previously paid the host->device image copy inside
    _admit_group, serializing it with decode dispatching: measured 115 ms
    per prefill batch on the tunnel host — 2.07 s of a 6.35 s 64-request
    run with the device idling meanwhile (MEASURE_ROUND4
    serve_16c_split_int8_pad64). Client-side device_put overlaps the
    transfers with everything else, and rides the exact-u8 representation
    when possible: processor pixels are u8/255 grid points (PIL resize
    path), so u8 round-trip is bitwise-lossless at 4x fewer bytes; the
    prefill program converts back with the same f32 divide the host would
    apply (tests/test_split_serving.py pins u8/255 device==host over all
    256 values). Off-grid pixels (the PIL-free bicubic fallback, custom
    callers) ship as f32 unchanged.

    When the processor already carries the exact-u8 form
    (inputs["pixel_values_u8"], processor/image.py:resize_image_u8), pass
    it as `u8` — re-deriving it here (rint + full-array equality compare)
    cost ~2 ms of GIL per submit, which serialized the closed-loop clients'
    resubmission burst and truncated the idle-burst gather groups
    (MEASURE_ROUND4 serve_16c_split_block11_sync: mean 10.67 of 16 rows)."""
    if u8 is not None:
        return jax.device_put(np.ascontiguousarray(u8))
    u8 = np.rint(px * 255.0).astype(np.uint8)
    if np.array_equal(u8.astype(np.float32) / 255.0, px):
        return jax.device_put(u8)
    return jax.device_put(px.astype(np.float32))


class _Programs:
    """Compiled-program cache over one policy: prefill per (T, Bp) bucket,
    one decode program, admit per (bucket, n_real).

    Under a mesh-sharded policy (policy.shard) every program traces inside
    ops/quant.xla_matmuls and the decode uses
    models/spatialvla.xla_decode_step — GSPMD partitions the einsum graphs
    over the model axis (the single-device Pallas kernels would be wrapped
    in all-gathers); the persistent KV state shards over kv heads."""

    def __init__(self, policy, *, n_slots, cache_len, n_tokens, decode_block,
                 kv_bits=None):
        from ..models import spatialvla as model

        self.policy = policy
        self.model = model
        self.n_slots = n_slots
        self.cache_len = cache_len
        self.n_tokens = n_tokens
        self.decode_block = decode_block
        self.kv_bits = kv_bits
        self.mesh = getattr(policy, "mesh", None)
        self.interpret = (
            self.mesh is None and jax.devices()[0].platform == "cpu"
        )
        cfg = policy.config
        self.token_range = (cfg.action_token_begin_idx, cfg.spatial_token_num)
        self._prefill_cache: Dict = {}
        self._admit_cache: Dict = {}
        self._decode = None

    def _trace_ctx(self):
        import contextlib

        from ..ops.quant import xla_matmuls

        return xla_matmuls() if self.mesh is not None else contextlib.nullcontext()

    def _kv_sharding(self, key="k"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        # "k"/"v" (L, n_slots, Nkv, S, D): kv heads over the model axis —
        # the same head split the TP attention math produces, so decode
        # touches only its local heads and admission scatters stay local
        # per shard. The int8 caches' per-slot scales live pre-flattened
        # (L, Nkv, 1, n_slots*S) and shard over the same kv-head axis.
        if key in ("k_scale", "v_scale"):
            return NamedSharding(self.mesh, P(None, "model", None, None))
        return NamedSharding(self.mesh, P(None, None, "model", None, None))

    def _constrain_state(self, kv, small):
        if self.mesh is None:
            return kv, small
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        kv = {
            k: jax.lax.with_sharding_constraint(v, self._kv_sharding(k))
            for k, v in kv.items()
        }
        small = {
            k: jax.lax.with_sharding_constraint(v, rep) for k, v in small.items()
        }
        return kv, small

    def init_state(self):
        st = self.model.init_serving_state(
            self.policy.config, self.n_slots, self.cache_len, self.n_tokens,
            kv_bits=self.kv_bits,
        )
        kv_keys = ("k", "v", "k_scale", "v_scale")
        kv = {k: st[k] for k in kv_keys if k in st}
        small = {k: v for k, v in st.items() if k not in kv_keys}
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            kv = {k: jax.device_put(v, self._kv_sharding(k)) for k, v in kv.items()}
            small = {k: jax.device_put(v, rep) for k, v in small.items()}
        return kv, small

    def prefill(self, T: int, Bp: int):
        key = (T, Bp)
        if key not in self._prefill_cache:
            policy, model = self.policy, self.model

            @jax.jit
            def fn(params, ids, px, intr, attn):
                if px.dtype == jnp.uint8:  # client-side u8 transport: the
                    # /255 rescale moves on-device (static branch per aval)
                    px = px.astype(jnp.float32) / 255.0
                with self._trace_ctx():
                    return model.prefill_for_serving(
                        params, policy.config, ids,
                        pixel_values=px, intrinsic=intr, attention_mask=attn,
                        cache_len=self.cache_len,
                        compute_dtype=policy.compute_dtype,
                        token_range=self.token_range,
                        depth_image_size=policy.depth_image_size,
                        kv_bits=self.kv_bits,
                    )

            self._prefill_cache[key] = fn
        return self._prefill_cache[key]

    def admit(self, bucket: int):
        # ONE program per prefill bucket: a partial group (n < bucket) pads
        # its slot vector with duplicates of slot[0] — the filler rows are
        # exact copies of request 0's row (assembled that way by
        # _admit_group), so the duplicate scatter writes identical values
        # and any write order yields the same state. Keying on (bucket,
        # n_real) instead compiled a fresh scatter program per occupancy
        # level, which landed multi-second XLA compiles inside the measured
        # serving window.
        if bucket not in self._admit_cache:
            model = self.model
            kv_keys = ("k", "v", "k_scale", "v_scale")

            # donate the persistent KV state: the scatter aliases in place
            # instead of copying the (141 MB at flagship scale) cache per
            # admission. `small` (tok/pos/steps/out) is NOT donated —
            # retirement records keep out-buffer refs from earlier
            # dispatches alive for the completion thread. The prefill rows
            # are not donated: their (L, Bp, Nkv, P, D) layout can never
            # alias an output, so donating them only warned.
            @functools.partial(jax.jit, donate_argnums=(0,))
            def fn(kv, small, rows, slots):
                st = model.admit_rows_serving({**kv, **small}, rows, slots)
                return self._constrain_state(
                    {k: st[k] for k in kv_keys if k in st},
                    {k: v for k, v in st.items() if k not in kv_keys},
                )

            self._admit_cache[bucket] = fn
        return self._admit_cache[bucket]

    def decode(self):
        if self._decode is None:
            policy, model = self.policy, self.model

            # donate only the KV state (see admit's donation note)
            @functools.partial(jax.jit, donate_argnums=(1,))
            def fn(params, kv, small):
                with self._trace_ctx():
                    st = model.decode_steps_serving(
                        params, policy.config, {**kv, **small},
                        n_steps=self.decode_block, n_tokens=self.n_tokens,
                        token_range=self.token_range,
                        compute_dtype=policy.compute_dtype,
                        interpret=self.interpret,
                        use_fused=self.mesh is None,
                    )
                kv_keys = ("k", "v", "k_scale", "v_scale")
                return self._constrain_state(
                    {k: st[k] for k in kv_keys if k in st},
                    {k: v for k, v in st.items() if k not in kv_keys},
                )

            self._decode = fn
        return self._decode


class SplitServingEngine:
    """Continuous-batching engine with a persistent decode batch.

    Single-device: requires a fused-quantized LM (policy.quantize(bits=8|4)
    — the decode program IS the fused whole-LM kernel). Mesh-sharded
    (policy.shard(n_model=...)): the same engine runs the partitionable XLA
    programs under GSPMD — persistent KV sharded over kv heads, each decode
    step streaming 1/n of the weight bytes per chip (split-phase slot
    amortization and TP aggregate-bandwidth scaling compose). int8 KV
    (kv_bits=8) stacks with both: single-device via the fused kernel's
    quantized cache, mesh-sharded via xla_decode_step's code-domain
    attention — pass kv_bits here (policy.shard() keeps rejecting
    policy-level kv_bits because the MONOLITHIC mesh predict path has no
    int8-cache decode; the engine owns the knob under a mesh).

    Usage mirrors ServingEngine:
        engine = SplitServingEngine(policy)
        engine.warmup(sample_image, instructions)
        fut = engine.submit(image, "pick up the cup", unnorm_key=...)
        fut.result()  # {"actions": (chunk, 7), "action_ids": (3*chunk,)}
    """

    def __init__(
        self,
        policy,
        *,
        n_slots: int = 16,
        max_prompt_len: int = 320,
        prompt_pad_multiple: int = 64,
        prefill_buckets: Sequence[int] = DEFAULT_PREFILL_BUCKETS,
        decode_block: int = 4,
        max_ahead: int = 8,
        max_queue: Optional[int] = None,
        prefill_min_free: int = 0,
        prefill_wait_ms: float = 0.0,
        prefill_quiet_ms: float = 0.0,
        kv_bits: Optional[int] = None,  # None = inherit policy.kv_bits
    ):
        lm_layers = policy.params["lm"]["layers"]
        mesh = getattr(policy, "mesh", None)
        if mesh is None and "qkv" not in lm_layers.get("attn", {}):
            raise ValueError(
                "SplitServingEngine requires a fused-quantized LM "
                "(policy.quantize(bits=8) or a serving checkpoint): the "
                "single-device persistent decode program is the fused "
                "whole-LM kernel. (Mesh-sharded policies may also serve "
                "bf16 — their decode is the partitionable XLA step.)"
            )
        self.kv_bits = (
            getattr(policy, "kv_bits", None) if kv_bits is None else (kv_bits or None)
        )
        if self.kv_bits not in (None, 8):
            raise ValueError(f"kv_bits={self.kv_bits}: only 8 (or None)")
        if not 1 <= n_slots <= 16:
            raise ValueError("n_slots must be in [1, 16] (the fused kernel "
                             "unrolls its attention loop per batch row)")
        if max_prompt_len % prompt_pad_multiple:
            raise ValueError("max_prompt_len must be a multiple of "
                             "prompt_pad_multiple")
        self.policy = policy
        self.n_slots = n_slots
        self.max_prompt_len = max_prompt_len
        self.prompt_pad_multiple = prompt_pad_multiple
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        if self.prefill_buckets[-1] > n_slots:
            self.prefill_buckets = tuple(
                b for b in self.prefill_buckets if b <= n_slots
            ) or (n_slots,)
        self.decode_block = decode_block
        self.max_ahead = max_ahead
        self.max_queue = max_queue
        # batch-forming hysteresis: while decode work is in flight, defer
        # prefill until at least this many slots are free, so arrival
        # groups ride the larger prefill buckets (measured per-row prefill:
        # 25.5 ms at Bp=4 vs 22.3 at Bp=8 — prefill is ~3/4 of per-request
        # device time, so group size is a first-order throughput lever).
        # 0 disables; an idle engine always admits immediately regardless.
        self.prefill_min_free = min(prefill_min_free, n_slots)
        # burst gather: a COVERED engine holds its first arrival up to this
        # long so a closed-loop client burst (N clients resubmitting after
        # a retirement wave) forms one large prefill group instead of a
        # ragged run of tiny ones. Covered = idle (no decode in flight —
        # nothing to stall) OR run-ahead dispatches are still enqueued
        # (the device chews those while the host waits, so the wait is
        # free device-side). The run-ahead case matters under saturation:
        # host-side retirements run up to max_ahead dispatches ahead of
        # the device, so clients' resubmissions lag the host's admission
        # points and un-windowed gathers form small cohorts that lock in
        # (measured 32c: mean_prefill_rows 6.92 vs 16.0 phase-locked —
        # MEASURE_ROUND5). Complements prefill_min_free, which only
        # defers while decode work is in flight. 0 disables
        # (admit-on-first-arrival).
        self.prefill_wait_ms = prefill_wait_ms
        # adaptive early-close for the gather window: if > 0, the window
        # closes once no arrival lands for this long (prefill_wait_ms stays
        # the hard cap). A client burst arrives with small inter-arrival
        # gaps (measured ~5.6 ms: GIL-serialized processor + device_put per
        # client), so a fixed window either truncates the burst (60 ms
        # caught 10.67 of 16 rows — MEASURE_ROUND4) or overpays after it
        # ends; quiet-gap close tracks the burst's actual length. 0 keeps
        # the fixed-cap behavior.
        if prefill_quiet_ms > 0 and prefill_wait_ms <= 0:
            raise ValueError(
                "prefill_quiet_ms needs prefill_wait_ms > 0 (the hard cap "
                "that opens the gather window); quiet_ms alone is inert"
            )
        self.prefill_quiet_ms = prefill_quiet_ms
        self.n_tokens = 3 * policy.processor.action_chunk_size
        self.cache_len = max_prompt_len + self.n_tokens
        sw = policy.config.text.sliding_window
        if self.cache_len > sw:
            raise ValueError(
                f"cache_len {self.cache_len} exceeds the sliding window "
                f"({sw}); the fused decode step treats window and global "
                "layers identically only below it — lower max_prompt_len"
            )
        self._programs = _Programs(
            policy, n_slots=n_slots, cache_len=self.cache_len,
            n_tokens=self.n_tokens, decode_block=decode_block,
            kv_bits=self.kv_bits,
        )
        self._kv, self._small = self._programs.init_state()

        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._pending: List[_Request] = []  # shape-incompatible holdovers
        self._free: List[int] = list(range(n_slots))
        self._slot_req: Dict[int, _Request] = {}
        self._slot_steps: Dict[int, int] = {}
        self._ahead = collections.deque()  # per-dispatch tiny sync handles
        self._stop = threading.Event()
        self._dead: Optional[BaseException] = None
        self._lock = threading.Lock()
        self._stats = {
            "requests": 0,
            "prefill_batches": 0,
            "prefill_rows": 0,
            "prefill_filler_rows": 0,
            "decode_dispatches": 0,
            "active_slot_dispatches": 0,  # sum of active slots per dispatch
            "shed": 0,
            "expired": 0,
            "latency_ms": [],
            # host-side wall seconds the dispatch thread spends blocked in
            # each phase (dispatch is async, so these are host costs: arg
            # transfer + program enqueue; t_ahead is the run-ahead bound
            # actually waiting on the device)
            "t_collect": 0.0,
            "t_prefill": 0.0,
            "t_admit": 0.0,
            "t_decode": 0.0,
            "t_ahead": 0.0,
        }
        self._completion: "queue.Queue" = queue.Queue()
        self._completer = threading.Thread(
            target=self._completion_loop, name="spatialvla-split-sync",
            daemon=True,
        )
        self._completer.start()
        self._worker = threading.Thread(
            target=self._dispatch_loop, name="spatialvla-split", daemon=True
        )
        self._worker.start()

    # -- client side -----------------------------------------------------
    def submit(
        self,
        image,
        instruction: str,
        *,
        unnorm_key: Optional[str] = None,
        deadline_ms: Optional[float] = None,
    ):
        if self._stop.is_set():
            raise RuntimeError("engine is shut down")
        if self._dead is not None:
            raise RuntimeError(f"engine failed: {self._dead!r}")
        if self.max_queue is not None and (
            self._queue.qsize() + len(self._pending) >= self.max_queue
        ):
            with self._lock:
                self._stats["shed"] += 1
            raise EngineOverloaded(
                f"admission queue at max_queue={self.max_queue}; shed load"
            )
        stats = self.policy.processor.statistics
        if unnorm_key is not None and stats and unnorm_key not in stats:
            raise KeyError(
                f"unknown unnorm_key {unnorm_key!r}; available: {sorted(stats)}"
            )
        inputs = self.policy.processor(image, instruction, unnorm_key=unnorm_key)
        ids = np.asarray(inputs["input_ids"])
        if _round_up(ids.shape[1], self.prompt_pad_multiple) > self.max_prompt_len:
            raise ValueError(
                f"prompt of {ids.shape[1]} tokens pads past max_prompt_len="
                f"{self.max_prompt_len}; raise it (engine construction) for "
                "longer instructions / multi-image observations"
            )
        px = np.asarray(inputs["pixel_values"])
        req = _Request(
            ids=ids,
            pixel_values=px,
            intrinsic=np.asarray(inputs["intrinsic"]),
            unnorm_key=unnorm_key,
            deadline_ms=deadline_ms,
            px_dev=_put_pixels(px, inputs.get("pixel_values_u8")),
        )
        self._queue.put(req)
        if self._stop.is_set():
            _safe_resolve(
                req.future, exception=RuntimeError("engine is shut down")
            )
        return req.future

    def predict(self, image, instruction, *, unnorm_key=None, deadline_ms=None):
        return self.submit(
            image, instruction, unnorm_key=unnorm_key, deadline_ms=deadline_ms
        ).result()

    def stats(self) -> Dict:
        with self._lock:
            lat = sorted(self._stats["latency_ms"])
            dd = self._stats["decode_dispatches"]
            pb = self._stats["prefill_batches"]
            pr = self._stats["prefill_rows"] + self._stats["prefill_filler_rows"]
            return {
                "requests": self._stats["requests"],
                "prefill_batches": pb,
                "mean_prefill_rows": (
                    self._stats["prefill_rows"] / pb if pb else 0.0
                ),
                "prefill_pad_fraction": (
                    self._stats["prefill_filler_rows"] / pr if pr else 0.0
                ),
                "decode_dispatches": dd,
                "mean_slot_occupancy": (
                    self._stats["active_slot_dispatches"] / dd if dd else 0.0
                ),
                "shed": self._stats["shed"],
                "expired": self._stats["expired"],
                "latency_ms_p50": lat[len(lat) // 2] if lat else None,
                "latency_ms_p95": lat[min(len(lat) - 1, int(0.95 * len(lat)))]
                if lat
                else None,
                "dispatch_thread_s": {
                    k[2:]: round(self._stats[k], 3)
                    for k in ("t_collect", "t_prefill", "t_admit",
                              "t_decode", "t_ahead")
                },
            }

    def reset_stats(self):
        """Zero the counters so stats() reflects a measured window only —
        warmup compiles and parity probes otherwise pollute the dispatch-
        thread timings (the idle dispatch loop accrues t_collect for the
        engine's whole lifetime, which dwarfed the measured window in
        MEASURE_ROUND4 serve_16c_split_*)."""
        with self._lock:
            for k, v in self._stats.items():
                if isinstance(v, float):
                    self._stats[k] = 0.0
                elif isinstance(v, int):
                    self._stats[k] = 0
                elif isinstance(v, list):
                    self._stats[k] = []

    def warmup(self, sample_image, instructions: Sequence[str]):
        """Pre-compile every program the serving loop can hit: prefill per
        (padded-T, Bp) bucket, the decode program, and the full-bucket admit
        variants (partial-bucket admits are cheap scatter-only compiles paid
        on first use)."""
        proc = self.policy.processor
        reps: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for instr in instructions:
            inputs = proc(sample_image, instr)
            ids = np.asarray(inputs["input_ids"])
            T = _round_up(ids.shape[1], self.prompt_pad_multiple)
            if T > self.max_prompt_len:  # same guard as submit()
                raise ValueError(
                    f"warmup instruction {instr!r} pads to {T} tokens > "
                    f"max_prompt_len={self.max_prompt_len}; raise it or "
                    "trim the warmup set"
                )
            reps.setdefault(
                T, (ids, np.asarray(inputs["pixel_values"]),
                    np.asarray(inputs["intrinsic"])),
            )
        pad_id = proc.text_tokenizer.pad_id
        kv, small = self._programs.init_state()  # throwaway warm state
        for T, (ids, px, intr) in reps.items():
            for Bp in self.prefill_buckets:
                bids = np.full((Bp, T), pad_id, np.int32)
                attn = np.zeros((Bp, T), np.int32)
                bids[:, : ids.shape[1]] = ids[0]
                attn[:, : ids.shape[1]] = 1
                # transport exactly like the runtime path (_put_pixels +
                # device concat) so the traced px aval (u8 on the standard
                # processor path) matches what submit() ships
                px_dev = _put_pixels(px)
                rows = self._programs.prefill(T, Bp)(
                    self.policy.params, jnp.asarray(bids),
                    jnp.concatenate([px_dev] * Bp),
                    jnp.asarray(np.concatenate([intr] * Bp)), jnp.asarray(attn),
                )
                slots = jnp.arange(Bp, dtype=jnp.int32)  # buckets <= n_slots
                kv, small = self._programs.admit(Bp)(kv, small, rows, slots)
        kv, small = self._programs.decode()(self.policy.params, kv, small)
        np.asarray(small["out"])  # host sync (axon-reliable)

    def shutdown(self, *, wait: bool = True):
        self._stop.set()
        self._queue.put(None)
        if wait:
            self._worker.join(timeout=120)
            if self._worker.is_alive():
                import sys

                print(
                    "SplitServingEngine.shutdown: dispatch thread still "
                    "running after 120 s (mid-compile or wedged device)",
                    file=sys.stderr, flush=True,
                )
                return
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None:
                    _safe_resolve(
                        req.future,
                        exception=RuntimeError("engine is shut down"),
                    )

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()

    # -- dispatch side ----------------------------------------------------
    def _fail_expired(self, r: _Request, now: float):
        with self._lock:
            self._stats["expired"] += 1
        _safe_resolve(
            r.future,
            exception=RequestExpired(
                f"request waited {(now - r.t_submit) * 1e3:.0f} ms > "
                f"deadline_ms={r.deadline_ms:.0f} before dispatch"
            ),
        )

    def _collect_group(self, max_n: int, block: bool) -> List[_Request]:
        """Drain up to max_n compatible queued requests without waiting
        (decode work continues between dispatches — under load the queue
        accumulates during them, so batching needs no artificial delay).
        With block=True (engine idle), wait for the first arrival. When the
        wait is COVERED — engine idle, or run-ahead decode dispatches still
        enqueued for the device (host waiting costs nothing device-side) —
        and prefill_wait_ms is set, keep gathering the burst until the
        window closes or the group fills. With prefill_quiet_ms also set,
        the window closes early once arrivals stop for that long (wait_ms
        stays the hard cap)."""
        group: List[_Request] = []
        gather_until: Optional[float] = None
        cap_until: Optional[float] = None
        while len(group) < max_n:
            r = None
            if self._pending:
                r = self._pending.pop(0)
            else:
                if not group:
                    timeout = 0.05 if block else 0.0
                elif gather_until is not None:
                    timeout = gather_until - time.monotonic()
                    if timeout <= 0:
                        break
                else:
                    timeout = 0.0
                try:
                    r = self._queue.get(timeout=max(timeout, 0.0))
                except queue.Empty:
                    if gather_until is None or time.monotonic() >= gather_until:
                        break
                    continue
            if r is None:  # shutdown wakeup
                break
            if (block or self._ahead) and not group and self.prefill_wait_ms > 0:
                now = time.monotonic()
                if cap_until is None:
                    # anchored to the FIRST arrival only: if that request is
                    # expired and discarded below, a later arrival must not
                    # restart the hard cap (total wait would exceed wait_ms)
                    cap_until = now + self.prefill_wait_ms / 1e3
                gather_until = (
                    min(cap_until, now + self.prefill_quiet_ms / 1e3)
                    if self.prefill_quiet_ms > 0
                    else cap_until
                )
            elif gather_until is not None and self.prefill_quiet_ms > 0:
                # burst still arriving: extend the quiet-gap window
                gather_until = min(
                    cap_until, time.monotonic() + self.prefill_quiet_ms / 1e3
                )
            if r.expired(time.monotonic()):
                self._fail_expired(r, time.monotonic())
                continue
            if group and (
                r.pixel_values.shape[1:] != group[0].pixel_values.shape[1:]
                or r.px_dev.dtype != group[0].px_dev.dtype
            ):
                self._pending.append(r)  # only like-shaped (and like-
                # transported) images co-prefill
                break
            group.append(r)
        return group

    def _admit_group(self, group: List[_Request]):
        n = len(group)
        Bp = next(b for b in self.prefill_buckets if b >= n)
        T = _round_up(
            max(r.ids.shape[1] for r in group), self.prompt_pad_multiple
        )
        pad_id = self.policy.processor.text_tokenizer.pad_id
        ids = np.full((Bp, T), pad_id, np.int32)
        attn = np.zeros((Bp, T), np.int32)
        for i, r in enumerate(group):
            t = r.ids.shape[1]
            ids[i, :t] = r.ids[0]
            attn[i, :t] = 1
        if n < Bp:  # filler rows: exact copies of request 0 (see below)
            ids[n:] = ids[0]
            attn[n:] = attn[0]
        # pixels are already device-resident (submit-time device_put on the
        # client threads); assembly is a device-side concat enqueue, so the
        # dispatch thread never blocks on the image bytes
        px = jnp.concatenate(
            [r.px_dev for r in group] + [group[0].px_dev] * (Bp - n)
        )
        intr = np.concatenate(
            [r.intrinsic for r in group] + [group[0].intrinsic] * (Bp - n)
        )
        t0 = time.monotonic()
        rows = self._programs.prefill(T, Bp)(
            self.policy.params, jnp.asarray(ids), px,
            jnp.asarray(intr), jnp.asarray(attn),
        )
        t1 = time.monotonic()
        slots = [self._free.pop() for _ in range(n)]
        # filler slot entries duplicate slot[0]: the filler prefill rows are
        # bitwise copies of request 0's row, so the duplicate scatter writes
        # identical values (order-independent) and the admit program stays
        # ONE compile per bucket
        slot_vec = np.asarray(slots + [slots[0]] * (Bp - n), np.int32)
        self._kv, self._small = self._programs.admit(Bp)(
            self._kv, self._small, rows, jnp.asarray(slot_vec)
        )
        t2 = time.monotonic()
        for s, r in zip(slots, group):
            self._slot_req[s] = r
            self._slot_steps[s] = 1
        with self._lock:
            self._stats["prefill_batches"] += 1
            self._stats["prefill_rows"] += n
            self._stats["prefill_filler_rows"] += Bp - n
            self._stats["t_prefill"] += t1 - t0
            self._stats["t_admit"] += t2 - t1

    def _decode_dispatch(self):
        t0 = time.monotonic()
        self._kv, self._small = self._programs.decode()(
            self.policy.params, self._kv, self._small
        )
        t_decode = time.monotonic() - t0
        retiring = []
        for s in list(self._slot_req):
            self._slot_steps[s] += self.decode_block
            if self._slot_steps[s] >= self.n_tokens:
                retiring.append((s, self._slot_req.pop(s)))
                del self._slot_steps[s]
                self._free.append(s)
        with self._lock:
            self._stats["decode_dispatches"] += 1
            self._stats["active_slot_dispatches"] += (
                len(self._slot_req) + len(retiring)
            )
            self._stats["t_decode"] += t_decode
        if retiring:
            # the completer syncs this dispatch's token buffer and resolves
            # the futures off the dispatch thread
            self._completion.put((self._small["out"], retiring))
        # bound run-ahead: sync the oldest dispatch once more than max_ahead
        # are in flight (cheap when the device has caught up; blocks the
        # host exactly when it is outrunning the device)
        self._ahead.append(self._small["steps"])
        if len(self._ahead) > self.max_ahead:
            t0 = time.monotonic()
            np.asarray(self._ahead.popleft())
            with self._lock:
                self._stats["t_ahead"] += time.monotonic() - t0

    def _dispatch_loop(self):
        try:
            while True:
                idle = not self._slot_req
                if self._stop.is_set() and idle and not self._pending and self._queue.empty():
                    break
                if idle and self._ahead and self.prefill_wait_ms > 0:
                    # drain the run-ahead backlog before gathering:
                    # host-side idle still leaves up to max_ahead
                    # dispatches executing device-side, and their clients
                    # resubmit only after the completer resolves them —
                    # gathering now would catch only the earlier cohort's
                    # resubmissions and re-split the convoy (measured:
                    # 16c/128 sustained mean_prefill_rows 9.85 without
                    # this drain vs 16.0 phase-locked, MEASURE_ROUND5).
                    # Costs host wait exactly while the device finishes
                    # real work; window-disabled engines keep the old
                    # eager-gather behavior.
                    t0 = time.monotonic()
                    while self._ahead:
                        np.asarray(self._ahead.popleft())
                    with self._lock:
                        self._stats["t_ahead"] += time.monotonic() - t0
                group: List[_Request] = []
                if idle or len(self._free) >= self.prefill_min_free:
                    t0 = time.monotonic()
                    group = self._collect_group(
                        min(len(self._free), self.prefill_buckets[-1]),
                        block=idle,
                    )
                    with self._lock:
                        self._stats["t_collect"] += time.monotonic() - t0
                # else: decode work is in flight and too few slots are free
                # for an efficient prefill bucket — let retirements
                # accumulate (queued requests keep waiting; no deadlock:
                # active slots always advance below, and an idle engine
                # admits unconditionally)
                if group:
                    try:
                        self._admit_group(group)
                    except Exception as e:  # noqa: BLE001 — a bad prefill
                        # (e.g. unwarmed-compile failure) fails its group,
                        # not the persistent state
                        for r in group:
                            _safe_resolve(r.future, exception=e)
                if self._slot_req:
                    self._decode_dispatch()
        except BaseException as e:  # noqa: BLE001 — decode/admit touched the
            # persistent state: refs may be donated/invalid, so the engine
            # is dead; fail everything loudly
            self._dead = e
            for s, r in list(self._slot_req.items()):
                _safe_resolve(r.future, exception=e)
            self._slot_req.clear()
            for r in self._pending:
                _safe_resolve(r.future, exception=e)
            self._pending.clear()
            while True:
                try:
                    r = self._queue.get_nowait()
                except queue.Empty:
                    break
                if r is not None:
                    _safe_resolve(r.future, exception=e)
        finally:
            self._completion.put(None)
            self._completer.join()

    def _completion_loop(self):
        while True:
            item = self._completion.get()
            if item is None:
                return
            out_ref, retiring = item
            try:
                out = np.asarray(out_ref)  # sync up to that dispatch
            except Exception as e:  # noqa: BLE001 — device error at sync
                for _, r in retiring:
                    _safe_resolve(r.future, exception=e)
                continue
            now = time.monotonic()
            with self._lock:
                self._stats["requests"] += len(retiring)
                self._stats["latency_ms"] = self._stats["latency_ms"][-999:] + [
                    (now - r.t_submit) * 1e3 for _, r in retiring
                ]
            # one decode_actions per unnorm_key instead of one per row: the
            # per-row loop put ~16 sequential host calls between a
            # retirement wave and the first client waking, delaying the
            # closed-loop resubmission burst the idle gather window waits on
            groups: Dict = {}
            for s, r in retiring:
                if not r.future.done():
                    groups.setdefault(r.unnorm_key, []).append((s, r))
            for key, members in groups.items():
                try:
                    dec = self.policy.processor.decode_actions(
                        out[[s for s, _ in members]], unnorm_key=key
                    )
                except Exception as e:  # noqa: BLE001
                    for _, r in members:
                        _safe_resolve(r.future, exception=e)
                    continue
                for i, (_, r) in enumerate(members):
                    _safe_resolve(
                        r.future,
                        result={
                            "actions": dec["actions"][i],
                            "action_ids": dec["action_ids"][i],
                        },
                    )
