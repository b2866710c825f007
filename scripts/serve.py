"""HTTP serving front-end for a SpatialVLA checkpoint.

Stdlib-only (http.server) JSON API over the continuous-batching engine
(spatialvla_tpu/serve/engine.py). Concurrent client requests are batched
onto the TPU by the engine; the reference has no serving stack
(/root/reference/test/test_huggingface.py is its only inference entry).

Usage:
    PYTHONPATH=/root/repo python scripts/serve.py --ckpt /path/to/ckpt \
        [--hf] [--bits 8] [--port 8000] [--max_batch 16]

API:
    POST /predict   {"image": <base64 PNG/JPEG or nested [H][W][3] list>,
                     "instruction": str, "unnorm_key": str|null}
                 -> {"actions": [[...7]...chunk], "action_ids": [...],
                     "latency_ms": float}
    GET  /stats  -> engine batching/latency counters
    GET  /health -> {"ok": true}
"""
import argparse
import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from spatialvla_tpu.serve import EngineOverloaded, RequestExpired


def _decode_image(spec):
    if isinstance(spec, str):  # base64-encoded PNG/JPEG
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(spec))).convert("RGB")
        return np.asarray(img)
    return np.asarray(spec, dtype=np.uint8)


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, engine.stats())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                image = _decode_image(req["image"])
                t0 = time.monotonic()
                out = engine.predict(
                    image, req["instruction"], unnorm_key=req.get("unnorm_key"),
                    deadline_ms=req.get("deadline_ms"),
                )
                self._send(
                    200,
                    {
                        "actions": np.asarray(out["actions"]).tolist(),
                        "action_ids": np.asarray(out["action_ids"]).tolist(),
                        "latency_ms": (time.monotonic() - t0) * 1e3,
                    },
                )
            except EngineOverloaded as e:  # shed load: client should retry
                self._send(503, {"error": f"{type(e).__name__}: {e}"})
            except RequestExpired as e:  # stale frame: send a fresh one
                self._send(504, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # surface the failure to the client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *args):
            pass  # keep stdout clean for operators

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="checkpoint directory")
    ap.add_argument("--hf", action="store_true", help="reference-format HF checkpoint")
    ap.add_argument("--bits", type=int, default=8, help="LM weight bits (0 = bf16)")
    ap.add_argument("--vision_bits", type=int, default=8)
    ap.add_argument("--kv_bits", type=int, default=0,
                    help="8 = int8 KV cache on the fused decode path "
                         "(matters at batch >= 8)")
    ap.add_argument("--mlp_bits", type=int, default=0,
                    help="4 = int4 MLP with int8 attention/head (the mixed "
                         "sweet spot; quality-gate via eval_quant --mixed)")
    ap.add_argument("--depth_res", type=int, default=0, help="reduced zoe resolution (0 = full)")
    ap.add_argument("--mesh_model", type=int, default=1,
                    help="tensor-parallel serving over N chips (policy.shard)")
    ap.add_argument("--mesh_data", type=int, default=1,
                    help="data-parallel batch sharding over N chip groups")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=4.0)
    ap.add_argument("--pipeline_depth", type=int, default=3,
                    help="in-flight batches (1 = synchronous dispatch; 2+ "
                         "overlaps host-side batching/decode with device "
                         "compute)")
    ap.add_argument("--engine", choices=("monolithic", "split"),
                    default="monolithic",
                    help="'split' = split-phase continuous batching "
                         "(persistent decode slots — highest throughput "
                         "under concurrent load; single-device needs a "
                         "quantized LM, and it composes with --mesh_model "
                         "TP serving via the partitionable XLA decode "
                         "step); 'monolithic' = one predict program per "
                         "batch (works bf16 and mesh-sharded)")
    ap.add_argument("--max_prompt_len", type=int, default=320,
                    help="split engine: prompt-token capacity of a decode "
                         "slot (multiple of --pad_multiple)")
    ap.add_argument("--decode_block", type=int, default=4,
                    help="split engine: fused decode steps per dispatch")
    ap.add_argument("--prefill_min_free", type=int, default=0,
                    help="split engine: under load, defer prefill until "
                         "this many slots are free so arrival groups ride "
                         "the cheaper per-row prefill buckets (throughput/"
                         "latency trade; 0 = admit whenever a slot frees)")
    ap.add_argument("--prefill_wait_ms", type=float, default=0,
                    help="split engine: an idle engine holds its first "
                         "arrival up to this long to gather a client burst "
                         "into one prefill group (0 = admit immediately)")
    ap.add_argument("--prefill_quiet_ms", type=float, default=0,
                    help="split engine: close the gather window early once "
                         "no arrival lands for this long (wait_ms stays "
                         "the cap)")
    ap.add_argument("--max_queue", type=int, default=0,
                    help="admission bound: requests beyond this many queued "
                         "get HTTP 503 instead of unbounded wait (0 = "
                         "unbounded). Clients may also send deadline_ms in "
                         "the request body -> 504 if still undispatched "
                         "past it (drop stale frames)")
    ap.add_argument("--pad_multiple", type=int, default=16)
    ap.add_argument(
        "--no_warmup", action="store_true",
        help="skip startup pre-compilation of the serving buckets "
             "(first requests then pay the XLA compiles)",
    )
    ap.add_argument(
        "--compilation_cache", default=None, metavar="DIR",
        help="persist XLA executables across restarts "
             "(jax persistent compilation cache)",
    )
    ap.add_argument(
        "--gate", default=None, metavar="GATE_JSON",
        help="quality-gate artifact (scripts/eval_quant.py --gate_out) "
             "covering this configuration's quality-trade knobs; a "
             "serving checkpoint baked with quantize_checkpoint.py --gate "
             "carries one already",
    )
    ap.add_argument(
        "--ungated", action="store_true",
        help="serve quality-trade knobs (int4/mixed/kv8/depth_res/"
             "vision quant) WITHOUT a covering gate artifact — the "
             "default is to refuse (spatialvla_tpu/serve/gating.py)",
    )
    args = ap.parse_args(argv)

    if args.compilation_cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compilation_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spatialvla_tpu.inference import SpatialVLAPolicy
    from spatialvla_tpu.serve import ServingEngine, warmup_buckets

    import os

    if os.path.exists(os.path.join(args.ckpt, "serving_config.json")):
        # pre-quantized serving checkpoint (scripts/quantize_checkpoint.py):
        # the tree loads already packed — no startup quantize programs, no
        # transient-HBM peak; the baked knobs override the CLI quant flags
        policy = SpatialVLAPolicy.load_serving(args.ckpt)
        if (args.bits != 8 or args.vision_bits != 8 or args.mlp_bits
                or args.kv_bits or args.depth_res):
            print(
                "note: serving checkpoint's baked quantization "
                f"{policy.quant_desc} (kv_bits={policy.kv_bits}, "
                f"depth_res={policy.depth_image_size}) overrides the "
                "--bits/--vision_bits/--mlp_bits/--kv_bits/--depth_res flags",
                flush=True,
            )
        if (args.mesh_model > 1 or args.mesh_data > 1) and policy.kv_bits:
            # kv_bits is a decode-path knob (not baked into the tree);
            # shard() rejects it policy-level because the MONOLITHIC mesh
            # decode has no int8-cache layout. The split engine takes it
            # directly (xla_decode_step's code-domain attention), so hand
            # the baked value over; the monolithic mesh engine drops it.
            baked_kv = policy.kv_bits
            policy.kv_bits = None
            if args.engine == "split":
                args.kv_bits = args.kv_bits or baked_kv
                print(
                    f"note: baked kv_bits={baked_kv} moves to the split "
                    "engine (mesh-sharded int8 KV runs the XLA decode step)",
                    flush=True,
                )
            else:
                print(
                    f"note: clearing baked kv_bits={baked_kv} — the "
                    "monolithic mesh decode has no int8-cache layout "
                    "(--engine split serves it sharded)",
                    flush=True,
                )
    else:
        policy = (
            SpatialVLAPolicy.from_hf_checkpoint(args.ckpt)
            if args.hf
            else SpatialVLAPolicy.load(args.ckpt)
        )
        # any serving-parameterization knob triggers quantize(); bits=0
        # keeps the LM bf16 (bits=None) so e.g. --depth_res alone applies
        if args.bits or args.vision_bits or args.depth_res or args.kv_bits:
            meshed = args.mesh_model > 1 or args.mesh_data > 1
            if meshed and args.kv_bits and args.engine != "split":
                raise SystemExit(
                    "--kv_bits under a mesh needs --engine split (the "
                    "monolithic mesh decode has no int8-cache layout)"
                )
            policy.quantize(
                args.bits or None,
                vision_bits=args.vision_bits or None,
                depth_image_size=args.depth_res or None,
                # under a mesh the split ENGINE owns the kv_bits knob
                kv_bits=None if meshed else (args.kv_bits or None),
                mlp_bits=args.mlp_bits or None,
            )
    if args.mesh_model > 1 or args.mesh_data > 1:
        # pod-slice serving: TP splits each decode step's weight stream
        # over the model axis (aggregate-bandwidth latency scaling),
        # data shards whole batches; see SpatialVLAPolicy.shard
        policy.shard(n_model=args.mesh_model, n_data=args.mesh_data)
    # quality-gate policy: any knob that trades model quality (int4/mixed/
    # kv8/depth_res/vision quant) must be covered by a measured gate
    # artifact — from the serving checkpoint (quantize_checkpoint --gate)
    # or --gate — else startup refuses unless --ungated
    from spatialvla_tpu.serve.gating import enforce_gate, load_gate

    gate = load_gate(args.gate) if args.gate else policy.quality_gate
    print(enforce_gate(policy, gate, ungated=args.ungated), flush=True)
    # ladder includes a bucket >= max_batch: the engine rounds full batches
    # UP to the next bucket, so truncating below max_batch would leave the
    # largest dispatch shape unwarmed (and fail engine construction)
    warm_instructions = (
        # one short + one long instruction covers the padded-T buckets
        # realistic robot instructions land in
        "go",
        "open the top drawer and place the sponge inside of it then close "
        "the drawer again",
    )
    s = policy.config.vision.image_size
    if args.engine == "split":
        from spatialvla_tpu.serve import SplitServingEngine

        if args.max_prompt_len % args.pad_multiple:
            # the HTTP default pad_multiple is 16; keep the capacity a
            # multiple of it without making operators do the arithmetic
            args.max_prompt_len += args.pad_multiple - (
                args.max_prompt_len % args.pad_multiple
            )
        engine = SplitServingEngine(
            policy, n_slots=args.max_batch,
            max_prompt_len=args.max_prompt_len,
            prompt_pad_multiple=args.pad_multiple,
            decode_block=args.decode_block,
            max_queue=args.max_queue or None,
            prefill_min_free=args.prefill_min_free,
            prefill_wait_ms=args.prefill_wait_ms,
            prefill_quiet_ms=args.prefill_quiet_ms,
            kv_bits=args.kv_bits or None,
        )
        if not args.no_warmup:
            print("warming split-phase serving programs...", flush=True)
            engine.warmup(np.zeros((s, s, 3), np.uint8), warm_instructions)
    else:
        buckets = tuple(
            sorted({b for b in (1, 2, 4, 8, 16) if b < args.max_batch}
                   | {args.max_batch})
        )
        if not args.no_warmup:
            print("warming serving buckets (one XLA compile per (T, B))...",
                  flush=True)
            warmup_buckets(
                policy,
                sample_image=np.zeros((s, s, 3), np.uint8),
                instructions=warm_instructions,
                prompt_pad_multiple=args.pad_multiple,
                batch_buckets=buckets,
            )
        engine = ServingEngine(
            policy, max_batch_size=args.max_batch, max_wait_ms=args.max_wait_ms,
            prompt_pad_multiple=args.pad_multiple, batch_buckets=buckets,
            pipeline_depth=args.pipeline_depth,
            max_queue=args.max_queue or None,
        )
    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(engine))
    print(f"serving on :{args.port} (max_batch={args.max_batch})", flush=True)
    try:
        server.serve_forever()
    finally:
        engine.shutdown()


if __name__ == "__main__":
    main()
