"""User-facing inference API.

The TPU-native equivalent of the reference quick start
(README.md:93-111 / test/test_huggingface.py):

    policy = SpatialVLAPolicy.load("path/to/checkpoint")
    out = policy.predict(image, "move the cup", unnorm_key="bridge_orig/1.0.0")
    out["actions"]  # (chunk, 7) continuous end-effector deltas

A checkpoint directory contains Orbax params ('params/'), 'config.json'
(SpatialVLAConfig), and 'processor_config.json' (statistics / bin policy /
intrinsics / chunking) — exactly the artifact set the reference ships with
its HF checkpoints (SURVEY.md §2.4).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .config import SpatialVLAConfig
from .models import spatialvla
from .processor import SpatialVLAProcessor, TextTokenizer


class SpatialVLAPolicy:
    def __init__(
        self,
        params,
        config: SpatialVLAConfig,
        processor: SpatialVLAProcessor,
        *,
        compute_dtype=jnp.bfloat16,
    ):
        self.params = params
        self.config = config
        self.processor = processor
        self.compute_dtype = compute_dtype
        self.depth_image_size: Optional[int] = None  # set by quantize()
        self.kv_bits: Optional[int] = None  # set by quantize()
        self.mesh = None  # set by shard()
        self.quant_desc: Optional[Dict] = None  # provenance, set by quantize()
        self.quality_gate: Optional[Dict] = None  # serve.gating artifact
        self._predict_cache: Dict = {}

    # ------------------------------------------------------------------
    @classmethod
    def load(
        cls,
        checkpoint_dir: str,
        *,
        text_tokenizer: Optional[TextTokenizer] = None,
        param_dtype=jnp.bfloat16,
    ) -> "SpatialVLAPolicy":
        from .train.checkpoints import load_params

        with open(os.path.join(checkpoint_dir, "config.json")) as f:
            config = SpatialVLAConfig.from_json(f.read())
        processor = SpatialVLAProcessor.load(checkpoint_dir, text_tokenizer)
        template = jax.tree_util.tree_map(
            np.asarray, spatialvla.init_params(jax.random.PRNGKey(0), config)
        )
        params = load_params(checkpoint_dir, template)
        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype=param_dtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
            else jnp.asarray(x),
            params,
        )
        return cls(params, config, processor)

    @classmethod
    def from_hf_checkpoint(
        cls,
        hf_dir: str,
        *,
        text_tokenizer: Optional[TextTokenizer] = None,
        param_dtype=jnp.bfloat16,
    ) -> "SpatialVLAPolicy":
        """Load directly from a reference-format HF checkpoint directory
        (safetensors + config.json + processor files)."""
        from .convert.hf_checkpoint import load_hf_checkpoint

        params, config, processor = load_hf_checkpoint(
            hf_dir, text_tokenizer=text_tokenizer, dtype=param_dtype
        )
        return cls(params, config, processor)

    # ------------------------------------------------------------------
    def quantize(
        self,
        bits: Optional[int] = 8,
        *,
        vision_bits: Optional[int] = 8,
        depth_image_size: Optional[int] = None,
        kv_bits: Optional[int] = None,
        mlp_bits: Optional[int] = None,
        group_size: Optional[int] = None,
    ) -> "SpatialVLAPolicy":
        """Switch to the serving-optimized parameterization: int8 (or, with
        bits=4, packed-int4 — quality-gate it first) weight-only LM (halves /
        quarters decode HBM traffic; on-chip dequant — ops/quant.py;
        bits=None keeps the LM bf16), int8 vision front (SigLIP encoder +
        zoe BEiT backbone + projector — quantize_vision_params;
        vision_bits=None keeps it bf16), and a precomputed ZoeDepth
        relative-position bias (drops the per-forward 5M-row gather).
        depth_image_size runs the zoe stack at a reduced internal resolution
        (opt-in quality trade, zoe.predict_depth). kv_bits=8 serves with an
        int8 KV cache on the fused decode path (per-slot scales,
        ops/quant.py:quantize_kv — near-lossless, cuts the cache's share of
        decode HBM traffic in half; it matters at batch >= 8 where the
        cache is ~1/3 of the stream). mlp_bits=4 with bits=8 is the mixed
        sweet spot (int4 MLP, int8 attention/head — ~0.58x the int8 weight
        stream, error kept out of the attention logits; quality-gate it).
        group_size=128 switches int4 to grouped scales — ~23% less
        quantization error for ~1.8x slower decode (measured; see
        ops/quant.quantize_int4) — when int4's accuracy, not speed, is
        the constraint. In-place; returns self."""
        import functools

        from .ops.quant import quantize_lm_params, quantize_vision_params

        if self.mesh is not None:
            raise ValueError(
                "quantize() after shard() is unsupported — quantize first, "
                "then shard (the quantized tree shards with the same rules)"
            )
        # per-subtree re-pack guard: the LM and the vision front quantize
        # independently, so only the subtree that is actually packed blocks
        # a second pass over it (a knob-only call — kv_bits/depth_res with
        # bits=None/vision_bits=None — never trips it)
        prior = self.quant_desc or {}
        if bits and prior.get("bits"):
            raise ValueError(
                f"LM is already quantized ({self.quant_desc}) — "
                "re-quantizing a packed tree would corrupt it; reload the "
                "source checkpoint to change weight formats"
            )
        if vision_bits and prior.get("vision_bits"):
            raise ValueError(
                f"vision front is already quantized ({self.quant_desc}) — "
                "re-quantizing a packed tree would corrupt it; reload the "
                "source checkpoint to change weight formats"
            )
        params = dict(self.params)
        if mlp_bits and not bits:
            raise ValueError(
                "mlp_bits requires bits (the attention/head precision): a "
                "bf16 LM with an int4 MLP is not a supported tree"
            )
        # every quantize program DONATES its input tree: the bf16 source
        # buffers free (or alias, for passthrough leaves like the embedding)
        # as the program consumes them instead of coexisting with the
        # quantized tree + the int4 pack's f32 temporaries — the undonated
        # flow peaks over 16 GB HBM on the 4B model at mlp_bits=4 (r3 sweep
        # serve_16c_mixed OOM). In-place semantics make this safe: the
        # donated arrays are exactly the ones this method replaces (a
        # mid-quantize failure leaves the policy needing a reload either
        # way, now explicitly).
        if bits:
            params["lm"] = jax.jit(
                functools.partial(quantize_lm_params, bits=bits,
                                  mlp_bits=mlp_bits, group_size=group_size),
                donate_argnums=(0,),
            )(self.params["lm"])
        if vision_bits:
            params = jax.jit(
                functools.partial(quantize_vision_params, bits=vision_bits),
                donate_argnums=(0,),
            )(params)
        if "zoe" in params and "rel_pos_table" in params["zoe"]["backbone"]["layers"]:
            from .models.zoe import precompute_rel_bias

            params["zoe"] = jax.jit(
                lambda zp: precompute_rel_bias(
                    zp, self.config.zoe, image_size=depth_image_size
                ),
                donate_argnums=(0,),
            )(params["zoe"])
        # explicit host sync before the bf16 source tree is dropped: the
        # quantize programs' f32 temporaries must retire before the first
        # predict's transients enqueue, or the enqueued peak OOMs HBM on a
        # 4B model (CLAUDE.md quantize-then-free rule; block_until_ready is
        # unreliable on the axon backend — sync via tiny host transfers,
        # one leaf per jitted program suffices: program completion frees
        # its temporaries atomically)
        for subtree in ("lm", "zoe", "vision"):  # one leaf per possible program
            if subtree in params:
                leaf = jax.tree_util.tree_leaves(params[subtree])[0]
                np.asarray(leaf[(0,) * leaf.ndim])
        self.depth_image_size = depth_image_size
        self.kv_bits = kv_bits
        if bits or vision_bits:
            # provenance for save_serving round-trips — recorded only when
            # weights were actually packed this call (a knob-only call must
            # not mark a still-bf16 tree "already quantized" or record
            # misleading provenance); merges with a prior pass so e.g.
            # quantize(bits=8) then quantize(bits=None, vision_bits=8)
            # yields the full description
            self.quant_desc = {
                "bits": bits or prior.get("bits"),
                "vision_bits": vision_bits or prior.get("vision_bits"),
                "mlp_bits": mlp_bits if bits else prior.get("mlp_bits"),
                "group_size": group_size if bits else prior.get("group_size"),
            }
        self.params = params
        self._predict_cache.clear()
        return self

    # ------------------------------------------------------------------
    def save_serving(self, directory: str, *, quality_gate: Optional[Dict] = None):
        """Persist the CURRENT parameterization as a serving checkpoint.

        Called after quantize(), this writes the int8/int4 packed tree (+
        scales + precomputed zoe rel-bias) verbatim, so a server restart
        loads it directly via load_serving() — no bf16 materialization, no
        quantize programs, no transient-OOM window at startup (the
        quantize-then-free peak this sidesteps is the r3 serve_16c_mixed
        OOM; see quantize()). Alongside params it stores config.json,
        the processor artifacts, and serving_config.json recording the
        knobs (kv_bits, depth_image_size, quantize provenance) that live
        on the policy rather than in the tree. The reference has no
        quantized-artifact story (it serves bf16 safetensors,
        /root/reference/README.md:93); this is serving infrastructure.

        quality_gate: a serve.gating artifact (eval_quant --gate_out)
        measuring THIS parameterization vs bf16 — embedded in
        serving_config.json so the server can verify its quality-trade
        knobs are gated without a side-channel file. Rejected if it does
        not actually cover the baked knobs (a stale or mismatched gate
        travelling with a checkpoint is worse than none)."""
        import json

        from .serve.gating import check_gate, policy_quality_knobs
        from .train.checkpoints import save_params

        if quality_gate is not None:
            ok, problems = check_gate(quality_gate, policy_quality_knobs(self))
            if not ok:
                raise ValueError(
                    "quality_gate does not cover this checkpoint's baked "
                    "knobs: " + "; ".join(problems)
                )

        if self.mesh is not None:
            raise ValueError(
                "save_serving() on a sharded policy is unsupported — save "
                "before shard() (the loaded tree re-shards with the same "
                "rules)"
            )
        save_params(directory, self.params, config_json=self.config.to_json())
        self.processor.save(directory)
        with open(os.path.join(directory, "serving_config.json"), "w") as f:
            json.dump(
                {
                    "format_version": 1,
                    "kv_bits": self.kv_bits,
                    "depth_image_size": self.depth_image_size,
                    "quant_desc": self.quant_desc,
                    "quality_gate": quality_gate
                    if quality_gate is not None
                    else self.quality_gate,
                },
                f, indent=2,
            )

    @classmethod
    def load_serving(
        cls,
        directory: str,
        *,
        text_tokenizer: Optional[TextTokenizer] = None,
    ) -> "SpatialVLAPolicy":
        """Load a save_serving() checkpoint: the tree is restored with its
        stored dtypes/structure (quantized leaves stay quantized — no
        template, no cast) and committed to device once; kv_bits /
        depth_image_size are restored from serving_config.json. Do NOT
        call quantize() on the result — the tree already is; shard() works
        as usual."""
        import json

        from .train.checkpoints import load_params

        scfg_path = os.path.join(directory, "serving_config.json")
        if not os.path.exists(scfg_path):
            raise FileNotFoundError(
                f"{scfg_path} not found — not a save_serving() checkpoint "
                "(use SpatialVLAPolicy.load for training/export checkpoints)"
            )
        with open(scfg_path) as f:
            scfg = json.load(f)
        with open(os.path.join(directory, "config.json")) as f:
            config = SpatialVLAConfig.from_json(f.read())
        processor = SpatialVLAProcessor.load(directory, text_tokenizer)
        params = jax.tree_util.tree_map(jnp.asarray, load_params(directory))
        policy = cls(params, config, processor)
        policy.kv_bits = scfg.get("kv_bits")
        policy.depth_image_size = scfg.get("depth_image_size")
        policy.quant_desc = scfg.get("quant_desc")
        policy.quality_gate = scfg.get("quality_gate")
        return policy

    # ------------------------------------------------------------------
    def shard(
        self,
        *,
        n_model: int = 1,
        n_data: int = 1,
        devices=None,
    ) -> "SpatialVLAPolicy":
        """Mesh-sharded serving over a TPU slice.

        n_model chips of tensor parallelism: weight matrices split their
        output heads / MLP hidden over the ``model`` mesh axis (the
        partitioning rules of parallel/partitioning.py), so every decode
        step streams 1/n of the weight bytes per chip — greedy decode is
        HBM-bandwidth bound, so latency scales with the slice's AGGREGATE
        bandwidth, with one psum per projection riding ICI. n_data adds
        throughput-oriented batch sharding on top (predict_batch shards
        its batch dim when divisible). The reference serves strictly
        single-GPU (README.md:93); this is the pod-slice extension.

        Prediction under a mesh runs the XLA decode path (GSPMD partitions
        einsum + dequant graphs; the single-device Pallas microkernels
        would be wrapped in all-gathers instead — ops/quant.xla_matmuls),
        whose MONOLITHIC decode loop has no int8-cache layout, so
        policy-level kv_bits is rejected; mesh-sharded SPLIT serving does
        take int8 KV via SplitServingEngine(kv_bits=8), which runs
        xla_decode_step's code-domain attention. Call quantize() BEFORE
        shard(): int8/int4 trees shard with the same rules via their base
        paths. In-place; returns self."""
        from .parallel.mesh import MeshConfig, make_mesh
        from .parallel.partitioning import shard_params

        if self.kv_bits:
            raise ValueError(
                "kv_bits on the monolithic mesh path is unsupported — "
                "quantize(kv_bits=None) before shard(); for mesh-sharded "
                "split serving pass SplitServingEngine(kv_bits=8) instead"
            )
        mesh = make_mesh(MeshConfig(data=n_data, fsdp=1, model=n_model), devices)
        self.params = shard_params(mesh, self.params)
        self.mesh = mesh
        self._predict_cache.clear()
        return self

    def _place_inputs(self, ids, pixels, intrinsic, attn=None):
        """Commit host inputs: batch over the data axis when divisible,
        replicated otherwise (B=1 robot serving)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = self.mesh.shape["data"]
        B = int(ids.shape[0])
        spec = P("data") if (n_data > 1 and B % n_data == 0) else P()
        sh = NamedSharding(self.mesh, spec)
        out = tuple(jax.device_put(x, sh) for x in (ids, pixels, intrinsic))
        if attn is not None:
            out = out + (jax.device_put(attn, sh),)
        return out

    # ------------------------------------------------------------------
    def _jitted_predict(
        self, prefix_len: int, chunk: int, padded: bool = False,
        margins: bool = False,
    ):
        key = (prefix_len, chunk, padded, self.depth_image_size, self.kv_bits,
               self.mesh, margins)
        if key not in self._predict_cache:
            cfg = self.config
            dres = self.depth_image_size
            kvb = self.kv_bits
            mesh = self.mesh

            def body(params, input_ids, pixel_values, intrinsic, attn=None):
                import contextlib

                from .ops.quant import xla_matmuls

                kw = {}
                if mesh is not None:
                    # mesh-sharded: XLA decode path + XLA quant matmuls,
                    # both GSPMD-partitionable (the single-device Pallas
                    # microkernels would be wrapped in all-gathers)
                    kw["use_fused_decode"] = False
                ctx = contextlib.nullcontext() if mesh is None else xla_matmuls()
                with ctx:
                    return spatialvla.predict_action(
                        params, cfg, input_ids,
                        pixel_values=pixel_values, intrinsic=intrinsic,
                        attention_mask=attn,
                        action_chunk_size=chunk,
                        compute_dtype=self.compute_dtype,
                        depth_image_size=dres, kv_bits=kvb,
                        return_margins=margins, **kw,
                    )

            if padded:  # mixed-length batch: pad-aware masks/positions
                @jax.jit
                def fn(params, input_ids, pixel_values, intrinsic, attn):
                    return body(params, input_ids, pixel_values, intrinsic, attn)
            else:
                @jax.jit
                def fn(params, input_ids, pixel_values, intrinsic):
                    return body(params, input_ids, pixel_values, intrinsic)

            self._predict_cache[key] = fn
        return self._predict_cache[key]

    def predict(
        self,
        image,
        instruction: str,
        *,
        unnorm_key: Optional[str] = None,
        return_margins: bool = False,
    ) -> Dict[str, np.ndarray]:
        """One observation -> {'actions': (chunk, 7), 'action_ids'}.

        return_margins adds 'margins': (3*chunk,) f32 per-decode-step
        greedy argmax margins (top1 - top2 logit of the action block) —
        the parity-contract evidence bench_serve --parity_check records
        (models/spatialvla._argmax_margin)."""
        inputs = self.processor(image, instruction, unnorm_key=unnorm_key)
        ids = jnp.asarray(inputs["input_ids"])
        fn = self._jitted_predict(
            int(ids.shape[1]), self.processor.action_chunk_size,
            margins=return_margins,
        )
        args = (
            ids,
            jnp.asarray(inputs["pixel_values"]),
            jnp.asarray(inputs["intrinsic"]),
        )
        if self.mesh is not None:
            args = self._place_inputs(*args)
        generated = fn(self.params, *args)
        if return_margins:
            generated, margins = generated
        out = self.processor.decode_actions(np.asarray(generated), unnorm_key=unnorm_key)
        res = {"actions": out["actions"][0], "action_ids": out["action_ids"][0]}
        if return_margins:
            res["margins"] = np.asarray(margins)[0]
        return res

    def predict_batch(self, images, instructions, *, unnorm_key=None) -> Dict[str, np.ndarray]:
        inputs = self.processor(list(images), list(instructions), unnorm_key=unnorm_key)
        ids = jnp.asarray(inputs["input_ids"])
        attn = np.asarray(inputs["attention_mask"])
        padded = bool((attn == 0).any())  # mixed prompt lengths
        fn = self._jitted_predict(
            int(ids.shape[1]), self.processor.action_chunk_size, padded
        )
        args = (
            ids,
            jnp.asarray(inputs["pixel_values"]), jnp.asarray(inputs["intrinsic"]),
        )
        if padded:
            args = args + (jnp.asarray(attn),)
        if self.mesh is not None:
            args = self._place_inputs(*args) if not padded else self._place_inputs(
                args[0], args[1], args[2], attn=args[3]
            )
        generated = fn(self.params, *args)
        return self.processor.decode_actions(np.asarray(generated), unnorm_key=unnorm_key)
