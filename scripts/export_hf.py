#!/usr/bin/env python
"""Export a spatialvla_tpu checkpoint directory (Orbax params + config.json
+ processor_config.json, as written by the training CLIs) to a
reference-format HF checkpoint directory (model.safetensors + config.json +
processor artifacts) loadable by the reference torch stack with
AutoModel.from_pretrained(trust_remote_code=True).

    python scripts/export_hf.py --checkpoint_dir out/pretrain --output_dir out/hf
"""
import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", required=True,
                   help="spatialvla_tpu checkpoint dir (or a reference HF dir "
                   "with --from_hf for format conversion)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--from_hf", action="store_true",
                   help="input is already an HF dir (re-export/normalize)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from spatialvla_tpu.convert.export_hf import export_hf_checkpoint
    from spatialvla_tpu.inference import SpatialVLAPolicy

    loader = (
        SpatialVLAPolicy.from_hf_checkpoint if args.from_hf else SpatialVLAPolicy.load
    )
    policy = loader(args.checkpoint_dir, param_dtype=jnp.float32)
    out = export_hf_checkpoint(
        policy.params, policy.config, args.output_dir, processor=policy.processor
    )
    print(f"exported HF checkpoint to {out}")


if __name__ == "__main__":
    sys.exit(main())
