#!/usr/bin/env python
"""Convert a reference-format HF SpatialVLA checkpoint directory
(safetensors) to the framework's Orbax layout.

Usage:
    python scripts/convert_checkpoint.py --hf_dir /ckpts/spatialvla-4b-224-pt \
        --output out/spatialvla-4b-224-pt
"""
import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hf_dir", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args()

    from spatialvla_tpu.convert.hf_checkpoint import load_hf_checkpoint
    from spatialvla_tpu.train.checkpoints import save_params

    params, config, processor = load_hf_checkpoint(args.hf_dir)
    save_params(args.output, params, config_json=config.to_json())
    processor.save(args.output)
    print(f"converted {args.hf_dir} -> {args.output}")


if __name__ == "__main__":
    main()
