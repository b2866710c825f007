"""Released-checkpoint parity harness (VERDICT r2 #4).

One command that, given a downloaded reference checkpoint directory
(e.g. IPEC-COMMUNITY/spatialvla-4b-224-pt), reproduces the reference smoke
test (/root/reference/test/test_huggingface.py:12-31) on the TPU stack and
compares greedy action-token ids against an oracle:

  (a) the reference torch model, if `transformers` can load it from the
      same directory with trust_remote_code (requires the reference's
      modeling_*.py files in the directory, as released checkpoints ship);
  (b) otherwise a committed expected-token JSON (--expected), produced by
      a prior oracle run with the documented generation recipe.

Generation recipe (must match the reference exactly):
  prompt    = "What action should the robot take to pick the cup?"
  unnorm_key= "bridge_orig/1.0.0"
  greedy decode (do_sample=False), 3 * action_chunk_size new tokens read
  (the reference generates up to 256 but decode_actions consumes only the
  first 3*chunk ids, processing_spatialvla.py:216-254).

Usage:
  PYTHONPATH=/root/repo python scripts/verify_reference_parity.py \
      --checkpoint_dir /path/to/spatialvla-4b-224-pt \
      [--image /path/to/example.png] [--prompt "..."] \
      [--unnorm_key bridge_orig/1.0.0] \
      [--expected expected_tokens.json] [--save_expected out.json]

Exit code 0 = token-identical; 1 = mismatch; 2 = no oracle available.
"""
import argparse
import json
import os
import sys

import numpy as np

DEFAULT_PROMPT = "What action should the robot take to pick the cup?"


def _load_image(path, size=224):
    if path is None:
        # deterministic synthetic image so the harness is runnable without
        # assets (real parity runs should pass the reference's example.png)
        rng = np.random.RandomState(0)
        return rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def run_ours(checkpoint_dir, image, prompt, unnorm_key):
    """Greedy action ids + decoded actions through the TPU stack."""
    from spatialvla_tpu.inference import SpatialVLAPolicy

    policy = SpatialVLAPolicy.from_hf_checkpoint(checkpoint_dir)
    out = policy.predict(image, prompt, unnorm_key=unnorm_key)
    return {
        "action_ids": np.asarray(out["action_ids"]).reshape(-1).tolist(),
        "actions": np.asarray(out["actions"]).tolist(),
    }


def run_torch_oracle(checkpoint_dir, image, prompt, unnorm_key):
    """The reference model itself (test_huggingface.py recipe), if loadable."""
    try:
        import torch
        from PIL import Image
        from transformers import AutoModel, AutoProcessor

        processor = AutoProcessor.from_pretrained(
            checkpoint_dir, trust_remote_code=True, local_files_only=True
        )
        model = (
            AutoModel.from_pretrained(
                checkpoint_dir, trust_remote_code=True,
                torch_dtype=torch.bfloat16, local_files_only=True,
            )
            .eval()
        )
    except Exception as e:  # noqa: BLE001 — any load failure => no oracle
        print(f"torch oracle unavailable: {type(e).__name__}: {e}")
        return None
    pil = Image.fromarray(np.asarray(image))
    inputs = processor(
        images=[pil], text=prompt, unnorm_key=unnorm_key, return_tensors="pt"
    )
    with torch.no_grad():
        generation_outputs = model.predict_action(inputs)
    out = processor.decode_actions(generation_outputs, unnorm_key=unnorm_key)
    chunk = processor.action_chunk_size
    ids = np.asarray(generation_outputs)[0, : 3 * chunk]
    return {
        "action_ids": ids.reshape(-1).tolist(),
        "actions": np.asarray(out["actions"]).reshape(-1, 7).tolist(),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--image", default=None,
                    help="path to the reference's test/example.png")
    ap.add_argument("--prompt", default=DEFAULT_PROMPT)
    ap.add_argument("--unnorm_key", default="bridge_orig/1.0.0")
    ap.add_argument("--expected", default=None,
                    help="JSON file with {'action_ids': [...]} from a prior "
                         "oracle run (fallback when torch cannot load)")
    ap.add_argument("--save_expected", default=None,
                    help="write our output as an expected-token file")
    args = ap.parse_args(argv)

    image = _load_image(args.image)
    ours = run_ours(args.checkpoint_dir, image, args.prompt, args.unnorm_key)
    print(f"ours:   action_ids={ours['action_ids']}")

    oracle = run_torch_oracle(
        args.checkpoint_dir, image, args.prompt, args.unnorm_key
    )
    source = "torch reference model"
    if oracle is None and args.expected:
        with open(args.expected) as f:
            oracle = json.load(f)
        source = f"expected-token file {args.expected}"

    if args.save_expected:
        with open(args.save_expected, "w") as f:
            json.dump(ours, f, indent=2)
        print(f"saved expected-token file: {args.save_expected}")

    if oracle is None:
        print("NO ORACLE: pass --expected or make the torch model loadable")
        return 2
    print(f"oracle: action_ids={oracle['action_ids']}  ({source})")
    if list(ours["action_ids"]) == list(oracle["action_ids"]):
        print("PARITY OK: greedy action-token ids are bit-identical")
        return 0
    print("PARITY FAIL: token mismatch")
    return 1


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
