"""Convert a reference torch checkpoint into a framework checkpoint.

Takes a ``best_model.pt`` produced by the reference trainers (torch.save
dict with 'model_state_dict', reference notebooks/train_rgb_only.py:310-316,
incl. the ``backbone.*`` prefix quirk) and writes our msgpack checkpoint so
every eval CLI (extended_metrics, grad_cam, tta) runs on it directly.

    python -m dfu_multimodal_tpu.cli.convert_checkpoint \
        --model rgb_only --torch-checkpoint best_model.pt --output <dir>
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from dfu_multimodal_tpu.models import zoo
from dfu_multimodal_tpu.tools.convert_torch import convert_checkpoint_file
from dfu_multimodal_tpu.utils import checkpoint as ckpt_mod


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert torch checkpoint -> framework checkpoint")
    parser.add_argument("--model", required=True,
                        choices=["rgb_only", "thermal_only", "multimodal"])
    parser.add_argument("--torch-checkpoint", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True,
                        help="checkpoint directory to write")
    parser.add_argument("--image-size", type=int, default=224)
    args = parser.parse_args(argv)

    module, spec = zoo.build(args.model)
    variables = zoo.init_model(module, spec, jax.random.PRNGKey(0),
                               args.image_size)
    merged, skipped, meta = convert_checkpoint_file(
        args.model, args.torch_checkpoint, dict(variables))
    print(f"Converted with {skipped} skipped leaves "
          f"(shape-mismatched heads keep fresh init)")

    ckpt_mod.save_checkpoint(
        args.output, epoch=int(meta.get("epoch", 0)),
        model_state=merged, opt_state={},
        val_f1=float(meta.get("val_f1", 0.0)),
        history=meta.get("history", {}),
        extra_meta={"model": args.model,
                    "converted_from": str(args.torch_checkpoint)})
    print(f"Wrote {args.output}/best_model.msgpack")
    return 0      # exit code (skipped-leaf count is printed above; the
                  # dfu dispatcher treats int returns as exit codes)


if __name__ == "__main__":
    main()
