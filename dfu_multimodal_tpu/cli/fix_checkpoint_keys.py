"""Offline checkpoint key migration.

Counterpart of reference notebooks/fix_checkpoint_keys.py (:15-56): rewrite
``backbone.*`` keys to ``resnet.*``/``vit.*`` inside a torch ``best_model.pt``
in place.  Our converter (tools/convert_torch.py) strips these prefixes
automatically, so this tool exists for users migrating reference checkpoints
for use with the reference's own eval scripts.

    python -m dfu_multimodal_tpu.cli.fix_checkpoint_keys <ckpt.pt> --to resnet
"""

from __future__ import annotations

import argparse
from pathlib import Path


def fix_checkpoint_keys(path: Path, target_prefix: str = "resnet",
                        dry_run: bool = False) -> int:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state_dict")
    if state is None:
        print("No 'model_state_dict' in checkpoint; nothing to do.")
        return 0

    renamed = {}
    n = 0
    for key, value in state.items():
        if key.startswith("backbone."):
            new_key = f"{target_prefix}." + key[len("backbone."):]
            renamed[new_key] = value
            n += 1
        else:
            renamed[key] = value

    print(f"Renamed {n} keys (backbone.* -> {target_prefix}.*)")
    if n and not dry_run:
        ckpt["model_state_dict"] = renamed
        torch.save(ckpt, path)
        print(f"Updated in place: {path}")
    return n


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fix checkpoint key names")
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("--to", default="resnet", choices=["resnet", "vit"])
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)
    fix_checkpoint_keys(args.checkpoint, args.to, args.dry_run)
    return 0      # count is printed; the dfu dispatcher reads int
                  # returns as exit codes


if __name__ == "__main__":
    main()
