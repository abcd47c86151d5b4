"""torch -> JAX checkpoint converter for the reference model families.

Maps torchvision ``resnet50`` and timm ``vit_base_patch16_224`` state_dicts
(including checkpoints trained by the reference, with its ``backbone.*``
prefix quirk — reference notebooks/extended_metrics.py:50-63 and the offline
key migration in fix_checkpoint_keys.py:15-56) onto this framework's Flax
variable trees:

- conv weights OIHW -> HWIO; linear weights (out, in) -> (in, out);
- BatchNorm weight/bias -> scale/bias params, running_mean/var -> batch_stats;
- ViT patch-embed conv (768, 3, 16, 16) -> the single patch matmul kernel
  (16·16·3, 768) in (row, col, channel)-flattened order;
- timm's packed qkv [q|k|v] maps directly onto our fused qkv projection;
- classifier heads are converted when shapes match, else left at init
  (the reference's strict=False + shape-skip behavior).

Shape-checked against ``zoo.init_shapes``; numerically verified against
``torch.nn.functional`` in tests/test_convert_torch.py (torchvision/timm are
not installed in this image, so tests build state_dicts with the canonical
key names directly).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

PREFIXES = ("backbone.", "resnet.", "vit.", "module.", "rgb_branch.",
            "thermal_branch.")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_prefix(key: str) -> str:
    changed = True
    while changed:
        changed = False
        for p in PREFIXES:
            if key.startswith(p):
                key = key[len(p):]
                changed = True
    return key


def conv_kernel(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    """(out, in) -> (in, out)."""
    return _np(w).transpose(1, 0)


def patch_embed_kernel(w) -> np.ndarray:
    """Conv (O, C, P, P) -> dense ((P·P·C), O) in (row, col, chan) order."""
    w = _np(w)
    o, c, ph, pw = w.shape
    return w.transpose(2, 3, 1, 0).reshape(ph * pw * c, o)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def convert_resnet50(state_dict: Dict[str, Any],
                     trunk_path: Tuple[str, ...] = ("ResNet_0",)
                     ) -> Dict[str, Dict]:
    """torchvision resnet50 state_dict -> {'params', 'batch_stats'} subtrees
    rooted at ``trunk_path`` (our ResNet trunk module scope)."""
    params: Dict = {}
    stats: Dict = {}

    def handle_bn(scope: Tuple[str, ...], base: str):
        _set(params, scope + ("scale",), _np(state_dict[base + ".weight"]))
        _set(params, scope + ("bias",), _np(state_dict[base + ".bias"]))
        _set(stats, scope + ("mean",),
             _np(state_dict[base + ".running_mean"]))
        _set(stats, scope + ("var",), _np(state_dict[base + ".running_var"]))

    keys = {strip_prefix(k): k for k in state_dict}
    sd = {k: state_dict[orig] for k, orig in keys.items()}
    state_dict = sd

    _set(params, trunk_path + ("stem_conv", "kernel"),
         conv_kernel(state_dict["conv1.weight"]))
    handle_bn(trunk_path + ("stem_bn",), "bn1")

    for key in state_dict:
        m = re.match(r"layer(\d+)\.(\d+)\.conv(\d+)\.weight$", key)
        if m:
            stage, block, conv = (int(g) for g in m.groups())
            scope = trunk_path + (f"stage{stage}_block{block}",
                                  f"conv{conv}", "kernel")
            _set(params, scope, conv_kernel(state_dict[key]))
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.bn(\d+)\.weight$", key)
        if m:
            stage, block, bn = (int(g) for g in m.groups())
            handle_bn(trunk_path + (f"stage{stage}_block{block}",
                                    f"bn{bn}"),
                      f"layer{stage}.{block}.bn{bn}")
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            stage, block = (int(g) for g in m.groups())
            _set(params, trunk_path + (f"stage{stage}_block{block}",
                                       "down_conv", "kernel"),
                 conv_kernel(state_dict[key]))
            handle_bn(trunk_path + (f"stage{stage}_block{block}", "down_bn"),
                      f"layer{stage}.{block}.downsample.1")

    head = _extract_linear_head(state_dict, ("fc.1", "fc"))
    return {"params": params, "batch_stats": stats, "head": head}


def convert_vit_b16(state_dict: Dict[str, Any],
                    trunk_path: Tuple[str, ...] = ("ViT_0",),
                    scan_layout: bool = True) -> Dict[str, Dict]:
    """timm vit_base_patch16_224 state_dict -> our ViT trunk subtree."""
    keys = {strip_prefix(k): k for k in state_dict}
    state_dict = {k: state_dict[orig] for k, orig in keys.items()}
    params: Dict = {}

    _set(params, trunk_path + ("cls_token",),
         _np(state_dict["cls_token"]).reshape(1, 1, -1))
    _set(params, trunk_path + ("pos_embed",), _np(state_dict["pos_embed"]))
    _set(params, trunk_path + ("patch_embed", "kernel"),
         patch_embed_kernel(state_dict["patch_embed.proj.weight"]))
    _set(params, trunk_path + ("patch_embed", "bias"),
         _np(state_dict["patch_embed.proj.bias"]))

    # Our ViT scans its encoder blocks by default: per-leaf params STACKED
    # along a leading depth axis under scope 'encoder' (models/vit.py
    # scan_blocks). With scan_layout=False the unrolled per-block layout
    # ('block{i}' scopes) is produced instead.
    depth = 1 + max(int(m.group(1)) for k in state_dict
                    if (m := re.match(r"blocks\.(\d+)\.", k)))

    per_block = [
        ("norm1", "scale", "blocks.{}.norm1.weight", _np),
        ("norm1", "bias", "blocks.{}.norm1.bias", _np),
        ("norm2", "scale", "blocks.{}.norm2.weight", _np),
        ("norm2", "bias", "blocks.{}.norm2.bias", _np),
        (("attn", "qkv"), "kernel", "blocks.{}.attn.qkv.weight",
         linear_kernel),
        (("attn", "qkv"), "bias", "blocks.{}.attn.qkv.bias", _np),
        (("attn", "proj"), "kernel", "blocks.{}.attn.proj.weight",
         linear_kernel),
        (("attn", "proj"), "bias", "blocks.{}.attn.proj.bias", _np),
        ("mlp_fc1", "kernel", "blocks.{}.mlp.fc1.weight", linear_kernel),
        ("mlp_fc1", "bias", "blocks.{}.mlp.fc1.bias", _np),
        ("mlp_fc2", "kernel", "blocks.{}.mlp.fc2.weight", linear_kernel),
        ("mlp_fc2", "bias", "blocks.{}.mlp.fc2.bias", _np),
    ]

    def sub_scope(mod):
        return mod if isinstance(mod, tuple) else (mod,)

    if scan_layout:
        scope = trunk_path + ("encoder",)
        for mod, leaf, fmt, transform in per_block:
            _set(params, scope + sub_scope(mod) + (leaf,),
                 np.stack([transform(state_dict[fmt.format(i)])
                           for i in range(depth)]))
    else:
        for i in range(depth):
            scope = trunk_path + (f"block{i}",)
            for mod, leaf, fmt, transform in per_block:
                _set(params, scope + sub_scope(mod) + (leaf,),
                     transform(state_dict[fmt.format(i)]))

    _set(params, trunk_path + ("norm", "scale"), _np(state_dict["norm.weight"]))
    _set(params, trunk_path + ("norm", "bias"), _np(state_dict["norm.bias"]))

    head = _extract_linear_head(state_dict, ("head.1", "head"))
    return {"params": params, "batch_stats": {}, "head": head}


def _extract_linear_head(state_dict: Dict[str, Any], candidates
                         ) -> Optional[Dict[str, np.ndarray]]:
    """First present Linear head among candidate bases ('fc', 'fc.1', ...):
    the reference heads are Sequential(Dropout, Linear) -> '<base>.1'."""
    for base in candidates:
        wkey = f"{base}.weight"
        if wkey in state_dict:
            return {"kernel": linear_kernel(state_dict[wkey]),
                    "bias": _np(state_dict.get(f"{base}.bias",
                                               np.zeros(1)))}
    return None


def _merge_into(variables: Dict, converted: Dict,
                head_scope: str = "head") -> Tuple[Dict, int]:
    """Merge converted subtrees into a fresh variables tree; shape-mismatched
    leaves (e.g. 1000-class heads) keep their init. Returns (tree, skipped)."""
    from flax import traverse_util

    flat_target = traverse_util.flatten_dict(variables)
    skipped = 0
    for col in ("params", "batch_stats"):
        flat_src = traverse_util.flatten_dict(converted.get(col, {}))
        for path, value in flat_src.items():
            key = (col,) + path
            if key in flat_target and np.shape(value) == np.shape(
                    flat_target[key]):
                flat_target[key] = np.asarray(
                    value, dtype=np.asarray(flat_target[key]).dtype)
            else:
                skipped += 1
    head = converted.get("head")
    if head is not None:
        for leaf in ("kernel", "bias"):
            key = ("params", head_scope, leaf)
            if key in flat_target and np.shape(head[leaf]) == np.shape(
                    flat_target[key]):
                flat_target[key] = np.asarray(
                    head[leaf], dtype=np.asarray(flat_target[key]).dtype)
            else:
                skipped += 1
    return traverse_util.unflatten_dict(flat_target), skipped


def _uses_scan_layout(variables: Dict, trunk: str) -> bool:
    """Detect whether the target ViT trunk uses the scanned (stacked)
    encoder layout or unrolled per-block scopes."""
    params = variables.get("params", {})
    for scope, sub in params.items():
        if scope.startswith(trunk) and isinstance(sub, dict):
            return "encoder" in sub
    return True


def convert_state_dict(model_name: str, state_dict: Dict[str, Any],
                       variables: Dict) -> Tuple[Dict, int]:
    """Convert a torch state_dict into a ready-to-use variables tree for
    zoo model ``model_name``. Returns (variables, n_skipped)."""
    if model_name == "rgb_only":
        converted = convert_resnet50(state_dict, ("ResNet_0",))
    elif model_name == "thermal_only":
        converted = convert_vit_b16(
            state_dict, ("ViT_0",),
            scan_layout=_uses_scan_layout(variables, "ViT"))
    elif model_name == "multimodal":
        rgb_keys = {k: v for k, v in state_dict.items()
                    if strip_prefix(k).startswith(("conv1", "bn1", "layer"))
                    or k.startswith(("rgb_branch.", "resnet."))}
        vit_keys = {k: v for k, v in state_dict.items()
                    if k.startswith(("thermal_branch.", "vit."))
                    or strip_prefix(k).startswith(
                        ("cls_token", "pos_embed", "patch_embed", "blocks",
                         "norm."))}
        r = convert_resnet50(rgb_keys, ("rgb_branch",))
        v = convert_vit_b16(
            vit_keys, ("thermal_branch",),
            scan_layout=_uses_scan_layout(variables, "thermal_branch"))
        converted = {
            "params": {**r["params"], **v["params"]},
            "batch_stats": {**r["batch_stats"], **v["batch_stats"]},
            "head": None,
        }
        # fusion MLP: fusion.{0,3,6} Linear layers -> fusion/fc{1,2,3}
        for torch_idx, ours in (("0", "fc1"), ("3", "fc2"), ("6", "fc3")):
            wkey = f"fusion.{torch_idx}.weight"
            if wkey in state_dict:
                converted["params"].setdefault("fusion", {})[ours] = {
                    "kernel": linear_kernel(state_dict[wkey]),
                    "bias": _np(state_dict[f"fusion.{torch_idx}.bias"]),
                }
    else:
        raise ValueError(f"no converter for model {model_name!r}")
    return _merge_into(variables, converted)


def convert_checkpoint_file(model_name: str, torch_ckpt_path: Path,
                            variables: Dict) -> Tuple[Dict, int, Dict]:
    """Load a reference ``best_model.pt`` (torch.save dict with
    'model_state_dict', train_rgb_only.py:310-316) and convert.
    Returns (variables, skipped, meta)."""
    import torch

    ckpt = torch.load(torch_ckpt_path, map_location="cpu",
                      weights_only=False)
    state_dict = ckpt.get("model_state_dict", ckpt)
    merged, skipped = convert_state_dict(model_name, state_dict, variables)
    meta = {k: ckpt[k] for k in ("epoch", "val_f1", "history")
            if isinstance(ckpt, dict) and k in ckpt}
    return merged, skipped, meta
