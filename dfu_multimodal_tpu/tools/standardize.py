"""Image standardization: aspect-preserving resize + pad to a square.

Counterpart of reference scripts/standardize_images.py (SURVEY.md §2 #6):
resize so the longest edge equals ``target`` with PIL bilinear, paste
centered on a black square canvas, save; then a verification pass asserting
every output is exactly ``target x target`` (:13-100, :102-156).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

from dfu_multimodal_tpu.data.layout import IMAGE_EXTS


def standardize_image(src: Path, dst: Path, target: int = 224,
                      fill=(0, 0, 0)) -> Tuple[int, int]:
    """Standardize one image; returns the original (width, height)."""
    from PIL import Image

    with Image.open(src) as img:
        img = img.convert("RGB")
        ow, oh = img.size
        scale = target / max(ow, oh)
        nw, nh = max(1, round(ow * scale)), max(1, round(oh * scale))
        resized = img.resize((nw, nh), Image.BILINEAR)
        canvas = Image.new("RGB", (target, target), fill)
        canvas.paste(resized, ((target - nw) // 2, (target - nh) // 2))
        dst.parent.mkdir(parents=True, exist_ok=True)
        canvas.save(dst, quality=95)
    return ow, oh


def standardize_tree(src_root: Path, dst_root: Path, target: int = 224,
                     verbose: bool = True) -> Dict[str, int]:
    """Standardize every image under ``src_root`` preserving the relative
    directory layout. Returns {'processed': n, 'errors': n}."""
    src_root, dst_root = Path(src_root), Path(dst_root)
    processed = errors = 0
    for src in sorted(src_root.rglob("*")):
        if src.suffix.lower() not in IMAGE_EXTS or not src.is_file():
            continue
        dst = dst_root / src.relative_to(src_root)
        try:
            standardize_image(src, dst, target)
            processed += 1
        except OSError as e:
            errors += 1
            if verbose:
                print(f"  error: {src}: {e}")
    if verbose:
        print(f"Standardized {processed} images -> {dst_root} "
              f"({errors} errors)")
    return {"processed": processed, "errors": errors}


def verify_standardization(root: Path, target: int = 224,
                           verbose: bool = True) -> Dict[str, int]:
    """Post-condition check: every image is exactly target x target
    (reference :102-156)."""
    from PIL import Image

    ok = bad = 0
    offenders = []
    for p in sorted(Path(root).rglob("*")):
        if p.suffix.lower() not in IMAGE_EXTS or not p.is_file():
            continue
        with Image.open(p) as img:
            if img.size == (target, target):
                ok += 1
            else:
                bad += 1
                offenders.append((str(p), img.size))
    if verbose:
        print(f"Verification: {ok} OK, {bad} wrong-size")
        for path, size in offenders[:10]:
            print(f"  {path}: {size}")
    return {"ok": ok, "bad": bad}
