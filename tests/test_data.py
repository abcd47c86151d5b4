"""Data layer: pairing semantics, transforms, loader, leakage gate."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu import config
from dfu_multimodal_tpu.data import (
    LeakageError, affine_warp, aligned_pairs, augment_and_normalize,
    batch_slices, check_split_leakage, epoch_indices, eval_normalize,
    load_paired, load_single_modality, make_synthetic_dataset, normalize,
    pseudo_pairs, sample_weights)


# ---------- pairing (pure index-space) ----------

def test_aligned_pairs_truncates_to_min():
    pairs = aligned_pairs([5, 3], [2, 7])
    healthy = [p for p in pairs if p.label == 0]
    ulcer = [p for p in pairs if p.label == 1]
    assert len(healthy) == 2 and len(ulcer) == 3
    assert all(p.rgb == p.thermal for p in pairs)


def test_aligned_pairs_missing_modality_uses_placeholder():
    pairs = aligned_pairs([4, 0], [0, 6])
    healthy = [p for p in pairs if p.label == 0]
    ulcer = [p for p in pairs if p.label == 1]
    assert all(p.thermal is None for p in healthy) and len(healthy) == 4
    assert all(p.rgb is None for p in ulcer) and len(ulcer) == 6


def test_pseudo_pairs_modulo_cycling():
    pairs = pseudo_pairs([3, 2], [5, 4], seed=0)
    healthy = sorted((p.rgb, p.thermal) for p in pairs if p.label == 0)
    # max(3,5)=5 pairs cycling rgb mod 3, thermal mod 5
    assert healthy == sorted((i % 3, i % 5) for i in range(5))
    ulcer = [p for p in pairs if p.label == 1]
    assert len(ulcer) == 4
    # class with one empty modality contributes nothing
    assert set(pseudo_pairs([3, 0], [5, 7])) == set(pseudo_pairs([3, 0], [5, 0]))


def test_pseudo_pairs_shuffle_is_seeded():
    assert pseudo_pairs([10, 10], [10, 10], seed=1) == \
        pseudo_pairs([10, 10], [10, 10], seed=1)


# ---------- transforms ----------

def test_normalize_matches_torchvision_formula():
    img = np.full((1, 4, 4, 3), 128, np.uint8)
    out = np.asarray(normalize(jnp.asarray(img), config.RGB_MEAN,
                               config.RGB_STD))
    expected = (128 / 255.0 - np.asarray(config.RGB_MEAN)) / \
        np.asarray(config.RGB_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_affine_warp_identity():
    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    out = affine_warp(img, jnp.eye(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_affine_warp_hflip():
    img = jnp.arange(4 * 4 * 3, dtype=jnp.float32).reshape(4, 4, 3)
    flip = jnp.asarray(np.diag([-1.0, 1.0, 1.0]))
    out = affine_warp(img, flip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img[:, ::-1]),
                               atol=1e-4)


def naive_warp(image, inv):
    """Reference bilinear warp (pure numpy, per-corner masks)."""
    h, w, c = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    out = np.zeros_like(image, dtype=np.float64)
    for i in range(h):
        for j in range(w):
            sx = inv[0, 0] * (j - cx) + inv[0, 1] * (i - cy) + inv[0, 2] + cx
            sy = inv[1, 0] * (j - cx) + inv[1, 1] * (i - cy) + inv[1, 2] + cy
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(c)
            for dy, wy_ in ((0, 1 - fy), (1, fy)):
                for dx, wx_ in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        acc += wy_ * wx_ * image[yy, xx]
            out[i, j] = acc
    return out


@pytest.mark.parametrize("seed", range(6))
def test_affine_warp_matches_naive_reference(seed):
    """Random affines incl. big translations/rotations/flips: the packed
    single-gather warp must equal the naive per-corner formulation."""
    rng_ = np.random.default_rng(seed)
    img = rng_.random((9, 11, 3)).astype(np.float32)
    theta = rng_.uniform(-2.5, 2.5)
    s = rng_.uniform(0.5, 1.8)
    inv = np.array([
        [np.cos(theta) / s, -np.sin(theta) / s, rng_.uniform(-6, 6)],
        [np.sin(theta) / s, np.cos(theta) / s, rng_.uniform(-6, 6)],
        [0, 0, 1]], np.float32)
    if seed % 2:
        inv = inv @ np.diag([-1.0, 1.0, 1.0]).astype(np.float32)
    ours = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(inv)))
    ref = naive_warp(img, inv)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_dense_warp_exact_for_axis_aligned():
    """dense_warp (the TPU two-pass matmul warp) is EXACTLY direct bilinear
    for every axis-aligned transform (b = c = 0 ⇒ the passes separate)."""
    from dfu_multimodal_tpu.data.transforms import dense_warp
    rng_ = np.random.default_rng(1)
    img = jnp.asarray(rng_.random((12, 10, 3)).astype(np.float32)) * 255
    cases = {
        "identity": np.eye(3),
        "hflip": np.diag([-1.0, 1.0, 1.0]),
        "vflip": np.diag([1.0, -1.0, 1.0]),
        "translate": np.array([[1, 0, 2.25], [0, 1, -3.5], [0, 0, 1.0]]),
        "scale": np.diag([1 / 1.2, 1 / 1.2, 1.0]),
    }
    for name, m in cases.items():
        a = np.asarray(affine_warp(img, jnp.asarray(m, jnp.float32)))
        d = np.asarray(dense_warp(img, jnp.asarray(m, jnp.float32)))
        np.testing.assert_allclose(d, a, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("deg", [5, 20, 40])
def test_dense_warp_rotation_close_to_direct(deg):
    """With rotation the two-pass warp interpolates along the rotated axes
    (Catmull–Smith) — a valid bilinear reconstruction that agrees with the
    direct warp on smooth content to well under augmentation noise."""
    from dfu_multimodal_tpu.data.transforms import _rot_mat, dense_warp
    yy, xx = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
    smooth = np.stack([np.sin(xx / 9) * np.cos(yy / 7)] * 3, -1)
    img = jnp.asarray(smooth.astype(np.float32)) * 100 + 128
    m = _rot_mat(jnp.deg2rad(float(-deg)))
    a = np.asarray(affine_warp(img, m))
    d = np.asarray(dense_warp(img, m))
    # compare where the bilinear support is fully interior — at the border
    # the two formulations fade to the 0 fill along different axes
    th = np.deg2rad(deg)
    sx = np.cos(th) * (xx - 23.5) + np.sin(th) * (yy - 23.5) + 23.5
    sy = -np.sin(th) * (xx - 23.5) + np.cos(th) * (yy - 23.5) + 23.5
    mask = (sx > 3) & (sx < 44) & (sy > 3) & (sy < 44)
    diff = np.abs(a - d)[mask]
    assert diff.mean() < 0.5                   # mean within 0.2% of range
    assert diff.max() < 2.0                    # interior worst pixel <1%


def test_dense_warp_fill_zero_outside():
    from dfu_multimodal_tpu.data.transforms import dense_warp
    img = jnp.ones((8, 8, 3), jnp.float32) * 200
    shift = jnp.asarray(np.array([[1, 0, 6.0], [0, 1, 0], [0, 0, 1]],
                                 np.float32))
    out = np.asarray(dense_warp(img, shift))
    assert np.all(out[:, 3:] == 0)             # shifted-in region filled 0
    assert np.all(out[:, :2] == 200)


def test_augment_shapes_dtype_and_determinism():
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 32, 32, 3), np.uint8))
    mod = config.rgb_modality()
    key = jax.random.PRNGKey(7)
    a = augment_and_normalize(key, imgs, mod)
    b = augment_and_normalize(key, imgs, mod)
    assert a.shape == (4, 32, 32, 3) and a.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_and_normalize(jax.random.PRNGKey(8), imgs, mod)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_thermal_augment_has_blur_no_jitter():
    mod = config.thermal_modality()
    assert mod.augment.gaussian_blur and not mod.augment.color_jitter
    imgs = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3), np.uint8))
    out = augment_and_normalize(jax.random.PRNGKey(0), imgs, mod)
    assert out.shape == (2, 16, 16, 3)


# ---------- loader over synthetic data ----------

@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    return make_synthetic_dataset(root, images_per_class=5, size=32)


def test_load_single_modality(synth_root):
    ds = load_single_modality(synth_root / "rgb", "train", image_size=32)
    assert ds.arrays["rgb"].shape == (6, 32, 32, 3)   # 3 per class
    assert ds.class_counts.tolist() == [3, 3]


def test_load_paired_aligned_and_pseudo(synth_root):
    aligned = load_paired(synth_root, "test", image_size=32,
                          strategy="aligned")
    assert set(aligned.arrays) == {"rgb", "thermal"}
    assert len(aligned) == 2    # 1 per class (min pairing)
    pseudo = load_paired(synth_root, "test", image_size=32,
                         strategy="pseudo", seed=0)
    assert len(pseudo) == 2


def test_weighted_sampling_balances_classes():
    labels = np.array([0] * 90 + [1] * 10)
    w = sample_weights(labels)
    assert w[:90].sum() == pytest.approx(w[90:].sum())
    rng = np.random.default_rng(0)
    order = epoch_indices(labels, rng, weighted=True)
    frac_minority = (labels[order] == 1).mean()
    assert 0.35 < frac_minority < 0.65


def test_batch_slices_pads_and_masks(synth_root):
    ds = load_single_modality(synth_root / "rgb", "train", image_size=32)
    batches = list(batch_slices(ds, np.arange(len(ds)), batch_size=4))
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (4, 32, 32, 3)
    assert batches[1]["valid"].sum() == len(ds) - 4
    assert batches[1]["rgb"].shape == (4, 32, 32, 3)   # fixed shape


def test_get_dataloaders_contract(synth_root):
    from dfu_multimodal_tpu.data import get_dataloaders
    datasets, make_batches = get_dataloaders(synth_root, batch_size=2,
                                             image_size=32, seed=0)
    assert set(datasets) == {"train", "val", "test"}
    batch = next(iter(make_batches("train")))
    assert set(batch) == {"rgb", "thermal", "label", "valid"}
    assert batch["rgb"].shape == (2, 32, 32, 3)
    # eval split order is deterministic/sequential
    b1 = next(iter(make_batches("test")))
    b2 = next(iter(make_batches("test")))
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_get_dataloaders_modality_surface(synth_root):
    """Early-files surface (reference scripts/early files/dataloader.py:
    210-262): single-modality selection + the max(16, batch//2) eval-batch
    quirk."""
    from dfu_multimodal_tpu.data import get_dataloaders
    datasets, make_batches = get_dataloaders(synth_root, batch_size=40,
                                             image_size=32, modality="rgb")
    batch = next(iter(make_batches("train")))
    assert set(batch) == {"rgb", "label", "valid"}
    assert batch["rgb"].shape == (40, 32, 32, 3)
    ev = next(iter(make_batches("val")))
    assert ev["rgb"].shape[0] == max(16, 40 // 2)
    with pytest.raises(ValueError):
        get_dataloaders(synth_root, modality="depth")


# ---------- early-files aug-after-normalize fill quirk ----------

def test_mean_fill_matches_rotate_after_normalize():
    """The early-files pipelines rotate AFTER Normalize with torchvision's
    zero fill (scripts/early files/dataloader.py:123-147).  Our pipeline
    augments before normalize; filling with the modality mean via
    warp(x - fill) + fill must reproduce normalize-then-rotate exactly
    (bilinear warps are linear in pixel values)."""
    from dfu_multimodal_tpu.data.transforms import _rot_mat, affine_warp
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (16, 16, 3)).astype(np.float32))
    inv = _rot_mat(jnp.float32(25 * np.pi / 180))
    mean, std = config.RGB_MEAN, config.RGB_STD
    fill = jnp.asarray([255.0 * m for m in mean], jnp.float32)
    ours = normalize(affine_warp(img - fill, inv) + fill, mean, std)
    ref = affine_warp(normalize(img, mean, std), inv)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_legacy_augment_config_and_fill_plumbing():
    mod = config.legacy_rgb_modality()
    aug = mod.augment
    assert aug.rotation_degrees == 15.0 and aug.fill_with_mean
    assert not (aug.color_jitter or aug.affine or aug.gaussian_blur)
    # an image equal to the fill constant is invariant under any rotation,
    # so the normalized output must be ~0 everywhere (uint8 rounding only)
    px = np.round(np.asarray(mod.mean) * 255.0).astype(np.uint8)
    imgs = jnp.asarray(np.broadcast_to(px, (2, 16, 16, 3)))
    out = np.asarray(augment_and_normalize(jax.random.PRNGKey(3), imgs, mod))
    assert np.abs(out).max() < 0.03


# ---------- leakage gate ----------

def test_leakage_gate(tmp_path):
    a = tmp_path / "a.jpg"; a.write_bytes(b"imagedata1")
    b = tmp_path / "b.jpg"; b.write_bytes(b"imagedata2")
    dup = tmp_path / "dup.jpg"; dup.write_bytes(b"imagedata1")
    check_split_leakage({"train": [a], "val": [b]}, verbose=False)  # clean
    with pytest.raises(LeakageError):
        check_split_leakage({"train": [a], "test": [dup]}, verbose=False)


# ---------- native threaded JPEG decode (native/decode.cpp) ----------

def _native_decode_available():
    try:
        from dfu_multimodal_tpu import native
        native.decode_jpegs_resized([], 32)
        return True
    except (ImportError, OSError):
        return False


@pytest.mark.skipif(not _native_decode_available(),
                    reason="g++/libjpeg unavailable")
def test_native_decode_bit_exact_vs_pil(tmp_path):
    """The native libjpeg decode + fixed-point BILINEAR resample must be
    BIT-IDENTICAL to the PIL oracle (load_image) — this is what lets the
    loader default to it without perturbing converted-checkpoint eval
    parity.  Covers downscale, upscale, no-op size, grayscale, q100."""
    from PIL import Image

    from dfu_multimodal_tpu import native
    from dfu_multimodal_tpu.data.loader import load_image

    rng = np.random.default_rng(7)
    specs = [(300, 200, "RGB", 95), (64, 64, "RGB", 90),
             (40, 80, "RGB", 85), (120, 90, "L", 90), (37, 53, "RGB", 100)]
    paths = []
    for i, (w, h, mode, q) in enumerate(specs):
        shape = (h, w, 3) if mode == "RGB" else (h, w)
        arr = rng.integers(0, 256, shape, np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(arr, mode).save(p, quality=q)
        paths.append(str(p))
    imgs, status = native.decode_jpegs_resized(paths, 64, threads=2)
    assert status.tolist() == [0] * len(paths)
    for i, p in enumerate(paths):
        ref = load_image(Path(p), 64)
        np.testing.assert_array_equal(imgs[i], ref, err_msg=f"spec {i}")


@pytest.mark.skipif(not _native_decode_available(),
                    reason="g++/libjpeg unavailable")
def test_decode_all_falls_back_per_file(tmp_path, monkeypatch):
    """decode_all: native fast path for JPEGs, per-file PIL fallback for
    files libjpeg rejects (PNG, corrupt), identical output either way."""
    from PIL import Image

    from dfu_multimodal_tpu.data.loader import decode_all

    rng = np.random.default_rng(8)
    jpg = tmp_path / "a.jpg"
    Image.fromarray(rng.integers(0, 256, (50, 60, 3), np.uint8)).save(
        jpg, quality=92)
    png = tmp_path / "b.png"
    Image.fromarray(rng.integers(0, 256, (30, 30, 3), np.uint8)).save(png)
    bad = tmp_path / "c.jpg"
    bad.write_bytes(b"not a jpeg at all")

    with pytest.raises(Exception):      # corrupt file fails both paths
        decode_all([jpg, png, bad], 32)

    mixed = decode_all([jpg, None, png], 32)
    monkeypatch.setenv("DFU_NATIVE_DECODE", "0")
    pil_only = decode_all([jpg, None, png], 32)
    np.testing.assert_array_equal(mixed, pil_only)
    assert (mixed[1] == 0).all()        # None slot stays the placeholder


# ---------- persistent mmap-backed decode cache (data/cache.py) ----------

def _write_jpegs(tmp_path, n, seed=3):
    from PIL import Image
    rng = np.random.default_rng(seed)
    tmp_path.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 256, (40 + i, 50, 3), np.uint8)).save(
            p, quality=90)
        paths.append(p)
    return paths


def test_cached_decode_bit_exact_and_memmap(tmp_path):
    """Cache build returns the exact decode_raw block as a read-only
    memmap; a second call is a pure cache hit (no decoding at all)."""
    from dfu_multimodal_tpu.data import cache as cache_mod
    from dfu_multimodal_tpu.data.loader import decode_raw

    paths = _write_jpegs(tmp_path / "src", 7)
    cdir = tmp_path / "cache"
    got = cache_mod.cached_decode([paths[0], None] + paths[1:], 32, cdir,
                                  chunk=3)   # chunk < n: chunked build
    ref = decode_raw([paths[0], None] + paths[1:], 32)
    assert isinstance(got, np.memmap) and not got.flags.writeable
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert (np.asarray(got[1]) == 0).all()   # None placeholder row

    # Hit path must not decode: poison decode_raw and call again.
    import dfu_multimodal_tpu.data.loader as loader_mod
    orig = loader_mod.decode_raw
    loader_mod.decode_raw = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("cache miss on identical inputs"))
    try:
        hit = cache_mod.cached_decode([paths[0], None] + paths[1:], 32,
                                      cdir)
    finally:
        loader_mod.decode_raw = orig
    np.testing.assert_array_equal(np.asarray(hit), ref)


def test_cached_decode_invalidates_on_file_change(tmp_path):
    """Key covers per-file size+mtime: rewriting a file rebuilds."""
    import os

    from dfu_multimodal_tpu.data import cache as cache_mod

    paths = _write_jpegs(tmp_path / "src", 3)
    cdir = tmp_path / "cache"
    k1 = cache_mod.cache_key(paths, 32)
    cache_mod.cached_decode(paths, 32, cdir)

    os.utime(paths[1], ns=(1, 1))           # mtime change -> new key
    k2 = cache_mod.cache_key(paths, 32)
    assert k1 != k2
    assert k2 != cache_mod.cache_key(paths, 48)   # size in the key too
    got = cache_mod.cached_decode(paths, 32, cdir)
    assert len(list(cdir.glob("*.u8"))) == 2      # both entries live
    from dfu_multimodal_tpu.data.loader import decode_raw
    np.testing.assert_array_equal(np.asarray(got), decode_raw(paths, 32))


def test_cached_decode_rejects_truncated_entry(tmp_path):
    """A data file whose size disagrees with the sidecar is rebuilt,
    not trusted (crash-safety contract)."""
    from dfu_multimodal_tpu.data import cache as cache_mod

    paths = _write_jpegs(tmp_path / "src", 2)
    cdir = tmp_path / "cache"
    # copy, not view: truncating the file below invalidates memmap pages
    first = np.array(cache_mod.cached_decode(paths, 32, cdir))
    data_file = next(cdir.glob("*.u8"))
    data_file.write_bytes(data_file.read_bytes()[:-8])   # truncate
    rebuilt = cache_mod.cached_decode(paths, 32, cdir)
    np.testing.assert_array_equal(np.asarray(rebuilt), first)
    assert data_file.stat().st_size == first.nbytes      # restored


def test_decode_all_routes_through_env_cache(tmp_path, monkeypatch):
    """DFU_CACHE_DIR (what --cache-dir sets) routes every decode_all
    through the cache; output identical to the uncached path."""
    from dfu_multimodal_tpu.data.loader import decode_all, decode_raw

    paths = _write_jpegs(tmp_path / "src", 4)
    uncached = decode_all(paths, 32)
    assert not isinstance(uncached, np.memmap)

    cdir = tmp_path / "envcache"
    monkeypatch.setenv("DFU_CACHE_DIR", str(cdir))
    cached = decode_all(paths, 32)
    assert isinstance(cached, np.memmap)
    np.testing.assert_array_equal(np.asarray(cached), uncached)
    assert list(cdir.glob("*.json"))         # sidecar written


def test_loaders_accept_cache_dir(synth_root, tmp_path):
    """load_single_modality / load_paired cache_dir= params produce
    datasets identical to the uncached ones."""
    cdir = tmp_path / "dscache"
    plain = load_single_modality(synth_root / "rgb", "train")
    cached = load_single_modality(synth_root / "rgb", "train",
                                  cache_dir=cdir)
    np.testing.assert_array_equal(np.asarray(cached.arrays["rgb"]),
                                  plain.arrays["rgb"])
    p_plain = load_paired(synth_root, "test", strategy="aligned")
    p_cached = load_paired(synth_root, "test", strategy="aligned",
                           cache_dir=cdir)
    for k in ("rgb", "thermal"):
        np.testing.assert_array_equal(np.asarray(p_cached.arrays[k]),
                                      p_plain.arrays[k])


def test_get_dataloaders_reshuffles_per_epoch(synth_root):
    """The reference DataLoader(shuffle=True) contract: consecutive
    epochs draw DIFFERENT batch orders from the default generator (a
    per-call re-seed would hand every epoch the identical order)."""
    from dfu_multimodal_tpu.data.loader import get_dataloaders

    datasets, make_batches = get_dataloaders(synth_root, batch_size=4,
                                             image_size=32, seed=0)
    def label_order(batches):
        out = []
        for b in batches:
            v = np.asarray(b["valid"]).astype(bool)
            out.extend(np.asarray(b["label"])[v].tolist())
        return out

    e1 = label_order(make_batches("train"))
    e2 = label_order(make_batches("train"))
    n = len(datasets["train"])
    assert len(e1) == len(e2) == n
    assert sorted(e1) == sorted(e2)  # same multiset of samples...
    assert e1 != e2                  # ...in a different order per epoch
    # same seed reproduces the same FIRST epoch on a fresh factory
    _, mb2 = get_dataloaders(synth_root, batch_size=4,
                             image_size=32, seed=0)
    assert label_order(mb2("train")) == e1


def test_dense_warp_safety_guard():
    """Rotation-heavy configs must not silently hit dense_warp's 1/d
    singularity: 'auto' falls back to the gather path, an explicit
    'dense' request raises."""
    import dataclasses

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.transforms import (affine_warp,
                                                    dense_warp_safe,
                                                    resolve_warp)

    safe = config.AugmentConfig()              # defaults: 30+20 deg, 1.2x
    assert dense_warp_safe(safe)
    risky = dataclasses.replace(safe, rotation_degrees=75.0)
    assert not dense_warp_safe(risky)          # 75+20 deg: cos -> ~0
    assert resolve_warp("auto", risky) is affine_warp
    with pytest.raises(ValueError, match="unsafe"):
        resolve_warp("dense", risky)
    # gather is always allowed
    assert resolve_warp("gather", risky) is affine_warp


def test_color_jitter_saturation_uses_post_contrast_gray():
    """torchvision adjust_saturation blends against the grayscale of ITS
    input (the post-contrast image); verify against the hand-computed
    composition."""
    import jax

    from dfu_multimodal_tpu import config
    from dfu_multimodal_tpu.data.transforms import _color_jitter

    cfg = dataclasses_replace_aug(aug_prob=1.0)
    key = jax.random.PRNGKey(3)
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (8, 8, 3)), jnp.float32)
    out = np.asarray(_color_jitter(key, img, cfg))

    # reproduce the sampled factors exactly as _color_jitter draws them
    k_apply, kb, kc, ks = jax.random.split(key, 4)
    b = float(jax.random.uniform(kb, minval=1 - cfg.brightness,
                                 maxval=1 + cfg.brightness))
    c = float(jax.random.uniform(kc, minval=1 - cfg.contrast,
                                 maxval=1 + cfg.contrast))
    s = float(jax.random.uniform(ks, minval=1 - cfg.saturation,
                                 maxval=1 + cfg.saturation))
    x = np.asarray(img) * b
    def luma(im):
        return 0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]
    x = luma(x).mean() * (1 - c) + x * c
    x = luma(x)[..., None] * (1 - s) + x * s       # gray of post-contrast
    np.testing.assert_allclose(out, np.clip(x, 0, 255), atol=1e-3)


def dataclasses_replace_aug(**kw):
    import dataclasses

    from dfu_multimodal_tpu import config
    return dataclasses.replace(config.AugmentConfig(), **kw)


def test_synthetic_any_size():
    """make_image must work for sizes that are not multiples of 8."""
    from dfu_multimodal_tpu.data.synthetic import make_image

    rng = np.random.default_rng(0)
    for size in (100, 97, 224):
        img = make_image(rng, "rgb", 1, size=size)
        assert img.shape == (size, size, 3) and img.dtype == np.uint8


def test_cached_decode_cleans_tmp_on_failure(tmp_path, monkeypatch):
    """A decode error mid-build must not leak the dataset-sized .tmp
    file into the cache directory."""
    from dfu_multimodal_tpu.data import cache as cache_mod

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(3):
        p = img_dir / f"{i}.jpg"
        from PIL import Image
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
        paths.append(p)

    def boom(paths, image_size):
        raise RuntimeError("decode exploded")

    # cached_decode imports decode_raw from the loader module at call
    # time — patch it at its source
    from dfu_multimodal_tpu.data import loader as loader_mod
    monkeypatch.setattr(loader_mod, "decode_raw", boom)
    cache_dir = tmp_path / "cache"
    with pytest.raises(RuntimeError, match="decode exploded"):
        cache_mod.cached_decode(paths, 8, cache_dir)
    leftovers = [p for p in cache_dir.iterdir() if ".tmp" in p.name]
    assert leftovers == []
