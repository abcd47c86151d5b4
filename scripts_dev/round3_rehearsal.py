"""Round-3 TPU rehearsal: transformer attribution + ResNet QAT at 224px.

Validates the two round-3 model-path features end-to-end on the real
chip with synthetic 224px data (the real Kaggle data is unreachable —
zero egress):

1. thermal_only trains 2 epochs, then the grad-cam CLI renders PNGs with
   all three --cam-method values (saliency / rollout / chefer);
2. rgb_only trains 2 epochs WITH --qat (the new ResNet conv-grid
   fake-quant), then the int8 serving rebuild scores the test split and
   the decision-flip count vs the fp32 path is reported (expected 0).

    python scripts_dev/round3_rehearsal.py [--workdir /tmp/dfu_r3]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

COUNTS = {
    "rgb": {"train": (120, 110), "val": (30, 28), "test": (30, 28)},
    "thermal": {"train": (120, 110), "val": (30, 28), "test": (30, 28)},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", type=Path, default=Path("/tmp/dfu_r3"))
    args = parser.parse_args()
    data, logs = args.workdir / "data", args.workdir / "logs"
    common = ["--data-dir", str(data), "--checkpoint-root", str(logs)]

    if not (data / "thermal" / "train").exists():
        print("Generating 224px synthetic dataset ...", flush=True)
        t0 = time.time()
        from dfu_multimodal_tpu.data.synthetic import make_synthetic_dataset
        make_synthetic_dataset(data, counts=COUNTS, size=224, seed=11)
        print(f"  done in {time.time() - t0:.0f}s", flush=True)

    from dfu_multimodal_tpu.cli.train_thermal_only import main as th_main
    t0 = time.time()
    res = th_main(common + ["--epochs", "2", "--batch-size", "16",
                            "--save-best-after", "0"])
    print(f"[r3] thermal_only: {res} ({time.time() - t0:.0f}s)", flush=True)

    # all three ViT attribution methods on the real chip
    from dfu_multimodal_tpu.cli.grad_cam_visualization import main as cam
    for method in ("saliency", "rollout", "chefer"):
        t0 = time.time()
        out = cam(common + ["--models", "thermal_only", "--num-per-class",
                            "2", "--cam-method", method, "--cam-class",
                            "pred", "--output-dir",
                            str(logs / f"grad_cam_{method}")])
        print(f"[r3] thermal CAM --cam-method {method}: {out} "
              f"({time.time() - t0:.0f}s)", flush=True)

    from dfu_multimodal_tpu.cli.train_rgb_only import main as rgb_main
    t0 = time.time()
    res = rgb_main(common + ["--epochs", "2", "--qat",
                             "--save-best-after", "0"])
    print(f"[r3] rgb_only --qat: {res} ({time.time() - t0:.0f}s)",
          flush=True)

    # decision-flip check: fp32 vs the real int8 serving rebuild on the
    # QAT checkpoint (weights requantize losslessly; the only remaining
    # int8 error source is the calibrated activation grid)
    from dfu_multimodal_tpu.cli.predict import main as predict
    ckpt = logs / "checkpoints_rgb_only"
    test_dirs = [data / "rgb" / "test" / c for c in ("healthy", "ulcer")]
    flips = total = 0
    for d in test_dirs:
        base = predict(["--checkpoint", str(ckpt), "--images", str(d)])
        q = predict(["--checkpoint", str(ckpt), "--images", str(d),
                     "--int8", "--calib-images",
                     str(data / "rgb" / "val" / "healthy")])
        for k in base:
            total += 1
            if base[k][1] != q[k][1]:
                flips += 1
    print(f"[r3] QAT rgb int8 decision flips: {flips}/{total}", flush=True)


if __name__ == "__main__":
    main()
