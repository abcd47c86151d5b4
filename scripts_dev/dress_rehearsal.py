"""Full-scale dress rehearsal on reference-sized synthetic data.

Generates a synthetic dataset with the reference's split sizes
(BASELINE.md: RGB 738/158/159, thermal 1227/422/217), runs every pipeline
stage end-to-end on the TPU, and leaves the complete artifact tree under
--workdir. Used to validate the framework at realistic scale; quality
numbers are vs the synthetic classes (separable by construction).

    python scripts_dev/dress_rehearsal.py --stage 1   # data + rgb + thermal
    python scripts_dev/dress_rehearsal.py --stage 2   # multimodal + evals
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))

# Reference split sizes (BASELINE.md "Dataset scale")
COUNTS = {
    "rgb": {"train": (380, 358), "val": (81, 77), "test": (82, 77)},
    "thermal": {"train": (612, 615), "val": (170, 252), "test": (108, 109)},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", type=int, default=1)
    parser.add_argument("--workdir", type=Path,
                        default=Path("/tmp/dfu_rehearsal"))
    args = parser.parse_args()

    data = args.workdir / "data"
    logs = args.workdir / "logs"
    common = ["--data-dir", str(data), "--checkpoint-root", str(logs)]

    if args.stage == 1:
        if not (data / "rgb" / "train").exists():
            print("Generating reference-sized synthetic dataset ...")
            t0 = time.time()
            from dfu_multimodal_tpu.data.synthetic import \
                make_synthetic_dataset
            make_synthetic_dataset(data, counts=COUNTS, size=224, seed=7)
            print(f"  done in {time.time() - t0:.0f}s")

        from dfu_multimodal_tpu.cli.train_rgb_only import main as rgb_main
        t0 = time.time()
        res = rgb_main(common + ["--epochs", "10"])
        print(f"[stage1] rgb_only: {res} ({time.time() - t0:.0f}s)")

        from dfu_multimodal_tpu.cli.train_thermal_only import main as th_main
        t0 = time.time()
        res = th_main(common + ["--epochs", "5", "--batch-size", "16"])
        print(f"[stage1] thermal_only: {res} ({time.time() - t0:.0f}s)")

    elif args.stage == 2:
        from dfu_multimodal_tpu.cli.train_multimodal_fusion import \
            main as mm_main
        t0 = time.time()
        res = mm_main(common + ["--epochs", "2", "--batch-size", "24",
                                "--save-best-after", "1"])
        print(f"[stage2] multimodal: {res} ({time.time() - t0:.0f}s)")

    elif args.stage == 3:
        from dfu_multimodal_tpu.cli.extended_metrics import main as em_main
        t0 = time.time()
        em_main(common)
        print(f"[stage3] extended_metrics done ({time.time() - t0:.0f}s)")

        from dfu_multimodal_tpu.cli.grad_cam_visualization import \
            main as cam_main
        t0 = time.time()
        res = cam_main(common + ["--num-per-class", "5"])
        print(f"[stage3] grad_cam: {res} ({time.time() - t0:.0f}s)")

    elif args.stage == 4:
        from dfu_multimodal_tpu.cli.test_time_augmentation import \
            main as tta_main
        t0 = time.time()
        res = tta_main(common + ["--batch-size", "32"])
        summary = {k: {"clean_acc": v["clean"]["accuracy"],
                       "tta_acc": v["tta"]["accuracy"]}
                   for k, v in res.items()}
        print(f"[stage4] tta: {summary} ({time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
