"""Measure the train-step cost of model EMA (--ema-decay).

The EMA update is one elementwise d·e + (1-d)·p over the param tree per
optimizer step: ~3 HBM accesses/param fp32 (read e, read p, write e) on top
of AdamW's update traffic. This script A/Bs the full jitted train step
(augment + fwd + bwd + AdamW [+ EMA]) so docs can carry the honest opt-in
price.

Run ON TPU: python scripts_dev/bench_ema.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import measure_training  # noqa: E402


def main():
    for model, bs in (("thermal_only", 32), ("rgb_only", 32)):
        base = measure_training(bs, 5, chain=8, model=model)
        ema = measure_training(bs, 5, chain=8, model=model, ema_decay=0.999)
        d = ema["p50_step_ms"] - base["p50_step_ms"]
        print(f"{model:14s} b{bs}: base {base['p50_step_ms']:7.2f} ms "
              f"({base['train_images_per_sec_per_chip']:7.1f} img/s) | "
              f"ema {ema['p50_step_ms']:7.2f} ms "
              f"({ema['train_images_per_sec_per_chip']:7.1f} img/s) | "
              f"+{d:.2f} ms ({100 * d / base['p50_step_ms']:.1f}%)")


if __name__ == "__main__":
    main()
