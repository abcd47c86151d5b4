"""Device availability checker.

Counterpart of reference scripts/check_gpu.py (:1-10), TPU-native: reports
JAX backend, device inventory, mesh capability and a tiny compile smoke.

    python -m dfu_multimodal_tpu.cli.check_tpu
"""

from __future__ import annotations


def main(argv=None):
    import jax
    import jax.numpy as jnp

    devices = jax.devices()
    print(f"JAX version: {jax.__version__}")
    print(f"Backend: {devices[0].platform}")
    print(f"Devices ({len(devices)}):")
    for d in devices:
        print(f"  {d}")
    print(f"Process {jax.process_index()} of {jax.process_count()}")

    x = jnp.ones((128, 128))
    y = jax.jit(lambda a: (a @ a).sum())(x)
    print(f"Compile smoke: OK (sum={float(y):.1f})")
    return 0      # exit code: the device count is PRINTED, not returned
                  # (the dfu dispatcher treats int returns as exit codes)


if __name__ == "__main__":
    main()
