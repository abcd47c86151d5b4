"""Dev microbenchmark: WHOLE-STAGE fused ResNet bottlenecks vs XLA convs.

ROADMAP item 5 / round-1 VERDICT next #6: the per-block Pallas bottleneck
measured 2-4x slower than XLA (docs/DESIGN.md) because XLA's eval conv
blocks sit at the HBM roofline and the 9-shifted-matmul decomposition
pays half-lane MXU penalties.  Chaining all stride-1 blocks of a stage in
ONE kernel (ops/resnet_block.py::fused_stage) removes 2*(n-1) HBM
activation round-trips; this measures whether that amortization ever wins.

Per stage: XLA conv chain / per-block Pallas chain / whole-stage Pallas,
plus the HBM roofline (read x + write out at ~819 GB/s v5e).
"""

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

from dfu_multimodal_tpu.ops.resnet_block import fused_bottleneck, fused_stage

HBM_GBPS = 819e9
PEAK_BF16 = 197e12


def rtt_ms():
    @jax.jit
    def trivial(x):
        return x + 1
    x = jnp.zeros((2, 2))
    np.asarray(trivial(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(trivial(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def timeit(fn, x, chain, iters=5, label="", rtt=0.0):
    u16 = jnp.uint16

    def chained(x):
        def body(carry_x, _):
            out = fn(carry_x)
            s = jnp.sum(out.astype(jnp.float32))
            bump = (s > 0).astype(u16)
            xu = jax.lax.bitcast_convert_type(carry_x, u16) ^ bump
            return jax.lax.bitcast_convert_type(xu, carry_x.dtype), s
        _, outs = jax.lax.scan(body, x, None, length=chain)
        return outs

    run = jax.jit(chained)
    t0 = time.perf_counter()
    np.asarray(run(x))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(run(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = max((ts[len(ts) // 2] * 1e3 - rtt) / chain, 1e-6)
    print(f"  {label}: {ms:.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return ms


def xla_block(x, w1, b1, w2, b2, w3, b3):
    """Eval-mode bottleneck as XLA sees it from the flax path: BN folded,
    NHWC convs with fused bias/relu epilogues."""
    cmid = w1.shape[1]
    y = jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, w1.reshape(1, 1, -1, cmid), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        + b1).astype(x.dtype)
    y = jax.nn.relu(
        jax.lax.conv_general_dilated(
            y, w2.reshape(3, 3, cmid, cmid), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        + b2).astype(x.dtype)
    y = (jax.lax.conv_general_dilated(
        y, w3.reshape(1, 1, cmid, -1), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b3).astype(x.dtype)
    return jax.nn.relu(x + y)


def bench_stage(b, h, c, cmid, nblocks, dt=jnp.bfloat16, rtt=0.0):
    key = jax.random.PRNGKey(0)
    blocks = []
    for k in range(nblocks):
        ks = [jax.random.fold_in(key, 10 * k + i) for i in range(6)]
        w1 = (jax.random.normal(ks[0], (c, cmid)) * c ** -0.5).astype(dt)
        b1 = jax.random.normal(ks[1], (cmid,)) * 0.1
        w2 = (jax.random.normal(ks[2], (9 * cmid, cmid))
              * (9 * cmid) ** -0.5).astype(dt)
        b2 = jax.random.normal(ks[3], (cmid,)) * 0.1
        w3 = (jax.random.normal(ks[4], (cmid, c)) * cmid ** -0.5).astype(dt)
        b3 = jax.random.normal(ks[5], (c,)) * 0.1
        blocks.append((w1, b1, w2, b2, w3, b3))
    blocks = tuple(blocks)
    x = (jax.random.normal(jax.random.fold_in(key, 99), (b, h, h, c))
         * 0.1).astype(dt)

    bytes_hbm = 2 * b * h * h * c * 2          # read x + write out, bf16
    flops = 2 * b * h * h * nblocks * (2 * c * cmid + 9 * cmid * cmid)
    print(f"stage {h}x{h}x{c} cmid={cmid} x{nblocks} ident blocks, b={b}:")
    print(f"  HBM roofline (stage-fused): {bytes_hbm / HBM_GBPS * 1e3:.3f} ms"
          f" | MXU roofline: {flops / PEAK_BF16 * 1e3:.3f} ms")

    def per_block(x):
        for bw in blocks:
            x = fused_bottleneck(x, *bw)
        return x

    def xla_chain(x):
        for bw in blocks:
            x = xla_block(x, *bw)
        return x

    r = {}
    r["xla"] = timeit(xla_chain, x, chain=10, label="XLA conv chain ",
                      rtt=rtt)
    r["per_block"] = timeit(per_block, x, chain=10,
                            label="Pallas per-block", rtt=rtt)
    r["stage"] = timeit(lambda x: fused_stage(x, blocks), x, chain=10,
                        label="Pallas stage    ", rtt=rtt)
    # parity sanity on-chip
    a = np.asarray(jax.jit(lambda x: fused_stage(x, blocks))(x),
                   dtype=np.float32)
    bref = np.asarray(jax.jit(xla_chain)(x), dtype=np.float32)
    err = np.max(np.abs(a - bref)) / max(np.max(np.abs(bref)), 1e-6)
    print(f"  rel err stage vs XLA: {err:.2e}")
    return r


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    print("backend:", jax.default_backend(), flush=True)
    rtt = rtt_ms()
    print(f"tunnel RTT: {rtt:.1f} ms")
    b = 128
    # identity-block counts of torchvision ResNet50 stages (minus the
    # projection block each stage opens with)
    for h, c, cmid, n in ((56, 256, 64, 2), (28, 512, 128, 3),
                          (14, 1024, 256, 5), (7, 2048, 512, 2)):
        bench_stage(b, h, c, cmid, n, rtt=rtt)
