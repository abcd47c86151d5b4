"""Head-sharded Megatron-TP of a ViT encoder block with the Pallas
attention kernel under shard_map — the experiment closing round-4
VERDICT weak #4 ("param-sharded modes cannot host the kernels" was
asserted, not measured).

The decomposition IS expressible with the existing kernels: qkv columns
slice per head (the packed layout re-packs per shard), the per-head
fused attention kernel (ops/attention.py::qkv_attention) consumes the
LOCAL packing directly (it derives head_dim from its operand widths),
the out-projection is row-sliced with ONE psum, and the MLP is
column/row-sliced with a second psum — exactly two activation
all-reduces per block per direction, the textbook Megatron cut.

What this script measures:

- CPU (8 virtual devices, interpret kernels): CORRECTNESS — the
  ('data','model') = (4, 2) TP program is bit-compared against the same
  composition on a (8, 1) pure-DP mesh.  TP must be a placement, never
  different math (up to fp reduction order in the psum).
- TPU (one chip): the 1-device-per-axis OVERHEAD probe — the
  TP-decomposed per-device program (separate LN/matmul segments +
  attention kernel + psum no-ops) vs the production fused
  attn_block+mlp_block kernels on identical inputs.  This isolates the
  kernel-efficiency term of the TP cost model; the bandwidth term
  (2 psums × 12 blocks of (B, 197, 768) activations ≈ 930 MB/forward at
  b128 vs ~15 ms of compute saved by TP=2) is the roofline paragraph in
  docs/DESIGN.md "Kernels under SPMD".

Run on CPU:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts_dev/bench_tp_kernels.py
Run on TPU:  python scripts_dev/bench_tp_kernels.py [--iters 5]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def build_params(rng, c, heads, mlp, dtype):
    import numpy as np
    r = np.random.default_rng(rng)

    def w(*shape):
        return (r.normal(size=shape) * 0.02).astype(np.float32)

    return dict(g1=np.ones(c, np.float32), b1=np.zeros(c, np.float32),
                wqkv=w(c, 3 * c), bqkv=np.zeros(3 * c, np.float32),
                wproj=w(c, c), bproj=np.zeros(c, np.float32),
                g2=np.ones(c, np.float32), b2=np.zeros(c, np.float32),
                w1=w(c, mlp), b1m=w(mlp).reshape(mlp),
                w2=w(mlp, c), b2m=np.zeros(c, np.float32))


def slice_tp(params, c, heads, mlp, tp):
    """Per-shard Megatron slices with a leading (tp,) axis, the packed
    qkv layout re-packed per shard: [q_loc | k_loc | v_loc]."""
    import numpy as np
    d = c // heads
    hl = heads // tp
    cl, ml = hl * d, mlp // tp
    out = dict(params)
    wq = np.stack([np.concatenate(
        [params["wqkv"][:, s * c + t * cl:s * c + (t + 1) * cl]
         for s in range(3)], axis=1) for t in range(tp)])        # (T,c,3cl)
    bq = np.stack([np.concatenate(
        [params["bqkv"][s * c + t * cl:s * c + (t + 1) * cl]
         for s in range(3)]) for t in range(tp)])                # (T,3cl)
    out.update(
        wqkv=wq, bqkv=bq,
        wproj=np.stack([params["wproj"][t * cl:(t + 1) * cl]
                        for t in range(tp)]),                    # (T,cl,c)
        w1=np.stack([params["w1"][:, t * ml:(t + 1) * ml]
                     for t in range(tp)]),                       # (T,c,ml)
        b1m=np.stack([params["b1m"][t * ml:(t + 1) * ml]
                      for t in range(tp)]),                      # (T,ml)
        w2=np.stack([params["w2"][t * ml:(t + 1) * ml]
                     for t in range(tp)]),                       # (T,ml,c)
        # bias terms added once per shard then psum'd: pre-divide by T
        bproj=params["bproj"] / tp, b2m=params["b2m"] / tp)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_compilation_cache_dir",
                      str(REPO_ROOT / ".jax_cache"))
    from dfu_multimodal_tpu.ops.vit_block import (_gelu_fast,
                                                  _layernorm_f32,
                                                  attn_block, mlp_block)
    from dfu_multimodal_tpu.ops.attention import qkv_attention

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    interpret = not on_tpu
    # CPU correctness uses a small block (fast interpret); TPU overhead
    # probe uses the production ViT-B shape.
    if on_tpu:
        b, n, c, heads, mlp = args.batch_size, 197, 768, 12, 3072
        dtype = jnp.bfloat16
    else:
        b, n, c, heads, mlp = 8, 17, 128, 4, 256
        dtype = jnp.float32

    params = build_params(0, c, heads, mlp, dtype)
    x = (np.random.default_rng(1).normal(size=(b, n, c)) * 0.5
         ).astype(np.float32)

    def tp_block(x, p, tp_axis="model"):
        """One encoder block, head/column-sharded over ``tp_axis``; the
        leading (1, ...) shard axis of each sliced weight is squeezed.
        Two psums: after the row-sliced out-projection and after the
        row-sliced MLP fc2 — the Megatron cut."""
        def sq(a):
            return a.reshape(a.shape[1:]) if a.ndim > 1 else a

        wqkv, bqkv = sq(p["wqkv"]), sq(p["bqkv"])
        wproj, w1, b1m, w2 = (sq(p["wproj"]), sq(p["w1"]), sq(p["b1m"]),
                              sq(p["w2"]))
        hl = (wqkv.shape[-1] // 3) // (c // heads)     # local heads
        bl = x.shape[0]                                # per-shard batch
        y = _layernorm_f32(x.reshape(-1, c), p["g1"], p["b1"]).astype(
            dtype).reshape(bl, n, c)
        qkv = (jnp.einsum("bnc,cm->bnm", y, wqkv.astype(dtype),
                          preferred_element_type=jnp.float32)
               + bqkv).astype(dtype)
        attn = qkv_attention(qkv, hl, interpret)
        o = jnp.einsum("bnk,kc->bnc", attn.astype(dtype),
                       wproj.astype(dtype),
                       preferred_element_type=jnp.float32) + p["bproj"]
        o = jax.lax.psum(o, tp_axis)
        y1 = x + o.astype(x.dtype)
        z = _layernorm_f32(y1.reshape(-1, c), p["g2"], p["b2"]).astype(
            dtype).reshape(bl, n, c)
        h1 = _gelu_fast(
            jnp.einsum("bnc,cm->bnm", z, w1.astype(dtype),
                       preferred_element_type=jnp.float32) + b1m
        ).astype(dtype)
        o2 = jnp.einsum("bnm,mc->bnc", h1, w2.astype(dtype),
                        preferred_element_type=jnp.float32) + p["b2m"]
        o2 = jax.lax.psum(o2, tp_axis)
        return y1 + o2.astype(x.dtype)

    def run_tp(tp, dp):
        mesh = Mesh(np.asarray(jax.devices()[:dp * tp]).reshape(dp, tp),
                    ("data", "model"))
        sliced = slice_tp(params, c, heads, mlp, tp)
        w_specs = {k: (P("model",) + (None,) * (np.asarray(v).ndim - 1)
                       if k in ("wqkv", "bqkv", "wproj", "w1", "b1m",
                                "w2") else P())
                   for k, v in sliced.items()}
        fn = jax.jit(jax.shard_map(
            functools.partial(tp_block),
            mesh=mesh, in_specs=(P("data"), w_specs),
            out_specs=P("data"), check_vma=False))
        args_p = {k: jax.device_put(
                      np.asarray(v), NamedSharding(mesh, w_specs[k]))
                  for k, v in sliced.items()}
        xb = jax.device_put(x.astype(np.float32),
                            NamedSharding(mesh, P("data")))
        return fn, args_p, xb

    if not on_tpu:
        # ---- correctness: (4, 2) TP vs (8, 1) pure-DP, same math ----
        fn2, p2, x2 = run_tp(tp=2, dp=4)
        fn1, p1, x1 = run_tp(tp=1, dp=8)
        o2 = np.asarray(jax.device_get(fn2(x2, p2)))
        o1 = np.asarray(jax.device_get(fn1(x1, p1)))
        err = float(np.max(np.abs(o2 - o1)))
        rel = err / float(np.max(np.abs(o1)))
        print(json.dumps({"platform": platform, "mode": "correctness",
                          "shape": [b, n, c, heads, mlp],
                          "tp2_vs_dp_max_abs_err": err,
                          "tp2_vs_dp_max_rel_err": rel}))
        assert rel < 1e-5, (err, rel)
        print("TP-with-kernels correctness: OK (head-sharded Pallas "
              "attention + row/col-sharded MLP under shard_map "
              "== unsharded composition)")
        return

    # ---- TPU: 1-device-per-axis overhead probe ---------------------------
    from bench import _tunnel_rtt_ms
    rtt_ms = _tunnel_rtt_ms()

    fn_tp, p_tp, x_tp = run_tp(tp=1, dp=1)

    g1, b1 = jnp.asarray(params["g1"]), jnp.asarray(params["b1"])
    g2, b2 = jnp.asarray(params["g2"]), jnp.asarray(params["b2"])
    fused_args = tuple(jnp.asarray(params[k]) for k in
                       ("wqkv", "bqkv", "wproj", "bproj"))
    mlp_args = tuple(jnp.asarray(params[k]) for k in
                     ("w1", "b1m", "w2", "b2m"))

    @jax.jit
    def fused_block(x, fa, ma):
        xb = x.astype(dtype)
        y1 = attn_block(xb, g1, b1, *[a.astype(dtype) if a.ndim > 1 else a
                                      for a in fa], num_heads=heads)
        return mlp_block(y1, g2, b2, *[a.astype(dtype) if a.ndim > 1
                                       else a for a in ma])

    def timed(run, *a):
        def chained(*aa):
            x0 = aa[0]

            def body(xc, _):
                out = run(xc, *aa[1:])
                return out.astype(xc.dtype), jnp.sum(out[0, 0, :1])

            _, s = jax.lax.scan(body, x0, None, length=args.chain)
            return s

        cfn = jax.jit(chained)
        np.asarray(cfn(*a))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(cfn(*a))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return max((ts[len(ts) // 2] * 1e3 - rtt_ms) / args.chain, 1e-6)

    # weights ride as ARGUMENTS through `timed` (never jit-closure
    # constants: axon remote compile serializes those — HTTP 413)
    t_tp = timed(fn_tp, x_tp, p_tp)
    xj = jnp.asarray(x)
    t_fused = timed(fused_block, xj, fused_args, mlp_args)
    print(json.dumps({
        "platform": platform, "mode": "overhead-probe",
        "batch": b, "tokens": n,
        "tp_decomposed_block_ms": round(t_tp, 4),
        "fused_block_ms": round(t_fused, 4),
        "tp_program_overhead_pct": round(100 * (t_tp / t_fused - 1), 1),
    }))


if __name__ == "__main__":
    main()
