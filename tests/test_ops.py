"""Pallas kernels: interpret-mode correctness vs the XLA reference,
forward and backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfu_multimodal_tpu.models.vit import xla_attention
from dfu_multimodal_tpu.ops.attention import flash_attention

SHAPES = [(1, 2, 16, 8), (2, 4, 40, 16)]   # (B, H, N, D), incl. unaligned N


@pytest.mark.parametrize("shape", SHAPES)
def test_flash_attention_forward_matches_xla(shape):
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), shape)
               for i in range(3))
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES[:1])
def test_flash_attention_gradients_match_xla(shape):
    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), shape)
               for i in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    def loss_pl(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    pl_grads = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for rg, pg, name in zip(ref_grads, pl_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(pg), np.asarray(rg),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name} mismatch")


def test_qkv_attention_matches_xla():
    """Packed-qkv kernel == unpack + xla attention + repack."""
    from dfu_multimodal_tpu.ops.attention import qkv_attention
    b, h, n, d = 2, 4, 20, 8
    c = h * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, n, 3 * c))

    def reference(qkv):
        parts = qkv.reshape(b, n, 3, h, d)
        q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        out = xla_attention(q, k, v)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c)

    ref = reference(qkv)
    out = qkv_attention(qkv, num_heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients through the custom VJP
    g_ref = jax.grad(lambda x: jnp.sum(reference(x) ** 2))(qkv)
    g_out = jax.grad(lambda x: jnp.sum(
        qkv_attention(x, num_heads=h, interpret=True) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                               rtol=5e-5, atol=5e-5)


def test_fused_mlp_matches_flax_module():
    from dfu_multimodal_tpu.models.fusion import FusionMLP
    from dfu_multimodal_tpu.ops.fused_mlp import fused_mlp, fusion_mlp_params

    module = FusionMLP(num_classes=2, drop_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (20, 64))
    variables = module.init(jax.random.PRNGKey(1), x)
    ref = module.apply(variables, x, train=False)    # dropout off at eval
    out = fused_mlp(x, *fusion_mlp_params(variables["params"]),
                    block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mlp_ragged_batch():
    from dfu_multimodal_tpu.models.fusion import FusionMLP
    from dfu_multimodal_tpu.ops.fused_mlp import fused_mlp, fusion_mlp_params

    module = FusionMLP(num_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (13, 32))  # not /block_rows
    variables = module.init(jax.random.PRNGKey(1), x)
    ref = module.apply(variables, x, train=False)
    out = fused_mlp(x, *fusion_mlp_params(variables["params"]),
                    block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_bf16():
    shape = (1, 2, 24, 8)
    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), shape,
                                 dtype=jnp.bfloat16) for i in range(3))
    out = flash_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)
