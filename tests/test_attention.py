"""Flash attention kernel vs O(S²) oracle, forward + gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regen3d_tpu.ops.attention import (
    attention_reference,
    flash_attention,
    multihead_attention,
)


def _qkv(rng, b=2, h=3, sq=65, sk=47, d=32, dtype=np.float32):
    q = rng.normal(size=(b, h, sq, d)).astype(dtype)
    k = rng.normal(size=(b, h, sk, d)).astype(dtype)
    v = rng.normal(size=(b, h, sk, d)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


class TestFlashAttention:
    def test_matches_reference(self, rng):
        q, k, v = _qkv(rng)
        out = flash_attention(q, k, v, None, 32, 16, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_unaligned_lengths(self, rng):
        q, k, v = _qkv(rng, sq=33, sk=19)
        out = flash_attention(q, k, v, None, 16, 8, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_self_attention_square(self, rng):
        q, k, v = _qkv(rng, sq=64, sk=64)
        out = flash_attention(q, k, v, None, 32, 32, True)
        ref = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match_reference(self, rng):
        q, k, v = _qkv(rng, b=1, h=2, sq=24, sk=24, d=16)

        def f_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, None, 8, 8, True) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(attention_reference(q, k, v) ** 2)

        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_flash, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       atol=5e-4, rtol=5e-4, err_msg=name)

    def test_bf16_inputs(self, rng):
        q, k, v = _qkv(rng, d=64)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out = flash_attention(qb, kb, vb, None, 32, 32, True)
        ref = attention_reference(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), atol=5e-2, rtol=5e-2)

    def test_custom_scale(self, rng):
        q, k, v = _qkv(rng, sq=16, sk=16, d=8)
        out = flash_attention(q, k, v, 0.5, 8, 8, True)
        ref = attention_reference(q, k, v, scale=0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestMHA:
    def test_cross_attention_shapes(self, rng):
        e, h = 64, 4
        xq = jnp.asarray(rng.normal(size=(2, 10, e)).astype(np.float32))
        xkv = jnp.asarray(rng.normal(size=(2, 33, e)).astype(np.float32))
        ws = [jnp.asarray(rng.normal(size=(e, e)).astype(np.float32) * 0.05)
              for _ in range(4)]
        out = multihead_attention(xq, xkv, *ws, num_heads=h)
        assert out.shape == (2, 10, e)
        assert np.all(np.isfinite(np.asarray(out)))
