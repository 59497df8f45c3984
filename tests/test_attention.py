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


# ---------------------------------------------------------------------------
# factored key-grid bias kernel (SAM decomposed rel-pos; ops/attention.py)
# ---------------------------------------------------------------------------

from regen3d_tpu.ops.attention import flash_attention_grid_bias


def _grid_bias_reference(q, k, v, bias_h, bias_w, kw, scale=None):
    """O(S²) oracle: materialize the factored bias and soft-max."""
    d = q.shape[-1]
    s = scale if scale is not None else 1.0 / (d ** 0.5)
    kh = k.shape[2] // kw
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * s
    b, h, sq, sk = logits.shape
    logits = logits.reshape(b, h, sq, kh, kw)
    logits = logits + bias_h[..., :, None] + bias_w[..., None, :]
    p = jax.nn.softmax(logits.reshape(b, h, sq, sk), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _grid_problem(rng, b=1, h=2, kh=6, kw=10, d=16, dtype=np.float32):
    s = kh * kw
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(dtype))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(dtype))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(dtype))
    bh = jnp.asarray(rng.normal(size=(b, h, s, kh)).astype(np.float32) * 0.5)
    bw = jnp.asarray(rng.normal(size=(b, h, s, kw)).astype(np.float32) * 0.5)
    return q, k, v, bh, bw


@pytest.fixture
def grng():
    return np.random.default_rng(7)


class TestFlashAttentionGridBias:
    def test_matches_reference(self, grng):
        q, k, v, bh, bw = _grid_problem(grng)
        out = flash_attention_grid_bias(q, k, v, bh, bw, 10, None, 16, True)
        ref = _grid_bias_reference(q, k, v, bh, bw, 10)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_sam_window_shape(self, grng):
        """The 14×14 SAM window: S=196, kw=14 — forces kv padding (block_k
        = 14·18 = 252 > 196) and q padding."""
        q, k, v, bh, bw = _grid_problem(grng, b=2, h=2, kh=14, kw=14, d=8)
        out = flash_attention_grid_bias(q, k, v, bh, bw, 14, None, 64, True)
        ref = _grid_bias_reference(q, k, v, bh, bw, 14)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_all_five(self, grng):
        q, k, v, bh, bw = _grid_problem(grng, kh=4, kw=8, d=8)

        def f_kernel(*a):
            return jnp.sum(
                flash_attention_grid_bias(*a, 8, None, 8, True) ** 2)

        def f_ref(*a):
            return jnp.sum(_grid_bias_reference(*a, 8) ** 2)

        gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
        gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, bh, bw)
        for a, b_, name in zip(gk, gr, ["q", "k", "v", "bias_h", "bias_w"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4, err_msg=name)

    def test_bf16(self, grng):
        q, k, v, bh, bw = _grid_problem(grng, d=32)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out = flash_attention_grid_bias(qb, kb, vb, bh, bw, 10, None, 32,
                                        True)
        ref = _grid_bias_reference(q, k, v, bh, bw, 10)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                                   np.asarray(ref), atol=5e-2, rtol=5e-2)


class TestSamRelPosKernelPath:
    def test_sam_attention_matches_einsum_oracle(self):
        """SamAttention's fused rel-pos path ≡ the materialized-bias einsum
        oracle (the pre-kernel formulation), non-zero rel tables."""
        import flax.linen as nn

        from regen3d_tpu.models.sam import SamAttention, _rel_pos_bias

        rng = np.random.default_rng(3)
        # 32×32 = 1024 tokens: at/above the gate, so this exercises the
        # FUSED KERNEL path (smaller grids take the einsum path, which
        # would make this comparison vacuous)
        b, hh, ww, c, heads = 1, 32, 32, 16, 2
        x = jnp.asarray(rng.normal(size=(b, hh, ww, c)).astype(np.float32))
        attn = SamAttention(heads, True, (hh, ww), jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), x)
        # non-trivial rel tables (init is zeros)
        params = jax.tree.map(lambda p: p, params)
        pr = dict(params["params"])
        pr["rel_pos_h"] = jnp.asarray(
            rng.normal(size=pr["rel_pos_h"].shape).astype(np.float32) * 0.3)
        pr["rel_pos_w"] = jnp.asarray(
            rng.normal(size=pr["rel_pos_w"].shape).astype(np.float32) * 0.3)
        params = {"params": pr}
        out = attn.apply(params, x)

        # oracle: same projections, materialized bias softmax
        hd = c // heads
        qkv_w = pr["qkv"]["kernel"]
        qkv_b = pr["qkv"]["bias"]
        proj_w = pr["proj"]["kernel"]
        proj_b = pr["proj"]["bias"]
        qkv = x.reshape(b, hh * ww, c) @ qkv_w + qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        tr = lambda t: t.reshape(b, hh * ww, heads, hd).transpose(0, 2, 1, 3)
        q, k, v = tr(q), tr(k), tr(v)
        scale = hd ** -0.5
        logits = jnp.einsum("bnqd,bnkd->bnqk", q, k) * scale
        logits = logits + _rel_pos_bias((hh, ww), (hh, ww),
                                        pr["rel_pos_h"], pr["rel_pos_w"],
                                        q * scale)
        p = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bnqk,bnkd->bnqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        ref = o @ proj_w + proj_b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=3e-5)
