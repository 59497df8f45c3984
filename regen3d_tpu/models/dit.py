"""Flagship: image-conditioned flow-matching shape DiT (Hunyuan3D-2 family).

Reference behavior being rebuilt (phase 3): ``Hunyuan3DDiTFlowMatchingPipeline``
denoises a set of 3D shape-latent tokens conditioned on a single object image,
then a latent decoder evaluates an SDF over an octree grid and marching cubes
extracts the mesh (src/2d_to_3d_models/run.py:67-105; knobs
num_inf_steps_hy=50, octree_resolution_hy=256, num_chunks_hy=16000,
config.yaml:167-169).

TPU design:
  * latents are a token SET (L × D) — attention-native, no 3D conv grids;
  * AdaLN-Zero DiT blocks with cross-attention to image-encoder tokens, all
    attention on the Pallas flash kernel, bf16 params/activations with f32
    logits where it matters;
  * rectified-flow objective: x_t = (1−t)·x₀ + t·ε, target v = ε − x₀,
    Euler sampler with timestep shift (the flow-matching family Hunyuan
    uses), fully jit-compiled — `sample()` is one lax.scan;
  * classifier-free guidance via a learned null-condition token row.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from regen3d_tpu.models.layers import DiTBlock, Mlp, timestep_embedding


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    latent_tokens: int = 512      # L: size of the shape latent set
    latent_dim: int = 64          # D: per-token latent channels
    width: int = 1024
    depth: int = 16
    num_heads: int = 16
    cond_dim: int = 768           # image-encoder token width
    mlp_ratio: float = 4.0
    # MIDI-style multi-instance denoising (run_midi.py:36-43): when on,
    # every DiT block is followed by a zero-init gated attention over the
    # CONCATENATED tokens of all instances in the batch (batch = instances
    # of one scene), so instances denoise jointly. Zero gates make a plain
    # single-instance checkpoint load and behave identically until the
    # instance-attention weights are trained/converted.
    cross_instance: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "DiTConfig":
        return cls(latent_tokens=16, latent_dim=8, width=64, depth=2,
                   num_heads=4, cond_dim=32)

    @classmethod
    def base(cls) -> "DiTConfig":
        return cls()

    @classmethod
    def large(cls) -> "DiTConfig":
        return cls(latent_tokens=1024, latent_dim=64, width=2048, depth=24,
                   num_heads=16, cond_dim=1536)


class ShapeDiT(nn.Module):
    """Velocity-prediction DiT over shape-latent token sets."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, t, cond):
        """x: (B, L, D) noisy latents; t: (B,) in [0,1]; cond: (B, S, cond_dim).

        Returns velocity prediction (B, L, D).
        """
        c = self.cfg
        h = nn.Dense(c.width, dtype=c.dtype, name="x_in")(x)
        pos = self.param("latent_pos", nn.initializers.normal(0.02),
                         (c.latent_tokens, c.width), jnp.float32)
        h = h + pos[None].astype(c.dtype)

        t_emb = timestep_embedding(t * 1000.0, 256)
        t_emb = Mlp(c.width, out=c.width, dtype=c.dtype, name="t_mlp")(t_emb)

        cond_tok = nn.Dense(c.width, dtype=c.dtype, name="cond_in")(cond)
        cond_tok = nn.LayerNorm(dtype=c.dtype, name="cond_norm")(cond_tok)

        b = h.shape[0]
        for i in range(c.depth):
            h = DiTBlock(c.num_heads, c.mlp_ratio, use_cross=True,
                         dtype=c.dtype, name=f"block{i}")(h, t_emb, cond_tok)
            if c.cross_instance:
                # instance axis = batch axis: all instances' tokens attend
                # jointly (the MIDI multi-instance attention mechanism)
                g = nn.LayerNorm(use_scale=False, use_bias=False,
                                 dtype=c.dtype, name=f"inst_norm{i}")(h)
                g = g.reshape(1, b * c.latent_tokens, c.width)
                from regen3d_tpu.models.layers import Attention
                g = Attention(c.num_heads, dtype=c.dtype, qk_norm=True,
                              name=f"inst_attn{i}")(g)
                g = g.reshape(b, c.latent_tokens, c.width)
                gate = self.param(f"inst_gate{i}", nn.initializers.zeros,
                                  (c.width,), jnp.float32)
                h = h + gate.astype(h.dtype) * g

        h = nn.LayerNorm(use_scale=False, use_bias=False, dtype=c.dtype,
                         name="norm_out")(h)
        # final AdaLN modulation (zero-init) + zero-init output projection
        mod = nn.Dense(2 * c.width, dtype=c.dtype,
                       kernel_init=nn.initializers.zeros, name="adaLN_out")(
            nn.silu(t_emb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = h * (1 + scale[:, None, :]) + shift[:, None, :]
        v = nn.Dense(c.latent_dim, dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="x_out")(h)
        return v

    # --- null condition for classifier-free guidance -------------------------
    def null_cond(self, params, batch: int, seq: int) -> jnp.ndarray:
        del params
        return jnp.zeros((batch, seq, self.cfg.cond_dim), self.cfg.dtype)


# -----------------------------------------------------------------------------
# Rectified-flow training + sampling
# -----------------------------------------------------------------------------

def flow_matching_loss(
    model: ShapeDiT,
    params,
    key: jax.Array,
    x0: jnp.ndarray,
    cond: jnp.ndarray,
    cond_drop_prob: float = 0.1,
) -> jnp.ndarray:
    """Rectified-flow MSE: x_t = (1−t)x₀ + t·ε, target ε − x₀."""
    b = x0.shape[0]
    k_t, k_eps, k_drop = jax.random.split(key, 3)
    t = jax.random.uniform(k_t, (b,))
    eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
    x_t = (1.0 - t)[:, None, None] * x0 + t[:, None, None] * eps
    target = eps - x0
    drop = jax.random.bernoulli(k_drop, cond_drop_prob, (b,))
    cond_used = jnp.where(drop[:, None, None], 0.0, cond)
    v = model.apply(params, x_t, t, cond_used)
    return jnp.mean((v - target) ** 2)


def timestep_shift(t: jnp.ndarray, shift: float = 3.0) -> jnp.ndarray:
    """Resolution-style timestep shift used by flow-matching samplers."""
    return shift * t / (1.0 + (shift - 1.0) * t)


def sample(
    model: ShapeDiT,
    params,
    key: jax.Array,
    cond: jnp.ndarray,
    num_steps: int = 50,
    guidance_scale: float = 5.0,
    shift: float = 3.0,
    latents: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Euler flow sampler ε → x₀, one lax.scan (reference: 50 steps,
    guidance 5.0 — config.yaml:152,167). Returns (B, L, D) latents."""
    c = model.cfg
    b = cond.shape[0]
    if latents is None:
        latents = jax.random.normal(key, (b, c.latent_tokens, c.latent_dim))
    # integrate t from 1 (noise) down to 0 (data) on the shifted grid
    ts = timestep_shift(jnp.linspace(1.0, 0.0, num_steps + 1), shift)
    null = jnp.zeros_like(cond)

    # classifier-free guidance as ONE 2B-batch forward (doubles the matmul
    # batch on the MXU instead of two half-utilized applies). MIDI
    # cross-instance mode keeps the two applies: its instance attention
    # attends ACROSS the batch axis, which a [cond; null] concat would mix.
    fuse_cfg = guidance_scale != 1.0 and not model.cfg.cross_instance

    def step(x, i):
        t_cur, t_next = ts[i], ts[i + 1]
        tt = jnp.full((b,), t_cur)
        if fuse_cfg:
            v2 = model.apply(params, jnp.concatenate([x, x], 0),
                             jnp.concatenate([tt, tt], 0),
                             jnp.concatenate([cond, null], 0))
            v_c, v_u = v2[:b], v2[b:]
            v = v_u + guidance_scale * (v_c - v_u)
        elif guidance_scale != 1.0:
            v_c = model.apply(params, x, tt, cond)
            v_u = model.apply(params, x, tt, null)
            v = v_u + guidance_scale * (v_c - v_u)
        else:
            v = model.apply(params, x, tt, cond)
        return x + (t_next - t_cur) * v, None

    x, _ = jax.lax.scan(step, latents, jnp.arange(num_steps))
    return x
