"""Shape VAE: point-cloud ↔ latent-token-set autoencoder with an SDF decoder.

The reference's Hunyuan3D-2 shape VAE ("vecset" family) encodes a surface
point cloud into L latent tokens and decodes any 3D query point to a signed
distance via cross-attention; the pipeline evaluates it over an octree grid
in `num_chunks` batches and runs marching cubes
(src/2d_to_3d_models/run.py:77-84, octree_resolution_hy=256,
num_chunks_hy=16000).

TPU design:
  * encoder: fourier-embedded surface samples cross-attended into learned
    latent queries (one pass, set-to-set);
  * decoder: query points → fourier features → cross-attention over latent
    tokens → SDF. Grid decode is a lax.map over static-size chunks — the
    XLA analog of the reference's num_chunks batching, fully on-device;
  * mesh extraction: marching cubes (ops/marching_cubes.py) on the decoded
    grid.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from regen3d_tpu.models.layers import Attention, Mlp, TransformerBlock, fourier_features


@dataclasses.dataclass(frozen=True)
class ShapeVAEConfig:
    latent_tokens: int = 512
    latent_dim: int = 64
    width: int = 512
    enc_depth: int = 4
    dec_depth: int = 8
    num_heads: int = 8
    num_freqs: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @classmethod
    def tiny(cls) -> "ShapeVAEConfig":
        return cls(latent_tokens=16, latent_dim=8, width=64, enc_depth=1,
                   dec_depth=2, num_heads=4, num_freqs=4)


class ShapeEncoder(nn.Module):
    """Surface samples (B, N, 3) → latent tokens (B, L, D)."""

    cfg: ShapeVAEConfig

    @nn.compact
    def __call__(self, points):
        c = self.cfg
        feats = fourier_features(points, c.num_freqs)
        h = nn.Dense(c.width, dtype=c.dtype, name="point_in")(feats)
        queries = self.param("latent_queries", nn.initializers.normal(0.02),
                             (c.latent_tokens, c.width), jnp.float32)
        q = jnp.broadcast_to(queries[None].astype(c.dtype),
                             (points.shape[0], c.latent_tokens, c.width))
        q = q + Attention(c.num_heads, dtype=c.dtype, name="gather")(
            nn.LayerNorm(dtype=c.dtype, name="gather_norm")(q), h)
        for i in range(c.enc_depth):
            q = TransformerBlock(c.num_heads, dtype=c.dtype, name=f"block{i}")(q)
        q = nn.LayerNorm(dtype=c.dtype, name="out_norm")(q)
        return nn.Dense(c.latent_dim, dtype=jnp.float32, name="out")(q)


class ShapeDecoder(nn.Module):
    """(latents (B, L, D), queries (B, Q, 3)) → SDF (B, Q).

    Split into ``trunk`` (latent self-attention stack — depends only on
    the latents) and ``query`` (per-point cross-attention) so grid decode
    runs the trunk ONCE and streams chunks through ``query`` — the
    reference recomputes its full decoder per chunk
    (2d_to_3d_models/run.py:77-84); hoisting saves ~40% of decode FLOPs."""

    cfg: ShapeVAEConfig

    def setup(self):
        c = self.cfg
        self.lat_in = nn.Dense(c.width, dtype=c.dtype, name="lat_in")
        self.blocks = [TransformerBlock(c.num_heads, dtype=c.dtype,
                                        name=f"block{i}")
                       for i in range(c.dec_depth)]
        self.query_in = nn.Dense(c.width, dtype=c.dtype, name="query_in")
        self.q_norm = nn.LayerNorm(dtype=c.dtype, name="q_norm")
        self.query_cross = Attention(c.num_heads, dtype=c.dtype,
                                     name="query_cross")
        self.o_norm = nn.LayerNorm(dtype=c.dtype, name="o_norm")
        self.mlp = Mlp(c.width * 2, dtype=c.dtype, name="mlp")
        self.out_norm = nn.LayerNorm(dtype=c.dtype, name="out_norm")
        self.sdf_out = nn.Dense(1, dtype=jnp.float32, name="sdf_out")

    def trunk(self, latents):
        """latents (B, L, D) → processed latent tokens (B, L, width)."""
        h = self.lat_in(latents)
        for blk in self.blocks:
            h = blk(h)
        return h

    def query(self, h, points):
        """(trunk output (B, L, width), points (B, Q, 3)) → SDF (B, Q).

        The query embedding enters RESIDUALLY (pq + cross-attn), matching
        the published vecset decoders (3DShape2VecSet / Hunyuan shape
        VAE). Without it the SDF can depend on the query point only
        through softmax weights over L value vectors — measured to
        collapse to a near-constant on small latent sets."""
        pq = self.query_in(fourier_features(points, self.cfg.num_freqs))
        o = pq + self.query_cross(self.q_norm(pq), h)
        o = o + self.mlp(self.o_norm(o))
        sdf = self.sdf_out(self.out_norm(o))
        return sdf[..., 0]

    def __call__(self, latents, points):
        return self.query(self.trunk(latents), points)


def make_grid(resolution: int, bounds: float = 1.01) -> jnp.ndarray:
    """(R³, 3) regular query grid in [-bounds, bounds]³ (x fastest)."""
    lin = jnp.linspace(-bounds, bounds, resolution)
    zz, yy, xx = jnp.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)


def decode_grid(
    decoder: ShapeDecoder,
    params,
    latents: jnp.ndarray,
    resolution: int = 256,
    chunk: int = 16384,
    bounds: float = 1.01,
) -> jnp.ndarray:
    """Evaluate the SDF over a dense grid in fixed-size chunks
    (the reference's num_chunks batching, as a jitted lax.map).

    latents: (B, L, D) → (B, R, R, R) SDF volumes (z, y, x order); a
    singleton batch returns (R, R, R). All B objects share each grid chunk
    (the batch rides the MXU, replacing the reference's process-per-object
    fan-out — 2d_to_3d_models/run.py:108-194).
    """
    squeeze = latents.shape[0] == 1
    b = latents.shape[0]
    grid = make_grid(resolution, bounds)
    n = grid.shape[0]
    pad = (-n) % chunk
    if pad:
        grid = jnp.concatenate([grid, jnp.zeros((pad, 3), grid.dtype)])
    chunks = grid.reshape(-1, chunk, 3)

    # latent trunk ONCE; chunks stream through the cross-attention head
    h = decoder.apply(params, latents, method="trunk")

    def eval_chunk(pts):
        q = jnp.broadcast_to(pts[None], (b, chunk, 3))
        return decoder.apply(params, h, q,
                             method="query")   # (B, chunk)

    sdf = jax.lax.map(eval_chunk, chunks)                 # (C, B, chunk)
    sdf = jnp.moveaxis(sdf, 1, 0).reshape(b, -1)[:, :n]
    vols = sdf.reshape(b, resolution, resolution, resolution)
    return vols[0] if squeeze else vols


def _eval_point_chunks(decoder: ShapeDecoder, params, h: jnp.ndarray,
                       pts: jnp.ndarray, chunk: int) -> jnp.ndarray:
    """Per-object query points (B, N, 3) → SDF (B, N), streamed through
    ``ShapeDecoder.query`` in fixed-size chunks (N padded to a multiple)."""
    b, n = pts.shape[:2]
    pad = (-n) % chunk
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((b, pad, 3), pts.dtype)], 1)
    chunks = pts.reshape(b, -1, chunk, 3).transpose(1, 0, 2, 3)

    def eval_chunk(q):
        return decoder.apply(params, h, q, method="query")

    sdf = jax.lax.map(eval_chunk, chunks)                 # (C, B, chunk)
    return jnp.moveaxis(sdf, 1, 0).reshape(b, -1)[:, :n]


def decode_grid_hierarchical(
    decoder: ShapeDecoder,
    params,
    latents: jnp.ndarray,
    resolution: int = 256,
    factor: int = 4,
    chunk: int = 16384,
    bounds: float = 1.01,
    refine_cells: Optional[int] = None,
):
    """Octree-style two-level grid decode (the TPU shape of the
    reference's octree SDF evaluation, 2d_to_3d_models/run.py:77-84):

    1. a COARSE dense pass on the fine grid subsampled by ``factor``
       ((R/f)³ points);
    2. a surface-band detector — per coarse cell, the dilated minimum
       |SDF| — picks the ``refine_cells`` most surface-adjacent cells
       (static top-k, TPU-friendly);
    3. a FINE pass evaluating only those cells' f³ interior points.

    Returns device arrays for :func:`assemble_volume` — the full dense
    volume is never materialized on device NOR shipped over the host
    link (a 256³ f32 volume is 67 MB/object; this returns ~4 MB/object):
    (coarse_vol (B, C, C, C), cell_idx (B, K) flat z·C²+y·C+x,
    fine_vals (B, K, f³)). Dense-equivalent wherever the surface lies in
    a refined cell; elsewhere the assembled volume holds the cell's
    coarse corner value (far from the zero crossing by construction, so
    marching cubes output is unchanged — tested against the dense path).
    """
    b = latents.shape[0]
    if resolution % factor:
        raise ValueError(f"resolution {resolution} % factor {factor} != 0")
    c = resolution // factor
    k = refine_cells if refine_cells is not None else min(8 * c * c, c ** 3)
    lin = jnp.linspace(-bounds, bounds, resolution)

    h = decoder.apply(params, latents, method="trunk")

    # --- coarse pass on the subsampled fine grid ---------------------------
    ci = jnp.arange(c) * factor
    zz, yy, xx = jnp.meshgrid(lin[ci], lin[ci], lin[ci], indexing="ij")
    coarse_pts = jnp.stack([xx, yy, zz], -1).reshape(1, -1, 3)
    coarse_pts = jnp.broadcast_to(coarse_pts, (b, c ** 3, 3))
    sdf_c = _eval_point_chunks(decoder, params, h, coarse_pts, chunk)
    vol_c = sdf_c.reshape(b, c, c, c)

    # --- surface band: rank cells by raw proximity −|sdf| ------------------
    # (surface cells first, then rings outward — a dilated/max-pooled score
    # ties whole neighborhoods and lets top-k drop true surface cells).
    # With K ≥ surface cells + first ring, every fine cell that can contain
    # the zero crossing — including block-straddling ones whose corners
    # live in a neighbor block — reads refined values.
    score = -jnp.abs(vol_c)
    _, cell_idx = jax.lax.top_k(score.reshape(b, -1), k)   # (B, K)

    # --- fine pass over the selected cells ---------------------------------
    zc = cell_idx // (c * c)
    yc = (cell_idx // c) % c
    xc = cell_idx % c
    dz, dy, dx = jnp.meshgrid(jnp.arange(factor), jnp.arange(factor),
                              jnp.arange(factor), indexing="ij")
    off = jnp.stack([dz.ravel(), dy.ravel(), dx.ravel()], -1)   # (f³, 3)
    zi = zc[..., None] * factor + off[None, None, :, 0]         # (B, K, f³)
    yi = yc[..., None] * factor + off[None, None, :, 1]
    xi = xc[..., None] * factor + off[None, None, :, 2]
    fine_pts = jnp.stack([lin[xi], lin[yi], lin[zi]], -1)       # (B,K,f³,3)
    fine_pts = fine_pts.reshape(b, k * factor ** 3, 3)
    fine = _eval_point_chunks(decoder, params, h, fine_pts, chunk)
    return vol_c, cell_idx, fine.reshape(b, k, factor ** 3)


def assemble_volume(vol_c: np.ndarray, cell_idx: np.ndarray,
                    fine_vals: np.ndarray, resolution: int) -> np.ndarray:
    """Host-side inverse of :func:`decode_grid_hierarchical`:
    nearest-upsample the coarse volume, overwrite refined cells.
    Returns (B, R, R, R) float32."""
    vol_c = np.asarray(vol_c, np.float32)
    cell_idx = np.asarray(cell_idx)
    fine_vals = np.asarray(fine_vals, np.float32)
    b, c = vol_c.shape[:2]
    f = resolution // c
    blocks = np.broadcast_to(
        vol_c[:, :, None, :, None, :, None],
        (b, c, f, c, f, c, f)).copy()
    zc = cell_idx // (c * c)
    yc = (cell_idx // c) % c
    xc = cell_idx % c
    fine = fine_vals.reshape(b, -1, f, f, f)
    for i in range(b):
        blocks[i, zc[i], :, yc[i], :, xc[i], :] = fine[i]
    return blocks.reshape(b, resolution, resolution, resolution)
