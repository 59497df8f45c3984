"""Cross-implementation pin of the soft-silhouette semantics.

The pose optimizer's loss (reference: diff_model.py:215-224) is a pytorch3d
SoftSilhouetteShader render (render_utils.py:77-119, sigma/gamma from
config.yaml:307-308).  Round-2 verdict (weak #7) noted the bench fidelity
probe scores our renderer against itself; this file closes that loop with
an INDEPENDENT numpy transcription of the pytorch3d pipeline:

  * `pix_to_non_square_ndc` — pytorch3d/renderer/mesh/rasterize_meshes.py's
    pixel→NDC rule: for pixel i along a dim of size S1 (other dim S2),
    ndc = -(2i + 1 - S1) / min(S1, S2); +X left, +Y up, shorter side spans
    [-1, 1].
  * point→triangle signed SQUARED distance — pytorch3d/csrc/utils/geometry
    _utils.cuh `PointTriangleDistanceForward`: min over the three edge
    segments, negated when the point is inside (barycentric sign test).
  * SoftSilhouetteShader blending — pytorch3d/renderer/blending.py
    `sigmoid_alpha_blend`: prob_f = sigmoid(-dist_f / sigma),
    alpha = 1 - prod_f (1 - prob_f) over the K faces rasterized for the
    pixel (K=20 nearest by z, faces_per_pixel).

With fewer than K faces overlapping any pixel and a generous blur radius,
the top-K truncation is inactive and the oracle is EXACT pytorch3d
semantics — so our streaming all-faces product must match to float
tolerance.  Scenes here are built that way.

Our rasterizer consumes screen (u, v, z) from Camera.view_to_screen with
u = cx - fx·x/z (P3D transform_points_screen semantics, pinned by
tests/test_reference_artifacts.py); the oracle converts those to pytorch3d
NDC with x_ndc = (W - 2u)/min(H, W), y_ndc = (H - 2v)/min(H, W) — the same
algebra pytorch3d's projection produces, derived independently here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from regen3d_tpu.ops.rasterize import (
    soft_silhouette,
    soft_silhouette_edge,
)


# ---------------------------------------------------------------------------
# numpy transcription of the pytorch3d soft-silhouette pipeline
# ---------------------------------------------------------------------------

def pix_to_non_square_ndc(i: np.ndarray, s1: int, s2: int) -> np.ndarray:
    """pytorch3d rasterize_meshes.py: pixel index -> NDC along one dim."""
    s = min(s1, s2)
    return -(2.0 * i + 1.0 - s1) / s


def _point_segment_sqdist_np(p, a, b):
    """(P,2) pts vs one segment a→b: squared distance, pytorch3d
    geometry_utils `PointLine2DistanceForward` (clamped projection)."""
    ab = b - a
    denom = max(float(ab @ ab), 1e-12)
    t = np.clip(((p - a) @ ab) / denom, 0.0, 1.0)
    proj = a[None] + t[:, None] * ab[None]
    d = p - proj
    return np.sum(d * d, axis=-1)


def _inside_np(p, v0, v1, v2):
    """Barycentric-sign inside test (pytorch3d IsInsideTriangle)."""
    def edge(a, b):
        return (b[0] - a[0]) * (p[:, 1] - a[1]) - \
               (b[1] - a[1]) * (p[:, 0] - a[0])

    area = (v1[0] - v0[0]) * (v2[1] - v0[1]) - \
           (v1[1] - v0[1]) * (v2[0] - v0[0])
    s = 1.0 if area >= 0 else -1.0
    return (edge(v0, v1) * s >= 0) & (edge(v1, v2) * s >= 0) & \
           (edge(v2, v0) * s >= 0)


def pytorch3d_soft_silhouette_oracle(
    verts_screen: np.ndarray,
    faces: np.ndarray,
    image_hw,
    sigma: float,
    faces_per_pixel: int = 20,
    blur_radius: float = np.inf,
    znear: float = 1e-3,
) -> np.ndarray:
    """Reference-semantics soft silhouette, transcribed from pytorch3d.

    verts_screen: (V, 3) (u, v, z) in our screen convention.  Internally
    converted to pytorch3d NDC; rasterization keeps the `faces_per_pixel`
    nearest-by-z faces whose signed distance is inside `blur_radius` (or
    the face covers the pixel), then sigmoid_alpha_blend combines them.
    """
    h, w = image_hw
    s = float(min(h, w))
    u, v, z = verts_screen[:, 0], verts_screen[:, 1], verts_screen[:, 2]
    ndc = np.stack([(w - 2.0 * u) / s, (h - 2.0 * v) / s], axis=-1)

    ix = np.arange(w, dtype=np.float64)
    iy = np.arange(h, dtype=np.float64)
    x_ndc = pix_to_non_square_ndc(ix, w, h)
    y_ndc = pix_to_non_square_ndc(iy, h, w)
    px = np.stack(np.meshgrid(x_ndc, y_ndc, indexing="xy"), axis=-1)
    pts = px.reshape(-1, 2)                        # (P, 2)
    P = pts.shape[0]

    dists = []   # per-face signed sq distance (P,)
    zbuf = []
    for f in faces:
        tri = ndc[f]                               # (3, 2)
        if np.any(verts_screen[f, 2] < znear):
            continue
        d = np.minimum(
            _point_segment_sqdist_np(pts, tri[0], tri[1]),
            np.minimum(_point_segment_sqdist_np(pts, tri[1], tri[2]),
                       _point_segment_sqdist_np(pts, tri[2], tri[0])))
        inside = _inside_np(pts, tri[0], tri[1], tri[2])
        dists.append(np.where(inside, -d, d))
        zbuf.append(np.full(P, float(np.mean(verts_screen[f, 2]))))
    if not dists:
        return np.zeros((h, w), np.float64)
    D = np.stack(dists, axis=1)                    # (P, F)
    Z = np.stack(zbuf, axis=1)

    # rasterization: keep faces covering the pixel or within blur_radius,
    # take the faces_per_pixel nearest by z
    hit = (D < blur_radius) | (D <= 0)
    Zs = np.where(hit, Z, np.inf)
    order = np.argsort(Zs, axis=1, kind="stable")[:, :faces_per_pixel]
    rows = np.arange(P)[:, None]
    topd = D[rows, order]
    tophit = hit[rows, order]

    with np.errstate(over="ignore"):
        prob = 1.0 / (1.0 + np.exp(np.minimum(topd / sigma, 500.0)))  # σ(-d/σ)
    prob = np.where(tophit, prob, 0.0)
    alpha = 1.0 - np.prod(1.0 - prob, axis=1)
    return alpha.reshape(h, w)


# ---------------------------------------------------------------------------
# scenes: few enough faces that top-K truncation is inactive → exact
# ---------------------------------------------------------------------------

def _random_scene(seed, n_tris, img_hw):
    rng = np.random.default_rng(seed)
    h, w = img_hw
    verts = []
    faces = []
    for i in range(n_tris):
        c = rng.uniform([0.2 * w, 0.2 * h], [0.8 * w, 0.8 * h])
        tri = c + rng.normal(0, 0.18 * min(h, w), (3, 2))
        zc = rng.uniform(1.0, 4.0)
        for p in tri:
            verts.append([p[0], p[1], zc + rng.uniform(-0.05, 0.05)])
        faces.append([3 * i, 3 * i + 1, 3 * i + 2])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


SIGMAS = [1e-4, 1e-5]     # NDC²; visible blur at 48×64 test res


class TestSoftSilhouetteVsPytorch3dOracle:
    @pytest.mark.parametrize("sigma", SIGMAS)
    @pytest.mark.parametrize("seed", [0, 1])
    def test_streaming_matches_oracle(self, sigma, seed):
        img_hw = (48, 64)
        verts, faces = _random_scene(seed, 12, img_hw)
        ours = np.asarray(
            soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), img_hw,
                            sigma=sigma))
        oracle = pytorch3d_soft_silhouette_oracle(verts, faces, img_hw,
                                                  sigma=sigma)
        assert oracle.max() > 0.5          # scene actually covers pixels
        err = np.abs(ours - oracle).max()
        assert err < 5e-3, err

    def test_masked_faces_drop_out(self):
        img_hw = (48, 64)
        verts, faces = _random_scene(3, 8, img_hw)
        keep = np.ones(len(faces), bool)
        keep[::2] = False
        ours = np.asarray(
            soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), img_hw,
                            sigma=1e-4, faces_mask=jnp.asarray(keep)))
        oracle = pytorch3d_soft_silhouette_oracle(verts, faces[keep], img_hw,
                                                  sigma=1e-4)
        assert np.abs(ours - oracle).max() < 5e-3

    def test_znear_culls_like_oracle(self):
        img_hw = (32, 32)
        verts, faces = _random_scene(4, 6, img_hw)
        verts = verts.copy()
        verts[faces[0], 2] = 1e-4          # first face in front of znear
        ours = np.asarray(
            soft_silhouette(jnp.asarray(verts), jnp.asarray(faces), img_hw,
                            sigma=1e-4))
        oracle = pytorch3d_soft_silhouette_oracle(verts, faces, img_hw,
                                                  sigma=1e-4)
        assert np.abs(ours - oracle).max() < 5e-3

    @pytest.mark.parametrize("sigma", SIGMAS)
    def test_edge_variant_tracks_oracle(self, sigma):
        """The MXU edge-distance formulation (TPU default at big res) is a
        corner-sector approximation — pin it to the oracle loosely and
        assert interior/exterior agreement exactly."""
        img_hw = (48, 64)
        verts, faces = _random_scene(7, 12, img_hw)
        ours = np.asarray(
            soft_silhouette_edge(jnp.asarray(verts), jnp.asarray(faces),
                                 img_hw, sigma=sigma, tile=16))
        oracle = pytorch3d_soft_silhouette_oracle(verts, faces, img_hw,
                                                  sigma=sigma)
        hard_ours = ours > 0.5
        hard_oracle = oracle > 0.5
        disagree = np.mean(hard_ours != hard_oracle)
        assert disagree < 0.02, disagree   # ≤2% of pixels near corners
        # interior: min edge-LINE distance == exact boundary distance, so
        # saturated-inside pixels must match the oracle
        inside = oracle > 0.999
        assert inside.any()
        assert np.abs(ours - oracle)[inside].max() < 5e-2
        # exterior: the edge-line distance under-estimates true distance in
        # vertex corner sectors (documented halo) — bound its AVERAGE effect
        outside = oracle < 1e-3
        assert np.abs(ours - oracle)[outside].mean() < 0.02

    def test_topk_truncation_matters_only_beyond_k(self):
        """Sanity of the oracle itself: with > K overlapping faces the
        K-truncation changes the answer (so the exactness above is not
        vacuous)."""
        img_hw = (16, 16)
        rng = np.random.default_rng(0)
        verts, faces = [], []
        for i in range(25):                 # 25 faces all covering center
            tri = np.array([[2.0, 2.0], [14.0, 3.0], [8.0, 14.0]])
            tri = tri + rng.normal(0, 0.3, (3, 2))
            zc = 1.0 + 0.1 * i
            for p in tri:
                verts.append([p[0], p[1], zc])
            faces.append([3 * i, 3 * i + 1, 3 * i + 2])
        verts = np.asarray(verts, np.float32)
        faces = np.asarray(faces, np.int32)
        a20 = pytorch3d_soft_silhouette_oracle(verts, faces, img_hw,
                                               sigma=1e-4, faces_per_pixel=20)
        a25 = pytorch3d_soft_silhouette_oracle(verts, faces, img_hw,
                                               sigma=1e-4, faces_per_pixel=25)
        assert np.abs(a20 - a25).max() > 1e-6
