"""Marching tetrahedra: sphere SDF → watertight mesh with correct radius."""

import numpy as np
import pytest

from regen3d_tpu.ops.marching_cubes import (
    _get_lib,
    _marching_tetrahedra_numpy,
    marching_tetrahedra,
)


def _sphere_sdf(n=32, r=0.6):
    lin = np.linspace(-1, 1, n)
    zz, yy, xx = np.meshgrid(lin, lin, lin, indexing="ij")
    return (np.sqrt(xx**2 + yy**2 + zz**2) - r).astype(np.float32)


class TestMarchingTetrahedra:
    def test_native_builds(self):
        assert _get_lib() is not None, "C++ marching lib failed to build"

    def test_sphere_radius(self):
        sdf = _sphere_sdf(48, 0.6)
        verts, tris = marching_tetrahedra(sdf, 0.0, bounds=(-1.0, 1.0))
        assert len(verts) > 100 and len(tris) > 100
        radii = np.linalg.norm(verts, axis=1)
        np.testing.assert_allclose(radii.mean(), 0.6, atol=0.02)
        assert radii.std() < 0.02

    def test_watertight_and_oriented(self):
        """Closed surface: every edge shared by exactly 2 triangles with
        opposite direction (consistent orientation)."""
        sdf = _sphere_sdf(24, 0.5)
        verts, tris = marching_tetrahedra(sdf, 0.0)
        # drop degenerate triangles (repeated vertex ids) before the check
        ok = (tris[:, 0] != tris[:, 1]) & (tris[:, 1] != tris[:, 2]) & \
             (tris[:, 0] != tris[:, 2])
        tris = tris[ok]
        edges = {}
        for t in tris:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                edges[(a, b)] = edges.get((a, b), 0) + 1
        for (a, b), cnt in edges.items():
            assert cnt == 1, "duplicate directed edge — inconsistent winding"
            assert edges.get((b, a), 0) == 1, "boundary edge — not watertight"

    def test_normals_point_outward(self):
        sdf = _sphere_sdf(32, 0.6)
        verts, tris = marching_tetrahedra(sdf, 0.0, bounds=(-1.0, 1.0))
        tri = verts[tris]
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        centers = tri.mean(1)
        align = (n * centers).sum(-1)
        frac_out = (align > 0).mean()
        assert frac_out > 0.99 or frac_out < 0.01  # consistent...
        assert frac_out > 0.99, "normals should point outward (away from center)"

    def test_numpy_fallback_matches_native(self):
        sdf = _sphere_sdf(16, 0.55)
        v1, t1 = marching_tetrahedra(sdf, 0.0)
        v2, t2 = _marching_tetrahedra_numpy(sdf, 0.0)
        assert abs(len(t1) - len(t2)) <= len(t1) * 0.02
        r1 = np.linalg.norm(v1 - v1.mean(0), axis=1).mean()
        r2 = np.linalg.norm(v2 - v2.mean(0), axis=1).mean()
        np.testing.assert_allclose(r1, r2, atol=1e-3)

    def test_empty_volume(self):
        sdf = np.ones((8, 8, 8), np.float32)
        verts, tris = marching_tetrahedra(sdf, 0.0)
        assert len(verts) == 0 and len(tris) == 0


class TestHierarchicalDecode:
    """decode_grid_hierarchical ≡ decode_grid wherever it matters: the
    assembled volume matches densely in the surface band, and marching
    cubes yields the identical mesh."""

    def _analytic_decoder(self):
        """A ShapeDecoder-shaped module whose SDF is an analytic ellipsoid
        (ignores latents) — lets the hierarchy be checked exactly."""
        import flax.linen as nn
        import jax.numpy as jnp

        class Analytic(nn.Module):
            def setup(self):
                self.dummy = self.param("dummy", nn.initializers.zeros, (1,))

            def trunk(self, latents):
                return latents

            def query(self, h, points):
                r = jnp.linalg.norm(points / jnp.asarray([0.7, 0.5, 0.6]),
                                    axis=-1)
                return r - 1.0

            def __call__(self, latents, points):
                return self.query(self.trunk(latents), points)

        return Analytic()

    def test_matches_dense_through_marching_cubes(self):
        import jax
        import jax.numpy as jnp

        from regen3d_tpu.models.shapevae import (
            assemble_volume,
            decode_grid,
            decode_grid_hierarchical,
        )
        from regen3d_tpu.ops.marching_cubes import marching_tetrahedra

        dec = self._analytic_decoder()
        lat = jnp.zeros((1, 4, 4))
        params = dec.init(jax.random.PRNGKey(0), lat, jnp.zeros((1, 8, 3)))
        res = 64
        dense = np.asarray(decode_grid(dec, params, lat, resolution=res,
                                       chunk=4096))[None]
        vol_c, idx, fine = decode_grid_hierarchical(
            dec, params, lat, resolution=res, factor=4, chunk=4096)
        hier = assemble_volume(vol_c, idx, fine, res)

        # surface band identical (cells holding the zero crossing refined)
        band = np.abs(dense) < 2.0 * (2 * 1.01 / res)
        np.testing.assert_allclose(hier[band], dense[band], atol=1e-6)

        v_d, f_d = marching_tetrahedra(dense[0], 0.0, bounds=(-1.01, 1.01))
        v_h, f_h = marching_tetrahedra(hier[0], 0.0, bounds=(-1.01, 1.01))
        assert v_d.shape == v_h.shape and f_d.shape == f_h.shape
        np.testing.assert_allclose(v_h, v_d, atol=1e-6)
        np.testing.assert_array_equal(f_h, f_d)

    def test_batched_and_budgeted(self):
        """K smaller than the full band still yields a usable volume; the
        batch axis assembles independently."""
        import jax
        import jax.numpy as jnp

        from regen3d_tpu.models.shapevae import (
            assemble_volume,
            decode_grid_hierarchical,
        )

        dec = self._analytic_decoder()
        lat = jnp.zeros((2, 4, 4))
        params = dec.init(jax.random.PRNGKey(0), lat[:1],
                          jnp.zeros((1, 8, 3)))
        res = 32
        vol_c, idx, fine = decode_grid_hierarchical(
            dec, params, lat, resolution=res, factor=4, chunk=1024,
            refine_cells=16)
        assert vol_c.shape == (2, 8, 8, 8)
        assert idx.shape == (2, 16) and fine.shape == (2, 16, 64)
        vols = assemble_volume(vol_c, idx, fine, res)
        assert vols.shape == (2, res, res, res)
        assert np.isfinite(vols).all()
        # both objects identical SDF → identical assembly
        np.testing.assert_allclose(vols[0], vols[1], atol=1e-6)
