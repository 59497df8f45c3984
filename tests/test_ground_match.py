"""Ground matching (phase 7) on-device NN port.

The reference's match_grounds (mesh_pointclouds.py:280-458) iteratively
shifts the background mesh in Y until its low band agrees with the
PLANE_SAMPLED.ply floor samples within an XZ search radius. The Y shift is
uniform, so the XZ matches are loop-invariant and the converged offset is
the first masked mean — these tests pin that semantic on the MXU NN port
(_ground_offset_prog / _match_grounds, phase7_assemble.py).
"""

import os

import numpy as np

from regen3d_tpu.config import default_config
from regen3d_tpu.pipeline.phase7_assemble import (
    _ground_offset_prog,
    _match_grounds,
    _pad_pow2,
)
from regen3d_tpu.utils.ply import save_ply


def _prog_offset(band, target, bound):
    import jax.numpy as jnp

    band_p, band_m = _pad_pow2(band.astype(np.float32))
    tgt_p, tgt_m = _pad_pow2(target.astype(np.float32))
    off, cnt = _ground_offset_prog(len(band_p), len(tgt_p))(
        jnp.asarray(band_p), jnp.asarray(band_m),
        jnp.asarray(tgt_p), jnp.asarray(tgt_m), jnp.float32(bound))
    return float(off), int(cnt)


def test_offset_matches_host_reference(rng):
    """Device offset == the hoisted scipy/numpy computation it replaces."""
    band = rng.uniform(-1, 1, size=(333, 3)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(777, 3)).astype(np.float32)
    bound = 0.2
    # host reference: brute-force XZ NN + bound + mean Y difference
    d2 = ((band[:, None, [0, 2]] - target[None, :, [0, 2]]) ** 2).sum(-1)
    idx = d2.argmin(1)
    ok = d2[np.arange(len(band)), idx] <= bound * bound
    want = float(np.mean(target[idx[ok], 1] - band[ok, 1]))
    got, cnt = _prog_offset(band, target, bound)
    assert cnt == int(ok.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_out_of_radius_points_excluded():
    band = np.asarray([[0.0, 0.0, 0.0], [5.0, 3.0, 5.0]], np.float32)
    target = np.asarray([[0.01, 1.0, 0.01]], np.float32)
    off, cnt = _prog_offset(band, target, bound=0.1)
    assert cnt == 1                    # the far band point found no match
    np.testing.assert_allclose(off, 1.0, atol=1e-6)


def test_match_grounds_shifts_mesh_to_plane(tmp_path, rng):
    cfg = default_config(str(tmp_path / "output"))
    art_temp = os.path.join(str(tmp_path / "output"), "tmp", "debug")
    os.makedirs(art_temp, exist_ok=True)
    # plane samples at y = 0.7 on a grid
    gx, gz = np.meshgrid(np.linspace(-1, 1, 20), np.linspace(-1, 1, 20))
    plane = np.stack([gx.ravel(), np.full(gx.size, 0.7), gz.ravel()], -1)
    from regen3d_tpu.artifacts import Artifacts
    plane_path = os.path.join(Artifacts(cfg).temp, "debug",
                              "PLANE_SAMPLED.ply")
    os.makedirs(os.path.dirname(plane_path), exist_ok=True)
    save_ply(plane_path, plane.astype(np.float32))
    # mesh whose low decile sits at y ≈ 0: expect a ~+0.7 uniform shift
    verts = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
    verts[:, 1] = rng.uniform(0.0, 2.0, size=1000)
    out = _match_grounds(cfg, verts.copy())
    shift = float(np.mean(out[:, 1] - verts[:, 1]))
    assert abs(shift - (0.7 - float(
        verts[verts[:, 1] <= np.quantile(verts[:, 1], 0.1), 1].mean()))) < 0.05
    np.testing.assert_allclose(out[:, [0, 2]], verts[:, [0, 2]])


def test_match_grounds_no_plane_file_is_noop(tmp_path, rng):
    cfg = default_config(str(tmp_path / "output"))
    verts = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
    out = _match_grounds(cfg, verts.copy())
    np.testing.assert_allclose(out, verts)
