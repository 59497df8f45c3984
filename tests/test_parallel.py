"""Parallel layer: mesh rules, sharded pose fit ≡ unsharded, fleet driver.

Runs on the 8-virtual-CPU-device mesh from conftest.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from regen3d_tpu.parallel.mesh import (
    DEFAULT_RULES,
    make_mesh,
    partition_spec_for,
    shard_params,
)


class TestMeshRules:
    def test_fused_qkv_rules(self):
        assert partition_spec_for("aggregator/frame_block0/attn/qkv/kernel") \
            == P(None, "tp")
        assert partition_spec_for("aggregator/frame_block0/attn/qkv/bias") \
            == P("tp")
        assert partition_spec_for("aggregator/frame_block0/attn/proj/kernel") \
            == P("tp", None)

    def test_vggt_params_shard(self):
        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        cfg = VGGTConfig.tiny()
        m = VGGT(cfg)
        p = m.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 1, cfg.image_size, cfg.image_size, 3)))
        mesh = make_mesh(8)
        sp = shard_params(p, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sp)[0]
        tp_sharded = 0
        for kp, leaf in flat:
            path = "/".join(str(getattr(k, "key", k)) for k in kp)
            if "qkv/kernel" in path:
                spec = leaf.sharding.spec
                assert "tp" in tuple(spec), path
                tp_sharded += 1
        assert tp_sharded >= 4  # backbone + frame/global blocks

    def test_single_device_mesh_degenerates(self):
        mesh = make_mesh(1)
        assert dict(mesh.shape) == {"dp": 1, "tp": 1}

    def test_vggt_tp_sharded_equals_unsharded(self):
        """Tensor-parallel VGGT forward == single-device forward (f32): a
        wrong partition rule that still produces finite numbers fails here
        (VERDICT r2 weak #5)."""
        from jax.sharding import NamedSharding
        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        cfg = VGGTConfig(image_size=28, patch=14, width=64, depth=2,
                         num_heads=4, backbone_depth=1,
                         num_register_tokens=1, camera_iterations=1,
                         camera_trunk_depth=1, dtype=jnp.float32)
        model = VGGT(cfg)
        imgs = jax.random.uniform(
            jax.random.PRNGKey(7), (1, 2, cfg.image_size, cfg.image_size, 3))
        params = model.init(jax.random.PRNGKey(0), imgs)
        ref = jax.jit(model.apply)(params, imgs)
        mesh = make_mesh(8)           # dp=2 × tp=4
        sp = shard_params(params, mesh)
        simgs = jax.device_put(imgs, NamedSharding(mesh, P()))
        with mesh:
            out = jax.jit(model.apply)(sp, simgs)
            for k in ("depth", "pose_enc"):
                np.testing.assert_allclose(
                    np.asarray(out[k], np.float32),
                    np.asarray(ref[k], np.float32),
                    rtol=1e-4, atol=1e-5, err_msg=k)


class TestShardedPoseFit:
    def _make_problem(self, b=3, h=24, w=24, seed=0):
        from regen3d_tpu.camera import lookat_camera
        from regen3d_tpu.pipeline.pose_fit import (FitConfig, ObjectBatch,
                                                   PoseParams)
        rng = np.random.default_rng(seed)
        v = jnp.asarray(rng.uniform(-0.3, 0.3, size=(b, 12, 3)), jnp.float32)
        f = jnp.asarray(rng.integers(0, 12, size=(b, 16, 3)), jnp.int32)
        batch = ObjectBatch(
            verts=v, verts_mask=jnp.ones((b, 12), bool),
            faces=f, faces_mask=jnp.ones((b, 16), bool),
            target_mask=jnp.asarray(
                rng.uniform(size=(b, h, w)) > 0.6, jnp.float32),
            target_points=jnp.asarray(rng.uniform(-1, 1, size=(b, 24, 3)),
                                      jnp.float32),
            points_mask=jnp.ones((b, 24), bool),
            pivot_R=jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
            pivot_t=jnp.zeros((b, 3)),
            on_floor=jnp.zeros(b, bool),
            object_valid=jnp.ones(b, bool),
            bbox_lo=jnp.asarray([-2.0, -2.0, -2.0]),
            bbox_hi=jnp.asarray([2.0, 2.0, 2.0]))
        cam = lookat_camera(np.asarray([0, 0, -3.0], np.float32),
                            np.zeros(3, np.float32), (h, w), focal_px=30.0)
        cfg = FitConfig(image_hw=(h, w), max_iterations=5,
                        early_stop_min_iters=0, record_history=False,
                        face_chunk=16, point_chunk=24)
        return PoseParams.zeros(b), batch, cam, cfg

    def test_sharded_equals_unsharded(self):
        """dp-sharding the object axis (with ragged padding) must not change
        the optimization result."""
        from regen3d_tpu.pipeline.pose_fit import fit_poses, fit_poses_sharded
        init, batch, cam, cfg = self._make_problem(b=3)
        ref = fit_poses(init, batch, cam, cfg)
        mesh = make_mesh(8, tp=1)   # dp=8; b=3 pads to 8
        got = fit_poses_sharded(init, batch, cam, cfg, mesh)
        np.testing.assert_allclose(np.asarray(got.losses),
                                   np.asarray(ref.losses), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.params.translation),
                                   np.asarray(ref.params.translation),
                                   rtol=1e-3, atol=1e-5)
        assert got.params.yaw.shape == (3,)

    def test_mixed_mesh(self):
        """dp=2×tp=4 mesh also runs the object-sharded fit."""
        from regen3d_tpu.pipeline.pose_fit import fit_poses_sharded
        init, batch, cam, cfg = self._make_problem(b=2)
        mesh = make_mesh(8)  # dp=2, tp=4
        got = fit_poses_sharded(init, batch, cam, cfg, mesh)
        assert got.losses.shape == (2,)
        assert np.all(np.isfinite(np.asarray(got.losses)))


class TestFleet:
    def test_run_fleet_two_scenes(self, tmp_path):
        """Two synthetic scenes through phases 1-2; per-scene isolation."""
        from regen3d_tpu.parallel.fleet import SceneJob, run_fleet
        from regen3d_tpu.utils.image import save_image
        rng = np.random.default_rng(0)
        jobs = []
        for i in range(2):
            img = np.full((48, 64, 3), 220, np.uint8)
            img[20 + 4 * i:40, 20:44] = (200, 60 + 60 * i, 40)
            p = str(tmp_path / f"scene{i}.png")
            save_image(p, img)
            jobs.append(SceneJob(scene_id=f"s{i}", input_image=p,
                                 output_root=str(tmp_path / f"out{i}")))
        results = run_fleet(jobs, phases=[1, 2])
        assert len(results) == 2
        assert all(r.ok for r in results), [r.error for r in results]
        import os
        for i in range(2):
            assert os.path.isdir(str(tmp_path / f"out{i}" / "findings"))

    def test_shard_jobs_partitions_exactly(self):
        """Multi-host DCN slicing (SURVEY §2.11): over any pcount, every
        scene lands on exactly one host and the union is the full list."""
        from regen3d_tpu.parallel.fleet import SceneJob, shard_jobs
        jobs = [SceneJob(f"s{i}", f"i{i}.png", f"o{i}") for i in range(7)]
        for pcount in (1, 2, 3, 8):
            shards = [shard_jobs(jobs, p, pcount) for p in range(pcount)]
            ids = [j.scene_id for s in shards for j in s]
            assert sorted(ids) == sorted(j.scene_id for j in jobs), pcount
            assert len(ids) == len(set(ids)), pcount
        # round-robin: host 0 of 2 takes the even indices
        assert [j.scene_id for j in shard_jobs(jobs, 0, 2)] == \
            ["s0", "s2", "s4", "s6"]
        with pytest.raises(ValueError):
            shard_jobs(jobs, 2, 2)

    def test_run_fleet_respects_process_slicing(self, tmp_path):
        """run_fleet with an injected process_index runs ONLY its shard —
        the DCN path exercised without a real 2-process runtime."""
        from regen3d_tpu.parallel.fleet import SceneJob, run_fleet
        from regen3d_tpu.utils.image import save_image
        img = np.full((32, 32, 3), 210, np.uint8)
        img[8:24, 8:24] = (170, 60, 40)
        jobs = []
        for i in range(3):
            p = str(tmp_path / f"scene{i}.png")
            save_image(p, img)
            jobs.append(SceneJob(f"s{i}", p, str(tmp_path / f"out{i}")))
        r0 = run_fleet(jobs, phases=[1], process_index=0, process_count=2)
        r1 = run_fleet(jobs, phases=[1], process_index=1, process_count=2)
        assert [r.scene_id for r in r0] == ["s0", "s2"]
        assert [r.scene_id for r in r1] == ["s1"]
        assert all(r.ok for r in r0 + r1), [r.error for r in r0 + r1]
        import os
        done = [i for i in range(3)
                if os.path.isdir(str(tmp_path / f"out{i}" / "findings"))]
        assert done == [0, 1, 2]

    def test_fleet_isolates_failures(self, tmp_path):
        """A broken scene fails alone; the rest of the fleet completes."""
        from regen3d_tpu.parallel.fleet import SceneJob, run_fleet
        from regen3d_tpu.utils.image import save_image
        img = np.full((32, 32, 3), 200, np.uint8)
        img[8:24, 8:24] = (180, 40, 40)
        good = str(tmp_path / "good.png")
        save_image(good, img)
        jobs = [
            SceneJob("bad", str(tmp_path / "missing.png"),
                     str(tmp_path / "out_bad")),
            SceneJob("good", good, str(tmp_path / "out_good")),
        ]
        results = run_fleet(jobs, phases=[1])
        by_id = {r.scene_id: r for r in results}
        assert not by_id["bad"].ok and by_id["bad"].error
        assert by_id["good"].ok
