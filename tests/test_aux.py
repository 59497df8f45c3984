"""Aux subsystems: profiling spans, interactive editing session, fleet sharding."""

import numpy as np
import pytest

from regen3d_tpu.pipeline.detection import BoundingBox, DetectionResult
from regen3d_tpu.pipeline.interactive import EditSession
from regen3d_tpu.utils import profiling


class TestProfiling:
    def test_spans(self):
        profiling.reset()
        with profiling.timed("outer", log_it=False):
            with profiling.timed("inner", log_it=False):
                pass
        rows = profiling.span_summary()
        names = [r[0] for r in rows]
        assert "outer" in names and "inner" in names
        profiling.log_summary()
        profiling.reset()
        assert profiling.span_summary() == []


class TestEditSession:
    def _session(self, rng):
        img = rng.integers(0, 255, size=(64, 80, 3)).astype(np.uint8)
        m = np.zeros((64, 80), bool)
        m[10:30, 10:30] = True
        init = [DetectionResult(0.9, "chair", BoundingBox(10, 10, 30, 30), m)]
        return EditSession(img, initial=init)

    def test_point_paint_fallback(self, rng):
        s = self._session(rng)
        before = s.masks[0].mask.sum()
        s.add_point(0, 50, 50, positive=True)
        assert s.masks[0].mask.sum() > before
        s.add_point(0, 50, 50, positive=False)

    def test_box_delete_merge(self, rng):
        s = self._session(rng)
        j = s.new_from_box("table", 40, 40, 60, 60)
        assert len(s.masks) == 2
        s.merge(0, j)
        assert len(s.masks) == 1
        assert s.masks[0].mask[45, 45]
        s.delete(0)
        assert len(s.masks) == 0

    def test_overlap_resolution_and_finish(self, rng):
        s = self._session(rng)
        s.new_from_box("table", 15, 15, 50, 50)
        s.resolve_overlaps()
        a, b = s.masks[0].mask, s.masks[1].mask
        assert not (a & b).any()
        dets = s.finish()
        assert len(dets) == 2
        assert {d.label for d in dets} == {"chair", "table"}


class TestFleet:
    def test_scene_sharding_single_host(self, rng, tmp_path):
        from regen3d_tpu.parallel.fleet import SceneJob, run_fleet
        from regen3d_tpu.utils.image import save_image
        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        p = str(tmp_path / "in.png")
        save_image(p, img)
        jobs = [SceneJob("s1", p, str(tmp_path / "s1" / "output")),
                SceneJob("s2", p, str(tmp_path / "s2" / "output"))]
        # phase 1 only (IO-light, weightless fallback path)
        res = run_fleet(jobs, phases=[1])
        assert len(res) == 2
        assert all(r.ok for r in res)
        import os
        assert os.path.isdir(str(tmp_path / "s1" / "output" / "findings"))


class TestOrchestratorCLI:
    def test_run_phases_via_cli_surface(self, tmp_path, rng):
        """The reference CLI contract: --config YAML + -p phase list."""
        import os
        import yaml
        from regen3d_tpu.orchestrator import main
        from regen3d_tpu.utils.image import save_image

        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        src = tmp_path / "src"
        src.mkdir()
        save_image(str(tmp_path / "in.png"), img)
        cfg_path = str(src / "config.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({
                "output": str(tmp_path / "output"),
                "input_image": str(tmp_path / "in.png"),
            }, f)
        main(["-p", "1", "--config", cfg_path])
        assert os.path.isdir(str(tmp_path / "output" / "findings" / "fullSize"))

    def test_unknown_phase_rejected(self, tmp_path):
        import pytest as _pytest
        import yaml
        from regen3d_tpu.orchestrator import main
        cfg_path = str(tmp_path / "c.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump({"output": str(tmp_path / "out")}, f)
        with _pytest.raises(ValueError):
            main(["-p", "42", "--config", cfg_path])


class TestEditSessionWithSAM:
    def test_sam_backed_edits(self, rng):
        """Encode-once/decode-many editing through a (tiny) SAM."""
        import jax
        import jax.numpy as jnp
        from regen3d_tpu.models.sam import SAM, SamConfig

        cfg = SamConfig.tiny()
        model = SAM(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                            jnp.zeros((1, 1, 2)), -jnp.ones((1, 1)),
                            jnp.zeros((1, 2, 2)))
        img = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        s = EditSession(img, sam=model, sam_params=params)
        i = s.new_from_box("chair", 10, 10, 40, 35)
        assert s.masks[i].mask.shape == (48, 64)
        before = s.masks[i].mask.copy()
        s.add_point(i, 20, 20, positive=True)
        s.add_point(i, 50, 40, positive=False)
        # the SAM decoder re-ran on the prompt history (mask may change
        # arbitrarily with random weights; shape/typing are the contract)
        assert s.masks[i].mask.dtype == bool
        assert s.masks[i].points == [(20, 20, 1), (50, 40, 0)]
        dets = s.finish()
        assert all(d.mask.shape == (48, 64) for d in dets)


class TestFront3D:
    def test_camera_extraction(self, tmp_path):
        import json
        import jax.numpy as jnp
        from regen3d_tpu.camera import camera_from_npz
        from regen3d_tpu.pipeline.front3d import extract_camera_from_json

        meta = {"camera": {"pos": [0, 1.5, -3], "look_at": [0, 1, 2],
                           "fov": 90.0},
                "width": 640, "height": 480}
        jp = str(tmp_path / "scene.json")
        with open(jp, "w") as f:
            json.dump(meta, f)
        npz = str(tmp_path / "camera.npz")
        extract_camera_from_json(jp, npz)
        cam = camera_from_npz(npz)
        assert cam.image_size == (480, 640)
        # fov 90° horizontal → focal = width/2 = 320
        np.testing.assert_allclose(np.asarray(cam.focal), [320.0, 320.0],
                                   atol=0.5)
        # the look_at target projects to the image centre
        uv, z = cam.project(jnp.asarray([0.0, 1.0, 2.0]))
        assert float(z) > 0
        np.testing.assert_allclose(np.asarray(uv), [320.0, 240.0], atol=1.0)
