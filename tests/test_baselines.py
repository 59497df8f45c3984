"""MIDI / DPA comparison-baseline adapters (Use_MIDI / Use_DPA workflows).

Reference: run_midi.py:36-120 (segmentation → MIDI scene GLB →
scene_optim copies it over glb_scene_path → evaluation) and
run_dpa.py:20-53 (five-stage chain writing stage dirs). Pinned here:
artifact contracts, the phase-7 Use_MIDI copy, and the orchestrator's
default-flow swap."""

import os

import numpy as np
import pytest
from PIL import Image

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import default_config
from regen3d_tpu.utils.glb import load_glb


def _room(tmp_path):
    img = np.full((96, 128, 3), 210, np.uint8)
    img[60:, :] = (150, 110, 80)
    img[64:88, 16:44] = (200, 40, 40)
    img[62:86, 80:112] = (40, 60, 200)
    p = str(tmp_path / "room.png")
    Image.fromarray(img).save(p)
    return p


class TestMIDIBaseline:
    def test_label_mode_scene_glb(self, tmp_path):
        from regen3d_tpu.pipeline import baseline_midi

        cfg = default_config(str(tmp_path / "output"),
                             input_image=_room(tmp_path),
                             num_inference_steps_midi=2,
                             octree_resolution_hy=24, num_inf_steps_hy=2)
        out = baseline_midi.run(cfg)
        assert out is not None and os.path.exists(out)
        assert out.endswith("combined_scene_midi.glb")
        scene = load_glb(out)
        assert len(scene.meshes) >= 1
        # all instances placed at positive depth (in front of the camera)
        for m in scene.meshes:
            assert m.vertices[:, 2].min() > 0
        assert os.path.exists(os.path.join(
            cfg.path("midi_output"), "segmentation.png"))

    def test_use_latest_glb_reuses(self, tmp_path):
        from regen3d_tpu.pipeline import baseline_midi

        cfg = default_config(str(tmp_path / "output"),
                             input_image=_room(tmp_path),
                             num_inference_steps_midi=2,
                             octree_resolution_hy=24, num_inf_steps_hy=2)
        first = baseline_midi.run(cfg)
        mtime = os.path.getmtime(first)
        cfg2 = default_config(str(tmp_path / "output"),
                              input_image=_room(tmp_path),
                              use_latest_glb=True)
        again = baseline_midi.run(cfg2)
        assert again == first
        assert os.path.getmtime(again) == mtime, "GLB was regenerated"

    def test_box_mode(self, tmp_path):
        from regen3d_tpu.pipeline import baseline_midi

        img_path = _room(tmp_path)
        with open(os.path.splitext(img_path)[0] + ".boxes.txt", "w") as f:
            f.write("16 64 44 88\n80 62 112 86\n")
        cfg = default_config(str(tmp_path / "output"), input_image=img_path,
                             seg_mode="box", num_inference_steps_midi=2,
                             octree_resolution_hy=24, num_inf_steps_hy=2)
        out = baseline_midi.run(cfg)
        assert out is not None
        assert len(load_glb(out).meshes) <= 2

    def test_phase7_consumes_midi_glb(self, tmp_path):
        from regen3d_tpu.pipeline import baseline_midi
        from regen3d_tpu.pipeline.phase7_assemble import combine_scene_glb

        cfg = default_config(str(tmp_path / "output"),
                             input_image=_room(tmp_path), Use_MIDI=True,
                             num_inference_steps_midi=2,
                             octree_resolution_hy=24, num_inf_steps_hy=2)
        midi_glb = baseline_midi.run(cfg)
        assert midi_glb
        out = combine_scene_glb(cfg)
        art = Artifacts(cfg)
        assert out == art.combined_scene_glb
        assert os.path.getsize(out) == os.path.getsize(midi_glb)


class TestDPABaseline:
    def test_stage_chain(self, tmp_path):
        from regen3d_tpu.pipeline import baseline_dpa

        cfg = default_config(str(tmp_path / "output"),
                             input_image=_room(tmp_path), Use_DPA=True,
                             dpa_iterations=4, octree_resolution_hy=24,
                             num_inf_steps_hy=2)
        out = baseline_dpa.run(cfg)
        assert out is not None and os.path.exists(out)
        root = cfg.path("dpa_output")
        for stage in ("segmentation", "inpainting", "object_generation",
                      "geometry", "final_registration"):
            d = os.path.join(root, stage)
            assert os.path.isdir(d) and os.listdir(d), f"empty stage {stage}"
        scene = load_glb(out)
        assert len(scene.meshes) >= 1
        for m in scene.meshes:
            assert np.all(np.isfinite(m.vertices))


class TestOrchestratorBaselineFlow:
    def test_default_phase_swap(self, tmp_path, monkeypatch):
        import regen3d_tpu.orchestrator as orch

        calls = []
        monkeypatch.setattr(
            orch, "run_phases",
            lambda cfg, phases, *a, **k: calls.append(list(phases)))
        import yaml
        p = str(tmp_path / "c.yaml")
        cfg = default_config(str(tmp_path / "output"),
                             input_image=_room(tmp_path), Use_MIDI=True)
        yaml.safe_dump({k: cfg[k] for k in cfg}, open(p, "w"))
        orch.main(["--config", p])
        assert calls[-1] == [10, 7, 9]
        # explicit -p wins over the flag
        orch.main(["--config", p, "-p", "1", "2"])
        assert calls[-1] == [1, 2]
