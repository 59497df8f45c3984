"""MIDI-3D comparison baseline (the `Use_MIDI: true` workflow).

Reference: /root/reference/src/evaluation/run_midi.py:36-120 +
run.py:468-475 — when Use_MIDI is on, the pipeline swaps phases 1-5 for
[MIDI_2d_to_3d → scene_optim → evaluation]: Grounding-SAM segmentation,
the MIDI multi-instance diffusion producing one scene GLB at
``glb_scene_path_midi``, which scene_optim copies over ``glb_scene_path``
(scene_optim.py:180-183) before optimization and evaluation.

TPU-native adapter: segmentation reuses the phase-1 detector+SAM engine;
instance shape generation runs the batched flow-matching DiT with
``cross_instance=True`` — every DiT block is followed by a zero-init
gated attention over the CONCATENATED tokens of all instances, so the
scene's instances denoise JOINTLY (the defining MIDI mechanism,
run_midi.py:36-43; conversion family ``midi`` maps a trained checkpoint
onto these blocks). Each instance is additionally conditioned on its
scene-layout box via a parameter-free fourier box token. Scene layout
comes from the segmentation geometry (mask centroid rays + bbox-scaled
depth placement, seg_mode/box parity with run_midi's ``seg_mode`` knob).
The output contract is exact: combined_scene_midi.glb + a segmentation
visualization under ``midi_output``.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional

import numpy as np
from PIL import Image

from regen3d_tpu.artifacts import Artifacts
from regen3d_tpu.config import Config
from regen3d_tpu.utils.glb import MeshData, SceneData, save_glb
from regen3d_tpu.utils.image import load_image_rgb

log = logging.getLogger(__name__)


def _read_boxes(txt_path: str) -> List[List[int]]:
    """run_midi.py:66-75 box txt format: 4 whitespace ints per line."""
    boxes = []
    with open(txt_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 4:
                boxes.append([int(p) for p in parts])
    return boxes


def run(cfg: Config, sam=None, sam_params=None,
        detector=None, detector_params=None,
        generator=None) -> Optional[str]:
    """Image → segmentation → joint instance generation → scene GLB.

    Returns the written GLB path (cfg ``glb_scene_path_midi``)."""
    import jax

    from regen3d_tpu.pipeline.detection import BoundingBox, DetectionResult
    from regen3d_tpu.pipeline.phase1_segmentation import detect_and_segment
    from regen3d_tpu.pipeline.phase3_assets import (
        AssetGenerator,
        extract_and_clean,
    )

    art = Artifacts(cfg)
    out_glb = cfg.path("glb_scene_path_midi",
                       "../output/glb/scene/combined_scene_midi.glb")
    if bool(cfg.get("use_latest_glb", False)) and os.path.exists(out_glb):
        # debug shortcut: reuse the last generated scene GLB
        # (reference config.yaml:402 use_latest_glb)
        log.info("midi: use_latest_glb — reusing %s", out_glb)
        return out_glb
    out_dir = cfg.path("midi_output", "../output/midi/")
    os.makedirs(out_dir, exist_ok=True)
    image = load_image_rgb(cfg.path("input_image"), max_side=None)
    h, w = image.shape[:2]

    seg_mode = str(cfg.get("seg_mode", "label"))
    if seg_mode == "box":
        # box mode: boxes from <input>.boxes.txt (run_midi box contract)
        box_txt = os.path.splitext(cfg.path("input_image"))[0] + ".boxes.txt"
        boxes = _read_boxes(box_txt) if os.path.exists(box_txt) else []
        dets = []
        for x0, y0, x1, y1 in boxes:
            m = np.zeros((h, w), bool)
            m[y0:y1, x0:x1] = True
            dets.append(DetectionResult(
                label="object", score=1.0,
                box=BoundingBox(x0, y0, x1, y1), mask=m))
        if not dets:
            log.warning("midi: box mode with no %s — falling back to label",
                        box_txt)
            seg_mode = "label"
    if seg_mode != "box":
        thr_cfg = Config({**cfg.values,
                          "threshold": float(cfg.get("detect_threshold",
                                                     0.2))},
                         cfg.base_dir)
        dets = detect_and_segment(thr_cfg, image, sam, sam_params,
                                  detector, detector_params)
    if not dets:
        log.warning("midi: no instances detected")
        return None

    # segmentation visualization (the Gradio seg output, run_midi.py:129)
    vis = image.copy()
    rng = np.random.default_rng(0)
    for d in dets:
        col = rng.integers(64, 255, 3)
        vis[d.mask] = (0.5 * vis[d.mask] + 0.5 * col).astype(np.uint8)
    Image.fromarray(vis).save(os.path.join(out_dir, "segmentation.png"))

    if generator is None:
        log.warning("midi: no checkpoint — random-init generator")
        # cross_instance=True: every DiT block is followed by attention
        # over the concatenated tokens of ALL instances — the defining
        # MIDI mechanism (run_midi.py:36-43), not an approximation
        generator = AssetGenerator.random_init(
            jax.random.PRNGKey(int(cfg.get("seed", 1234567))), tiny=True,
            cross_instance=True)

    # joint instance generation: all instance crops through ONE batched
    # jitted diffusion program (the MIDI multi-instance denoising role)
    import jax.numpy as jnp
    size = 64 if generator.dit_cfg.width < 512 else 512
    crops = []
    for d in dets:
        x0, y0 = int(d.box.xmin), int(d.box.ymin)
        x1, y1 = int(np.ceil(d.box.xmax)), int(np.ceil(d.box.ymax))
        crop = image[max(y0, 0):y1, max(x0, 0):x1].astype(np.float32) / 255.0
        a = d.mask[max(y0, 0):y1, max(x0, 0):x1].astype(np.float32)
        rgba = np.concatenate([crop, a[..., None]], -1)
        crops.append(np.asarray(jax.image.resize(
            jnp.asarray(rgba), (size, size, 4), "bilinear")))
    steps = int(cfg.get("num_inference_steps_midi", 50))
    guidance = float(cfg.get("guidance_scale_midi", 7.0))
    res = int(cfg.get("octree_resolution_hy", 256))
    if generator.dit_cfg.width < 512:
        res = min(res, 128)
    # per-instance box conditioning token: fourier features of the
    # normalized box (cx, cy, bw, bh) zero-padded to cond_dim — a
    # parameter-free scene-layout signal alongside the crop image tokens
    # (MIDI conditions each instance on its mask/box within the scene)
    from regen3d_tpu.models.layers import fourier_features
    boxes_n = np.asarray(
        [[(d.box.xmin + d.box.xmax) / (2.0 * w),
          (d.box.ymin + d.box.ymax) / (2.0 * h),
          (d.box.xmax - d.box.xmin) / w,
          (d.box.ymax - d.box.ymin) / h] for d in dets], np.float32)
    ff = np.asarray(fourier_features(jnp.asarray(boxes_n), 8))
    cd = generator.dit_cfg.cond_dim
    box_tok = np.zeros((len(dets), 1, cd), np.float32)
    box_tok[:, 0, :min(ff.shape[-1], cd)] = ff[:, :cd]
    vols = generator.generate_sdf_batch(
        jax.random.PRNGKey(int(cfg.get("seed", 1234567))),
        np.stack(crops), steps, guidance, res, 2048,
        extra_cond_tokens=box_tok)

    # layout from segmentation geometry: centroid ray at bbox-scaled depth
    focal = max(h, w) * 1.0
    meshes = []
    for i, d in enumerate(dets):
        verts, faces = extract_and_clean(vols[i], None)
        if len(faces) == 0:
            continue
        c = verts.mean(0)
        verts = verts - c
        ext = float(np.abs(verts).max()) + 1e-6
        bw = d.box.xmax - d.box.xmin
        bh = d.box.ymax - d.box.ymin
        # depth so the unit object subtends the bbox; larger boxes = nearer
        z = 2.0 * focal / max(float(max(bw, bh)), 1.0)
        cx = (d.box.xmin + d.box.xmax) / 2.0
        cy = (d.box.ymin + d.box.ymax) / 2.0
        pos = np.asarray([(cx - w / 2.0) / focal * z,
                          (cy - h / 2.0) / focal * z, z], np.float32)
        scale = z * max(bw, bh) / (2.0 * focal) / ext
        meshes.append(MeshData(
            name=f"{d.label}_{i}",
            vertices=(verts * scale + pos).astype(np.float32),
            faces=faces))
    if not meshes:
        log.warning("midi: all instances produced empty level sets")
        return None

    os.makedirs(os.path.dirname(out_glb), exist_ok=True)
    save_glb(out_glb, SceneData(meshes=meshes))
    log.info("midi: %d instances → %s", len(meshes), out_glb)
    return out_glb
