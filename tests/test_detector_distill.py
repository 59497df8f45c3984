"""Detector distillation: trained OpenVocabDetector beats the clustering
fallback and grounds text queries (fourth diverged family with a working
distillation path; reference grounding-dino role: segmentation.py:587-613)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regen3d_tpu.pipeline.detector_distill import (
    COLORS,
    SHAPES,
    VOCAB,
    box_recall,
    distill_config,
    distill_detector,
    load_detector_checkpoint,
    save_detector_checkpoint,
    synth_detection_batch,
)


def _gt_xyxy(boxes, valid, i, size):
    out = []
    for m in range(boxes.shape[1]):
        if valid[i, m]:
            cx, cy, w, h = boxes[i, m]
            out.append([(cx - w / 2) * size, (cy - h / 2) * size,
                        (cx + w / 2) * size, (cy + h / 2) * size])
    return np.asarray(out)


class TestSynthScenes:
    def test_batch_contract(self):
        rng = np.random.default_rng(0)
        imgs, boxes, labels, valid = synth_detection_batch(rng, 6, 128)
        assert imgs.shape == (6, 128, 128, 3)
        assert boxes.shape == (6, 4, 4)
        assert valid.any(axis=1).all()          # every scene has an object
        assert imgs.min() >= 0.0 and imgs.max() <= 1.0
        assert labels[valid].max() < len(VOCAB)
        b = boxes[valid]
        assert (b[:, 2:] > 0.02).all() and (b[:, 2:] < 0.5).all()

    def test_low_overlap(self):
        rng = np.random.default_rng(1)
        _, boxes, _, valid = synth_detection_batch(rng, 8, 128)
        from regen3d_tpu.pipeline.detector_distill import _iou_cxcywh
        for i in range(8):
            vb = boxes[i][valid[i]]
            for a in range(len(vb)):
                for b in range(a + 1, len(vb)):
                    assert _iou_cxcywh(vb[a], vb[b]) < 0.4


@pytest.fixture(scope="module")
def trained():
    cfg = distill_config(128)
    params, model = distill_detector(cfg, steps=250, batch=8, seed=0,
                                     log_every=0)
    return params, model, cfg


class TestDistilled:
    def test_beats_clustering_on_recall(self, trained):
        from regen3d_tpu.pipeline.phase1_segmentation import cluster_proposals

        params, model, cfg = trained
        rng = np.random.default_rng(999)
        s = cfg.image_size
        imgs, boxes, labels, valid = synth_detection_batch(rng, 10, s)
        net_r, cl_r = [], []
        for i in range(10):
            img_u8 = (imgs[i] * 255).astype(np.uint8)
            gt = _gt_xyxy(boxes, valid, i, s)
            dets = model.detect(params, img_u8, VOCAB, threshold=0.2)
            net_r.append(box_recall(dets, gt))
            cl_r.append(box_recall(cluster_proposals(img_u8, seed=0), gt))
        assert np.mean(net_r) > np.mean(cl_r), (np.mean(net_r), np.mean(cl_r))
        assert np.mean(net_r) > 0.6, np.mean(net_r)

    def test_text_grounding(self, trained):
        """Query only the GT phrase: the top detection must land on THAT
        object, not a distractor — the open-vocab mechanism end-to-end."""
        params, model, cfg = trained
        rng = np.random.default_rng(4242)
        s = cfg.image_size
        hits = total = 0
        tries = 0
        while total < 10 and tries < 40:
            tries += 1
            imgs, boxes, labels, valid = synth_detection_batch(rng, 1, s)
            vmask = valid[0]
            if vmask.sum() < 2:
                continue                      # need distractors
            lbls = labels[0][vmask]
            if len(set(lbls.tolist())) < len(lbls):
                continue                      # ambiguous duplicate phrases
            target = 0
            phrase = VOCAB[lbls[target]]
            gt = _gt_xyxy(boxes, valid, 0, s)[target]
            dets = model.detect(params, (imgs[0] * 255).astype(np.uint8),
                                [phrase], threshold=0.05, max_dets=1)
            total += 1
            if dets:
                bb = dets[0].box
                cx = (bb.xmin + bb.xmax) / 2
                cy = (bb.ymin + bb.ymax) / 2
                hits += bool(gt[0] <= cx <= gt[2] and gt[1] <= cy <= gt[3])
        assert total >= 10
        assert hits / total > 0.6, (hits, total)

    def test_checkpoint_and_phase1_wiring(self, trained, tmp_path):
        """save → detector_checkpoint config key → detect_and_segment uses
        the net (no clustering-fallback warning path)."""
        from regen3d_tpu.config import default_config
        from regen3d_tpu.pipeline.phase1_segmentation import detect_and_segment

        params, model, cfg = trained
        ckpt = str(tmp_path / "det_ckpt")
        save_detector_checkpoint(ckpt, params, cfg)
        p2, m2 = load_detector_checkpoint(ckpt)
        assert m2.cfg.image_size == cfg.image_size

        rng = np.random.default_rng(7)
        s = cfg.image_size
        imgs, boxes, labels, valid = synth_detection_batch(rng, 1, s)
        out_root = str(tmp_path / "out")
        c = default_config(out_root, input_image="unused.png",
                           detector_checkpoint=ckpt,
                           labels=list(VOCAB), threshold=0.2)
        dets = detect_and_segment(c, (imgs[0] * 255).astype(np.uint8))
        assert dets
        gt = _gt_xyxy(boxes, valid, 0, s)
        assert box_recall(dets, gt) > 0.0
        # labels come from the vocabulary, not the fallback's 'object'
        assert all(d.label in VOCAB for d in dets)
