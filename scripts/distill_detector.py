"""Distill the open-vocab detector for phase 1 (Grounding-DINO role).

The `detector` conversion family is `diverged` (OWL-style TPU redesign of
grounding-dino); the parity path is distillation (see
pipeline/detector_distill.py). Trains on synthetic attribute-grammar
scenes (colored shapes with compositional text labels) and saves an orbax
checkpoint + config.json that ``detector_checkpoint:`` wires into phase
1's `detect_and_segment`, replacing the clustering fallback.

    python scripts/distill_detector.py --out /path/to/ckpt \
        [--steps 600] [--size 128] [--cpu]

Prints held-out box recall@IoU0.5 vs the clustering fallback; refuses to
save unless the net wins.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-samples", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from regen3d_tpu.pipeline.detector_distill import (
        VOCAB,
        box_recall,
        distill_config,
        distill_detector,
        save_detector_checkpoint,
        synth_detection_batch,
    )
    from regen3d_tpu.pipeline.phase1_segmentation import cluster_proposals

    cfg = distill_config(args.size)
    params, model = distill_detector(cfg, steps=args.steps,
                                     batch=args.batch, lr=args.lr,
                                     seed=args.seed)

    rng = np.random.default_rng(args.seed + 10_000)
    imgs, boxes, labels, valid = synth_detection_batch(
        rng, args.eval_samples, args.size)
    net_r, cluster_r = [], []
    for i in range(args.eval_samples):
        img_u8 = (imgs[i] * 255).astype(np.uint8)
        gt = []
        for m in range(boxes.shape[1]):
            if valid[i, m]:
                cx, cy, w, h = boxes[i, m]
                gt.append([(cx - w / 2) * args.size, (cy - h / 2) * args.size,
                           (cx + w / 2) * args.size, (cy + h / 2) * args.size])
        gt = np.asarray(gt)
        dets = model.detect(params, img_u8, VOCAB, threshold=0.25)
        net_r.append(box_recall(dets, gt))
        cluster_r.append(box_recall(cluster_proposals(img_u8), gt))
    n, c = float(np.mean(net_r)), float(np.mean(cluster_r))
    print(f"held-out box recall@0.5: net {n:.3f} vs clustering {c:.3f}")
    if n <= c:
        print("trained detector does NOT beat the clustering fallback — "
              "not saving", file=sys.stderr)
        raise SystemExit(1)
    save_detector_checkpoint(args.out, params, cfg)
    print(f"saved detector checkpoint → {args.out} "
          f"(wire via detector_checkpoint: {args.out})")


if __name__ == "__main__":
    main()
