"""Distill a MattingUNet for phase-2 background removal.

The rembg U²-Net (reference: inpaint_nanoBanana.py:157-189) is a
`diverged` conversion family — no key mapping exists onto MattingUNet, so
the parity path is distillation (models/conversion.py docstring). This
trains on synthetic alpha compositing (the zero-egress teacher stand-in;
see pipeline/matting.py) and saves an orbax checkpoint that
`matting_checkpoint:` wires into phase 2.

    python scripts/distill_matting.py --out /path/to/ckpt \
        [--steps 600] [--size 128] [--base 32] [--cpu]

Prints held-out IoU of the trained net vs the threshold fallback; refuses
to save if the net does not beat the threshold.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="checkpoint dir (orbax)")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--base", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-samples", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from regen3d_tpu.pipeline.matting import (
        MattingModel,
        distill_matting,
        iou,
        synth_matting_batch,
        threshold_alpha,
    )

    params, _model = distill_matting(
        steps=args.steps, batch=args.batch, size=args.size, base=args.base,
        lr=args.lr, seed=args.seed)
    m = MattingModel(params, base=args.base, eval_size=args.size)

    rng = np.random.default_rng(args.seed + 10_000)   # held-out stream
    imgs, alphas = synth_matting_batch(rng, args.eval_samples, args.size)
    net_iou = float(np.mean([iou(m.alpha(im), a[..., 0])
                             for im, a in zip(imgs, alphas)]))
    thr_iou = float(np.mean([iou(threshold_alpha(im)[..., 0], a[..., 0])
                             for im, a in zip(imgs, alphas)]))
    print(f"held-out IoU: net {net_iou:.4f} vs threshold {thr_iou:.4f}")
    if net_iou <= thr_iou:
        print("trained net does NOT beat the threshold fallback — "
              "not saving", file=sys.stderr)
        raise SystemExit(1)
    m.save(args.out)
    print(f"saved matting checkpoint → {args.out} "
          f"(wire via matting_checkpoint: {args.out})")


if __name__ == "__main__":
    main()
