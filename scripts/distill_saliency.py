"""Distill the VST-role saliency net for the phase-1 point strategy.

The `saliency` conversion family is `diverged` (T2T redesign of VST); the
parity path is distillation (see pipeline/saliency_distill.py). Trains on
synthetic salient-object scenes and saves an orbax checkpoint +
config.json that ``saliency_checkpoint:`` wires into phase 1's
`generate_points` (point_method: saliency).

    python scripts/distill_saliency.py --out /path/to/ckpt \
        [--steps 300] [--size 96] [--cpu]

Prints held-out MAE vs the center-prior baseline; refuses to save unless
the net wins.
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
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-samples", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from regen3d_tpu.pipeline.saliency_distill import (
        center_prior,
        distill_saliency,
        mae,
        save_saliency_checkpoint,
        small_config,
        synth_saliency_batch,
    )

    cfg = small_config(args.size)
    params, model = distill_saliency(cfg, steps=args.steps,
                                     batch=args.batch, lr=args.lr,
                                     seed=args.seed)

    rng = np.random.default_rng(args.seed + 10_000)
    imgs, gts = synth_saliency_batch(rng, args.eval_samples, args.size)
    apply = jax.jit(model.apply)
    prior = center_prior(args.size)
    net_mae, prior_mae = [], []
    for im, gt in zip(imgs, gts):
        pred = np.asarray(apply(params, jnp.asarray(im[None])),
                          np.float32)[0]
        net_mae.append(mae(pred, gt))
        prior_mae.append(mae(prior, gt))
    n, p = float(np.mean(net_mae)), float(np.mean(prior_mae))
    print(f"held-out MAE: net {n:.4f} vs center prior {p:.4f}")
    if n >= p:
        print("trained net does NOT beat the center prior — not saving",
              file=sys.stderr)
        raise SystemExit(1)
    save_saliency_checkpoint(args.out, params, cfg)
    print(f"saved saliency checkpoint → {args.out} "
          f"(wire via saliency_checkpoint: {args.out})")


if __name__ == "__main__":
    main()
