"""Distill a DepthAnything monocular depth net for the depth artifact.

The reference's depth_from_image (global_utils.py:357-418) runs Marigold
or Depth-Anything-V2; with no checkpoints every real run here fell back
to a luminance prior. This trains the DepthAnything architecture on
synthetic rooms rendered by the repo's own z-buffer (exact depth GT; see
pipeline/depth_distill.py) and saves an orbax checkpoint + config.json
that ``depth_anything_checkpoint:`` wires into the pipeline.

    python scripts/distill_depth.py --out /path/to/ckpt \
        [--steps 400] [--size 112] [--cpu]

Prints held-out scale/shift-invariant RMSE vs the luminance prior;
refuses to save unless the net wins.
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
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=112,
                    help="train/eval resolution (multiple of 14)")
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

    from regen3d_tpu.pipeline.depth_distill import (
        distill_depth,
        luminance_prior,
        micro_config,
        save_depth_checkpoint,
        ssi_rmse,
        synth_depth_batch,
    )

    cfg = micro_config(args.size)
    params, model = distill_depth(cfg, steps=args.steps, batch=args.batch,
                                  lr=args.lr, seed=args.seed)

    rng = np.random.default_rng(args.seed + 10_000)
    imgs, disps = synth_depth_batch(rng, args.eval_samples, args.size)
    apply = jax.jit(model.apply)
    net, prior = [], []
    for im, gt in zip(imgs, disps):
        pred = np.asarray(apply(params, jnp.asarray(im[None])),
                          np.float32)[0]
        net.append(ssi_rmse(pred, gt))
        prior.append(ssi_rmse(luminance_prior(im), gt))
    net_rmse, prior_rmse = float(np.mean(net)), float(np.mean(prior))
    print(f"held-out SSI-RMSE: net {net_rmse:.4f} vs "
          f"luminance prior {prior_rmse:.4f}")
    if net_rmse >= prior_rmse:
        print("trained net does NOT beat the luminance prior — not saving",
              file=sys.stderr)
        raise SystemExit(1)
    save_depth_checkpoint(args.out, params, cfg)
    print(f"saved depth checkpoint → {args.out} "
          f"(wire via depth_anything_checkpoint: {args.out})")


if __name__ == "__main__":
    main()
