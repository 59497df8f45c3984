"""Distill the flagship shape generator on synthetic parametric furniture.

The reference's phase 3 loads the Hunyuan3D-2 flow-matching checkpoint
(src/2d_to_3d_models/run.py:67-76); with zero egress every real run here
generated geometry from random weights. This trains the full serving
stack (CondEncoder -> ShapeDiT rectified flow -> ShapeDecoder SDF) on
procedural furniture with analytic SDFs (pipeline/shape_distill.py) and
saves a single .npz the pipeline picks up automatically
(checkpoints/shape_distilled.npz, or the `shape_checkpoint` config key).

    python scripts/distill_shape.py --out checkpoints/shape_distilled.npz \
        [--preset small] [--shapes 2048] [--vae-steps 3000] \
        [--flow-steps 5000] [--batch 32] [--cpu]

Prints held-out Chamfer (generated mesh vs analytic GT surface) for the
trained generator AND a random-init baseline; refuses to save unless the
trained one wins, and requires the shuffled-condition Chamfer to exceed
the matched one (proof the image conditioning carries signal).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/shape_distilled.npz")
    ap.add_argument("--preset", choices=["small", "micro"], default="small")
    ap.add_argument("--shapes", type=int, default=2048)
    ap.add_argument("--vae-steps", type=int, default=3000)
    ap.add_argument("--flow-steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seg", type=int, default=25,
                    help="train steps per XLA program (tunnel-safe)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-shapes", type=int, default=16)
    ap.add_argument("--eval-steps", type=int, default=25)
    ap.add_argument("--eval-resolution", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="save even if the eval gates fail")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from regen3d_tpu.pipeline.phase3_assets import AssetGenerator
    from regen3d_tpu.pipeline.shape_distill import (
        DistillConfig,
        distill_shape,
        eval_generator,
        save_generator,
    )

    cfg = (DistillConfig.small() if args.preset == "small"
           else DistillConfig.micro())
    t0 = time.time()
    gen, report = distill_shape(
        cfg, n_shapes=args.shapes, vae_steps=args.vae_steps,
        flow_steps=args.flow_steps, batch=args.batch, lr=args.lr,
        seed=args.seed, seg=args.seg)
    report["train_wall_s"] = round(time.time() - t0, 1)

    rng = np.random.default_rng(args.seed + 10_000)
    ev = eval_generator(gen, rng, n_shapes=args.eval_shapes,
                        num_steps=args.eval_steps,
                        resolution=args.eval_resolution)
    baseline = AssetGenerator.random_init(
        jax.random.PRNGKey(args.seed), tiny=(args.preset == "micro"))
    rng_b = np.random.default_rng(args.seed + 10_000)
    ev_base = eval_generator(baseline, rng_b, n_shapes=args.eval_shapes,
                             num_steps=args.eval_steps,
                             resolution=args.eval_resolution,
                             image_size=cfg.image_size)
    report.update({f"trained_{k}": round(v, 4) for k, v in ev.items()})
    report.update({f"random_{k}": round(v, 4) for k, v in ev_base.items()})
    print(json.dumps(report, indent=2))

    wins = ev["chamfer"] < ev_base["chamfer"] - 0.02
    conditions = ev["chamfer"] < ev["chamfer_shuffled"] - 1e-3
    if not wins:
        print(f"REFUSING to save: trained chamfer {ev['chamfer']:.4f} does "
              f"not beat random-init {ev_base['chamfer']:.4f}")
    if not conditions:
        print(f"WARNING: shuffled-condition chamfer "
              f"{ev['chamfer_shuffled']:.4f} <= matched {ev['chamfer']:.4f} "
              "— conditioning carries no signal")
    if (wins and conditions) or args.force:
        save_generator(args.out, cfg, gen.params)
        sz = os.path.getsize(args.out) / 1e6
        print(f"saved {args.out} ({sz:.1f} MB)")
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
