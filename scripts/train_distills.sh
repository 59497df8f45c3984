#!/bin/bash
# Train all four diverged-family distillations on the TPU and commit the
# checkpoints (VERDICT r4 item 6 precondition: "with all distilled
# checkpoints"). Each script refuses to save unless the net beats its
# weightless fallback on held-out synthetic data.
set -x
cd "$(dirname "$0")/.."
python scripts/distill_detector.py --out checkpoints/detector_distilled "$@" 2>&1 | tail -3
python scripts/distill_matting.py  --out checkpoints/matting_distilled  "$@" 2>&1 | tail -3
python scripts/distill_saliency.py --out checkpoints/saliency_distilled "$@" 2>&1 | tail -3
python scripts/distill_depth.py    --out checkpoints/depth_distilled    "$@" 2>&1 | tail -3
ls -la checkpoints/
