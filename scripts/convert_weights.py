#!/usr/bin/env python3
"""Checkpoint conversion CLI: reference torch checkpoints → orbax.

Usage (in an environment with the downloaded checkpoints):

    python scripts/convert_weights.py sam  /path/sam_vit_h_4b8939.pth out/sam
    python scripts/convert_weights.py vggt /path/vggt_1b.pt          out/vggt
    python scripts/convert_weights.py lpips /path/lpips_alex.pth     out/lpips

The conversion machinery lives in regen3d_tpu/models/weights.py
(`convert_state_dict` + transposition helpers + `verify_tree_shapes`). Each
model family below declares its key-mapping rule table; `--verify` inits the
target architecture at full size and checks every converted tensor's shape
before saving. Rule tables are maintained against the checkpoint releases
the reference pins (SURVEY §2.2); zero-egress CI can't download them, so
conversions are exercised where checkpoints exist (see ROADMAP item 5 for
the per-model parity-test plan).
"""

from __future__ import annotations

import argparse
import sys

from regen3d_tpu.models.weights import (
    convert_state_dict,
    load_torch_file,
    save_checkpoint,
    t2j_conv,
    t2j_convtranspose,
    t2j_linear,
    verify_tree_shapes,
)


def sam_rules():
    """facebook/sam-vit-huge (original SAM release key layout)."""
    r = []
    # image encoder ViT blocks
    r.append((r"image_encoder\.patch_embed\.proj\.weight",
              lambda k, m: ("image_encoder", "patch_embed", "kernel"), t2j_conv))
    r.append((r"image_encoder\.patch_embed\.proj\.bias",
              lambda k, m: ("image_encoder", "patch_embed", "bias"), None))
    r.append((r"image_encoder\.pos_embed",
              lambda k, m: ("image_encoder", "pos_embed"), None))
    r.append((r"image_encoder\.blocks\.(\d+)\.norm1\.(weight|bias)",
              lambda k, m: ("image_encoder", f"block{m.group(1)}", "norm1",
                            "scale" if m.group(2) == "weight" else "bias"), None))
    r.append((r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.weight",
              lambda k, m: ("image_encoder", f"block{m.group(1)}", "attn",
                            "qkv", "kernel"), t2j_linear))
    r.append((r"image_encoder\.blocks\.(\d+)\.attn\.qkv\.bias",
              lambda k, m: ("image_encoder", f"block{m.group(1)}", "attn",
                            "qkv", "bias"), None))
    r.append((r"image_encoder\.blocks\.(\d+)\.attn\.proj\.weight",
              lambda k, m: ("image_encoder", f"block{m.group(1)}", "attn",
                            "proj", "kernel"), t2j_linear))
    r.append((r"image_encoder\.blocks\.(\d+)\.attn\.rel_pos_([hw])",
              lambda k, m: ("image_encoder", f"block{m.group(1)}", "attn",
                            f"rel_pos_{m.group(2)}"), None))
    # ... (norm2/mlp/neck, prompt encoder, mask decoder follow the same
    # pattern; completed alongside checkpoint-in-hand parity tests)
    return r


def vggt_rules():
    """facebook/VGGT-1B — aggregator/camera_head/depth_head key layout."""
    r = []
    r.append((r"aggregator\.patch_embed\.proj\.weight",
              lambda k, m: ("aggregator", "patch", "proj", "kernel"), t2j_conv))
    r.append((r"aggregator\.blocks\.(\d+)\.(frame|global)_attn\.qkv\.weight",
              lambda k, m: ("aggregator", f"block{m.group(1)}",
                            f"{m.group(2)}_attn", "qkv", "kernel"), t2j_linear))
    # ... completed alongside checkpoint-in-hand parity tests
    return r


def lpips_rules():
    """torchvision AlexNet features + LPIPS linear heads."""
    conv_map = {"0": "conv1", "3": "conv2", "6": "conv3", "8": "conv4",
                "10": "conv5"}
    r = []
    for tk, ours in conv_map.items():
        r.append((rf"net\.slice\d*\.?{tk}\.weight|features\.{tk}\.weight",
                  lambda k, m, o=ours: ("alex", o, "kernel"), t2j_conv))
        r.append((rf"net\.slice\d*\.?{tk}\.bias|features\.{tk}\.bias",
                  lambda k, m, o=ours: ("alex", o, "bias"), None))
    for i in range(5):
        r.append((rf"lins?\.{i}\.model\.1\.weight|lin{i}\.model\.1\.weight",
                  lambda k, m, i=i: (f"lin{i}", "kernel"), t2j_conv))
    return r


FAMILIES = {"sam": sam_rules, "vggt": vggt_rules, "lpips": lpips_rules}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family", choices=sorted(FAMILIES))
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--verify", action="store_true",
                    help="init the target architecture and check shapes")
    args = ap.parse_args()

    state = load_torch_file(args.checkpoint)
    print(f"loaded {len(state)} tensors from {args.checkpoint}")
    tree = convert_state_dict(state, FAMILIES[args.family]())

    if args.verify:
        import jax
        import jax.numpy as jnp

        if args.family == "lpips":
            from regen3d_tpu.models.lpips import LPIPS
            ref = LPIPS().init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 64, 64, 3)))
        elif args.family == "sam":
            from regen3d_tpu.models.sam import SAM, SamConfig
            m = SAM(SamConfig())
            ref = m.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 1024, 1024, 3)), jnp.zeros((1, 1, 2)),
                         -jnp.ones((1, 1)), jnp.zeros((1, 2, 2)))
        else:
            from regen3d_tpu.models.vggt import VGGT, VGGTConfig
            m = VGGT(VGGTConfig())
            ref = m.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 1, 518, 518, 3)))
        errors = verify_tree_shapes(tree, ref)
        if errors:
            print(f"{len(errors)} mismatches (first 20):")
            for e in errors[:20]:
                print(" ", e)
            sys.exit(1)

    save_checkpoint(args.out_dir, tree)
    print(f"saved → {args.out_dir}")


if __name__ == "__main__":
    main()
