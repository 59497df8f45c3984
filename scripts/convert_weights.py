#!/usr/bin/env python3
"""Checkpoint conversion CLI: reference torch checkpoints → orbax.

Usage (in an environment with the downloaded checkpoints):

    python scripts/convert_weights.py sam    /path/sam_vit_h_4b8939.pth out/sam
    python scripts/convert_weights.py vggt   /path/vggt_1b.pt           out/vggt
    python scripts/convert_weights.py dust3r /path/dust3r_512_linear.pth out/d3r
    python scripts/convert_weights.py lpips  /path/lpips_alex.pth       out/lpips
    python scripts/convert_weights.py --selftest          # no checkpoints needed

Rule tables live in regen3d_tpu/models/conversion.py (one per family, each
with a zero-checkpoint self-test proving the table covers our architecture
leaf-for-leaf). ``--verify`` inits the target architecture at FULL size and
checks every converted tensor's shape before saving. A conversion that
leaves more than ``--max-unmapped`` of the checkpoint unmapped refuses to
save (a mostly-empty orbax tree is worse than none)."""

from __future__ import annotations

import argparse
import sys

from regen3d_tpu.models import conversion
from regen3d_tpu.models.weights import (
    convert_state_dict,
    load_torch_file,
    save_checkpoint,
    verify_tree_shapes,
)


def full_init(family: str):
    """Init the FULL-size architecture for shape verification."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    if family == "lpips":
        from regen3d_tpu.models.lpips import LPIPS
        return LPIPS().init(key, jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 64, 64, 3)))
    if family == "sam":
        from regen3d_tpu.models.sam import SAM, SamConfig
        m = SAM(SamConfig())
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), -jnp.ones((1, 1)),
                           jnp.zeros((1, 2, 2))))
    if family == "vggt":
        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        m = VGGT(VGGTConfig())
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, 1, 518, 518, 3))))
    if family == "dust3r":
        from regen3d_tpu.models.dust3r import (AsymmetricCroCo3DStereo,
                                               Dust3rConfig)
        m = AsymmetricCroCo3DStereo(Dust3rConfig())
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, 512, 512, 3)),
                           jnp.zeros((1, 512, 512, 3))))
    if family == "dit":
        from regen3d_tpu.models.dit import DiTConfig, ShapeDiT
        c = DiTConfig.base()
        m = ShapeDiT(c)
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, c.latent_tokens, c.latent_dim)),
                           jnp.zeros((1,)), jnp.zeros((1, 8, c.cond_dim))))
    if family == "shapevae":
        # tiny init shares the structure; full config via env of the caller
        return conversion.FAMILIES["shapevae"].tiny_init()
    if family in ("sd_unet", "marigold"):
        from regen3d_tpu.models.sd_unet import SDUNet, SDUNetConfig
        c = SDUNetConfig.sd_x4()
        m = SDUNet(c)
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, 128, 128, c.in_channels)),
                           jnp.zeros((1,)), jnp.zeros((1, 77,
                                                       c.cross_attn_dim))))
    if family == "sd_vae":
        from regen3d_tpu.models.sd_vae import SDAutoencoderKL, SDVAEConfig
        m = SDAutoencoderKL(SDVAEConfig())
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, 256, 256, 3))))
    if family == "flux":
        from regen3d_tpu.models.flux import FluxConfig, FluxTransformer
        c = FluxConfig()
        m = FluxTransformer(c)
        return jax.eval_shape(
            lambda: m.init(key, jnp.zeros((1, c.latent_tokens,
                                           c.in_channels)),
                           jnp.zeros((1,)), jnp.zeros((1, 512, c.cond_dim))))
    raise SystemExit(f"no full-size init wired for {family}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family", nargs="?", choices=sorted(conversion.FAMILIES))
    ap.add_argument("checkpoint", nargs="?")
    ap.add_argument("out_dir", nargs="?")
    ap.add_argument("--verify", action="store_true",
                    help="init the target architecture and check shapes")
    ap.add_argument("--max-unmapped", type=float, default=0.02,
                    help="refuse to save if more than this fraction of "
                         "checkpoint tensors is unmapped")
    ap.add_argument("--selftest", action="store_true",
                    help="run the zero-checkpoint rule-table round-trips")
    args = ap.parse_args()

    if args.selftest:
        failed = False
        for fam in sorted(conversion.FAMILIES):
            errs = conversion.selftest(fam)
            status = conversion.FAMILIES[fam].status
            print(f"{fam:10s} [{status:11s}]: "
                  f"{'OK' if not errs else errs[:5]}")
            failed |= bool(errs)
        sys.exit(1 if failed else 0)

    if not (args.family and args.checkpoint and args.out_dir):
        ap.error("family, checkpoint and out_dir are required "
                 "(or use --selftest)")

    state = load_torch_file(args.checkpoint)
    print(f"loaded {len(state)} tensors from {args.checkpoint}")
    rules = conversion.FAMILIES[args.family].rules()

    unmapped: list = []
    tree = convert_state_dict(state, rules, unmapped_out=unmapped)
    frac = len(unmapped) / max(len(state), 1)
    if frac > args.max_unmapped:
        print(f"REFUSING to save: {len(unmapped)}/{len(state)} "
              f"({frac:.1%}) of checkpoint tensors unmapped — the rule "
              f"table does not fit this checkpoint (see "
              f"regen3d_tpu/models/conversion.py '{args.family}').")
        sys.exit(1)

    if args.verify:
        ref = full_init(args.family)
        errors = verify_tree_shapes(tree, ref)
        if errors:
            print(f"{len(errors)} mismatches (first 20):")
            for e in errors[:20]:
                print(" ", e)
            sys.exit(1)
        print("shape verification OK")

    save_checkpoint(args.out_dir, tree)
    print(f"saved → {args.out_dir}")


if __name__ == "__main__":
    main()
