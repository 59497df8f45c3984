#!/usr/bin/env python3
"""Record activation fixtures for the conversion parity harness.

The parity loop (models/conversion.py::check_activation_fixture) asserts
our model reproduces recorded activations. Two recording modes:

  * ``--from-ours``: run OUR model (optionally with a converted orbax
    checkpoint) on a deterministic input and record its outputs. This
    pins the current numerics as a regression fixture — any later change
    to the architecture or kernels that shifts outputs beyond atol fails
    tests/fixtures/activations/<family>.npz consumers.

  * ``--from-torch <module:callable>``: in an environment that has the
    upstream torch model, call the given factory, run it on the same
    input, and record ITS outputs — the true cross-implementation parity
    fixture (unusable in this zero-egress image; documented for the
    checkpoint-bearing environment).

Usage:
    python scripts/record_activations.py esrgan out.npz --from-ours
    python scripts/record_activations.py esrgan out.npz --from-ours \\
        --checkpoint /ckpts/esrgan_orbax
    python scripts/record_activations.py esrgan out.npz \\
        --from-torch basicsr.archs.rrdbnet_arch:RRDBNet --torch-ckpt x.pth
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _deterministic_input(shape):
    rng = np.random.default_rng(20260817)
    return rng.random(shape).astype(np.float32)


def _build_ours(family: str, checkpoint: str | None):
    """(apply_fn(**inputs)->dict, inputs dict) for a family's model.

    Without ``checkpoint`` each family runs its TINY config at PRNGKey(0)
    (JAX threefry — deterministic across platforms), so the recorded
    fixture pins today's numerics against kernel/arch drift. With a
    converted checkpoint the FULL config loads and the fixture becomes a
    cross-implementation parity anchor."""
    import jax
    import jax.numpy as jnp

    from regen3d_tpu.models import conversion

    key = jax.random.PRNGKey(0)

    def det(shape):
        return _deterministic_input(shape)

    if family == "esrgan":
        from regen3d_tpu.models.esrgan import ESRGANConfig, RRDBNet
        cfg = ESRGANConfig.x4plus() if checkpoint else ESRGANConfig.tiny()
        model = RRDBNet(cfg)
        inputs = {"x": det((1, 16, 16, 3))}
        init_args = (jnp.asarray(inputs["x"]),)
        apply = lambda params, x: {"y": model.apply(params, jnp.asarray(x))}
    elif family == "depth_anything":
        from regen3d_tpu.models.depth_anything import (
            DepthAnything,
            DepthAnythingConfig,
        )
        cfg = (DepthAnythingConfig.small() if checkpoint
               else DepthAnythingConfig.tiny())
        model = DepthAnything(cfg)
        inputs = {"x": det((1, cfg.image_size, cfg.image_size, 3))}
        init_args = (jnp.asarray(inputs["x"]),)
        apply = lambda params, x: {"y": model.apply(params, jnp.asarray(x))}
    elif family == "lpips":
        from regen3d_tpu.models.lpips import LPIPS
        model = LPIPS()
        inputs = {"x": det((1, 32, 32, 3)), "x2": det((1, 32, 32, 3))}
        init_args = (jnp.asarray(inputs["x"]), jnp.asarray(inputs["x2"]))
        apply = lambda params, x, x2: {
            "y": model.apply(params, jnp.asarray(x), jnp.asarray(x2))}
    elif family == "sam":
        from regen3d_tpu.models.sam import SAM, SamConfig
        cfg = SamConfig() if checkpoint else SamConfig.tiny()
        model = SAM(cfg)
        inputs = {
            "img": det((1, cfg.image_size, cfg.image_size, 3)),
            "points": det((1, 2, 2)),
            "labels": np.ones((1, 2), np.float32),
            "boxes": np.asarray([[[0.1, 0.1], [0.8, 0.9]]], np.float32),
        }
        init_args = tuple(jnp.asarray(inputs[k])
                          for k in ("img", "points", "labels", "boxes"))
        def apply(params, img, points, labels, boxes):
            masks, iou = model.apply(params, jnp.asarray(img),
                                     jnp.asarray(points),
                                     jnp.asarray(labels),
                                     jnp.asarray(boxes))
            return {"masks": masks, "iou": iou}
    elif family == "vggt":
        from regen3d_tpu.models.vggt import VGGT, VGGTConfig
        cfg = VGGTConfig() if checkpoint else VGGTConfig.tiny()
        model = VGGT(cfg)
        inputs = {"images": det((1, 2, cfg.image_size, cfg.image_size, 3))}
        init_args = (jnp.asarray(inputs["images"]),)
        def apply(params, images):
            out = model.apply(params, jnp.asarray(images))
            return {"pose_enc": out["pose_enc"], "depth": out["depth"],
                    "depth_conf": out["depth_conf"]}
    elif family == "dust3r":
        from regen3d_tpu.models.dust3r import (AsymmetricCroCo3DStereo,
                                               Dust3rConfig)
        cfg = Dust3rConfig() if checkpoint else Dust3rConfig.tiny()
        model = AsymmetricCroCo3DStereo(cfg)
        s = 512 if checkpoint else 4 * cfg.patch
        inputs = {"img1": det((1, s, s, 3)), "img2": det((1, s, s, 3))}
        init_args = (jnp.asarray(inputs["img1"]), jnp.asarray(inputs["img2"]))
        def apply(params, img1, img2):
            out = model.apply(params, jnp.asarray(img1), jnp.asarray(img2))
            return {"pts1": out["pts3d1"], "pts2": out["pts3d2"],
                    "conf1": out["conf1"], "conf2": out["conf2"]}
    elif family in ("dit", "midi"):
        import dataclasses as _dc

        from regen3d_tpu.models.dit import DiTConfig, ShapeDiT
        cfg = DiTConfig.base() if checkpoint else DiTConfig.tiny()
        if family == "midi":
            cfg = _dc.replace(cfg, cross_instance=True)
        model = ShapeDiT(cfg)
        inputs = {"x": det((1, cfg.latent_tokens, cfg.latent_dim)),
                  "t": np.asarray([0.5], np.float32),
                  "cond": det((1, 8, cfg.cond_dim))}
        init_args = tuple(jnp.asarray(inputs[k]) for k in ("x", "t", "cond"))
        apply = lambda params, x, t, cond: {
            "v": model.apply(params, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(cond))}
    elif family == "shapevae":
        from regen3d_tpu.models.shapevae import ShapeDecoder, ShapeVAEConfig
        cfg = (ShapeVAEConfig() if checkpoint else ShapeVAEConfig.tiny())
        model = ShapeDecoder(cfg)
        inputs = {"latents": det((1, cfg.latent_tokens, cfg.latent_dim)),
                  "points": det((1, 64, 3)) * 2.0 - 1.0}
        init_args = (jnp.asarray(inputs["latents"]),
                     jnp.asarray(inputs["points"]))
        apply = lambda params, latents, points: {
            "sdf": model.apply(params, jnp.asarray(latents),
                               jnp.asarray(points))}
    elif family in ("sd_unet", "marigold"):
        from regen3d_tpu.models.sd_unet import SDUNet, SDUNetConfig
        cfg = SDUNetConfig.sd_x4() if checkpoint else SDUNetConfig.tiny()
        model = SDUNet(cfg)
        inputs = {"x": det((1, 16, 16, cfg.in_channels)),
                  "t": np.asarray([10.0], np.float32),
                  "cond": det((1, 8, cfg.cross_attn_dim))}
        init_args = tuple(jnp.asarray(inputs[k]) for k in ("x", "t", "cond"))
        apply = lambda params, x, t, cond: {
            "eps": model.apply(params, jnp.asarray(x), jnp.asarray(t),
                               jnp.asarray(cond))}
    elif family == "sd_vae":
        from regen3d_tpu.models.sd_vae import SDAutoencoderKL, SDVAEConfig
        cfg = SDVAEConfig() if checkpoint else SDVAEConfig.tiny()
        model = SDAutoencoderKL(cfg)
        inputs = {"x": det((1, 32, 32, 3))}
        init_args = (jnp.asarray(inputs["x"]),)
        def apply(params, x):
            recon, mean, logvar = model.apply(params, jnp.asarray(x))
            return {"recon": recon, "mean": mean, "logvar": logvar}
    elif family == "flux":
        from regen3d_tpu.models.flux import FluxConfig, FluxTransformer
        cfg = FluxConfig.tiny()
        model = FluxTransformer(cfg)
        s = cfg.latent_tokens
        inputs = {"x": det((1, s, cfg.in_channels)),
                  "t": np.asarray([0.5], np.float32),
                  "cond": det((1, 8, cfg.cond_dim))}
        init_args = tuple(jnp.asarray(inputs[k]) for k in ("x", "t", "cond"))
        apply = lambda params, x, t, cond: {
            "v": model.apply(params, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(cond))}
    else:
        raise SystemExit(
            f"--from-ours recording not wired for '{family}' "
            f"(registry has {sorted(conversion.FAMILIES)})")

    if checkpoint:
        from regen3d_tpu.models.weights import load_checkpoint
        params = load_checkpoint(checkpoint)
    else:
        params = model.init(key, *init_args)

    import functools
    return functools.partial(apply, params), inputs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("family")
    ap.add_argument("out")
    ap.add_argument("--from-ours", action="store_true")
    ap.add_argument("--from-torch", metavar="MODULE:CALLABLE")
    ap.add_argument("--checkpoint", help="orbax checkpoint (ours)")
    ap.add_argument("--torch-ckpt", help="torch checkpoint (upstream)")
    ap.add_argument("--verify", action="store_true",
                    help="immediately re-check the written fixture")
    args = ap.parse_args()

    if args.from_torch:
        mod, _, name = args.from_torch.partition(":")
        import importlib

        import torch
        factory = getattr(importlib.import_module(mod), name)
        net = factory()
        if args.torch_ckpt:
            from regen3d_tpu.models.weights import load_torch_file
            sd = load_torch_file(args.torch_ckpt)
            net.load_state_dict({k: torch.as_tensor(v)
                                 for k, v in sd.items()})
        net.eval()
        x = _deterministic_input((1, 16, 16, 3))
        with torch.no_grad():
            y = net(torch.as_tensor(x).permute(0, 3, 1, 2))
        y = y.permute(0, 2, 3, 1).numpy()
        np.savez(args.out, input_x=x, expected_y=y)
        print(f"recorded upstream fixture → {args.out}")
        return

    if not args.from_ours:
        sys.exit("choose --from-ours or --from-torch")
    apply_fn, inputs = _build_ours(args.family, args.checkpoint)
    out = apply_fn(**inputs)
    np.savez(args.out,
             **{f"input_{k}": np.asarray(v) for k, v in inputs.items()},
             **{f"expected_{k}": np.asarray(v) for k, v in out.items()})
    print(f"recorded {args.family} fixture → {args.out} "
          f"({'converted checkpoint' if args.checkpoint else 'random init'})")

    if args.verify:
        from regen3d_tpu.models.conversion import check_activation_fixture
        check_activation_fixture(args.family, args.out, apply_fn)
        print("verify OK: fixture reproduces")


if __name__ == "__main__":
    main()
