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
    """(apply_fn(input)->dict, input_array) for a family's tiny/full model."""
    import jax
    import jax.numpy as jnp

    from regen3d_tpu.models import conversion

    if family == "esrgan":
        from regen3d_tpu.models.esrgan import ESRGANConfig, RRDBNet
        cfg = ESRGANConfig.x4plus() if checkpoint else ESRGANConfig.tiny()
        model = RRDBNet(cfg)
        x = _deterministic_input((1, 16, 16, 3))
    elif family == "depth_anything":
        from regen3d_tpu.models.depth_anything import (
            DepthAnything,
            DepthAnythingConfig,
        )
        cfg = (DepthAnythingConfig.small() if checkpoint
               else DepthAnythingConfig.tiny())
        model = DepthAnything(cfg)
        x = _deterministic_input((1, cfg.image_size, cfg.image_size, 3))
    elif family == "lpips":
        from regen3d_tpu.models.lpips import LPIPS
        model = LPIPS()
        x = _deterministic_input((1, 32, 32, 3))
    else:
        # generic path: tiny_init + a family-shaped input is not derivable
        # automatically; extend the table above per family as needed
        raise SystemExit(
            f"--from-ours recording not wired for '{family}' yet "
            f"(known: esrgan, depth_anything, lpips; registry has "
            f"{sorted(conversion.FAMILIES)})")

    if checkpoint:
        from regen3d_tpu.models.weights import load_checkpoint
        params = load_checkpoint(checkpoint)
    elif family == "lpips":
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(x))
    else:
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    if family == "lpips":
        def apply_fn(x):
            return {"y": model.apply(params, jnp.asarray(x),
                                     jnp.asarray(x))}
    else:
        def apply_fn(x):
            return {"y": model.apply(params, jnp.asarray(x))}
    return apply_fn, x


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
    apply_fn, x = _build_ours(args.family, args.checkpoint)
    out = apply_fn(x)
    np.savez(args.out, input_x=x,
             **{f"expected_{k}": np.asarray(v) for k, v in out.items()})
    print(f"recorded {args.family} fixture → {args.out} "
          f"({'converted checkpoint' if args.checkpoint else 'random init'})")

    if args.verify:
        from regen3d_tpu.models.conversion import check_activation_fixture
        check_activation_fixture(args.family, args.out, apply_fn)
        print("verify OK: fixture reproduces")


if __name__ == "__main__":
    main()
