"""Per-component MFU profile of the big encoders (VERDICT r4 item 5).

Times each sub-module of the SAM ViT-H encoder and the VGGT-1B forward as
its own K-chained XLA program (the zoo methodology: lax.fori_loop amortizes
the ~35 ms tunnel dispatch tax) and reports ms + FLOPs + MFU per component,
so the gap between whole-model MFU and the 0.30 bar is attributable to a
specific block instead of guessed at.

Usage:  python scripts/profile_mfu.py [sam|vggt] [--k 8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v5": 229.5e12,
    "TPU v5p": 229.5e12, "TPU v6 lite": 459e12, "TPU v6e": 459e12,
}


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def _flops_of(fn, *args) -> float:
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(d.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_component(name, fn, args, k, peak, repeats=3, floor_s=0.0):
    """Time K chained applications of fn(*args) -> same-shaped output."""

    def chain(*a):
        x = a[-1]

        def body(i, x):
            return fn(*a[:-1], x)

        return jax.lax.fori_loop(0, k, body, x)

    cf = jax.jit(chain)
    _sync(cf(*args))
    flops = _flops_of(fn, *args)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        _sync(cf(*args))
        ts.append(max(time.time() - t0 - floor_s, 1e-9) / k)
    med = float(np.median(ts))
    mfu = flops / med / peak if peak and flops else 0.0
    print(f"{name:34s} {med * 1e3:9.2f} ms  {flops / 1e9:9.1f} GF  "
          f"MFU {mfu:.3f}")
    return med, flops


def _dispatch_floor(n=6):
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    np.asarray(f(x))
    ts = []
    for _ in range(n):
        t0 = time.time()
        np.asarray(f(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def profile_sam(k, peak, floor):
    from regen3d_tpu.models.sam import SamBlock, SamConfig, SamImageEncoder

    cfg = SamConfig()   # ViT-H
    enc = SamImageEncoder(cfg)
    img = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), img)

    x = jnp.zeros((1, cfg.grid, cfg.grid, cfg.width), cfg.dtype)

    wblk = SamBlock(cfg, is_global=False)
    wp = jax.jit(wblk.init)(jax.random.PRNGKey(1), x)
    t_w, f_w = bench_component(
        f"windowed block (14^2, x{cfg.depth - len(cfg.global_blocks)})",
        wblk.apply, (wp, x), k, peak, floor_s=floor)

    gblk = SamBlock(cfg, is_global=True)
    gp = jax.jit(gblk.init)(jax.random.PRNGKey(2), x)
    t_g, f_g = bench_component(
        f"global block (64^2 flash, x{len(cfg.global_blocks)})",
        gblk.apply, (gp, x), k, peak, floor_s=floor)

    t_all, f_all = bench_component("FULL encoder", enc.apply, (params, img),
                                   max(k // 2, 2), peak, floor_s=floor)
    n_w = cfg.depth - len(cfg.global_blocks)
    n_g = len(cfg.global_blocks)
    resid = t_all - n_w * t_w - n_g * t_g
    print(f"{'blocks modeled':34s} {1e3 * (n_w * t_w + n_g * t_g):9.2f} ms "
          f"(windowed {1e3 * n_w * t_w:.1f} + global {1e3 * n_g * t_g:.1f})")
    print(f"{'residual (patch+neck+layout)':34s} {1e3 * resid:9.2f} ms")


def profile_vggt(k, peak, floor):
    from regen3d_tpu.models.vggt import VGGT, VGGTConfig

    cfg = VGGTConfig()
    model = VGGT(cfg)
    imgs = jnp.zeros((1, 2, 518, 518, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs)

    t_all, f_all = bench_component("FULL VGGT fwd", model.apply,
                                   (params, imgs), k, peak, floor_s=floor)

    # backbone alone (DINOv2 trunk)
    def backbone(p, im):
        return model.apply(p, im, method=getattr(model, "encode", None)) \
            if hasattr(model, "encode") else model.apply(p, im)

    try:
        t_b, f_b = bench_component("backbone (encode)", backbone,
                                   (params, imgs), k, peak, floor_s=floor)
        print(f"{'heads residual':34s} {1e3 * (t_all - t_b):9.2f} ms")
    except Exception as e:  # noqa: BLE001
        print(f"backbone split unavailable: {e}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "sam"
    k = int(sys.argv[sys.argv.index("--k") + 1]) if "--k" in sys.argv else 8
    kind = jax.devices()[0].device_kind
    peak = PEAK.get(kind, 0.0)
    floor = _dispatch_floor()
    print(f"device {kind}, peak {peak / 1e12:.0f} TF/s, "
          f"dispatch floor {floor * 1e3:.1f} ms")
    if which == "sam":
        profile_sam(k, peak, floor)
    else:
        profile_vggt(k, peak, floor)


if __name__ == "__main__":
    main()
