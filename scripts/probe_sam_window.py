"""Measure SAM ViT-H encode with the windowed blocks on the XLA einsum
path vs the fused grid-bias flash kernel (SamConfig.flash_min_tokens —
VERDICT r4 item 5: the 28/32 windowed blocks hold SAM at MFU 0.229).

Run on the real TPU:  python scripts/probe_sam_window.py
Prints ms/forward + MFU for flash_min_tokens in {1024 (windows on XLA),
196 (windows on the kernel)} and the per-block-type timing split obtained
by differencing depth-limited encoders.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from regen3d_tpu.jaxcache import enable_compilation_cache
    from regen3d_tpu.models.sam import SamConfig, SamImageEncoder

    enable_compilation_cache()
    img = jnp.zeros((1, 1024, 1024, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    peak = 197e12

    def floor_s(n=8):
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        np.asarray(f(x))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    FLOOR = floor_s()
    print(f"dispatch floor {FLOOR * 1e3:.1f} ms", flush=True)
    K = 6
    params = None

    def bench(cfg, tag):
        nonlocal params
        enc = SamImageEncoder(cfg)
        if params is None:
            params = jax.jit(enc.init)(key, img)

        def chain(p, s):
            def body(i, s):
                out = enc.apply(p, img + s)
                return out.mean().astype(s.dtype)
            return jax.lax.fori_loop(0, K, body, s)

        compiled = jax.jit(chain).lower(params, jnp.zeros(())).compile()
        ca = compiled.cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(d.get("flops", 0.0))   # loop body counted ONCE
        np.asarray(compiled(params, jnp.zeros(())))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(compiled(params, jnp.zeros(())))
            ts.append(max(time.perf_counter() - t0 - FLOOR, 1e-9) / K)
        med = float(np.median(ts))
        print(f"{tag}: {med * 1e3:.1f} ms/fwd, {flops / 1e12:.2f} TF, "
              f"MFU {flops / med / peak:.3f}", flush=True)
        return med

    base = SamConfig()
    t_xla = bench(base, "windows on XLA einsum (flash_min_tokens=1024)")
    t_krn = bench(dataclasses.replace(base, flash_min_tokens=196),
                  "windows on grid-bias kernel (flash_min_tokens=196)")
    print(f"kernel/xla ratio: {t_krn / t_xla:.3f}", flush=True)

    # per-block split: difference depth-limited encoders (all-window vs
    # one-global prefix) — 4 windowed + 4 windowed+1 global
    for fmt, tag in ((1024, "xla"), (196, "kernel")):
        c8w = dataclasses.replace(base, depth=8, global_blocks=(),
                                  flash_min_tokens=fmt)
        c8g = dataclasses.replace(base, depth=8, global_blocks=(7,),
                                  flash_min_tokens=fmt)
        tw = bench(c8w, f"depth-8 all-windowed [{tag}]")
        tg = bench(c8g, f"depth-8 7-windowed+1-global [{tag}]")
        per_win = tw / 8.0
        per_glob = tg - 7.0 * per_win
        print(f"[{tag}] per-block: windowed {per_win * 1e3:.2f} ms, "
              f"global {per_glob * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
