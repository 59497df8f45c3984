"""Persistent XLA compilation cache (VERDICT r4 missing #1).

Remote compiles through the axon tunnel are minutes long (a trivial 512²
grad program measured 946.8 s compile+run in a fresh process) and the
tunnel's watchdog makes any program whose first compile is that long a
coin-flip. JAX's persistent compilation cache works through the tunnel —
the same program in a second process measured 23.4 s — so every entry
point (bench.py, __graft_entry__.py, run.py, the package itself) enables
it before the first compile.

The cache directory lives inside the repo (``.jax_cache/``, gitignored)
so the driver's ``python bench.py`` run hits the warm cache left by the
builder's pre-warm pass on the same machine.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX at the repo-local persistent compile cache.

    Safe to call any time before (or after) the first compile; guarded so
    an older jax without these config names degrades to a no-op.
    """
    global _ENABLED
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    if _ENABLED:
        return cache_dir
    try:
        import jax

        # CPU is excluded: CPU compiles are fast, and XLA:CPU AOT cache
        # entries carry tuned machine-feature lists that re-load with
        # "could lead to SIGILL" warnings — not worth it for the tests'
        # virtual-device runs. The tunnel (axon/TPU) is the whole point.
        platforms = (jax.config.jax_platforms
                     or os.environ.get("JAX_PLATFORMS") or "")
        primary = platforms.split(",")[0].strip().lower()
        if primary == "cpu":
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took ≥1 s to compile, regardless of size:
        # through the tunnel even small programs pay a large compile tax
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
        return cache_dir
    except Exception:  # noqa: BLE001 — never let cache setup break an entry
        return None


def disable_compilation_cache() -> None:
    """Turn the persistent cache back off (e.g. before a forced-CPU
    section like dryrun_multichip's virtual mesh)."""
    global _ENABLED
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
        _ENABLED = False
    except Exception:  # noqa: BLE001
        pass
