"""The nine pipeline phases as library calls (no per-phase subprocesses)."""
