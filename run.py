#!/usr/bin/env python3
"""Pipeline CLI — same surface as the reference's `run.py -p 1 2 ... 9`.

Single-image → editable 3D indoor scene, all phases in one process on the
TPU (see regen3d_tpu/orchestrator.py).
"""

from regen3d_tpu.orchestrator import main

if __name__ == "__main__":
    main()
