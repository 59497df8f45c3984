"""Phase orchestrator: the reference's `run.py -p 1..9` CLI, in-process.

The reference launches each phase as a subprocess in its own venv with
CUDA_VISIBLE_DEVICES pinning (run.py:61-122). Here all phases are library
calls inside ONE process sharing one jit cache and one device mesh —
subprocesses remain only for Blender (phase 8, when a binary exists).

Same CLI surface: ``-p/--phases``, ``-ex/--exclude``, ``--config``; same
phase numbering; per-phase wall-clock timing (run.py:199,486-500) plus
optional ``jax.profiler`` traces per phase.
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import Callable, Dict, List, Optional

from regen3d_tpu.config import Config, load_config

log = logging.getLogger(__name__)


def _phase1(cfg: Config):
    from regen3d_tpu.pipeline import phase1_segmentation
    return phase1_segmentation.run(cfg)


def _phase2(cfg: Config):
    from regen3d_tpu.pipeline import phase2_inpaint
    return phase2_inpaint.run(cfg)


def _phase3(cfg: Config):
    from regen3d_tpu.pipeline import phase3_assets
    return phase3_assets.run(cfg)


def _phase4(cfg: Config):
    if not bool(cfg.get("Use_VGGT", True)):
        # the reference's dust3r variant (run.py:422-433): pairwise stereo
        # + global alignment instead of VGGT
        from regen3d_tpu.pipeline import phase4_dust3r
        return phase4_dust3r.run(cfg)
    from regen3d_tpu.pipeline import phase4_camera
    return phase4_camera.run(cfg)


def _phase5(cfg: Config):
    from regen3d_tpu.pipeline import phase5_extract
    return phase5_extract.run(cfg)


def _phase6(cfg: Config):
    from regen3d_tpu.pipeline import phase6_pose
    return phase6_pose.run(cfg)


def _phase7(cfg: Config):
    from regen3d_tpu.pipeline import phase7_assemble
    return phase7_assemble.run(cfg)


def _phase8(cfg: Config):
    from regen3d_tpu.pipeline import phase8_render
    return phase8_render.run(cfg)


def _phase9(cfg: Config):
    from regen3d_tpu.pipeline import phase9_eval
    return phase9_eval.run(cfg)


def _phase10(cfg: Config):
    from regen3d_tpu.pipeline import baseline_midi
    baseline_midi.run(cfg)


def _phase11(cfg: Config):
    from regen3d_tpu.pipeline import baseline_dpa
    baseline_dpa.run(cfg)


PHASES: Dict[int, tuple] = {
    1: ("segmentation (detector + SAM → findings)", _phase1),
    2: ("generative inpainting (amodal + empty room)", _phase2),
    3: ("image → 3D assets (flow-matching DiT)", _phase3),
    4: ("camera + point cloud (VGGT)", _phase4),
    5: ("per-object cloud extraction", _phase5),
    6: ("differentiable-rendering pose fit", _phase6),
    7: ("scene assembly + background mesh + ICP", _phase7),
    8: ("rendering", _phase8),
    9: ("evaluation", _phase9),
    10: ("MIDI-3D comparison baseline", _phase10),
    11: ("DeepPriorAssembly comparison baseline", _phase11),
}


def run_phases(cfg: Config, phases: List[int],
               exclude: Optional[List[int]] = None,
               profile_dir: Optional[str] = None,
               stop_on_error: bool = True) -> Dict[int, float]:
    """Run the selected phases in order; returns {phase: seconds}.

    Failure policy mirrors the reference (run.py:204-207): a failing phase
    stops the pipeline (unless ``stop_on_error=False``, which logs and
    continues — the per-worker swallow-and-log behavior)."""
    exclude = set(exclude or [])
    todo = [p for p in phases if p not in exclude]
    timings: Dict[int, float] = {}
    total0 = time.time()
    for p in todo:
        if p not in PHASES:
            raise ValueError(f"unknown phase {p}")
        name, fn = PHASES[p]
        log.info("=== phase %d: %s ===", p, name)
        t0 = time.time()
        ctx = None
        if profile_dir:
            import jax
            ctx = jax.profiler.trace(f"{profile_dir}/phase{p}")
            ctx.__enter__()
        try:
            fn(cfg)
        except Exception:
            log.exception("phase %d failed", p)
            if stop_on_error:
                raise
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
        timings[p] = time.time() - t0
        log.info("=== phase %d done in %.1f min ===", p, timings[p] / 60)
    log.info("pipeline total: %.1f min", (time.time() - total0) / 60)
    return timings


def main(argv: Optional[List[str]] = None) -> None:
    ap = argparse.ArgumentParser(
        description="regen3d_tpu pipeline (reference CLI: run.py -p 1..9)")
    ap.add_argument("-p", "--phases", type=int, nargs="+",
                    default=list(range(1, 10)))
    ap.add_argument("-ex", "--exclude", type=int, nargs="*", default=[])
    ap.add_argument("--config", default="src/config.yaml")
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--continue-on-error", action="store_true")
    args = ap.parse_args(argv)

    cfg = load_config(args.config)
    logging.basicConfig(
        level=getattr(logging, str(cfg.get("logging", "INFO")).upper(), 20),
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    phases = args.phases
    if phases == list(range(1, 10)):
        # baseline flags swap the default flow (reference run.py:468-482:
        # Use_MIDI → [MIDI_2d_to_3d, scene_optim, evaluation];
        # Use_DPA → [DPA_2d_to_3d]); explicit -p always wins
        if bool(cfg.get("Use_MIDI", False)):
            phases = [10, 7, 9]
        elif bool(cfg.get("Use_DPA", False)):
            phases = [11]
    run_phases(cfg, phases, args.exclude, args.profile_dir,
               stop_on_error=not args.continue_on_error)


if __name__ == "__main__":
    main()
