"""Multi-scene fleet: batch processing many scenes over the device mesh.

The reference processes one scene per invocation; its only scale-out is
GPU-pinned subprocesses within a scene (SURVEY §2.11). This module is the
TPU-native scale-out story: N independent scenes run the phase pipeline with
their per-scene configs, device work batched where the phases support it
(the pose-fit engine and asset generator take batches natively), host IO
overlapped with a thread pool. On multi-host deployments the scene list is
sharded by process index over DCN (`jax.process_index`).
"""

from __future__ import annotations

import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax

from regen3d_tpu.config import Config, default_config
from regen3d_tpu.orchestrator import run_phases

log = logging.getLogger(__name__)


@dataclass
class SceneJob:
    scene_id: str
    input_image: str
    output_root: str
    overrides: Optional[dict] = None


@dataclass
class FleetResult:
    scene_id: str
    ok: bool
    seconds: float
    error: Optional[str] = None


def shard_jobs(jobs: Sequence[SceneJob], pidx: int,
               pcount: int) -> List[SceneJob]:
    """Deterministic DCN scene sharding: host ``pidx`` of ``pcount`` takes
    every pcount-th job (round-robin, so a sorted-by-cost job list load-
    balances). The union over all hosts is exactly ``jobs``, disjoint."""
    if not 0 <= pidx < pcount:
        raise ValueError(f"process index {pidx} not in [0, {pcount})")
    return [j for i, j in enumerate(jobs) if i % pcount == pidx]


def run_fleet(
    jobs: Sequence[SceneJob],
    phases: Sequence[int] = tuple(range(1, 10)),
    io_workers: int = 4,
    base_overrides: Optional[dict] = None,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[FleetResult]:
    """Run the pipeline over many scenes.

    Scenes are sharded across hosts (process_index); within a host they run
    sequentially on the device (each phase is already device-batched
    internally) with IO-bound phases (1, 2, 8 file export) overlapped via a
    small thread pool. Failures are isolated per scene (the reference's
    break-on-failure applies within a scene, not across the fleet).
    ``process_index``/``process_count`` default to the live JAX distributed
    runtime; tests inject values to exercise the multi-host slicing.
    """
    pidx = jax.process_index() if process_index is None else process_index
    pcount = jax.process_count() if process_count is None else process_count
    mine = shard_jobs(jobs, pidx, pcount)
    log.info("fleet: host %d/%d takes %d/%d scenes", pidx, pcount,
             len(mine), len(jobs))

    results: List[FleetResult] = []

    def one(job: SceneJob) -> FleetResult:
        t0 = time.time()
        try:
            overrides = dict(base_overrides or {})
            overrides.update(job.overrides or {})
            overrides["input_image"] = job.input_image
            cfg = default_config(job.output_root, **overrides)
            run_phases(cfg, list(phases), stop_on_error=True)
            return FleetResult(job.scene_id, True, time.time() - t0)
        except Exception as e:  # scene isolation
            log.exception("fleet: scene %s failed", job.scene_id)
            return FleetResult(job.scene_id, False, time.time() - t0, str(e))

    # NOTE: phases sharing the jit cache must not race compilation; scenes
    # run sequentially on-device, the pool only overlaps pure-IO jobs when
    # the caller selects IO-only phase subsets.
    if set(phases) <= {1, 2, 8, 9}:
        with ThreadPoolExecutor(max_workers=io_workers) as pool:
            results = list(pool.map(one, mine))
    else:
        results = [one(j) for j in mine]

    ok = sum(r.ok for r in results)
    log.info("fleet: %d/%d scenes ok", ok, len(results))
    return results
