"""regen3d_tpu — TPU-native single-image → editable 3D indoor scene framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cgtuebingen/3D-RE-GEN (reference: /root/reference, arXiv:2512.17459):

    instance segmentation → generative amodal inpainting → per-object
    image-to-3D asset generation (flow-matching shape DiT) → monocular
    camera/depth/point-cloud estimation (VGGT-style geometry transformer)
    → vmapped differentiable-rendering pose optimization → scene assembly
    + background meshing → rendering → metric evaluation.

Design principles (TPU-first, NOT a port):
  * One Python process; phases are library calls, not subprocess scripts
    (reference: run.py:61-122 launches one venv subprocess per phase).
  * Everything on the compute path is jit-compiled XLA with static shapes;
    per-object work is vmapped/batched instead of one-OS-process-per-object
    (reference: scene_reconstruction/run.py:88-96 uses mp.Pool).
  * Hot kernels (nearest-neighbour/chamfer, soft rasterization, flash
    attention) are Pallas TPU kernels with custom VJPs.
  * Scaling is a `jax.sharding.Mesh` with named axes, pjit/shard_map and
    XLA collectives over ICI — replacing the reference's
    CUDA_VISIBLE_DEVICES isolation scheme (reference run.py:88-90).
  * The reference's data contracts are preserved: `src/config.yaml` key
    schema, `output/` directory layout, `camera.npz` keys, the
    `<label>__(cx, cy).png` finding filename convention, COLMAP sparse
    text format, and the phase CLI `run.py -p 1..9`.

Subpackages:
  config      — typed config honoring the reference YAML schema
  artifacts   — the output/ filesystem data-bus registry
  transforms  — rotations, rigid/similarity transforms, convention matrices
  camera      — pixel-space perspective camera (project/unproject)
  ops         — geometry + kernel pack (chamfer, point-mesh, rasterizer, ...)
  models      — JAX model zoo (SAM, VGGT, shape DiT, UNets, LPIPS)
  parallel    — device mesh, sharding rules, multi-scene fleet
  pipeline    — the nine phases
  utils       — PLY/GLB/COLMAP/image IO, logging, profiling
"""

__version__ = "0.1.0"

from regen3d_tpu.config import Config, load_config  # noqa: F401
from regen3d_tpu.jaxcache import enable_compilation_cache  # noqa: F401

# Remote compiles through the axon tunnel are minutes long; the persistent
# cache cuts repeat compiles to seconds (measured 946.8 s → 23.4 s). Enable
# it for every consumer of the package (no-op if jax config lacks the keys).
enable_compilation_cache()
