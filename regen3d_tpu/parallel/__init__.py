"""Device-mesh scaling layer.

The reference's entire parallelism story is CUDA_VISIBLE_DEVICES isolation +
process pools (SURVEY §2.11). Here the equivalents are:

  * a named `jax.sharding.Mesh` ('dp', 'tp') replaces GPU pinning;
  * per-object/image work-items ride the 'dp' axis (what the reference's
    mp.Pool did), via batch sharding of the vmapped programs;
  * large models (VGGT-1B, the shape DiT) shard parameters over 'tp' with
    GSPMD inserting the ICI collectives;
  * multi-scene fleets scale the 'dp' axis across hosts (DCN).
"""

from regen3d_tpu.parallel.mesh import make_mesh, shard_params, partition_spec_for  # noqa: F401
