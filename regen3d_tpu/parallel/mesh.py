"""Mesh construction + parameter partition rules (GSPMD/pjit style)."""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Rules are matched (first hit wins) against the '/'-joined flax param path.
# Model-parallel layout for transformer blocks:
#   qkv / fc1 kernels  : shard output features over 'tp'  (column parallel)
#   proj / fc2 kernels : shard input features over 'tp'   (row parallel)
# Everything else replicates. GSPMD inserts the psum/all-gathers over ICI.
DEFAULT_RULES: List[Tuple[str, P]] = [
    (r"(attn|cross|gather|query_cross)/(q|k|v)/kernel$", P(None, "tp")),
    (r"(attn|cross|gather|query_cross)/(q|k|v)/bias$", P("tp")),
    (r"(attn|cross|gather|query_cross)/proj/kernel$", P("tp", None)),
    # fused-qkv ViT blocks (VGGT aggregator/backbone, SAM encoder): column
    # parallel on the fused output, row parallel on the out-projection
    (r"attn/qkv/kernel$", P(None, "tp")),
    (r"attn/qkv/bias$", P("tp")),
    (r"mlp/fc1/kernel$", P(None, "tp")),
    (r"mlp/fc1/bias$", P("tp")),
    (r"mlp/fc2/kernel$", P("tp", None)),
    (r"(t_mlp)/fc1/kernel$", P(None, "tp")),
    (r"(t_mlp)/fc1/bias$", P("tp")),
    (r"(t_mlp)/fc2/kernel$", P("tp", None)),
    (r"adaLN(_out)?/kernel$", P(None, "tp")),
    (r"adaLN(_out)?/bias$", P("tp")),
]


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("dp", "tp"),
    tp: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a ('dp', 'tp') mesh over the available devices.

    ``tp`` picks the model-parallel degree (defaults to min(n, 4) when n is
    composite, else 1); dp gets the rest. On a single chip this degenerates
    to a 1×1 mesh — the same program runs unchanged.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if tp is None:
        tp = 1
        for cand in (4, 2):
            if n % cand == 0 and n >= cand:
                tp = cand
                break
    dp = n // tp
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=tuple(axes))


def partition_spec_for(path: str, rules: Sequence[Tuple[str, P]] = tuple(DEFAULT_RULES)) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _tree_paths(tree) -> Dict[str, object]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for kp, leaf in flat:
        path = "/".join(
            getattr(k, "key", getattr(k, "idx", getattr(k, "name", str(k))))
            if not isinstance(k, str) else k
            for k in (getattr(p, "key", p) for p in kp)
        )
        out[path] = leaf
    return out


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]] = tuple(DEFAULT_RULES)):
    """Place a parameter pytree onto the mesh per the partition rules.

    Rank-mismatched rules fall back to replication (robust to biases/scales).
    """

    def place(kp, leaf):
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        spec = partition_spec_for(path, rules)
        if len([s for s in spec if s is not None]) > getattr(leaf, "ndim", 0):
            spec = P()
        # drop specs that don't divide the dim evenly
        fixed = []
        for d, s in enumerate(spec):
            if s is None:
                fixed.append(None)
                continue
            axis_size = mesh.shape[s]
            if leaf.shape[d] % axis_size != 0:
                fixed.append(None)
            else:
                fixed.append(s)
        spec = P(*fixed) if fixed else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
