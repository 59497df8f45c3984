"""Checkpoint plumbing: torch→JAX weight conversion + orbax persistence.

The reference pulls every model from the HF hub / torch checkpoints
(SURVEY §2.2). This environment has zero egress, so conversions can't be
exercised against real weights here — but the machinery is complete: a
rule-based `state_dict` → flax-params mapper (with the transposition
conventions between torch and flax), and orbax save/load for the converted
trees.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)

# A rule: (regex over torch keys, fn(torch_key, match) -> flax path tuple,
#          fn(array) -> array)
Rule = Tuple[str, Callable[..., Tuple[str, ...]], Optional[Callable]]


def t2j_linear(w: np.ndarray) -> np.ndarray:
    """torch nn.Linear weight (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def t2j_conv(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (out, in, kh, kw) → flax Conv (kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t2j_convtranspose(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) → flax (kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def convert_state_dict(
    state: Dict[str, np.ndarray],
    rules: List[Rule],
    strict: bool = False,
    unmapped_out: List[str] | None = None,
) -> Dict[str, Any]:
    """Apply mapping rules to a torch state_dict, build a nested flax tree.

    A rule's path_fn may return ONE path tuple (the transform then maps the
    torch array to that leaf) or a LIST of path tuples (the transform must
    return a matching list of arrays — e.g. an upstream fused qkv split into
    separate q/k/v kernels). A path_fn returning None drops the key
    explicitly (counted as mapped). Pass ``unmapped_out`` (a list) to
    receive the unmapped key names directly — callers gating on coverage
    should use this, not the log output."""
    out: Dict[str, Any] = {}
    unused = []

    def put(path, arr):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr

    for key, val in state.items():
        arr = np.asarray(val)
        matched = False
        for pattern, path_fn, transform in rules:
            m = re.match(pattern, key)
            if not m:
                continue
            path = path_fn(key, m)
            if path is None:
                pass  # explicit drop
            elif isinstance(path, list):
                arrs = transform(arr)
                for p, a in zip(path, arrs):
                    put(p, a)
            else:
                put(path, transform(arr) if transform is not None else arr)
            matched = True
            break
        if not matched:
            unused.append(key)
    if unmapped_out is not None:
        unmapped_out.extend(unused)
    if unused:
        msg = f"{len(unused)} unmapped torch keys (e.g. {unused[:5]})"
        if strict:
            raise KeyError(msg)
        log.warning(msg)
    return {"params": out}


def verify_tree_shapes(converted: Dict, reference_params: Dict) -> List[str]:
    """Compare a converted tree against a randomly initialized one; returns
    human-readable mismatches (empty == structurally loadable)."""
    errors = []

    ref_flat = jax.tree_util.tree_flatten_with_path(reference_params)[0]
    conv_flat = {tuple(str(getattr(k, "key", k)) for k in kp): v
                 for kp, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    for kp, leaf in ref_flat:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        if path not in conv_flat:
            errors.append(f"missing: {'/'.join(path)}")
        elif tuple(conv_flat[path].shape) != tuple(leaf.shape):
            errors.append(f"shape {'/'.join(path)}: "
                          f"{conv_flat[path].shape} vs {leaf.shape}")
    return errors


# --- orbax persistence ----------------------------------------------------------

def save_checkpoint(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(os.path.abspath(path), target=like)
    return ckptr.restore(os.path.abspath(path))


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth/.safetensors file to numpy (torch-cpu is baked in)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file  # type: ignore

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    for wrapper in ("state_dict", "params_ema", "params"):
        # single-wrapper checkpoints (lightning, BasicSR RealESRGAN, …)
        if (wrapper in sd and isinstance(sd[wrapper], dict)
                and len(sd) <= 3):
            sd = sd[wrapper]
            break
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
