"""LPIPS perceptual metric (AlexNet backbone + linear calibration heads).

Replaces the reference's ``lpips.LPIPS(net='alex')`` (run_eval.py:174-197).
Weights convert from the torchvision AlexNet + LPIPS linear layers via
models/weights.py; with random init the metric is still a valid
deep-feature distance (monotone in corruption), which the test asserts.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp


class AlexFeatures(nn.Module):
    """torchvision-AlexNet feature trunk; returns the 5 tap activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) in [-1, 1]
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)),
                            dtype=self.dtype, name="conv2")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv3")(x))
        taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv4")(x))
        taps.append(x)
        x = nn.relu(nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="conv5")(x))
        taps.append(x)
        return taps


class LPIPS(nn.Module):
    """Full metric: normalized feature differences × learned linear heads."""

    @nn.compact
    def __call__(self, a, b):  # (B, H, W, 3) in [0, 1] each
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        a = (a - mean) / std
        b = (b - mean) / std
        net = AlexFeatures(name="alex")
        fa = net(a)
        fb = net(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            nb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            diff = (na - nb) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}",
                          kernel_init=nn.initializers.constant(
                              1.0 / diff.shape[-1]))
            total = total + jnp.mean(jnp.abs(lin(diff)))
        return total


@functools.lru_cache(maxsize=1)
def _jitted_lpips_apply():
    """Shared jitted LPIPS forward — params as ARGUMENTS (a per-call jit
    would embed them as constants and recompile per make_lpips_fn call)."""
    model = LPIPS()

    @jax.jit
    def fn(params, a, b):
        if a.ndim == 3:
            a = a[None]
            b = b[None]
        return model.apply(params, a, b)

    return fn


def make_lpips_fn(params=None, image_size: int = 256):
    """Build a jitted lpips(a, b) → scalar for phase 9."""
    if params is None:
        params = LPIPS().init(jax.random.PRNGKey(0),
                              jnp.zeros((1, image_size, image_size, 3)),
                              jnp.zeros((1, image_size, image_size, 3)))
    inner = _jitted_lpips_apply()
    return lambda a, b: inner(params, a, b)
