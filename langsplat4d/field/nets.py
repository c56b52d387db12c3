"""Minimal functional MLP building blocks (pure pytrees, no flax modules).

Initialization mirrors the reference nets: xavier-uniform weights
(scene/deformation.py:254-259 `initialize_weights`) and torch-Linear-default
uniform bias (the reference's custom init never touches biases).
"""
from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp


def linear_init(key, fan_in: int, fan_out: int):
    wkey, bkey = jax.random.split(key)
    bound_w = math.sqrt(6.0 / (fan_in + fan_out))  # xavier uniform, gain=1
    bound_b = 1.0 / math.sqrt(fan_in)              # torch Linear default bias
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32,
                                -bound_w, bound_w),
        "b": jax.random.uniform(bkey, (fan_out,), jnp.float32,
                                -bound_b, bound_b),
    }


def linear_apply(params, x):
    return x @ params["w"] + params["b"]


def mlp_init(key, dims: Sequence[int]) -> List[dict]:
    """Chain of Linear layers with the given [in, h1, ..., out] dims."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


def mlp_apply(layers: List[dict], x, *, pre_relu: bool = False):
    """Apply Linear layers with ReLU between them.

    pre_relu=True applies ReLU before the first Linear as well — this matches
    the reference's `nn.Sequential(nn.ReLU(), Linear, ReLU, Linear, ...)` head
    pattern (scene/deformation.py:61-69).
    """
    h = x
    for i, layer in enumerate(layers):
        if pre_relu or i > 0:
            h = jax.nn.relu(h)
        h = linear_apply(layer, h)
    return h


def poc_fre(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Positional frequency encoding: [x, sin(x*2^i), cos(x*2^i)].

    Mirrors `poc_fre` (scene/deformation.py:261-267). x: [..., d],
    freqs: [P] powers of two. Returns [..., d*(1+2P)] ordered as
    (raw d dims, then sin of d*P, then cos of d*P) flattened the torch way.
    """
    emb = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)


def poc_freqs(n: int) -> jnp.ndarray:
    return jnp.asarray([2.0 ** i for i in range(n)], jnp.float32)
