"""Minimal functional NN building blocks (pure pytrees, no framework).

Parameters are nested dicts of jnp arrays; stateful pieces (BatchNorm running
stats) live in a separate state pytree threaded through the step functions.
Initializers match the torch modules the reference uses (torch.nn.Linear
kaiming-uniform, PyG glorot for conv weights) closely enough for training
parity.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict


# ---------------- linear ----------------

def linear_init(rng, in_dim: int, out_dim: int, bias: bool = True,
                init: str = "kaiming") -> Params:
    kw, kb = jax.random.split(rng)
    if init == "glorot":
        limit = math.sqrt(6.0 / (in_dim + out_dim))
    else:  # torch.nn.Linear default (kaiming uniform, a=sqrt(5))
        limit = math.sqrt(1.0 / in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -limit, limit)}
    if bias:
        b_limit = math.sqrt(1.0 / in_dim)
        p["b"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -b_limit, b_limit)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    # bf16 inputs hit the MXU; accumulate in f32 (TPU-native matmul contract)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------- batch norm (masked) ----------------

def batchnorm_init(dim: int) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}
    state = {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}
    return params, state


def batchnorm(
    p: Params,
    s: Params,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    training: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm1d over valid rows only (``mask`` excludes padded rows —
    statistics must match the reference's unpadded batches).  Matches torch
    BatchNorm1d semantics: biased variance for normalization, unbiased for the
    running estimate."""
    if training:
        if mask is None:
            n = jnp.asarray(x.shape[0], jnp.float32)
            mean = x.mean(axis=0)
            var = ((x - mean) ** 2).mean(axis=0)
        else:
            m = mask.astype(x.dtype)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=0) / n
            var = (((x - mean) ** 2) * m).sum(axis=0) / n
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return y, new_s


# ---------------- dropout ----------------

def dropout(rng: Optional[jax.Array], x: jnp.ndarray, p: float, training: bool) -> jnp.ndarray:
    """Inverted dropout (torch F.dropout semantics)."""
    if not training or p == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def edge_dropout(rng: Optional[jax.Array], vals: jnp.ndarray, p: float,
                 training: bool, weighted: bool) -> jnp.ndarray:
    """DropEdge on the padded edge values (reference: utils.py:62-73):
    weighted adjacencies use inverted dropout on values; binary adjacencies
    drop entries without rescaling."""
    if not training or p == 0.0 or rng is None:
        return vals
    keep = jax.random.bernoulli(rng, 1.0 - p, vals.shape)
    if weighted:
        return jnp.where(keep, vals / (1.0 - p), 0.0)
    return jnp.where(keep, vals, 0.0)


def pad_rows(x: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Zero-pad a [R, D] array to [num_rows, D] (R <= num_rows, static)."""
    if x.shape[0] == num_rows:
        return x
    return jnp.pad(x, ((0, num_rows - x.shape[0]), (0, 0)))


def pad_cols(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Zero-pad the feature dim to ``dim`` (the history width)."""
    if x.shape[1] == dim:
        return x
    return jnp.pad(x, ((0, 0), (0, dim - x.shape[1])))
