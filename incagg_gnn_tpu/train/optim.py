"""Optimizer construction: Adam with reg/nonreg weight-decay groups.

Matches the reference's two torch.optim.Adam param groups (main.py:196-201):
L2 decay is added to the gradient *before* the Adam moment update (torch Adam
semantics, not decoupled AdamW), and global-norm clipping runs first
(main.py:83-84 ``clip_grad_norm_``).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def make_optimizer(
    reg_mask,
    lr: float,
    reg_weight_decay: float = 0.0,
    nonreg_weight_decay: float = 0.0,
    grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    chain = []
    if grad_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_norm))
    if reg_weight_decay:
        chain.append(optax.add_decayed_weights(reg_weight_decay, mask=reg_mask))
    if nonreg_weight_decay:
        nonreg = jax.tree.map(lambda b: not b, reg_mask)
        chain.append(optax.add_decayed_weights(nonreg_weight_decay, mask=nonreg))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)
