"""Learning-rate schedule: linear warmup -> cosine annealing.

Parity with the reference (``stage1_compose/train.py:70-74``): for
``step < warmup_steps`` the LR ramps linearly as ``max_lr * step / warmup``;
afterwards it follows torch's ``CosineAnnealingLR`` evaluated at
``step - warmup``: eta_min + (max_lr - eta_min) * (1 + cos(pi t / T_max)) / 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(max_lr: float, min_lr: float, warmup_steps: int,
                  decay_steps: int):
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = max_lr * step / max(warmup_steps, 1)
        t = jnp.maximum(step - warmup_steps, 0.0)
        cos = min_lr + (max_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / decay_steps))
        return jnp.where(step < warmup_steps, warm, cos)
    return schedule
