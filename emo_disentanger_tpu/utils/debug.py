"""Debug-mode numerical sanitizers (SURVEY §5 "race detection / sanitizers"
row: the reference has none; on TPU the equivalent guard is jax.checkify's
float checks — NaN/Inf surfacing with source locations instead of silently
propagating through a jitted step).

Usage::

    step = checked_train_step(loss_fn, optimizer)   # instead of make_...
    err, (state, loss, aux) = step(state, batch, rng, extras)
    err.throw()    # raises with the failing op's source line on any NaN/Inf

Intended for debugging runs — the checks add device-side predication, so
production training keeps the unchecked `make_train_step`.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.experimental import checkify

from ..train.trainer import TrainState


def checked_train_step(loss_fn: Callable,
                       optimizer: optax.GradientTransformation):
    """A jitted train step instrumented with checkify float checks
    (NaN/Inf in any intermediate raises through ``err.throw()``)."""

    def step(state: TrainState, batch, rng, extras):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, extras)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, loss, aux

    checked = checkify.checkify(step, errors=checkify.float_checks)
    return jax.jit(checked)


def assert_all_finite(tree, name: str = 'tree') -> None:
    """Host-side sanity sweep over a pytree (checkpoints, converted params)."""
    import numpy as np
    bad = []

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if arr.dtype.kind == 'f' and not np.isfinite(arr).all():
            bad.append(jax.tree_util.keystr(path))
        return leaf

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise ValueError(f'non-finite values in {name}: {bad[:10]}')
