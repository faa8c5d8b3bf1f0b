"""pjit data-parallel trainer for both stages.

Replaces the reference's torch loops (``stage1_compose/train.py``,
``stage2_accompaniment/train.py``) with a jitted train step over a
``jax.sharding.Mesh``: batch sharded over dp, params replicated (XLA inserts
the gradient psum over ICI), Adam with warmup+cosine LR, global-norm clip at
0.5, optional gradient accumulation (the GPT-2 configs use ``accum_steps:
2``), and on-device total/chord/melody accuracy metrics mirroring
``compute_accuracy`` (``stage1_compose/train.py:179-188``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from .schedule import warmup_cosine
from ..models.txl import masked_cross_entropy
from ..parallel.mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


@dataclass(frozen=True)
class OptimizerConfig:
    max_lr: float = 1e-4
    min_lr: float = 1e-5
    warmup_steps: int = 200
    lr_decay_steps: int = 500_000
    clip_norm: float = 0.5
    accum_steps: int = 1


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = warmup_cosine(cfg.max_lr, cfg.min_lr, cfg.warmup_steps,
                             cfg.lr_decay_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.adam(schedule),
    )
    if cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=optimizer.init(params))


def dropout_rng(seed: int) -> jax.Array:
    """Dropout key using the hardware-friendly ``rbg`` PRNG.

    The default threefry PRNG generates dropout masks in software on the
    VPU — measured ~95 ms per stage-2 train step at B=16/L=3072 (~40% of
    the whole step).  rbg keys cut that to ~25 ms with identical dropout
    semantics (different stream; dropout needs no cross-impl parity)."""
    return jax.random.key(seed, impl='rbg')


def accuracy_sums(logits: jax.Array, targets: jax.Array, chord_mask: jax.Array,
                  melody_mask: jax.Array, pad_id: int) -> Dict[str, jax.Array]:
    """Correct/total counts for total/chord/melody/others accuracy.

    Mirrors the reference metric (``stage1_compose/train.py:179-188``), which
    derives 'others' by subtracting chord and melody counts from the total.
    """
    pred = jnp.argmax(logits, axis=-1).astype(targets.dtype)
    correct = (pred == targets).astype(jnp.float32)
    nonpad = (targets != pad_id).astype(jnp.float32)
    chord = (chord_mask == 1).astype(jnp.float32)
    melody = (melody_mask == 1).astype(jnp.float32)
    return {
        'total_correct': jnp.sum(correct * nonpad),
        'total_count': jnp.sum(nonpad),
        'chord_correct': jnp.sum(correct * chord),
        'chord_count': jnp.sum(chord),
        'melody_correct': jnp.sum(correct * melody),
        'melody_count': jnp.sum(melody),
    }


def finalize_accuracy(sums: Dict[str, float]) -> Dict[str, float]:
    total = sums['total_correct'] / max(sums['total_count'], 1.0)
    chord = sums['chord_correct'] / max(sums['chord_count'], 1.0)
    melody = sums['melody_correct'] / max(sums['melody_count'], 1.0)
    other_count = sums['total_count'] - sums['chord_count'] - sums['melody_count']
    other_correct = (sums['total_correct'] - sums['chord_correct']
                     - sums['melody_correct'])
    others = other_correct / max(other_count, 1.0)
    return {'total': total, 'chord': chord, 'melody': melody, 'others': others}


def make_train_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, donate: bool = True):
    """Build the jitted train step.

    ``loss_fn(params, batch, rng, extras) -> (loss, aux)``; ``batch`` is a
    dict of [B, ...] arrays (sharded over dp), ``extras`` a dict of
    replicated side inputs (e.g. the Performer's FAVOR+ omegas).
    """

    def step(state: TrainState, batch, rng, extras):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, extras)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, loss, aux

    kwargs = {}
    # explicit shardings only for real multi-device meshes: on a 1-device
    # mesh they are semantically a no-op but trigger a pathological
    # reshard-through-host path on some platforms (measured 180x slower
    # through the axon relay)
    if mesh is not None and mesh.size > 1:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        if mesh.shape.get('tp', 1) > 1:
            # tensor-parallel params carry committed NamedShardings from
            # sharding_rules.shard_params — leave state/outputs unspecified
            # so the partitioner propagates them (forcing repl would
            # all-gather every kernel each step)
            kwargs = dict(in_shardings=(None, data, None, None))
        else:
            kwargs = dict(
                in_shardings=(repl, data, repl, repl),
                out_shardings=(repl, repl, repl),
            )
    return jax.jit(step, donate_argnums=(0,) if donate else (), **kwargs)


def make_eval_step(loss_fn: Callable, mesh: Optional[Mesh] = None):
    def step(params, batch, extras):
        return loss_fn(params, batch, None, extras)

    kwargs = {}
    if mesh is not None and mesh.size > 1:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        if mesh.shape.get('tp', 1) > 1:
            kwargs = dict(in_shardings=(None, data, None))
        else:
            kwargs = dict(in_shardings=(repl, data, repl),
                          out_shardings=(repl, repl))
    return jax.jit(step, **kwargs)


# ---------------------------------------------------------------------------
# per-stage loss functions
# ---------------------------------------------------------------------------

def stage1_loss_fn(model, pad_id: int):
    def loss_fn(params, batch, rng, extras):
        del extras
        rngs = {'dropout': rng} if rng is not None else None
        logits, _ = model.apply(params, batch['dec_inp'],
                                deterministic=rng is None, rngs=rngs)
        loss = masked_cross_entropy(logits, batch['dec_tgt'], pad_id)
        aux = accuracy_sums(logits, batch['dec_tgt'], batch['inp_chord'],
                            batch['inp_melody'], pad_id)
        return loss, aux
    return loss_fn


def make_segmented_train_step(model, pad_id: int,
                              optimizer: optax.GradientTransformation,
                              mesh: Optional[Mesh] = None):
    """Stage-1 multi-segment training step with XL memory recurrence.

    Mirrors the reference hot loop (``stage1_compose/train.py:27-74``): one
    optimizer step per segment, memories carried across segments with the
    per-sample variable-length update (``_update_mems`` dec_seg_len path).
    ``seg_batch`` arrays are [B, L]; ``mems`` is [n_layer+1, B, mlen, D].
    """
    from ..models.txl import update_mems_varlen

    def loss_fn(params, seg_batch, mems, rng):
        rngs = {'dropout': rng} if rng is not None else None
        mems_list = [mems[i] for i in range(mems.shape[0])]
        logits, _, hids = model.apply(
            params, seg_batch['dec_inp'], mems_list,
            deterministic=rng is None, return_hiddens=True, rngs=rngs)
        loss = masked_cross_entropy(logits, seg_batch['dec_tgt'], pad_id)
        aux = accuracy_sums(logits, seg_batch['dec_tgt'],
                            seg_batch['inp_chord'], seg_batch['inp_melody'],
                            pad_id)
        hids = jax.lax.stop_gradient(jnp.stack(hids))
        return loss, (aux, hids)

    def step(state: TrainState, seg_batch, mems, rng):
        (loss, (aux, hids)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, seg_batch, mems, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_mems = jax.vmap(update_mems_varlen, in_axes=(0, 0, None))(
            mems, hids, seg_batch['seg_len'])
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, new_mems, loss, aux

    return jax.jit(step, donate_argnums=(0, 2))


def stage2_performer_loss_fn(model, pad_id: int):
    def loss_fn(params, batch, rng, extras):
        rngs = {'dropout': rng} if rng is not None else None
        logits = model.apply(params, batch['dec_inp'], extras['omegas'],
                             batch['track_mask'],
                             deterministic=rng is None, rngs=rngs)
        loss = masked_cross_entropy(logits, batch['dec_tgt'], pad_id)
        aux = accuracy_sums(logits, batch['dec_tgt'], batch['chord_idx'],
                            batch['melody_idx'], pad_id)
        return loss, aux
    return loss_fn


def stage2_gpt2_loss_fn(model, pad_id: int):
    def loss_fn(params, batch, rng, extras):
        del extras
        rngs = {'dropout': rng} if rng is not None else None
        logits = model.apply(params, batch['dec_inp'], batch['track_mask'],
                             deterministic=rng is None, rngs=rngs)
        loss = masked_cross_entropy(logits, batch['dec_tgt'], pad_id)
        aux = accuracy_sums(logits, batch['dec_tgt'], batch['chord_idx'],
                            batch['melody_idx'], pad_id)
        return loss, aux
    return loss_fn
