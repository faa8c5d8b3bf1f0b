"""Stage-1 training driver (reference: ``stage1_compose/train.py``).

Orchestrates: YAML config -> datasets -> flax PlainTransformer -> jitted
data-parallel train/eval steps -> per-interval orbax checkpoints with the
``ep{N}_loss{L}`` naming convention -> ``log.txt`` / ``valloss.txt`` in the
reference formats.  Finetuning can start from either an orbax checkpoint or
a released torch ``.pt`` (converted on the fly).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vocab import Vocab
from ..data.datasets import Stage1Dataset
from ..models.txl import PlainTransformer
from ..parallel.mesh import (dp_padded_batch_size, make_mesh, shard_batch)
from ..utils.io import pickle_load, load_yaml
from ..utils.logging import EpochLogger, write_valloss_line
from .trainer import (
    dropout_rng,
    OptimizerConfig, TrainState, accuracy_sums, finalize_accuracy,
    init_train_state, make_eval_step, make_optimizer, make_train_step,
    stage1_loss_fn,
)
from .checkpoint import gc_checkpoints, save_checkpoint, load_checkpoint
from .convert_pt import convert_stage1_pt


def neutralize_pad_rows(batch: dict, batch_size: int, pad_id: int) -> dict:
    """Pad a short batch to full size with rows whose targets are all PAD
    (zero loss/metric weight)."""
    out = {}
    n = None
    for k, v in batch.items():
        v = np.asarray(v)
        n = v.shape[0]
        if n < batch_size:
            fill = np.repeat(v[-1:], batch_size - n, axis=0)
            if k in ('dec_tgt',):
                fill = np.full_like(fill, pad_id)
            if k in ('inp_chord', 'inp_melody', 'chord_idx', 'melody_idx'):
                fill = np.zeros_like(fill)
            v = np.concatenate([v, fill], axis=0)
        out[k] = v
    return out


def build_model_and_params(config: dict, vocab: Vocab, rng_seed: int = 0,
                           dtype=None):
    mconf = config['model']
    if dtype is None:
        # optional 'compute_dtype: bfloat16' config key (params stay f32)
        dtype = jnp.bfloat16 if config.get('compute_dtype') == 'bfloat16' \
            else jnp.float32
    model = PlainTransformer(
        vocab_size=vocab.size,
        d_embed=mconf['d_word_embed'],
        n_layer=mconf['decoder']['n_layer'],
        n_head=mconf['decoder']['n_head'],
        d_model=mconf['decoder']['d_model'],
        d_ff=mconf['decoder']['d_ff'],
        dropout=mconf['decoder']['dropout'],
        pre_lnorm=mconf['pre_lnorm'],
        mem_len=mconf['decoder']['mem_len'],
        pad_id=vocab.pad_id,
        dtype=dtype,
    )
    dummy = jnp.ones((1, 8), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(rng_seed), dummy)
    return model, params


def load_pretrained_params(path: str, template, n_layer: int = 12):
    if path.endswith('.pt'):
        return convert_stage1_pt(path, n_layer=n_layer)
    return load_checkpoint(path, template)[0]


def run(config_path: str, representation: str, *,
        max_epoch_override: Optional[int] = None,
        max_batches_per_epoch: Optional[int] = None,
        n_devices: Optional[int] = None,
        seed: int = 0) -> dict:
    """Train stage 1; returns summary stats (final loss, steps)."""
    config = load_yaml(config_path)
    ckpt_dir = config['output']['ckpt_dir'].format(representation)
    tconf = config['training']

    vocab = Vocab.load(config['data']['vocab_path'].format(representation))
    tgt_len = config['model']['decoder']['tgt_len']

    dset = Stage1Dataset(
        config['data']['data_dir'].format(representation), vocab,
        pieces=pickle_load(config['data']['train_split']),
        model_dec_seqlen=tgt_len, seed=seed)
    val_dset = Stage1Dataset(
        config['data']['data_dir'].format(representation), vocab,
        pieces=pickle_load(config['data']['val_split']),
        model_dec_seqlen=tgt_len, seed=seed)

    mesh = make_mesh(n_devices)
    model, params = build_model_and_params(config, vocab, rng_seed=seed)
    if config.get('pretrained_param_path'):
        params = load_pretrained_params(
            config['pretrained_param_path'], params,
            n_layer=config['model']['decoder']['n_layer'])

    opt_cfg = OptimizerConfig(
        max_lr=float(tconf['max_lr']), min_lr=float(tconf['min_lr']),
        warmup_steps=tconf['warmup_steps'],
        lr_decay_steps=tconf['lr_decay_steps'])
    optimizer = make_optimizer(opt_cfg)
    state = init_train_state(params, optimizer)
    # optimizer-state resume: orbax checkpoints restore exactly; the torch
    # Adam state of released .pt optimizers is not convertible (parameter
    # ordering is positional there) and is skipped with a warning
    if config.get('pretrained_optim_path'):
        opt_path = config['pretrained_optim_path']
        if opt_path.endswith('.pt'):
            print('[warn] torch optimizer state {} not convertible; '
                  'starting Adam fresh'.format(opt_path))
        else:
            _, opt_state = load_checkpoint(os.path.dirname(opt_path) or opt_path,
                                           state.params, state.opt_state)
            if opt_state is not None:
                state = state.replace(opt_state=opt_state)

    loss_fn = stage1_loss_fn(model, vocab.pad_id)
    train_step = make_train_step(loss_fn, optimizer, mesh)
    eval_step = make_eval_step(loss_fn, mesh)

    os.makedirs(ckpt_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(ckpt_dir, 'config.yaml'))
    start_epoch = tconf.get('trained_epochs') or 0
    log_name = 'log.txt' if start_epoch == 0 else f'log_from_ep{start_epoch:03d}.txt'
    logger = EpochLogger(os.path.join(ckpt_dir, log_name))

    batch_size = config['data']['batch_size']
    eff_batch_size = dp_padded_batch_size(mesh, batch_size)
    max_epoch = max_epoch_override or tconf['max_epoch']
    train_steps = tconf.get('trained_steps') or 0
    rng = dropout_rng(seed + 1)   # rbg: fast TPU dropout masks
    recons_loss = float('nan')

    for ep in range(start_epoch, max_epoch):
        t0 = time.time()
        loss_sum, n_samples = 0.0, 0
        for bidx, batch in enumerate(dset.batches(batch_size, shuffle=True)):
            if max_batches_per_epoch and bidx >= max_batches_per_epoch:
                break
            bsz = batch['dec_inp'].shape[0]
            batch = neutralize_pad_rows(batch, eff_batch_size, vocab.pad_id)
            batch = shard_batch(mesh, {k: v for k, v in batch.items()
                                       if k != 'length'})
            rng, sub = jax.random.split(rng)
            state, loss, aux = train_step(state, batch, sub, {})
            train_steps += 1
            loss_sum += float(loss) * bsz
            n_samples += bsz
            if train_steps % tconf['log_interval'] == 0:
                logger.log(ep + 1, train_steps, loss_sum / n_samples,
                           time.time() - t0)
        recons_loss = loss_sum / max(n_samples, 1)

        if (ep + 1) % config['output']['ckpt_interval'] == 0:
            save_checkpoint(os.path.join(ckpt_dir, 'params'), ep + 1,
                            recons_loss, state.params, state.opt_state)
            keep = config['output'].get('ckpt_keep_last', 0)
            if keep:
                gc_checkpoints(os.path.join(ckpt_dir, 'params'), keep)

        if (ep + 1) % tconf['val_interval'] == 0:
            val_losses = []
            acc_sums = None
            for batch in val_dset.batches(batch_size, shuffle=False):
                batch = neutralize_pad_rows(batch, eff_batch_size, vocab.pad_id)
                batch = shard_batch(mesh, {k: v for k, v in batch.items()
                                           if k != 'length'})
                loss, aux = eval_step(state.params, batch, {})
                val_losses.append(float(loss))
                aux = {k: float(v) for k, v in aux.items()}
                acc_sums = aux if acc_sums is None else \
                    {k: acc_sums[k] + aux[k] for k in aux}
            acc = finalize_accuracy(acc_sums)
            valloss_name = 'valloss.txt' if start_epoch == 0 \
                else f'valloss_from_ep{start_epoch:03d}.txt'
            write_valloss_line(os.path.join(ckpt_dir, valloss_name), ep + 1,
                               recons_loss, float(np.mean(val_losses)),
                               float(np.std(val_losses)), acc)

        logger.log(ep + 1, train_steps, recons_loss, time.time() - t0)

    return {'loss': recons_loss, 'steps': train_steps, 'ckpt_dir': ckpt_dir}
