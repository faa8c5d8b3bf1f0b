"""Stage-2 training driver (reference: ``stage2_accompaniment/train.py``).

Performer or GPT-2 backbone selected by ``model_type``; the Performer's
FAVOR+ feature matrices are redrawn per step with the configured probability
(reference ``feat_redraw_prob``, ``train.py:57,239``); the GPT-2 configs use
2-step gradient accumulation (``accum_steps``).
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
from ..data.datasets import Stage2Dataset
from ..models.performer import MusicPerformer
from ..models.gpt2 import MusicGPT2
from ..parallel.mesh import (dp_padded_batch_size, make_mesh, shard_batch)
from ..utils.io import pickle_load, load_yaml
from ..utils.logging import EpochLogger, write_valloss_line
from .trainer import (
    dropout_rng,
    OptimizerConfig, finalize_accuracy, init_train_state, make_eval_step,
    make_optimizer, make_train_step, stage2_gpt2_loss_fn,
    stage2_performer_loss_fn,
)
from .checkpoint import gc_checkpoints, save_checkpoint, load_checkpoint
from .convert_pt import convert_performer_pt, convert_gpt2_pt
from .train_stage1 import neutralize_pad_rows


def build_model_and_params(config: dict, vocab: Vocab, model_type: str,
                           rng_seed: int = 0, dtype=None):
    mconf = config['model']
    if dtype is None:
        dtype = jnp.bfloat16 if config.get('compute_dtype') == 'bfloat16' \
            else jnp.float32
    common = dict(
        n_token=vocab.size, n_layer=mconf['n_layer'], n_head=mconf['n_head'],
        d_model=mconf['d_model'], d_ff=mconf['d_ff'], d_embed=mconf['d_embed'],
        use_segment_emb=mconf['use_segemb'],
        n_segment_types=mconf.get('n_segment_types', 2), dtype=dtype)
    dummy = jnp.ones((1, 8), dtype=jnp.int32)
    seg = jnp.zeros((1, 8), dtype=jnp.int32)
    if model_type == 'performer':
        model = MusicPerformer(favor_dims=mconf['feature_map']['n_dims'], **common)
        omegas = model.draw_omegas(jax.random.PRNGKey(rng_seed + 7))
        params = model.init(jax.random.PRNGKey(rng_seed), dummy, omegas, seg)
        return model, params, omegas
    elif model_type == 'gpt2':
        model = MusicGPT2(**common)
        params = model.init(jax.random.PRNGKey(rng_seed), dummy, seg)
        return model, params, None
    raise ValueError(f'unsupported model type {model_type!r}')


def load_pretrained_params(path: str, template, model_type: str, n_layer: int = 12):
    if path.endswith('.pt'):
        conv = convert_performer_pt if model_type == 'performer' else convert_gpt2_pt
        return conv(path, n_layer=n_layer)
    return load_checkpoint(path, template)[0]


def run(config_path: str, representation: str, model_type: str, *,
        max_epoch_override: Optional[int] = None,
        max_batches_per_epoch: Optional[int] = None,
        n_devices: Optional[int] = None,
        seed: int = 0) -> dict:
    config = load_yaml(config_path)
    tconf = config['training']
    ckpt_dir = tconf['ckpt_dir'].format(representation)
    dconf = config['data_loader']

    vocab = Vocab.load(dconf['vocab_path'].format(representation))
    max_len = config['model']['max_len']

    dset = Stage2Dataset(dconf['data_path'].format(representation), vocab,
                         pieces=pickle_load(dconf['train_split']),
                         model_dec_seqlen=max_len, seed=seed)
    val_dset = Stage2Dataset(dconf['data_path'].format(representation), vocab,
                             pieces=pickle_load(dconf['val_split']),
                             model_dec_seqlen=max_len, seed=seed)

    mesh = make_mesh(n_devices)
    model, params, omegas = build_model_and_params(config, vocab, model_type,
                                                   rng_seed=seed)
    if tconf.get('trained_params'):
        params = load_pretrained_params(tconf['trained_params'], params,
                                        model_type,
                                        n_layer=config['model']['n_layer'])

    accum_steps = tconf.get('accum_steps', 1)
    opt_cfg = OptimizerConfig(
        max_lr=float(tconf['lr']), min_lr=float(tconf['lr_scheduler']['eta_min']),
        warmup_steps=tconf['warmup_steps'],
        lr_decay_steps=tconf['lr_scheduler']['T_max'],
        accum_steps=accum_steps)
    optimizer = make_optimizer(opt_cfg)
    state = init_train_state(params, optimizer)
    if tconf.get('trained_optim'):
        opt_path = tconf['trained_optim']
        if opt_path.endswith('.pt'):
            print('[warn] torch optimizer state {} not convertible; '
                  'starting Adam fresh'.format(opt_path))
        else:
            # accept either the orbax checkpoint dir itself or a path to a
            # file inside it (the reference convention is a *_optim.pt FILE
            # next to the params, hence the dirname fallback)
            base = opt_path if os.path.isdir(os.path.join(opt_path, 'optim')) \
                else (os.path.dirname(opt_path) or opt_path)
            _, opt_state = load_checkpoint(base, state.params,
                                           state.opt_state)
            if opt_state is not None:
                state = state.replace(opt_state=opt_state)

    if model_type == 'performer':
        loss_fn = stage2_performer_loss_fn(model, vocab.pad_id)
    else:
        loss_fn = stage2_gpt2_loss_fn(model, vocab.pad_id)
    train_step = make_train_step(loss_fn, optimizer, mesh)
    eval_step = make_eval_step(loss_fn, mesh)

    os.makedirs(ckpt_dir, exist_ok=True)
    shutil.copy(config_path, os.path.join(ckpt_dir, 'config.yaml'))
    logger = EpochLogger(os.path.join(ckpt_dir, 'log.txt'))

    batch_size = dconf['batch_size']
    eff_batch_size = dp_padded_batch_size(mesh, batch_size)
    redraw_prob = tconf.get('feat_redraw_prob', 0.0)
    max_epoch = max_epoch_override or tconf['num_epochs']
    train_steps = 0
    rng = dropout_rng(seed + 1)   # rbg: fast TPU dropout masks
    host_rng = np.random.RandomState(seed + 2)
    recons_loss = float('nan')

    for ep in range(max_epoch):
        t0 = time.time()
        loss_sum, n_samples = 0.0, 0
        for bidx, batch in enumerate(dset.batches(batch_size, shuffle=True)):
            if max_batches_per_epoch and bidx >= max_batches_per_epoch:
                break
            bsz = batch['dec_inp'].shape[0]
            batch = neutralize_pad_rows(batch, eff_batch_size, vocab.pad_id)
            batch = shard_batch(mesh, {k: v for k, v in batch.items()
                                       if k != 'length'})
            extras = {}
            if model_type == 'performer':
                if host_rng.random() <= redraw_prob:
                    rng, sub = jax.random.split(rng)
                    omegas = model.draw_omegas(sub)
                extras = {'omegas': omegas}
            rng, sub = jax.random.split(rng)
            state, loss, aux = train_step(state, batch, sub, extras)
            train_steps += 1
            loss_sum += float(loss) * bsz
            n_samples += bsz
            if train_steps % tconf['log_interval'] == 0:
                logger.log(ep + 1, train_steps, loss_sum / n_samples,
                           time.time() - t0)
        recons_loss = loss_sum / max(n_samples, 1)

        if (ep + 1) % tconf['ckpt_interval'] == 0:
            save_checkpoint(os.path.join(ckpt_dir, 'params'), ep + 1,
                            recons_loss, state.params, state.opt_state)
            if tconf.get('ckpt_keep_last', 0):
                gc_checkpoints(os.path.join(ckpt_dir, 'params'),
                               tconf['ckpt_keep_last'])

        # validate every epoch (reference val_interval = 1)
        val_losses = []
        acc_sums = None
        extras = {'omegas': omegas} if model_type == 'performer' else {}
        for batch in val_dset.batches(batch_size, shuffle=False):
            batch = neutralize_pad_rows(batch, eff_batch_size, vocab.pad_id)
            batch = shard_batch(mesh, {k: v for k, v in batch.items()
                                       if k != 'length'})
            loss, aux = eval_step(state.params, batch, extras)
            val_losses.append(float(loss))
            aux = {k: float(v) for k, v in aux.items()}
            acc_sums = aux if acc_sums is None else \
                {k: acc_sums[k] + aux[k] for k in aux}
        acc = finalize_accuracy(acc_sums)
        write_valloss_line(os.path.join(ckpt_dir, 'valloss.txt'), ep + 1,
                           recons_loss, float(np.mean(val_losses)),
                           float(np.std(val_losses)), acc)

        logger.log(ep + 1, train_steps, recons_loss, time.time() - t0)

    return {'loss': recons_loss, 'steps': train_steps, 'ckpt_dir': ckpt_dir}
