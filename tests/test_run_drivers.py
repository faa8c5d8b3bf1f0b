"""Driver-level inference tests: run_stage1/run_stage2 end-to-end with tiny
models and synthetic corpora (config YAML -> ckpt -> txt/mid artifacts)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from helpers import write_stage2_corpus
from emo_disentanger_tpu.core.vocab import Vocab
from emo_disentanger_tpu.train.checkpoint import save_checkpoint


def _write_stage2_config(tmp, events_dir, vocab_path):
    cfg = {
        'data_loader': {
            'batch_size': 2,
            'data_path': events_dir.replace('functional', '{}'),
            'train_split': os.path.join(tmp, 'nope_train.pkl'),
            'val_split': os.path.join(tmp, 'nope_val.pkl'),
            'vocab_path': vocab_path.replace('functional', '{}'),
        },
        'model': {
            'd_embed': 32, 'd_ff': 64, 'd_model': 32,
            'feature_map': {'n_dims': 16}, 'max_len': 256,
            'n_head': 2, 'n_layer': 2, 'use_segemb': True,
            'n_segment_types': 2,
        },
        'training': {
            'gpuid': 0, 'ckpt_dir': os.path.join(tmp, 'ckpt_{}'),
            'ckpt_interval': 1, 'log_interval': 1, 'lr': 1e-4,
            'lr_scheduler': {'T_max': 100, 'eta_min': 1e-5},
            'num_epochs': 1, 'trained_optim': None, 'trained_params': None,
            'inference_params': None, 'warmup_steps': 2,
        },
    }
    path = os.path.join(tmp, 's2.yaml')
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


def test_run_stage2_batched_driver(tmp_path):
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_stage2_corpus(root, n_pieces=3)
    cfg_path = _write_stage2_config(tmp, events_dir, vocab_path)
    vocab = Vocab.load(vocab_path)

    # save a random-weight performer checkpoint the driver can load
    from emo_disentanger_tpu.train.train_stage2 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    config = load_yaml(cfg_path)
    model, params, omegas = build_model_and_params(config, vocab, 'performer')
    ckpt = save_checkpoint(os.path.join(tmp, 'weights'), 1, 9.999, params)

    # stage-1 style roman txt files in the output dir
    out_dir = os.path.join(tmp, 'gen')
    os.makedirs(out_dir)
    lead = ['Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480',
            'Bar_None', 'Beat_0', 'Chord_V_7', 'Note_Octave_5',
            'Note_Degree_V', 'Note_Duration_480']
    for i, emo in enumerate(['Positive', 'Negative']):
        with open(os.path.join(out_dir, f'samp_{i:02d}_{emo}_roman.txt'), 'w') as f:
            f.write('\n'.join(lead) + '\n')

    from emo_disentanger_tpu.infer import run_stage2
    summary = run_stage2.run(
        cfg_path, 'functional', 'performer',
        inference_params=ckpt, output_dir=out_dir,
        max_events=120, max_bars_override=2, batch_size=4, seed=0)

    # Positive -> Q1+Q4, Negative -> Q2+Q3: four renders
    assert summary['pieces'] == 4
    mids = sorted(f for f in os.listdir(out_dir) if f.endswith('_full.mid'))
    assert len(mids) == 4
    from emo_disentanger_tpu.data.midi_io import MidiFile
    for m in mids:
        MidiFile.parse(os.path.join(out_dir, m))

    # idempotent re-run: everything skipped
    summary2 = run_stage2.run(
        cfg_path, 'functional', 'performer',
        inference_params=ckpt, output_dir=out_dir,
        max_events=120, max_bars_override=2, batch_size=4, seed=0)
    assert summary2['pieces'] == 0


def test_run_stage1_driver_batched(tmp_path):
    """run_stage1 with --batch on a tiny model/corpus produces mid/txt/roman
    artifacts (or cleanly reports stuck songs)."""
    import yaml
    from helpers import write_stage1_corpus
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_stage1_corpus(root, n_pieces=4)
    cfg = {
        'device': 'cpu', 'pretrained_optim_path': None,
        'pretrained_param_path': None,
        'model': {'d_word_embed': 32, 'pre_lnorm': True,
                  'decoder': {'n_layer': 2, 'n_head': 2, 'd_model': 32,
                              'd_ff': 64, 'dropout': 0.0, 'mem_len': 0,
                              'tgt_len': 64}},
        'data': {'data_dir': events_dir.replace('functional', '{}'),
                 'train_split': 'x', 'val_split': 'x',
                 'vocab_path': vocab_path.replace('functional', '{}'),
                 'batch_size': 2, 'max_n_seg': 1},
        'training': {'trained_steps': 0, 'trained_epochs': 0,
                     'warmup_steps': 2, 'lr_decay_steps': 10,
                     'max_lr': 1e-4, 'min_lr': 1e-5, 'max_epoch': 1,
                     'val_interval': 1, 'log_interval': 1},
        'output': {'ckpt_dir': os.path.join(tmp, 'c_{}'), 'ckpt_interval': 1},
    }
    cfg_path = os.path.join(tmp, 's1.yaml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    vocab = Vocab.load(vocab_path)
    from emo_disentanger_tpu.train.train_stage1 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    model, params = build_model_and_params(load_yaml(cfg_path), vocab)
    ckpt = save_checkpoint(os.path.join(tmp, 'w'), 1, 9.9, params)

    out_dir = os.path.join(tmp, 'gen')
    from emo_disentanger_tpu.infer import run_stage1
    summary = run_stage1.run(
        cfg_path, 'functional', 'lead_sheet', inference_params=ckpt,
        output_dir=out_dir, n_groups=2, seed=0,
        max_events_override=48, max_bars_override=2, batch_size=4)
    produced = os.listdir(out_dir)
    if summary['pieces'] > 0:
        assert any(f.endswith('.mid') for f in produced)
        assert any(f.endswith('_roman.txt') for f in produced)


def test_run_stage1_fullsong_mode(tmp_path):
    """One-stage REMI-baseline path: mode=full_song, Q1..Q4 emotions,
    velocity+tempo events rendered to MIDI."""
    import yaml
    from helpers import write_fullsong_corpus
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_fullsong_corpus(root, n_pieces=4)
    cfg = {
        'device': 'cpu', 'pretrained_optim_path': None,
        'pretrained_param_path': None,
        'model': {'d_word_embed': 32, 'pre_lnorm': True,
                  'decoder': {'n_layer': 2, 'n_head': 2, 'd_model': 32,
                              'd_ff': 64, 'dropout': 0.0, 'mem_len': 0,
                              'tgt_len': 96}},
        'data': {'data_dir': events_dir.replace('functional', '{}'),
                 'train_split': 'x', 'val_split': 'x',
                 'vocab_path': vocab_path.replace('functional', '{}'),
                 'batch_size': 2, 'max_n_seg': 1},
        'training': {'trained_steps': 0, 'trained_epochs': 0,
                     'warmup_steps': 2, 'lr_decay_steps': 10,
                     'max_lr': 1e-4, 'min_lr': 1e-5, 'max_epoch': 1,
                     'val_interval': 1, 'log_interval': 1},
        'output': {'ckpt_dir': os.path.join(tmp, 'c_{}'), 'ckpt_interval': 1},
    }
    cfg_path = os.path.join(tmp, 'full.yaml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)

    vocab = Vocab.load(vocab_path)
    from emo_disentanger_tpu.train.train_stage1 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    model, params = build_model_and_params(load_yaml(cfg_path), vocab)
    ckpt = save_checkpoint(os.path.join(tmp, 'w'), 1, 9.9, params)

    out_dir = os.path.join(tmp, 'gen')
    from emo_disentanger_tpu.infer import run_stage1
    summary = run_stage1.run(
        cfg_path, 'functional', 'full_song', inference_params=ckpt,
        output_dir=out_dir, n_groups=1, seed=1,
        max_events_override=48, max_bars_override=2, batch_size=4)
    produced = os.listdir(out_dir)
    # Q1..Q4 outputs attempted; any that completed have mid+txt
    if summary['pieces'] > 0:
        assert any(f.endswith('.mid') for f in produced)
        mids = [f for f in produced if f.endswith('.mid')]
        from emo_disentanger_tpu.data.midi_io import MidiFile
        MidiFile.parse(os.path.join(out_dir, mids[0]))


def test_run_stage2_serve_driver(tmp_path):
    """run_stage2 with serve=True (continuous batching through --batch
    slots) renders every (file, quadrant) job, including a queue larger
    than the slot count."""
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_stage2_corpus(root, n_pieces=3)
    cfg_path = _write_stage2_config(tmp, events_dir, vocab_path)
    vocab = Vocab.load(vocab_path)

    from emo_disentanger_tpu.train.train_stage2 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    config = load_yaml(cfg_path)
    model, params, omegas = build_model_and_params(config, vocab, 'performer')
    ckpt = save_checkpoint(os.path.join(tmp, 'weights'), 1, 9.999, params)

    out_dir = os.path.join(tmp, 'gen')
    os.makedirs(out_dir)
    lead = ['Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480',
            'Bar_None', 'Beat_0', 'Chord_V_7', 'Note_Octave_5',
            'Note_Degree_V', 'Note_Duration_480']
    # 3 files x 2 quadrants = 6 jobs through 2 serve slots
    for i, emo in enumerate(['Positive', 'Negative', 'Positive']):
        with open(os.path.join(out_dir,
                               f'samp_{i:02d}_{emo}_roman.txt'), 'w') as f:
            f.write('\n'.join(lead) + '\n')

    from emo_disentanger_tpu.infer import run_stage2
    summary = run_stage2.run(
        cfg_path, 'functional', 'performer',
        inference_params=ckpt, output_dir=out_dir,
        max_events=120, max_bars_override=2, batch_size=2, seed=0,
        serve=True)
    assert summary['pieces'] == 6
    mids = sorted(f for f in os.listdir(out_dir) if f.endswith('_full.mid'))
    assert len(mids) == 6
    from emo_disentanger_tpu.data.midi_io import MidiFile
    for m in mids:
        MidiFile.parse(os.path.join(out_dir, m))


def test_run_stage1_serve_driver(tmp_path):
    """run_stage1 serve mode: all (group, emotion) jobs stream through
    batch_size slots; outputs match the driver's lockstep artifact set."""
    from helpers import write_stage1_corpus
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_stage1_corpus(root, n_pieces=3)
    cfg = {
        'device': 'cpu', 'pretrained_optim_path': None,
        'pretrained_param_path': None,
        'model': {'d_word_embed': 32, 'pre_lnorm': True,
                  'decoder': {'n_layer': 2, 'n_head': 2, 'd_model': 32,
                              'd_ff': 64, 'dropout': 0.0, 'mem_len': 0,
                              'tgt_len': 64}},
        'data': {'data_dir': events_dir.replace('functional', '{}'),
                 'train_split': 'x', 'val_split': 'x',
                 'vocab_path': vocab_path.replace('functional', '{}'),
                 'batch_size': 2, 'max_n_seg': 1},
        'training': {'trained_steps': 0, 'trained_epochs': 0,
                     'warmup_steps': 2, 'lr_decay_steps': 10,
                     'max_lr': 1e-4, 'min_lr': 1e-5, 'max_epoch': 1,
                     'val_interval': 1, 'log_interval': 1},
        'output': {'ckpt_dir': os.path.join(tmp, 'c_{}'),
                   'ckpt_interval': 1},
    }
    cfg_path = os.path.join(tmp, 's1.yaml')
    with open(cfg_path, 'w') as f:
        yaml.safe_dump(cfg, f)
    vocab = Vocab.load(vocab_path)

    from emo_disentanger_tpu.train.train_stage1 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    config = load_yaml(cfg_path)
    model, params = build_model_and_params(config, vocab)
    ckpt = save_checkpoint(os.path.join(tmp, 'weights'), 1, 9.999, params)

    out_dir = os.path.join(tmp, 'gen')
    from emo_disentanger_tpu.infer import run_stage1
    summary = run_stage1.run(
        cfg_path, 'functional', 'lead_sheet',
        inference_params=ckpt, output_dir=out_dir, n_groups=2,
        seed=0, max_events_override=40, max_bars_override=2,
        batch_size=2, serve=True)
    # lead_sheet mode: 2 groups x Positive/Negative = 4 jobs via 2 slots
    assert summary['pieces'] >= 1
    romans = [f for f in os.listdir(out_dir) if f.endswith('roman.txt')]
    assert len(romans) >= 1


def test_run_stage2_batched_gpt2_driver(tmp_path):
    """run_stage2 with the GPT-2 backbone in batched mode: the cache/window
    sizes are caller-configurable (the reference hard-codes 2048,
    ``stage2_accompaniment/inference.py:250-257``) so the batched path is
    drivable at test shapes; renders parse as SMF."""
    tmp = str(tmp_path)
    root = os.path.join(tmp, 'corpus')
    events_dir, vocab_path, names = write_stage2_corpus(root, n_pieces=3)
    cfg_path = _write_stage2_config(tmp, events_dir, vocab_path)
    vocab = Vocab.load(vocab_path)

    from emo_disentanger_tpu.train.train_stage2 import build_model_and_params
    from emo_disentanger_tpu.utils.io import load_yaml
    config = load_yaml(cfg_path)
    model, params, omegas = build_model_and_params(config, vocab, 'gpt2')
    ckpt = save_checkpoint(os.path.join(tmp, 'weights'), 1, 9.999, params)

    out_dir = os.path.join(tmp, 'gen')
    os.makedirs(out_dir)
    lead = ['Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480',
            'Bar_None', 'Beat_0', 'Chord_V_7', 'Note_Octave_5',
            'Note_Degree_V', 'Note_Duration_480']
    for i, emo in enumerate(['Positive', 'Negative']):
        with open(os.path.join(out_dir, f'samp_{i:02d}_{emo}_roman.txt'),
                  'w') as f:
            f.write('\n'.join(lead) + '\n')

    from emo_disentanger_tpu.infer import run_stage2
    summary = run_stage2.run(
        cfg_path, 'functional', 'gpt2',
        inference_params=ckpt, output_dir=out_dir,
        max_events=120, max_bars_override=2, batch_size=4, seed=0,
        gpt2_cache_len=360, gpt2_window=96)
    assert summary['pieces'] == 4
    mids = sorted(f for f in os.listdir(out_dir) if f.endswith('_full.mid'))
    assert len(mids) == 4
    from emo_disentanger_tpu.data.midi_io import MidiFile
    for m in mids:
        MidiFile.parse(os.path.join(out_dir, m))
