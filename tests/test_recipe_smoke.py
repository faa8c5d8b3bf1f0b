"""Full-recipe smoke: the reference README's train-it-yourself flow
(``README.md:104-148``) — pretrain -> finetune (loading the pretrain
checkpoint) -> resume -> generate — run via the real CLIs in SEPARATE
PROCESSES on a larger-than-toy synthetic corpus, so checkpoint/resume is
exercised across process boundaries, not just within one interpreter.

Stage 2 (Performer): pretrain 2 epochs, finetune 1 epoch from the pretrain
params, resume 1 more epoch from the finetune checkpoint + optimizer state,
then batched generation from stage-1-style roman.txt lead sheets.
Stage 1 (TXL): pretrain -> finetune across processes.
"""

import json
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest
import yaml

from helpers import write_stage1_corpus, write_stage2_corpus

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_CACHE_DIR = None


def _run(args, cwd=REPO, timeout=600):
    global _CACHE_DIR
    if _CACHE_DIR is None:
        import tempfile
        _CACHE_DIR = tempfile.mkdtemp(prefix='jaxcache_recipe_')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    # SINGLE-device mesh: this smoke exercises the cross-process
    # checkpoint/resume chain, not sharding (test_training/test_tp_sharding
    # cover the 8-device paths); the virtual mesh multiplies compile time
    # on this container's one CPU
    env['XLA_FLAGS'] = ' '.join(
        f for f in env.get('XLA_FLAGS', '').split()
        if not f.startswith('--xla_force_host_platform_device_count'))
    # the image's sitecustomize registers the axon PJRT plugin at
    # interpreter start, so the env var alone does NOT keep a subprocess
    # off the TPU (see CLAUDE.md) — every leg must ALSO call
    # jax.config.update before touching jax.  Wrap -m/-c invocations in a
    # shim that does so.  (Without this the recipe trained its toys over
    # the TPU relay: slow and coupled to chip state.)
    force_cpu = "import jax; jax.config.update('jax_platforms', 'cpu')\n"
    if args[0] == '-m':
        shim = (force_cpu
                + "import sys, runpy\n"
                + f"sys.argv = [{args[1]!r}] + {args[2:]!r}\n"
                + f"runpy.run_module({args[1]!r}, run_name='__main__')\n")
        args = ['-c', shim]
    elif args[0] == '-c':
        args = ['-c', force_cpu + args[1]]
    # share compiled programs across the recipe's processes: every leg jits
    # the same train/eval steps, and the point here is the checkpoint chain,
    # not recompilation
    env['JAX_COMPILATION_CACHE_DIR'] = _CACHE_DIR
    env['JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS'] = '0'
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    proc = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f'{args}\nstdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}')
    return proc


def _split(tmp, names, tag):
    split_dir = os.path.join(tmp, f'splits_{tag}')
    os.makedirs(split_dir, exist_ok=True)
    n = max(1, len(names) - 2)
    tr, va = (os.path.join(split_dir, 'train.pkl'),
              os.path.join(split_dir, 'valid.pkl'))
    with open(tr, 'wb') as f:
        pickle.dump(names[:n], f)
    with open(va, 'wb') as f:
        pickle.dump(names[n:], f)
    return tr, va


def _stage2_cfg(tmp, tag, events_dir, vocab_path, tr, va, *,
                trained_params=None, trained_optim=None, num_epochs=2):
    cfg = {
        'data_loader': {
            'batch_size': 4,
            'data_path': events_dir.replace('functional', '{}'),
            'train_split': tr, 'val_split': va,
            'vocab_path': vocab_path.replace('functional', '{}'),
        },
        'model': {'d_embed': 32, 'd_ff': 64, 'd_model': 32,
                  'feature_map': {'n_dims': 16}, 'max_len': 256,
                  'n_head': 2, 'n_layer': 2, 'use_segemb': True,
                  'n_segment_types': 2},
        'training': {
            'gpuid': 0, 'ckpt_dir': os.path.join(tmp, f'ckpt_{tag}_{{}}'),
            'ckpt_interval': 1, 'log_interval': 1, 'lr': 1e-3,
            'lr_scheduler': {'T_max': 100, 'eta_min': 1e-5},
            'num_epochs': num_epochs, 'trained_optim': trained_optim,
            'trained_params': trained_params, 'inference_params': None,
            'warmup_steps': 2,
        },
    }
    path = os.path.join(tmp, f'{tag}.yaml')
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)
    return path


def _latest_ckpt(ckpt_dir):
    from emo_disentanger_tpu.train.checkpoint import latest_checkpoint
    path = latest_checkpoint(os.path.join(ckpt_dir, 'params'))
    assert path, f'no checkpoint under {ckpt_dir}'
    return path


def _ckpt_loss(path):
    m = re.search(r'ep\d+_loss([0-9.]+)', os.path.basename(path))
    return float(m.group(1).rstrip('.'))


@pytest.mark.slow
def test_stage2_recipe_pretrain_finetune_resume_generate(tmp_path):
    tmp = str(tmp_path)
    # "pretrain" corpus (pop1k7 role) and "finetune" corpus (emopia role)
    pre_dir, pre_vocab, pre_names = write_stage2_corpus(
        os.path.join(tmp, 'pre'), n_pieces=6, n_bars=4)
    tr, va = _split(tmp, pre_names, 'pre')
    cfg_pre = _stage2_cfg(tmp, 'pre', pre_dir, pre_vocab, tr, va,
                          num_epochs=2)
    _run(['-m', 'emo_disentanger_tpu.cli.train_stage2', '-m', 'performer',
          '-c', cfg_pre, '-r', 'functional'])
    pre_ckpt = _latest_ckpt(os.path.join(tmp, 'ckpt_pre_functional'))

    # finetune FROM the pretrain checkpoint, fresh process.  The finetune
    # corpus shares the pretrain vocabulary (the reference's events2words
    # builds one shared dictionary per representation).
    ft_dir, _, ft_names = write_stage2_corpus(
        os.path.join(tmp, 'ft'), n_pieces=5, n_bars=4)
    tr2, va2 = _split(tmp, ft_names, 'ft')
    cfg_ft = _stage2_cfg(tmp, 'ft', ft_dir, pre_vocab, tr2, va2,
                         trained_params=pre_ckpt, num_epochs=1)
    _run(['-m', 'emo_disentanger_tpu.cli.train_stage2', '-m', 'performer',
          '-c', cfg_ft, '-r', 'functional'])
    ft_ckpt = _latest_ckpt(os.path.join(tmp, 'ckpt_ft_functional'))

    # resume: params + optimizer state from the finetune checkpoint, third
    # process; loss must keep improving (or at least stay finite and the
    # checkpoint chain extend)
    cfg_res = _stage2_cfg(tmp, 'res', ft_dir, pre_vocab, tr2, va2,
                          trained_params=ft_ckpt, trained_optim=ft_ckpt,
                          num_epochs=1)
    _run(['-m', 'emo_disentanger_tpu.cli.train_stage2', '-m', 'performer',
          '-c', cfg_res, '-r', 'functional'])
    res_ckpt = _latest_ckpt(os.path.join(tmp, 'ckpt_res_functional'))
    assert np.isfinite(_ckpt_loss(res_ckpt))
    # training actually learned something across the chain
    assert _ckpt_loss(res_ckpt) < _ckpt_loss(pre_ckpt)

    # log/valloss artifacts exist for every leg (reference formats)
    for tag in ('pre', 'ft', 'res'):
        d = os.path.join(tmp, f'ckpt_{tag}_functional')
        assert os.path.exists(os.path.join(d, 'log.txt'))
        assert os.path.exists(os.path.join(d, 'valloss.txt'))

    # generate (4th process): stage-1-style roman lead sheets -> _full.mid
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
    code = (
        "from emo_disentanger_tpu.infer import run_stage2\n"
        f"s = run_stage2.run({cfg_res!r}, 'functional', 'performer',\n"
        f"    inference_params={res_ckpt!r}, output_dir={out_dir!r},\n"
        "    max_events=120, max_bars_override=2, batch_size=4, seed=0)\n"
        "assert s['pieces'] == 4, s\n")
    _run(['-c', code])
    mids = [f for f in os.listdir(out_dir) if f.endswith('_full.mid')]
    assert len(mids) == 4


@pytest.mark.slow
def test_stage1_recipe_pretrain_finetune(tmp_path):
    tmp = str(tmp_path)
    pre_dir, pre_vocab, pre_names = write_stage1_corpus(
        os.path.join(tmp, 'pre'), n_pieces=6, n_bars=4)
    tr, va = _split(tmp, pre_names, 'pre')

    def cfg(tag, num_epochs, pretrained=None):
        c = {
            'device': 'cpu', 'pretrained_optim_path': None,
            'pretrained_param_path': pretrained,
            'model': {'d_word_embed': 32, 'pre_lnorm': True,
                      'decoder': {'n_layer': 2, 'n_head': 2, 'd_model': 32,
                                  'd_ff': 64, 'dropout': 0.1, 'mem_len': 0,
                                  'tgt_len': 96}},
            'data': {'data_dir': pre_dir.replace('functional', '{}'),
                     'train_split': tr, 'val_split': va,
                     'vocab_path': pre_vocab.replace('functional', '{}'),
                     'batch_size': 4, 'max_n_seg': 1},
            'training': {'trained_steps': 0, 'trained_epochs': 0,
                         'warmup_steps': 2, 'lr_decay_steps': 100,
                         'max_lr': 1e-3, 'min_lr': 1e-4,
                         'max_epoch': num_epochs, 'val_interval': 1,
                         'log_interval': 1},
            'output': {'ckpt_dir': os.path.join(tmp, f'c1_{tag}_{{}}'),
                       'ckpt_interval': 1},
        }
        path = os.path.join(tmp, f's1_{tag}.yaml')
        with open(path, 'w') as f:
            yaml.safe_dump(c, f)
        return path

    _run(['-m', 'emo_disentanger_tpu.cli.train_stage1',
          '-c', cfg('pre', 2), '-r', 'functional'])
    pre_ckpt = _latest_ckpt(os.path.join(tmp, 'c1_pre_functional'))

    _run(['-m', 'emo_disentanger_tpu.cli.train_stage1',
          '-c', cfg('ft', 1, pretrained=pre_ckpt), '-r', 'functional'])
    ft_ckpt = _latest_ckpt(os.path.join(tmp, 'c1_ft_functional'))
    assert np.isfinite(_ckpt_loss(ft_ckpt))
    assert _ckpt_loss(ft_ckpt) < _ckpt_loss(pre_ckpt)
