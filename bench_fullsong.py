"""Measured ONE-STAGE (full_song REMI-baseline) serving throughput.

The reference's one-stage mode generates complete songs (melody + chords +
velocity + tempo) directly from ``Emotion_Q*`` via the stage-1 code path
with ``max_dec_len=2400`` (``stage1_compose/inference.py:133-137``).  This
measures that mode end-to-end on one chip: batched device decode at the
production event budget (whole-cache einsum attention — measured the faster
path at this cache size, `BENCH_s1_decode_r03.json`; tiered Kmax since
round 4) -> .mid rendering, wall-clock including host file IO, compile
excluded via one warmup.

Two lines: RANDOM weights (token mix worst-case: ~1.3 beat-rejects per
accepted token push most songs through the continuation tier) and TRAINED
weights (production-shape model trained to plateau on the synthetic
full-song corpus — the realistic serving mix; VERDICT r3 weak #4 asked for
this variant).

Prints one JSON line per variant.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))

MAX_EVENTS = 2400        # reference full_song budget
BATCH = 8
MAX_BARS = 128
TRAIN_STEPS = 150


def train_fullsong(model, vocab, events_dir, n_steps=TRAIN_STEPS):
    """Train the one-stage model to plateau on the synthetic corpus
    (bf16 compute / f32 master, the production recipe)."""
    from emo_disentanger_tpu.data.datasets import Stage1Dataset
    from emo_disentanger_tpu.train import (
        OptimizerConfig, make_optimizer, make_train_step, init_train_state,
        stage1_loss_fn)
    from emo_disentanger_tpu.train.train_stage1 import neutralize_pad_rows
    from emo_disentanger_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    dset = Stage1Dataset(events_dir, vocab, model_dec_seqlen=512)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    opt = make_optimizer(OptimizerConfig(max_lr=2e-4, min_lr=1e-5,
                                         warmup_steps=20,
                                         lr_decay_steps=n_steps))
    state = init_train_state(params, opt)
    step = make_train_step(stage1_loss_fn(model, vocab.pad_id), opt, mesh,
                           donate=False)
    rng = jax.random.PRNGKey(7)
    losses = []
    while len(losses) < n_steps:
        for batch in dset.batches(8, shuffle=True):
            batch = neutralize_pad_rows(batch, 8, vocab.pad_id)
            batch.pop('length', None)
            batch = shard_batch(mesh, batch)
            rng, sub = jax.random.split(rng)
            state, loss, _ = step(state, batch, sub, {})
            losses.append(float(loss))
            if len(losses) >= n_steps:
                break
    return state.params, {'loss_first': round(float(np.mean(losses[:5])), 3),
                          'loss_last': round(float(np.mean(losses[-5:])), 3)}


def measure(gen, vocab, out_root, tag, info=None, use_serve=False,
            n_jobs=None):
    """``use_serve``: stream ``n_jobs`` (default 2x BATCH) jobs through the
    B slots with refill-on-finish — full_song lengths vary wildly (38-508
    events in one B=8 wave, BENCH_fullsong_r03), the workload continuous
    batching exists for."""
    from emo_disentanger_tpu.infer.convert2midi import events_to_midi
    from emo_disentanger_tpu.infer.pipeline import roman_events_to_absolute

    n = (n_jobs or 2 * BATCH) if use_serve else BATCH
    emotions = (['Q1', 'Q2', 'Q3', 'Q4'] * ((n + 3) // 4))[:n]
    run = gen.serve if use_serve else gen.generate
    # warm with the SAME seed as the timed run so every ladder tier the
    # timed run spills into is already compiled
    run(emotions, seed=0)                            # warmup compile

    out_dir = os.path.join(out_root, 'gen_' + tag)
    os.makedirs(out_dir)
    t0 = time.perf_counter()
    songs, stats = run(emotions, seed=0)
    n_mid = 0
    for i, song in enumerate(songs):
        if not song:
            continue
        key = next((e for e in song if e.startswith('Key_')), 'Key_C')
        try:
            evs = roman_events_to_absolute(key, song)[1:]
            events_to_midi(key, evs, 'full_song',
                           output_midi_path=os.path.join(
                               out_dir, f'full_{i:02d}.mid'))
            n_mid += 1
        except Exception:
            pass                       # degenerate streams still count work
    secs = time.perf_counter() - t0

    detail = {
        'wall_seconds': round(secs, 2),
        'events': stats['events'],
        'rejects': stats['rejects'],
        'status': stats['status'],
        'resumed': stats['resumed'],
        'midi_files': n_mid,
    }
    if info:
        detail.update(info)
    policy = (f'{len(songs)} jobs / {BATCH} serve slots' if use_serve
              else f'B={BATCH} lockstep')
    print(json.dumps({
        'metric': f'one-stage full_song serving ({policy}, bf16 TXL, '
                  f'{MAX_EVENTS}-event budget, device sampling+rules, '
                  f'.mid render incl. file IO, {tag} weights, compile '
                  'excluded)',
        'value': round(60.0 * len(songs) / secs, 2),
        'unit': 'songs/min/chip',
        'detail': detail,
    }), flush=True)


def main():
    from helpers import write_fullsong_corpus
    from emo_disentanger_tpu.core.vocab import Vocab
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.utils.precision import cast_params

    tmp = tempfile.mkdtemp(prefix='bench_fullsong_')
    try:
        root = os.path.join(tmp, 'corpus')
        events_dir, vocab_path, _ = write_fullsong_corpus(root, n_pieces=8,
                                                          n_bars=8)
        vocab = Vocab.load(vocab_path)
        model = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                                 d_model=512, d_ff=2048, d_embed=512,
                                 dtype=jnp.bfloat16)

        def make_gen(params):
            # most full_song streams EOS far below the 2400-event budget
            # (38-508 events measured in BENCH_fullsong_r03), so the cache
            # ladder starts well under max_events; spills continue bitwise-
            # identically in the next tier
            return Stage1BatchGenerator(model, params, vocab, batch=BATCH,
                                        temp=1.1, top_p=0.99,
                                        max_events=MAX_EVENTS,
                                        max_bars=MAX_BARS, functional=True,
                                        tiers=[768, 1536])

        params = cast_params(model.init(jax.random.PRNGKey(0),
                                        jnp.ones((1, 8), jnp.int32)))
        measure(make_gen(params), vocab, tmp, 'random')

        tparams, info = train_fullsong(model, vocab, events_dir)
        tgen = make_gen(cast_params(tparams))
        measure(tgen, vocab, tmp, 'trained', info)
        # continuous batching on the SAME trained weights: full_song EOS
        # lengths vary most of any serving mode, so refill-on-finish is
        # at its strongest here
        measure(tgen, vocab, tmp, 'trained_serve', info, use_serve=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    main()
