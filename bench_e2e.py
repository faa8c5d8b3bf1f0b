"""Measured two-stage songs/min on one chip (the reference's end-to-end
contract: stage-1 lead sheets -> ``*_roman.txt`` -> stage-2 performances ->
``*_full.mid``, ``stage2_accompaniment/inference.py:422-485``) — wall-clock
over the WHOLE pipeline including the host-side txt/MIDI file IO, replacing
the previously derived figure with a measurement.

Configuration (stated in the metric): production-shape models (stage-1 12L
TXL, stage-2 12L Performer, 512d, bf16 weights), the shared synthetic-corpus
functional vocabulary (union of the stage-1 and stage-2 dictionaries, near
production size), stage-1 batched at B=8 (the full-attention decode path;
the round-1 AOT compile cap was lifted by ``full_decode_attention``),
stage-2 batched at B=16.  TWO variants are measured and printed (one JSON
line each): RANDOM weights (pipeline work identical, token mix synthetic)
and TRAINED weights (the production-shape models trained to loss plateau on
the synthetic corpus, so rejection-rule pressure reflects a coherent token
mix); both lines carry the observed rejection/skip rates (beat rejects plus
PAD / early-EOS skips, per emitted token).  Song profile mirrors
production: stage-1 runs to its 512-event budget; each lead sheet renders
two arousal quadrants; stage-2 songs run to ~3000 events (teacher-forced
bars re-injected on repeat up to 16 bars).  Compile time is excluded via one
same-shape warmup call (serving amortizes compilation).

Prints one JSON line: {"metric", "value" (songs/min/chip), "unit", "detail"}.
"""

import json
import os
import shutil
import sys
import tempfile
import time
from itertools import chain

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))

S1_EVENTS = 512
S2_EVENTS = 3000
S2_BARS = 16
S1_BATCH = 8     # full-attention decode path compiles at B>=8 (round 2 fix)
S2_BATCH = 64    # serving loop scales: 15.2k/19.4k/22.9k tok/s at B=16/32/64
N_FILES = 32     # stage-1 pieces; each renders 2 quadrants => 64 songs


def union_vocab(paths):
    """One shared stage-1+stage-2 dictionary (the reference builds one
    dictionary per representation across corpora, ``events2words.py``)."""
    import pickle
    from emo_disentanger_tpu.core.vocab import Vocab
    events = set()
    for p in paths:
        with open(p, 'rb') as f:
            e2w, _ = pickle.load(f)
        events.update(e2w)
    evs = sorted(events)
    return Vocab({e: i for i, e in enumerate(evs)},
                 {i: e for i, e in enumerate(evs)})


def train_production(vocab, s1_events_dir, s2_events_dir, *,
                     s1_steps=150, s2_steps=250):
    """Train the production-shape models on the synthetic corpus to loss
    plateau (bf16 compute / f32 masters, the measured recipe) so songs/min
    can be reported under a realistic sampled-token mix, not random logits.

    Returns (params1_f32, params2_f32, omegas, info)."""
    from emo_disentanger_tpu.data.datasets import Stage1Dataset, Stage2Dataset
    from emo_disentanger_tpu.models import PlainTransformer, MusicPerformer
    from emo_disentanger_tpu.train import (
        OptimizerConfig, make_optimizer, make_train_step, init_train_state,
        stage1_loss_fn, stage2_performer_loss_fn)
    from emo_disentanger_tpu.train.train_stage1 import neutralize_pad_rows
    from emo_disentanger_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    info = {}

    def run(model, dset, loss_fn, extras, batch_size, n_steps, init_args):
        params = model.init(*init_args)
        opt = make_optimizer(OptimizerConfig(max_lr=2e-4, min_lr=1e-5,
                                             warmup_steps=20,
                                             lr_decay_steps=n_steps))
        state = init_train_state(params, opt)
        step = make_train_step(loss_fn, opt, mesh, donate=False)
        rng = jax.random.PRNGKey(7)
        losses = []
        while len(losses) < n_steps:
            for batch in dset.batches(batch_size, shuffle=True):
                batch = neutralize_pad_rows(batch, batch_size, vocab.pad_id)
                batch.pop('length', None)
                batch = shard_batch(mesh, batch)
                rng, sub = jax.random.split(rng)
                state, loss, _ = step(state, batch, sub, extras)
                losses.append(float(loss))
                if len(losses) >= n_steps:
                    break
        return state.params, losses

    s1 = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                          d_model=512, d_ff=2048, d_embed=512, dropout=0.1,
                          dtype=jnp.bfloat16)
    d1 = Stage1Dataset(s1_events_dir, vocab, model_dec_seqlen=192)
    p1, l1 = run(s1, d1, stage1_loss_fn(s1, vocab.pad_id), {}, 8, s1_steps,
                 (jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)))
    info['s1_loss_first'] = round(float(np.mean(l1[:5])), 3)
    info['s1_loss_last'] = round(float(np.mean(l1[-5:])), 3)

    s2 = MusicPerformer(n_token=vocab.size, n_layer=12, n_head=8, d_model=512,
                        d_ff=2048, d_embed=512, dropout=0.1, favor_dims=128,
                        dtype=jnp.bfloat16)
    omegas = s2.draw_omegas(jax.random.PRNGKey(1))
    d2 = Stage2Dataset(s2_events_dir, vocab, model_dec_seqlen=512)
    p2, l2 = run(s2, d2, stage2_performer_loss_fn(s2, vocab.pad_id),
                 {'omegas': omegas}, 8, s2_steps,
                 (jax.random.PRNGKey(2), jnp.ones((1, 8), jnp.int32), omegas,
                  jnp.zeros((1, 8), jnp.int32)))
    info['s2_loss_first'] = round(float(np.mean(l2[:5])), 3)
    info['s2_loss_last'] = round(float(np.mean(l2[-5:])), 3)
    return p1, p2, omegas, info


def build_models(vocab):
    from emo_disentanger_tpu.models import PlainTransformer, MusicPerformer
    from emo_disentanger_tpu.utils.precision import cast_params
    s1 = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                          d_model=512, d_ff=2048, d_embed=512,
                          dtype=jnp.bfloat16)
    p1 = cast_params(s1.init(jax.random.PRNGKey(0),
                             jnp.ones((1, 8), jnp.int32)))
    s2 = MusicPerformer(n_token=vocab.size, n_layer=12, n_head=8, d_model=512,
                        d_ff=2048, d_embed=512, favor_dims=128,
                        dtype=jnp.bfloat16)
    omegas = s2.draw_omegas(jax.random.PRNGKey(1))
    p2 = cast_params(s2.init(jax.random.PRNGKey(2),
                             jnp.ones((1, 8), jnp.int32), omegas,
                             jnp.zeros((1, 8), jnp.int32)))
    return s1, p1, s2, p2, omegas


def stage1_to_files(gen1, vocab, out_dir, seed, n_files=None, s1_batch=None,
                    use_serve=False):
    """Batched stage-1 -> *_roman.txt files (run_stage1 contract: the
    emotion token is dropped; key must lead the stream).

    ``use_serve``: stream ALL n_files jobs through gen1's B slots with
    refill-on-finish (per-element-clock decode) instead of lockstep
    waves of s1_batch."""
    from emo_disentanger_tpu.infer.pipeline import events_to_txt
    n_files = N_FILES if n_files is None else n_files
    s1_batch = S1_BATCH if s1_batch is None else s1_batch
    os.makedirs(out_dir, exist_ok=True)
    fallback = ['Key_C'] + ['Bar_None', 'Beat_0', 'Chord_I_M',
                            'Note_Octave_5', 'Note_Degree_I',
                            'Note_Duration_480'] * 2
    files = []
    n_s1_tokens = 0
    n_s1_rejects = 0
    # stage-1 conditions on VALENCE tokens (Emotion_Positive/Negative,
    # reference inference.py:128-131); quadrants only appear at stage 2
    all_emotions = [('Positive' if i % 2 == 0 else 'Negative')
                    for i in range(n_files)]
    if use_serve:
        waves = [(0, all_emotions)]
    else:
        waves = [(g0, all_emotions[g0:g0 + s1_batch])
                 for g0 in range(0, n_files, s1_batch)]
    for g0, emotions in waves:
        if use_serve:
            songs, stats = gen1.serve(emotions, seed=seed + g0,
                                      target_bars=128)
        else:
            songs, stats = gen1.generate(emotions, seed=seed + g0,
                                         target_bars=128)
        n_s1_tokens += sum(stats['events'])
        n_s1_rejects += sum(stats['rejects'])
        for i, song in enumerate(songs):
            idx = g0 + i
            valence = emotions[i]
            # run_stage1 contract: strip Emotion, ensure a leading Key
            evs = (song or [])[1:]
            if not evs or not evs[0].startswith('Key_') \
                    or 'Bar_None' not in evs:
                key = next((e for e in (evs or []) if e.startswith('Key_')),
                           'Key_C')
                evs = [key] + [e for e in fallback[1:]]
            path = os.path.join(out_dir,
                                f'samp_{idx:02d}_{valence}_roman.txt')
            events_to_txt(evs, path)
            files.append(path)
    return files, n_s1_tokens, n_s1_rejects


def stage2_render(gen2, vocab, files, out_dir, seed, s2_batch=None,
                  s2_bars=None, use_serve=False, vary_bars=False,
                  write_txt=False):
    """Batched stage-2 over (file x quadrant) jobs -> *_full.mid.

    ``use_serve``: continuous batching — all jobs stream through ``gen2``'s
    (smaller) slot count via ``serve()`` refill instead of one lockstep
    wave sized to the job count.

    ``vary_bars``: heterogeneous job lengths — job i targets one of
    {1/3, 2/3, 1} x ``s2_bars`` bars (cycling).  Real serving mixes files
    of very different lengths (the reference globs arbitrary
    ``*roman.txt``); homogeneous budgets are the best case for lockstep
    (nothing for refill to exploit) so the serve-vs-lockstep comparison
    runs BOTH policies on this varied mix."""
    s2_batch = S2_BATCH if s2_batch is None else s2_batch
    s2_bars = S2_BARS if s2_bars is None else s2_bars
    from emo_disentanger_tpu.infer.pipeline import (
        emotion_candidates_for_file, extract_midi_events_from_generation,
        read_generated_events)
    from emo_disentanger_tpu.infer.convert2midi import events_to_midi
    jobs = []
    for fi, path in enumerate(files):
        key, lead_bars = read_generated_events(path, vocab.event2idx)
        # random-weight stage-1 bars can be arbitrarily long; clip to the
        # generator's bar budget (production lead-sheet bars are ~6-30
        # tokens, so this only fires on degenerate synthetic streams)
        lead_bars = [bar[:250] for bar in lead_bars]
        nb = s2_bars
        if vary_bars:
            nb = max(1, s2_bars * (1 + fi % 3) // 3)
        # repeat bars up to the target bar count so stage-2 songs run to
        # their full event profile
        bars = (lead_bars * ((nb // max(len(lead_bars), 1)) + 1))[:nb]
        for emo in emotion_candidates_for_file(path):
            primer = [vocab.event2idx[f'Emotion_{emo}'],
                      vocab.event2idx[key], vocab.event2idx['Tempo_110']]
            jobs.append((path, emo, key, primer, bars))
    if use_serve:
        # continuous batching: the job queue may exceed the slot count —
        # finished slots are re-armed from the queue instead of waiting for
        # the wave's longest song
        streams, stats = gen2.serve([j[3] for j in jobs],
                                    [j[4] for j in jobs], seed=seed)
        n_events = sum(stats['events'])
        n_rejects = sum(stats['rejects'])
    else:
        # lockstep waves of s2_batch; a short tail wave pads by repeating
        # its first job (wave wall time is max over slots, so dummy slots
        # cost nothing extra; their streams/stats are dropped)
        streams = []
        n_events = 0
        n_rejects = 0
        for w0 in range(0, len(jobs), s2_batch):
            wave = list(jobs[w0:w0 + s2_batch])
            realn = len(wave)
            wave.extend([wave[0]] * (s2_batch - realn))
            st, wstats = gen2.generate([j[3] for j in wave],
                                       [j[4] for j in wave], seed=seed + w0)
            streams.extend(st[:realn])
            n_events += sum(wstats['events'][:realn])
            n_rejects += sum(wstats['rejects'][:realn])
    for (path, emo, key, _, _), toks in zip(jobs, streams):
        gen_events = vocab.decode(toks)
        if write_txt:
            # full generation event stream per (file, quadrant) — the
            # input of cli/evaluate.py's objective metrics (EVAL artifact)
            from emo_disentanger_tpu.infer.pipeline import events_to_txt
            events_to_txt(gen_events,
                          path.replace('_roman.txt', f'_{emo}_full.txt'))
        try:
            bars = extract_midi_events_from_generation(key, gen_events,
                                                       relative_melody=True)
            midi_path = path.replace('_roman.txt', f'_{emo}_full.mid')
            events_to_midi(key, list(chain(*bars)), 'full',
                           output_midi_path=midi_path)
        except Exception:
            # random-weight streams can be structurally degenerate; the
            # decode/render work is still counted
            pass
    return n_events, n_rejects, len(jobs)


def measure(gen1, gen2, vocab, root, tag, n_files=None, s1_batch=None,
            s2_batch=None, s2_bars=None, use_serve=False, warm_files=None,
            vary_bars=False, s1_serve=False):
    """Warmup-compile then measure the full pipeline including file IO.

    ``warm_files``: number of stage-1 pieces for the warmup pass (defaults
    to ``n_files``).  A serve-mode warmup must queue MORE jobs than slots
    (``> s2_batch/2`` files) so the slot-refill ``_reset`` path compiles
    during warmup, not inside the measured run."""
    n_files = N_FILES if n_files is None else n_files
    s2_batch = S2_BATCH if s2_batch is None else s2_batch
    warm_files = n_files if warm_files is None else warm_files
    if use_serve:
        assert 2 * warm_files > s2_batch, \
            'serve warmup needs jobs > slots to compile the refill path'
    warm_dir = os.path.join(root, 'warm_' + tag)
    # warmup reuses the measured pass's seeds: the stage-1 tiered-Kmax
    # ladder compiles continuation tiers lazily on first spill, so an
    # identical-seed warmup guarantees the timed pass never pays a
    # tier compile (shared-prefix batches are bitwise the same runs)
    files, _, _ = stage1_to_files(gen1, vocab, warm_dir, seed=0,
                                  n_files=warm_files, s1_batch=s1_batch,
                                  use_serve=s1_serve)
    stage2_render(gen2, vocab, files[:warm_files], warm_dir, seed=1,
                  s2_batch=s2_batch, s2_bars=s2_bars, use_serve=use_serve,
                  vary_bars=vary_bars)

    out_dir = os.path.join(root, 'gen_' + tag)
    t0 = time.perf_counter()
    files, s1_tokens, s1_rej = stage1_to_files(gen1, vocab, out_dir, seed=0,
                                               n_files=n_files,
                                               s1_batch=s1_batch,
                                               use_serve=s1_serve)
    s2_tokens, s2_rej, n_songs = stage2_render(
        gen2, vocab, files, out_dir, seed=1, s2_batch=s2_batch,
        s2_bars=s2_bars, use_serve=use_serve, vary_bars=vary_bars)
    secs = time.perf_counter() - t0
    mids = [f for f in os.listdir(out_dir) if f.endswith('_full.mid')]
    return {
        'value': round(60.0 * n_songs / secs, 2),
        'detail': {
            'wall_seconds': round(secs, 2),
            'songs': n_songs,
            'stage1_tokens': int(s1_tokens),
            'stage2_tokens': int(s2_tokens),
            # rejection/skip pressure per emitted token: stage-1 counts
            # beat/key/PAD rejects; stage-2 counts beat rejects + PAD +
            # early-EOS skips (the loop iterations that emitted nothing)
            'stage1_reject_rate': round(s1_rej / max(s1_tokens, 1), 4),
            'stage2_reject_rate': round(s2_rej / max(s2_tokens, 1), 4),
            'midi_files': len(mids),
        },
    }


def quick_random(n_files=16, s1_batch=8, s2_batch=32, s2_events=S2_EVENTS,
                 s2_bars=S2_BARS, s1_events=S1_EVENTS, use_serve=False):
    """Time-boxed variant for the driver's bench.py budget: RANDOM weights
    only (the trained variant needs in-process training — builder-run in
    BENCH_e2e artifacts), one warmup + one measured pipeline pass at
    stage-1 B=8 / stage-2 B=32.  Returns a plain dict (no printing).

    Lockstep, not ``serve()``: under RANDOM weights every stage-2 song
    runs to the same bar budget (no EOS), so there is no length variance
    for refill to exploit and continuous batching is pure host-round-trip
    overhead through the relay (measured round 4: 169 vs 277 songs/min).
    ``serve()`` pays off only where song lengths vary — the trained-weights
    legs in ``main()`` measure that comparison."""
    from helpers import write_stage1_corpus, write_stage2_corpus
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator

    tmp = tempfile.mkdtemp(prefix='bench_e2e_quick_')
    try:
        _, s1_vocab, _ = write_stage1_corpus(
            os.path.join(tmp, 'corpus1'), n_pieces=4, n_bars=4)
        _, s2_vocab, _ = write_stage2_corpus(
            os.path.join(tmp, 'corpus2'), n_pieces=4, n_bars=4)
        vocab = union_vocab([s1_vocab, s2_vocab])
        s1, p1, s2, p2, omegas = build_models(vocab)
        gen1 = Stage1BatchGenerator(s1, p1, vocab, batch=s1_batch,
                                    temp=1.2, top_p=0.97,
                                    max_events=s1_events, max_bars=128)
        gen2 = Stage2BatchGenerator(s2, p2, vocab, batch=s2_batch,
                                    temp=1.1, top_p=0.99,
                                    max_events=s2_events,
                                    max_bar_tokens=256, max_bars=s2_bars,
                                    omegas=omegas)
        res = measure(gen1, gen2, vocab, tmp, 'rand', n_files=n_files,
                      s1_batch=s1_batch, s2_batch=s2_batch, s2_bars=s2_bars,
                      use_serve=use_serve)
        return {'songs_per_min': res['value'], 'detail': res['detail'],
                'config': {'s1_batch': s1_batch, 's2_batch': s2_batch,
                           'weights': 'random', 'serve': use_serve,
                           's1_events': s1_events, 's2_events': s2_events}}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from helpers import write_stage1_corpus, write_stage2_corpus
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator
    from emo_disentanger_tpu.utils.precision import cast_params

    tmp = tempfile.mkdtemp(prefix='bench_e2e_')
    try:
        s1_dir, s1_vocab, _ = write_stage1_corpus(
            os.path.join(tmp, 'corpus1'), n_pieces=24, n_bars=8)
        s2_dir, s2_vocab, _ = write_stage2_corpus(
            os.path.join(tmp, 'corpus2'), n_pieces=24, n_bars=8)
        vocab = union_vocab([s1_vocab, s2_vocab])

        def make_gens(p1, p2, omegas):
            g1 = Stage1BatchGenerator(_S1, p1, vocab, batch=S1_BATCH,
                                      temp=1.2, top_p=0.97,
                                      max_events=S1_EVENTS, max_bars=128)
            g2 = Stage2BatchGenerator(_S2, p2, vocab, batch=S2_BATCH,
                                      temp=1.1, top_p=0.99,
                                      max_events=S2_EVENTS,
                                      max_bar_tokens=256, max_bars=S2_BARS,
                                      omegas=omegas)
            return g1, g2

        _S1, p1, _S2, p2, omegas = build_models(vocab)
        gen1, gen2 = make_gens(p1, p2, omegas)
        res = measure(gen1, gen2, vocab, tmp, 'rand')
        print(json.dumps({
            'metric': 'two-stage songs/min MEASURED end-to-end (stage-1 '
                      f'B={S1_BATCH} TXL {S1_EVENTS}ev -> roman.txt -> '
                      f'stage-2 B={S2_BATCH} Performer ~{S2_EVENTS}ev -> '
                      '.mid, bf16, RANDOM weights, compile excluded via '
                      'warmup)',
            'value': res['value'], 'unit': 'songs/min/chip',
            'detail': res['detail'],
        }))

        # trained-weights variant: same pipeline, same shapes, token mix and
        # rejection pressure now come from models trained to plateau on the
        # synthetic corpus (VERDICT r2 weak #5)
        tp1, tp2, tomegas, info = train_production(vocab, s1_dir, s2_dir)
        gen1t, gen2t = make_gens(cast_params(tp1), cast_params(tp2), tomegas)
        res = measure(gen1t, gen2t, vocab, tmp, 'trained')
        res['detail'].update(info)
        print(json.dumps({
            'metric': 'two-stage songs/min MEASURED end-to-end (same config, '
                      'TRAINED weights: synthetic-corpus recipe to plateau, '
                      'bf16 serving cast)',
            'value': res['value'], 'unit': 'songs/min/chip',
            'detail': res['detail'],
        }))

        # continuous-batching comparison (VERDICT r3 weak #3): real serving
        # mixes files of very different lengths (the reference globs
        # arbitrary *roman.txt); homogeneous budgets are lockstep's best
        # case (every slot finishes together — measured round 4: serve 423
        # vs lockstep 476 on the uniform mix above).  So the comparison
        # runs BOTH policies on the SAME heterogeneous mix: job i targets
        # {1/3, 2/3, 1} x 16 bars.  Lockstep pays max(len) per wave; serve
        # refills finished slots from the queue (one masked dispatch per
        # harvest, serve_chunk_steps floor).
        for tag, srv in [('vary_lock', False), ('vary_serve', True)]:
            # the serve leg streams BOTH stages: stage-1 files through the
            # B=8 slots (per-element clocks) and stage-2 jobs through the
            # 64 slots
            res = measure(gen1t, gen2t, vocab, tmp, tag, n_files=48,
                          warm_files=N_FILES + 2, use_serve=srv,
                          vary_bars=True, s1_serve=srv)
            res['detail']['slots'] = S2_BATCH
            policy = ('CONTINUOUS BATCHING: 96 jobs streamed through '
                      f'{S2_BATCH} slots with refill-on-finish'
                      if srv else f'LOCKSTEP waves of {S2_BATCH}')
            print(json.dumps({
                'metric': 'two-stage songs/min MEASURED end-to-end '
                          '(TRAINED weights, HETEROGENEOUS mix: '
                          'per-job bar targets 1/3..1 x 16 bars; '
                          + policy + ')',
                'value': res['value'], 'unit': 'songs/min/chip',
                'detail': res['detail'],
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    main()
