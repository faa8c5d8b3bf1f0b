"""Measured ONE-STAGE (full_song REMI-baseline) serving throughput.

The reference's one-stage mode generates complete songs (melody + chords +
velocity + tempo) directly from ``Emotion_Q*`` via the stage-1 code path
with ``max_dec_len=2400`` (``stage1_compose/inference.py:133-137``).  This
measures that mode end-to-end on one chip: batched device decode at the
production event budget (whole-cache einsum attention — measured the faster
path at this cache size, `BENCH_s1_decode_r03.json`) -> .mid rendering,
wall-clock including host file IO, compile excluded via one warmup.

Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))

MAX_EVENTS = 2400        # reference full_song budget
BATCH = 8
MAX_BARS = 128


def main():
    from helpers import write_fullsong_corpus
    from emo_disentanger_tpu.core.vocab import Vocab
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.infer.convert2midi import events_to_midi
    from emo_disentanger_tpu.infer.pipeline import roman_events_to_absolute
    from emo_disentanger_tpu.utils.precision import cast_params

    tmp = tempfile.mkdtemp(prefix='bench_fullsong_')
    try:
        root = os.path.join(tmp, 'corpus')
        _, vocab_path, _ = write_fullsong_corpus(root, n_pieces=4)
        vocab = Vocab.load(vocab_path)
        model = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                                 d_model=512, d_ff=2048, d_embed=512,
                                 dtype=jnp.bfloat16)
        params = cast_params(model.init(jax.random.PRNGKey(0),
                                        jnp.ones((1, 8), jnp.int32)))
        gen = Stage1BatchGenerator(model, params, vocab, batch=BATCH,
                                   temp=1.1, top_p=0.99,
                                   max_events=MAX_EVENTS, max_bars=MAX_BARS,
                                   functional=True)
        emotions = (['Q1', 'Q2', 'Q3', 'Q4'] * ((BATCH + 3) // 4))[:BATCH]
        gen.generate(emotions, seed=10)                  # warmup compile

        out_dir = os.path.join(tmp, 'gen')
        os.makedirs(out_dir)
        t0 = time.perf_counter()
        songs, stats = gen.generate(emotions, seed=0)
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
                pass                       # random-weight degenerate streams
        secs = time.perf_counter() - t0

        print(json.dumps({
            'metric': f'one-stage full_song serving (B={BATCH} bf16 TXL, '
                      f'{MAX_EVENTS}-event budget, device sampling+rules, '
                      '.mid render incl. file IO, random weights, compile '
                      'excluded)',
            'value': round(60.0 * BATCH / secs, 2),
            'unit': 'songs/min/chip',
            'detail': {
                'wall_seconds': round(secs, 2),
                'events': stats['events'],
                'rejects': stats['rejects'],
                'status': stats['status'],
                'midi_files': n_mid,
            },
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == '__main__':
    main()
