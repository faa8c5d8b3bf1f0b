"""Diagnose the round-5 stage-1 serve anomaly (87 accepted tok/s measured
vs ~2.2k lockstep, chip_r05/s1_serve.out).

Runs the SAME job mix through (a) serve() continuous batching and
(b) lockstep generate(), printing the full stats dicts — seconds, chunks,
per-job events/rejects/status — plus a per-device-step attribution so the
slow factor (loop step cost vs job mix vs tail) is pinned instead of
estimated.  Chip use: ~3 compiles (serve init/chunk/refill) + the ladder
jits of generate.
"""

import json
import time

import jax
import jax.numpy as jnp

VOCAB = 330


def build():
    from emo_disentanger_tpu.core.vocab import Vocab
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.utils.precision import cast_params

    events = ['Emotion_Q1', 'Emotion_Q2', 'Emotion_Q3', 'Emotion_Q4',
              'Key_C', 'Key_c', 'Bar_None', 'EOS_None',
              'Chord_I_M', 'Chord_V_7', 'Chord_None_None']
    events += [f'Beat_{b}' for b in range(16)]
    events += [f'Filler_{i}' for i in range(VOCAB - len(events) - 1)]
    events = sorted(set(events))
    vocab = Vocab({e: i for i, e in enumerate(events)},
                  {i: e for i, e in enumerate(events)})
    model = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                             d_model=512, d_ff=2048, d_embed=512,
                             dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32)))
    gen = Stage1BatchGenerator(model, params, vocab, batch=16,
                               max_events=384, max_bars=64,
                               functional=True)
    return gen


def main():
    gen = build()
    emos = (['Q1', 'Q2', 'Q3', 'Q4'] * 8)[:32]

    # --- serve ---
    gen.serve(emos, seed=2)                               # compile
    t0 = time.perf_counter()
    _, st = gen.serve(emos, seed=2)
    dt = time.perf_counter() - t0
    ev, rj = sum(st['events']), sum(st['rejects'])
    print(json.dumps({
        'which': 'serve', 'seconds': round(dt, 2), 'chunks': st['chunks'],
        'events': ev, 'rejects': rj,
        'status_counts': {str(s): st['status'].count(s)
                          for s in set(st['status'])},
        'accepted_tps': round(ev / dt, 1),
        'loop_tps': round((ev + rj) / dt, 1),
        'events_per_job_min_max': [min(st['events']), max(st['events'])],
    }), flush=True)

    # --- lockstep generate, same jobs in 2 batches of 16 ---
    gen.generate(emos[:16], seed=2)                       # compile
    t0 = time.perf_counter()
    ev = rj = 0
    stats_l = []
    for half in (emos[:16], emos[16:]):
        _, st = gen.generate(half, seed=2)
        stats_l.append(st)
        ev += sum(st['events'])
        rj += sum(st['rejects'])
    dt = time.perf_counter() - t0
    print(json.dumps({
        'which': 'lockstep', 'seconds': round(dt, 2),
        'events': ev, 'rejects': rj,
        'status_counts': {str(s): sum(st['status'].count(s)
                                      for st in stats_l)
                          for s in set(stats_l[0]['status'])
                          | set(stats_l[1]['status'])},
        'accepted_tps': round(ev / dt, 1),
        'loop_tps': round((ev + rj) / dt, 1),
    }), flush=True)


if __name__ == '__main__':
    main()
