"""Multi-chip SERVING: the batched stage-2 generation loop sharded over a
data-parallel device mesh must reproduce the 1-device streams bit-exactly.

The reference serves strictly single-process single-GPU, one file at a time
(``stage2_accompaniment/inference.py:422-485``); the framework's serving
loop is embarrassingly data-parallel per batch element, so committing the
B-leading job arrays batch-sharded over the mesh ('dp', and ('dcn','dp') on
a multi-slice mesh) runs the SAME compiled while_loop SPMD over n devices.
Per-element math is unchanged — streams must match the unsharded run
byte-for-byte, for both backbones and for continuous-batching ``serve()``.
"""

import jax
import jax.numpy as jnp

from tests_vocab_helper import tiny_vocab2
from emo_disentanger_tpu.models import MusicPerformer, MusicGPT2
from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator
from emo_disentanger_tpu.parallel.mesh import make_mesh

SMALL = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
             dropout=0.0)


def _jobs(vocab, n):
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer_q1 = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
                 vocab.event2idx['Tempo_110']]
    primer_q2 = [vocab.event2idx['Emotion_Q2'], vocab.event2idx['Key_c'],
                 vocab.event2idx['Tempo_110']]
    primers = [(primer_q1 if i % 2 == 0 else primer_q2) for i in range(n)]
    # heterogeneous bar targets so elements finish at different steps
    bars_per = [[list(bar)] * (1 + i % 3) for i in range(n)]
    return primers, bars_per


def _performer(vocab):
    model = MusicPerformer(n_token=vocab.size, favor_dims=16, **SMALL)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    return model, params, omegas


def test_performer_generate_dp_matches_single():
    vocab = tiny_vocab2()
    model, params, omegas = _performer(vocab)
    B = 8
    primers, bars_per = _jobs(vocab, B)
    kw = dict(batch=B, temp=1.1, top_p=0.99, max_events=120,
              max_bar_tokens=32, omegas=omegas)
    base = Stage2BatchGenerator(model, params, vocab, **kw)
    want, wstats = base.generate(primers, bars_per, seed=3)

    mesh = make_mesh(8)
    sharded = Stage2BatchGenerator(model, params, vocab, mesh=mesh, **kw)
    got, gstats = sharded.generate(primers, bars_per, seed=3)
    assert got == want
    assert gstats['status'] == wstats['status']
    assert gstats['rejects'] == wstats['rejects']


def test_performer_serve_dp_matches_single():
    """Continuous batching over the mesh: N=10 jobs stream through B=8
    dp-sharded slots; harvest/refill host round-trips preserve streams."""
    vocab = tiny_vocab2()
    model, params, omegas = _performer(vocab)
    B = 8
    primers, bars_per = _jobs(vocab, 10)
    kw = dict(batch=B, temp=1.1, top_p=0.99, max_events=120,
              max_bar_tokens=32, serve_chunk_steps=24, omegas=omegas)
    base = Stage2BatchGenerator(model, params, vocab, **kw)
    want, _ = base.serve(primers, bars_per, seed=7)

    sharded = Stage2BatchGenerator(model, params, vocab, mesh=make_mesh(8),
                                   **kw)
    got, gstats = sharded.serve(primers, bars_per, seed=7)
    assert got == want
    assert all(st is not None for st in got)
    assert gstats['chunks'] >= 1


def test_gpt2_generate_dp_matches_single():
    vocab = tiny_vocab2()
    model = MusicGPT2(n_token=vocab.size, **SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    B = 8
    primers, bars_per = _jobs(vocab, B)
    kw = dict(batch=B, temp=1.2, top_p=0.97, max_events=120,
              max_bar_tokens=32, max_bars=4, gpt2_cache_len=256,
              gpt2_window=128)
    base = Stage2BatchGenerator(model, params, vocab, **kw)
    want, _ = base.generate(primers, bars_per, seed=5)

    sharded = Stage2BatchGenerator(model, params, vocab, mesh=make_mesh(8),
                                   **kw)
    got, _ = sharded.generate(primers, bars_per, seed=5)
    assert got == want


def test_stage1_generate_dp_matches_single():
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, **SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    kw = dict(batch=8, temp=1.2, top_p=0.97, max_events=96, max_bars=4,
              functional=True, reject_slack=128, fast_slack=64)
    emos = ['Q1', 'Q2'] * 4
    base = Stage1BatchGenerator(model, params, vocab, **kw)
    want, wstats = base.generate(emos, seed=5)
    sharded = Stage1BatchGenerator(model, params, vocab, mesh=make_mesh(8),
                                   **kw)
    got, gstats = sharded.generate(emos, seed=5)
    assert got == want
    assert gstats['status'] == wstats['status']


def test_stage1_serve_dp_matches_single():
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, **SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    kw = dict(batch=8, temp=1.2, top_p=0.97, max_events=96, max_bars=3,
              functional=True, reject_slack=128)
    emos = ['Q1', 'Q2'] * 6               # 12 jobs through 8 slots
    base = Stage1BatchGenerator(model, params, vocab, **kw)
    want, _ = base.serve(emos, seed=9, chunk_steps=24)
    sharded = Stage1BatchGenerator(model, params, vocab, mesh=make_mesh(8),
                                   **kw)
    got, gstats = sharded.serve(emos, seed=9, chunk_steps=24)
    assert got == want
    assert gstats['chunks'] >= 1


def test_mesh_batch_divisibility_guard():
    vocab = tiny_vocab2()
    model, params, omegas = _performer(vocab)
    try:
        Stage2BatchGenerator(model, params, vocab, batch=6,
                             omegas=omegas, mesh=make_mesh(8))
    except ValueError as e:
        assert 'divisible' in str(e)
    else:
        raise AssertionError('expected a batch/mesh divisibility error')
