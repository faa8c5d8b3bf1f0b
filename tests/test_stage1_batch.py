"""Batched stage-1 generation: per-song rules hold, deterministic."""

import jax
import jax.numpy as jnp
import numpy as np

from tests_vocab_helper import tiny_vocab2
from emo_disentanger_tpu.models import PlainTransformer
from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator


def test_batched_generation_rules_and_determinism():
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))

    gen = Stage1BatchGenerator(model, params, vocab, batch=4, temp=1.2,
                               top_p=0.97, max_events=40, max_bars=2,
                               functional=True, reject_slack=128)
    emotions = ['Q1', 'Q2', 'Q1', 'Q2']
    songs, stats = gen.generate(emotions, seed=7)
    songs2, _ = gen.generate(emotions, seed=7)
    assert songs == songs2
    # per-element reject counters: non-negative, and stuck elements must
    # have accumulated at least their 256 beat strikes
    assert len(stats['rejects']) == 4
    assert all(r >= 0 for r in stats['rejects'])
    from emo_disentanger_tpu.infer.stage1 import STATUS_STUCK
    for st, rj in zip(stats['status'], stats['rejects']):
        if st == STATUS_STUCK:
            assert rj >= 256

    for e, song in zip(emotions, songs):
        if song is None or len(song) < 2:
            continue
        assert song[0] == 'Emotion_{}'.format(e)
        if song[1].startswith('Key_'):
            keyname = song[1].split('_')[1]
            if e == 'Q1':
                assert keyname == 'C'      # major for positive
            else:
                assert keyname == 'c'      # minor for negative
        cur = 0
        for ev in song[2:]:
            if ev == 'Bar_None':
                cur = 0
            elif ev.startswith('Beat_'):
                pos = int(ev.split('_')[1])
                assert pos >= cur
                cur = pos
        assert 'PAD_None' not in song


def test_batched_stage1_prompt_mode():
    """Prompt continuation in the batched loop: each element's stream must
    begin with its primer verbatim, bars count from prompt_bars, and
    unequal primer lengths coexist in one batch (short primers re-feed
    their last token, the reject-equivalent cache semantics)."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    gen = Stage1BatchGenerator(model, params, vocab, batch=2, temp=1.2,
                               top_p=0.97, max_events=64, max_bars=8,
                               functional=True, reject_slack=128)
    p1 = ['Emotion_Q1', 'Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M',
          'Note_Octave_5', 'Note_Degree_I', 'Note_Duration_480']
    p2 = ['Emotion_Q2', 'Key_c', 'Bar_None', 'Beat_0', 'Chord_I_M']
    songs, stats = gen.generate(['Q1', 'Q2'],
                                primers=[p1, p2], target_bars=[3, 3], seed=4)
    for primer, song in zip([p1, p2], songs):
        if song is None:
            continue
        # the emitted stream starts with the primer verbatim (final-token
        # drop can only shorten the sampled tail, not the primer)
        assert song[:len(primer)] == primer, song[:len(primer) + 2]
    # reference bar accounting (inference_utils.py:57-60): the counter
    # starts at prompt_bars = (Bar_None in primer) - 1 = 0 here, so an
    # element that runs to the bar target must report exactly target bars;
    # early EOS (status DONE) or stuck may stop short
    for b in range(2):
        assert stats['bars'][b] <= 3
        if stats['status'][b] == 0:        # exited on the bar target
            assert stats['bars'][b] == 3

    songs2, _ = gen.generate(['Q1', 'Q2'],
                             primers=[p1, p2], target_bars=[3, 3], seed=4)
    assert songs == songs2

    # a 2-bar primer starts the counter at 1 (reference convention): the
    # explicit prompt_bars override and the default must agree
    p3 = ['Emotion_Q1', 'Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M',
          'Bar_None', 'Beat_0', 'Chord_I_M']
    s_def, st_def = gen.generate(['Q1', 'Q1'], primers=[p3, p3],
                                 target_bars=[3, 3], seed=9)
    s_exp, st_exp = gen.generate(['Q1', 'Q1'], primers=[p3, p3],
                                 prompt_bars=[1, 1], target_bars=[3, 3],
                                 seed=9)
    assert s_def == s_exp and st_def['bars'] == st_exp['bars']


def test_tiered_kmax_bitwise_equals_single_tier():
    """The tiered-Kmax decode (small cache first, overflowed songs CONTINUE
    in a full-Kmax loop from carried state) must be bitwise identical to
    the single full-Kmax loop: the einsum masks positions > t, so logits
    are Kmax-independent given the same history, and the rng stream rides
    in the carry.  fast_slack=0 forces every non-trivial song through the
    continuation tier (a 40-event song cannot finish within a 40-slot
    cache once any sampling iteration is spent)."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(3), jnp.ones((1, 8), jnp.int32))

    kw = dict(batch=4, temp=1.2, top_p=0.97, max_events=40, max_bars=8,
              functional=True, reject_slack=128)
    tiered = Stage1BatchGenerator(model, params, vocab, fast_slack=0, **kw)
    single = Stage1BatchGenerator(model, params, vocab, fast_slack=None, **kw)
    assert tiered._resume is not None and single._resume is None

    emotions = ['Q1', 'Q2', 'Q1', 'Q2']
    songs_t, stats_t = tiered.generate(emotions, seed=11)
    songs_s, stats_s = single.generate(emotions, seed=11)
    assert songs_t == songs_s
    for k in ('status', 'bars', 'events', 'rejects'):
        assert stats_t[k] == stats_s[k], k
    # the continuation tier must actually have been exercised (otherwise
    # this test proves nothing)
    assert stats_t['resumed'] > 0
    assert stats_s['resumed'] == 0

    # a multi-rung ladder (two intermediate caches, both smaller than any
    # finished song) must walk BOTH continuations and still match bitwise
    ladder = Stage1BatchGenerator(model, params, vocab, tiers=[42, 64], **kw)
    assert len(ladder._resumes) == 2
    songs_l, stats_l = ladder.generate(emotions, seed=11)
    assert songs_l == songs_s
    for k in ('status', 'bars', 'events', 'rejects'):
        assert stats_l[k] == stats_s[k], k
    assert stats_l['resumed'] >= stats_t['resumed']


def test_pe_decode_bitwise_matches_shared_clock():
    """decode_step_pe with uniform t must be bitwise the shared-clock
    full-attention decode_step (logits AND cache), the correctness pin
    for serve()'s per-element-clock loop."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    B, K = 3, 24
    c1 = model.apply(params, B, K, method=PlainTransformer.init_decode_cache)
    c2 = {k: v for k, v in c1.items()}
    toks = jax.random.randint(jax.random.PRNGKey(1), (5, B), 0, vocab.size)
    for t in range(5):
        l1, c1 = model.apply(params, toks[t], jnp.int32(t), c1,
                             full_attention=True,
                             method=PlainTransformer.decode_step)
        l2, c2 = model.apply(params, toks[t], jnp.full((B,), t, jnp.int32),
                             c2, method=PlainTransformer.decode_step_pe)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(c1['k']),
                                      np.asarray(c2['k']))


def test_stage1_serve_continuous_batching():
    """serve(): N > B jobs through B slots with refill-on-finish — every
    job completes with the same structural guarantees as lockstep
    (emotion head token, key-mode rule), deterministically per seed."""
    vocab = tiny_vocab2()
    B, N = 2, 5
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    gen = Stage1BatchGenerator(model, params, vocab, batch=B, temp=1.2,
                               top_p=0.97, max_events=40, max_bars=2,
                               functional=True, reject_slack=128)
    emotions = ['Q1', 'Q2', 'Q1', 'Q2', 'Q1']
    songs, stats = gen.serve(emotions, seed=7, chunk_steps=16)
    assert len(songs) == N
    assert stats['chunks'] >= 1
    from emo_disentanger_tpu.infer.stage1 import (STATUS_DONE, STATUS_STUCK,
                                                  STATUS_OVERFLOW)
    from emo_disentanger_tpu.infer.stage1_batch import STATUS_IDLE
    for e, song, st in zip(emotions, songs, stats['status']):
        assert st != STATUS_IDLE
        if song is None:
            assert st == STATUS_STUCK
            continue
        assert song[0] == 'Emotion_{}'.format(e)
        if len(song) > 1 and song[1].startswith('Key_'):
            keyname = song[1].split('_')[1]
            assert keyname.isupper() == (e in ('Q1', 'Q4'))

    songs2, stats2 = gen.serve(emotions, seed=7, chunk_steps=16)
    assert songs == songs2 and stats['status'] == stats2['status']

    # N < B leaves idle slots without hanging; N == B works too
    songs3, _ = gen.serve(emotions[:1], seed=7, chunk_steps=16)
    assert len(songs3) == 1
    songs4, _ = gen.serve(emotions[:2], seed=7, chunk_steps=16)
    assert len(songs4) == 2


def test_stage1_serve_prompt_mode():
    """serve() prompt-continuation: teacher-forced multi-token primers per
    job, refill across jobs with different primers."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    gen = Stage1BatchGenerator(model, params, vocab, batch=2, temp=1.2,
                               top_p=0.97, max_events=40, max_bars=6,
                               functional=True, reject_slack=128)
    base = ['Emotion_Q1', 'Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M',
            'Bar_None']
    primers = [['Emotion_Q1'] + base[1:],
               ['Emotion_Q2', 'Key_c'] + base[2:],
               ['Emotion_Q1'] + base[1:4]]
    emotions = ['Q1', 'Q2', 'Q1']
    songs, stats = gen.serve(emotions, seed=3, primers=primers,
                             prompt_bars=[1, 1, 0], target_bars=[3, 3, 3],
                             chunk_steps=16)
    assert len(songs) == 3
    for p, song in zip(primers, songs):
        if song is None:
            continue
        # the teacher-forced primer must open every stream verbatim
        assert song[:len(p)] == p
    songs2, _ = gen.serve(emotions, seed=3, primers=primers,
                          prompt_bars=[1, 1, 0], target_bars=[3, 3, 3],
                          chunk_steps=16)
    assert songs == songs2
