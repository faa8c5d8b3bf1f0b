"""GPT-2 cache LADDER: tiered lockstep generation must reproduce the
single-big-cache streams bitwise.

The dense GPT-2 decode reads its whole KV buffer every step, so the 4096
re-anchor cache taxes early-song tokens with reads of unwritten slots
(ROOFLINE.md §decode; the reference has no cache at all — it re-forwards
the window per token, ``stage2_accompaniment/inference.py:250-257``).
``gpt2_tiers`` walks ascending cache sizes, migrating the WHOLE batch the
moment any element nears the tier end; the rng chain and every per-element
field ride the carry, and the attention masks positions > t, so streams
must match the ladder-less run byte-for-byte.
"""

import jax
import jax.numpy as jnp
import pytest

from tests_vocab_helper import tiny_vocab2
from emo_disentanger_tpu.models import MusicGPT2
from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator

SMALL = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
             dropout=0.0)


def _setup(B=4):
    vocab = tiny_vocab2()
    model = MusicGPT2(n_token=vocab.size, **SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primers = [[vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
                vocab.event2idx['Tempo_110']] for _ in range(B)]
    bars_per = [[list(bar)] * (1 + i % 3) for i in range(B)]
    return vocab, model, params, primers, bars_per


KW = dict(temp=1.2, top_p=0.97, max_events=120, max_bar_tokens=32,
          max_bars=4, gpt2_cache_len=256, gpt2_window=128,
          reanchor_margin=32)


@pytest.mark.parametrize('layout', ['khd', 'dk'])
def test_ladder_matches_single_cache(layout):
    B = 4
    vocab, model, params, primers, bars_per = _setup(B)
    plain = Stage2BatchGenerator(model, params, vocab, batch=B,
                                 cache_layout=layout, **KW)
    want, wstats = plain.generate(primers, bars_per, seed=3)

    laddered = Stage2BatchGenerator(model, params, vocab, batch=B,
                                    cache_layout=layout,
                                    gpt2_tiers=[16, 32], **KW)
    got, gstats = laddered.generate(primers, bars_per, seed=3)
    assert got == want
    assert gstats['status'] == wstats['status']
    assert gstats['rejects'] == wstats['rejects']
    # the songs here run past 32 written tokens (22-38 events measured), so
    # both migrations must fire (else this test exercises nothing)
    assert gstats['tier_resumes'] == 2
    assert wstats['tier_resumes'] == 0


def test_ladder_spill_mid_primer():
    """A tier below the primer length spills while teacher-forcing and must
    still continue bitwise."""
    B = 2
    vocab, model, params, primers, bars_per = _setup(B)
    long_primers = [p * 8 for p in primers]        # 24 tokens > 16-tier
    plain = Stage2BatchGenerator(model, params, vocab, batch=B, **KW)
    want, _ = plain.generate(long_primers, bars_per[:B], seed=11)
    laddered = Stage2BatchGenerator(model, params, vocab, batch=B,
                                    gpt2_tiers=[16], **KW)
    got, gstats = laddered.generate(long_primers, bars_per[:B], seed=11)
    assert got == want
    assert gstats['tier_resumes'] == 1


def test_ladder_rejects_unreachable_tiers():
    vocab, model, params, _, _ = _setup(2)
    # every requested tier collides with the re-anchor guard band
    with pytest.raises(ValueError, match='gpt2_tiers'):
        Stage2BatchGenerator(model, params, vocab, batch=2,
                             gpt2_tiers=[250], **KW)


def test_performer_ignores_tiers():
    from emo_disentanger_tpu.models import MusicPerformer
    vocab = tiny_vocab2()
    model = MusicPerformer(n_token=vocab.size, favor_dims=16, **SMALL)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    gen = Stage2BatchGenerator(model, params, vocab, batch=2, omegas=omegas,
                               gpt2_tiers=[48], **KW)
    assert gen._tier_loops is None
