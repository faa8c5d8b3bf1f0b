"""K-in-lanes ('dk') decode-cache layout: equivalence with 'khd'.

The batched stage-1 loop decodes with a whole-cache einsum whose per-step
HBM reads pay a 4x TPU tile-padding penalty under the [B, Kmax, H, Dh]
cache layout (trailing (H=8, Dh=64) dims tile to (16, 128) for bf16).  The
'dk' layout stores caches [B, H, Dh, Kmax] and r_heads [H, Dh, Kmax] so
the trailing (Dh, Kmax) dims tile cleanly.  Same math, different memory:
these tests pin step-level logits and generator-level token streams across
the two layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests_vocab_helper import tiny_vocab2
from emo_disentanger_tpu.models import PlainTransformer
from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator


def _tiny_model():
    model = PlainTransformer(vocab_size=30, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    return model, params


def test_decode_step_layouts_match():
    """Teacher-forced decode: per-step logits agree across layouts to
    reduction-order rounding (the 'dk'/'hkd' bodies compute the relative
    term as compute-all-then-gather instead of gather-then-dot — identical
    64-wide contractions per entry)."""
    model, params = _tiny_model()
    B, K, steps = 3, 32, 20
    toks = jax.random.randint(jax.random.PRNGKey(3), (steps, B), 0, 30)

    outs = {}
    for layout in ('khd', 'dk', 'hkd'):
        cache = model.apply(params, B, K, layout,
                            method=PlainTransformer.init_decode_cache)
        logits_seq = []
        for t in range(steps):
            logits, cache = model.apply(
                params, toks[t], jnp.int32(t), cache,
                full_attention=True, layout=layout,
                method=PlainTransformer.decode_step)
            logits_seq.append(logits)
        outs[layout] = jnp.stack(logits_seq)

    np.testing.assert_allclose(outs['khd'], outs['dk'],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs['khd'], outs['hkd'],
                               rtol=2e-5, atol=2e-5)


def test_decode_step_pe_layouts_match():
    """Per-element-clock decode (the serve() step) with RAGGED positions:
    all layouts, same logits."""
    model, params = _tiny_model()
    B, K = 4, 32
    toks = jax.random.randint(jax.random.PRNGKey(5), (10, B), 0, 30)

    outs = {}
    for layout in ('khd', 'dk', 'hkd'):
        cache = model.apply(params, B, K, layout,
                            method=PlainTransformer.init_decode_cache)
        # desync the clocks: element b starts at position b
        t = jnp.arange(B, dtype=jnp.int32)
        logits_seq = []
        for i in range(10):
            logits, cache = model.apply(
                params, toks[i], t, cache, layout=layout,
                method=PlainTransformer.decode_step_pe)
            t = t + 1
            logits_seq.append(logits)
        outs[layout] = jnp.stack(logits_seq)

    np.testing.assert_allclose(outs['khd'], outs['dk'],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(outs['khd'], outs['hkd'],
                               rtol=2e-5, atol=2e-5)


def test_generator_streams_match_across_layouts():
    """End-to-end: the batched generator (incl. the tiered cache ladder)
    emits the same songs under either layout for the same seed."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    emotions = ['Q1', 'Q2', 'Q1', 'Q2']

    results = {}
    for layout in ('khd', 'dk', 'hkd'):
        gen = Stage1BatchGenerator(model, params, vocab, batch=4, temp=1.2,
                                   top_p=0.97, max_events=40, max_bars=2,
                                   functional=True, reject_slack=128,
                                   fast_slack=64, cache_layout=layout)
        results[layout] = gen.generate(emotions, seed=7)

    songs_khd, stats_khd = results['khd']
    for other in ('dk', 'hkd'):
        songs_o, stats_o = results[other]
        assert songs_khd == songs_o
        assert stats_khd['status'] == stats_o['status']
        assert stats_khd['events'] == stats_o['events']
        assert stats_khd['iters'] == stats_o['iters']


def test_serve_dk_layout():
    """Continuous batching under 'dk': jobs stream through slots and finish
    with valid streams (per-element clocks + masked refills exercise the
    ragged-t write/attend paths)."""
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    gen = Stage1BatchGenerator(model, params, vocab, batch=2, temp=1.2,
                               top_p=0.97, max_events=40, max_bars=2,
                               functional=True, reject_slack=128,
                               cache_layout='dk')
    emotions = ['Q1', 'Q2', 'Q1']
    songs, stats = gen.serve(emotions, seed=11, chunk_steps=16)
    assert len(songs) == 3
    from emo_disentanger_tpu.infer.stage1 import STATUS_STUCK
    for e, song, st in zip(emotions, songs, stats['status']):
        if st == STATUS_STUCK:
            assert song is None
            continue
        assert song is not None and song[0] == 'Emotion_{}'.format(e)


# ---------------------------------------------------------------- GPT-2

def _tiny_gpt2():
    from emo_disentanger_tpu.models import MusicGPT2
    model = MusicGPT2(n_token=30, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_gpt2_decode_layouts_match():
    """Shared-clock and per-element GPT-2 decode: logits agree across
    cache layouts."""
    from emo_disentanger_tpu.models import MusicGPT2
    model, params = _tiny_gpt2()
    B, K, steps = 3, 32, 16
    toks = jax.random.randint(jax.random.PRNGKey(2), (steps, B), 0, 30)
    segs = jnp.zeros((B,), jnp.int32)

    for method, t0 in ((MusicGPT2.decode_step, lambda: jnp.int32(0)),
                       (MusicGPT2.decode_step_batchpos,
                        lambda: jnp.arange(B, dtype=jnp.int32))):
        outs = {}
        for layout in ('khd', 'dk'):
            cache = model.apply(params, B, K, layout,
                                method=MusicGPT2.init_decode_cache)
            t = t0()
            seq = []
            for i in range(steps):
                logits, cache = model.apply(params, toks[i], segs, t, cache,
                                            layout=layout, method=method)
                t = t + 1
                seq.append(logits)
            outs[layout] = jnp.stack(seq)
        np.testing.assert_allclose(outs['khd'], outs['dk'],
                                   rtol=2e-5, atol=2e-5)


def test_gpt2_generator_streams_match_across_layouts(monkeypatch):
    """Batched GPT-2 generation ACROSS a window re-anchor: 'dk' emits the
    same streams as 'khd' (argmax sampling + Track_LeadSheet bias force
    growth past the cache, as in the host-parity reanchor test)."""
    import emo_disentanger_tpu.infer.stage2_batch as s2b
    from emo_disentanger_tpu.models import MusicGPT2

    def argmax_sample(key, logits, temperature, top_p, forbid=None):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    monkeypatch.setattr(s2b, 'nucleus_sample', argmax_sample)

    vocab = tiny_vocab2()
    tl = vocab.event2idx['Track_LeadSheet']
    model = MusicGPT2(n_token=vocab.size, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x.at[tl].add(1.0)
        if ('out_proj' in jax.tree_util.keystr(path)
            and 'bias' in jax.tree_util.keystr(path)) else x, params)
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    kw = dict(temp=1.0, top_p=0.9, max_events=400, gpt2_cache_len=192,
              gpt2_window=96, reanchor_margin=16, max_bar_tokens=32,
              max_bars=24)

    results = {}
    for layout in ('khd', 'dk'):
        gen = s2b.Stage2BatchGenerator(model, params, vocab, batch=2,
                                       cache_layout=layout, **kw)
        results[layout] = gen.generate([primer] * 2, [[list(bar)] * 24] * 2,
                                       seed=7)
    s_khd, st_khd = results['khd']
    s_dk, st_dk = results['dk']
    assert max(st_dk['reanchors']) > 0, \
        'test shapes must actually trigger a re-anchor'
    assert s_khd == s_dk
    assert st_khd['reanchors'] == st_dk['reanchors']
    assert st_khd['status'] == st_dk['status']


# ------------------------------------------------------------- Performer

def test_performer_state_layouts_match():
    """FAVOR decode with the transposed ('dm') S state: logits identical to
    'md' (the outer-product update and the phi_q contraction are the same
    scalar sums per entry), incl. the masked batchpos step."""
    from emo_disentanger_tpu.models import MusicPerformer
    model = MusicPerformer(n_token=30, n_layer=2, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, favor_dims=16, dropout=0.0)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    B, steps = 3, 12
    toks = jax.random.randint(jax.random.PRNGKey(2), (steps, B), 0, 30)
    segs = jnp.zeros((B,), jnp.int32)
    # freeze element 1 on odd steps to exercise update_mask under 'dm'
    masks = jnp.asarray([[True, i % 2 == 0, True] for i in range(steps)])

    outs = {}
    for layout in ('md', 'dm'):
        state = model.apply(params, B, layout,
                            method=MusicPerformer.init_decode_state)
        t = jnp.arange(B, dtype=jnp.int32)
        seq = []
        for i in range(steps):
            logits, state = model.apply(
                params, toks[i], segs, t, omegas, state,
                update_mask=masks[i], state_layout=layout,
                method=MusicPerformer.decode_step_batchpos)
            t = t + masks[i]
            seq.append(logits)
        outs[layout] = jnp.stack(seq)
    np.testing.assert_allclose(outs['md'], outs['dm'], rtol=2e-5, atol=2e-5)


def test_performer_generator_streams_match_across_layouts():
    """Batched Performer generation: cache_layout='dk' (transposed FAVOR
    state) emits the same streams as the default."""
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator
    vocab = tiny_vocab2()
    model = MusicPerformer(n_token=vocab.size, n_layer=2, n_head=2,
                           d_model=32, d_ff=64, d_embed=32, favor_dims=16,
                           dropout=0.0)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    results = {}
    for layout in ('khd', 'dk'):
        gen = Stage2BatchGenerator(model, params, vocab, batch=2, temp=1.1,
                                   top_p=0.99, max_events=150,
                                   max_bar_tokens=32, omegas=omegas,
                                   cache_layout=layout)
        results[layout] = gen.generate([primer] * 2,
                                       [[list(bar)] * 2, [list(bar)] * 3],
                                       seed=3)
    s_khd, st_khd = results['khd']
    s_dk, st_dk = results['dk']
    assert s_khd == s_dk
    assert st_khd['status'] == st_dk['status']
    assert st_khd['rejects'] == st_dk['rejects']


def test_single_song_generator_streams_match_across_layouts():
    """The single-song stage-1 loop (flash auto-select under 'khd', whole-
    cache einsum under 'dk'/'hkd') emits the same song either way."""
    from emo_disentanger_tpu.infer.stage1 import Stage1Generator
    vocab = tiny_vocab2()
    model = PlainTransformer(vocab_size=vocab.size, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    results = {}
    for layout in ('khd', 'dk'):
        gen = Stage1Generator(model, params, vocab, temp=1.2, top_p=0.97,
                              max_events=40, max_bars=2, functional=True,
                              reject_slack=64, cache_layout=layout)
        results[layout] = gen.generate('Q1', seed=9)
    song_khd, stats_khd = results['khd']
    song_dk, stats_dk = results['dk']
    assert song_khd == song_dk
    assert stats_khd['status'] == stats_dk['status']


# ---------------------------------------------------------------------------
# per-element-clock op lowerings (serve()'s decode step): the rel-BD term
# and the cache write each have interchangeable implementations whose
# results must agree exactly (the A/B lives in bench_pe_micro.py)

def test_pe_rel_impls_bitwise_equal():
    """full_decode_attention_pe: 'slice' (reverse + per-element
    dynamic_slice window) vs 'gather' (take_along_axis) — identical
    output bits for ragged clocks incl. the t=0 and t=Kmax-1 edges."""
    from emo_disentanger_tpu.ops.attention import full_decode_attention_pe
    rng = np.random.default_rng(11)
    B, H, Dh, K = 5, 2, 16, 32
    t = jnp.asarray([0, 1, 7, K - 2, K - 1], jnp.int32)
    for layout, kshape, rshape in (
            ('khd', (B, K, H, Dh), (K, H, Dh)),
            ('dk', (B, H, Dh, K), (H, Dh, K)),
            ('hkd', (B, H, K, Dh), (H, Dh, K))):
        for dtype in (jnp.float32, jnp.bfloat16):
            q = jnp.asarray(rng.standard_normal((B, H, Dh)), dtype)
            kc = jnp.asarray(rng.standard_normal(kshape), dtype)
            vc = jnp.asarray(rng.standard_normal(kshape), dtype)
            rh = jnp.asarray(rng.standard_normal(rshape), dtype)
            # jit: the CPU backend's eager dot rejects bf16 x bf16 -> f32
            run = jax.jit(lambda impl: full_decode_attention_pe(
                q, kc, vc, t, scale=0.25, rel=(q, rh),
                layout=layout, rel_impl=impl), static_argnums=0)
            outs = [run(impl) for impl in ('slice', 'gather')]
            assert outs[0].dtype == outs[1].dtype
            np.testing.assert_array_equal(np.asarray(outs[0]),
                                          np.asarray(outs[1]))


def test_pe_write_impls_equal():
    """write_row_pe: 'dus' / 'scatter' / 'mask' land the identical row at
    each element's own t under every layout."""
    from emo_disentanger_tpu.ops.attention import write_row_pe
    rng = np.random.default_rng(12)
    B, H, Dh, K = 4, 2, 8, 16
    t = jnp.asarray([0, 3, K - 2, K - 1], jnp.int32)
    row = jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.bfloat16)
    for layout, kshape in (('khd', (B, K, H, Dh)), ('dk', (B, H, Dh, K)),
                           ('hkd', (B, H, K, Dh))):
        cache = jnp.asarray(rng.standard_normal(kshape), jnp.bfloat16)
        outs = [write_row_pe(cache, row, t, layout, impl=impl)
                for impl in ('dus', 'scatter', 'mask')]
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[1]))
        np.testing.assert_array_equal(np.asarray(outs[0]),
                                      np.asarray(outs[2]))
