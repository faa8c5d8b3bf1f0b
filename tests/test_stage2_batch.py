"""Batched stage-2 Performer generation: structure of each stream must match
the single-song generator's semantics (teacher-forced bars verbatim, segments
correct, deterministic under seed)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests_vocab_helper import tiny_vocab2
from emo_disentanger_tpu.models import MusicPerformer
from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator


def test_batched_stage2_generation():
    vocab = tiny_vocab2()
    small = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
                 dropout=0.0)
    model = MusicPerformer(n_token=vocab.size, favor_dims=16, **small)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))

    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer_q1 = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
                 vocab.event2idx['Tempo_110']]
    primer_q2 = [vocab.event2idx['Emotion_Q2'], vocab.event2idx['Key_c'],
                 vocab.event2idx['Tempo_110']]

    B = 4
    gen = Stage2BatchGenerator(model, params, vocab, batch=B, temp=1.1,
                               top_p=0.99, max_events=150, max_bar_tokens=32,
                               omegas=omegas)
    primers = [primer_q1, primer_q2, primer_q1, primer_q2]
    bars_per = [[list(bar)] * 2, [list(bar)] * 3, [list(bar)] * 2,
                [list(bar)] * 3]
    streams, stats = gen.generate(primers, bars_per, seed=3)

    assert len(streams) == B
    # reject/skip counters present per element and non-negative
    assert len(stats['rejects']) == B
    assert all(r >= 0 for r in stats['rejects'])
    track_lead = 'Track_LeadSheet'
    for b, stream in enumerate(streams):
        evs = vocab.decode(stream)
        # stream starts with its primer + Track_LeadSheet + bar 0 verbatim
        assert evs[:3] == vocab.decode(primers[b])
        assert evs[3] == track_lead
        bar_evs = vocab.decode(bars_per[b][0])
        assert evs[4:4 + len(bar_evs)] == bar_evs
        assert evs[4 + len(bar_evs)] == 'Track_Full'
        assert 'PAD_None' not in evs

    # deterministic
    streams2, _ = gen.generate(primers, bars_per, seed=3)
    assert streams == streams2
    streams3, _ = gen.generate(primers, bars_per, seed=4)
    assert streams3 != streams or stats['status'] is not None


def test_batched_stage2_gpt2():
    from emo_disentanger_tpu.models import MusicGPT2
    vocab = tiny_vocab2()
    small = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
                 dropout=0.0)
    model = MusicGPT2(n_token=vocab.size, **small)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    gen = Stage2BatchGenerator(model, params, vocab, batch=2, temp=1.2,
                               top_p=0.97, max_events=120, max_bar_tokens=32,
                               max_bars=4, gpt2_cache_len=256, gpt2_window=128)
    streams, stats = gen.generate([primer, primer],
                                  [[list(bar)] * 2, [list(bar)] * 3], seed=5)
    for b, stream in enumerate(streams):
        evs = vocab.decode(stream)
        assert evs[:3] == vocab.decode(primer)
        assert evs[3] == 'Track_LeadSheet'
        assert 'PAD_None' not in evs
    streams2, _ = gen.generate([primer, primer],
                               [[list(bar)] * 2, [list(bar)] * 3], seed=5)
    assert streams == streams2


def test_gpt2_buffer_shorter_than_window():
    """A serving config with max_events below gpt2_window is legal: the
    re-anchor re-feeds min(window, out buffer) rows — a song shorter than
    the window is its own trailing window.  Rejected samples advance the
    CACHE clock without advancing the out buffer, so the trigger is
    reachable (and fires here under random weights).  Regression for the
    r5 bench-matrix failure (former construction-time assert)."""
    from emo_disentanger_tpu.models import MusicGPT2
    vocab = tiny_vocab2()
    model = MusicGPT2(n_token=vocab.size, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    gen = Stage2BatchGenerator(model, params, vocab, batch=2, temp=1.2,
                               top_p=0.97, max_events=60, max_bar_tokens=32,
                               max_bars=4, gpt2_cache_len=256,
                               gpt2_window=128)   # buffer 68 < window 128
    streams, stats = gen.generate([primer, primer],
                                  [[list(bar)] * 2, [list(bar)] * 2], seed=3)
    for stream in streams:
        assert 'PAD_None' not in vocab.decode(stream)
    streams2, stats2 = gen.generate([primer, primer],
                                    [[list(bar)] * 2, [list(bar)] * 2],
                                    seed=3)
    assert streams == streams2 and stats['reanchors'] == stats2['reanchors']


def test_batched_gpt2_reanchor_matches_host_path(monkeypatch):
    """Generating past the GPT-2 cache must window-re-anchor INSIDE the
    batched device loop and reproduce the host-orchestrated Stage2Generator
    stream exactly.

    Sampling is patched to pure argmax in BOTH loops, removing the
    RNG-stream difference: stream equality then depends only on correct
    state/cache/clock management across the re-anchors — a wrong window,
    clock, or logits row would flip some argmax downstream.  A moderate
    Track_LeadSheet bias keeps bars completing so the streams actually grow
    past the cache."""
    from emo_disentanger_tpu.models import MusicGPT2
    import emo_disentanger_tpu.infer.stage2 as s2
    import emo_disentanger_tpu.infer.stage2_batch as s2b

    def argmax_sample(key, logits, temperature, top_p, forbid=None):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    monkeypatch.setattr(s2, 'nucleus_sample', argmax_sample)
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
              gpt2_window=96, reanchor_margin=16)
    n_bars = 24
    host = s2.Stage2Generator(model, params, vocab, **kw)
    host_stream, host_stats = host.generate(primer, [list(bar)] * n_bars,
                                            seed=7)
    assert host_stats['bars'] == n_bars

    B = 2
    gen = s2b.Stage2BatchGenerator(model, params, vocab, batch=B,
                                   max_bar_tokens=32, max_bars=n_bars, **kw)
    streams, stats = gen.generate([primer] * B, [[list(bar)] * n_bars] * B,
                                  seed=7)
    assert max(stats['reanchors']) > 0, \
        'test shapes must actually trigger a re-anchor'
    for b in range(B):
        assert streams[b] == host_stream, (
            f'element {b}: batched stream diverged from host path '
            f'(host status {host_stats["status"]}, '
            f'batched status {stats["status"][b]}, '
            f'reanchors {stats["reanchors"][b]})')


def test_batched_gpt2_matches_singlepos_decode():
    """decode_step_batchpos with equal clocks == decode_step."""
    from emo_disentanger_tpu.models import MusicGPT2
    import numpy as np
    vocab = tiny_vocab2()
    model = MusicGPT2(n_token=vocab.size, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    B, K = 2, 32
    cache_a = model.apply(params, B, K, method=MusicGPT2.init_decode_cache)
    cache_b = model.apply(params, B, K, method=MusicGPT2.init_decode_cache)
    toks = (jnp.arange(2 * 10).reshape(10, 2) * 3) % (vocab.size - 1)
    segs = jnp.zeros((10, 2), jnp.int32)
    for t in range(10):
        la, cache_a = model.apply(params, toks[t], segs[t], jnp.int32(t),
                                  cache_a, method=MusicGPT2.decode_step)
        lb, cache_b = model.apply(params, toks[t], segs[t],
                                  jnp.full((B,), t, jnp.int32), cache_b,
                                  method=MusicGPT2.decode_step_batchpos)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)


def _tiny_performer_gen(vocab, B, max_events=150):
    small = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
                 dropout=0.0)
    model = MusicPerformer(n_token=vocab.size, favor_dims=16, **small)
    omegas = model.draw_omegas(jax.random.PRNGKey(5))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    return Stage2BatchGenerator(model, params, vocab, batch=B, temp=1.1,
                                top_p=0.99, max_events=max_events,
                                max_bar_tokens=32, omegas=omegas)


def test_serve_continuous_batching_refills():
    """serve(): N > B jobs stream through B slots with refill-on-finish;
    every job completes with the same per-stream structure guarantees as
    the lockstep generate."""
    vocab = tiny_vocab2()
    B, N = 2, 5
    gen = _tiny_performer_gen(vocab, B)
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer_q1 = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
                 vocab.event2idx['Tempo_110']]
    primer_q2 = [vocab.event2idx['Emotion_Q2'], vocab.event2idx['Key_c'],
                 vocab.event2idx['Tempo_110']]
    primers = [primer_q1 if i % 2 == 0 else primer_q2 for i in range(N)]
    bars_per = [[list(bar)] * (2 + i % 2) for i in range(N)]

    streams, stats = gen.serve(primers, bars_per, seed=3)
    assert len(streams) == N
    assert stats['chunks'] >= -(-N // B)        # at least N/B refill exits
    from emo_disentanger_tpu.infer import stage2_batch as s2b
    for j, stream in enumerate(streams):
        assert stream is not None, f'job {j} never completed'
        assert stats['status'][j] in (s2b.STATUS_DONE_BARS, s2b.STATUS_EOS,
                                      s2b.STATUS_MAX, s2b.STATUS_STUCK)
        evs = vocab.decode(stream)
        assert evs[:3] == vocab.decode(primers[j])
        assert evs[3] == 'Track_LeadSheet'
        bar_evs = vocab.decode(bars_per[j][0])
        assert evs[4:4 + len(bar_evs)] == bar_evs
        assert evs[4 + len(bar_evs)] == 'Track_Full'
        assert 'PAD_None' not in evs
        if stats['status'][j] == s2b.STATUS_DONE_BARS:
            assert stats['bars'][j] == len(bars_per[j])

    # deterministic under the same seed (finish order is deterministic)
    streams2, _ = gen.serve(primers, bars_per, seed=3)
    assert streams == streams2

    # N == B degenerates to one wave, still correct
    streams3, stats3 = gen.serve(primers[:B], bars_per[:B], seed=3)
    assert all(st is not None for st in streams3)

    # N < B leaves idle slots without hanging
    streams4, _ = gen.serve(primers[:1], bars_per[:1], seed=3)
    assert len(streams4) == 1 and streams4[0] is not None


def test_serve_reset_slot_restores_fresh_state():
    """_reset_slot must fully re-arm a slot: counters/out equal a fresh
    init and the slot's FAVOR (S, z) accumulators are zeroed (the masked
    update ADDS, so stale state would corrupt the next job)."""
    vocab = tiny_vocab2()
    B = 2
    gen = _tiny_performer_gen(vocab, B, max_events=60)
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    jobs = gen._prep_jobs([primer] * B, [[list(bar)] * 2] * B, None)
    inj_t, inj_s, inj_l, prim, plen, tbars = jobs

    fresh = gen._initj(jnp.asarray(inj_t), jnp.asarray(inj_s),
                       jnp.asarray(inj_l), jnp.asarray(prim),
                       jnp.asarray(plen), jnp.asarray(tbars),
                       jax.random.PRNGKey(7))
    fresh_np = {k: np.asarray(v) for k, v in fresh.items()
                if k not in ('state', 'rng')}
    fresh_S = np.asarray(fresh['state']['S'])

    s = gen._initj(jnp.asarray(inj_t), jnp.asarray(inj_s),
                   jnp.asarray(inj_l), jnp.asarray(prim),
                   jnp.asarray(plen), jnp.asarray(tbars),
                   jax.random.PRNGKey(7))
    s = gen._chunk(s)          # run until someone finishes: state now dirty
    assert np.asarray(s['out_len']).max() > plen.max()

    s = gen._reset(s, np.int32(0), jnp.asarray(inj_t[0]),
                   jnp.asarray(inj_s[0]), jnp.asarray(inj_l[0]),
                   jnp.asarray(prim[0]), np.int32(plen[0]),
                   np.int32(tbars[0]))
    for k, want in fresh_np.items():
        if k in ('iters',):
            continue
        got = np.asarray(s[k])
        np.testing.assert_array_equal(
            got[0], want[0], err_msg=f'slot-0 field {k} not reset')
    # FAVOR accumulators zeroed on the reset slot only (batch axis 1)
    S = np.asarray(s['state']['S'])
    assert np.all(S[:, 0] == 0.0)
    assert fresh_S.shape == S.shape


def test_serve_batched_refill_equals_per_slot_reset():
    """_reset_slots (serve's one-dispatch harvest refill) must produce the
    same state as the per-slot _reset_slot composition, and its idle_mask
    must match _idle_slot."""
    vocab = tiny_vocab2()
    B = 2
    gen = _tiny_performer_gen(vocab, B, max_events=60)
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    inj_t, inj_s, inj_l, prim, plen, tbars = gen._prep_jobs(
        [primer] * B, [[list(bar)] * 2] * B, None)

    def dirty():
        s = gen._initj(jnp.asarray(inj_t), jnp.asarray(inj_s),
                       jnp.asarray(inj_l), jnp.asarray(prim),
                       jnp.asarray(plen), jnp.asarray(tbars),
                       jax.random.PRNGKey(7))
        return gen._chunk(s)

    # per-slot composition: reset slot 0, idle slot 1
    a = gen._reset(dirty(), np.int32(0), jnp.asarray(inj_t[0]),
                   jnp.asarray(inj_s[0]), jnp.asarray(inj_l[0]),
                   jnp.asarray(prim[0]), np.int32(plen[0]),
                   np.int32(tbars[0]))
    a = gen._idle(a, np.int32(1))

    # batched: one masked dispatch for both
    rows = gen._job_rows(inj_t, inj_s, inj_l, prim, plen, tbars, [0, 0])
    b = gen._refill(dirty(), jnp.asarray(np.array([True, False])),
                    jnp.asarray(np.array([False, True])), *rows)

    for k in a:
        if k == 'rng':
            continue
        if k == 'state':
            for sk in a[k]:
                np.testing.assert_array_equal(
                    np.asarray(a[k][sk]), np.asarray(b[k][sk]),
                    err_msg=f'state.{sk}')
            continue
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_serve_chunk_floor_bounds_host_round_trips():
    """With a steps floor, finishes inside the window batch into ONE
    harvest: chunk count collapses toward total_steps/floor instead of one
    hand-back per finish."""
    vocab = tiny_vocab2()
    B, N = 2, 6
    gen = _tiny_performer_gen(vocab, B)
    assert gen.serve_chunk_steps > 0
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    streams, stats = gen.serve([primer] * N, [[list(bar)] * 2] * N, seed=5)
    assert all(st is not None for st in streams)
    # every job completed; a per-finish exit policy would need >= N chunks
    # here, the floored policy needs at most ceil(N/B) + a straggler or two
    assert stats['chunks'] <= N


def test_serve_gpt2_backbone_refill():
    """serve() with the GPT-2 backbone: refilled slots reset t to 0 and
    overwrite their KV cache before attending (no explicit clear needed);
    every queued job completes with the generate() structure guarantees."""
    from emo_disentanger_tpu.models import MusicGPT2
    vocab = tiny_vocab2()
    small = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32,
                 dropout=0.0)
    model = MusicGPT2(n_token=vocab.size, **small)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        jnp.zeros((1, 8), jnp.int32))
    bar = [vocab.event2idx[e] for e in
           ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
            'Note_Degree_I', 'Note_Duration_480']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    B, N = 2, 5
    gen = Stage2BatchGenerator(model, params, vocab, batch=B, temp=1.2,
                               top_p=0.97, max_events=120, max_bar_tokens=32,
                               max_bars=4, gpt2_cache_len=256,
                               gpt2_window=128, serve_chunk_steps=32)
    primers = [primer] * N
    bars_per = [[list(bar)] * (2 + i % 2) for i in range(N)]
    streams, stats = gen.serve(primers, bars_per, seed=3)
    assert len(streams) == N
    from emo_disentanger_tpu.infer import stage2_batch as s2b
    for j, stream in enumerate(streams):
        assert stream is not None, f'job {j} never completed'
        evs = vocab.decode(stream)
        assert evs[:3] == vocab.decode(primer)
        assert evs[3] == 'Track_LeadSheet'
        assert 'PAD_None' not in evs
    streams2, _ = gen.serve(primers, bars_per, seed=3)
    assert streams == streams2
