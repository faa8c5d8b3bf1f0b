"""Extended benchmark suite (the driver runs bench.py; this reports the full
matrix): decode throughput for all three backbones at serving batch sizes,
plus a derived two-stage songs/min figure.

Prints one JSON object per line, one line per metric.
"""

import os
import sys
import json
import time

import jax
import jax.numpy as jnp

VOCAB = 360
STEPS = 384


def _force(x):
    return float(jnp.ravel(x)[0])


def _time_scan(run_j, tok0, steps, reps=3):
    _force(run_j(tok0))
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(run_j(tok0))
    return steps / ((time.perf_counter() - t0) / reps)


def bench_performer(batch, state_layout=None):
    # state_layout: FAVOR S layout ('md' | 'dm'); default from
    # EMODIS_PERF_STATE_LAYOUT so the chip A/B is an env flip
    state_layout = state_layout or os.environ.get('EMODIS_PERF_STATE_LAYOUT',
                                                  'dm')
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.models.performer import MusicPerformer as MP
    from emo_disentanger_tpu.utils.precision import cast_params
    model = MusicPerformer(n_token=VOCAB, n_layer=12, n_head=8, d_model=512,
                           d_ff=2048, d_embed=512, favor_dims=128,
                           dtype=jnp.bfloat16)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32), omegas,
                                    jnp.zeros((1, 8), jnp.int32)))

    def run(tok0):
        state = model.apply(params, batch, state_layout,
                            method=MP.init_decode_state)

        def step(carry, t):
            tok, state = carry
            logits, state = model.apply(params, tok, jnp.zeros_like(tok), t,
                                        omegas, state,
                                        state_layout=state_layout,
                                        method=MP.decode_step)
            return (jnp.argmax(logits, -1).astype(jnp.int32), state), ()

        (tok, _), _ = jax.lax.scan(step, (tok0, state),
                                   jnp.arange(STEPS, dtype=jnp.int32))
        return tok

    return batch * _time_scan(jax.jit(run), jnp.ones((batch,), jnp.int32), STEPS)


def bench_gpt2(batch, cache_len=2048, layout=None):
    # layout: KV-cache memory layout ('khd' | 'dk'); default from
    # EMODIS_S2_CACHE_LAYOUT so the chip A/B is an env flip
    layout = layout or os.environ.get('EMODIS_S2_CACHE_LAYOUT', 'khd')
    from emo_disentanger_tpu.models import MusicGPT2
    from emo_disentanger_tpu.utils.precision import cast_params
    model = MusicGPT2(n_token=VOCAB, n_layer=12, n_head=8, d_model=512,
                      d_ff=2048, d_embed=512, dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32),
                                    jnp.zeros((1, 8), jnp.int32)))

    def run(tok0):
        cache = model.apply(params, batch, cache_len, layout,
                            method=MusicGPT2.init_decode_cache)

        def step(carry, t):
            tok, cache = carry
            logits, cache = model.apply(params, tok, jnp.zeros_like(tok), t,
                                        cache, layout=layout,
                                        method=MusicGPT2.decode_step)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()

        (tok, _), _ = jax.lax.scan(step, (tok0, cache),
                                   jnp.arange(STEPS, dtype=jnp.int32))
        return tok

    return batch * _time_scan(jax.jit(run), jnp.ones((batch,), jnp.int32), STEPS)


def bench_txl(batch, cache_len=1536, layout=None):
    # layout 'dk' forces the whole-cache einsum (K-in-lanes); 'khd' keeps
    # the measured batch-based flash/einsum auto-select
    layout = layout or os.environ.get('EMODIS_S1_CACHE_LAYOUT', 'khd')
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.utils.precision import cast_params
    model = PlainTransformer(vocab_size=VOCAB, n_layer=12, n_head=8,
                             d_model=512, d_ff=2048, d_embed=512,
                             dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32)))

    def run(tok0):
        cache = model.apply(params, batch, cache_len, layout,
                            method=PlainTransformer.init_decode_cache)

        def step(carry, t):
            tok, cache = carry
            logits, cache = model.apply(params, tok, t, cache,
                                        layout=layout,
                                        method=PlainTransformer.decode_step)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()

        (tok, _), _ = jax.lax.scan(step, (tok0, cache),
                                   jnp.arange(STEPS, dtype=jnp.int32))
        return tok

    return batch * _time_scan(jax.jit(run), jnp.ones((batch,), jnp.int32), STEPS)


def check_fused_decode(batch=8, steps=48):
    """On-chip fused-vs-composed Performer decode equivalence spot check.

    The fused whole-layer Pallas decode kernel is OFF by default (the
    composed path measures faster at serving batches — see
    ops/performer_decode.py STATUS) but stays available via
    EMODIS_FUSED_DECODE=1, and its equivalence test runs in interpret mode
    on CPU only; this feeds the SAME teacher-forced token stream through
    both paths on the real backend and returns the max abs logit
    difference, keeping a Mosaic-miscompile canary in the driver
    artifact."""
    import os
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.utils.precision import cast_params

    model = MusicPerformer(n_token=VOCAB, n_layer=12, n_head=8, d_model=512,
                           d_ff=2048, d_embed=512, favor_dims=128,
                           dtype=jnp.bfloat16)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32), omegas,
                                    jnp.zeros((1, 8), jnp.int32)))
    toks = jax.random.randint(jax.random.PRNGKey(3), (steps, batch), 0, VOCAB)
    toks = toks.astype(jnp.int32)

    def make_run():
        # EMODIS_FUSED_DECODE is read at trace time inside decode_step, so
        # each jit below bakes in the path selected by the env var
        def run(toks):
            state = model.apply(params, batch,
                                method=type(model).init_decode_state)

            def step(carry, xs):
                state, = carry
                t, tok = xs
                logits, state = model.apply(
                    params, tok, jnp.zeros_like(tok), t, omegas, state,
                    method=type(model).decode_step)
                return (state,), logits

            _, logits = jax.lax.scan(
                step, (state,),
                (jnp.arange(steps, dtype=jnp.int32), toks))
            return logits

        return jax.jit(run)

    prev = os.environ.get('EMODIS_FUSED_DECODE')
    try:
        os.environ['EMODIS_FUSED_DECODE'] = '1'
        fused = make_run()(toks)
        _force(fused)
        os.environ['EMODIS_FUSED_DECODE'] = '0'
        composed = make_run()(toks)
        _force(composed)
    finally:
        if prev is None:
            os.environ.pop('EMODIS_FUSED_DECODE', None)
        else:
            os.environ['EMODIS_FUSED_DECODE'] = prev
    err = float(jnp.max(jnp.abs(fused - composed)))
    agree = float(jnp.mean(jnp.argmax(fused, -1) == jnp.argmax(composed, -1)))
    return err, agree


def bench_train_step(batch=4, seqlen=3072, dtype=jnp.float32):
    """Stage-2 Performer training step (fwd+bwd+Adam) at production shapes,
    Pallas linear-attention kernel on the hot path.

    ``dtype`` is the compute dtype (mixed precision: bf16 activations/matmuls
    with f32 master weights, f32 Adam state, f32 kernel accumulation).
    Returns (tokens/sec, mfu)."""
    import numpy as np
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.train import (
        OptimizerConfig, make_optimizer, make_train_step, init_train_state,
        stage2_performer_loss_fn)
    from emo_disentanger_tpu.parallel.mesh import make_mesh, shard_batch

    model = MusicPerformer(n_token=VOCAB, n_layer=12, n_head=8, d_model=512,
                           d_ff=2048, d_embed=512, favor_dims=128, dtype=dtype)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    mesh = make_mesh()
    optimizer = make_optimizer(OptimizerConfig())
    state = init_train_state(params, optimizer)
    step = make_train_step(stage2_performer_loss_fn(model, VOCAB - 1),
                           optimizer, mesh)
    rng = np.random.RandomState(0)
    batch_data = shard_batch(mesh, {
        'dec_inp': rng.randint(0, VOCAB - 1, (batch, seqlen)).astype('int32'),
        'dec_tgt': rng.randint(0, VOCAB - 1, (batch, seqlen)).astype('int32'),
        'track_mask': (rng.random((batch, seqlen)) > 0.5).astype('int32'),
        'chord_idx': np.zeros((batch, seqlen), 'int32'),
        'melody_idx': np.zeros((batch, seqlen), 'int32'),
    })
    extras = {'omegas': omegas}
    from emo_disentanger_tpu.train.trainer import dropout_rng
    k = dropout_rng(2)
    state, loss, _ = step(state, batch_data, k, extras)
    _force(loss)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        state, loss, _ = step(state, batch_data, k, extras)
        _force(loss)
    dt = (time.perf_counter() - t0) / reps
    tps = batch * seqlen / dt

    # MFU: 6 FLOPs/param/token (fwd 2x + bwd 4x) over the v5e bf16 peak.
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    mfu = 6.0 * n_params * tps / 197e12
    return tps, mfu


def _stage2_vocab():
    from emo_disentanger_tpu.core.vocab import Vocab
    events = ['Emotion_Q1', 'Emotion_Q2', 'Emotion_Q3', 'Emotion_Q4',
              'Key_C', 'Key_c', 'Bar_None', 'EOS_None', 'Track_LeadSheet',
              'Track_Full', 'Tempo_110', 'Chord_I_M', 'Chord_V_7',
              'Chord_None_None']
    events += [f'Beat_{b}' for b in range(16)]
    events += [f'Filler_{i}' for i in range(VOCAB - len(events) - 1)]
    events = sorted(set(events))
    return Vocab({e: i for i, e in enumerate(events)},
                 {i: e for i, e in enumerate(events)})


def _stage2_generator(vocab, batch, max_events, backbone='performer',
                      temp=None, top_p=None, gpt2_tiers=None):
    from emo_disentanger_tpu.models import MusicPerformer, MusicGPT2
    from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator
    from emo_disentanger_tpu.utils.precision import cast_params
    if backbone == 'performer':
        model = MusicPerformer(n_token=vocab.size, n_layer=12, n_head=8,
                               d_model=512, d_ff=2048, d_embed=512,
                               favor_dims=128, dtype=jnp.bfloat16)
        omegas = model.draw_omegas(jax.random.PRNGKey(1))
        params = cast_params(model.init(jax.random.PRNGKey(0),
                                        jnp.ones((1, 8), jnp.int32), omegas,
                                        jnp.zeros((1, 8), jnp.int32)))
        temp, top_p = temp or 1.1, top_p or 0.99
    else:
        # GPT-2 serving params mirror the reference (inference.py:404)
        model = MusicGPT2(n_token=vocab.size, n_layer=12, n_head=8,
                          d_model=512, d_ff=2048, d_embed=512,
                          dtype=jnp.bfloat16)
        omegas = None
        params = cast_params(model.init(jax.random.PRNGKey(0),
                                        jnp.ones((1, 8), jnp.int32),
                                        jnp.zeros((1, 8), jnp.int32)))
        temp, top_p = temp or 1.2, top_p or 0.97
    return Stage2BatchGenerator(model, params, vocab, batch=batch, temp=temp,
                                top_p=top_p, max_events=max_events,
                                max_bar_tokens=32, max_bars=16,
                                omegas=omegas, gpt2_tiers=gpt2_tiers)


def bench_sampled_generation(batch=16, max_events=1500, backbone='performer',
                             continuous=False, n_jobs=None, gpt2_tiers=None):
    """The production serving loop: Stage2BatchGenerator with full nucleus
    sampling, rejection rules and per-bar teacher forcing on device.

    ``continuous=True`` measures ``serve()`` (refill finished slots from a
    job queue) over ``n_jobs`` (default 2x batch) jobs instead of one
    lockstep wave."""
    vocab = _stage2_vocab()
    gen = _stage2_generator(vocab, batch, max_events, backbone,
                            gpt2_tiers=gpt2_tiers)
    bar = [vocab.event2idx[e] for e in ['Bar_None', 'Beat_0', 'Chord_I_M']]
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    n = (n_jobs or 2 * batch) if continuous else batch
    args = ([primer] * n, [[list(bar)] * 16] * n)
    run = gen.serve if continuous else gen.generate
    run(*args, seed=1)                               # compile
    t0 = time.perf_counter()
    streams, stats = run(*args, seed=2)
    dt = time.perf_counter() - t0
    return sum(stats['events']) / dt


def bench_stage1_sampled_generation(batch=16, max_events=384):
    """Stage-1 serving loop: Stage1BatchGenerator (nucleus sampling, key
    rule, beat rejection on device) at the B>=8 batch the full-attention
    decode path unblocked."""
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
    gen = Stage1BatchGenerator(model, params, vocab, batch=batch,
                               max_events=max_events, max_bars=64,
                               functional=True)
    emos = (['Q1', 'Q2', 'Q3', 'Q4'] * ((batch + 3) // 4))[:batch]
    # warm with the SAME seed as the timed run: the tiered-Kmax ladder
    # compiles continuation tiers lazily on first spill, so an identical
    # warmup guarantees every tier the timed run touches is already built
    gen.generate(emos, seed=2)                           # compile
    t0 = time.perf_counter()
    _, stats = gen.generate(emos, seed=2)
    dt = time.perf_counter() - t0
    # accepted-token throughput understates the loop under random-weight
    # rejection pressure (~0.7 beat-rejects/token; trained weights measure
    # ~0 in bench_e2e) — return (accepted/sec, loop steps/sec)
    return (sum(stats['events']) / dt,
            (sum(stats['events']) + sum(stats['rejects'])) / dt)


def sec_decode_txl():
    layout = os.environ.get('EMODIS_S1_CACHE_LAYOUT', 'khd')
    for batch in (1, 16, 32):
        print(json.dumps({'metric': 'stage1_txl decode', 'batch': batch,
                          'value': round(bench_txl(batch), 1),
                          'layout': layout,
                          'unit': 'tokens/sec/chip'}), flush=True)


def sec_decode_performer():
    layout = os.environ.get('EMODIS_PERF_STATE_LAYOUT', 'dm')
    for batch in (1, 16, 32, 64):
        print(json.dumps({'metric': 'stage2_performer decode', 'batch': batch,
                          'value': round(bench_performer(batch), 1),
                          'state_layout': layout,
                          'unit': 'tokens/sec/chip'}), flush=True)


def sec_decode_gpt2():
    # GPT-2 batch scaling + cache-length attribution: the dense decode
    # reads the whole per-element KV cache every step, so HBM traffic grows
    # linearly with BOTH batch and cache_len while the weight read stays
    # fixed -- the tokens/sec ceiling is therefore ~flat in batch (cache
    # reads dominate weights 20:1 at B=16/K=2048) and ~1/K in cache size.
    # If throughput ~doubles when K halves at fixed B, decode is
    # cache-bandwidth-bound and weak batch scaling is expected, not a
    # loop inefficiency.
    layout = os.environ.get('EMODIS_S2_CACHE_LAYOUT', 'khd')
    results = {}
    for batch in (1, 16, 32):
        results[batch] = bench_gpt2(batch)
        print(json.dumps({'metric': 'stage2_gpt2 decode', 'batch': batch,
                          'value': round(results[batch], 1),
                          'layout': layout,
                          'unit': 'tokens/sec/chip'}), flush=True)
    kv_bytes = 2 * 12 * 512 * 2                  # K+V, 12 layers, d=512, bf16
    w_bytes = 2 * (12 * (4 * 512 * 512 + 2 * 512 * 2048) + VOCAB * 512 * 2)
    sweep = {}
    for k in (512, 1024, 2048):
        tps = results[16] if k == 2048 else bench_gpt2(16, cache_len=k)
        sweep[f'K{k}'] = round(tps, 1)
    hbm_gbps = 819.0                             # v5e HBM peak
    ceil_2048 = hbm_gbps * 1e9 / (16 * 2048 * kv_bytes + w_bytes) * 16
    print(json.dumps({'metric': 'stage2 GPT-2 decode attribution (B=16 bf16,'
                                ' cache-length sweep; flat batch scaling is '
                                'the per-element cache read, not the loop)',
                      'tokens_per_sec': sweep,
                      'k512_over_k2048': round(sweep['K512']
                                               / sweep['K2048'], 2),
                      'hbm_bound_tokens_per_sec_K2048': round(ceil_2048, 1),
                      'unit': 'tokens/sec/chip'}), flush=True)


def sec_sampled_performer():
    for b in (16, 32):
        tps = bench_sampled_generation(batch=b)
        print(json.dumps({'metric': 'stage2 Performer batched generation '
                                    f'(B={b} bf16, nucleus sampling + rules '
                                    'on device, teacher-forced bars)',
                          'value': round(tps, 1),
                          'unit': 'tokens/sec/chip'}), flush=True)


def sec_sampled_gpt2():
    tps = bench_sampled_generation(batch=16, backbone='gpt2')
    print(json.dumps({'metric': 'stage2 GPT-2 batched generation (B=16 bf16, '
                                'nucleus sampling + rules on device, '
                                'teacher-forced bars, in-loop re-anchor)',
                      'value': round(tps, 1),
                      'unit': 'tokens/sec/chip'}), flush=True)


def sec_gpt2_ladder():
    # cache-ladder A/B on the REAL serving loop: the dense decode reads the
    # whole buffer per step, so tiers [1024, 2048] under the 4096 re-anchor
    # cache should recover most of the cache-read tax for songs that live
    # below 2048 written tokens (the 1500-event serving config here)
    base = bench_sampled_generation(batch=16, backbone='gpt2')
    ladder = bench_sampled_generation(batch=16, backbone='gpt2',
                                      gpt2_tiers=[1024, 2048])
    print(json.dumps({'metric': 'stage2 GPT-2 batched generation cache '
                                'LADDER A/B (B=16 bf16, tiers [1024, 2048] '
                                'under the 4096 re-anchor cache)',
                      'value': round(ladder, 1),
                      'baseline_no_ladder': round(base, 1),
                      'speedup': round(ladder / base, 2),
                      'unit': 'tokens/sec/chip'}), flush=True)


def sec_continuous():
    for b in (16, 64):
        tps = bench_sampled_generation(batch=b, continuous=True)
        print(json.dumps({'metric': 'stage2 Performer CONTINUOUS batching '
                                    f'(B={b} slots, 2x jobs, serve() refill '
                                    'on finish, bf16; HOMOGENEOUS jobs -- '
                                    "lockstep's best case, see "
                                    'BENCH_e2e_r04 for the mixed-length '
                                    'comparison)',
                          'value': round(tps, 1),
                          'unit': 'tokens/sec/chip'}), flush=True)


def sec_stage1_gen():
    tps, sps = bench_stage1_sampled_generation()
    print(json.dumps({'metric': 'stage1 TXL batched generation (B=16 bf16, '
                                'nucleus sampling + key/beat rules on '
                                'device, full-attention decode; accepted '
                                'tokens/sec -- random weights reject '
                                '~0.7/tok, trained ~0)',
                      'value': round(tps, 1),
                      'loop_steps_per_sec': round(sps, 1),
                      'unit': 'tokens/sec/chip'}), flush=True)


def sec_stage1_serve():
    # continuous batching for stage 1: 32 jobs through 16 per-element-clock
    # slots (refill-on-finish) vs the lockstep tail idle (idle_frac ~0.47
    # at B=16 worst case, BENCH_s1_attrib_r04)
    tps, detail = bench_stage1_serve()
    print(json.dumps({'metric': 'stage1 TXL CONTINUOUS batching (16 slots, '
                                '2x jobs, serve() refill on finish, '
                                'per-element cache clocks, bf16; accepted '
                                'tokens/sec)',
                      'value': round(tps, 1),
                      'detail': detail,
                      'unit': 'tokens/sec/chip'}), flush=True)


def _train_variants(variants):
    for batch, dtype, tag in variants:
        tps, mfu = bench_train_step(batch=batch, dtype=dtype)
        print(json.dumps({'metric': 'stage2 Performer train step '
                                    f'(fwd+bwd+Adam, B={batch}, L=3072, '
                                    f'{tag} compute / f32 master+Adam, '
                                    'Pallas fwd+bwd kernels)',
                          'value': round(tps, 1),
                          'unit': 'tokens/sec/chip',
                          'mfu': round(mfu, 4)}), flush=True)


def bench_stage1_serve(batch=16, n_jobs=32, max_events=384):
    """Stage-1 continuous batching vs its own lockstep (same generator
    config as bench_stage1_sampled_generation)."""
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
    gen = Stage1BatchGenerator(model, params, vocab, batch=batch,
                               max_events=max_events, max_bars=64,
                               functional=True)
    emos = (['Q1', 'Q2', 'Q3', 'Q4'] * ((n_jobs + 3) // 4))[:n_jobs]
    gen.serve(emos, seed=2)                              # compile
    t0 = time.perf_counter()
    _, stats = gen.serve(emos, seed=2)
    dt = time.perf_counter() - t0
    return (sum(stats['events']) / dt,
            {'chunks': stats['chunks'], 'jobs': n_jobs,
             'loop_tokens_per_sec': round(
                 (sum(stats['events']) + sum(stats['rejects'])) / dt, 1)})


def sec_train_f32():
    _train_variants([(4, jnp.float32, 'f32')])


def sec_train_bf16():
    _train_variants([(4, jnp.bfloat16, 'bf16'), (16, jnp.bfloat16, 'bf16'),
                     (32, jnp.bfloat16, 'bf16')])


SECTIONS = {
    'decode_txl': sec_decode_txl,
    'decode_performer': sec_decode_performer,
    'decode_gpt2': sec_decode_gpt2,
    'sampled_performer': sec_sampled_performer,
    'sampled_gpt2': sec_sampled_gpt2,
    'gpt2_ladder': sec_gpt2_ladder,
    'continuous': sec_continuous,
    'stage1_gen': sec_stage1_gen,
    'stage1_serve': sec_stage1_serve,
    'train_f32': sec_train_f32,
    'train_bf16': sec_train_bf16,
}


def main():
    """Orchestrate sections in FRESH subprocesses with one retry each.

    The axon relay can hang a single compile indefinitely (round 4: the
    GPT-2 decode section stalled a whole-matrix single process for 47
    minutes) and a crashed compile can poison the parent client
    (FAILED_PRECONDITION, CLAUDE.md) -- per-section isolation with a cap
    plus one fresh-process retry keeps one bad compile from starving the
    rest of the matrix.  Section output streams through as it completes."""
    import subprocess
    cap = float(os.environ.get('EMODIS_EXTRA_SECTION_TIMEOUT', '1500'))
    per_song = {}
    for name in SECTIONS:
        for attempt in (1, 2):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     '--sub', name],
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                    text=True, timeout=cap,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
            except subprocess.TimeoutExpired:
                print(json.dumps({'metric': f'section {name}',
                                  'error': f'timeout {int(cap)}s '
                                           f'(attempt {attempt})'}),
                      flush=True)
                continue
            for line in proc.stdout.splitlines():
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue
                print(line, flush=True)
                if obj.get('metric') == 'stage1_txl decode' \
                        and obj.get('batch') == 16:
                    per_song['s1'] = obj['value']
                if obj.get('metric') == 'stage2_performer decode' \
                        and obj.get('batch') == 16:
                    per_song['s2'] = obj['value']
            if proc.returncode == 0:
                break
            tail = ' | '.join(proc.stderr.strip().splitlines()[-4:])[-400:]
            print(json.dumps({'metric': f'section {name}',
                              'error': f'rc={proc.returncode} '
                                       f'(attempt {attempt}); {tail}'}),
                  flush=True)
    if 's1' in per_song and 's2' in per_song:
        # two-stage songs/min: ~512 stage-1 + ~3000 stage-2 tokens per song
        per = 512 / per_song['s1'] + 3000 / per_song['s2']
        print(json.dumps({'metric': 'two-stage songs/min (derived, B=16, '
                                    '512 s1 + 3000 s2 tokens/song)',
                          'value': round(60.0 / per, 1),
                          'unit': 'songs/min/chip'}), flush=True)


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--sub':
        SECTIONS[sys.argv[2]]()
    else:
        main()
