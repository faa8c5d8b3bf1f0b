"""Stage-1 batched-generation gap attribution (VERDICT r3 weak #2).

Round 3 measured the stage-1 serving loop at ~1.0k accepted tokens/sec at
B=16 vs 7.6k for its own raw decode — this bench decomposes the per-step
cost of the production loop (``infer/stage1_batch.py``) into:

  * the whole-cache einsum decode itself at the loop's REAL Kmax
    (``max_events + reject_slack`` = 1536, vs the raw bench's flash path);
  * nucleus sampling (one merged [B, V] sort after the round-4 key/main
    merge; the pre-merge two-sort variant is measured for the delta);
  * everything else (rule masks, one-hot output append, while_loop vs scan
    overhead) as the residual of the full loop;
  * the Kmax lever: the same loop with reject_slack=256 (Kmax=768).

Run on the chip: ``python bench_s1_attrib.py``.  Prints one JSON line per
measurement (ms/loop-step at B=16 and derived tokens/sec).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

VOCAB = 360
BATCH = 16
STEPS = 256
MAX_EVENTS = 512


def _force(x):
    return float(jnp.ravel(jnp.asarray(x, jnp.float32))[0])


def build():
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.utils.precision import cast_params
    model = PlainTransformer(vocab_size=VOCAB, n_layer=12, n_head=8,
                             d_model=512, d_ff=2048, d_embed=512,
                             dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32)))
    return model, params


def make_vocab():
    from emo_disentanger_tpu.core.vocab import Vocab
    events = ['Emotion_Q1', 'Emotion_Q2', 'Emotion_Q3', 'Emotion_Q4',
              'Key_C', 'Key_c', 'Bar_None', 'EOS_None',
              'Chord_I_M', 'Chord_V_7', 'Chord_None_None']
    events += [f'Beat_{b}' for b in range(16)]
    events += [f'Filler_{i}' for i in range(VOCAB - len(events) - 1)]
    events = sorted(set(events))
    return Vocab({e: i for i, e in enumerate(events)},
                 {i: e for i, e in enumerate(events)})


def scan_decode(model, params, cache_len, n_samples):
    """Greedy/sampled decode scan: einsum attention at the loop's Kmax.

    ``n_samples``: 0 = argmax only (pure decode floor), 1 = the merged
    single-sort nucleus, 2 = the pre-merge two-sort pattern."""
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.ops.sampling import nucleus_sample
    sample_v = jax.vmap(nucleus_sample, in_axes=(0, 0, 0, 0))

    def run(tok0, rng):
        cache = model.apply(params, BATCH, cache_len,
                            method=PlainTransformer.init_decode_cache)

        def step(carry, t):
            tok, cache, rng = carry
            logits, cache = model.apply(params, tok, t, cache,
                                        full_attention=True,
                                        method=PlainTransformer.decode_step)
            rng, sub = jax.random.split(rng)
            keys = jax.random.split(sub, BATCH)
            temp = jnp.full((BATCH,), 1.2)
            topp = jnp.full((BATCH,), 0.97)
            if n_samples == 0:
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
            elif n_samples == 1:
                tok = sample_v(keys, logits, temp, topp).astype(jnp.int32)
            else:
                a = sample_v(keys, logits, temp, topp)
                b = sample_v(keys, logits, temp * 0.9, topp)
                tok = jnp.where(t % 2 == 0, a, b).astype(jnp.int32)
            return (tok, cache, rng), ()

        (tok, _, _), _ = jax.lax.scan(
            step, (tok0, cache, rng), jnp.arange(STEPS, dtype=jnp.int32))
        return tok

    run_j = jax.jit(run)
    tok0 = jnp.ones((BATCH,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    _force(run_j(tok0, rng))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(run_j(tok0, rng))
    dt = (time.perf_counter() - t0) / reps
    return dt / STEPS * 1e3         # ms per loop step (B tokens each)


def full_loop(model, params, vocab, reject_slack, fast_slack=None):
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    gen = Stage1BatchGenerator(model, params, vocab, batch=BATCH,
                               max_events=MAX_EVENTS, max_bars=64,
                               functional=True, reject_slack=reject_slack,
                               fast_slack=fast_slack)
    emos = (['Q1', 'Q2', 'Q3', 'Q4'] * ((BATCH + 3) // 4))[:BATCH]
    # same seed as the timed run: compiles every ladder tier the timed
    # run will spill into (tiers build lazily on first use)
    gen.generate(emos, seed=2)                           # compile
    t0 = time.perf_counter()
    _, stats = gen.generate(emos, seed=2)
    dt = time.perf_counter() - t0
    # TRUE device iterations (lockstep runs until the slowest element is
    # done; mean productive steps understate per-iteration cost by the
    # idle tail — that tail is the round-4 "residual" mystery, resolved)
    iters = stats['iters']
    productive = (sum(stats['events']) + sum(stats['rejects'])) / BATCH
    stats['idle_frac'] = round(1.0 - productive / max(iters, 1), 3)
    return (dt / max(iters, 1) * 1e3,                    # ms per loop step
            sum(stats['events']) / dt,                   # accepted tok/s
            stats)


def main():
    model, params = build()
    vocab = make_vocab()
    out = {}

    for name, cache_len, n_samples in [
            ('decode_einsum_K1536', 1536, 0),
            ('decode_einsum_K1536_sample1', 1536, 1),
            ('decode_einsum_K1536_sample2', 1536, 2),
            ('decode_einsum_K768', 768, 0)]:
        ms = scan_decode(model, params, cache_len, n_samples)
        out[name] = ms
        print(json.dumps({'metric': f'stage1 attrib {name} (B=16 bf16 scan)',
                          'ms_per_step': round(ms, 3),
                          'tokens_per_sec': round(BATCH / ms * 1e3, 1)}))

    for name, slack, fast in [('loop_full_K1536', 1024, None),
                              ('loop_full_K768', 256, None),
                              ('loop_tiered_768_1536', 1024, 256)]:
        ms, tps, stats = full_loop(model, params, vocab, slack, fast)
        out[name] = ms
        print(json.dumps({
            'metric': f'stage1 attrib {name} (production while_loop, B=16)',
            'ms_per_step': round(ms, 3),
            'accepted_tokens_per_sec': round(tps, 1),
            'loop_tokens_per_sec': round(BATCH / ms * 1e3, 1),
            'resumed': stats.get('resumed', 0),
            'device_iters': stats['iters'],
            # fraction of slot-steps spent on elements that already
            # finished (or are re-feeding rejects): the lockstep tail
            'idle_frac': stats['idle_frac'],
            'reject_rate': round(sum(stats['rejects'])
                                 / max(sum(stats['events']), 1), 3)}))

    dec = out['decode_einsum_K1536']
    samp = out['decode_einsum_K1536_sample1'] - dec
    resid = out['loop_full_K1536'] - out['decode_einsum_K1536_sample1']
    print(json.dumps({
        'metric': 'stage1 attrib summary (ms per loop step, B=16)',
        'decode': round(dec, 3),
        'sampling_merged': round(samp, 3),
        'sampling_two_sort_delta': round(
            out['decode_einsum_K1536_sample2']
            - out['decode_einsum_K1536_sample1'], 3),
        'rules_buffers_loop_residual': round(resid, 3),
        'kmax_768_decode_saving': round(
            dec - out['decode_einsum_K768'], 3)}))


if __name__ == '__main__':
    main()
