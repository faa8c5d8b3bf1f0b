"""Stage-1 decode-path cost: flash (chunked, prefix-proportional) vs
full-cache einsum (the compile-safe B>=8 fallback) at the two serving
regimes — lead_sheet (Kmax~1024) and full_song (Kmax~4096, reference
``stage1_compose/inference.py:133-137``).

Measures per-token decode cost of the 12L TXL KV-cache step inside a scan,
at early (t ~ 256) and late (t ~ Kmax-256) prefix fills, B=16 bf16.  Also
re-probes whether the full batched sampling while_loop compiles with the
flash path (the round-2 axon AOT SIGABRT) — rc/status embedded in the JSON.

Prints one JSON line.
"""

import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

VOCAB = 360
BATCH = 16
STEPS = 256


def _force(x):
    return float(jnp.ravel(x)[0])


_BUILT = None


def build():
    """One shared model+params (independent of cache_len)."""
    global _BUILT
    if _BUILT is None:
        from emo_disentanger_tpu.models import PlainTransformer
        from emo_disentanger_tpu.utils.precision import cast_params
        model = PlainTransformer(vocab_size=VOCAB, n_layer=12, n_head=8,
                                 d_model=512, d_ff=2048, d_embed=512,
                                 dtype=jnp.bfloat16)
        params = cast_params(model.init(jax.random.PRNGKey(0),
                                        jnp.ones((1, 8), jnp.int32)))
        _BUILT = (model, params)
    return _BUILT


def bench_decode(cache_len, t0, full_attention):
    """Per-token decode seconds with the cache clock starting at t0."""
    from emo_disentanger_tpu.models import PlainTransformer
    model, params = build()

    def run(tok0):
        cache = model.apply(params, BATCH, cache_len,
                            method=PlainTransformer.init_decode_cache)

        def step(carry, t):
            tok, cache = carry
            logits, cache = model.apply(params, tok, t, cache,
                                        full_attention=full_attention,
                                        method=PlainTransformer.decode_step)
            return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()

        (tok, _), _ = jax.lax.scan(
            step, (tok0, cache),
            jnp.arange(t0, t0 + STEPS, dtype=jnp.int32))
        return tok

    run_j = jax.jit(run)
    tok0 = jnp.ones((BATCH,), jnp.int32)
    _force(run_j(tok0))
    reps = 3
    t = time.perf_counter()
    for _ in range(reps):
        _force(run_j(tok0))
    dt = (time.perf_counter() - t) / reps
    return dt / STEPS


def probe_batched_loop_compile(full_attention, timeout=900):
    """Does the FULL batched sampling while_loop compile+run on this
    backend with the given attention path?  Fresh subprocess (a SIGABRT in
    the AOT helper must not kill the bench)."""
    code = f"""
import jax, jax.numpy as jnp
from emo_disentanger_tpu.core.vocab import Vocab
from emo_disentanger_tpu.models import PlainTransformer
from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
from emo_disentanger_tpu.utils.precision import cast_params
events = ['Emotion_Q1','Emotion_Q2','Key_C','Key_c','Bar_None','EOS_None',
          'Chord_I_M','Chord_V_7','Chord_None_None']
events += ['Beat_%d' % b for b in range(16)]
events += ['Filler_%d' % i for i in range({VOCAB} - len(events) - 1)]
events = sorted(set(events))
vocab = Vocab({{e: i for i, e in enumerate(events)}},
              {{i: e for i, e in enumerate(events)}})
model = PlainTransformer(vocab_size=vocab.size, n_layer=12, n_head=8,
                         d_model=512, d_ff=2048, d_embed=512,
                         dtype=jnp.bfloat16)
params = cast_params(model.init(jax.random.PRNGKey(0),
                                jnp.ones((1, 8), jnp.int32)))
gen = Stage1BatchGenerator(model, params, vocab, batch={BATCH},
                           max_events=384, max_bars=64,
                           full_attention={full_attention})
emos = (['Q1', 'Q2'] * {BATCH})[:{BATCH}]
songs, stats = gen.generate(emos, seed=1)
print('PROBE_OK', sum(stats['events']))
"""
    try:
        proc = subprocess.run([sys.executable, '-c', code],
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {'ok': False, 'why': f'timeout {timeout}s'}
    if proc.returncode == 0 and 'PROBE_OK' in proc.stdout:
        return {'ok': True}
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-4:]
    return {'ok': False,
            'why': f'rc={proc.returncode}; ' + ' | '.join(tail)[-300:]}


def main():
    out = {'metric': 'stage1 TXL decode per-token cost, flash vs full-cache '
                     'einsum (B=16, bf16, 12L/512d)',
           'unit': 'us/token', 'points': {}}
    for cache_len, t0s in [(1024, (0, 768)), (4096, (0, 3840))]:
        for t0 in t0s:
            for name, fa in [('flash', False), ('full', True)]:
                key = f'K{cache_len}_t{t0}_{name}'
                sec = bench_decode(cache_len, t0, fa)
                out['points'][key] = round(sec * 1e6, 1)
    # derived: late-prefix full/flash ratio at the full_song regime
    p = out['points']
    out['full_vs_flash_K4096_late'] = round(
        p['K4096_t3840_full'] / p['K4096_t3840_flash'], 2)
    out['full_vs_flash_K4096_early'] = round(
        p['K4096_t0_full'] / p['K4096_t0_flash'], 2)
    # headline value is the late-prefix full/flash RATIO (the per-point
    # latencies in 'points' carry the us/token unit)
    out['value'] = out['full_vs_flash_K4096_late']
    out['value_unit'] = 'ratio (full/flash per-token cost, K=4096 late)'

    out['batched_loop_flash_B16'] = probe_batched_loop_compile(False)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
