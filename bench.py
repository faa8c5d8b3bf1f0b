"""Benchmark: one-chip headline numbers (driver contract).

Primary metric: stage-2 Performer decode throughput — serving configuration
(bfloat16 weights, B=16 batched songs, greedy scan over the O(1)-state decode
path carrying per-layer FAVOR+ (S, z)).

``vs_baseline`` compares against an in-framework reimplementation of the
reference's decode strategy — one full forward of the last-2048-token window
per generated token (``stage2_accompaniment/inference.py:250-257``) — run at
the SAME batch size and precision on the SAME chip, so the ratio isolates the
algorithmic speedup of carrying state instead of re-encoding the window.

Robustness contract (round 3): every sub-benchmark runs in a FRESH
subprocess.  A crashed remote-compile subprocess can leave the parent JAX
client in a transient ``FAILED_PRECONDITION`` state that only a new process
recovers from (see CLAUDE.md), so the B=16 primary is retried once in another
fresh process before any fallback, and any failure's stderr tail is embedded
in the output JSON under ``error`` — degraded runs are self-explaining.

The ``extra`` object carries the other driver-verified headline metrics:
  * stage-2 Performer train step (fwd+bwd+Adam, B=16, L=3072, bf16 compute /
    f32 master weights + Adam) in tokens/sec and MFU vs the v5e bf16 peak;
  * stage-1 TXL decode (KV-cache flash-decode, B=16, bf16);
  * stage-2 GPT-2 decode (KV cache, B=16, bf16);
  * stage-2 batched sampled generation (the real serving loop: nucleus
    sampling + rejection rules + teacher-forced bars on device, B=16).

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": x,
   "extra": {...}}
"""

import json
import os
import subprocess
import sys
import time

VOCAB = 360
DECODE_STEPS = 512
WINDOW = 2048
BATCH = 16


# --------------------------------------------------------------------------
# sub-benchmarks (each runs in its own process via `python bench.py --sub X`)
# --------------------------------------------------------------------------

def build_model(dtype=None):
    import jax
    import jax.numpy as jnp
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.utils.precision import cast_params
    dtype = dtype or jnp.bfloat16
    model = MusicPerformer(n_token=VOCAB, n_layer=12, n_head=8, d_model=512,
                           d_ff=2048, d_embed=512, dropout=0.1, favor_dims=128,
                           use_segment_emb=True, n_segment_types=2, dtype=dtype)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 8), dtype=jnp.int32), omegas,
                        jnp.zeros((1, 8), dtype=jnp.int32))
    if dtype == jnp.bfloat16:
        params = cast_params(params)
    return model, params, omegas


def bench_state_decode(model, params, omegas, batch=BATCH,
                       n_steps=DECODE_STEPS):
    """Our decode: greedy scan over decode_step with carried (S, z)."""
    import jax
    import jax.numpy as jnp
    from emo_disentanger_tpu.models.performer import MusicPerformer

    def run(tok0):
        state = model.apply(params, batch,
                            method=MusicPerformer.init_decode_state)

        def step(carry, t):
            tok, state = carry
            logits, state = model.apply(params, tok, jnp.zeros_like(tok), t,
                                        omegas, state,
                                        method=MusicPerformer.decode_step)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (tok, state), tok

        (_, _), toks = jax.lax.scan(step, (tok0, state),
                                    jnp.arange(n_steps, dtype=jnp.int32))
        return toks

    run_j = jax.jit(run)
    tok0 = jnp.ones((batch,), dtype=jnp.int32)
    int(run_j(tok0)[-1, 0])                         # compile + force
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        # force a host readback: block_until_ready does not reliably
        # synchronize through the axon relay
        int(run_j(tok0)[-1, 0])
    dt = (time.perf_counter() - t0) / reps
    return batch * n_steps / dt


def bench_reference_style(model, params, omegas, batch=BATCH,
                          ctx_len=WINDOW, n_tokens=6):
    """Reference decode cost: one full forward of the context window per
    token, keep_last_only (no cache), same batch and precision."""
    import jax
    import jax.numpy as jnp

    def one_token(tokens):
        return model.apply(params, tokens, omegas,
                           jnp.zeros_like(tokens), keep_last_only=True)

    fwd = jax.jit(one_token)
    tokens = jnp.ones((batch, ctx_len), dtype=jnp.int32)
    float(fwd(tokens)[0, 0])                        # compile + force
    t0 = time.perf_counter()
    for _ in range(n_tokens):
        float(fwd(tokens)[0, 0])                    # host readback sync
    dt = (time.perf_counter() - t0) / n_tokens
    return batch / dt


def sub_primary(batch, n_steps, ctx_len, n_ref_tokens):
    model, params, omegas = build_model()
    ours = bench_state_decode(model, params, omegas, batch=batch,
                              n_steps=n_steps)
    ref = bench_reference_style(model, params, omegas, batch=batch,
                                ctx_len=ctx_len, n_tokens=n_ref_tokens)
    return {'ours': ours, 'ref': ref}


def sub_train():
    import jax.numpy as jnp
    import bench_extra
    tps, mfu = bench_extra.bench_train_step(batch=16, seqlen=3072,
                                            dtype=jnp.bfloat16)
    return {'tps': tps, 'mfu': mfu}


SUBS = {
    'primary_b16': lambda: sub_primary(BATCH, DECODE_STEPS, WINDOW, 6),
    'primary_b4': lambda: sub_primary(4, 256, 1024, 4),
    'train': sub_train,
    'txl': lambda: {'tps': __import__('bench_extra').bench_txl(16)},
    'gpt2': lambda: {'tps': __import__('bench_extra').bench_gpt2(16)},
    'sampled_gen': lambda: {
        'tps': __import__('bench_extra').bench_sampled_generation()},
    'fused_check': lambda: dict(zip(
        ('max_abs_logit_err', 'argmax_agreement'),
        __import__('bench_extra').check_fused_decode())),
}


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def run_sub(name, timeout=1500):
    """Run one sub-benchmark in a fresh python process.

    Returns (result_dict_or_None, error_string_or_None)."""
    cmd = [sys.executable, os.path.abspath(__file__), '--sub', name]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout,
                              cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None, f'{name}: timeout after {timeout}s'
    # the result is the last stdout line that parses as JSON (jax warnings
    # may precede it)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict) and obj.get('__sub__') == name:
            return obj['result'], None
    tail = (proc.stderr or proc.stdout or '').strip().splitlines()[-8:]
    return None, f'{name}: rc={proc.returncode}; ' + ' | '.join(tail)[-500:]


def main():
    errors = {}

    # primary: B=16, retried once in a fresh process (transient
    # FAILED_PRECONDITION after a crashed compile recovers in a new process)
    primary, err = run_sub('primary_b16')
    if primary is None:
        errors['primary_b16_try1'] = err
        primary, err = run_sub('primary_b16')
        if primary is None:
            errors['primary_b16_try2'] = err

    if primary is not None:
        result = {
            'metric': 'stage2 Performer decode throughput '
                      '(12L/512d, bf16, greedy, B=16, vs window re-forward at '
                      'equal batch/precision)',
            'value': round(primary['ours'], 2),
            'unit': 'tokens/sec/chip',
            'vs_baseline': round(primary['ours'] / primary['ref'], 2),
        }
    else:
        fallback, err = run_sub('primary_b4')
        if fallback is None:
            errors['primary_b4'] = err
            result = {
                'metric': 'stage2 Performer decode throughput (FAILED)',
                'value': 0.0,
                'unit': 'tokens/sec/chip',
                'vs_baseline': 0.0,
            }
        else:
            result = {
                'metric': 'stage2 Performer decode throughput '
                          '(12L/512d, bf16, greedy, B=4 fallback, vs window '
                          're-forward at equal batch/precision)',
                'value': round(fallback['ours'], 2),
                'unit': 'tokens/sec/chip',
                'vs_baseline': round(fallback['ours'] / fallback['ref'], 2),
            }

    extra = {}
    sub, err = run_sub('train')
    if sub is not None:
        extra['train_step_B16_L3072_bf16_tokens_per_sec'] = round(sub['tps'], 1)
        extra['train_step_B16_L3072_bf16_mfu'] = round(sub['mfu'], 4)
    else:
        errors['train'] = err
    sub, err = run_sub('txl')
    if sub is not None:
        extra['stage1_txl_decode_B16_tokens_per_sec'] = round(sub['tps'], 1)
    else:
        errors['txl'] = err
    sub, err = run_sub('gpt2')
    if sub is not None:
        extra['stage2_gpt2_decode_B16_tokens_per_sec'] = round(sub['tps'], 1)
    else:
        errors['gpt2'] = err
    sub, err = run_sub('sampled_gen')
    if sub is not None:
        extra['stage2_sampled_generation_B16_tokens_per_sec'] = \
            round(sub['tps'], 1)
    else:
        errors['sampled_gen'] = err
    sub, err = run_sub('fused_check')
    if sub is not None:
        extra['fused_decode_max_abs_logit_err'] = \
            round(sub['max_abs_logit_err'], 5)
        extra['fused_decode_argmax_agreement'] = \
            round(sub['argmax_agreement'], 4)
    else:
        errors['fused_check'] = err

    result['extra'] = extra
    if errors:
        result['error'] = errors
    print(json.dumps(result))


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--sub':
        name = sys.argv[2]
        out = SUBS[name]()
        print(json.dumps({'__sub__': name, 'result': out}))
    else:
        main()
