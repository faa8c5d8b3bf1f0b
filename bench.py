"""Benchmark: one-chip headline numbers (driver contract).

Primary metric: stage-2 Performer decode throughput — serving configuration
(bfloat16 weights, B=16 batched songs, greedy scan over the O(1)-state decode
path carrying per-layer FAVOR+ (S, z)).

``vs_baseline`` compares against an in-framework reimplementation of the
reference's decode strategy — one full forward of the last-2048-token window
per generated token (``stage2_accompaniment/inference.py:250-257``) — run at
the SAME batch size and precision on the SAME chip, so the ratio isolates the
algorithmic speedup of carrying state instead of re-encoding the window.

The ``extra`` object carries the other driver-verified headline metrics:
  * stage-2 Performer train step (fwd+bwd+Adam, B=16, L=3072, bf16 compute /
    f32 master weights + Adam) in tokens/sec and MFU vs the v5e bf16 peak;
  * stage-1 TXL decode (KV-cache flash-decode, B=16, bf16);
  * stage-2 GPT-2 decode (KV cache, B=16, bf16).

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": x,
   "extra": {...}}
"""

import json
import time

import jax
import jax.numpy as jnp

VOCAB = 360
DECODE_STEPS = 512
WINDOW = 2048
BATCH = 16


def build_model(dtype=jnp.bfloat16):
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.utils.precision import cast_params
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


def extra_metrics():
    """Secondary driver-verified metrics; failures degrade to partial data
    rather than breaking the primary contract."""
    import bench_extra
    extra = {}
    try:
        tps, mfu = bench_extra.bench_train_step(batch=16, seqlen=3072,
                                                dtype=jnp.bfloat16)
        extra['train_step_B16_L3072_bf16_tokens_per_sec'] = round(tps, 1)
        extra['train_step_B16_L3072_bf16_mfu'] = round(mfu, 4)
    except Exception as e:                            # pragma: no cover
        extra['train_step_error'] = str(e)[:200]
    try:
        extra['stage1_txl_decode_B16_tokens_per_sec'] = round(
            bench_extra.bench_txl(16), 1)
    except Exception as e:                            # pragma: no cover
        extra['stage1_txl_error'] = str(e)[:200]
    try:
        extra['stage2_gpt2_decode_B16_tokens_per_sec'] = round(
            bench_extra.bench_gpt2(16), 1)
    except Exception as e:                            # pragma: no cover
        extra['stage2_gpt2_error'] = str(e)[:200]
    return extra


def main():
    model, params, omegas = build_model()
    try:
        ours = bench_state_decode(model, params, omegas)
        ref = bench_reference_style(model, params, omegas)
        result = {
            'metric': 'stage2 Performer decode throughput '
                      '(12L/512d, bf16, greedy, B=16, vs window re-forward at '
                      'equal batch/precision)',
            'value': round(ours, 2),
            'unit': 'tokens/sec/chip',
            'vs_baseline': round(ours / ref, 2),
        }
    except Exception:
        # fallback: smaller shapes so a compile hiccup through the remote
        # relay still yields the one-line JSON contract
        ours = bench_state_decode(model, params, omegas, batch=4, n_steps=256)
        ref = bench_reference_style(model, params, omegas, batch=4,
                                    ctx_len=1024, n_tokens=4)
        result = {
            'metric': 'stage2 Performer decode throughput '
                      '(12L/512d, bf16, greedy, B=4 fallback, vs window '
                      're-forward at equal batch/precision)',
            'value': round(ours, 2),
            'unit': 'tokens/sec/chip',
            'vs_baseline': round(ours / ref, 2),
        }
    result['extra'] = extra_metrics()
    print(json.dumps(result))


if __name__ == '__main__':
    main()
