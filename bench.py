"""Benchmark: one-chip headline numbers (driver contract).

Primary metric: stage-2 Performer decode throughput — serving configuration
(bfloat16 weights, B=16 batched songs, greedy scan over the O(1)-state decode
path carrying per-layer FAVOR+ (S, z)).

``vs_baseline`` compares against an in-framework reimplementation of the
reference's decode strategy — one full forward of the last-2048-token window
per generated token (``stage2_accompaniment/inference.py:250-257``) — run at
the SAME batch size and precision on the SAME chip, so the ratio isolates the
algorithmic speedup of carrying state instead of re-encoding the window.

Budget contract (round 4 — rounds 2 and 3 both lost the driver artifact to
wall-clock overrun): the orchestrator has a GLOBAL deadline
(``EMODIS_BENCH_DEADLINE`` seconds, default 1380 — a full timing pass on
the chip measured ~1100-1300s worst case) and ALWAYS prints its one JSON
line before it.  Three layers of protection:

  1. every sub-benchmark runs in a fresh subprocess whose timeout is clipped
     to the remaining budget; extras run in priority order and are SKIPPED
     (recorded as such) when the remainder is too small for them;
  2. after every sub the cumulative result is written to
     ``BENCH_progress.json`` next to this file, so even a SIGKILL leaves
     on-disk evidence of everything that completed;
  3. SIGTERM/SIGINT print the cumulative result line before exiting — the
     driver's ``timeout`` sends SIGTERM first, and the driver parses the
     last JSON line of the stdout tail, so even a driver-level timeout
     (rc=124) still certifies whatever ran;
  4. failed extras get ONE budget-permitting retry in another fresh
     process after the plan completes (relay compile latency varies
     230s->480s+ between processes for the same sub, so retrying beats
     raising caps).

The fresh-subprocess rule also keeps the round-2 robustness contract: a
crashed remote-compile subprocess can leave the parent JAX client in a
transient ``FAILED_PRECONDITION`` state that only a new process recovers
from (see CLAUDE.md), so the B=16 primary is retried once in another fresh
process before any fallback, and failures' stderr tails are embedded under
``errors``.

Extras, in priority order (highest first):
  * stage-2 Performer train step (fwd+bwd+Adam, B=16, L=3072, bf16 compute /
    f32 master+Adam) in tokens/sec and MFU vs the v5e bf16 peak;
  * stage-2 batched sampled generation (the real serving loop: nucleus
    sampling + rejection rules + teacher-forced bars on device, B=16);
  * two-stage songs/min MEASURED end-to-end (stage-1 lead sheets ->
    roman.txt -> stage-2 -> .mid incl. file IO; the reference's serving
    contract, ``stage2_accompaniment/inference.py:422-485``);
  * stage-1 TXL decode (KV-cache, B=16, bf16);
  * stage-2 GPT-2 decode (KV cache, B=16, bf16).

(The fused-decode accuracy A/B of round 3 was dropped from the driver run —
it spent scarce budget checking a kernel that is off by default; it remains
available via ``bench_extra.check_fused_decode``.)

Prints ONE JSON line:
  {"metric": ..., "value": tokens/sec/chip, "unit": ..., "vs_baseline": x,
   "extra": {...}, "elapsed": {...}, "skipped": [...]}
"""

import json
import os
import signal
import subprocess
import sys
import time

VOCAB = 360
DECODE_STEPS = 512
WINDOW = 2048
BATCH = 16

HERE = os.path.dirname(os.path.abspath(__file__))
DEADLINE = float(os.environ.get('EMODIS_BENCH_DEADLINE', '1380'))
RESERVE = 20.0          # budget slice kept for the final print
PROGRESS_PATH = os.path.join(HERE, 'BENCH_progress.json')

_T0 = time.monotonic()


def _remaining():
    return DEADLINE - (time.monotonic() - _T0) - RESERVE


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
    """Our decode: greedy scan over decode_step with carried (S, z).

    EMODIS_PERF_STATE_LAYOUT selects the FAVOR S layout ('dm' default
    since the round-5 on-chip A/B measured it 1.95x over 'md' at B=16;
    see models.performer.init_decode_state)."""
    import jax
    import jax.numpy as jnp
    from emo_disentanger_tpu.models.performer import MusicPerformer
    layout = os.environ.get('EMODIS_PERF_STATE_LAYOUT', 'dm')

    def run(tok0):
        state = model.apply(params, batch, layout,
                            method=MusicPerformer.init_decode_state)

        def step(carry, t):
            tok, state = carry
            logits, state = model.apply(params, tok, jnp.zeros_like(tok), t,
                                        omegas, state, state_layout=layout,
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
    out = {'ours': ours, 'ref': ref}
    layout = os.environ.get('EMODIS_PERF_STATE_LAYOUT', 'dm')
    if layout != 'dm':
        out['state_layout'] = layout    # flag a non-default-layout artifact
    return out


def sub_train():
    import jax.numpy as jnp
    import bench_extra
    tps, mfu = bench_extra.bench_train_step(batch=16, seqlen=3072,
                                            dtype=jnp.bfloat16)
    return {'tps': tps, 'mfu': mfu}


def sub_e2e():
    import bench_e2e
    return bench_e2e.quick_random()


def sub_probe():
    """Tiny-jit relay health check: distinguishes 'relay/tunnel wedged'
    (observed round 4: a mid-compile kill hung even jax.devices() for
    hours) from framework-level slowness in the artifact."""
    import time as _t
    import jax
    import jax.numpy as jnp
    t0 = _t.monotonic()
    x = jax.jit(lambda a: a * 2 + 1)(jnp.ones((8, 8)))
    float(x[0, 0])
    return {'ok': True, 'secs': round(_t.monotonic() - t0, 1),
            'platform': jax.devices()[0].platform}


SUBS = {
    'probe': sub_probe,
    'primary_b16': lambda: sub_primary(BATCH, DECODE_STEPS, WINDOW, 6),
    'primary_b4': lambda: sub_primary(4, 256, 1024, 4),
    'train': sub_train,
    'txl': lambda: {'tps': __import__('bench_extra').bench_txl(16)},
    'gpt2': lambda: {'tps': __import__('bench_extra').bench_gpt2(16)},
    'sampled_gen': lambda: {
        'tps': __import__('bench_extra').bench_sampled_generation()},
    'e2e': sub_e2e,
}


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

RESULT = {
    'metric': 'stage2 Performer decode throughput (PENDING)',
    'value': 0.0,
    'unit': 'tokens/sec/chip',
    'vs_baseline': 0.0,
    'extra': {},
    'elapsed': {},
    'skipped': [],
}
_PRINTED = False
_CHILD = None


def _emit():
    global _PRINTED
    if _PRINTED:
        return
    _PRINTED = True
    if not RESULT['skipped']:
        del RESULT['skipped']
    if not RESULT.get('errors'):
        RESULT.pop('errors', None)
    RESULT['elapsed']['total'] = round(time.monotonic() - _T0, 1)
    print(json.dumps(RESULT), flush=True)


def _write_progress():
    try:
        snap = dict(RESULT)
        snap['elapsed'] = dict(RESULT['elapsed'],
                               total=round(time.monotonic() - _T0, 1))
        with open(PROGRESS_PATH, 'w') as f:
            json.dump(snap, f, indent=1)
    except OSError:
        pass


def _on_signal(signum, frame):
    global _CHILD
    if _CHILD is not None and _CHILD.poll() is None:
        try:
            _CHILD.kill()
        except OSError:
            pass
    RESULT.setdefault('errors', {})['_signal'] = (
        f'killed by signal {signum} at t={round(time.monotonic() - _T0, 1)}s')
    _emit()
    _write_progress()
    os._exit(0)


def run_sub(name, timeout):
    """Run one sub-benchmark in a fresh python process.

    Returns (result_dict_or_None, error_string_or_None, elapsed_secs)."""
    global _CHILD
    cmd = [sys.executable, os.path.abspath(__file__), '--sub', name]
    t0 = time.monotonic()
    try:
        _CHILD = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, text=True,
                                  cwd=HERE)
        try:
            out, err_out = _CHILD.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            _CHILD.kill()
            _CHILD.communicate()
            return (None, f'{name}: timeout after {int(timeout)}s',
                    time.monotonic() - t0)
        rc = _CHILD.returncode
    finally:
        _CHILD = None
    elapsed = time.monotonic() - t0
    # the result is the last stdout line that parses as JSON (jax warnings
    # may precede it)
    for line in reversed((out or '').strip().splitlines()):
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict) and obj.get('__sub__') == name:
            return obj['result'], None, elapsed
    tail = (err_out or out or '').strip().splitlines()[-8:]
    return None, f'{name}: rc={rc}; ' + ' | '.join(tail)[-500:], elapsed


def _record(name, res, err, elapsed):
    RESULT['elapsed'][name] = round(elapsed, 1)
    if err is not None:
        RESULT.setdefault('errors', {})[name] = err
    _write_progress()


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    RESULT['deadline_secs'] = DEADLINE
    _write_progress()   # clobber any stale progress file immediately

    # ---- relay preflight: a trivial jit in a fresh process.  Failure
    # here means the tunnel is wedged (round-4 failure mode: BENCH_r04 lost
    # every sub to a wedged relay).  The wedge SELF-RECOVERS, so the probe
    # retries with backoff — burning probe budget beats a guaranteed-zero
    # artifact, and a recorded probe trail distinguishes a dead relay from
    # a framework regression.  The probe stays advisory: the primary is
    # attempted either way.
    probe = None
    for cap, backoff in ((120.0, 30), (180.0, 60), (240.0, 0)):
        if _remaining() < cap + 120:     # keep at least one primary slot
            break
        probe, err, elapsed = run_sub('probe', cap)
        _record(f'probe@{int(time.monotonic() - _T0)}s', probe, err, elapsed)
        if probe is not None:
            RESULT['extra']['relay_probe_secs'] = probe['secs']
            break
        if backoff and _remaining() > backoff + 240:
            time.sleep(backoff)

    # ---- primary: B=16, one retry in a fresh process (transient
    # FAILED_PRECONDITION after a crashed compile recovers in a new process)
    primary = None
    for attempt in ('try1', 'try2'):
        budget = _remaining()
        if budget < 120:
            RESULT['skipped'].append(f'primary_b16_{attempt}')
            break
        primary, err, elapsed = run_sub('primary_b16', min(480.0, budget))
        _record(f'primary_b16_{attempt}', primary, err, elapsed)
        if primary is not None:
            break

    if primary is not None:
        RESULT.update({
            'metric': 'stage2 Performer decode throughput '
                      '(12L/512d, bf16, greedy, B=16, vs window re-forward at '
                      'equal batch/precision)',
            'value': round(primary['ours'], 2),
            'vs_baseline': round(primary['ours'] / primary['ref'], 2),
        })
    else:
        budget = _remaining()
        fallback = None
        if budget >= 120:
            fallback, err, elapsed = run_sub('primary_b4', min(360.0, budget))
            _record('primary_b4', fallback, err, elapsed)
        else:
            RESULT['skipped'].append('primary_b4')
        if fallback is not None:
            RESULT.update({
                'metric': 'stage2 Performer decode throughput '
                          '(12L/512d, bf16, greedy, B=4 fallback, vs window '
                          're-forward at equal batch/precision)',
                'value': round(fallback['ours'], 2),
                'vs_baseline': round(fallback['ours'] / fallback['ref'], 2),
            })
        else:
            RESULT['metric'] = 'stage2 Performer decode throughput (FAILED)'
    _write_progress()

    # ---- extras, in priority order; each skipped when the remaining budget
    # is below its minimum useful allotment
    def extract_train(sub):
        return {
            'train_step_B16_L3072_bf16_tokens_per_sec': round(sub['tps'], 1),
            'train_step_B16_L3072_bf16_mfu': round(sub['mfu'], 4)}

    def extract_e2e(sub):
        out = {'two_stage_songs_per_min_measured_e2e': sub['songs_per_min']}
        for k in ('wall_seconds', 'songs', 'stage1_reject_rate',
                  'stage2_reject_rate', 'midi_files'):
            if k in sub.get('detail', {}):
                out[f'e2e_{k}'] = sub['detail'][k]
        return out

    plan = [
        # (name, cap_secs, min_secs, extractor).  e2e runs directly after
        # train: the two-stage songs/min is the north-star serving metric
        # (BASELINE.json headline) and must not be starved by slower extras
        ('train', 360, 90, extract_train),
        ('e2e', 480, 150, extract_e2e),
        ('sampled_gen', 420, 120,
         lambda s: {'stage2_sampled_generation_B16_tokens_per_sec':
                    round(s['tps'], 1)}),
        # the flash-decode compiles exceeded 300s caps on the round-4
        # timing pass; these run last and may be skipped near the deadline
        ('txl', 480, 120,
         lambda s: {'stage1_txl_decode_B16_tokens_per_sec':
                    round(s['tps'], 1)}),
        ('gpt2', 480, 120,
         lambda s: {'stage2_gpt2_decode_B16_tokens_per_sec':
                    round(s['tps'], 1)}),
    ]
    for name, cap, min_secs, extract in plan:
        budget = _remaining()
        if budget < min_secs:
            RESULT['skipped'].append(name)
            _write_progress()
            continue
        sub, err, elapsed = run_sub(name, min(float(cap), budget))
        _record(name, sub, err, elapsed)
        if sub is not None:
            RESULT['extra'].update(extract(sub))
            _write_progress()

    # ---- budget-permitting second pass over failed extras.  Remote-compile
    # latency varies wildly BETWEEN fresh processes for the same sub (230s
    # vs >480s measured, CLAUDE.md), so the fix for a timeout is another
    # fresh process, not a longer cap.
    for name, cap, min_secs, extract in plan:
        if name not in RESULT.get('errors', {}):
            continue
        budget = _remaining()
        if budget < min_secs:
            RESULT['skipped'].append(f'{name}_retry')
            _write_progress()
            continue
        sub, err, elapsed = run_sub(name, min(float(cap), budget))
        _record(f'{name}_retry', sub, err, elapsed)
        if sub is not None:
            RESULT['errors'].pop(name, None)
            RESULT['extra'].update(extract(sub))
            _write_progress()

    _emit()
    _write_progress()


if __name__ == '__main__':
    if len(sys.argv) >= 3 and sys.argv[1] == '--sub':
        name = sys.argv[2]
        out = SUBS[name]()
        print(json.dumps({'__sub__': name, 'result': out}))
    else:
        main()
