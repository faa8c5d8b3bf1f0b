"""Training-step time attribution for the MFU analysis (VERDICT r2 weak #4).

Times the stage-2 Performer train step (fwd+bwd+Adam) at B=32/L=3072 bf16 in
two configurations:
  1. full — the production step (fused-FAVOR Pallas fwd + Pallas bwd);
  2. no_attn — attention output replaced by v (projections kept, kernels
     skipped): isolates what the linear-attention kernels + their
     surrounding copies cost.

The finer per-op decomposition (GEMM share, dropout, layout copies) comes
from the jax.profiler device trace — see ROOFLINE.md.

Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

VOCAB = 360
B, L = 32, 3072


def _force(x):
    return float(jnp.ravel(x)[0])


def time_step(patch=None, reps=5):
    """Build the production train step, optionally with a patched
    attention/ff, and return secs/step."""
    from emo_disentanger_tpu.models import performer as perf_mod
    from emo_disentanger_tpu.models import MusicPerformer
    from emo_disentanger_tpu.train import (
        OptimizerConfig, make_optimizer, make_train_step, init_train_state,
        stage2_performer_loss_fn)
    from emo_disentanger_tpu.parallel.mesh import make_mesh, shard_batch
    from emo_disentanger_tpu.train.trainer import dropout_rng

    assert patch in (None, 'no_attn'), patch
    saved = None
    if patch == 'no_attn':
        saved = perf_mod.favor_causal_attention
        perf_mod.favor_causal_attention = lambda q, k, v, omega: v
    try:
        model = MusicPerformer(n_token=VOCAB, n_layer=12, n_head=8,
                               d_model=512, d_ff=2048, d_embed=512,
                               favor_dims=128, dtype=jnp.bfloat16)
        omegas = model.draw_omegas(jax.random.PRNGKey(1))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 8), jnp.int32), omegas,
                            jnp.zeros((1, 8), jnp.int32))
        mesh = make_mesh()
        optimizer = make_optimizer(OptimizerConfig())
        state = init_train_state(params, optimizer)
        step = make_train_step(stage2_performer_loss_fn(model, VOCAB - 1),
                               optimizer, mesh)
        rng = np.random.RandomState(0)
        batch = shard_batch(mesh, {
            'dec_inp': rng.randint(0, VOCAB - 1, (B, L)).astype('int32'),
            'dec_tgt': rng.randint(0, VOCAB - 1, (B, L)).astype('int32'),
            'track_mask': (rng.random((B, L)) > 0.5).astype('int32'),
            'chord_idx': np.zeros((B, L), 'int32'),
            'melody_idx': np.zeros((B, L), 'int32'),
        })
        extras = {'omegas': omegas}
        k = dropout_rng(2)
        state, loss, _ = step(state, batch, k, extras)
        _force(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, loss, _ = step(state, batch, k, extras)
            _force(loss)
        return (time.perf_counter() - t0) / reps
    finally:
        if saved is not None:
            perf_mod.favor_causal_attention = saved


def main():
    import subprocess
    import sys
    import os

    # each configuration in a fresh process (compile-crash isolation +
    # monkeypatch hygiene)
    if len(sys.argv) > 1:
        print(json.dumps({'secs': time_step(
            None if sys.argv[1] == 'full' else sys.argv[1])}))
        return

    out = {'metric': 'stage2 Performer train step attribution '
                     f'(B={B}, L={L}, bf16, fwd+bwd+Adam)',
           'unit': 'secs/step'}
    for cfg in ('full', 'no_attn'):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), cfg],
            capture_output=True, text=True, timeout=2400)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out[cfg] = json.loads(line)['secs']
                break
            except (json.JSONDecodeError, ValueError):
                continue
        else:
            out[cfg + '_error'] = (proc.stderr or '').strip()[-300:]

    if 'full' in out and 'no_attn' in out:
        tokens = B * L
        out['tokens_per_sec_full'] = round(tokens / out['full'], 1)
        out['tokens_per_sec_no_attn'] = round(tokens / out['no_attn'], 1)
        out['attn_share_of_step'] = round(1 - out['no_attn'] / out['full'], 3)
        # params ~= 39.4M; 6 FLOPs/param/token; v5e bf16 peak 197 TFLOP/s
        n_params = 39.4e6
        out['mfu_full'] = round(6 * n_params * tokens / out['full'] / 197e12, 4)
        # the GEMM-only step runs the same weight FLOPs minus nothing (the
        # attention kernel FLOPs are NOT in the 6NP estimate), so its MFU is
        # the ceiling the MXU grants these shapes
        out['mfu_no_attn_ceiling'] = round(
            6 * n_params * tokens / out['no_attn'] / 197e12, 4)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
