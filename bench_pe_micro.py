"""Microbench: pin the stage-1 serve() per-step cost (chip_r05/s1_serve.out
measured ~87 accepted tok/s vs ~2.2k lockstep; bench_s1_serve_diag pins the
end-to-end gap, this pins WHICH device op pays it).

Runs 12-layer decode chains (B=16, Kmax=1408 — serve's max_events=384 +
reject_slack=1024) under a scan, one variant per line:

  shared      decode_step (scalar clock)             -- the 3.55 ms baseline
  pe          decode_step_pe (per-element clock)     -- what serve() runs
  pe_uniform  decode_step_pe with t all-equal        -- same code, uniform t
  attn_only   full_decode_attention_pe alone (no qkv/ff/write)
  attn_norel  ...without the rel-BD gather
  write_only  write_row_pe alone (vmapped dynamic_update_slice, k+v x 12L)
  write_mask  masked-select write (full-cache where) alone

All bf16, layout 'khd'.  Prints one JSON line per variant.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

B, NL, H, DH, D = 16, 12, 8, 64, 512
KMAX = 1408
VOCAB = 330
STEPS = 64


def _force(x):
    return float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _force(out)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best / STEPS * 1e3  # ms/step


def build():
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.utils.precision import cast_params
    model = PlainTransformer(vocab_size=VOCAB, n_layer=NL, n_head=H,
                             d_model=D, d_ff=2048, d_embed=D,
                             dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32)))
    return model, params


def main():
    model, params = build()
    rng = np.random.default_rng(0)
    tok0 = jnp.asarray(rng.integers(5, VOCAB, B), jnp.int32)
    t_pe = jnp.asarray(rng.integers(64, KMAX - STEPS - 2, B), jnp.int32)
    t_uni = jnp.full((B,), 512, jnp.int32)

    from emo_disentanger_tpu.models import PlainTransformer
    cache = model.apply(params, B, KMAX, 'khd',
                        method=PlainTransformer.init_decode_cache)
    r_heads = cache['r']          # [NL, Kmax, H, Dh]

    # --- full chains under scan ---
    @jax.jit
    def run_shared(tok):
        def step(carry, _):
            last, t, c = carry
            logits, c = model.apply(params, last, t, c,
                                    full_attention=True, layout='khd',
                                    method=PlainTransformer.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (nxt, t + 1, c), ()
        (last, _, _), _ = jax.lax.scan(step, (tok, jnp.int32(512), cache),
                                       None, length=STEPS)
        return last

    def make_run_pe(t0):
        @jax.jit
        def run_pe(tok):
            def step(carry, _):
                last, t, c = carry
                logits, c = model.apply(
                    params, last, t, c, layout='khd',
                    method=PlainTransformer.decode_step_pe)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
                return (nxt, t + 1, c), ()
            (last, _, _), _ = jax.lax.scan(step, (tok, t0, cache),
                                           None, length=STEPS)
            return last
        return run_pe

    print(json.dumps({'variant': 'shared',
                      'ms_per_step': round(timeit(run_shared, tok0), 3)}),
          flush=True)
    print(json.dumps({'variant': 'pe',
                      'ms_per_step': round(
                          timeit(make_run_pe(t_pe), tok0), 3)}), flush=True)
    print(json.dumps({'variant': 'pe_uniform',
                      'ms_per_step': round(
                          timeit(make_run_pe(t_uni), tok0), 3)}), flush=True)

    # --- isolated attention (12 calls per step, same shapes) ---
    from emo_disentanger_tpu.ops.attention import (full_decode_attention_pe,
                                                   write_row_pe)
    k_all, v_all = cache['k'], cache['v']
    q0 = jnp.asarray(rng.standard_normal((B, H, DH)), jnp.bfloat16)
    rrq = jnp.asarray(rng.standard_normal((B, H, DH)), jnp.bfloat16)

    def make_attn(rel):
        @jax.jit
        def run(q):
            def step(carry, _):
                qq, t = carry
                acc = qq
                for l in range(NL):
                    o = full_decode_attention_pe(
                        acc, k_all[l], v_all[l], t, scale=0.125,
                        rel=((acc, r_heads[l]) if rel else None),
                        layout='khd')
                    acc = o.astype(jnp.bfloat16)
                return (acc, t + 1), ()
            (qq, _), _ = jax.lax.scan(step, (q, t_pe), None, length=STEPS)
            return qq
        return run

    print(json.dumps({'variant': 'attn_only',
                      'ms_per_step': round(timeit(make_attn(True), q0), 3)}),
          flush=True)
    print(json.dumps({'variant': 'attn_norel',
                      'ms_per_step': round(timeit(make_attn(False), q0), 3)}),
          flush=True)

    # --- candidate fix: rel-BD via reverse + per-element dynamic_slice
    # (bd[b,h,j] = rq_all[b,h,t_b-j] = rev[b,h,(R-1-t_b)+j]; positions
    # j > t_b read the zero pad, which the causal mask kills anyway) ---
    NEG_INF = jnp.float32(-1e30)

    def attn_pe_slice(q, kc, vc, t, rh):
        s = jnp.einsum('bhd,bjhd->bhj', q, kc,
                       preferred_element_type=jnp.float32)
        rq_all = jnp.einsum('bhd,khd->bhk', q.astype(rh.dtype), rh,
                            preferred_element_type=jnp.float32)
        R = rh.shape[0]
        rev = jnp.pad(rq_all[..., ::-1], ((0, 0), (0, 0), (0, KMAX - 1)))
        start = (R - 1 - t).astype(jnp.int32)
        bd = jax.vmap(lambda r, st: jax.lax.dynamic_slice(
            r, (0, st), (H, KMAX)))(rev, start)
        s = (s + bd) * 0.125
        s = jnp.where(jnp.arange(KMAX)[None, None, :] > t[:, None, None],
                      NEG_INF, s)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum('bhj,bjhd->bhd', p.astype(vc.dtype), vc,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    @jax.jit
    def run_attn_slice(q):
        def step(carry, _):
            qq, t = carry
            acc = qq
            for l in range(NL):
                acc = attn_pe_slice(acc, k_all[l], v_all[l], t,
                                    r_heads[l]).astype(jnp.bfloat16)
            return (acc, t + 1), ()
        (qq, _), _ = jax.lax.scan(step, (q, t_pe), None, length=STEPS)
        return qq

    print(json.dumps({'variant': 'attn_slice',
                      'ms_per_step': round(timeit(run_attn_slice, q0), 3)}),
          flush=True)

    # --- isolated cache write (k+v x 12 layers per step) ---
    @jax.jit
    def run_write(row):
        def step(carry, _):
            ka, va, t = carry
            for l in range(NL):
                ka = ka.at[l].set(write_row_pe(ka[l], row, t, 'khd'))
                va = va.at[l].set(write_row_pe(va[l], row, t, 'khd'))
            return (ka, va, t + 1), ()
        (ka, _, _), _ = jax.lax.scan(step, (k_all, v_all, t_pe),
                                     None, length=STEPS)
        return ka

    @jax.jit
    def run_write_mask(row):
        pos = jnp.arange(KMAX)

        def w(c, t):
            hit = (pos[None, :] == t[:, None])[:, :, None, None]
            return jnp.where(hit, row[:, None].astype(c.dtype), c)

        def step(carry, _):
            ka, va, t = carry
            for l in range(NL):
                ka = ka.at[l].set(w(ka[l], t))
                va = va.at[l].set(w(va[l], t))
            return (ka, va, t + 1), ()
        (ka, _, _), _ = jax.lax.scan(step, (k_all, v_all, t_pe),
                                     None, length=STEPS)
        return ka

    # --- candidate fix: batched-index scatter write ---
    @jax.jit
    def run_write_scatter(row):
        bidx = jnp.arange(B)

        def step(carry, _):
            ka, va, t = carry
            for l in range(NL):
                ka = ka.at[l].set(ka[l].at[bidx, t].set(row))
                va = va.at[l].set(va[l].at[bidx, t].set(row))
            return (ka, va, t + 1), ()
        (ka, _, _), _ = jax.lax.scan(step, (k_all, v_all, t_pe),
                                     None, length=STEPS)
        return ka

    row = jnp.asarray(rng.standard_normal((B, H, DH)), jnp.bfloat16)
    print(json.dumps({'variant': 'write_only',
                      'ms_per_step': round(timeit(run_write, row), 3)}),
          flush=True)
    print(json.dumps({'variant': 'write_mask',
                      'ms_per_step': round(timeit(run_write_mask, row), 3)}),
          flush=True)
    print(json.dumps({'variant': 'write_scatter',
                      'ms_per_step': round(
                          timeit(run_write_scatter, row), 3)}), flush=True)


if __name__ == '__main__':
    main()
