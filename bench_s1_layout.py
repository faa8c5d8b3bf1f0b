"""Raw layout experiment for the stage-1 whole-cache decode attention.

The production batched stage-1 loop is ~97% decode (BENCH_s1_attrib_r04),
and the decode einsum runs ~4.6x above its HBM bound (3.43 ms vs ~0.74 ms
at B=16/K=1536/12L bf16).  Chief suspect: the cache layout
``[B, K, H, Dh]`` puts ``Dh = 64`` in the minor (lane) dimension — half a
128-lane tile — so Mosaic pads every cache read 2x, and the K stride
crosses ``H*Dh`` elements.  This bench times the two core einsums of
``ops.attention.full_decode_attention`` standalone under three layouts:

  A. ``[B, K, H, Dh]``  (production today)
  B. ``[B, H, K, Dh]``  (head-major: contiguous [K, Dh] per (b, h))
  C. ``[B, H, Dh, K]``  (K in lanes: no padding waste, scores contract
                         over sublanes)

plus the full 12-layer chain cost approximated by timing one layer x 12.
If B or C wins big on the chip, the generator's cache layout is worth
re-plumbing; if all are flat, the bound is elsewhere (e.g. per-step
softmax/gather overheads or dispatch).  Prints one JSON line per variant.

Run on the chip: ``python bench_s1_layout.py`` (compiles ~6 tiny programs).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# EMODIS_LAYOUT_K overrides the cache size: K=1536 is the lead-sheet serving
# shape; K=4096 is the full_song cache where the cache-read share is ~3x
# larger and layout padding could still bite (round-5 measured K=1536 FLAT
# across khd/hkd/dk — 3.55/3.63/3.60 ms/step — the step is latency-bound).
B, K, H, Dh = 16, int(os.environ.get('EMODIS_LAYOUT_K', '1536')), 8, 64
LAYERS = 12
STEPS = 64


def time_fn(fn, *args):
    r = jax.jit(fn)(*args)
    float(jnp.asarray(r).ravel()[0].astype(jnp.float32))   # compile + force
    t0 = time.perf_counter()
    for _ in range(3):
        r = jax.jit(fn)(*args)
        float(jnp.asarray(r).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / 3


def main():
    if os.environ.get('EMODIS_LAYOUT_RAW', '1') == '0':
        # skip the raw einsum chains: measured round 5 they are
        # dispatch-dominated (~32-38 ms per host round-trip for a 12-layer
        # chain that costs 3.5 ms inside a scan) and tell us nothing
        model_level()
        return
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, Dh), jnp.bfloat16)
    k_a = jax.random.normal(key, (B, K, H, Dh), jnp.bfloat16)
    v_a = jax.random.normal(key, (B, K, H, Dh), jnp.bfloat16)
    k_b = jnp.swapaxes(k_a, 1, 2)           # [B, H, K, Dh]
    v_b = jnp.swapaxes(v_a, 1, 2)
    k_c = jnp.swapaxes(k_b, 2, 3)           # [B, H, Dh, K]
    v_c = jnp.swapaxes(v_b, 2, 3)

    def chain_a(q, k, v):
        def one(_, qq):
            s = jnp.einsum('bhd,bjhd->bhj', qq, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(v.dtype)
            return jnp.einsum('bhj,bjhd->bhd', p, v,
                              preferred_element_type=jnp.float32
                              ).astype(qq.dtype)
        out = q
        for _ in range(LAYERS):
            out = one(None, out)
        return out

    def chain_b(q, k, v):
        def one(qq):
            s = jnp.einsum('bhd,bhjd->bhj', qq, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(v.dtype)
            return jnp.einsum('bhj,bhjd->bhd', p, v,
                              preferred_element_type=jnp.float32
                              ).astype(qq.dtype)
        out = q
        for _ in range(LAYERS):
            out = one(out)
        return out

    def chain_c(q, k, v):
        def one(qq):
            s = jnp.einsum('bhd,bhdj->bhj', qq, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, -1).astype(v.dtype)
            return jnp.einsum('bhj,bhdj->bhd', p, v,
                              preferred_element_type=jnp.float32
                              ).astype(qq.dtype)
        out = q
        for _ in range(LAYERS):
            out = one(out)
        return out

    hbm_bytes = LAYERS * 2 * B * K * H * Dh * 2       # K+V reads, bf16
    bound_ms = hbm_bytes / 819e9 * 1e3
    for name, fn, kk, vv in [('A_BKHD', chain_a, k_a, v_a),
                             ('B_BHKD', chain_b, k_b, v_b),
                             ('C_BHDK', chain_c, k_c, v_c)]:
        dt = time_fn(fn, q, kk, vv)
        print(json.dumps({
            'metric': f'stage1 decode-attn layout {name} '
                      f'(12-layer chain, B={B}, K={K}, bf16)',
            'ms': round(dt * 1e3, 3),
            'hbm_bound_ms': round(bound_ms, 3),
            'x_over_bound': round(dt * 1e3 / bound_ms, 2)}), flush=True)

    model_level()


def model_level():
    """The REAL per-step cost: a scan over ``PlainTransformer.decode_step``
    (full TXL forward incl. the relative-position term, QKV projections,
    FF, and the cache write) under each plumbed layout — what the batched
    generator's loop body actually pays.  'khd' is today's production
    path; 'dk' is the K-in-lanes candidate (ops.attention layout='dk')."""
    from emo_disentanger_tpu.models import PlainTransformer
    from emo_disentanger_tpu.utils.precision import cast_params
    model = PlainTransformer(vocab_size=360, n_layer=LAYERS, n_head=H,
                             d_model=H * Dh, d_ff=4 * H * Dh,
                             d_embed=H * Dh, dtype=jnp.bfloat16)
    params = cast_params(model.init(jax.random.PRNGKey(0),
                                    jnp.ones((1, 8), jnp.int32)))
    steps = 128

    layouts = tuple(os.environ.get('EMODIS_LAYOUT_SET',
                                   'khd,hkd,dk').split(','))
    for layout in layouts:
        def run(tok0, layout=layout):
            cache = model.apply(params, B, K, layout,
                                method=PlainTransformer.init_decode_cache)

            def step(carry, t):
                tok, cache = carry
                logits, cache = model.apply(
                    params, tok, t, cache, full_attention=True,
                    layout=layout, method=PlainTransformer.decode_step)
                return (jnp.argmax(logits, -1).astype(jnp.int32), cache), ()

            (tok, _), _ = jax.lax.scan(
                step, (tok0, cache), jnp.arange(steps, dtype=jnp.int32))
            return tok

        tok0 = jnp.ones((B,), jnp.int32)
        dt = time_fn(run, tok0)        # secs per 3-rep... time_fn avgs 3
        ms_per_step = dt * 1e3 / steps
        print(json.dumps({
            'metric': f'stage1 decode_step scan layout {layout} '
                      f'({LAYERS}L/{H * Dh}d, B={B}, Kmax={K}, bf16)',
            'ms_per_step': round(ms_per_step, 3),
            'tokens_per_sec': round(B / (ms_per_step / 1e3), 1)}),
            flush=True)


if __name__ == '__main__':
    main()
