"""Dense-attention decode op: flash-style chunked attention over a KV cache.

One generated token attends over the live prefix [0, t] of a padded cache.
Reading the whole padded buffer each step wastes HBM bandwidth early in the
song, and a static-bucket ``lax.switch`` multiplies compile time inside the
decode scan.  This op instead runs a ``fori_loop`` over 256-wide chunks with
an online-softmax accumulator (the flash-attention recurrence): a single
compiled body whose trip count ``ceil((t+1)/chunk)`` tracks the live length
at runtime.

Supports the Transformer-XL relative-position score term: with
``rel=(rr_q, r_heads)`` each chunk adds BD[j] = rr_q . r_heads[t-j], where
the needed distance rows are a contiguous (reversed) slice of ``r_heads``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

VALID_LAYOUTS = ('khd', 'dk', 'hkd')


def layout_equations(layout: str):
    """(scores, value) einsum equations for a decode-cache layout:
    q [B,H,Dh] x cache -> scores [B,H,K]; probs [B,H,K] x cache -> [B,H,Dh].
    One source of truth for every layout-dispatching decode body."""
    if layout == 'dk':        # cache [B, H, Dh, K]
        return 'bhd,bhdj->bhj', 'bhj,bhdj->bhd'
    if layout == 'hkd':       # cache [B, H, K, Dh]
        return 'bhd,bhjd->bhj', 'bhj,bhjd->bhd'
    if layout == 'khd':       # cache [B, K, H, Dh]
        return 'bhd,bjhd->bhj', 'bhj,bjhd->bhd'
    raise ValueError(f'unknown cache layout {layout!r}; '
                     f'expected one of {VALID_LAYOUTS}')


def write_row_pe(cache_layer, new_row, t, layout: str,
                 impl: Optional[str] = None):
    """Per-element-clock cache write: new_row [B,H,Dh] lands at each
    element's own position t[b] in cache_layer (leading dim B), under any
    layout.  ``impl`` picks the lowering (identical results, tested):

    * ``'dus'`` (default) — vmapped ``dynamic_update_slice`` (the pattern
      every batched-generation decode uses; lowers to a scatter when the
      start indices are batched).
    * ``'scatter'`` — explicit batched-index ``.at[arange(B), t].set``.
    * ``'mask'`` — full-cache select (``where(pos == t_b, row, cache)``);
      pays whole-cache traffic but no scatter.

    Per-impl perf on the chip: bench_pe_micro.py."""
    if impl is None:
        import os
        impl = os.environ.get('EMODIS_PE_WRITE_IMPL', 'dus')
    if layout not in VALID_LAYOUTS:
        raise ValueError(f'unknown cache layout {layout!r}; '
                         f'expected one of {VALID_LAYOUTS}')
    if impl == 'dus':
        if layout == 'dk':
            return jax.vmap(
                lambda c, kk, tb: jax.lax.dynamic_update_slice(
                    c, kk[..., None], (0, 0, tb)))(cache_layer, new_row, t)
        if layout == 'hkd':
            return jax.vmap(
                lambda c, kk, tb: jax.lax.dynamic_update_slice(
                    c, kk[:, None], (0, tb, 0)))(cache_layer, new_row, t)
        return jax.vmap(
            lambda c, kk, tb: jax.lax.dynamic_update_slice(
                c, kk[None], (tb, 0, 0)))(cache_layer, new_row, t)
    if impl == 'scatter':
        bidx = jnp.arange(cache_layer.shape[0])
        if layout == 'dk':
            return cache_layer.at[bidx, :, :, t].set(new_row)
        if layout == 'hkd':
            return cache_layer.at[bidx, :, t].set(new_row)
        return cache_layer.at[bidx, t].set(new_row)
    if impl == 'mask':
        K = (cache_layer.shape[-1] if layout == 'dk'
             else cache_layer.shape[-2] if layout == 'hkd'
             else cache_layer.shape[1])
        pos = jnp.arange(K)
        hit = pos[None, :] == t[:, None]                     # [B, K]
        row = new_row.astype(cache_layer.dtype)
        if layout == 'dk':
            return jnp.where(hit[:, None, None, :], row[..., None],
                             cache_layer)
        if layout == 'hkd':
            return jnp.where(hit[:, None, :, None], row[:, :, None],
                             cache_layer)
        return jnp.where(hit[:, :, None, None], row[:, None], cache_layer)
    raise ValueError(f'unknown write impl {impl!r}; '
                     "expected 'dus' | 'scatter' | 'mask'")


def flash_decode_attention(
    q: jax.Array,              # [B, H, Dh]  (for TXL pass q + r_w_bias here)
    k_cache: jax.Array,        # [B, Kmax, H, Dh]
    v_cache: jax.Array,        # [B, Kmax, H, Dh]
    t: jax.Array,              # scalar: current (just written) position
    *,
    scale: float,
    chunk: int = 256,
    rel: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> jax.Array:
    """Returns [B, H, Dh] attention over positions 0..t (inclusive)."""
    B, Kmax, H, Dh = k_cache.shape
    chunk = min(chunk, Kmax)
    # dtype-preserving chunk dots (f32 accumulation via
    # preferred_element_type): upcasting each cache chunk to f32 before the
    # dot materialized double-width copies of every cache read — see the
    # matching note in full_decode_attention.  bf16 products are exact in
    # f32, so scores are bit-identical; f32 models are unaffected.

    if rel is not None:
        rr_q, r_heads = rel
        rr_q = rr_q.astype(r_heads.dtype)

    def body(ci, carry):
        m, l, acc = carry
        c0 = ci * chunk
        kk = jax.lax.dynamic_slice(k_cache, (0, c0, 0, 0), (B, chunk, H, Dh))
        vv = jax.lax.dynamic_slice(v_cache, (0, c0, 0, 0), (B, chunk, H, Dh))
        s = jnp.einsum('bhd,bjhd->bhj', q.astype(kk.dtype), kk,
                       preferred_element_type=jnp.float32)

        if rel is not None:
            # BD[jj] = rr_q . r_heads[t - (c0+jj)]; the distances form the
            # reversed contiguous range [e-chunk+1, e] with e = t - c0, so
            # one slice of r_heads + a flip/align recovers them all.
            e = t - c0
            s0 = jnp.clip(e - chunk + 1, 0, Kmax - chunk)
            rslice = jax.lax.dynamic_slice(
                r_heads, (s0, 0, 0), (chunk, H, Dh))
            rq = jnp.einsum('bhd,khd->bhk', rr_q, rslice,
                            preferred_element_type=jnp.float32)
            rq = jnp.flip(rq, axis=-1)
            rq = jnp.pad(rq, ((0, 0), (0, 0), (0, chunk)))
            start = (chunk - 1) - (e - s0)
            bd = jax.lax.dynamic_slice_in_dim(rq, start, chunk, axis=-1)
            s = s + bd

        s = s * scale
        jj = c0 + jnp.arange(chunk)
        s = jnp.where((jj > t)[None, None, :], NEG_INF, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        # p rounds to the cache dtype for the value dot (<2^-8 relative on
        # the attention weights, far below sampling noise; exact for f32)
        acc = acc * corr[..., None] + jnp.einsum(
            'bhj,bjhd->bhd', p.astype(vv.dtype), vv,
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((B, H), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H), jnp.float32)
    acc0 = jnp.zeros((B, H, Dh), jnp.float32)
    n_chunks = t // chunk + 1
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    return (acc / l[..., None]).astype(q.dtype)


def full_decode_attention(
    q: jax.Array,              # [B, H, Dh]
    k_cache: jax.Array,        # [B, Kmax, H, Dh]  (layout='khd')
    v_cache: jax.Array,        # [B, Kmax, H, Dh]
    t: jax.Array,              # scalar position
    *,
    scale: float,
    rel: Optional[Tuple[jax.Array, jax.Array]] = None,
    layout: str = 'khd',
) -> jax.Array:
    """Whole-padded-cache masked attention — same function as
    :func:`flash_decode_attention` without the dynamic-trip ``fori_loop``.

    Exists because the axon AOT compile helper aborts (SIGABRT) or times
    out compiling a while_loop body that combines the chunked fori_loop
    decode with carried per-element output-buffer updates at batch >= 8
    (bisected 2026-08; either piece alone compiles).  Reading the full
    padded cache each step wastes early-song HBM bandwidth but keeps the
    loop body a single fused einsum chain the compiler handles at any
    batch; the batched stage-1 generator uses this path.

    ``layout`` selects the cache memory layout:

    * ``'khd'`` — caches ``[B, Kmax, H, Dh]``, ``rel[1]`` (r_heads)
      ``[Kmax, H, Dh]``.  TPU tiles the last two dims to (8|16, 128), so
      (H=8, Dh=64) pads every cache read 4x in HBM.
    * ``'dk'`` — caches ``[B, H, Dh, Kmax]``, r_heads ``[H, Dh, Kmax]``
      (K in lanes: (Dh=64, Kmax=128n) tiles with zero padding).  Same
      math — scores/probs/output agree with 'khd' to reduction-order
      rounding (tested) — but the per-step HBM traffic matches the
      logical cache size.
    * ``'hkd'`` — caches ``[B, H, Kmax, Dh]``, r_heads as 'dk'
      (``[H, Dh, Kmax]``).  Hedge layout: trailing (Kmax, Dh) still pads
      Dh 2x, but the per-step cache write lands at a SUBLANE offset
      (contiguous rows) instead of 'dk's dynamic lane offset.
    """
    if layout in ('dk', 'hkd'):
        return _full_decode_attention_dk(q, k_cache, v_cache, t,
                                         scale=scale, rel=rel, layout=layout)
    B, Kmax, H, Dh = k_cache.shape
    # dtype-preserving dots with f32 accumulation: upcasting the whole
    # padded cache (`k_cache.astype(f32)`) materialized 2x-width copies of
    # every cache read each step — at K=1536/B=16/12L that is GB-scale HBM
    # traffic per decoded token, and was most of the measured gap between
    # this decode and its bandwidth bound (round 4).  bf16 x bf16 products
    # are exact in f32, so `s` is bit-identical to the upcast version; for
    # f32 models every astype below is a no-op and nothing changes at all.
    s = jnp.einsum('bhd,bjhd->bhj', q, k_cache,
                   preferred_element_type=jnp.float32)
    if rel is not None:
        rr_q, r_heads = rel
        # BD[j] = rr_q . r_heads[t - j]; gather the distance rows directly
        dist = jnp.clip(t - jnp.arange(Kmax), 0, r_heads.shape[0] - 1)
        rsel = jnp.take(r_heads, dist, axis=0)
        s = s + jnp.einsum('bhd,jhd->bhj', rr_q.astype(rsel.dtype), rsel,
                           preferred_element_type=jnp.float32)
    s = s * scale
    s = jnp.where((jnp.arange(Kmax) > t)[None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    # p rounds to the cache dtype for the value dot: for bf16 serving the
    # attention weights lose <2^-8 relative — far below sampling noise —
    # in exchange for halving the largest HBM read in the loop
    return jnp.einsum('bhj,bjhd->bhd', p.astype(v_cache.dtype), v_cache,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _full_decode_attention_dk(
    q: jax.Array,              # [B, H, Dh]
    k_cache: jax.Array,        # [B, H, Dh, Kmax] ('dk') / [B, H, Kmax, Dh] ('hkd')
    v_cache: jax.Array,        # like k_cache
    t: jax.Array,              # scalar position
    *,
    scale: float,
    rel: Optional[Tuple[jax.Array, jax.Array]] = None,
    layout: str = 'dk',
) -> jax.Array:
    """Head-major body of :func:`full_decode_attention` (layout 'dk'/'hkd').

    The TXL relative term is computed as ``rq_all[b,h,k] = rr_q .
    r_heads[:, :, k]`` for every distance row and then gathered at
    ``dist[j] = t - j`` — the same dots as the gather-then-einsum of the
    'khd' body (each BD entry is the identical 64-wide contraction), but
    the gather moves [B, H, K] f32 scores instead of [K, H, Dh] rows, and
    reading r_heads as [H, Dh, K] avoids the same 4x tile padding the
    'dk' cache reads avoid."""
    if layout == 'hkd':
        B, H, Kmax, Dh = k_cache.shape
    else:
        B, H, Dh, Kmax = k_cache.shape
    eq_s, eq_v = layout_equations(layout)
    s = jnp.einsum(eq_s, q, k_cache, preferred_element_type=jnp.float32)
    if rel is not None:
        rr_q, r_heads = rel               # r_heads [H, Dh, Kmax]
        rq_all = jnp.einsum('bhd,hdk->bhk', rr_q.astype(r_heads.dtype),
                            r_heads, preferred_element_type=jnp.float32)
        dist = jnp.clip(t - jnp.arange(Kmax), 0, r_heads.shape[-1] - 1)
        s = s + jnp.take(rq_all, dist, axis=-1)
    s = s * scale
    s = jnp.where((jnp.arange(Kmax) > t)[None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(eq_v, p.astype(v_cache.dtype), v_cache,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def full_decode_attention_pe(
    q: jax.Array,              # [B, H, Dh]
    k_cache: jax.Array,        # [B, Kmax, H, Dh]
    v_cache: jax.Array,        # [B, Kmax, H, Dh]
    t: jax.Array,              # [B] PER-ELEMENT positions
    *,
    scale: float,
    rel: Optional[Tuple[jax.Array, jax.Array]] = None,
    layout: str = 'khd',
    rel_impl: Optional[str] = None,
) -> jax.Array:
    """:func:`full_decode_attention` with a PER-ELEMENT clock.

    Continuous batching refills one slot's song while others are mid-song,
    so each batch element carries its own cache length ``t[b]`` — the
    shared-scalar-``t`` design of the lockstep loop cannot express that.
    Identical math per element: with ``t`` uniform this returns bitwise the
    same scores as the shared-clock op (tested).

    The TXL relative-position term generalizes by computing the query-dot
    for EVERY distance row (``rq_all[b,h,D] = rr_q . r_heads[D]`` — the
    same FLOPs as the shared-clock einsum against the gathered rows) and
    materializing ``BD[b,h,j] = rq_all[b,h,t_b - j]``.  ``rel_impl``
    picks how (both bitwise-identical in the final output, tested):

    * ``'slice'`` (default) — reverse ``rq_all`` along k, zero-pad, and
      take each element's length-Kmax window with a vmapped
      ``dynamic_slice`` (``bd[b,h,j] = rev[b,h,(R-1-t_b)+j]``); positions
      ``j > t_b`` read the pad, which the causal mask kills.  Contiguous
      per-element DMA instead of a [B,H,Kmax] element gather.
    * ``'gather'`` — ``take_along_axis`` at ``clip(t_b - j, 0, R-1)``;
      one gathered f32 element per (b,h,j).  Kept as the oracle for the
      equality test (perf per layout/impl: bench_pe_micro.py).

    ``layout='dk'`` takes caches ``[B, H, Dh, Kmax]`` and r_heads
    ``[H, Dh, Kmax]`` (see :func:`full_decode_attention`)."""
    if rel_impl is None:
        import os
        rel_impl = os.environ.get('EMODIS_PE_REL_IMPL', 'slice')
    assert rel_impl in ('slice', 'gather'), rel_impl
    if layout == 'dk':
        B, H, Dh, Kmax = k_cache.shape
    elif layout == 'hkd':
        B, H, Kmax, Dh = k_cache.shape
    else:
        B, Kmax, H, Dh = k_cache.shape
    eq_s, eq_v = layout_equations(layout)
    s = jnp.einsum(eq_s, q, k_cache, preferred_element_type=jnp.float32)
    # r_heads: [Kmax, H, Dh] for 'khd'; [H, Dh, Kmax] for 'dk'/'hkd'
    r_rows = None if rel is None else (
        rel[1].shape[0] if layout == 'khd' else rel[1].shape[-1])
    vdot = lambda p: jnp.einsum(              # noqa: E731
        eq_v, p.astype(v_cache.dtype), v_cache,
        preferred_element_type=jnp.float32)
    if rel is not None:
        rr_q, r_heads = rel
        rq_all = jnp.einsum('bhd,khd->bhk' if layout == 'khd' else 'bhd,hdk->bhk',
                            rr_q.astype(r_heads.dtype), r_heads,
                            preferred_element_type=jnp.float32)
        if rel_impl == 'slice':
            # bd[b,h,j] = rq_all[b,h,t_b-j] = rev[b,h,(R-1-t_b)+j]; for
            # j > t_b the window reads the zero pad (masked out below).
            # t_b <= Kmax-1 <= R-1 keeps every start in range.
            rev = jnp.pad(rq_all[..., ::-1], ((0, 0), (0, 0), (0, Kmax - 1)))
            start = (r_rows - 1 - t).astype(jnp.int32)
            bd = jax.vmap(lambda r, st: jax.lax.dynamic_slice(
                r, (0, st), (H, Kmax)))(rev, start)
        else:
            dist = jnp.clip(t[:, None] - jnp.arange(Kmax)[None, :], 0,
                            r_rows - 1).astype(jnp.int32)
            bd = jnp.take_along_axis(
                rq_all, jnp.broadcast_to(dist[:, None, :], (B, H, Kmax)),
                axis=-1)
        s = s + bd
    s = s * scale
    s = jnp.where(jnp.arange(Kmax)[None, None, :] > t[:, None, None],
                  NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return vdot(p).astype(q.dtype)
