"""Causal linear attention (FAVOR+) for the Performer backbone.

The reference reaches this op through the ``pytorch-fast-transformers``
C++/CUDA ``causal_product`` kernel (``fast_transformer_decoder.py:28-34``,
feature map ``Favor.factory(n_dims=128)``).  Here the op is TPU-native:

* :func:`favor_features` — FAVOR+ positive softmax-kernel features
  phi(x) = exp(w^T x' - ||x'||^2/2) / sqrt(m) with x' = x * d^{-1/4} and
  orthogonal Gaussian features ``omega`` (chi-scaled rows);
* :func:`causal_linear_attention` — the causal prefix-sum
  out_i = phi(q_i)^T (sum_{j<=i} phi(k_j) v_j^T) / (phi(q_i)^T sum phi(k_j)),
  as a Pallas TPU kernel (chunked running-state scan in VMEM) with a
  pure-JAX chunked ``lax.scan`` used for autodiff and as CPU fallback;
* :func:`linear_attention_decode_step` — O(1)-per-token decode carrying the
  (S = sum phi(k) v^T, z = sum phi(k)) state.

Numerics: all accumulation in float32; stabilizers cancel exactly in the
normalization (per-query-position max for q; one global max per batch*head
for k), so every implementation computes the same function.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


# ---------------------------------------------------------------------------
# FAVOR+ feature map
# ---------------------------------------------------------------------------

def draw_orthogonal_features(key: jax.Array, d_head: int, n_dims: int) -> jax.Array:
    """Draw the FAVOR+ random-feature matrix omega [d_head, n_dims]:
    blocks of orthogonalized Gaussians with chi-distributed row norms."""
    n_blocks = -(-n_dims // d_head)
    keys = jax.random.split(key, n_blocks + 1)
    blocks = []
    for i in range(n_blocks):
        g = jax.random.normal(keys[i], (d_head, d_head), dtype=jnp.float32)
        q, _ = jnp.linalg.qr(g)
        blocks.append(q.T)
    w = jnp.concatenate(blocks, axis=0)[:n_dims]          # [n_dims, d_head]
    norms = jnp.sqrt(jnp.sum(
        jax.random.normal(keys[-1], (n_dims, d_head), dtype=jnp.float32) ** 2,
        axis=-1, keepdims=True))
    return (w * norms).T                                   # [d_head, n_dims]


def favor_features(x: jax.Array, omega: jax.Array, *, is_query: bool,
                   key_stabilizer: Optional[jax.Array] = None) -> jax.Array:
    """phi(x) for x [..., L, D] -> [..., L, M] (float32).

    Stabilization: queries subtract their per-position max over features
    (cancels between numerator and denominator); keys subtract one scalar per
    batch*head (``key_stabilizer``; also cancels).  Pass ``key_stabilizer=0``
    during decode so the running state stays on a consistent scale.
    """
    x = x.astype(jnp.float32)
    scale = x.shape[-1] ** -0.25
    xs = x * scale
    u = xs @ omega.astype(jnp.float32)                       # [..., L, M]
    sq = 0.5 * jnp.sum(xs * xs, axis=-1, keepdims=True)      # [..., L, 1]
    h = u - sq
    if is_query:
        h = h - jax.lax.stop_gradient(jnp.max(h, axis=-1, keepdims=True))
    elif key_stabilizer is None:
        g = jax.lax.stop_gradient(jnp.max(h, axis=(-2, -1), keepdims=True))
        h = h - g
    else:
        h = h - key_stabilizer
    return jnp.exp(h) / jnp.sqrt(omega.shape[-1]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# reference (quadratic) implementation — used in tests
# ---------------------------------------------------------------------------

def causal_linear_attention_ref(phi_q: jax.Array, phi_k: jax.Array,
                                v: jax.Array, eps: float = EPS) -> jax.Array:
    """O(L^2) masked einsum; ground truth for kernel equivalence tests.
    Shapes: phi_q/phi_k [..., L, M], v [..., L, Dv]."""
    scores = jnp.einsum('...im,...jm->...ij', phi_q, phi_k)
    L = scores.shape[-1]
    mask = jnp.tril(jnp.ones((L, L), dtype=bool))
    scores = jnp.where(mask, scores, 0.0)
    num = jnp.einsum('...ij,...jd->...id', scores, v)
    den = jnp.sum(scores, axis=-1, keepdims=True)
    return num / (den + eps)


# ---------------------------------------------------------------------------
# chunked lax.scan implementation — differentiable, CPU-safe
# ---------------------------------------------------------------------------

def _scan_impl(phi_q: jax.Array, phi_k: jax.Array, v: jax.Array,
               chunk: int, eps: float) -> jax.Array:
    """[B*H, L, M] x [B*H, L, Dv] -> [B*H, L, Dv]; L must divide by chunk."""
    bh, L, M = phi_q.shape
    Dv = v.shape[-1]
    n_chunks = L // chunk
    qc = phi_q.reshape(bh, n_chunks, chunk, M).swapaxes(0, 1)
    kc = phi_k.reshape(bh, n_chunks, chunk, M).swapaxes(0, 1)
    vc = v.reshape(bh, n_chunks, chunk, Dv).swapaxes(0, 1)
    tri = jnp.tril(jnp.ones((chunk, chunk), dtype=phi_q.dtype))

    def step(carry, inputs):
        S, z = carry                                  # [bh, M, Dv], [bh, M]
        q, k, vv = inputs
        intra = jnp.einsum('bim,bjm->bij', q, k) * tri
        num = jnp.einsum('bij,bjd->bid', intra, vv) + jnp.einsum('bim,bmd->bid', q, S)
        den = jnp.sum(intra, axis=-1) + jnp.einsum('bim,bm->bi', q, z)
        out = num / (den[..., None] + eps)
        S = S + jnp.einsum('bjm,bjd->bmd', k, vv)
        z = z + jnp.sum(k, axis=1)
        return (S, z), out

    S0 = jnp.zeros((bh, M, Dv), dtype=jnp.float32)
    z0 = jnp.zeros((bh, M), dtype=jnp.float32)
    _, outs = jax.lax.scan(step, (S0, z0), (qc, kc, vc))
    return outs.swapaxes(0, 1).reshape(bh, L, Dv)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _pallas_kernel(q_ref, k_ref, v_ref, o_ref, s_scratch, z_scratch, *,
                   chunk: int, eps: float):
    """Chunked causal prefix-sum over a GB-sized group of (batch*head) rows.

    Blocks are [GB, C, M]/[GB, C, Dv]; the running state (S = sum phi(k) v^T,
    z = sum phi(k)) lives in VMEM scratch across the sequential chunk grid
    dimension.  Grouping GB rows per grid step amortizes grid overhead and
    feeds the MXU batched matmuls (measured ~25% faster than one row per
    step at the production shapes).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    q = q_ref[...].astype(jnp.float32)                # [GB, C, M]
    k = k_ref[...].astype(jnp.float32)                # [GB, C, M]
    v = v_ref[...].astype(jnp.float32)                # [GB, C, Dv]
    S = s_scratch[...]                                # [GB, M, Dv]
    z = z_scratch[...]                                # [GB, 1, M]

    bmm_t = (((2,), (2,)), ((0,), (0,)))              # q @ k^T per group row
    intra = jax.lax.dot_general(q, k, bmm_t, preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    intra = jnp.where((row >= col)[None], intra, 0.0)

    bmm = (((2,), (1,)), ((0,), (0,)))
    num = (jax.lax.dot_general(intra, v, bmm, preferred_element_type=jnp.float32)
           + jax.lax.dot_general(q, S, bmm, preferred_element_type=jnp.float32))
    den = (jnp.sum(intra, axis=-1, keepdims=True)
           + jax.lax.dot_general(q, z.swapaxes(1, 2), bmm,
                                 preferred_element_type=jnp.float32))
    o_ref[...] = (num / (den + eps)).astype(o_ref.dtype)

    bmm_kt = (((1,), (1,)), ((0,), (0,)))             # k^T @ v per group row
    s_scratch[...] = S + jax.lax.dot_general(k, v, bmm_kt,
                                             preferred_element_type=jnp.float32)
    z_scratch[...] = z + jnp.sum(k, axis=1, keepdims=True)


def _group_size(bh: int, chunk: int, m: int, dv: int) -> int:
    """Largest group of bh rows per grid step that divides bh and keeps the
    double-buffered blocks + state inside the ~16MB VMEM budget."""
    for gb in (8, 4, 2, 1):
        if bh % gb:
            continue
        block_bytes = gb * chunk * (2 * m + 2 * dv) * 4 * 2   # in+out, 2-buffered
        state_bytes = gb * (m * dv + m) * 4
        if block_bytes + state_bytes < 12 * 1024 * 1024:
            return gb
    return 1


def _pallas_impl(phi_q: jax.Array, phi_k: jax.Array, v: jax.Array,
                 chunk: int, eps: float) -> jax.Array:
    bh, L, M = phi_q.shape
    Dv = v.shape[-1]
    gb = _group_size(bh, chunk, M, Dv)
    grid = (bh // gb, L // chunk)
    blk = lambda _c: pl.BlockSpec((gb, chunk, _c), lambda i, j: (i, j, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pallas_kernel, chunk=chunk, eps=eps),
        grid=grid,
        in_specs=[blk(M), blk(M), blk(Dv)],
        out_specs=blk(Dv),
        out_shape=jax.ShapeDtypeStruct((bh, L, Dv), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((gb, M, Dv), jnp.float32),
            pltpu.VMEM((gb, 1, M), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(phi_q, phi_k, v)


# ---------------------------------------------------------------------------
# Pallas backward kernels
#
# out_i = N_i / D_i with N_i = phi_q_i S_i, D_i = phi_q_i z_i + eps, where
# (S_i, z_i) are the causal prefix sums.  With g = dL/dout:
#   u_i = g_i / D_i                      [Dv]
#   w_i = -(g_i . out_i) / D_i           scalar
#   dphi_q_i = S_i u_i + w_i z_i         (prefix states -> forward pass)
#   dv_j     = phi_k_j R_j               R_j = sum_{i>=j} phi_q_i u_i^T
#   dphi_k_j = R_j v_j + r_j             r_j = sum_{i>=j} w_i phi_q_i
# Pass A re-runs the forward chunk scan to produce (u, w, dphi_q);
# pass B scans chunks in REVERSE carrying the suffix states (R, r).
# ---------------------------------------------------------------------------

def _bwd_a_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, u_ref, w_ref,
                  s_scratch, z_scratch, *, chunk: int, eps: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    q = q_ref[...].astype(jnp.float32)                # [GB, C, M]
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)                # [GB, C, Dv]
    g = g_ref[...].astype(jnp.float32)                # [GB, C, Dv]
    S = s_scratch[...]                                # [GB, M, Dv]
    z = z_scratch[...]                                # [GB, 1, M]

    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    intra = jax.lax.dot_general(q, k, bmm_t, preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]
    intra = jnp.where(tril, intra, 0.0)

    num = (jax.lax.dot_general(intra, v, bmm, preferred_element_type=jnp.float32)
           + jax.lax.dot_general(q, S, bmm, preferred_element_type=jnp.float32))
    den = (jnp.sum(intra, axis=-1, keepdims=True)
           + jax.lax.dot_general(q, z.swapaxes(1, 2), bmm,
                                 preferred_element_type=jnp.float32)) + eps
    out = num / den
    u = g / den                                        # [GB, C, Dv]
    w = -jnp.sum(g * out, axis=-1, keepdims=True) / den   # [GB, C, 1]
    u_ref[...] = u
    w_ref[...] = w

    # dq = (A  tril) @ k + u @ S^T + w * z,  A_ij = u_i.v_j + w_i
    a = jax.lax.dot_general(u, v, bmm_t, preferred_element_type=jnp.float32) + w
    a = jnp.where(tril, a, 0.0)
    bmm_st = (((2,), (2,)), ((0,), (0,)))              # u [C,Dv] x S [M,Dv]
    dq = (jax.lax.dot_general(a, k, bmm, preferred_element_type=jnp.float32)
          + jax.lax.dot_general(u, S, bmm_st, preferred_element_type=jnp.float32)
          + w * z)
    dq_ref[...] = dq.astype(dq_ref.dtype)

    bmm_kt = (((1,), (1,)), ((0,), (0,)))
    s_scratch[...] = S + jax.lax.dot_general(k, v, bmm_kt,
                                             preferred_element_type=jnp.float32)
    z_scratch[...] = z + jnp.sum(k, axis=1, keepdims=True)


def _bwd_b_kernel(q_ref, k_ref, v_ref, u_ref, w_ref, dk_ref, dv_ref,
                  r_scratch, rr_scratch, *, chunk: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        r_scratch[...] = jnp.zeros_like(r_scratch)
        rr_scratch[...] = jnp.zeros_like(rr_scratch)

    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    u = u_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)                 # [GB, C, 1]
    R = r_scratch[...]                                 # [GB, M, Dv] suffix
    r = rr_scratch[...]                                # [GB, 1, M]  suffix

    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]

    # within-chunk A^T (j row, i col => i >= j means col >= row)
    a = jax.lax.dot_general(u, v, bmm_t, preferred_element_type=jnp.float32) + w
    a = jnp.where(tril, a, 0.0)                        # A[i, j]
    aT = a.swapaxes(1, 2)                              # A^T[j, i]
    p = jax.lax.dot_general(q, k, bmm_t, preferred_element_type=jnp.float32)
    p = jnp.where(tril, p, 0.0)                        # P[i, j]
    pT = p.swapaxes(1, 2)

    bmm_st = (((2,), (2,)), ((0,), (0,)))
    dk = (jax.lax.dot_general(aT, q, bmm, preferred_element_type=jnp.float32)
          + jax.lax.dot_general(v, R, bmm_st, preferred_element_type=jnp.float32)
          + r)
    dv = (jax.lax.dot_general(pT, u, bmm, preferred_element_type=jnp.float32)
          + jax.lax.dot_general(k, R, bmm, preferred_element_type=jnp.float32))
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)

    bmm_qt = (((1,), (1,)), ((0,), (0,)))              # q^T @ u
    r_scratch[...] = R + jax.lax.dot_general(q, u, bmm_qt,
                                             preferred_element_type=jnp.float32)
    rr_scratch[...] = r + jnp.sum(w * q, axis=1, keepdims=True)


def _pallas_bwd(phi_q, phi_k, v, g, chunk: int, eps: float):
    """[BH, L, ...] gradients via the two-pass kernel scheme."""
    bh, L, M = phi_q.shape
    Dv = v.shape[-1]
    gb = _group_size(bh, chunk, M, Dv)
    grid = (bh // gb, L // chunk)
    blk = lambda c: pl.BlockSpec((gb, chunk, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    blk_rev = lambda c: pl.BlockSpec(
        (gb, chunk, c), lambda i, j: (i, L // chunk - 1 - j, 0),
        memory_space=pltpu.VMEM)

    dq, u, w = pl.pallas_call(
        functools.partial(_bwd_a_kernel, chunk=chunk, eps=eps),
        grid=grid,
        in_specs=[blk(M), blk(M), blk(Dv), blk(Dv)],
        out_specs=(blk(M), blk(Dv), blk(1)),
        out_shape=(jax.ShapeDtypeStruct((bh, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((bh, L, Dv), jnp.float32),
                   jax.ShapeDtypeStruct((bh, L, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((gb, M, Dv), jnp.float32),
                        pltpu.VMEM((gb, 1, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(phi_q, phi_k, v, g)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_b_kernel, chunk=chunk),
        grid=grid,
        in_specs=[blk_rev(M), blk_rev(M), blk_rev(Dv), blk_rev(Dv), blk_rev(1)],
        out_specs=(blk_rev(M), blk_rev(Dv)),
        out_shape=(jax.ShapeDtypeStruct((bh, L, M), jnp.float32),
                   jax.ShapeDtypeStruct((bh, L, Dv), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((gb, M, Dv), jnp.float32),
                        pltpu.VMEM((gb, 1, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(phi_q, phi_k, v, u, w)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op: pallas forward on TPU, scan-based backward
# ---------------------------------------------------------------------------

def _use_pallas() -> bool:
    return jax.default_backend() == 'tpu'


def _padded_call(impl, phi_q, phi_k, v, chunk, eps):
    """Flatten leading dims to B*H, pad L to a chunk multiple, call, unpad."""
    *lead, L, M = phi_q.shape
    Dv = v.shape[-1]
    bh = 1
    for s in lead:
        bh *= s
    q2 = phi_q.reshape(bh, L, M)
    k2 = phi_k.reshape(bh, L, M)
    v2 = v.reshape(bh, L, Dv)
    pad = (-L) % chunk
    if pad:
        q2 = jnp.pad(q2, ((0, 0), (0, pad), (0, 0)))
        k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
    out = impl(q2, k2, v2, chunk, eps)
    if pad:
        out = out[:, :L]
    return out.reshape(*lead, L, Dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def causal_linear_attention(phi_q: jax.Array, phi_k: jax.Array, v: jax.Array,
                            chunk: int = 128, eps: float = EPS) -> jax.Array:
    """Normalized causal linear attention.

    phi_q, phi_k: [..., L, M] non-negative features; v: [..., L, Dv].
    Returns [..., L, Dv] float32.
    """
    impl = _pallas_impl if _use_pallas() else _scan_impl
    return _padded_call(impl, phi_q, phi_k, v, chunk, eps)


def _cla_fwd(phi_q, phi_k, v, chunk, eps):
    out = causal_linear_attention(phi_q, phi_k, v, chunk, eps)
    return out, (phi_q, phi_k, v)


def _cla_bwd(chunk, eps, residuals, g):
    phi_q, phi_k, v = residuals
    if _use_pallas():
        # dedicated two-pass Pallas backward (forward-state replay +
        # reverse suffix scan)
        *lead, L, M = phi_q.shape
        Dv = v.shape[-1]
        bh = 1
        for s in lead:
            bh *= s
        q2 = phi_q.reshape(bh, L, M).astype(jnp.float32)
        k2 = phi_k.reshape(bh, L, M).astype(jnp.float32)
        v2 = v.reshape(bh, L, Dv).astype(jnp.float32)
        g2 = g.reshape(bh, L, Dv).astype(jnp.float32)
        pad = (-L) % chunk
        if pad:
            q2 = jnp.pad(q2, ((0, 0), (0, pad), (0, 0)))
            k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
            v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
            g2 = jnp.pad(g2, ((0, 0), (0, pad), (0, 0)))
        dq, dk, dv = _pallas_bwd(q2, k2, v2, g2, chunk, eps)
        if pad:
            dq, dk, dv = dq[:, :L], dk[:, :L], dv[:, :L]
        return (dq.reshape(phi_q.shape).astype(phi_q.dtype),
                dk.reshape(phi_k.shape).astype(phi_k.dtype),
                dv.reshape(v.shape).astype(v.dtype))
    # CPU fallback: recompute through the differentiable scan implementation
    _, vjp = jax.vjp(
        lambda q, k, vv: _padded_call(_scan_impl, q, k, vv, chunk, eps),
        phi_q, phi_k, v)
    return vjp(g)


causal_linear_attention.defvjp(_cla_fwd, _cla_bwd)


# ---------------------------------------------------------------------------
# decode: O(1) carried state
# ---------------------------------------------------------------------------

def linear_attention_decode_step(
    phi_q: jax.Array,          # [..., M]   features of the current query
    phi_k: jax.Array,          # [..., M]   features of the current key
    v: jax.Array,              # [..., Dv]
    S: jax.Array,              # [..., M, Dv] running sum phi(k) v^T
    z: jax.Array,              # [..., M]     running sum phi(k)
    eps: float = EPS,
    update_mask: Optional[jax.Array] = None,   # [...] 0/1 per batch element
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One causal step (current token included): returns (out, S', z').

    ``update_mask`` zeroes the state contribution of masked elements (used
    by batched generation to leave rejected songs' state untouched without a
    second full-state select)."""
    if update_mask is not None:
        m = update_mask.astype(phi_k.dtype)
        while m.ndim < phi_k.ndim:
            m = m[..., None]
        phi_k = phi_k * m
    S = S + phi_k[..., :, None] * v[..., None, :]
    z = z + phi_k
    num = jnp.einsum('...m,...md->...d', phi_q, S)
    den = jnp.einsum('...m,...m->...', phi_q, z)
    return num / (den[..., None] + eps), S, z
