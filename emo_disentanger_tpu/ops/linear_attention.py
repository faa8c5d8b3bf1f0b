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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _interpret() -> bool:
    """EMODIS_PALLAS_INTERPRET=1 runs every Pallas kernel in interpret mode
    (and enables the Pallas paths off-TPU), so the kernels' exact numerics
    — including the bf16 dot-operand economy under bf16 compute — are
    testable on the CPU suite (advisor r3)."""
    return os.environ.get('EMODIS_PALLAS_INTERPRET', '0') == '1'


def _pallas_call(*args, **kwargs):
    return pl.pallas_call(*args, interpret=_interpret(), **kwargs)


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
        q, r = jnp.linalg.qr(g)
        # Haar sign correction (Mezzadri 2006): raw LAPACK Q has a sign
        # convention that biases the direction distribution — measured ~15%
        # systematic error on the softmax-kernel estimate without it
        # (tests/test_favor_oracle.py::test_favor_kernel_estimator_is_unbiased)
        q = q * jnp.sign(jnp.diagonal(r))[None, :]
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
    return _pallas_call(
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

    dq, u, w = _pallas_call(
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

    dk, dv = _pallas_call(
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
    return jax.default_backend() == 'tpu' or _interpret()


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
# fused FAVOR+ attention: feature map computed INSIDE the kernels
#
# Materializing phi(q)/phi(k) [B, H, L, M] in HBM dominates the training
# step at production shapes (f32 tensors + XLA layout copies around the
# kernel measured ~4x the attention math itself; B=32/L=3072 OOMs a v5e
# chip on the saved residuals alone).  The fused op takes the raw q/k
# projections [BH, L, Dh] and omega [Dh, M], computes the feature map
# per chunk in VMEM, and recomputes it in the backward kernels instead of
# saving it — HBM residuals shrink from 2x[BH, L, M] f32 to the q/k/v
# inputs, and the q/k -> phi matmuls fuse into the MXU pipeline.
#
# Stabilizer convention (identical to favor_features): queries subtract a
# per-position feature max (cancels in num/den); keys subtract ONE scalar
# per batch*head row — computed by a cheap pre-pass kernel that reads only
# k.  Both are stop-gradient.
#
# omega is a random-feature BUFFER, never trained (the reference strips
# `feature_map.omega` from checkpoints, ``train.py:306-308``); its
# gradient is defined as zero.
# ---------------------------------------------------------------------------

def _kmax_kernel(k_ref, omega_ref, m_ref, *, scale: float):
    """Running max over (L, M) of h_k = ks @ omega - ||ks||^2/2, per row.
    The output is a [GB, 128] lane-width tile (the scalar broadcast across
    lanes): Mosaic's layout inference rejects sub-lane outputs."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)

    ks = k_ref[...].astype(jnp.float32) * scale            # [GB, C, Dh]
    omega = omega_ref[...]                                 # [Dh, M]
    u = jax.lax.dot_general(ks, omega, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = u - 0.5 * jnp.sum(ks * ks, axis=-1, keepdims=True)
    s = jnp.max(jnp.max(h, axis=1), axis=-1, keepdims=True)   # [GB, 1]
    m_ref[...] = jnp.maximum(m_ref[...], jnp.broadcast_to(s, m_ref.shape))


def _phi_chunk(x_ref, omega, scale, *, is_query: bool, m_ref=None):
    """In-kernel feature map for one [GB, C, Dh] block -> phi [GB, C, M]
    (and xs, needed by the backward chain rule)."""
    xs = x_ref[...].astype(jnp.float32) * scale
    u = jax.lax.dot_general(xs, omega, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = u - 0.5 * jnp.sum(xs * xs, axis=-1, keepdims=True)
    if is_query:
        h = h - jnp.max(h, axis=-1, keepdims=True)
    else:
        h = h - jnp.expand_dims(m_ref[...][:, 0:1], 1)     # [GB, 1, 1]
    # keep the 1/sqrt(M) normalizer: it cancels in the num/den ratio ONLY
    # up to the absolute eps in the denominator — dropping it would change
    # the eps-regularized function vs favor_features + the unfused kernel
    return jnp.exp(h) * (omega.shape[-1] ** -0.5), xs


def _dphi_to_dx(dphi, phi, xs, omega, scale):
    """Chain rule through phi = exp(xs @ omega - ||xs||^2/2) (stabilizers are
    stop-gradient): dx = scale * ((dphi*phi) @ omega^T - rowsum(dphi*phi)*xs)."""
    t = dphi * phi                                         # [GB, C, M]
    dxs = (jax.lax.dot_general(t, omega, (((2,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           - jnp.sum(t, axis=-1, keepdims=True) * xs)
    return dxs * scale


def _fused_fwd_kernel(q_ref, k_ref, v_ref, m_ref, omega_ref, o_ref,
                      s_scratch, z_scratch, *, chunk: int, scale: float,
                      eps: float, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    # dot_dtype: bf16 operands (f32 accumulation via preferred_element_type)
    # when the surrounding compute is bf16 — the same convention as flash
    # attention's P@V matmul; doubles MXU throughput of the chunk dots.
    # f32 inputs keep exact f32 operands.
    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    q, _ = _phi_chunk(q_ref, omega, scale, is_query=True)
    k, _ = _phi_chunk(k_ref, omega, scale, is_query=False, m_ref=m_ref)
    v = v_ref[...].astype(jnp.float32)
    S = s_scratch[...]
    z = z_scratch[...]

    bmm_t = (((2,), (2,)), ((0,), (0,)))
    intra = jax.lax.dot_general(c(q), c(k), bmm_t,
                                preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    intra = jnp.where((row >= col)[None], intra, 0.0)

    bmm = (((2,), (1,)), ((0,), (0,)))
    num = (jax.lax.dot_general(c(intra), c(v), bmm,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(c(q), c(S), bmm,
                                 preferred_element_type=jnp.float32))
    den = (jnp.sum(intra, axis=-1, keepdims=True)
           + jax.lax.dot_general(c(q), c(z.swapaxes(1, 2)), bmm,
                                 preferred_element_type=jnp.float32))
    o_ref[...] = (num / (den + eps)).astype(o_ref.dtype)

    bmm_kt = (((1,), (1,)), ((0,), (0,)))
    s_scratch[...] = S + jax.lax.dot_general(c(k), c(v), bmm_kt,
                                             preferred_element_type=jnp.float32)
    z_scratch[...] = z + jnp.sum(k, axis=1, keepdims=True)


def _fused_bwd_a_kernel(q_ref, k_ref, v_ref, g_ref, m_ref, omega_ref,
                        dq_ref, uw_ref, s_scratch, z_scratch, *,
                        chunk: int, scale: float, eps: float, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    q, qs = _phi_chunk(q_ref, omega, scale, is_query=True)
    k, _ = _phi_chunk(k_ref, omega, scale, is_query=False, m_ref=m_ref)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    S = s_scratch[...]
    z = z_scratch[...]

    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    intra = jax.lax.dot_general(c(q), c(k), bmm_t,
                                preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]
    intra = jnp.where(tril, intra, 0.0)

    num = (jax.lax.dot_general(c(intra), c(v), bmm,
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(c(q), c(S), bmm,
                                 preferred_element_type=jnp.float32))
    den = (jnp.sum(intra, axis=-1, keepdims=True)
           + jax.lax.dot_general(c(q), c(z.swapaxes(1, 2)), bmm,
                                 preferred_element_type=jnp.float32)) + eps
    out = num / den
    u = g / den
    w = -jnp.sum(g * out, axis=-1, keepdims=True) / den
    # pack (u [., Dv], w [., 1]) into one lane-dense tile: a separate
    # [bh, L, 1] array would be padded 128x by the (8, 128) HBM tiling.
    # Stored in uw_ref's dtype (bf16 under bf16 compute — the [bh, L, 128]
    # residual is the largest HBM tensor the backward touches; measured
    # round 3 at f32 it alone moved 2x the q/k/v traffic).
    Dv = u.shape[-1]
    pad_w = uw_ref.shape[-1] - Dv - 1
    uw_ref[...] = jnp.concatenate(
        [u, w, jnp.zeros(w.shape[:-1] + (pad_w,), jnp.float32)],
        axis=-1).astype(uw_ref.dtype)

    a = jax.lax.dot_general(c(u), c(v), bmm_t,
                            preferred_element_type=jnp.float32) + w
    a = jnp.where(tril, a, 0.0)
    bmm_st = (((2,), (2,)), ((0,), (0,)))
    dphi_q = (jax.lax.dot_general(c(a), c(k), bmm,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(c(u), c(S), bmm_st,
                                    preferred_element_type=jnp.float32)
              + w * z)
    dq_ref[...] = _dphi_to_dx(dphi_q, q, qs, omega, scale).astype(dq_ref.dtype)

    bmm_kt = (((1,), (1,)), ((0,), (0,)))
    s_scratch[...] = S + jax.lax.dot_general(c(k), c(v), bmm_kt,
                                             preferred_element_type=jnp.float32)
    z_scratch[...] = z + jnp.sum(k, axis=1, keepdims=True)


def _fused_bwd_b_kernel(q_ref, k_ref, v_ref, uw_ref, m_ref, omega_ref,
                        dk_ref, dv_ref, r_scratch, rr_scratch, *,
                        chunk: int, scale: float, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        r_scratch[...] = jnp.zeros_like(r_scratch)
        rr_scratch[...] = jnp.zeros_like(rr_scratch)

    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    q, _ = _phi_chunk(q_ref, omega, scale, is_query=True)
    k, ks = _phi_chunk(k_ref, omega, scale, is_query=False, m_ref=m_ref)
    v = v_ref[...].astype(jnp.float32)
    uw = uw_ref[...]
    Dv = v.shape[-1]
    u = uw[:, :, :Dv]
    w = uw[:, :, Dv:Dv + 1]                            # [GB, C, 1]
    R = r_scratch[...]
    r = rr_scratch[...]

    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]

    a = jax.lax.dot_general(c(u), c(v), bmm_t,
                            preferred_element_type=jnp.float32) + w
    a = jnp.where(tril, a, 0.0)
    aT = a.swapaxes(1, 2)
    p = jax.lax.dot_general(c(q), c(k), bmm_t,
                            preferred_element_type=jnp.float32)
    p = jnp.where(tril, p, 0.0)
    pT = p.swapaxes(1, 2)

    bmm_st = (((2,), (2,)), ((0,), (0,)))
    dphi_k = (jax.lax.dot_general(c(aT), c(q), bmm,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(c(v), c(R), bmm_st,
                                    preferred_element_type=jnp.float32)
              + r)
    dv = (jax.lax.dot_general(c(pT), c(u), bmm,
                              preferred_element_type=jnp.float32)
          + jax.lax.dot_general(c(k), c(R), bmm,
                                preferred_element_type=jnp.float32))
    dk_ref[...] = _dphi_to_dx(dphi_k, k, ks, omega, scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)

    bmm_qt = (((1,), (1,)), ((0,), (0,)))
    r_scratch[...] = R + jax.lax.dot_general(c(q), c(u), bmm_qt,
                                             preferred_element_type=jnp.float32)
    rr_scratch[...] = r + jnp.sum(w * q, axis=1, keepdims=True)


def _fused_group_size(bh: int):
    """Group size for the fused kernels: the m-stabilizer tile [gb, 128]
    needs gb divisible by 8 or equal to bh (Mosaic block-shape rule).
    Returns None when no valid grouping exists (caller falls back to the
    unfused composition)."""
    try:
        want = int(os.environ.get('EMODIS_FUSED_GB', '8'))
    except ValueError:
        want = 8
    if want > 0 and bh % want == 0 and want % 8 == 0:
        return want
    if bh % 8 == 0:
        return 8
    if bh <= 8:
        return bh
    return None


def _fused_specs(bh, L, Dh, M, Dv, chunk):
    gb = _fused_group_size(bh)
    grid = (bh // gb, L // chunk)
    blk = lambda c: pl.BlockSpec((gb, chunk, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    blk_rev = lambda c: pl.BlockSpec(
        (gb, chunk, c), lambda i, j: (i, L // chunk - 1 - j, 0),
        memory_space=pltpu.VMEM)
    m_blk = pl.BlockSpec((gb, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
    omega_blk = pl.BlockSpec((Dh, M), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    return gb, grid, blk, blk_rev, m_blk, omega_blk


def _fused_key_max(k2, omega, chunk, scale):
    bh, L, Dh = k2.shape
    M = omega.shape[-1]
    gb, grid, blk, _, m_blk, omega_blk = _fused_specs(bh, L, Dh, M, Dh, chunk)
    return _pallas_call(
        functools.partial(_kmax_kernel, scale=scale),
        grid=grid,
        in_specs=[blk(Dh), omega_blk],
        out_specs=m_blk,
        out_shape=jax.ShapeDtypeStruct((bh, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(k2, omega)


def _dot_dtype_for(x):
    """bf16 dot operands (f32 accumulation) when the surrounding compute is
    bf16; exact f32 operands otherwise.  Measured round 3: the fused
    attention kernels were 43.6% of the bf16 train step with f32-operand
    dots running the MXU at half rate."""
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _fused_fwd_impl(q2, k2, v2, omega, chunk, eps):
    bh, L, Dh = q2.shape
    M = omega.shape[-1]
    Dv = v2.shape[-1]
    scale = Dh ** -0.25
    m = _fused_key_max(k2, omega, chunk, scale)
    gb, grid, blk, _, m_blk, omega_blk = _fused_specs(bh, L, Dh, M, Dv, chunk)
    return _pallas_call(
        functools.partial(_fused_fwd_kernel, chunk=chunk, scale=scale, eps=eps,
                          dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk(Dh), blk(Dh), blk(Dv), m_blk, omega_blk],
        out_specs=blk(Dv),
        out_shape=jax.ShapeDtypeStruct((bh, L, Dv), q2.dtype),
        scratch_shapes=[pltpu.VMEM((gb, M, Dv), jnp.float32),
                        pltpu.VMEM((gb, 1, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, m, omega)


def _fused_bwd_impl(q2, k2, v2, g2, omega, chunk, eps):
    bh, L, Dh = q2.shape
    M = omega.shape[-1]
    Dv = v2.shape[-1]
    scale = Dh ** -0.25
    m = _fused_key_max(k2, omega, chunk, scale)
    gb, grid, blk, blk_rev, m_blk, omega_blk = _fused_specs(
        bh, L, Dh, M, Dv, chunk)
    m_blk_rev = m_blk  # constant over j either way

    UW = -(-(Dv + 1) // 128) * 128        # lane-dense (u, w) pack width
    uw_dtype = _dot_dtype_for(q2)         # bf16 residual under bf16 compute
    dq, uw = _pallas_call(
        functools.partial(_fused_bwd_a_kernel, chunk=chunk, scale=scale,
                          eps=eps, dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk(Dh), blk(Dh), blk(Dv), blk(Dv), m_blk, omega_blk],
        out_specs=(blk(Dh), blk(UW)),
        out_shape=(jax.ShapeDtypeStruct((bh, L, Dh), q2.dtype),
                   jax.ShapeDtypeStruct((bh, L, UW), uw_dtype)),
        scratch_shapes=[pltpu.VMEM((gb, M, Dv), jnp.float32),
                        pltpu.VMEM((gb, 1, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, g2, m, omega)

    dk, dv = _pallas_call(
        functools.partial(_fused_bwd_b_kernel, chunk=chunk, scale=scale,
                          dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk_rev(Dh), blk_rev(Dh), blk_rev(Dv), blk_rev(UW),
                  m_blk_rev, omega_blk],
        out_specs=(blk_rev(Dh), blk_rev(Dv)),
        out_shape=(jax.ShapeDtypeStruct((bh, L, Dh), k2.dtype),
                   jax.ShapeDtypeStruct((bh, L, Dv), v2.dtype)),
        scratch_shapes=[pltpu.VMEM((gb, M, Dv), jnp.float32),
                        pltpu.VMEM((gb, 1, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, uw, m, omega)

    return dq, dk, dv


def _favor_compose(q, k, v, omega, chunk, eps):
    """Unfused reference composition (also the CPU path): favor_features +
    the chunked scan.  Differentiable."""
    phi_q = favor_features(q, omega, is_query=True)
    phi_k = favor_features(k, omega, is_query=False)
    out = _padded_call(_scan_impl, phi_q, phi_k, v.astype(jnp.float32),
                       chunk, eps)
    return out


def _fused_flatten(x):
    *lead, L, D = x.shape
    bh = 1
    for s in lead:
        bh *= s
    return x.reshape(bh, L, D), lead


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def favor_causal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           omega: jax.Array, chunk: int = 128,
                           eps: float = EPS) -> jax.Array:
    """FAVOR+ causal linear attention with the feature map fused into the
    kernel.  q/k [..., L, Dh] raw projections, v [..., L, Dv],
    omega [Dh, M].  Returns [..., L, Dv] in q's dtype (f32 accumulation
    in-kernel; bf16 inputs get a bf16 output, halving HBM traffic).  Same
    function as
    ``causal_linear_attention(favor_features(q), favor_features(k), v)``;
    omega's gradient is defined as zero (random-feature buffer, never
    trained — reference strips it from checkpoints, ``train.py:306-308``).
    """
    if not _use_pallas():
        return _favor_compose(q, k, v, omega, chunk, eps).astype(q.dtype)
    bh = 1
    for d in q.shape[:-2]:
        bh *= d
    if _fused_group_size(bh) is None:
        return _favor_compose(q, k, v, omega, chunk, eps).astype(q.dtype)
    q2, lead = _fused_flatten(q)
    k2, _ = _fused_flatten(k)
    v2, _ = _fused_flatten(v)
    L = q2.shape[1]
    Dv = v2.shape[-1]
    pad = (-L) % chunk
    if pad:
        q2 = jnp.pad(q2, ((0, 0), (0, pad), (0, 0)))
        k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
    out = _fused_fwd_impl(q2, k2, v2, omega.astype(jnp.float32), chunk, eps)
    if pad:
        out = out[:, :L]
    return out.reshape(*lead, L, Dv)


def _fca_fwd(q, k, v, omega, chunk, eps):
    out = favor_causal_attention(q, k, v, omega, chunk, eps)
    return out, (q, k, v, omega)


def _fca_bwd(chunk, eps, residuals, g):
    q, k, v, omega = residuals
    bh = 1
    for d in q.shape[:-2]:
        bh *= d
    if not _use_pallas() or _fused_group_size(bh) is None:
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _favor_compose(q_, k_, v_, omega, chunk,
                                              eps).astype(q.dtype),
            q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, jnp.zeros_like(omega)
    q2, lead = _fused_flatten(q)
    k2, _ = _fused_flatten(k)
    v2, _ = _fused_flatten(v)
    g2, _ = _fused_flatten(g)
    L = q2.shape[1]
    pad = (-L) % chunk
    if pad:
        q2 = jnp.pad(q2, ((0, 0), (0, pad), (0, 0)))
        k2 = jnp.pad(k2, ((0, 0), (0, pad), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, 0), (0, pad), (0, 0)))
    dq, dk, dv = _fused_bwd_impl(q2, k2, v2, g2, omega.astype(jnp.float32),
                                 chunk, eps)
    if pad:
        dq, dk, dv = dq[:, :L], dk[:, :L], dv[:, :L]
    return (dq.reshape(q.shape).astype(q.dtype),
            dk.reshape(k.shape).astype(k.dtype),
            dv.reshape(v.shape).astype(v.dtype),
            jnp.zeros_like(omega))


favor_causal_attention.defvjp(_fca_fwd, _fca_bwd)


# ---------------------------------------------------------------------------
# heads-last fused kernels: consume [B, L, D] directly.
#
# The [B, L, H*Dh] -> [B*H, L, Dh] head transpose around every custom call
# costs ~20 ms/step at B=16 (profiled round 3: XLA materializes 50 MB
# relayout copies at ~25 GB/s effective).  These kernels keep the natural
# activation layout and do the head split IN-KERNEL via static lane slices
# (the same technique as the whole-layer decode kernel); q/k/v/g/dq/dk/dv
# and the output never leave [B, L, D].
# ---------------------------------------------------------------------------

def _hl_group(B: int, row_bytes: int, scratch_row_bytes: int) -> int:
    """Largest divisor of B whose double-buffered blocks + scratch fit the
    working VMEM budget."""
    for gb in range(B, 0, -1):
        if B % gb:
            continue
        if gb * (2 * row_bytes + scratch_row_bytes) <= 11 * 1024 * 1024:
            return gb
    return 1


def _hl_phi(xh, omega, scale, is_query, kmax=None):
    """Feature map for one head's [GB, C, Dh] slice -> [GB, C, M], xs.

    ``kmax`` [GB, 1, >=M] is lane-replicated (the kmax kernel broadcasts the
    per-row scalar across all 128 lanes) so the subtraction broadcasts over
    sublanes only — Mosaic rejects a combined sublane+lane broadcast."""
    xs = xh.astype(jnp.float32) * scale
    u = jax.lax.dot_general(xs, omega, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = u - 0.5 * jnp.sum(xs * xs, axis=-1, keepdims=True)
    if is_query:
        h = h - jnp.max(h, axis=-1, keepdims=True)
    else:
        h = h - kmax[:, :, :h.shape[-1]]
    return jnp.exp(h) * (omega.shape[-1] ** -0.5), xs


def _kmax_kernel_hl(k_ref, omega_ref, m_ref, *, chunk: int, scale: float,
                    n_head: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)

    omega = omega_ref[...]
    D = k_ref.shape[-1]
    Dh = D // n_head
    kf = k_ref[...].astype(jnp.float32)
    for hd in range(n_head):
        ks = kf[:, :, hd * Dh:(hd + 1) * Dh] * scale
        u = jax.lax.dot_general(ks, omega, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = u - 0.5 * jnp.sum(ks * ks, axis=-1, keepdims=True)
        s = jnp.max(jnp.max(h, axis=1), axis=-1, keepdims=True)   # [GB, 1]
        m_ref[:, hd, :] = jnp.maximum(
            m_ref[:, hd, :], jnp.broadcast_to(s, m_ref[:, hd, :].shape))


def _fused_fwd_kernel_hl(q_ref, k_ref, v_ref, m_ref, omega_ref, o_ref,
                         s_scratch, z_scratch, *, chunk: int, scale: float,
                         eps: float, n_head: int, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    D = q_ref.shape[-1]
    Dh = D // n_head
    M = omega.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]
    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    mvals = m_ref[...]

    for hd in range(n_head):
        cs = slice(hd * Dh, (hd + 1) * Dh)
        ms = slice(hd * M, (hd + 1) * M)
        kmax = mvals[:, hd, :][:, None, :]          # [GB, 1, 128]               # [GB, 1, 1]
        q, _ = _hl_phi(q_ref[...][:, :, cs], omega, scale, True)
        k, _ = _hl_phi(k_ref[...][:, :, cs], omega, scale, False, kmax)
        v = v_ref[...][:, :, cs].astype(jnp.float32)
        S = s_scratch[:, ms, :]
        z = z_scratch[:, :, ms]                            # [GB, 1, M]

        intra = jax.lax.dot_general(c(q), c(k), bmm_t,
                                    preferred_element_type=jnp.float32)
        intra = jnp.where(tril, intra, 0.0)
        num = (jax.lax.dot_general(c(intra), c(v), bmm,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(c(q), c(S), bmm,
                                     preferred_element_type=jnp.float32))
        den = (jnp.sum(intra, axis=-1, keepdims=True)
               + jax.lax.dot_general(c(q), c(z.swapaxes(1, 2)), bmm,
                                     preferred_element_type=jnp.float32))
        o_ref[:, :, cs] = (num / (den + eps)).astype(o_ref.dtype)

        bmm_kt = (((1,), (1,)), ((0,), (0,)))
        s_scratch[:, ms, :] = S + jax.lax.dot_general(
            c(k), c(v), bmm_kt, preferred_element_type=jnp.float32)
        z_scratch[:, :, ms] = z + jnp.sum(k, axis=1, keepdims=True)


def _fused_bwd_a_kernel_hl(q_ref, k_ref, v_ref, g_ref, m_ref, omega_ref,
                           dq_ref, uw_ref, s_scratch, z_scratch, *,
                           chunk: int, scale: float, eps: float,
                           n_head: int, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s_scratch[...] = jnp.zeros_like(s_scratch)
        z_scratch[...] = jnp.zeros_like(z_scratch)

    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    D = q_ref.shape[-1]
    Dh = D // n_head
    M = omega.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]
    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    bmm_st = (((2,), (2,)), ((0,), (0,)))
    mvals = m_ref[...]
    UWH = uw_ref.shape[-1] // n_head

    for hd in range(n_head):
        cs = slice(hd * Dh, (hd + 1) * Dh)
        ms = slice(hd * M, (hd + 1) * M)
        us = slice(hd * UWH, (hd + 1) * UWH)
        kmax = mvals[:, hd, :][:, None, :]          # [GB, 1, 128]
        q, qs = _hl_phi(q_ref[...][:, :, cs], omega, scale, True)
        k, _ = _hl_phi(k_ref[...][:, :, cs], omega, scale, False, kmax)
        v = v_ref[...][:, :, cs].astype(jnp.float32)
        g = g_ref[...][:, :, cs].astype(jnp.float32)
        S = s_scratch[:, ms, :]
        z = z_scratch[:, :, ms]

        intra = jax.lax.dot_general(c(q), c(k), bmm_t,
                                    preferred_element_type=jnp.float32)
        intra = jnp.where(tril, intra, 0.0)
        num = (jax.lax.dot_general(c(intra), c(v), bmm,
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(c(q), c(S), bmm,
                                     preferred_element_type=jnp.float32))
        den = (jnp.sum(intra, axis=-1, keepdims=True)
               + jax.lax.dot_general(c(q), c(z.swapaxes(1, 2)), bmm,
                                     preferred_element_type=jnp.float32)) + eps
        out = num / den
        u = g / den
        w = -jnp.sum(g * out, axis=-1, keepdims=True) / den
        pad_w = UWH - Dh - 1
        uw_ref[:, :, us] = jnp.concatenate(
            [u, w, jnp.zeros(w.shape[:-1] + (pad_w,), jnp.float32)],
            axis=-1).astype(uw_ref.dtype)

        a = jax.lax.dot_general(c(u), c(v), bmm_t,
                                preferred_element_type=jnp.float32) + w
        a = jnp.where(tril, a, 0.0)
        dphi_q = (jax.lax.dot_general(c(a), c(k), bmm,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(c(u), c(S), bmm_st,
                                        preferred_element_type=jnp.float32)
                  + w * z)
        dq_ref[:, :, cs] = _dphi_to_dx(dphi_q, q, qs, omega,
                                       scale).astype(dq_ref.dtype)

        bmm_kt = (((1,), (1,)), ((0,), (0,)))
        s_scratch[:, ms, :] = S + jax.lax.dot_general(
            c(k), c(v), bmm_kt, preferred_element_type=jnp.float32)
        z_scratch[:, :, ms] = z + jnp.sum(k, axis=1, keepdims=True)


def _fused_bwd_b_kernel_hl(q_ref, k_ref, v_ref, uw_ref, m_ref, omega_ref,
                           dk_ref, dv_ref, r_scratch, rr_scratch, *,
                           chunk: int, scale: float, n_head: int, dot_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        r_scratch[...] = jnp.zeros_like(r_scratch)
        rr_scratch[...] = jnp.zeros_like(rr_scratch)

    c = lambda t: t.astype(dot_dtype)
    omega = omega_ref[...]
    D = q_ref.shape[-1]
    Dh = D // n_head
    M = omega.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    tril = (row >= col)[None]
    bmm_t = (((2,), (2,)), ((0,), (0,)))
    bmm = (((2,), (1,)), ((0,), (0,)))
    bmm_st = (((2,), (2,)), ((0,), (0,)))
    mvals = m_ref[...]
    UWH = uw_ref.shape[-1] // n_head

    for hd in range(n_head):
        cs = slice(hd * Dh, (hd + 1) * Dh)
        ms = slice(hd * M, (hd + 1) * M)
        us = slice(hd * UWH, (hd + 1) * UWH)
        kmax = mvals[:, hd, :][:, None, :]          # [GB, 1, 128]
        q, _ = _hl_phi(q_ref[...][:, :, cs], omega, scale, True)
        k, ks = _hl_phi(k_ref[...][:, :, cs], omega, scale, False, kmax)
        v = v_ref[...][:, :, cs].astype(jnp.float32)
        uw = uw_ref[...][:, :, us]
        u = uw[:, :, :Dh]
        w = uw[:, :, Dh:Dh + 1]
        R = r_scratch[:, ms, :]
        r = rr_scratch[:, :, ms]

        a = jax.lax.dot_general(c(u), c(v), bmm_t,
                                preferred_element_type=jnp.float32) + w
        a = jnp.where(tril, a, 0.0)
        aT = a.swapaxes(1, 2)
        p = jax.lax.dot_general(c(q), c(k), bmm_t,
                                preferred_element_type=jnp.float32)
        p = jnp.where(tril, p, 0.0)
        pT = p.swapaxes(1, 2)

        dphi_k = (jax.lax.dot_general(c(aT), c(q), bmm,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(c(v), c(R), bmm_st,
                                        preferred_element_type=jnp.float32)
                  + r)
        dv = (jax.lax.dot_general(c(pT), c(u), bmm,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(c(k), c(R), bmm,
                                    preferred_element_type=jnp.float32))
        dk_ref[:, :, cs] = _dphi_to_dx(dphi_k, k, ks, omega,
                                       scale).astype(dk_ref.dtype)
        dv_ref[:, :, cs] = dv.astype(dv_ref.dtype)

        bmm_qt = (((1,), (1,)), ((0,), (0,)))
        r_scratch[:, ms, :] = R + jax.lax.dot_general(
            c(q), c(u), bmm_qt, preferred_element_type=jnp.float32)
        rr_scratch[:, :, ms] = r + jnp.sum(w * q, axis=1, keepdims=True)


def _hl_specs(B, L, D, H, M, chunk, gb, uw_width=None):
    grid = (B // gb, L // chunk)
    blk = lambda c: pl.BlockSpec((gb, chunk, c), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    blk_rev = lambda c: pl.BlockSpec(
        (gb, chunk, c), lambda i, j: (i, L // chunk - 1 - j, 0),
        memory_space=pltpu.VMEM)
    m_blk = pl.BlockSpec((gb, H, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    omega_blk = pl.BlockSpec((D // H, M), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM)
    return grid, blk, blk_rev, m_blk, omega_blk


def _hl_key_max(k2, omega, chunk, scale, n_head, gb):
    B, L, D = k2.shape
    M = omega.shape[-1]
    grid, blk, _, m_blk, omega_blk = _hl_specs(B, L, D, n_head, M, chunk, gb)
    return _pallas_call(
        functools.partial(_kmax_kernel_hl, chunk=chunk, scale=scale,
                          n_head=n_head),
        grid=grid,
        in_specs=[blk(D), omega_blk],
        out_specs=m_blk,
        out_shape=jax.ShapeDtypeStruct((B, n_head, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(k2, omega)


def _hl_fwd_impl(q2, k2, v2, omega, chunk, eps, n_head):
    B, L, D = q2.shape
    M = omega.shape[-1]
    H = n_head
    Dh = D // H
    scale = Dh ** -0.25
    ib = q2.dtype.itemsize
    # fwd rows: q,k,v in + out blocks; scratch S + z per row
    row_bytes = chunk * D * ib * 4 + H * 128 * 4
    scratch_row = H * M * Dh * 4 + H * M * 4
    gb = _hl_group(B, row_bytes, scratch_row)
    m = _hl_key_max(k2, omega, chunk, scale, H, gb)
    grid, blk, _, m_blk, omega_blk = _hl_specs(B, L, D, H, M, chunk, gb)
    return _pallas_call(
        functools.partial(_fused_fwd_kernel_hl, chunk=chunk, scale=scale,
                          eps=eps, n_head=H, dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk(D), blk(D), blk(D), m_blk, omega_blk],
        out_specs=blk(D),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q2.dtype),
        scratch_shapes=[pltpu.VMEM((gb, H * M, Dh), jnp.float32),
                        pltpu.VMEM((gb, 1, H * M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, m, omega)


def _hl_bwd_impl(q2, k2, v2, g2, omega, chunk, eps, n_head):
    B, L, D = q2.shape
    M = omega.shape[-1]
    H = n_head
    Dh = D // H
    scale = Dh ** -0.25
    ib = q2.dtype.itemsize
    uw_dtype = _dot_dtype_for(q2)
    UWH = -(-(Dh + 1) // 128) * 128
    UW = H * UWH
    uw_ib = jnp.dtype(uw_dtype).itemsize
    row_bytes = chunk * (D * ib * 5 + UW * uw_ib) + H * 128 * 4
    scratch_row = H * M * Dh * 4 + H * M * 4
    gb = _hl_group(B, row_bytes, scratch_row)
    m = _hl_key_max(k2, omega, chunk, scale, H, gb)
    grid, blk, blk_rev, m_blk, omega_blk = _hl_specs(B, L, D, H, M, chunk, gb)

    dq, uw = _pallas_call(
        functools.partial(_fused_bwd_a_kernel_hl, chunk=chunk, scale=scale,
                          eps=eps, n_head=H, dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk(D), blk(D), blk(D), blk(D), m_blk, omega_blk],
        out_specs=(blk(D), blk(UW)),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), q2.dtype),
                   jax.ShapeDtypeStruct((B, L, UW), uw_dtype)),
        scratch_shapes=[pltpu.VMEM((gb, H * M, Dh), jnp.float32),
                        pltpu.VMEM((gb, 1, H * M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, g2, m, omega)

    dk, dv = _pallas_call(
        functools.partial(_fused_bwd_b_kernel_hl, chunk=chunk, scale=scale,
                          n_head=H, dot_dtype=_dot_dtype_for(q2)),
        grid=grid,
        in_specs=[blk_rev(D), blk_rev(D), blk_rev(D), blk_rev(UW),
                  m_blk, omega_blk],
        out_specs=(blk_rev(D), blk_rev(D)),
        out_shape=(jax.ShapeDtypeStruct((B, L, D), k2.dtype),
                   jax.ShapeDtypeStruct((B, L, D), v2.dtype)),
        scratch_shapes=[pltpu.VMEM((gb, H * M, Dh), jnp.float32),
                        pltpu.VMEM((gb, 1, H * M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
    )(q2, k2, v2, uw, m, omega)
    return dq, dk, dv


def _hl_compose(q, k, v, omega, chunk, eps, n_head):
    """Fallback: head-split via reshape/transpose + the composed path."""
    B, L, D = q.shape
    Dh = D // n_head
    sp = lambda x: x.reshape(B, L, n_head, Dh).transpose(0, 2, 1, 3)
    out = _favor_compose(sp(q), sp(k), sp(v), omega, chunk, eps)
    return out.transpose(0, 2, 1, 3).reshape(B, L, D).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def favor_causal_attention_heads_last(q: jax.Array, k: jax.Array,
                                      v: jax.Array, omega: jax.Array,
                                      n_head: int, chunk: int = 128,
                                      eps: float = EPS) -> jax.Array:
    """FAVOR+ causal linear attention on [B, L, D] activations with the
    head split INSIDE the kernel (static lane slices) — no [B,H,L,Dh]
    transpose materializes around the custom call.  Numerically identical
    to ``favor_causal_attention`` on the head-split tensors; omega's
    gradient is zero."""
    if not _use_pallas():
        return _hl_compose(q, k, v, omega, chunk, eps, n_head)
    # the heads-last kernels store the per-head key-max stabilizer in one
    # 128-lane tile ([gb, H, 128] block, kmax[:, :, :M] slice); M > 128
    # would need a multi-tile m block — guard with a clear error instead of
    # a Mosaic shape mismatch at trace time (advisor r3)
    if omega.shape[-1] > 128:
        raise NotImplementedError(
            f'heads-last Pallas kernels support favor_dims <= 128 (got '
            f'{omega.shape[-1]}); use favor_causal_attention or the '
            f'composed path')
    B, L, D = q.shape
    pad = (-L) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    out = _hl_fwd_impl(q, k, v, omega.astype(jnp.float32), chunk, eps,
                       n_head)
    if pad:
        out = out[:, :L]
    return out


def _fca_hl_fwd(q, k, v, omega, n_head, chunk, eps):
    out = favor_causal_attention_heads_last(q, k, v, omega, n_head, chunk,
                                            eps)
    return out, (q, k, v, omega)


def _fca_hl_bwd(n_head, chunk, eps, residuals, g):
    q, k, v, omega = residuals
    if not _use_pallas():
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _hl_compose(q_, k_, v_, omega, chunk, eps,
                                           n_head), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, jnp.zeros_like(omega)
    B, L, D = q.shape
    pad = (-L) % chunk
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    dq, dk, dv = _hl_bwd_impl(q, k, v, g, omega.astype(jnp.float32), chunk,
                              eps, n_head)
    if pad:
        dq, dk, dv = dq[:, :L], dk[:, :L], dv[:, :L]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(omega))


favor_causal_attention_heads_last.defvjp(_fca_hl_fwd, _fca_hl_bwd)


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
    state_layout: str = 'dm',
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One causal step (current token included): returns (out, S', z').

    ``update_mask`` zeroes the state contribution of masked elements (used
    by batched generation to leave rejected songs' state untouched without a
    second full-state select).

    ``state_layout='dm'`` (the default since round 5) carries S TRANSPOSED,
    [..., Dv, M]: with (M, Dv) = (128, 64) the 'md' trailing dims tile-pad
    Dv to 128 lanes — 2x HBM on the f32 state read+write that dominates the
    decode step ([..., 64, 128] tiles exactly).  MEASURED round 5 (v5e,
    12L/512d bf16 serving, B=16): 'dm' 38.2k tok/s vs 'md' 19.6k — 1.95x,
    which made it the default.  Same outer-product update and contraction;
    values match 'md' to float reassociation (~2e-5)."""
    if update_mask is not None:
        m = update_mask.astype(phi_k.dtype)
        while m.ndim < phi_k.ndim:
            m = m[..., None]
        phi_k = phi_k * m
    if state_layout == 'dm':
        S = S + v[..., :, None] * phi_k[..., None, :]
        num = jnp.einsum('...m,...dm->...d', phi_q, S)
    else:
        S = S + phi_k[..., :, None] * v[..., None, :]
        num = jnp.einsum('...m,...md->...d', phi_q, S)
    z = z + phi_k
    den = jnp.einsum('...m,...m->...', phi_q, z)
    return num / (den[..., None] + eps), S, z
