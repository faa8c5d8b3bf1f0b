"""Fused Performer decode-layer kernel.

One decode step of one Performer layer is ~15 small XLA ops (q/k/v/out
projections, FAVOR+ feature maps, the (S, z) state update, two LayerNorms,
the FF block) over tiny [B, 512] activations — at serving batch sizes the
step is dominated by inter-op scheduling bubbles and repeated HBM round
trips rather than math.  This kernel runs the ENTIRE layer in one
``pl.pallas_call``: weights (~6 MB bf16) and the FAVOR state block (4 MB
f32) live in VMEM for the step, the state is updated in place
(input/output aliasing), and the only HBM traffic is one read of the
weights + one read/write of (S, z).

Mosaic cannot relayout cross-row reshapes like [B, D] -> [B*H, Dh], so
heads are handled with a static Python loop over STATIC COLUMN SLICES of
the [B, D] projections (the per-head matmuls are tiny; the MXU cost is
unchanged).

Math is identical to the unfused path (``models/performer.py decode_step``:
``favor_features`` with is_query max-stabilizer / key_stabilizer=0,
``linear_attention_decode_step`` with eps=1e-6, post-norm residual layout),
with f32 accumulation throughout; matmuls take the weights in their stored
dtype (bf16 serving weights feed the MXU natively).

Reference path being replaced: the CUDA ``causal_product`` recurrent
inference mode of fast-transformers (``fast_transformer_decoder.py:28-34``)
— which the reference itself never reaches, since its decode re-forwards
the whole window per token (``stage2_accompaniment/inference.py:250-257``).

STATUS (round-3 measurement, v5e, 12L/512d bf16): the composed XLA decode
path is FASTER than this kernel at every serving batch — B=4 8.9k vs 6.8k
tok/s, B=16 19.8k vs 12.0k (the f32 state block pads its lane dim 64->128
and forces a multi-group batch grid at B>=8; round 2 shipped it ungridded,
which deterministically OOMed scoped VMEM at B=16 — 23.98M > 16M — and
silently cost the round-2 headline its B=16 number).  The kernel is kept
compilable at any batch (grid over batch groups) behind
``EMODIS_FUSED_DECODE=1`` for A/B runs; production decodes composed.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
LN_EPS = 1e-5


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * g + b


def _kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
            wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            g1_ref, be1_ref, g2_ref, be2_ref, omega_ref, mask_ref,
            s_ref, z_ref, out_ref, s_out_ref, z_out_ref,
            *, n_head: int, compute_dtype):
    # per-batch refs carry a singleton middle dim ([GB, 1, D] etc.) so the
    # batch-grid BlockSpecs' last two dims always equal the array dims
    # (Mosaic requires sublane-divisible or full blocks)
    B, _, D = x_ref.shape
    Dh = D // n_head
    M = omega_ref.shape[1]

    x32 = x_ref[...][:, 0, :].astype(jnp.float32)         # [B, D]
    xc = x32.astype(compute_dtype)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(xc, w_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + b_ref[...].astype(jnp.float32)         # [B, D]

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    scale = Dh ** -0.25
    rsqm = M ** -0.5
    omega = omega_ref[...]                                # [Dh, M] f32
    mask = mask_ref[...][:, 0, 0:1]                       # [B, 1] f32

    def phi(xh, is_query):
        xs = xh * scale                                   # [B, Dh]
        u = jax.lax.dot_general(xs, omega, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = u - 0.5 * jnp.sum(xs * xs, axis=-1, keepdims=True)
        if is_query:
            h = h - jnp.max(h, axis=-1, keepdims=True)
        return jnp.exp(h) * rsqm                          # [B, M]

    attn_parts = []
    for hd in range(n_head):
        cs = slice(hd * Dh, (hd + 1) * Dh)
        ms = slice(hd * M, (hd + 1) * M)
        phi_q = phi(q[:, cs], True)
        phi_k = phi(k[:, cs], False) * mask
        vh = v[:, cs]                                     # [B, Dh]
        Sh = s_ref[:, ms, :] + phi_k[:, :, None] * vh[:, None, :]
        zh = z_ref[:, 0, ms] + phi_k
        s_out_ref[:, ms, :] = Sh
        z_out_ref[:, 0, ms] = zh
        num = jnp.sum(phi_q[:, :, None] * Sh, axis=1)     # [B, Dh]
        den = jnp.sum(phi_q * zh, axis=-1, keepdims=True)
        attn_parts.append(num / (den + EPS))
    attn = jnp.concatenate(attn_parts, axis=-1)           # [B, D]

    o = jax.lax.dot_general(attn.astype(compute_dtype), wo_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x1 = x32 + o + bo_ref[...].astype(jnp.float32)

    y = _ln(x1, g1_ref[...].astype(jnp.float32),
            be1_ref[...].astype(jnp.float32))
    h1 = jax.lax.dot_general(y.astype(compute_dtype), w1_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0)
    h2 = jax.lax.dot_general(h1.astype(compute_dtype), w2_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    h2 = h2 + b2_ref[...].astype(jnp.float32)
    out = _ln(y + h2, g2_ref[...].astype(jnp.float32),
              be2_ref[...].astype(jnp.float32))
    out_ref[...] = out[:, None, :].astype(out_ref.dtype)


def _batch_group(B: int, D: int, H: int, M: int, Dh: int,
                 weight_bytes: int) -> int:
    """Largest batch group (divisor of B) whose VMEM footprint fits.

    The scoped budget is 16MB; the dominant blocks are the f32 state S
    in + out at [GB, H*M, Dh] with the lane dim padded to 128 (Dh=64 tiles
    as 128 lanes), plus the resident weights.  Round-2 shipped this kernel
    ungridded and deterministically OOMed scoped VMEM at B=16 (23.98M > 16M
    — the real cause of BENCH_r02's silent B=4 fallback)."""
    lane = 128
    for gb in range(B, 0, -1):
        if B % gb:
            continue
        s_bytes = gb * H * M * max(Dh, lane) * 4 * 2        # S in + out
        z_bytes = gb * H * M * 4 * 2
        act_bytes = gb * max(D, 2048) * 4 * 8               # q/k/v/ff temps
        if weight_bytes + s_bytes + z_bytes + act_bytes <= 12 * 1024 * 1024:
            return gb
    return 1


def fused_decode_layer(x: jax.Array, S: jax.Array, z: jax.Array,
                       p: Dict[str, jax.Array], omega: jax.Array,
                       update_mask: Optional[jax.Array] = None,
                       *, n_head: int, interpret: bool = False,
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One fused Performer decode-layer step.

    x [B, D] (model dtype); S [B, H, M, Dh] / z [B, H, M] float32 carried
    state; ``p`` maps wq/bq/wk/bk/wv/bv/wo/bo/w1/b1/w2/b2/g1/be1/g2/be2 to
    the layer's parameters; omega [Dh, M].  Returns (out, S', z').
    ``update_mask`` [B] freezes masked elements' state.

    The kernel runs on a 1-D grid over batch groups so the per-step VMEM
    footprint stays under budget at any serving batch; weight blocks use a
    constant index_map and stay resident across grid steps.
    """
    B, D = x.shape
    H = n_head
    Dh = D // H
    M = omega.shape[-1]
    s2 = S.reshape(B, H * M, Dh)       # head-major middle dim (free on host)
    z2 = z.reshape(B, 1, H * M)
    if update_mask is None:
        mask = jnp.ones((B, 1, 128), jnp.float32)
    else:
        mask = jnp.broadcast_to(
            update_mask.astype(jnp.float32)[:, None, None], (B, 1, 128))
    compute_dtype = p['wq'].dtype

    row = lambda a: a.reshape(1, -1)
    args = [x[:, None, :],
            p['wq'], row(p['bq']), p['wk'], row(p['bk']),
            p['wv'], row(p['bv']), p['wo'], row(p['bo']),
            p['w1'], row(p['b1']), p['w2'], row(p['b2']),
            row(p['g1']), row(p['be1']), row(p['g2']), row(p['be2']),
            omega.astype(jnp.float32), mask, s2, z2]
    # args layout: x(0), 16 weight/bias/norm tensors (1..16), omega(17),
    # mask(18), s2(19), z2(20)
    weight_bytes = sum(int(a.size) * a.dtype.itemsize for a in args[1:18])
    gb = _batch_group(B, D, H, M, Dh, weight_bytes)
    grid = (B // gb,)

    def batched(shape):
        # block the leading batch dim; trailing dims whole
        return pl.BlockSpec((gb,) + shape[1:],
                            lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def resident(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [batched((B, 1, D))]
    in_specs += [resident(a.shape) for a in args[1:18]]     # weights + omega
    in_specs += [batched(mask.shape), batched(s2.shape), batched(z2.shape)]
    out, s_new, z_new = pl.pallas_call(
        functools.partial(_kernel, n_head=H, compute_dtype=compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=(batched((B, 1, D)), batched((B, H * M, Dh)),
                   batched((B, 1, H * M))),
        out_shape=(jax.ShapeDtypeStruct((B, 1, D), x.dtype),
                   jax.ShapeDtypeStruct((B, H * M, Dh), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, H * M), jnp.float32)),
        input_output_aliases={19: 1, 20: 2},   # S, z updated in place
        interpret=interpret,
    )(*args)
    return out[:, 0, :], s_new.reshape(S.shape), z_new.reshape(z.shape)
