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
    B, D = x_ref.shape
    Dh = D // n_head
    M = omega_ref.shape[1]

    x32 = x_ref[...].astype(jnp.float32)                  # [B, D]
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
    mask = mask_ref[...][:, 0:1]                          # [B, 1] f32

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
        zh = z_ref[:, ms] + phi_k
        s_out_ref[:, ms, :] = Sh
        z_out_ref[:, ms] = zh
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
    out_ref[...] = out.astype(out_ref.dtype)


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
    """
    B, D = x.shape
    H = n_head
    Dh = D // H
    M = omega.shape[-1]
    s2 = S.reshape(B, H * M, Dh)       # head-major middle dim (free on host)
    z2 = z.reshape(B, H * M)
    if update_mask is None:
        mask = jnp.ones((B, 128), jnp.float32)
    else:
        mask = jnp.broadcast_to(
            update_mask.astype(jnp.float32)[:, None], (B, 128))
    compute_dtype = p['wq'].dtype

    row = lambda a: a.reshape(1, -1)
    args = [x,
            p['wq'], row(p['bq']), p['wk'], row(p['bk']),
            p['wv'], row(p['bv']), p['wo'], row(p['bo']),
            p['w1'], row(p['b1']), p['w2'], row(p['b2']),
            row(p['g1']), row(p['be1']), row(p['g2']), row(p['be2']),
            omega.astype(jnp.float32), mask, s2, z2]
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out, s_new, z_new = pl.pallas_call(
        functools.partial(_kernel, n_head=H, compute_dtype=compute_dtype),
        in_specs=[vmem() for _ in args],
        out_specs=(vmem(), vmem(), vmem()),
        out_shape=(jax.ShapeDtypeStruct((B, D), x.dtype),
                   jax.ShapeDtypeStruct((B, H * M, Dh), jnp.float32),
                   jax.ShapeDtypeStruct((B, H * M), jnp.float32)),
        input_output_aliases={19: 1, 20: 2},   # S, z updated in place
        interpret=interpret,
    )(*args)
    return out, s_new.reshape(S.shape), z_new.reshape(z.shape)
