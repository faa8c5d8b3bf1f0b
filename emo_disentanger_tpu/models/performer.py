"""Stage-2 model, option 1: Performer (FAVOR+ causal linear attention).

Capability parity with the reference ``MusicPerformer`` +
``FastTransformerDecoder`` (``stage2_accompaniment/model/music_performer.py``,
``fast_transformer_decoder.py``): token embedding scaled by sqrt(d),
additive segment embedding over the 2-valued track mask, interleaved
sinusoidal absolute positions, 12 post-norm layers of
attn -> add -> norm1 -> FF -> add -> norm2 with biased q/k/v/out projections
(fast_transformers ``AttentionLayer``/``TransformerEncoderLayer``).

The attention core is this framework's Pallas causal linear-attention kernel
(:mod:`..ops.linear_attention`) instead of the CUDA ``causal_product`` op.
The FAVOR+ feature matrices ``omega`` are explicit inputs (one per layer),
mirroring the reference's redraw-probability training scheme
(``train.py:57``, ``feat_redraw_prob``) and its checkpoint convention of
stripping ``feature_map.omega`` (``train.py:306-308``).

Decode carries per-layer (S, z) linear-attention state: O(1) per token where
the reference re-encodes the whole 2048-token window per token
(``stage2_accompaniment/inference.py:250-272``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .dropout import Dropout
from .embeddings import (
    LayerNorm, TokenEmbedding, normal_init, sinusoid_position_encoding,
)
from .txl import masked_cross_entropy
from ..ops.linear_attention import (
    draw_orthogonal_features, favor_causal_attention, favor_features,
    linear_attention_decode_step,
)


class PerformerLayer(nn.Module):
    n_head: int
    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    def setup(self):
        dense = lambda features: nn.Dense(
            features, dtype=self.dtype, kernel_init=normal_init,
            bias_init=nn.initializers.zeros)
        self.q_proj = dense(self.d_model)
        self.k_proj = dense(self.d_model)
        self.v_proj = dense(self.d_model)
        self.out_proj = dense(self.d_model)
        self.linear1 = dense(self.d_ff)
        self.linear2 = dense(self.d_model)
        self.norm1 = LayerNorm(dtype=self.dtype)
        self.norm2 = LayerNorm(dtype=self.dtype)
        # models.dropout.Dropout == nn.Dropout unless EMODIS_DROPOUT_BITECON
        # opts the train step into uint8 mask draws (see that module)
        self.drop = Dropout(self.dropout)

    def _heads(self, x):
        B, L, _ = x.shape
        return x.reshape(B, L, self.n_head, self.d_head).swapaxes(1, 2)

    def __call__(self, x, omega, *, deterministic: bool):
        """x [B, L, D]; omega [d_head, M]."""
        # heads-last fused attention (EMODIS_HL_ATTN=1): q/k/v stay
        # [B, L, D] and the head split happens in-kernel via static lane
        # slices, eliminating the ~20 ms/step of [B,H,L,Dh] transpose
        # copies around the custom calls.  MEASURED round 3: bit-identical
        # but 8% SLOWER end-to-end (219.7k vs 238.3k tok/s) — the 64-lane
        # sub-tile head slices cost Mosaic more in-kernel lane shuffles
        # than the XLA transposes they replace.  Default stays head-major.
        if os.environ.get('EMODIS_HL_ATTN', '0') != '0':
            from ..ops.linear_attention import favor_causal_attention_heads_last
            attn = favor_causal_attention_heads_last(
                self.q_proj(x), self.k_proj(x), self.v_proj(x), omega,
                self.n_head)
            attn = attn.astype(x.dtype)
        else:
            q = self._heads(self.q_proj(x))                   # [B,H,L,Dh]
            k = self._heads(self.k_proj(x))
            v = self._heads(self.v_proj(x))
            # feature map fused into the kernel: no [B,H,L,M] HBM
            # intermediates; f32 accumulation happens in-kernel
            attn = favor_causal_attention(q, k, v, omega)
            attn = attn.astype(x.dtype).swapaxes(1, 2).reshape(x.shape)
        x = x + self.drop(self.out_proj(attn), deterministic=deterministic)

        y = x = self.norm1(x)
        y = self.drop(nn.relu(self.linear1(y)), deterministic=deterministic)
        y = self.drop(self.linear2(y), deterministic=deterministic)
        return self.norm2(x + y)

    def decode_step(self, x, omega, layer_idx, S_all, z_all,
                    update_mask=None, fused: Optional[bool] = None,
                    state_layout: str = 'dm'):
        """x [B, 1, D]; carried state S_all [n_layer,B,H,M,Dh] /
        z_all [n_layer,B,H,M], updated in place at layer_idx.
        ``state_layout='dm'`` carries S transposed [n_layer,B,H,Dh,M] —
        clean f32 tiles instead of the 2x lane padding of trailing
        (M=128, Dh=64) dims; see ``linear_attention_decode_step``.
        ``update_mask`` [B] freezes masked elements' state.
        ``fused=None`` selects the composed XLA path: on-chip measurement
        (round 3, v5e, 12L/512d bf16) has the composed path FASTER than the
        fused whole-layer Pallas kernel at every serving batch — B=4 8.9k
        vs 6.8k tok/s, B=16 19.8k vs 12.0k (the fused kernel's state block
        forces a multi-group batch grid at B>=8, round 2's silent
        scoped-VMEM OOM).  The env var ``EMODIS_FUSED_DECODE='1'`` forces
        the kernel (kept for A/B and small-batch experiments), ``'0'``
        forces composed."""
        B = x.shape[0]
        if fused is None:
            fused = os.environ.get('EMODIS_FUSED_DECODE', '') == '1'
            if fused and state_layout != 'md':
                import warnings
                warnings.warn("EMODIS_FUSED_DECODE=1 ignored: the fused "
                              "decode kernel carries [M, Dh] state and "
                              f"state_layout={state_layout!r} is selected; "
                              "using the composed path", RuntimeWarning)
                fused = False
        if fused:
            assert state_layout == 'md', \
                'the fused decode kernel carries [M, Dh] state'
            from ..ops.performer_decode import fused_decode_layer
            pv = lambda m: m.variables['params']
            ln = lambda m: pv(m)['LayerNorm_0']
            p = {
                'wq': pv(self.q_proj)['kernel'], 'bq': pv(self.q_proj)['bias'],
                'wk': pv(self.k_proj)['kernel'], 'bk': pv(self.k_proj)['bias'],
                'wv': pv(self.v_proj)['kernel'], 'bv': pv(self.v_proj)['bias'],
                'wo': pv(self.out_proj)['kernel'],
                'bo': pv(self.out_proj)['bias'],
                'w1': pv(self.linear1)['kernel'], 'b1': pv(self.linear1)['bias'],
                'w2': pv(self.linear2)['kernel'], 'b2': pv(self.linear2)['bias'],
                'g1': ln(self.norm1)['scale'], 'be1': ln(self.norm1)['bias'],
                'g2': ln(self.norm2)['scale'], 'be2': ln(self.norm2)['bias'],
            }
            out, S, z = fused_decode_layer(
                x[:, 0, :], S_all[layer_idx], z_all[layer_idx], p, omega,
                update_mask, n_head=self.n_head,
                interpret=jax.default_backend() != 'tpu')
            S_all = jax.lax.dynamic_update_slice(
                S_all, S[None], (layer_idx, 0, 0, 0, 0))
            z_all = jax.lax.dynamic_update_slice(
                z_all, z[None], (layer_idx, 0, 0, 0))
            return out[:, None, :], S_all, z_all
        q = self.q_proj(x).reshape(B, self.n_head, self.d_head)
        k = self.k_proj(x).reshape(B, self.n_head, self.d_head)
        v = self.v_proj(x).reshape(B, self.n_head, self.d_head)
        phi_q = favor_features(q, omega, is_query=True)
        phi_k = favor_features(k, omega, is_query=False, key_stabilizer=0.0)
        mask = None if update_mask is None else update_mask[:, None]
        attn, S, z = linear_attention_decode_step(
            phi_q, phi_k, v.astype(jnp.float32), S_all[layer_idx],
            z_all[layer_idx], update_mask=mask, state_layout=state_layout)
        S_all = jax.lax.dynamic_update_slice(
            S_all, S[None], (layer_idx, 0, 0, 0, 0))
        z_all = jax.lax.dynamic_update_slice(
            z_all, z[None], (layer_idx, 0, 0, 0))
        attn = attn.astype(x.dtype).reshape(B, 1, self.d_model)
        x = x + self.out_proj(attn)
        y = x = self.norm1(x)
        y = nn.relu(self.linear1(y))
        y = self.linear2(y)
        return self.norm2(x + y), S_all, z_all


class MusicPerformer(nn.Module):
    """Stage-2 Performer LM."""
    n_token: int
    n_layer: int = 12
    n_head: int = 8
    d_model: int = 512
    d_ff: int = 2048
    d_embed: int = 512
    dropout: float = 0.1
    favor_dims: int = 128
    use_segment_emb: bool = True
    n_segment_types: int = 2
    use_pe: bool = True
    max_len: int = 12000
    dtype: jnp.dtype = jnp.float32

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    def setup(self):
        self.token_emb = TokenEmbedding(
            n_token=self.n_token, d_embed=self.d_embed, d_proj=self.d_model,
            dtype=self.dtype)
        if self.use_segment_emb:
            self.segemb = TokenEmbedding(
                n_token=self.n_segment_types, d_embed=self.d_embed,
                d_proj=self.d_model, dtype=self.dtype)
        self.emb_dropout = Dropout(self.dropout)
        self.layers = [
            PerformerLayer(n_head=self.n_head, d_model=self.d_model,
                           d_ff=self.d_ff, dropout=self.dropout,
                           dtype=self.dtype, name=f'layer_{i}')
            for i in range(self.n_layer)
        ]
        self.out_proj = nn.Dense(self.n_token, dtype=jnp.float32,
                                 kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)

    def draw_omegas(self, key: jax.Array) -> jax.Array:
        """Per-layer FAVOR+ feature matrices [n_layer, d_head, M]."""
        keys = jax.random.split(key, self.n_layer)
        return jnp.stack([
            draw_orthogonal_features(keys[i], self.d_head, self.favor_dims)
            for i in range(self.n_layer)])

    def _embed(self, tokens, seg_inp, offset=0, *, deterministic=True):
        emb = self.token_emb(tokens)
        if seg_inp is not None and self.use_segment_emb:
            emb = emb + self.segemb(seg_inp)
        if self.use_pe:
            pe = sinusoid_position_encoding(tokens.shape[1], self.d_embed,
                                            offset=offset)
            emb = emb + pe[None].astype(emb.dtype)
        return self.emb_dropout(emb, deterministic=deterministic)

    def __call__(self, tokens: jax.Array, omegas: jax.Array,
                 seg_inp: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 keep_last_only: bool = False) -> jax.Array:
        """tokens [B, L], omegas [n_layer, d_head, M] -> logits [B, L, V]."""
        h = self._embed(tokens, seg_inp, deterministic=deterministic)
        for i, layer in enumerate(self.layers):
            h = layer(h, omegas[i], deterministic=deterministic)
        logits = self.out_proj(h.astype(jnp.float32))
        if keep_last_only:
            logits = logits[:, -1, :]
        return logits

    # ------------------------------------------------------------ decode
    def init_decode_state(self, batch: int,
                          state_layout: str = 'dm') -> Dict[str, jax.Array]:
        """``'dm'`` (default since round 5): S transposed
        [n_layer, B, H, Dh, M] — trailing (Dh=64, M=128) tiles f32 exactly,
        halving the HBM footprint/traffic of the state.  ``'md'``: S
        [n_layer, B, H, M, Dh] — trailing (128, 64) pads lanes 2x; measured
        round 5 on chip at 19.6k vs 'dm' 38.2k tok/s (B=16, bf16).  z is
        [.., H, M] either way (already tile-exact)."""
        sdims = ((self.d_head, self.favor_dims) if state_layout == 'dm'
                 else (self.favor_dims, self.d_head))
        return {
            'S': jnp.zeros((self.n_layer, batch, self.n_head) + sdims,
                           dtype=jnp.float32),
            'z': jnp.zeros((self.n_layer, batch, self.n_head, self.favor_dims),
                           dtype=jnp.float32),
        }

    def decode_step(self, token: jax.Array, seg: jax.Array, t: jax.Array,
                    omegas: jax.Array, state: Dict[str, jax.Array],
                    state_layout: str = 'dm',
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """token/seg [B] int32, t scalar -> (logits [B, V], state).
        ``state_layout`` must match ``init_decode_state``'s."""
        emb = self.token_emb(token[:, None])
        if self.use_segment_emb:
            emb = emb + self.segemb(seg[:, None])
        if self.use_pe:
            pe = sinusoid_position_encoding(self.max_len, self.d_embed)
            emb = emb + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None]
        h = emb
        S_all, z_all = state['S'], state['z']
        for i, layer in enumerate(self.layers):
            h, S_all, z_all = layer.decode_step(h, omegas[i], i, S_all, z_all,
                                                state_layout=state_layout)
        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'S': S_all, 'z': z_all}

    def decode_step_batchpos(self, token: jax.Array, seg: jax.Array,
                             t: jax.Array, omegas: jax.Array,
                             state: Dict[str, jax.Array],
                             update_mask: Optional[jax.Array] = None,
                             state_layout: str = 'dm',
                             ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Like :meth:`decode_step` but with a PER-ELEMENT position ``t``
        [B] — used by the batched generator where each song advances its own
        clock (linear-attention state carries no positions, only the
        sinusoidal PE lookup differs).  ``update_mask`` [B] freezes rejected
        elements' state in place of a full-state select."""
        emb = self.token_emb(token[:, None])
        if self.use_segment_emb:
            emb = emb + self.segemb(seg[:, None])
        if self.use_pe:
            pe = sinusoid_position_encoding(self.max_len, self.d_embed)
            pe_rows = jnp.take(pe, jnp.clip(t, 0, self.max_len - 1), axis=0)
            emb = emb + pe_rows[:, None, :].astype(emb.dtype)
        h = emb
        S_all, z_all = state['S'], state['z']
        for i, layer in enumerate(self.layers):
            h, S_all, z_all = layer.decode_step(h, omegas[i], i, S_all, z_all,
                                                update_mask=update_mask,
                                                state_layout=state_layout)
        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'S': S_all, 'z': z_all}

    def compute_loss(self, logits, targets):
        """CE ignoring PAD (= n_token - 1), reference
        ``music_performer.py:72-81``."""
        return masked_cross_entropy(logits, targets, self.n_token - 1)
