"""Stage-2 model, option 2: GPT-2 dense-attention decoder.

Capability parity with the reference ``MusicGPT2``
(``stage2_accompaniment/model/music_gpt2.py``): the same embedding scheme as
the Performer (scaled token embedding + segment embedding + interleaved
sinusoidal positions), a stack of pre-LN GPT-2 blocks (HF ``GPT2Block``
semantics: ln_1 -> causal attn (biased fused QKV, 1/sqrt(d_head) scaling) ->
residual; ln_2 -> MLP with tanh-approximated GELU -> residual), **no** final
layer norm (the reference stacks raw blocks without ``ln_f``,
``music_gpt2.py:51,84-86``), and the output projection.

TPU-first addition: a KV-cache decode path (``init_decode_cache`` /
``decode_step``) replacing the reference's full re-forward of the last 2048
tokens per generated token (``stage2_accompaniment/inference.py:250-257``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embeddings import (
    LayerNorm, TokenEmbedding, normal_init, sinusoid_position_encoding,
)
from .txl import masked_cross_entropy

NEG_INF = -1e30


class GPT2Block(nn.Module):
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
        self.ln_1 = LayerNorm(dtype=self.dtype)
        self.c_attn = dense(3 * self.d_model)
        self.attn_proj = dense(self.d_model)
        self.ln_2 = LayerNorm(dtype=self.dtype)
        self.c_fc = dense(self.d_ff)
        self.mlp_proj = dense(self.d_model)
        self.attn_drop = nn.Dropout(self.dropout)
        self.resid_drop = nn.Dropout(self.dropout)
        self.mlp_drop = nn.Dropout(self.dropout)

    def _heads(self, x, L):
        return x.reshape(x.shape[0], L, self.n_head, self.d_head)

    def __call__(self, x, *, deterministic: bool, return_kv: bool = False):
        B, L, _ = x.shape
        h = self.ln_1(x)
        q, k, v = jnp.split(self.c_attn(h), 3, axis=-1)
        q, k, v = self._heads(q, L), self._heads(k, L), self._heads(v, L)

        scale = 1.0 / (self.d_head ** 0.5)
        if deterministic and jax.default_backend() == 'tpu' and L >= 512 \
                and L % 128 == 0:
            # fused flash attention for deterministic full forwards
            # (eval / decode prefill / window re-anchor); training keeps the
            # einsum path because the reference applies attention dropout
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention)
            attn = flash_attention(
                q.swapaxes(1, 2).astype(jnp.float32),
                k.swapaxes(1, 2).astype(jnp.float32),
                v.swapaxes(1, 2).astype(jnp.float32),
                causal=True, sm_scale=scale)
            attn = attn.swapaxes(1, 2).astype(x.dtype).reshape(B, L, self.d_model)
        else:
            scores = jnp.einsum('bihd,bjhd->bhij', q, k) * scale
            mask = jnp.tril(jnp.ones((L, L), dtype=bool))
            scores = jnp.where(mask[None, None], scores, NEG_INF)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(scores.dtype)
            probs = self.attn_drop(probs, deterministic=deterministic)
            attn = jnp.einsum('bhij,bjhd->bihd', probs, v).reshape(B, L, self.d_model)
        x = x + self.resid_drop(self.attn_proj(attn), deterministic=deterministic)

        h = self.ln_2(x)
        h = nn.gelu(self.c_fc(h), approximate=True)
        h = self.mlp_drop(self.mlp_proj(h), deterministic=deterministic)
        out = x + h
        if return_kv:
            return out, k, v
        return out

    def decode_step(self, x, t, layer_idx, k_all, v_all,
                    layout: str = 'khd'):
        """x [B,1,D]; k_all/v_all [n_layer,B,Kmax,H,Dh] updated in place at
        [layer_idx,:,t] (buffer aliases through scan carries).
        ``layout='dk'`` takes K-in-lanes caches [n_layer,B,H,Dh,Kmax] —
        the 'khd' trailing (H, Dh) dims tile-pad every per-step cache
        read 4x on TPU (see ``ops.attention.full_decode_attention``)."""
        from ..ops.attention import layout_equations
        if layout not in ('khd', 'dk'):
            raise ValueError(f'MusicGPT2 decode supports khd/dk, got {layout!r}')
        B = x.shape[0]
        Kmax = k_all.shape[-1] if layout == 'dk' else k_all.shape[2]
        h = self.ln_1(x)
        q, k, v = jnp.split(self.c_attn(h), 3, axis=-1)
        q = q.reshape(B, self.n_head, self.d_head)
        if layout == 'dk':
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.reshape(1, B, self.n_head, self.d_head, 1),
                (layer_idx, 0, 0, 0, t))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.reshape(1, B, self.n_head, self.d_head, 1),
                (layer_idx, 0, 0, 0, t))
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.reshape(1, B, 1, self.n_head, self.d_head),
                (layer_idx, 0, t, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.reshape(1, B, 1, self.n_head, self.d_head),
                (layer_idx, 0, t, 0, 0))
        k_cache = k_all[layer_idx]
        v_cache = v_all[layer_idx]

        # full-cache masked attention: for GPT-2's shapes the single big
        # einsum pipelines better than a chunked while-loop (measured on
        # v5e; the TXL layer uses ops.attention.flash_decode_attention
        # because its relative-position term also scales with cache length)
        scale = 1.0 / (self.d_head ** 0.5)
        eq_s, eq_v = layout_equations(layout)
        scores = jnp.einsum(eq_s, q, k_cache) * scale
        positions = jnp.arange(Kmax)
        scores = jnp.where((positions > t)[None, None, :], NEG_INF, scores)
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(scores.dtype)
        attn = jnp.einsum(eq_v, probs, v_cache)
        attn = attn.reshape(B, 1, self.d_model)
        x = x + self.attn_proj(attn)

        h = self.ln_2(x)
        h = nn.gelu(self.c_fc(h), approximate=True)
        return x + self.mlp_proj(h), k_all, v_all


class MusicGPT2(nn.Module):
    """Stage-2 GPT-2 LM."""
    n_token: int
    n_layer: int = 12
    n_head: int = 8
    d_model: int = 512
    d_ff: int = 2048
    d_embed: int = 512
    dropout: float = 0.1
    use_segment_emb: bool = True
    n_segment_types: int = 2
    use_pe: bool = True
    max_len: int = 4096
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
        self.emb_dropout = nn.Dropout(self.dropout)
        self.blocks = [
            GPT2Block(n_head=self.n_head, d_model=self.d_model, d_ff=self.d_ff,
                      dropout=self.dropout, dtype=self.dtype, name=f'block_{i}')
            for i in range(self.n_layer)
        ]
        self.out_proj = nn.Dense(self.n_token, dtype=jnp.float32,
                                 kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)

    def __call__(self, tokens: jax.Array,
                 seg_inp: Optional[jax.Array] = None,
                 *, deterministic: bool = True,
                 keep_last_only: bool = False,
                 return_kv: bool = False) -> jax.Array:
        """``return_kv=True`` additionally returns per-layer K/V stacks
        [n_layer, B, L, H, Dh] — used to (re)build the decode cache from a
        single parallel forward (prefill / window re-anchoring)."""
        emb = self.token_emb(tokens)
        if seg_inp is not None and self.use_segment_emb:
            emb = emb + self.segemb(seg_inp)
        if self.use_pe:
            pe = sinusoid_position_encoding(tokens.shape[1], self.d_embed)
            emb = emb + pe[None].astype(emb.dtype)
        h = self.emb_dropout(emb, deterministic=deterministic)
        ks, vs = [], []
        for block in self.blocks:
            if return_kv:
                h, k, v = block(h, deterministic=deterministic, return_kv=True)
                ks.append(k)
                vs.append(v)
            else:
                h = block(h, deterministic=deterministic)
        logits = self.out_proj(h.astype(jnp.float32))
        if keep_last_only:
            logits = logits[:, -1, :]
        if return_kv:
            return logits, jnp.stack(ks), jnp.stack(vs)
        return logits

    # ------------------------------------------------------------ decode
    def init_decode_cache(self, batch: int, max_klen: int,
                          layout: str = 'khd') -> Dict[str, jax.Array]:
        """``layout='khd'``: [n_layer, B, Kmax, H, Dh].  ``'dk'``:
        K-in-lanes [n_layer, B, H, Dh, Kmax] (clean TPU tiles; see
        ``PlainTransformer.init_decode_cache``)."""
        if layout == 'dk':
            k = jnp.zeros((self.n_layer, batch, self.n_head, self.d_head,
                           max_klen), dtype=self.dtype)
        elif layout == 'khd':
            k = jnp.zeros((self.n_layer, batch, max_klen, self.n_head,
                           self.d_head), dtype=self.dtype)
        else:
            raise ValueError(f'MusicGPT2 decode supports khd/dk, got {layout!r}')
        return {'k': k, 'v': jnp.zeros_like(k)}

    def decode_step(self, token: jax.Array, seg: jax.Array, t: jax.Array,
                    cache: Dict[str, jax.Array], layout: str = 'khd',
                    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        emb = self.token_emb(token[:, None])
        if self.use_segment_emb:
            emb = emb + self.segemb(seg[:, None])
        if self.use_pe:
            pe = sinusoid_position_encoding(self.max_len, self.d_embed)
            emb = emb + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None]
        h = emb
        k_all, v_all = cache['k'], cache['v']
        for i, block in enumerate(self.blocks):
            h, k_all, v_all = block.decode_step(h, t, i, k_all, v_all,
                                                layout=layout)
        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'k': k_all, 'v': v_all}

    def decode_step_batchpos(self, token: jax.Array, seg: jax.Array,
                             t: jax.Array, cache: Dict[str, jax.Array],
                             layout: str = 'khd',
                             ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Like :meth:`decode_step` but with PER-ELEMENT positions ``t`` [B]:
        each song writes its cache row at its own clock (batched generation).
        No window re-anchoring — songs longer than the cache end with an
        overflow status in the generator.  ``layout`` must match the
        cache's (:meth:`init_decode_cache`)."""
        emb = self.token_emb(token[:, None])
        if self.use_segment_emb:
            emb = emb + self.segemb(seg[:, None])
        if self.use_pe:
            pe = sinusoid_position_encoding(self.max_len, self.d_embed)
            rows = jnp.take(pe, jnp.clip(t, 0, self.max_len - 1), axis=0)
            emb = emb + rows[:, None, :].astype(emb.dtype)
        from ..ops.attention import layout_equations, write_row_pe
        if layout not in ('khd', 'dk'):
            raise ValueError(f'MusicGPT2 decode supports khd/dk, got {layout!r}')
        h = emb
        k_all, v_all = cache['k'], cache['v']
        B = token.shape[0]
        Kmax = k_all.shape[-1] if layout == 'dk' else k_all.shape[2]
        positions = jnp.arange(Kmax)
        eq_s, eq_v = layout_equations(layout)

        def write(cache_layer, new_row):
            return write_row_pe(cache_layer, new_row, t, layout)

        for i, block in enumerate(self.blocks):
            hh = block.ln_1(h)
            q, k, v = jnp.split(block.c_attn(hh), 3, axis=-1)
            q = q.reshape(B, self.n_head, self.d_head)
            k_layer = write(k_all[i], k.reshape(B, self.n_head, self.d_head))
            v_layer = write(v_all[i], v.reshape(B, self.n_head, self.d_head))
            k_all = k_all.at[i].set(k_layer)
            v_all = v_all.at[i].set(v_layer)

            scale = 1.0 / (self.d_head ** 0.5)
            scores = jnp.einsum(eq_s, q, k_layer) * scale
            scores = jnp.where((positions[None] > t[:, None])[:, None, :],
                               NEG_INF, scores)
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(scores.dtype)
            attn = jnp.einsum(eq_v, probs, v_layer)
            h = h + block.attn_proj(attn.reshape(B, 1, self.d_model))
            hh = block.ln_2(h)
            h = h + block.mlp_proj(nn.gelu(block.c_fc(hh), approximate=True))

        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'k': k_all, 'v': v_all}

    def compute_loss(self, logits, targets):
        return masked_cross_entropy(logits, targets, self.n_token - 1)
