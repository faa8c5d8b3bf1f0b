"""Stage-1 model: Transformer-XL decoder with relative positional attention.

Capability parity with the reference's ``PlainTransformer`` +
``OptimusTXLDecoder`` (``stage1_compose/model/plain_transformer.py``,
``optimus_txl_decoder.py``): shared r_w/r_r biases across layers, fused QKV
projection (no bias), per-layer position projection, the rel-shift attention
score layout, pre-/post-LN feed-forward, XL hidden-state memories for
segment recurrence, and the post-dropout attention renormalization.

TPU-first additions:
* batch-first [B, L] layout, einsum attention on the MXU;
* a KV-cache decode path (``init_decode_cache`` / ``decode_step``) that is
  mathematically identical to the reference's recompute-from-hidden-mems
  decode (weights are fixed at inference, so caching K/V after the fused
  projection gives the same attention) but O(klen) instead of O(klen * d^2)
  per step.

Intentionally omitted dead code from the reference module: segment-embedding
projections (``use_segment_emb=False`` at ``plain_transformer.py:45``),
cross-attention (``use_cross_attn=False``), attention types 1-3, and
``return_avg_attn`` probes — none are reachable from the released configs.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embeddings import (
    LayerNorm, TokenEmbedding, normal_init, txl_positional_embedding,
)

NEG_INF = -1e30


def _rel_shift(x: jax.Array) -> jax.Array:
    """Transformer-XL relative shift: [B, H, Q, K] -> [B, H, Q, K] so that
    entry (i, j) picks the score at distance (mlen + i - j)."""
    b, h, q, k = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, k + 1, q)
    x = x[:, :, 1:, :]
    return x.reshape(b, h, q, k)


class TXLSelfAttention(nn.Module):
    n_head: int
    d_model: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.1
    pre_lnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        hd = self.n_head * self.d_head
        self.qkv_net = nn.Dense(3 * hd, use_bias=False, dtype=self.dtype,
                                kernel_init=normal_init)
        self.r_net = nn.Dense(hd, use_bias=False, dtype=self.dtype,
                              kernel_init=normal_init)
        self.o_net = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                              kernel_init=normal_init)
        self.layer_norm = LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)
        self.dropatt_layer = nn.Dropout(self.dropatt)

    def _split(self, x, L):
        return x.reshape(x.shape[0], L, self.n_head, self.d_head)

    def __call__(self, x, pos_emb, r_w_bias, r_r_bias, attn_mask,
                 mems: Optional[jax.Array] = None, *, deterministic: bool):
        """x [B,Q,D]; pos_emb [K,D]; attn_mask [Q,K] True = masked."""
        B, Q, _ = x.shape
        cat = x if mems is None else jnp.concatenate([mems.astype(x.dtype), x], axis=1)
        K = cat.shape[1]

        inp = self.layer_norm(cat) if self.pre_lnorm else cat
        qkv = self.qkv_net(inp)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = self._split(q[:, -Q:], Q)
        k = self._split(k, K)
        v = self._split(v, K)
        r = self.r_net(pos_emb.astype(self.dtype)).reshape(K, self.n_head, self.d_head)

        scale = 1.0 / (self.d_head ** 0.5)
        ac = jnp.einsum('bihd,bjhd->bhij', q + r_w_bias.astype(q.dtype), k)
        bd = jnp.einsum('bihd,jhd->bhij', q + r_r_bias.astype(q.dtype), r)
        bd = _rel_shift(bd)
        scores = (ac + bd) * scale
        scores = jnp.where(attn_mask[None, None, :, :], NEG_INF, scores)

        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        probs = self.dropatt_layer(probs, deterministic=deterministic)
        # renormalize after attention dropout (reference
        # ``optimus_txl_decoder.py:363``)
        probs = probs / (jnp.sum(probs, axis=-1, keepdims=True) + 1e-8)

        out = jnp.einsum('bhij,bjhd->bihd', probs, v)
        out = out.reshape(B, Q, self.n_head * self.d_head)
        out = self.drop(self.o_net(out), deterministic=deterministic)

        if self.pre_lnorm:
            return x + out
        return self.layer_norm(x + out)

    def decode_step(self, x, t, layer_idx, k_all, v_all, r_heads,
                    r_w_bias, r_r_bias, full_attention: bool = False,
                    layout: str = 'khd'):
        """Single-token step.  x [B,1,D]; t scalar write index;
        k_all/v_all [n_layer,B,Kmax,H,Dh] (updated IN PLACE at
        [layer_idx,:,t] so the whole-cache buffer aliases through scan
        carries instead of being re-stacked and copied every step);
        r_heads [Kmax,H,Dh] where r_heads[d] = r_net(PE(d)).
        ``full_attention`` swaps the chunked flash decode for a
        whole-cache einsum (see ``ops.attention.full_decode_attention``).
        ``layout='dk'`` (full attention only) takes the K-in-lanes cache
        [n_layer,B,H,Dh,Kmax] / r_heads [Kmax... -> H,Dh,Kmax] produced by
        ``init_decode_cache(layout='dk')`` — zero tile padding on the
        per-step cache reads (see ``ops.attention``).
        Returns (out [B,1,D], k_all, v_all).
        """
        B = x.shape[0]
        inp = self.layer_norm(x) if self.pre_lnorm else x
        q, k, v = jnp.split(self.qkv_net(inp), 3, axis=-1)
        q = q.reshape(B, self.n_head, self.d_head)
        if layout == 'dk':
            assert full_attention, "layout='dk' implies the whole-cache path"
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.reshape(1, B, self.n_head, self.d_head, 1),
                (layer_idx, 0, 0, 0, t))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.reshape(1, B, self.n_head, self.d_head, 1),
                (layer_idx, 0, 0, 0, t))
        elif layout == 'hkd':
            assert full_attention, "layout='hkd' implies the whole-cache path"
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.reshape(1, B, self.n_head, 1, self.d_head),
                (layer_idx, 0, 0, t, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.reshape(1, B, self.n_head, 1, self.d_head),
                (layer_idx, 0, 0, t, 0))
        else:
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.reshape(1, B, 1, self.n_head, self.d_head),
                (layer_idx, 0, t, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.reshape(1, B, 1, self.n_head, self.d_head),
                (layer_idx, 0, t, 0, 0))
        k_cache = k_all[layer_idx]
        v_cache = v_all[layer_idx]

        # flash-style chunked attention over the live prefix only, with the
        # TXL relative-position term folded in per chunk
        from ..ops.attention import flash_decode_attention, full_decode_attention
        if full_attention:
            attn_fn = lambda *a, **kw: full_decode_attention(  # noqa: E731
                *a, layout=layout, **kw)
        else:
            attn_fn = flash_decode_attention
        out = attn_fn(
            q + r_w_bias.astype(q.dtype), k_cache, v_cache, t,
            scale=1.0 / (self.d_head ** 0.5),
            rel=(q + r_r_bias.astype(q.dtype), r_heads))
        out = self.o_net(out.reshape(B, 1, self.n_head * self.d_head))
        attn_out = x + out
        if not self.pre_lnorm:
            attn_out = self.layer_norm(attn_out)
        return attn_out, k_all, v_all

    def decode_step_pe(self, x, t, layer_idx, k_all, v_all, r_heads,
                       r_w_bias, r_r_bias, layout: str = 'khd'):
        """:meth:`decode_step` with a PER-ELEMENT clock ``t`` [B].

        Continuous batching (``Stage1BatchGenerator.serve``) refills slots
        mid-flight, so each element writes its cache at its own position —
        a vmapped per-row ``dynamic_update_slice`` (the same pattern the
        GPT-2 decode uses, ``gpt2.py write``) and the per-element-mask
        whole-cache attention.  With ``t`` uniform this is bitwise the
        shared-clock ``full_attention=True`` step (tested).  ``layout``
        as in :meth:`decode_step`."""
        B = x.shape[0]
        inp = self.layer_norm(x) if self.pre_lnorm else x
        q, k, v = jnp.split(self.qkv_net(inp), 3, axis=-1)
        q = q.reshape(B, self.n_head, self.d_head)

        from ..ops.attention import write_row_pe

        def write(cache_layer, new_row):
            return write_row_pe(cache_layer, new_row, t, layout)

        k_all = k_all.at[layer_idx].set(
            write(k_all[layer_idx], k.reshape(B, self.n_head, self.d_head)))
        v_all = v_all.at[layer_idx].set(
            write(v_all[layer_idx], v.reshape(B, self.n_head, self.d_head)))

        from ..ops.attention import full_decode_attention_pe
        out = full_decode_attention_pe(
            q + r_w_bias.astype(q.dtype), k_all[layer_idx], v_all[layer_idx],
            t, scale=1.0 / (self.d_head ** 0.5),
            rel=(q + r_r_bias.astype(q.dtype), r_heads), layout=layout)
        out = self.o_net(out.reshape(B, 1, self.n_head * self.d_head))
        attn_out = x + out
        if not self.pre_lnorm:
            attn_out = self.layer_norm(attn_out)
        return attn_out, k_all, v_all

    def rel_heads(self, max_klen: int) -> jax.Array:
        """Precompute r_net(PE(d)) for distances 0..max_klen-1."""
        pe = txl_positional_embedding(jnp.arange(max_klen), self.d_model)
        return self.r_net(pe.astype(self.dtype)).reshape(max_klen, self.n_head, self.d_head)


class PositionwiseFF(nn.Module):
    d_model: int
    d_ff: int
    dropout: float = 0.1
    pre_lnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.fc1 = nn.Dense(self.d_ff, dtype=self.dtype, kernel_init=normal_init,
                            bias_init=nn.initializers.zeros)
        self.fc2 = nn.Dense(self.d_model, dtype=self.dtype, kernel_init=normal_init,
                            bias_init=nn.initializers.zeros)
        self.layer_norm = LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, deterministic: bool):
        inp = self.layer_norm(x) if self.pre_lnorm else x
        h = self.drop(nn.relu(self.fc1(inp)), deterministic=deterministic)
        h = self.drop(self.fc2(h), deterministic=deterministic)
        if self.pre_lnorm:
            return x + h
        return self.layer_norm(x + h)


class TXLLayer(nn.Module):
    n_head: int
    d_model: int
    d_head: int
    d_ff: int
    dropout: float = 0.1
    dropatt: float = 0.1
    pre_lnorm: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attn = TXLSelfAttention(
            n_head=self.n_head, d_model=self.d_model, d_head=self.d_head,
            dropout=self.dropout, dropatt=self.dropatt,
            pre_lnorm=self.pre_lnorm, dtype=self.dtype)
        self.ff = PositionwiseFF(
            d_model=self.d_model, d_ff=self.d_ff, dropout=self.dropout,
            pre_lnorm=self.pre_lnorm, dtype=self.dtype)

    def __call__(self, x, pos_emb, r_w_bias, r_r_bias, attn_mask, mems,
                 *, deterministic: bool):
        x = self.attn(x, pos_emb, r_w_bias, r_r_bias, attn_mask, mems,
                      deterministic=deterministic)
        return self.ff(x, deterministic=deterministic)

    def decode_step(self, x, t, layer_idx, k_all, v_all, r_heads,
                    r_w_bias, r_r_bias, full_attention: bool = False,
                    layout: str = 'khd'):
        x, k_all, v_all = self.attn.decode_step(
            x, t, layer_idx, k_all, v_all, r_heads, r_w_bias, r_r_bias,
            full_attention=full_attention, layout=layout)
        x = self.ff(x, deterministic=True)
        return x, k_all, v_all

    def decode_step_pe(self, x, t, layer_idx, k_all, v_all, r_heads,
                       r_w_bias, r_r_bias, layout: str = 'khd'):
        x, k_all, v_all = self.attn.decode_step_pe(
            x, t, layer_idx, k_all, v_all, r_heads, r_w_bias, r_r_bias,
            layout=layout)
        x = self.ff(x, deterministic=True)
        return x, k_all, v_all


class PlainTransformer(nn.Module):
    """Stage-1 decoder-only LM (reference ``PlainTransformer``)."""
    vocab_size: int
    d_embed: int = 512
    n_layer: int = 12
    n_head: int = 8
    d_model: int = 512
    d_ff: int = 2048
    dropout: float = 0.1
    pre_lnorm: bool = True
    mem_len: int = 0
    pad_id: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    @property
    def _pad(self) -> int:
        return self.vocab_size - 1 if self.pad_id is None else self.pad_id

    def setup(self):
        self.word_emb = TokenEmbedding(
            n_token=self.vocab_size, d_embed=self.d_embed, d_proj=self.d_model,
            pad_id=self._pad, dtype=self.dtype)
        self.emb_dropout = nn.Dropout(self.dropout)
        self.inp_dropout = nn.Dropout(self.dropout)
        self.out_dropout = nn.Dropout(self.dropout)
        self.pos_dropout = nn.Dropout(self.dropout)
        self.layers = [
            TXLLayer(n_head=self.n_head, d_model=self.d_model, d_head=self.d_head,
                     d_ff=self.d_ff, dropout=self.dropout, dropatt=self.dropout,
                     pre_lnorm=self.pre_lnorm, dtype=self.dtype,
                     name=f'layer_{i}')
            for i in range(self.n_layer)
        ]
        self.r_w_bias = self.param('r_w_bias', normal_init,
                                   (self.n_head, self.d_head))
        self.r_r_bias = self.param('r_r_bias', normal_init,
                                   (self.n_head, self.d_head))
        self.out_proj = nn.Dense(self.vocab_size, dtype=jnp.float32,
                                 kernel_init=normal_init,
                                 bias_init=nn.initializers.zeros)

    # ------------------------------------------------------------- train
    def __call__(self, tokens: jax.Array,
                 mems: Optional[List[jax.Array]] = None,
                 *, deterministic: bool = True,
                 return_hiddens: bool = False,
                 ) -> Tuple[jax.Array, Optional[List[jax.Array]]]:
        """tokens [B, L] -> (logits [B, L, V], new_mems).

        ``mems``: optional list of n_layer+1 hidden-state memories
        [B, mlen, D] (XL segment recurrence).  new_mems is returned when
        ``self.mem_len > 0``.  ``return_hiddens`` additionally returns the
        per-layer hidden inputs (for the variable-length memory update of
        multi-segment training, reference ``_update_mems`` dec_seg_len path).
        """
        B, L = tokens.shape
        mlen = mems[0].shape[1] if mems is not None else 0
        klen = mlen + L

        emb = self.word_emb(tokens)
        h = self.emb_dropout(emb, deterministic=deterministic)
        h = self.inp_dropout(h, deterministic=deterministic)  # decoder input drop

        pos_seq = jnp.arange(klen - 1, -1, -1)
        pos_emb = txl_positional_embedding(pos_seq, self.d_model)
        pos_emb = self.pos_dropout(pos_emb, deterministic=deterministic)

        # mask[i, j] over keys 0..klen-1: causal with memory offset
        i = jnp.arange(L)[:, None]
        j = jnp.arange(klen)[None, :]
        attn_mask = j > (i + mlen)

        hids = [h]
        for idx, layer in enumerate(self.layers):
            layer_mems = mems[idx] if mems is not None else None
            h = layer(h, pos_emb, self.r_w_bias, self.r_r_bias, attn_mask,
                      layer_mems, deterministic=deterministic)
            hids.append(h)

        h = self.out_dropout(h, deterministic=deterministic)
        logits = self.out_proj(h.astype(jnp.float32))

        new_mems = None
        if self.mem_len > 0:
            new_mems = []
            for idx in range(self.n_layer + 1):
                cat = hids[idx] if mems is None else \
                    jnp.concatenate([mems[idx].astype(hids[idx].dtype), hids[idx]], axis=1)
                new_mems.append(jax.lax.stop_gradient(cat[:, -self.mem_len:]))
        if return_hiddens:
            return logits, new_mems, hids
        return logits, new_mems

    # ------------------------------------------------------------ decode
    def init_decode_cache(self, batch: int, max_klen: int,
                          layout: str = 'khd') -> Dict[str, Any]:
        """Allocate the per-layer KV cache and distance-indexed position heads.

        ``layout='khd'`` (default): caches [n_layer, B, Kmax, H, Dh] and
        r_heads [n_layer, Kmax, H, Dh].  ``layout='dk'``: K-in-lanes caches
        [n_layer, B, H, Dh, Kmax] / r_heads [n_layer, H, Dh, Kmax] — the
        (H, Dh) trailing dims of 'khd' tile-pad 4x on TPU HBM (H=8 -> 16
        sublanes, Dh=64 -> 128 lanes for bf16), which the whole-cache
        einsum decode pays on EVERY step; 'dk' trailing (Dh, Kmax) tiles
        cleanly.  Callers must pass the same ``layout`` to
        ``decode_step`` / ``decode_step_pe``."""
        if layout == 'dk':
            k_cache = jnp.zeros((self.n_layer, batch, self.n_head,
                                 self.d_head, max_klen), dtype=self.dtype)
            r_heads = jnp.stack(
                [self.layers[i].attn.rel_heads(max_klen).transpose(1, 2, 0)
                 for i in range(self.n_layer)])
        elif layout == 'hkd':
            k_cache = jnp.zeros((self.n_layer, batch, self.n_head,
                                 max_klen, self.d_head), dtype=self.dtype)
            r_heads = jnp.stack(
                [self.layers[i].attn.rel_heads(max_klen).transpose(1, 2, 0)
                 for i in range(self.n_layer)])
        else:
            k_cache = jnp.zeros((self.n_layer, batch, max_klen, self.n_head,
                                 self.d_head), dtype=self.dtype)
            r_heads = jnp.stack(
                [self.layers[i].attn.rel_heads(max_klen)
                 for i in range(self.n_layer)])
        v_cache = jnp.zeros_like(k_cache)
        return {'k': k_cache, 'v': v_cache, 'r': r_heads}

    def decode_step(self, token: jax.Array, t: jax.Array,
                    cache: Dict[str, Any],
                    full_attention: Optional[bool] = None,
                    layout: str = 'khd',
                    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """token [B] int32, t scalar position -> (logits [B, V], cache).

        ``full_attention=None`` auto-selects by batch: the chunked flash
        decode wins up to B=16 but degrades at B>=32, where the whole-cache
        einsum overtakes it (measured round 3 on v5e at Kmax=1536: B=16
        flash 7.6k vs einsum 4.7k tok/s; B=32 flash 5.0k vs einsum 7.5k).
        Pass an explicit bool to pin a path (the batched generator pins the
        einsum — its while_loop cannot compile the flash path at B>=8 on
        the axon AOT helper).  ``layout`` must match the cache's
        (``init_decode_cache``); 'dk' implies the whole-cache path."""
        if layout in ('dk', 'hkd'):
            if full_attention is False:
                raise ValueError(
                    f"layout {layout!r} stores the cache head-major, which "
                    "only the whole-cache einsum path reads; "
                    "full_attention=False (chunked flash) needs layout='khd'")
            full_attention = True
        elif full_attention is None:
            full_attention = token.shape[0] >= 32
        h = self.word_emb(token[:, None])
        k_all, v_all = cache['k'], cache['v']
        for idx, layer in enumerate(self.layers):
            h, k_all, v_all = layer.decode_step(
                h, t, idx, k_all, v_all, cache['r'][idx],
                self.r_w_bias, self.r_r_bias, full_attention=full_attention,
                layout=layout)
        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'k': k_all, 'v': v_all, 'r': cache['r']}

    def decode_step_pe(self, token: jax.Array, t: jax.Array,
                       cache: Dict[str, Any], layout: str = 'khd',
                       ) -> Tuple[jax.Array, Dict[str, Any]]:
        """:meth:`decode_step` with PER-ELEMENT positions ``t`` [B] —
        the continuous-batching decode (see the layer method)."""
        h = self.word_emb(token[:, None])
        k_all, v_all = cache['k'], cache['v']
        for idx, layer in enumerate(self.layers):
            h, k_all, v_all = layer.decode_step_pe(
                h, t, idx, k_all, v_all, cache['r'][idx],
                self.r_w_bias, self.r_r_bias, layout=layout)
        logits = self.out_proj(h.astype(jnp.float32))[:, 0]
        return logits, {'k': k_all, 'v': v_all, 'r': cache['r']}

    # -------------------------------------------------------------- loss
    def compute_loss(self, logits: jax.Array, targets: jax.Array) -> jax.Array:
        """Mean CE over non-PAD targets (reference
        ``plain_transformer.py:82-93``)."""
        return masked_cross_entropy(logits, targets, self._pad)


def update_mems_varlen(mems: jax.Array, hids: jax.Array,
                       seg_len: jax.Array) -> jax.Array:
    """Per-sample variable-length XL memory update.

    ``mems`` [B, mlen, D] fixed ring buffer, ``hids`` [B, L, D] new hidden
    states, ``seg_len`` [B] how many of each sample's hiddens are real.  Each
    sample keeps the last mlen entries of concat(mems_b, hids_b[:seg_len_b]).

    Mirrors the reference's ``_update_mems`` dec_seg_len path
    (``optimus_txl_decoder.py:724-748``) in a fixed-shape buffer: the
    reference left-pads shorter memories with zero hidden states, which is
    exactly what the untouched prefix of this zero-initialized buffer is.
    """
    B, mlen, D = mems.shape
    L = hids.shape[1]

    def one(mem_b, hid_b, n_b):
        idx = n_b + jnp.arange(mlen)                      # positions in concat
        from_old = idx < mlen
        old_rows = jnp.take(mem_b, jnp.clip(idx, 0, mlen - 1), axis=0)
        new_rows = jnp.take(hid_b, jnp.clip(idx - mlen, 0, L - 1), axis=0)
        return jnp.where(from_old[:, None], old_rows, new_rows)

    return jax.lax.stop_gradient(
        jax.vmap(one)(mems, hids, jnp.clip(seg_len, 0, L)))


def masked_cross_entropy(logits: jax.Array, targets: jax.Array,
                         pad_id: int) -> jax.Array:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
