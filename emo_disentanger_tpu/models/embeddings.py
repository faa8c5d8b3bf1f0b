"""Shared embedding / positional-encoding modules (flax).

Parity notes:
* ``TokenEmbedding`` scales by sqrt(d_proj) and keeps the PAD row at zero
  (reference ``WordEmbedding``/``TokenEmbedding`` with ``padding_idx``,
  ``stage1_compose/model/transformer_helpers.py:94-118``).
* ``txl_positional_embedding`` concatenates [sin | cos] halves (Transformer-XL
  convention, ``optimus_txl_decoder.py:8-24``); ``sinusoid_position_encoding``
  interleaves sin/cos (stage-2 convention,
  ``stage2_accompaniment/model/transformer_helpers.py:43-63``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

normal_init = nn.initializers.normal(stddev=0.01)


def layernorm_scale_init(key, shape, dtype=jnp.float32):
    """N(1, 0.01) scale init (reference ``weights_init`` for LayerNorm)."""
    return 1.0 + jax.random.normal(key, shape, dtype) * 0.01


class LayerNorm(nn.Module):
    """LayerNorm with the reference's N(1,0.01)/zero init, eps 1e-5."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            scale_init=layernorm_scale_init,
                            bias_init=nn.initializers.zeros)(x)


class TokenEmbedding(nn.Module):
    n_token: int
    d_embed: int
    d_proj: int
    pad_id: Optional[int] = None        # row kept at zero if given
    emb_scale_exp: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        table = self.param('embedding', normal_init, (self.n_token, self.d_embed))
        emb = jnp.take(table, tokens, axis=0).astype(self.dtype)
        if self.pad_id is not None:
            emb = jnp.where((tokens == self.pad_id)[..., None], 0.0, emb)
        if self.d_proj != self.d_embed:
            emb = nn.Dense(self.d_proj, use_bias=False, dtype=self.dtype,
                           kernel_init=normal_init, name='proj')(emb)
        return emb * (self.d_proj ** self.emb_scale_exp)


def txl_positional_embedding(pos_seq: jax.Array, d_model: int) -> jax.Array:
    """[K] positions -> [K, d_model] with [sin | cos] halves."""
    inv_freq = 1.0 / (10000 ** (jnp.arange(0.0, d_model, 2.0) / d_model))
    ang = pos_seq.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def sinusoid_position_encoding(n_pos: int, d_model: int,
                               offset: int = 0) -> jax.Array:
    """[n_pos, d_model] interleaved sin/cos absolute encoding."""
    position = jnp.arange(offset, offset + n_pos, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32)
                  * (-jnp.log(10000.0) / d_model))
    pe = jnp.zeros((n_pos, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe
