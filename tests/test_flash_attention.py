"""flash_decode_attention vs naive masked softmax attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emo_disentanger_tpu.ops.attention import flash_decode_attention
from emo_disentanger_tpu.models.embeddings import txl_positional_embedding


def _naive(q, k_cache, v_cache, t, scale, bias=None):
    s = jnp.einsum('bhd,bjhd->bhj', q, k_cache)
    if bias is not None:
        s = s + bias
    s = s * scale
    K = k_cache.shape[1]
    s = jnp.where((jnp.arange(K) > t)[None, None, :], -1e30, s)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum('bhj,bjhd->bhd', p, v_cache.astype(jnp.float32))


@pytest.mark.parametrize('t', [0, 3, 7, 15, 16, 20, 31])
def test_flash_matches_naive(t):
    key = jax.random.PRNGKey(0)
    B, K, H, D = 2, 32, 2, 8
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, D))
    kc = jax.random.normal(k2, (B, K, H, D))
    vc = jax.random.normal(k3, (B, K, H, D))

    got = flash_decode_attention(q, kc, vc, jnp.int32(t), scale=0.35, chunk=8)
    want = _naive(q, kc, vc, t, 0.35)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('t', [0, 5, 12, 25, 31])
def test_flash_with_rel_bias_matches_naive(t):
    """The TXL relative-position term: BD[j] = rr_q . r_heads[t - j]."""
    key = jax.random.PRNGKey(1)
    B, K, H, D = 1, 32, 2, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, H, D))
    rr_q = jax.random.normal(k4, (B, H, D))
    kc = jax.random.normal(k2, (B, K, H, D))
    vc = jax.random.normal(k3, (B, K, H, D))
    r_heads = jax.random.normal(key, (K, H, D))

    got = flash_decode_attention(q, kc, vc, jnp.int32(t), scale=0.35,
                                 chunk=8, rel=(rr_q, r_heads))

    # naive bias: for valid j <= t, bias[j] = rr_q . r_heads[t - j]
    dist = jnp.clip(t - jnp.arange(K), 0, K - 1)
    r_g = jnp.take(r_heads, dist, axis=0)                 # [K, H, D]
    bias = jnp.einsum('bhd,jhd->bhj', rr_q, r_g)
    want = _naive(q, kc, vc, t, 0.35, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('t', [0, 5, 12, 25, 31])
def test_full_decode_matches_flash(t):
    """full_decode_attention (whole-cache einsum, used by the batched
    stage-1 generator to dodge the axon B>=8 AOT compile abort) computes
    the same function as the chunked flash decode, rel term included."""
    from emo_disentanger_tpu.ops.attention import full_decode_attention
    key = jax.random.PRNGKey(2)
    B, K, H, D = 3, 32, 2, 8
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (B, H, D))
    rr_q = jax.random.normal(k4, (B, H, D))
    kc = jax.random.normal(k2, (B, K, H, D))
    vc = jax.random.normal(k3, (B, K, H, D))
    r_heads = jax.random.normal(key, (K, H, D))

    flash = flash_decode_attention(q, kc, vc, jnp.int32(t), scale=0.35,
                                   chunk=8, rel=(rr_q, r_heads))
    full = full_decode_attention(q, kc, vc, jnp.int32(t), scale=0.35,
                                 rel=(rr_q, r_heads))
    np.testing.assert_allclose(np.asarray(full), np.asarray(flash),
                               rtol=2e-4, atol=2e-5)


def test_txl_decode_step_full_attention_matches():
    """PlainTransformer.decode_step(full_attention=True) == default path."""
    from emo_disentanger_tpu.models import PlainTransformer
    model = PlainTransformer(vocab_size=40, n_layer=2, n_head=2, d_model=32,
                             d_ff=64, d_embed=32, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))
    B, K = 2, 24
    ca = model.apply(params, B, K, method=PlainTransformer.init_decode_cache)
    cb = model.apply(params, B, K, method=PlainTransformer.init_decode_cache)
    toks = (jnp.arange(2 * 10).reshape(10, 2) * 7) % 39
    for t in range(10):
        la, ca = model.apply(params, toks[t], jnp.int32(t), ca,
                             method=PlainTransformer.decode_step)
        lb, cb = model.apply(params, toks[t], jnp.int32(t), cb,
                             full_attention=True,
                             method=PlainTransformer.decode_step)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-4)
