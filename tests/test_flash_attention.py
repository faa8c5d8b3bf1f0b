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
