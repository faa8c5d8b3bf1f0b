"""Numpy oracle for the reference's Favor feature map.

The reference reaches FAVOR+ through ``fast_transformers.feature_maps.Favor``
(``stage2_accompaniment/model/fast_transformer_decoder.py:9,30``,
``Favor.factory(n_dims=128)``).  That library is not installable here, so
``favor_oracle`` below is a ~30-line pure-numpy transcription of its
semantics (``fast_transformers/feature_maps/fourier_features.py``):

* softmax_temp defaults to 1/sqrt(query_dimensions); inputs are scaled by
  sqrt(softmax_temp) = d^{-1/4};
* phi(x) = exp(omega^T x' - ||x'||^2 / 2), an unbiased positive-feature
  estimator of the softmax kernel exp(q.k/sqrt(d)) (FAVOR+ / Performer);
* omega is drawn as blocks of QR-orthogonalized Gaussians whose rows are
  re-scaled to chi(d)-distributed norms (``orthogonal_random_matrix_``).

The overall 1/sqrt(m) feature constant cancels in the normalized attention
num/den ratio, so the oracle carries it explicitly to match
``ops.linear_attention.favor_features`` pointwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emo_disentanger_tpu.ops.linear_attention import (
    causal_linear_attention_ref, draw_orthogonal_features, favor_features,
)


def favor_oracle(x: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """Reference Favor.forward, numpy: x [..., D], omega [D, M] -> [..., M]."""
    d = x.shape[-1]
    softmax_temp = 1.0 / np.sqrt(d)
    xs = x * np.sqrt(softmax_temp)                       # x * d^{-1/4}
    u = xs @ omega
    norm_sq = np.sum(xs * xs, axis=-1, keepdims=True)
    return np.exp(u - 0.5 * norm_sq) / np.sqrt(omega.shape[-1])


def test_favor_features_pointwise_matches_oracle():
    """For a FIXED omega, the unstabilized key path equals the oracle
    bit-for-bit (up to f32 rounding); the query path differs only by the
    per-position stabilizer exp(-max), which cancels in attention."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, 20, 16).astype(np.float32)
    omega = np.asarray(draw_orthogonal_features(jax.random.PRNGKey(1), 16, 64))

    want = favor_oracle(x, omega)
    got_k = np.asarray(favor_features(jnp.asarray(x), jnp.asarray(omega),
                                      is_query=False, key_stabilizer=0.0))
    np.testing.assert_allclose(got_k, want, rtol=1e-5, atol=1e-7)

    got_q = np.asarray(favor_features(jnp.asarray(x), jnp.asarray(omega),
                                      is_query=True))
    ratio = got_q / want                                  # [3, 20, 64]
    # constant across the feature dim: pure per-position rescale
    np.testing.assert_allclose(
        ratio, np.broadcast_to(ratio[..., :1], ratio.shape), rtol=1e-4)
    # and it is exactly exp(-max_h) <= 1
    assert np.all(ratio <= 1.0 + 1e-5)


def test_oracle_attention_equals_framework_attention():
    """Normalized causal attention built from the numpy oracle features
    equals the framework's stabilized path (stabilizers cancel)."""
    rng = np.random.RandomState(1)
    q = rng.randn(2, 2, 24, 8).astype(np.float32)
    k = rng.randn(2, 2, 24, 8).astype(np.float32)
    v = rng.randn(2, 2, 24, 4).astype(np.float32)
    omega = np.asarray(draw_orthogonal_features(jax.random.PRNGKey(3), 8, 32))

    # eps=0: the absolute denominator regularizer does not commute with the
    # stabilizer rescale, so exact cancellation only holds without it
    ours = causal_linear_attention_ref(
        favor_features(jnp.asarray(q), jnp.asarray(omega), is_query=True),
        favor_features(jnp.asarray(k), jnp.asarray(omega), is_query=False),
        jnp.asarray(v), eps=0.0)
    oracle = causal_linear_attention_ref(
        jnp.asarray(favor_oracle(q, omega)),
        jnp.asarray(favor_oracle(k, omega)), jnp.asarray(v), eps=0.0)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(oracle),
                               rtol=2e-4, atol=2e-5)


def test_favor_kernel_estimator_is_unbiased():
    """E_omega[phi(q) . phi(k)] = exp(q.k / sqrt(d)) * (1/m normalizer
    handled inside): average over many independent draws converges to the
    softmax kernel (FAVOR+ positive features are unbiased)."""
    rng = np.random.RandomState(2)
    d = 8
    q = rng.randn(5, d).astype(np.float32) * 0.3
    k = rng.randn(5, d).astype(np.float32) * 0.3
    exact = np.exp(np.sum(q * k, axis=-1) / np.sqrt(d))

    n_draws = 200
    ests = []
    for i in range(n_draws):
        omega = np.asarray(draw_orthogonal_features(jax.random.PRNGKey(i),
                                                    d, 128))
        pq = favor_oracle(q, omega)
        pk = favor_oracle(k, omega)
        # the 1/sqrt(m) on each side makes the dot an average over features
        ests.append(np.sum(pq * pk, axis=-1))
    est = np.mean(ests, axis=0)
    # regression guard for the Haar sign correction in the orthogonal draw:
    # without it this estimate is ~15% off (systematic, not variance)
    np.testing.assert_allclose(est, exact, rtol=0.05)


def test_orthogonal_draw_matches_reference_distribution():
    """``orthogonal_random_matrix_`` semantics: per block of d columns the
    directions are exactly orthogonal, and row norms follow the chi(d)
    distribution (mean sqrt(2)*Gamma((d+1)/2)/Gamma(d/2), var d - mean^2)."""
    import math
    d, m = 16, 64
    norms = []
    for i in range(60):
        omega = np.asarray(draw_orthogonal_features(jax.random.PRNGKey(100 + i),
                                                    d, m))
        w = omega.T                                      # [m, d] feature rows
        for b in range(0, m, d):
            blk = w[b:b + d]
            normed = blk / np.linalg.norm(blk, axis=1, keepdims=True)
            np.testing.assert_allclose(normed @ normed.T, np.eye(len(blk)),
                                       atol=1e-5)
        norms.append(np.linalg.norm(w, axis=1))
    norms = np.concatenate(norms)
    chi_mean = math.sqrt(2) * math.gamma((d + 1) / 2) / math.gamma(d / 2)
    chi_var = d - chi_mean ** 2
    assert abs(norms.mean() - chi_mean) < 0.05
    assert abs(norms.var() - chi_var) < 0.1


def test_oracle_attention_approximates_softmax_attention():
    """End to end: oracle-feature linear attention ~= exact causal softmax
    attention with temperature 1/sqrt(d) — the contract that makes the
    Performer a drop-in for dense attention."""
    rng = np.random.RandomState(3)
    d, L = 8, 16
    q = rng.randn(1, 1, L, d).astype(np.float32) * 0.5
    k = rng.randn(1, 1, L, d).astype(np.float32) * 0.5
    v = rng.randn(1, 1, L, 4).astype(np.float32)
    omega = np.asarray(draw_orthogonal_features(jax.random.PRNGKey(9), d, 2048))

    approx = np.asarray(causal_linear_attention_ref(
        jnp.asarray(favor_oracle(q, omega)),
        jnp.asarray(favor_oracle(k, omega)), jnp.asarray(v)))

    scores = np.einsum('bhid,bhjd->bhij', q, k) / np.sqrt(d)
    mask = np.tril(np.ones((L, L), dtype=bool))
    scores = np.where(mask, scores, -1e30)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    exact = np.einsum('bhij,bhjd->bhid', np.asarray(probs), v)
    np.testing.assert_allclose(approx, exact, atol=0.15)
