"""Nucleus sampling: quirk semantics + jax/numpy agreement on support sets."""

import jax
import jax.numpy as jnp
import numpy as np

from emo_disentanger_tpu.ops.sampling import nucleus_sample, nucleus_sample_numpy


def _support_jax(logits, temp, p, n=200):
    sampler = jax.jit(lambda k, lg: nucleus_sample(k, lg, temp, p))
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    lg = jnp.asarray(logits)
    return {int(sampler(k, lg)) for k in keys}


def _support_numpy(logits, temp, p, n=200):
    rng = np.random.RandomState(0)
    got = set()
    for _ in range(n):
        got.add(nucleus_sample_numpy(rng, logits, temp, p))
    return got


def test_second_crossing_quirk():
    """probs .5/.3/.15/.05, p=.6: cumsum .5,.8,.95,1.0 -> after=[F,T,T,T];
    second True at index 2 -> keep sorted[:2] = the top-2 tokens."""
    probs = np.array([0.5, 0.3, 0.15, 0.05])
    logits = np.log(probs)
    assert _support_numpy(logits, 1.0, 0.6) == {0, 1}
    assert _support_jax(logits, 1.0, 0.6) == {0, 1}


def test_top_token_above_p_keeps_one():
    """top prob > p: after=[T,T,...] -> second True at 1 -> top-1 only."""
    probs = np.array([0.9, 0.06, 0.04])
    logits = np.log(probs)
    assert _support_numpy(logits, 1.0, 0.5) == {0}
    assert _support_jax(logits, 1.0, 0.5) == {0}


def test_keeps_one_past_threshold():
    """p=.97 with a fat tail keeps one token past the crossing."""
    probs = np.array([0.6, 0.3, 0.06, 0.03, 0.01])
    logits = np.log(probs)
    # cumsum: .6 .9 .96 .99 1.0 -> first True at 2, second at 3 -> keep 3
    # (one token, index 2, past the p=.95 crossing)
    assert _support_numpy(logits, 1.0, 0.95) == {0, 1, 2}
    assert _support_jax(logits, 1.0, 0.95) == {0, 1, 2}


def test_temperature_changes_distribution():
    logits = np.array([2.0, 1.0, 0.0, -1.0])
    hot = _support_jax(logits, 10.0, 0.999)
    cold = _support_jax(logits, 0.05, 0.999)
    assert cold == {0}
    assert len(hot) >= 3


def test_forbid_mask():
    logits = np.array([5.0, 4.0, 3.0])
    forbid = jnp.array([True, False, False])
    sampler = jax.jit(lambda k: nucleus_sample(k, jnp.asarray(logits), 1.0, 0.99,
                                               forbid=forbid))
    got = {int(sampler(jax.random.PRNGKey(i))) for i in range(50)}
    assert 0 not in got


def test_large_logits_no_overflow():
    """The reference needed a float128 fallback; log-space softmax must not."""
    logits = np.array([1e4, 9.9e3, 0.0])
    w = nucleus_sample(jax.random.PRNGKey(0), jnp.asarray(logits), 1.0, 0.9)
    assert int(w) in (0, 1)
    rng = np.random.RandomState(0)
    assert nucleus_sample_numpy(rng, logits, 1.0, 0.9) in (0, 1)
