"""Temperature + nucleus (top-p) sampling.

Parity target: the reference's numpy sampler (``inference_utils.py:14-41``,
``stage2_accompaniment/inference.py:71-100``), including its two quirks:

* the nucleus keeps the sorted tokens strictly before the SECOND index whose
  cumulative probability exceeds p (an off-by-one that usually keeps one
  extra token past the threshold);
* when no index exceeds p (only possible for p >= 1) the top 3 are kept.

Two implementations are provided: an on-device jittable sampler (used inside
the lax.scan/while_loop decoders; stable log-space softmax replaces the
reference's float128 overflow fallback, which does not exist on TPU) and a
numpy version for host-side parity testing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def nucleus_sample(key: jax.Array, logits: jax.Array, temperature: float,
                   top_p: float, forbid: Optional[jax.Array] = None) -> jax.Array:
    """Sample one token id from logits [V] (jit-safe, static V).

    ``temperature``/``top_p`` may be Python floats or traced scalars —
    per-element sampling params under vmap cost nothing extra, letting a
    batched decode loop with mixed regimes (e.g. stage-1's key step vs main
    step) share ONE sort instead of sampling twice and selecting.

    ``forbid``: optional bool mask [V]; True entries are excluded before the
    softmax (the reference subtracts inf from inadmissible tempo logits,
    ``stage2_accompaniment/inference.py:71-73``).
    """
    logits = logits.astype(jnp.float32)
    if forbid is not None:
        logits = jnp.where(forbid, NEG_INF, logits)
    probs = jax.nn.softmax(logits / temperature)

    order = jnp.argsort(-probs)                       # descending
    sorted_probs = probs[order]
    cumsum = jnp.cumsum(sorted_probs)
    after = cumsum > top_p
    n_after = jnp.sum(after)

    # index of the second True (the reference's np.where(after)[0][1])
    true_count = jnp.cumsum(after.astype(jnp.int32))
    second_true = jnp.argmax(true_count >= 2)         # 0 if fewer than 2 Trues
    keep_n = jnp.where(n_after >= 2, second_true,
                       jnp.where(n_after == 1,
                                 # degenerate: single True can only be the
                                 # last index; keep everything before it
                                 logits.shape[0] - 1,
                                 3))
    keep_n = jnp.maximum(keep_n, 1)

    idx = jnp.arange(logits.shape[0])
    candi = jnp.where(idx < keep_n, sorted_probs, 0.0)
    candi = candi / jnp.sum(candi)
    choice = jax.random.categorical(key, jnp.log(jnp.maximum(candi, 1e-38)))
    return order[choice]


def nucleus_sample_numpy(rng: np.random.RandomState, logits: np.ndarray,
                         temperature: float, top_p: float,
                         forbid: Optional[np.ndarray] = None) -> int:
    """Host-side sampler with semantics identical to the reference
    (``inference_utils.py:14-41``), for parity tests and debugging."""
    logits = np.asarray(logits, dtype=np.float64)
    if forbid is not None:
        logits = np.where(forbid, -np.inf, logits)
    x = logits / temperature
    x = x - np.max(x)                                  # stable softmax
    probs = np.exp(x) / np.sum(np.exp(x))

    probs = probs / probs.sum()
    sorted_index = np.argsort(probs)[::-1]
    sorted_probs = probs[sorted_index]
    cusum = np.cumsum(sorted_probs)
    after = cusum > top_p
    if after.sum() >= 2:
        last_index = np.where(after)[0][1]
        candi_index = sorted_index[:last_index]
    elif after.sum() == 1:
        candi_index = sorted_index[:np.where(after)[0][0]]
        if len(candi_index) == 0:
            candi_index = sorted_index[:1]
    else:
        candi_index = sorted_index[:3]
    candi_probs = np.array([probs[i] for i in candi_index], dtype=np.float64)
    candi_probs /= candi_probs.sum()
    return int(rng.choice(candi_index, size=1, p=candi_probs)[0])
