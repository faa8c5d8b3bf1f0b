"""Reference-exact host-side stage-1 decoding, for stream-parity validation.

Replays the reference's ``generate_plain_xl`` control flow
(``stage1_compose/inference_utils.py:51-135``) on this framework's models:
logits come from the flax KV-cache decode (mathematically identical to the
reference's mems path — see tests/test_torch_parity.py), while sampling uses
numpy with the reference's EXACT arithmetic, including the unstabilized
softmax with its float128 overflow fallback and the global-numpy-RNG
``np.random.choice`` draw.  Seeding ``np.random.seed`` identically on both
sides therefore yields bit-identical event streams (verified against the
real reference code in tests/test_stream_parity.py).

This module is a validation tool; production decoding uses the on-device
loops in :mod:`.stage1`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.theory import MAJOR_KEY, MINOR_KEY
from ..core.vocab import Vocab
from ..models.txl import PlainTransformer


def _temperature_exact(logits: np.ndarray, temperature: float) -> np.ndarray:
    """Reference ``temperature`` (``inference_utils.py:14-24``): unstabilized
    softmax, retried in extended precision on overflow."""
    try:
        probs = np.exp(logits / temperature) / np.sum(np.exp(logits / temperature))
        assert np.count_nonzero(np.isnan(probs)) == 0
        return probs
    except (AssertionError, FloatingPointError):
        logits = logits.astype(np.longdouble)
        x = logits / temperature
        probs = np.exp(x - np.max(x))
        probs = probs / probs.sum()
        return probs.astype(float)


def _nucleus_exact(probs: np.ndarray, p: float) -> int:
    """Reference ``nucleus`` (``inference_utils.py:27-41``), including the
    second-crossing quirk and the global-RNG draw."""
    probs = probs / sum(probs)
    sorted_probs = np.sort(probs)[::-1]
    sorted_index = np.argsort(probs)[::-1]
    cusum_sorted_probs = np.cumsum(sorted_probs)
    after_threshold = cusum_sorted_probs > p
    if sum(after_threshold) > 0:
        last_index = np.where(after_threshold)[0][1]
        candi_index = sorted_index[:last_index]
    else:
        candi_index = sorted_index[:3]
    candi_probs = np.array([probs[i] for i in candi_index], dtype=np.float64)
    candi_probs /= sum(candi_probs)
    return int(np.random.choice(candi_index, size=1, p=candi_probs)[0])


def generate_stage1_reference_exact(
    model: PlainTransformer, params, vocab: Vocab, *,
    primer_events: List[str], max_bars: int = 128, max_events: int = 512,
    temp: float = 1.2, top_p: float = 0.97,
    representation: str = 'functional', key_determine: str = 'rule',
    prompt_bars: Optional[int] = None, max_klen: Optional[int] = None,
) -> Tuple[Optional[List[int]], int]:
    """Token-for-token replay of the reference decode loop.  The caller seeds
    ``np.random`` beforehand.  Returns (token ids incl. the final token the
    reference later drops, n_steps) or (None, _) when stuck."""
    generated = vocab.encode(primer_events)
    target_bars = max_bars
    generated_bars = prompt_bars or 0

    max_klen = max_klen or (max_events + 2048)
    cache = model.apply(params, 1, max_klen,
                        method=PlainTransformer.init_decode_cache)
    step_fn = jax.jit(lambda tok, t, c: model.apply(
        params, tok, t, c, method=PlainTransformer.decode_step))

    # prefill all but the last primer token
    t = 0
    for tok in generated[:-1]:
        _, cache = step_fn(jnp.asarray([tok]), jnp.int32(t), cache)
        t += 1

    steps = 0
    cur_pos = 0
    failed_cnt = 0
    while generated_bars < target_bars:
        logits_dev, cache = step_fn(jnp.asarray([generated[-1]]),
                                    jnp.int32(t), cache)
        t += 1
        # keep float32: the reference's numpy softmax runs in the tensor's
        # dtype, and bit parity requires following the same precision flow
        logits = np.asarray(logits_dev[0])

        if representation in ('functional', 'key') and len(generated) == 1:
            probs = _temperature_exact(logits, 1.1)
            word = _nucleus_exact(probs, 0.97)
            if key_determine == 'rule':
                emotion_label = vocab.idx2event[generated[0]].split('_')[1]
                key_event = vocab.idx2event[word]
                if key_event.split('_')[0] != 'Key':
                    raise ValueError('[info] key generation failed')
                key_label = key_event.split('_')[1]
                positive = emotion_label in ('Q1', 'Q4', 'Positive')
                if positive != (key_label in MAJOR_KEY):
                    continue
            word_event = vocab.idx2event[word]
        else:
            probs = _temperature_exact(logits, temp)
            word = _nucleus_exact(probs, top_p)
            word_event = vocab.idx2event[word]

        if 'Beat' in word_event:
            event_pos = int(word_event.split('_')[-1])
            if not event_pos >= cur_pos:
                failed_cnt += 1
                if failed_cnt >= 256:
                    return None, steps
                continue
            cur_pos = event_pos
            failed_cnt = 0

        if 'Bar' in word_event:
            generated_bars += 1
            cur_pos = 0
        if word_event == 'PAD_None':
            continue

        generated.append(word)
        steps += 1

        if len(generated) > max_events:
            break
        if word_event == 'EOS_None':
            break

    return generated, steps
