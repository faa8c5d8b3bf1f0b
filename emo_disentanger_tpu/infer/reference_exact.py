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
from ..models.gpt2 import MusicGPT2


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


def _temperature_exact_s2(logits: np.ndarray, temperature: float,
                          inadmissibles=None) -> np.ndarray:
    """Reference stage-2 ``temperature``
    (``stage2_accompaniment/inference.py:73-86``): optional inadmissible-set
    mask via in-place ``-= inf``, unstabilized softmax, and an UNSTABILIZED
    extended-precision retry (unlike stage 1's, no max-subtraction)."""
    if inadmissibles is not None:
        logits[inadmissibles] -= np.inf
    try:
        probs = np.exp(logits / temperature) / np.sum(np.exp(logits / temperature))
        assert np.count_nonzero(np.isnan(probs)) == 0
        return probs
    except (AssertionError, FloatingPointError):
        logits = logits.astype(np.longdouble)
        probs = np.exp(logits / temperature) / np.sum(np.exp(logits / temperature))
        return probs.astype(float)


def generate_stage2_reference_exact(
    model: MusicGPT2, params, vocab: Vocab, *,
    lead_sheet_events: List[List[int]], primer: List[int],
    max_events: int = 10000, skip_check: bool = False,
    max_bars: Optional[int] = None, temp: float = 1.2, top_p: float = 0.9,
    inadmissibles=None, window: int = 2048,
) -> Tuple[List[int], int]:
    """Token-for-token replay of the reference's ``generate_conditional``
    (``stage2_accompaniment/inference.py:229-327``) on the flax GPT-2.

    Control flow — teacher-forced per-bar lead-sheet injection on a sampled
    ``Track_LeadSheet``, beat-monotonicity rejection with the 256-strike
    stuck exit (which returns the FULL stream, no final-token drop), PAD and
    early-EOS skips, the final-bar EOS accept, and the last-2048-token
    sliding window — is replicated line by line; sampling uses the
    reference's exact numpy arithmetic and global-RNG draw
    (:func:`_temperature_exact_s2`, :func:`_nucleus_exact`).

    Logits: while the sequence fits in ``window``, the flax KV-cache decode
    produces them incrementally (positions are absolute from 0, identical to
    the reference's full re-forward).  Once it outgrows the window the
    reference renumbers positions every step, so the replay switches to the
    same full window re-forward.  The caller seeds ``np.random``.

    Returns (tokens, steps): the reference's return value (``generated[:-1]``
    normally, the whole stream on a stuck exit)."""
    tls = vocab.event2idx['Track_LeadSheet']
    tf = vocab.event2idx['Track_Full']
    generated = list(primer) + [tls] + list(lead_sheet_events[0]) + [tf]
    seg_inp = [0] * len(generated)
    seg_inp[-1] = 1

    target_bars = len(lead_sheet_events)
    generated_bars = 0
    if max_bars is not None:
        target_bars = min(max_bars, target_bars)

    cache = model.apply(params, 1, window + 8,
                        method=MusicGPT2.init_decode_cache)
    step_fn = jax.jit(lambda tok, seg, t, c: model.apply(
        params, tok, seg, t, c, method=MusicGPT2.decode_step))
    full_fn = jax.jit(lambda toks, segs: model.apply(
        params, toks, segs, keep_last_only=True))

    cache_cap = window + 8
    n_fed = 0
    logits_dev = None

    def feed(tokens: List[int], segs: List[int]):
        # stop at capacity: by then the stream has outgrown ``window`` and
        # sampling has switched to the full-window re-forward, so the (now
        # stale) cache is never read again
        nonlocal n_fed, logits_dev, cache
        for tok, seg in zip(tokens, segs):
            if n_fed >= cache_cap:
                return
            logits_dev, cache = step_fn(jnp.asarray([tok]),
                                        jnp.asarray([seg]),
                                        jnp.int32(n_fed), cache)
            n_fed += 1

    # prefill the seed (all but the last token produce no sampled logits)
    feed(generated, seg_inp)

    steps = 0
    cur_pos = 0
    failed_cnt = 0
    while generated_bars < target_bars:
        if len(generated) < window:
            # cache path: logits_dev already holds the last position's
            # logits (rejected iterations reuse them, exactly as the
            # reference's re-forward of the unchanged stream recomputes
            # identical values).  Fresh writable copy each iteration: the
            # reference's temperature() mutates its logits in place.
            logits = np.array(logits_dev[0])
        else:
            logits = np.array(full_fn(
                jnp.asarray([generated[-window:]]),
                jnp.asarray([seg_inp[-window:]]))[0])
        probs = _temperature_exact_s2(logits, temp,
                                      inadmissibles=inadmissibles)
        word = _nucleus_exact(probs, top_p)
        word_event = vocab.idx2event[word]

        if not skip_check and 'Beat' in word_event:
            event_pos = int(word_event.split('_')[-1])
            if not event_pos >= cur_pos:
                failed_cnt += 1
                if failed_cnt >= 256:
                    return generated, steps      # stuck: full stream
                continue
            cur_pos = event_pos
            failed_cnt = 0

        if word_event == 'Track_LeadSheet':
            steps += 1
            generated.append(word)
            seg_inp.append(0)
            generated_bars += 1
            if generated_bars < target_bars:
                inject = [word] + list(lead_sheet_events[generated_bars]) + [tf]
                inject_segs = ([0] * (1 + len(lead_sheet_events[generated_bars]))
                               + [1])
                generated.extend(lead_sheet_events[generated_bars])
                seg_inp.extend([0] * len(lead_sheet_events[generated_bars]))
                generated.append(tf)
                seg_inp.append(1)
                cur_pos = 0
                if len(generated) < window:
                    feed(inject, inject_segs)
            continue

        if word_event == 'PAD_None' or (word_event == 'EOS_None'
                                        and generated_bars < target_bars - 1):
            continue
        elif word_event == 'EOS_None' and generated_bars == target_bars - 1:
            generated.append(word)
            break

        generated.append(word)
        seg_inp.append(1)
        steps += 1
        if len(generated) < window:
            feed([word], [1])

        if len(generated) > max_events:
            break

    return generated[:-1], steps


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
