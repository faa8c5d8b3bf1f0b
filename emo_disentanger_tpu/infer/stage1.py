"""Stage-1 generation: one jitted lax.while_loop per song.

Parity with the reference's ``generate_plain_xl``
(``stage1_compose/inference_utils.py:51-135``), restructured TPU-first: the
reference re-invokes the model from Python per token (XL hidden-state mems as
cache); here the whole sample/reject/append loop runs on device against the
KV-cache decode path, with the rules as token-id table lookups:

* functional key step (the 2nd token): temperature 1.1 / top-p 0.97 and the
  emotion->mode rule — Positive requires a major key, Negative minor —
  resampling on mismatch with the cache advancing exactly like the
  reference's mems (it updates mems *before* the rule check, so every retry
  grows the context by one copy of the last token);
* Beat positions must be non-decreasing within a bar; 256 consecutive
  violations abort the song (status STUCK, reference returns None);
* PAD tokens are skipped; Bar_None increments the bar counter; EOS or the
  bar/event budget ends the song; like the reference, the final token is
  dropped from the returned stream (``generated[:-1]``).
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vocab import Vocab
from ..models.txl import PlainTransformer
from ..ops.sampling import nucleus_sample
from .rules import RuleTables, build_rule_tables, emotion_wants_major

STATUS_RUNNING = 0
STATUS_DONE = 1
STATUS_STUCK = 2
STATUS_OVERFLOW = 3


def _make_song_loop(model: PlainTransformer, tables: RuleTables, *,
                    temp: float, top_p: float, key_temp: float = 1.1,
                    key_top_p: float = 0.97, max_events: int, max_bars_cap: int,
                    functional: bool, max_iters: int, max_klen: int,
                    cache_layout: str = 'khd'):
    """Build the jitted whole-song decode function.

    ``cache_layout != 'khd'`` decodes with the whole-cache einsum over the
    head-major cache (see ``ops.attention.full_decode_attention``); 'khd'
    keeps the model's batch-based flash/einsum auto-select."""
    is_beat = jnp.asarray(tables.is_beat)
    beat_pos = jnp.asarray(tables.beat_pos)
    is_bar = jnp.asarray(tables.is_bar)
    is_pad = jnp.asarray(tables.is_pad)
    is_eos = jnp.asarray(tables.is_eos)
    is_key = jnp.asarray(tables.is_key)
    key_major = jnp.asarray(tables.key_major)

    def song(params, primer: jax.Array, primer_len: jax.Array,
             prompt_bars: jax.Array, target_bars: jax.Array,
             want_major: jax.Array, rng: jax.Array):
        cache = model.apply(params, 1, max_klen, cache_layout,
                            method=PlainTransformer.init_decode_cache)

        # prefill all but the last primer token
        def prefill_body(i, carry):
            cache, _ = carry
            _, cache = model.apply(params, primer[i][None], i, cache,
                                   layout=cache_layout,
                                   method=PlainTransformer.decode_step)
            return cache, 0
        cache, _ = jax.lax.fori_loop(0, primer_len - 1, prefill_body, (cache, 0))

        out = jnp.zeros(max_events + 8, dtype=jnp.int32)
        out = jax.lax.dynamic_update_slice(out, primer, (0,))

        state = dict(
            cache=cache,
            t=primer_len - 1,            # next write position
            last=primer[primer_len - 1],
            out=out,
            out_len=primer_len,
            # reference inference_utils.py:57-60: generated_bars starts at
            # prompt_bars (= number of Bar_None in the primer MINUS one,
            # per get_leadsheet_prompt's assert) — not zero
            bars=prompt_bars.astype(jnp.int32),
            cur_pos=jnp.int32(0),
            failed=jnp.int32(0),
            iters=jnp.int32(0),
            status=jnp.int32(STATUS_RUNNING),
            rng=rng,
        )

        def cond(s):
            return ((s['status'] == STATUS_RUNNING)
                    & (s['bars'] < target_bars)
                    & (s['iters'] < max_iters))

        def body(s):
            logits, cache = model.apply(params, s['last'][None], s['t'], s['cache'],
                                        layout=cache_layout,
                                        method=PlainTransformer.decode_step)
            t = s['t'] + 1
            rng, sub = jax.random.split(s['rng'])

            key_step = jnp.logical_and(functional, s['out_len'] == 1)
            # one sort: key-step (temp, top_p) selected as traced scalars —
            # bit-identical to sampling twice (same rng key) and picking
            word = nucleus_sample(sub, logits[0],
                                  jnp.where(key_step, key_temp, temp),
                                  jnp.where(key_step, key_top_p, top_p))

            # --- rule evaluation ---
            key_ok = is_key[word] & (key_major[word] == want_major)
            beat_ok = beat_pos[word] >= s['cur_pos']
            reject_key = key_step & ~key_ok
            reject_beat = is_beat[word] & ~beat_ok & ~reject_key
            reject_pad = is_pad[word] & ~reject_key & ~reject_beat
            reject = reject_key | reject_beat | reject_pad

            failed = jnp.where(reject_beat, s['failed'] + 1,
                               jnp.where(is_beat[word] & ~reject, 0, s['failed']))
            stuck = failed >= 256

            accept = ~reject
            out = jnp.where(
                accept,
                jax.lax.dynamic_update_index_in_dim(
                    s['out'], word, jnp.minimum(s['out_len'], max_events + 7), 0),
                s['out'])
            out_len = s['out_len'] + accept.astype(jnp.int32)
            bars = s['bars'] + (accept & is_bar[word]).astype(jnp.int32)
            cur_pos = jnp.where(accept & is_bar[word], 0,
                                jnp.where(accept & is_beat[word], beat_pos[word],
                                          s['cur_pos']))
            last = jnp.where(accept, word, s['last'])

            done = accept & (is_eos[word] | (out_len > max_events))
            overflow = t >= max_klen - 1
            status = jnp.where(stuck, STATUS_STUCK,
                               jnp.where(done, STATUS_DONE,
                                         jnp.where(overflow, STATUS_OVERFLOW,
                                                   s['status'])))
            return dict(cache=cache, t=t, last=last, out=out, out_len=out_len,
                        bars=bars, cur_pos=cur_pos, failed=failed,
                        iters=s['iters'] + 1, status=status, rng=rng)

        s = jax.lax.while_loop(cond, body, state)
        return s['out'], s['out_len'], s['status'], s['bars']

    return jax.jit(song)


class Stage1Generator:
    """Holds the compiled whole-song loop; one instance per (model, vocab,
    sampling-parameter) combination."""

    def __init__(self, model: PlainTransformer, params, vocab: Vocab, *,
                 temp: float = 1.2, top_p: float = 0.97,
                 max_events: int = 512, max_bars: int = 128,
                 functional: bool = True, reject_slack: int = 1024,
                 cache_layout: Optional[str] = None):
        # cache memory layout, as Stage1BatchGenerator's (khd/dk/hkd);
        # defaults to the EMODIS_S1_CACHE_LAYOUT env var
        import os as _os
        if cache_layout is None:
            cache_layout = _os.environ.get('EMODIS_S1_CACHE_LAYOUT', 'khd')
        assert cache_layout in ('khd', 'dk', 'hkd'), cache_layout
        self.model = model
        self.params = params
        self.vocab = vocab
        self.tables = build_rule_tables(vocab)
        self.max_events = max_events
        self.max_bars = max_bars
        self.functional = functional
        max_iters = max_events * 2 + 2048
        self._song = _make_song_loop(
            model, self.tables, temp=temp, top_p=top_p,
            max_events=max_events, max_bars_cap=max_bars,
            functional=functional, max_iters=max_iters,
            max_klen=max_events + reject_slack, cache_layout=cache_layout)
        self._primer_pad = 64

    def generate(self, emotion: str, seed: int,
                 primer_events: Optional[List[str]] = None,
                 target_bars: Optional[int] = None,
                 prompt_bars: Optional[int] = None,
                 ) -> Tuple[Optional[List[str]], dict]:
        """Generate one piece; returns (event strings without the dropped
        last token, stats).  None on a stuck model (reference parity).

        ``prompt_bars``: starting value of the bar counter for prompt
        continuation (reference ``generate_plain_xl``'s ``prompt_bars``,
        ``inference_utils.py:57-60``).  Defaults to the number of
        ``Bar_None`` tokens in the primer minus one — the reference
        convention, since ``get_leadsheet_prompt`` slices the prompt at
        ``bar_pos[prompt_n_bars] + 1`` so the primer carries
        ``prompt_n_bars + 1`` bar tokens (``inference.py:35-38``).

        NB the default assumes ``primer_events[0]`` is a non-Bar control
        token (the Emotion token, per the reference's primer layout).
        ``run_stage1`` substitutes the emotion token over the raw prompt's
        first event — if that raw event was itself ``Bar_None`` the count
        here would be one short, so callers doing prompt continuation
        should always pass ``prompt_bars`` computed from the raw prompt
        (as ``run_stage1`` does)."""
        primer_events = primer_events or ['Emotion_{}'.format(emotion)]
        if prompt_bars is None:
            prompt_bars = max(
                0, sum(1 for e in primer_events if e == 'Bar_None') - 1)
        primer = self.vocab.encode(primer_events)
        plen = len(primer)
        assert plen <= self.max_events, 'primer longer than max_events'
        pad_to = max(self._primer_pad, 1 << (plen - 1).bit_length())
        pad_to = min(pad_to, self.max_events + 8)
        primer_arr = np.zeros(pad_to, dtype=np.int32)
        primer_arr[:plen] = primer

        t0 = time.time()
        out, out_len, status, bars = self._song(
            self.params, jnp.asarray(primer_arr), jnp.int32(plen),
            jnp.int32(prompt_bars),
            jnp.int32(target_bars or self.max_bars),
            jnp.asarray(emotion_wants_major(emotion)),
            jax.random.PRNGKey(seed))
        out = np.asarray(out)
        out_len = int(out_len)
        status = int(status)
        stats = {'status': status, 'bars': int(bars), 'n_events': out_len,
                 'seconds': time.time() - t0}
        if status == STATUS_STUCK:
            return None, stats
        tokens = out[:out_len].tolist()
        events = self.vocab.decode(tokens[:-1])     # reference drops the last
        return events, stats
