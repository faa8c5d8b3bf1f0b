"""Batched stage-1 generation: B songs in one device loop.

The reference generates one song at a time (``inference.py:200-294``).  Its
retry semantics — the XL cache grows by a repeat of the last accepted token
on every iteration, accepted or rejected (``generate_plain_xl`` updates mems
*before* the rule checks) — mean all batch elements can advance the cache in
lockstep with a shared write position, so a whole batch of songs (e.g. both
valence classes x n groups) decodes in a single ``lax.while_loop``: per-song
rule states are vectors, finished songs idle until all are done.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vocab import Vocab
from ..models.txl import PlainTransformer
from ..ops.sampling import nucleus_sample
from .rules import build_rule_tables, emotion_wants_major
from .stage1 import STATUS_RUNNING, STATUS_DONE, STATUS_STUCK, STATUS_OVERFLOW


def _make_batch_loop(model: PlainTransformer, tables, *, temp: float,
                     top_p: float, key_temp: float, key_top_p: float,
                     max_events: int, functional: bool, max_iters: int,
                     max_klen: int, batch: int):
    is_beat = jnp.asarray(tables.is_beat)
    beat_pos = jnp.asarray(tables.beat_pos)
    is_bar = jnp.asarray(tables.is_bar)
    is_pad = jnp.asarray(tables.is_pad)
    is_eos = jnp.asarray(tables.is_eos)
    is_key = jnp.asarray(tables.is_key)
    key_major = jnp.asarray(tables.key_major)

    sample_v = jax.vmap(nucleus_sample, in_axes=(0, 0, None, None))

    def song(params, primer: jax.Array, target_bars: jax.Array,
             want_major: jax.Array, rng: jax.Array):
        """primer [B] (single emotion tokens), target_bars/want_major [B]."""
        cache = model.apply(params, batch, max_klen,
                            method=PlainTransformer.init_decode_cache)
        out = jnp.zeros((batch, max_events + 8), dtype=jnp.int32)
        out = out.at[:, 0].set(primer)

        state = dict(
            cache=cache,
            t=jnp.int32(0),
            last=primer,
            out=out,
            out_len=jnp.ones((batch,), jnp.int32),
            bars=jnp.zeros((batch,), jnp.int32),
            cur_pos=jnp.zeros((batch,), jnp.int32),
            failed=jnp.zeros((batch,), jnp.int32),
            iters=jnp.int32(0),
            status=jnp.full((batch,), STATUS_RUNNING, jnp.int32),
            rng=rng,
        )

        def running(s):
            return (s['status'] == STATUS_RUNNING) & (s['bars'] < target_bars)

        def cond(s):
            return jnp.any(running(s)) & (s['iters'] < max_iters)

        def body(s):
            logits, cache = model.apply(params, s['last'], s['t'], s['cache'],
                                        method=PlainTransformer.decode_step)
            t = s['t'] + 1
            rng, sub = jax.random.split(s['rng'])
            keys = jax.random.split(sub, batch)

            key_step = jnp.logical_and(functional, s['out_len'] == 1)
            w_main = sample_v(keys, logits, temp, top_p)
            w_key = sample_v(keys, logits, key_temp, key_top_p)
            word = jnp.where(key_step, w_key, w_main)

            key_ok = is_key[word] & (key_major[word] == want_major)
            reject_key = key_step & ~key_ok
            reject_beat = is_beat[word] & (beat_pos[word] < s['cur_pos']) & ~reject_key
            reject_pad = is_pad[word] & ~reject_key & ~reject_beat
            reject = reject_key | reject_beat | reject_pad

            act = running(s)
            failed = jnp.where(act & reject_beat, s['failed'] + 1,
                               jnp.where(act & is_beat[word] & ~reject, 0,
                                         s['failed']))
            stuck = failed >= 256

            accept = act & ~reject
            idx = jnp.minimum(s['out_len'], max_events + 7)
            new_out = s['out'].at[jnp.arange(batch), idx].set(word)
            out = jnp.where(accept[:, None], new_out, s['out'])
            out_len = s['out_len'] + accept.astype(jnp.int32)
            bars = s['bars'] + (accept & is_bar[word]).astype(jnp.int32)
            cur_pos = jnp.where(accept & is_bar[word], 0,
                                jnp.where(accept & is_beat[word],
                                          beat_pos[word], s['cur_pos']))
            last = jnp.where(accept, word, s['last'])

            done = accept & (is_eos[word] | (out_len > max_events))
            overflow = t >= max_klen - 1
            status = jnp.where(act & stuck, STATUS_STUCK,
                               jnp.where(done, STATUS_DONE,
                                         jnp.where(act & overflow,
                                                   STATUS_OVERFLOW,
                                                   s['status'])))
            return dict(cache=cache, t=t, last=last, out=out, out_len=out_len,
                        bars=bars, cur_pos=cur_pos, failed=failed,
                        iters=s['iters'] + 1, status=status, rng=rng)

        s = jax.lax.while_loop(cond, body, state)
        return s['out'], s['out_len'], s['status'], s['bars']

    return jax.jit(song)


class Stage1BatchGenerator:
    """Generate a batch of songs (one emotion token each) in one device call."""

    def __init__(self, model: PlainTransformer, params, vocab: Vocab, *,
                 batch: int = 8, temp: float = 1.2, top_p: float = 0.97,
                 max_events: int = 512, max_bars: int = 128,
                 functional: bool = True, reject_slack: int = 1024):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.batch = batch
        self.max_bars = max_bars
        self.tables = build_rule_tables(vocab)
        self._song = _make_batch_loop(
            model, self.tables, temp=temp, top_p=top_p, key_temp=1.1,
            key_top_p=0.97, max_events=max_events, functional=functional,
            max_iters=max_events * 2 + 2048, max_klen=max_events + reject_slack,
            batch=batch)

    def generate(self, emotions: List[str], seed: int = 0,
                 target_bars: Optional[int] = None,
                 ) -> Tuple[List[Optional[List[str]]], dict]:
        assert len(emotions) == self.batch
        primer = jnp.asarray(
            [self.vocab.event2idx['Emotion_{}'.format(e)] for e in emotions],
            dtype=jnp.int32)
        want = jnp.asarray([emotion_wants_major(e) for e in emotions])
        tb = jnp.full((self.batch,), target_bars or self.max_bars, jnp.int32)

        t0 = time.time()
        out, out_len, status, bars = self._song(self.params, primer, tb,
                                                want, jax.random.PRNGKey(seed))
        out = np.asarray(out)
        out_len = np.asarray(out_len)
        status = np.asarray(status)
        secs = time.time() - t0

        songs: List[Optional[List[str]]] = []
        for b in range(self.batch):
            if status[b] == STATUS_STUCK:
                songs.append(None)
                continue
            tokens = out[b, :out_len[b]].tolist()
            songs.append(self.vocab.decode(tokens[:-1]))
        stats = {'seconds': secs, 'status': status.tolist(),
                 'bars': np.asarray(bars).tolist(),
                 'events': out_len.tolist()}
        return songs, stats
