"""Stage-2 generation: lead-sheet conditioned performance decoding.

Parity with the reference's ``generate_conditional``
(``stage2_accompaniment/inference.py:231-327``) — primer + per-bar
teacher-forced lead-sheet injection, Beat-monotonicity rejection with a
256-retry stuck guard (returning the partial piece), PAD/early-EOS skipping,
segment ids 0 for lead-sheet tokens (including the sampled Track_LeadSheet)
and 1 for full-track tokens.

TPU-first hot loop: where the reference re-encodes the entire last-2048-token
window once per generated token (O(L) Performer / O(L^2) GPT-2 per token,
``inference.py:250-257``), this decoder carries state:

* Performer — per-layer FAVOR+ (S, z) running sums: O(1) per token over the
  *unbounded* history (no window truncation needed);
* GPT-2 — a KV cache with absolute positions, re-anchored by one parallel
  forward over the trailing window when the cache fills (the reference
  instead slides the window token-by-token and renumbers positions; the
  block re-anchor is the cache-friendly equivalent).

Each bar costs one jitted injection call (teacher-forced lead events) and one
jitted while_loop (sampled full-track events); rejected samples redraw from
the SAME logits without advancing the cache, matching the reference's
recompute-identical-window retry.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vocab import Vocab
from ..models.performer import MusicPerformer
from ..models.gpt2 import MusicGPT2
from ..ops.sampling import nucleus_sample
from .rules import RuleTables, build_rule_tables

STATUS_RUNNING = 0
STATUS_BAR_DONE = 1     # sampled Track_LeadSheet, bar finished
STATUS_EOS = 2
STATUS_MAX = 3
STATUS_STUCK = 4

INJECT_PAD = 512        # injected chunks are padded to this many tokens


class Stage2Generator:
    """Compiled decode harness for one (model, params, vocab) triple."""

    def __init__(self, model, params, vocab: Vocab, *,
                 temp: float, top_p: float,
                 max_events: int = 10000,
                 gpt2_cache_len: int = 4096,
                 gpt2_window: int = 2048,
                 reanchor_margin: int = 256,
                 omegas: Optional[jax.Array] = None,
                 forbid: Optional[np.ndarray] = None):
        self.model = model
        self.params = params
        self.vocab = vocab
        self.is_performer = isinstance(model, MusicPerformer)
        self.tables = build_rule_tables(vocab)
        self.temp = temp
        self.top_p = top_p
        self.max_events = max_events
        self.cache_len = gpt2_cache_len
        self.window = gpt2_window
        self.reanchor_margin = reanchor_margin
        self.omegas = omegas
        # optional inadmissible-token mask (e.g. construct_inadmissible_set)
        self.forbid = None if forbid is None else jnp.asarray(forbid)
        if self.is_performer and omegas is None:
            raise ValueError('Performer decoding needs drawn omegas')

        self._inject = jax.jit(self._inject_fn)
        self._sample = jax.jit(self._sample_fn)
        if not self.is_performer:
            self._reanchor = jax.jit(self._reanchor_fn)

    # ----------------------------------------------------------- plumbing
    def _init_state(self):
        if self.is_performer:
            return self.model.apply(self.params, 1,
                                    method=MusicPerformer.init_decode_state)
        return self.model.apply(self.params, 1, self.cache_len,
                                method=MusicGPT2.init_decode_cache)

    def _step(self, token, seg, t, state):
        if self.is_performer:
            return self.model.apply(self.params, token, seg, t, self.omegas,
                                    state, method=MusicPerformer.decode_step)
        return self.model.apply(self.params, token, seg, t, state,
                                method=MusicGPT2.decode_step)

    def _inject_fn(self, tokens, segs, length, t0, state):
        """Teacher-force ``length`` tokens (padded arrays) through the cache;
        returns (logits after the last token, state, new t)."""
        def body(i, carry):
            state, logits = carry
            lg, state = self._step(tokens[i][None], segs[i][None], t0 + i, state)
            return state, lg[0]
        state, logits = jax.lax.fori_loop(
            0, length, body, (state, jnp.zeros(self.vocab.size, jnp.float32)))
        return logits, state, t0 + length

    def _reanchor_fn(self, tokens, segs, length):
        """GPT-2 cache rebuild: one parallel forward over the last window.

        ``length`` is the number of real (non-PAD) tokens; the returned
        logits are taken at the last real token so a window shorter than
        ``self.window`` never continues generation from PAD-conditioned
        logits."""
        logits, k, v = self.model.apply(
            self.params, tokens[None], segs[None], return_kv=True)
        pad = self.cache_len - tokens.shape[0]
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
        return logits[0, length - 1], {'k': k, 'v': v}

    def _sample_fn(self, logits, state, t, out, out_len, cur_pos, failed,
                   rng, bars, target_bars):
        tb = self.tables
        is_beat = jnp.asarray(tb.is_beat)
        beat_pos = jnp.asarray(tb.beat_pos)
        is_pad = jnp.asarray(tb.is_pad)
        is_eos = jnp.asarray(tb.is_eos)
        is_lead = jnp.asarray(tb.is_track_lead)

        init = dict(logits=logits, state=state, t=t, out=out, out_len=out_len,
                    cur_pos=cur_pos, failed=failed, rng=rng,
                    status=jnp.int32(STATUS_RUNNING), iters=jnp.int32(0))
        max_iters = self.max_events * 2 + 4096
        cache_guard = (self.cache_len - 2) if not self.is_performer else None

        def cond(s):
            running = s['status'] == STATUS_RUNNING
            running &= s['iters'] < max_iters
            if cache_guard is not None:
                running &= s['t'] < cache_guard
            return running

        def body(s):
            rng, sub = jax.random.split(s['rng'])
            word = nucleus_sample(sub, s['logits'], self.temp, self.top_p,
                                  forbid=self.forbid)

            beat_bad = is_beat[word] & (beat_pos[word] < s['cur_pos'])
            eos_early = is_eos[word] & (bars < target_bars - 1)
            reject = beat_bad | is_pad[word] | eos_early

            failed = jnp.where(beat_bad, s['failed'] + 1,
                               jnp.where(is_beat[word], 0, s['failed']))
            stuck = failed >= 256

            def on_reject(s):
                return dict(s, rng=rng, failed=failed,
                            status=jnp.where(stuck, STATUS_STUCK, s['status']),
                            iters=s['iters'] + 1)

            def on_accept(s):
                seg = jnp.where(is_lead[word], 0, 1).astype(jnp.int32)
                new_logits, state = self._step(word[None], seg[None], s['t'],
                                               s['state'])
                new_out = jax.lax.dynamic_update_index_in_dim(
                    s['out'], word, jnp.minimum(s['out_len'], s['out'].shape[0] - 1), 0)
                out_len = s['out_len'] + 1
                cur_pos = jnp.where(is_beat[word], beat_pos[word], s['cur_pos'])
                status = jnp.where(
                    is_lead[word], STATUS_BAR_DONE,
                    jnp.where(is_eos[word], STATUS_EOS,
                              jnp.where(out_len > self.max_events, STATUS_MAX,
                                        STATUS_RUNNING)))
                return dict(logits=new_logits[0], state=state, t=s['t'] + 1,
                            out=new_out, out_len=out_len, cur_pos=cur_pos,
                            failed=failed, rng=rng, status=status,
                            iters=s['iters'] + 1)

            return jax.lax.cond(reject | stuck, on_reject, on_accept, s)

        s = jax.lax.while_loop(cond, body, init)
        return (s['logits'], s['state'], s['t'], s['out'], s['out_len'],
                s['cur_pos'], s['failed'], s['rng'], s['status'])

    # ------------------------------------------------------------- public
    def generate(self, primer: Sequence[int],
                 lead_sheet_bars: List[List[int]], *,
                 seed: int = 0, max_bars: Optional[int] = None,
                 ) -> Tuple[List[int], dict]:
        """Generate a full performance conditioned on per-bar lead-sheet
        token lists.  Returns (token ids, stats); the final token is dropped
        exactly like the reference (``generated[:-1]``)."""
        vocab = self.vocab
        track_lead = vocab.event2idx['Track_LeadSheet']
        track_full = vocab.event2idx['Track_Full']

        target_bars = len(lead_sheet_bars)
        if max_bars is not None:
            target_bars = min(max_bars, target_bars)

        tokens = list(primer) + [track_lead] + list(lead_sheet_bars[0]) + [track_full]
        segs = [0] * (len(tokens) - 1) + [1]

        t0 = time.time()
        state = self._init_state()
        rng = jax.random.PRNGKey(seed)

        out = np.zeros(self.max_events + 8, dtype=np.int32)
        out[:len(tokens)] = tokens
        out = jnp.asarray(out)
        out_len = jnp.int32(len(tokens))

        logits, state, t = self._run_inject(tokens, segs, jnp.int32(0), state)

        bars = 0
        cur_pos = jnp.int32(0)
        failed = jnp.int32(0)
        status = STATUS_RUNNING
        all_tokens = list(tokens)
        all_segs = list(segs)

        rounds = 0
        while bars < target_bars:
            rounds += 1
            if rounds > 4 * (target_bars + 1) + 64:
                # safety: a model sampling rejected tokens forever would spin
                # the reanchor/sample cycle endlessly (the reference has the
                # same exposure via its bare `continue` loop)
                status = STATUS_STUCK
                break
            (logits, state, t, out, out_len, cur_pos, failed, rng,
             status_dev) = self._sample(logits, state, t, out, out_len,
                                        cur_pos, failed, rng,
                                        jnp.int32(bars), jnp.int32(target_bars))
            status = int(status_dev)
            # sync host copies of the stream
            new_len = int(out_len)
            host_out = np.array(out)
            emitted = host_out[len(all_tokens):new_len].tolist()
            all_tokens.extend(emitted)
            all_segs.extend(
                [0 if tok == track_lead else 1 for tok in emitted])

            if status == STATUS_BAR_DONE:
                bars += 1
                if bars < target_bars:
                    inject = list(lead_sheet_bars[bars]) + [track_full]
                    if len(all_tokens) + len(inject) >= self.max_events:
                        status = STATUS_MAX
                        break
                    inj_segs = [0] * (len(inject) - 1) + [1]
                    # GPT-2: re-anchor when the cache cannot hold the bar
                    if (not self.is_performer
                            and int(t) + len(inject) + self.reanchor_margin
                            >= self.cache_len):
                        logits, state, t = self._do_reanchor(all_tokens, all_segs)
                    logits, state, t = self._run_inject(inject, inj_segs, t, state)
                    host_out = np.array(out)
                    for tok in inject:
                        host_out[len(all_tokens)] = tok
                        all_tokens.append(tok)
                    all_segs.extend(inj_segs)
                    out = jnp.asarray(host_out)
                    out_len = jnp.int32(len(all_tokens))
                    cur_pos = jnp.int32(0)
                continue
            if status == STATUS_RUNNING and not self.is_performer:
                # hit the cache guard: re-anchor and continue the same bar
                logits, state, t = self._do_reanchor(all_tokens, all_segs)
                continue
            break

        stats = {'status': status, 'bars': bars,
                 'n_events': len(all_tokens), 'seconds': time.time() - t0}
        if status == STATUS_STUCK:
            # reference returns the partial piece on a stuck model
            return all_tokens, stats
        return all_tokens[:-1], stats

    def _run_inject(self, tokens: List[int], segs: List[int], t, state):
        pad = INJECT_PAD
        if len(tokens) > pad:
            # split long injections (e.g. the initial primer + first bar)
            logits = None
            for i in range(0, len(tokens), pad):
                logits, state, t = self._run_inject(
                    tokens[i:i + pad], segs[i:i + pad], t, state)
            return logits, state, t
        tok_arr = np.zeros(pad, dtype=np.int32)
        seg_arr = np.zeros(pad, dtype=np.int32)
        tok_arr[:len(tokens)] = tokens
        seg_arr[:len(segs)] = segs
        return self._inject(jnp.asarray(tok_arr), jnp.asarray(seg_arr),
                            jnp.int32(len(tokens)), t, state)

    def _do_reanchor(self, all_tokens: List[int], all_segs: List[int]):
        keep = all_tokens[-self.window:]
        segs = all_segs[-self.window:]
        pad = self.window - len(keep)
        tok_arr = np.asarray(keep + [self.vocab.pad_id] * pad, dtype=np.int32)
        seg_arr = np.asarray(segs + [0] * pad, dtype=np.int32)
        logits, cache = self._reanchor(jnp.asarray(tok_arr),
                                       jnp.asarray(seg_arr),
                                       jnp.int32(len(keep)))
        return logits, cache, jnp.int32(len(keep))
