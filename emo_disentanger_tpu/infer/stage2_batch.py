"""Batched stage-2 generation: B performances in one device loop.

The production pattern renders several arousal quadrants (and groups) from
lead sheets simultaneously.  Because the Performer's decode state is the
per-layer FAVOR+ (S, z) pair — no positional KV cache — every batch element
can run its own token stream with a private position counter, so sampling
AND the per-bar teacher-forced lead-sheet injection unify into a single
``lax.while_loop``:

* each element is either SAMPLING the full track or INJECTING the next
  lead-sheet bar from a precomputed token matrix;
* rejected samples (beat monotonicity, PAD, early EOS) keep that element's
  state/logits unchanged and resample — exactly the reference's
  recompute-identical-window retry (``stage2_accompaniment/inference.py:
  279-291``) — while other elements proceed;
* the loop ends when every element is done.

Supports both backbones: the Performer carries per-layer FAVOR+ (S, z)
state (positions only matter for the PE lookup), while GPT-2 writes its KV
cache at per-element clocks (``decode_step_batchpos``) and re-anchors the
window IN the device loop: when any element's clock nears the cache end
(mid-bar ``t >= cache_len - 2`` guard, or the bar-boundary
``t + len(inject) + 256 >= cache_len`` margin — the same trigger points as
the host-orchestrated :class:`~..infer.stage2.Stage2Generator`), a
``lax.cond`` branch runs ONE batched parallel forward over each flagged
element's trailing window (gathered from the output buffer), rebuilds its
KV cache, resets its clock and replaces its logits, so songs of unbounded
length never truncate (reference sliding window:
``stage2_accompaniment/inference.py:19,253-257``).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vocab import Vocab
from ..models.performer import MusicPerformer
from ..models.gpt2 import MusicGPT2
from ..ops.sampling import nucleus_sample
from .rules import build_rule_tables

STATUS_RUNNING = 0
STATUS_EOS = 2
STATUS_MAX = 3
STATUS_STUCK = 4
STATUS_DONE_BARS = 5
STATUS_IDLE = 6          # serve(): slot drained, no job to refill
STATUS_OVERFLOW = 7      # gpt2_tiers: element outgrew this tier's cache

MODE_SAMPLE = 0
MODE_INJECT = 1


class Stage2BatchGenerator:
    """One compiled whole-batch generation loop (Performer or GPT-2)."""

    def __init__(self, model, params, vocab: Vocab, *,
                 batch: int, temp: float = 1.1, top_p: float = 0.99,
                 max_events: int = 10000, max_bar_tokens: int = 256,
                 max_bars: int = 128, gpt2_cache_len: int = 4096,
                 gpt2_window: int = 2048, reanchor_margin: int = 256,
                 serve_chunk_steps: int = 192,
                 omegas: Optional[jax.Array] = None,
                 cache_layout: Optional[str] = None,
                 gpt2_tiers: Optional[Sequence[int]] = None,
                 mesh=None):
        self.is_performer = isinstance(model, MusicPerformer)
        if self.is_performer and omegas is None:
            raise ValueError('Performer decoding needs drawn omegas')
        # Decode-state memory layout: 'khd' (reference-shaped buffers,
        # default) or 'dk' (lanes-clean).  For GPT-2, 'dk' stores the KV
        # cache K-in-lanes ([B,H,Dh,Kmax] -- avoids the 4x TPU tile padding
        # on per-step cache reads, see models.gpt2); for the Performer it
        # carries the FAVOR S state transposed ([...,Dh,M] 'dm' -- halves
        # the dominant f32 state read+write traffic, see models.performer).
        import os as _os
        if cache_layout is None:
            cache_layout = _os.environ.get('EMODIS_S2_CACHE_LAYOUT', 'khd')
        assert cache_layout in ('khd', 'dk'), cache_layout
        self.cache_layout = cache_layout
        # FAVOR S layout: 'dm' measured 1.95x over 'md' on chip (round 5,
        # B=16 bf16 serving) and is the default, independent of the KV
        # cache layout (where 'dk' measured flat and 'khd' remains default)
        self._state_layout = _os.environ.get('EMODIS_PERF_STATE_LAYOUT',
                                             'dm')
        assert self._state_layout in ('md', 'dm'), self._state_layout
        self.gpt2_cache_len = gpt2_cache_len
        self.gpt2_window = gpt2_window
        self.reanchor_margin = reanchor_margin
        if not self.is_performer:
            # re-anchor resets t to <= window; a full injected bar must then
            # fit before the mid-bar guard (which only fires in SAMPLE mode)
            assert gpt2_cache_len - 2 >= gpt2_window + max_bar_tokens, \
                'gpt2_cache_len must cover gpt2_window + max_bar_tokens'
            # max_events below gpt2_window is fine: re-anchor re-feeds
            # the last min(window, out buffer) tokens (see reanchor_all) —
            # a song shorter than the window is its own trailing window.
            # Rejected samples advance the cache clock without advancing
            # the out buffer, so the trigger stays reachable either way.
            # (A former assert here broke the 1500-event serving config
            # against the default 2048 window — caught by the r5 matrix.)
        self.model = model
        self.params = params
        self.vocab = vocab
        self.batch = batch
        self.temp = temp
        self.top_p = top_p
        self.max_events = max_events
        self.max_bar_tokens = max_bar_tokens
        self.max_bars = max_bars
        self.serve_chunk_steps = serve_chunk_steps
        self.omegas = omegas
        # Multi-chip serving: with a >1-device mesh, every B-leading job
        # array is committed batch-sharded over the mesh's data axes and
        # the ONE compiled loop runs SPMD — the per-element control flow is
        # embarrassingly data-parallel, so the only collective the
        # partitioner inserts is the while-cond's global any().  The
        # reference serves one file per process (single GPU,
        # stage2_accompaniment/inference.py:422-485); this scales the same
        # loop over n chips.  Per-element math is unchanged, so streams are
        # bit-identical to the 1-device run (pinned by
        # tests/test_multichip_serving.py).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            dp = (self.mesh.shape.get('dp', 1)
                  * self.mesh.shape.get('dcn', 1))
            if batch % dp:
                raise ValueError(
                    f'batch={batch} not divisible by the mesh data axes '
                    f'(dp*dcn={dp})')
        self.tables = build_rule_tables(vocab)
        # GPT-2 cache LADDER (stage-1's tiered-Kmax design, stage1_batch.py):
        # the dense decode reads the WHOLE cache buffer every step, so the
        # 4096-slot re-anchor cache taxes every early-song token with reads
        # of slots it hasn't written yet.  ``gpt2_tiers`` runs lockstep
        # ``generate`` through ascending cache sizes: the moment ANY element
        # reaches the current tier's cache end the loop hands back, the k/v
        # buffers are padded into the next tier and the SAME body continues
        # from the carried state (rng chain included) — unlike stage 1's
        # shared write clock, GPT-2 clocks are per-element, so the ladder
        # exits on the FIRST overflow rather than idling overflowed elements
        # (idling would shift their rng draws).  Streams are therefore
        # bitwise identical to the single-big-cache run (attention masks
        # positions > t, so logits are Kmax-independent given the history;
        # pinned by tests/test_gpt2_ladder.py).  serve() ignores the ladder
        # (its refills interleave jobs at mixed clocks).  Reference context:
        # the sliding window re-forward of stage2_accompaniment/
        # inference.py:250-257 has no cache at all.
        self._tier_loops = None
        self._tier_resumes = []
        if gpt2_tiers and not self.is_performer:
            # a tier must be unreachable by BOTH re-anchor triggers, so the
            # in-tier guard is exactly "cache slot about to run out"
            hi = gpt2_cache_len - max_bar_tokens - reanchor_margin - 2
            tiers = sorted({int(k) for k in gpt2_tiers if 16 <= k < hi})
            if not tiers:
                raise ValueError(
                    f'gpt2_tiers must contain values in [16, {hi}) '
                    f'(got {list(gpt2_tiers)})')
            self._tier_loops = [
                jax.jit(self._make_tier_loop(tiers[0]))]
            self._tier_resumes = [
                jax.jit(self._make_tier_resume(k), donate_argnums=0)
                for k in tiers[1:] + [gpt2_cache_len]]
        self._init_state, self._body, self._running = self._build_core()
        self._loop = jax.jit(self._lockstep_loop)
        self._initj = jax.jit(self._init_state)
        # serve(): donating jits — old state buffers are reused in place
        self._chunk = jax.jit(self._run_chunk, donate_argnums=0)
        self._reset = jax.jit(self._reset_slot, donate_argnums=0)
        self._idle = jax.jit(self._idle_slot, donate_argnums=0)
        self._refill = jax.jit(self._reset_slots, donate_argnums=0)

    def _build_core(self, tier_len: Optional[int] = None):
        """Define the loop body over a state dict that CONTAINS the
        per-job inputs (injection matrices, primer rows, bar targets);
        returns ``(init_state, body, running)``.

        Keeping jobs in the carry — rather than closed over as loop
        arguments — is what makes continuous batching possible: ``serve()``
        swaps one finished slot's job with a tiny jitted in-place update
        and re-enters the same compiled loop, instead of recompiling or
        re-uploading whole batch inputs.

        ``tier_len`` (GPT-2 ladder) sizes the KV cache below
        ``gpt2_cache_len``; elements about to outrun it flip to
        STATUS_OVERFLOW (both re-anchor triggers are unreachable inside a
        tier — enforced at construction)."""
        cache_len = tier_len or self.gpt2_cache_len
        tb = self.tables
        is_beat = jnp.asarray(tb.is_beat)
        beat_pos = jnp.asarray(tb.beat_pos)
        is_pad = jnp.asarray(tb.is_pad)
        is_eos = jnp.asarray(tb.is_eos)
        is_lead = jnp.asarray(tb.is_track_lead)
        B = self.batch
        sample_v = jax.vmap(nucleus_sample, in_axes=(0, 0, None, None))
        max_iters = self._max_iters = self.max_events * 2 + 8192

        def reanchor_all(s):
            """One batched parallel forward over each flagged element's
            trailing window; rebuilds cache/clock/logits for flagged rows
            only (mirrors ``Stage2Generator._do_reanchor``)."""
            # can't re-feed more rows than the output buffer holds: a song
            # shorter than the window is its own trailing window (keep_len
            # caps at out_len either way, so the semantics are unchanged)
            W = min(self.gpt2_window, s['out'].shape[1])
            start = jnp.maximum(s['out_len'] - W, 0)
            slice_w = jax.vmap(
                lambda buf, st: jax.lax.dynamic_slice(buf, (st,), (W,)))
            toks = slice_w(s['out'], start)
            segw = slice_w(s['out_segs'], start)
            keep_len = jnp.minimum(s['out_len'], W)
            valid = jnp.arange(W)[None, :] < keep_len[:, None]
            toks = jnp.where(valid, toks, self.vocab.pad_id)
            segw = jnp.where(valid, segw, 0)
            logits_full, k, v = self.model.apply(self.params, toks, segw,
                                                 return_kv=True)
            new_logits = logits_full[jnp.arange(B), keep_len - 1]
            padc = self.gpt2_cache_len - W
            if self.cache_layout == 'dk':
                # [L,B,W,H,Dh] -> K-in-lanes [L,B,H,Dh,W], pad K last.
                # A one-off transpose per re-anchor (every ~W tokens) is
                # noise next to the per-step cache-read savings
                k = jnp.pad(k.transpose(0, 1, 3, 4, 2),
                            ((0, 0), (0, 0), (0, 0), (0, 0), (0, padc)))
                v = jnp.pad(v.transpose(0, 1, 3, 4, 2),
                            ((0, 0), (0, 0), (0, 0), (0, 0), (0, padc)))
            else:
                k = jnp.pad(k, ((0, 0), (0, 0), (0, padc), (0, 0), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, 0), (0, padc), (0, 0), (0, 0)))
            flag = s['need_re']
            fsel = flag.reshape((1, B, 1, 1, 1))
            state = {
                'k': jnp.where(fsel, k.astype(s['state']['k'].dtype),
                               s['state']['k']),
                'v': jnp.where(fsel, v.astype(s['state']['v'].dtype),
                               s['state']['v']),
            }
            return dict(
                s, state=state,
                logits=jnp.where(flag[:, None], new_logits, s['logits']),
                t=jnp.where(flag, keep_len, s['t']),
                reanchors=s['reanchors'] + flag.astype(jnp.int32),
                need_re=jnp.zeros_like(flag))

        def maybe_reanchor(s):
            # the host path checks the cache guard BEFORE sampling from the
            # carried logits (``stage2.py _sample_fn cond``), so the check
            # lives at the top of the body and this step's sample is drawn
            # from the re-anchored logits
            mid = ((s['status'] == STATUS_RUNNING) & ~s['in_primer']
                   & (s['mode'] == MODE_SAMPLE)
                   & (s['t'] >= self.gpt2_cache_len - 2))
            s = dict(s, need_re=s['need_re'] | mid)
            return jax.lax.cond(jnp.any(s['need_re']), reanchor_all,
                                lambda s: s, s)

        def model_step(token, seg, t, state, advance):
            if self.is_performer:
                # masked state update: rejected/done elements' (S, z) stay
                # untouched without a second full-state select
                return self.model.apply(
                    self.params, token, seg, t, self.omegas, state,
                    update_mask=advance, state_layout=self._state_layout,
                    method=MusicPerformer.decode_step_batchpos)
            # GPT-2: rejected elements overwrite the same cache slot on the
            # next step before attending, so no select is needed either
            return self.model.apply(self.params, token, seg, t, state,
                                    layout=self.cache_layout,
                                    method=MusicGPT2.decode_step_batchpos)

        def init_state(inj_tokens, inj_segs, inj_len, primer, primer_len,
                       target_bars, rng):
            """inj_tokens/segs [B, max_bars, max_bar_tokens]; inj_len [B, max_bars];
            primer [B, P]; primer_len [B]; n_bars/target_bars [B]."""
            if self.is_performer:
                state = self.model.apply(self.params, B,
                                         self._state_layout,
                                         method=MusicPerformer.init_decode_state)
            else:
                state = self.model.apply(self.params, B, cache_len,
                                         self.cache_layout,
                                         method=MusicGPT2.init_decode_cache)
            out = jnp.zeros((B, self.max_events + 8), jnp.int32)
            out = jax.lax.dynamic_update_slice(out, primer, (0, 0))

            return dict(
                state=state,
                inj_tokens=inj_tokens, inj_segs=inj_segs, inj_len=inj_len,
                primer=primer, primer_len=primer_len.astype(jnp.int32),
                target_bars=target_bars,
                # seg stream mirrors ``Stage2Generator``'s all_segs (primer
                # tokens are seg 0 — zeros suffice); needed because seg is
                # NOT a pure function of the token id (lead-sheet events
                # reappear as full-track samples with seg 1)
                out_segs=jnp.zeros((B, self.max_events + 8), jnp.int32),
                need_re=jnp.zeros((B,), jnp.bool_),
                reanchors=jnp.zeros((B,), jnp.int32),
                logits=jnp.zeros((B, self.vocab.size), jnp.float32),
                t=jnp.zeros((B,), jnp.int32),          # per-element position
                out=out,
                out_len=primer_len.astype(jnp.int32),
                mode=jnp.full((B,), MODE_INJECT, jnp.int32),
                # phase -1 = still feeding the primer
                primer_pos=jnp.zeros((B,), jnp.int32),
                in_primer=jnp.ones((B,), jnp.bool_),
                bars=jnp.zeros((B,), jnp.int32),
                inj_pos=jnp.zeros((B,), jnp.int32),
                cur_pos=jnp.zeros((B,), jnp.int32),
                failed=jnp.zeros((B,), jnp.int32),
                rejects=jnp.zeros((B,), jnp.int32),
                esteps=jnp.zeros((B,), jnp.int32),     # per-element steps
                status=jnp.full((B,), STATUS_RUNNING, jnp.int32),
                iters=jnp.int32(0),
                rng=rng,
            )

        def running(s):
            return s['status'] == STATUS_RUNNING

        def body(s):
            # tiered bodies skip the re-anchor entirely: both triggers are
            # unreachable inside a tier (enforced at construction), and
            # lax.cond TRACES the re-anchor branch, whose full-cache-shaped
            # k/v select cannot typecheck against a tier-sized cache
            if not self.is_performer and cache_len == self.gpt2_cache_len:
                s = maybe_reanchor(s)
            rng, sub = jax.random.split(s['rng'])
            keys = jax.random.split(sub, B)
            act = running(s)
            primer = s['primer']
            inj_tokens, inj_segs = s['inj_tokens'], s['inj_segs']
            inj_len, target_bars = s['inj_len'], s['target_bars']

            # --- choose this step's token per element ---
            sampled = sample_v(keys, s['logits'], self.temp, self.top_p)
            prim_tok = jnp.take_along_axis(
                primer, jnp.clip(s['primer_pos'], 0, primer.shape[1] - 1)
                [:, None], axis=1)[:, 0]
            bar_idx = jnp.minimum(s['bars'], inj_tokens.shape[1] - 1)
            inj_tok = inj_tokens[jnp.arange(B), bar_idx,
                                 jnp.minimum(s['inj_pos'],
                                             self.max_bar_tokens - 1)]
            inj_seg = inj_segs[jnp.arange(B), bar_idx,
                               jnp.minimum(s['inj_pos'],
                                           self.max_bar_tokens - 1)]

            injecting = (s['mode'] == MODE_INJECT) & ~s['in_primer']
            token = jnp.where(s['in_primer'], prim_tok,
                              jnp.where(injecting, inj_tok, sampled))
            seg = jnp.where(s['in_primer'], 0,
                            jnp.where(injecting, inj_seg,
                                      jnp.where(is_lead[token], 0, 1)))

            # --- sampling rules (only in SAMPLE mode) ---
            sampling = (s['mode'] == MODE_SAMPLE) & ~s['in_primer']
            beat_bad = sampling & is_beat[token] & (beat_pos[token] < s['cur_pos'])
            eos_early = sampling & is_eos[token] & (s['bars'] < target_bars - 1)
            reject = (beat_bad | (sampling & is_pad[token]) | eos_early) & act
            failed = jnp.where(beat_bad & act, s['failed'] + 1,
                               jnp.where(sampling & is_beat[token] & act,
                                         0, s['failed']))
            stuck = failed >= 256

            advance = act & ~reject
            # --- run the model for everyone; per-element state freezing
            # happens inside the step (masked update / slot overwrite) ---
            new_logits, state = model_step(token, seg, s['t'],
                                           s['state'], advance)
            logits = jnp.where(advance[:, None], new_logits, s['logits'])
            t = s['t'] + advance.astype(jnp.int32)

            # --- bookkeeping ---
            append = advance & ~s['in_primer']
            idx = jnp.minimum(s['out_len'], self.max_events + 7)
            out = jnp.where(
                append[:, None],
                s['out'].at[jnp.arange(B), idx].set(token), s['out'])
            out_segs = jnp.where(
                append[:, None],
                s['out_segs'].at[jnp.arange(B), idx].set(seg),
                s['out_segs'])
            out_len = s['out_len'] + append.astype(jnp.int32)

            # primer progress
            primer_pos = s['primer_pos'] + (advance & s['in_primer'])
            in_primer = s['in_primer'] & (primer_pos < s['primer_len'])

            # injection progress: entering inject rows resets cur_pos
            bar_len = inj_len[jnp.arange(B), bar_idx]
            inj_pos = jnp.where(injecting & advance, s['inj_pos'] + 1,
                                s['inj_pos'])
            inj_done = injecting & advance & (inj_pos >= bar_len)
            mode = jnp.where(inj_done, MODE_SAMPLE, s['mode'])
            cur_pos = jnp.where(inj_done, 0, s['cur_pos'])

            # sampled Track_LeadSheet: bar finished -> inject next
            bar_done = sampling & advance & is_lead[token]
            bars = s['bars'] + bar_done.astype(jnp.int32)
            more = bars < target_bars
            mode = jnp.where(bar_done & more, MODE_INJECT, mode)
            inj_pos = jnp.where(bar_done, 0, inj_pos)

            cur_pos = jnp.where(sampling & advance & is_beat[token],
                                beat_pos[token], cur_pos)

            eos_final = sampling & advance & is_eos[token] & ~eos_early
            esteps = s['esteps'] + act.astype(jnp.int32)
            status = jnp.where(act & stuck, STATUS_STUCK, s['status'])
            # per-element runaway guard (serve() has no global cond cap):
            # same budget the lockstep cond applied globally
            status = jnp.where(act & (esteps >= max_iters), STATUS_STUCK,
                               status)
            need_re = s['need_re']
            if not self.is_performer:
                # bar-boundary re-anchor trigger: the host path checks
                # ``t + len(inject) + margin >= cache_len`` before
                # injecting the next bar (stage2.py:254-256)
                next_bar = jnp.minimum(bars, inj_tokens.shape[1] - 1)
                next_len = inj_len[jnp.arange(B), next_bar]
                reinj = (bar_done & more
                         & (t + next_len + self.reanchor_margin
                            >= self.gpt2_cache_len))
                need_re = need_re | reinj
            status = jnp.where(act & eos_final, STATUS_EOS, status)
            status = jnp.where(act & (out_len > self.max_events),
                               STATUS_MAX, status)
            status = jnp.where(act & bar_done & ~more, STATUS_DONE_BARS,
                               status)
            if tier_len is not None and tier_len < self.gpt2_cache_len:
                # ladder guard: this step wrote at position t-1 < tier_len;
                # flag BEFORE the next write would hit the cache end.  Only
                # still-running elements flip (a song finishing on the same
                # step stays finished)
                status = jnp.where((status == STATUS_RUNNING) & act
                                   & (t >= tier_len - 2),
                                   STATUS_OVERFLOW, status)

            return dict(s, state=state, logits=logits, t=t, out=out,
                        out_segs=out_segs, out_len=out_len, mode=mode,
                        primer_pos=primer_pos, in_primer=in_primer,
                        bars=bars, inj_pos=inj_pos, cur_pos=cur_pos,
                        failed=failed, esteps=esteps,
                        rejects=s['rejects'] + reject.astype(jnp.int32),
                        status=status, need_re=need_re,
                        iters=s['iters'] + 1, rng=rng)

        return init_state, body, running

    # ---- compiled drivers over the shared body ----

    def _make_tier_loop(self, tier_len: int):
        """Lockstep driver for the FIRST ladder tier: init at ``tier_len``
        slots, run until everyone finishes or anyone overflows; returns the
        full carry (the resume tiers need it)."""
        init_state, body, running = self._build_core(tier_len)

        def loop(inj_tokens, inj_segs, inj_len, primer, primer_len,
                 target_bars, rng):
            s = init_state(inj_tokens, inj_segs, inj_len, primer,
                           primer_len, target_bars, rng)

            def cond(s):
                return (jnp.any(running(s))
                        & ~jnp.any(s['status'] == STATUS_OVERFLOW)
                        & (s['iters'] < self._max_iters))

            return jax.lax.while_loop(cond, body, s)

        return loop

    def _make_tier_resume(self, tier_len: int):
        """Continuation at the next tier: pad the carried k/v buffers to
        ``tier_len`` slots (unwritten positions are masked by the decode's
        ``pos > t`` check, so logits — and therefore streams — are
        unchanged), flip OVERFLOW back to RUNNING, re-enter the loop."""
        _, body, running = self._build_core(tier_len)
        k_axis = 4 if self.cache_layout == 'dk' else 2

        def resume(s):
            grow = tier_len - s['state']['k'].shape[k_axis]
            pad = [(0, 0)] * 5
            pad[k_axis] = (0, grow)
            state = {'k': jnp.pad(s['state']['k'], pad),
                     'v': jnp.pad(s['state']['v'], pad)}
            s = dict(s, state=state,
                     status=jnp.where(s['status'] == STATUS_OVERFLOW,
                                      STATUS_RUNNING, s['status']))

            def cond(s):
                return (jnp.any(running(s))
                        & ~jnp.any(s['status'] == STATUS_OVERFLOW)
                        & (s['iters'] < self._max_iters))

            return jax.lax.while_loop(cond, body, s)

        return resume

    def _lockstep_loop(self, inj_tokens, inj_segs, inj_len, primer,
                       primer_len, target_bars, rng):
        s = self._init_state(inj_tokens, inj_segs, inj_len, primer,
                             primer_len, target_bars, rng)

        def cond(s):
            return jnp.any(self._running(s)) & (s['iters'] < self._max_iters)

        s = jax.lax.while_loop(cond, self._body, s)
        return (s['out'], s['out_len'], s['status'], s['bars'],
                s['reanchors'], s['rejects'])

    def _run_chunk(self, s):
        """Run until a slot finishes AND at least ``serve_chunk_steps``
        device steps have elapsed (or nothing is left running).

        The minimum-steps floor bounds the host round-trips: every hand-back
        to the host costs a full relay dispatch latency plus the harvest
        readback and refill upload, and exiting on EVERY finish made serve()
        dispatch-bound (measured round 4: 96 jobs / 64 slots at 203
        songs/min vs 480 lockstep — ~24 s of a 28 s wall in dispatches).
        With the floor, a finished slot idles at most ``serve_chunk_steps``
        steps (its rows are frozen by the body's status masks) and the
        chunk count collapses to ~total_steps / floor."""
        entry = self._running(s)
        floor = jnp.int32(self.serve_chunk_steps)

        def cond(carry):
            st, i = carry
            run = self._running(st)
            return jnp.any(run) & (jnp.all(run == entry) | (i < floor))

        def body(carry):
            st, i = carry
            return self._body(st), i + 1

        s, _ = jax.lax.while_loop(cond, body, (s, jnp.int32(0)))
        return s

    def _reset_slot(self, s, slot, inj_tokens, inj_segs, inj_len, primer,
                    primer_len, target_bars):
        """Re-arm one slot with a fresh job (continuous batching refill).

        ``slot`` is traced — one compile serves every slot.  The Performer's
        FAVOR (S, z) state and the GPT-2 cache need no explicit clear:
        resetting ``t`` to 0 makes the element rebuild from position 0
        (Performer state entries are overwritten via the masked update from
        a zeroed read path; GPT-2 simply overwrites cache slots before
        attending to them)."""
        B = self.batch
        zi = jnp.zeros((), jnp.int32)
        out_row = jnp.zeros((self.max_events + 8,), jnp.int32)
        out_row = jax.lax.dynamic_update_slice(out_row, primer, (0,))
        upd = dict(
            inj_tokens=s['inj_tokens'].at[slot].set(inj_tokens),
            inj_segs=s['inj_segs'].at[slot].set(inj_segs),
            inj_len=s['inj_len'].at[slot].set(inj_len),
            primer=s['primer'].at[slot].set(primer),
            primer_len=s['primer_len'].at[slot].set(primer_len),
            target_bars=s['target_bars'].at[slot].set(target_bars),
            out=s['out'].at[slot].set(out_row),
            out_segs=s['out_segs'].at[slot].set(0),
            need_re=s['need_re'].at[slot].set(False),
            reanchors=s['reanchors'].at[slot].set(zi),
            logits=s['logits'].at[slot].set(0.0),
            t=s['t'].at[slot].set(zi),
            out_len=s['out_len'].at[slot].set(primer_len),
            mode=s['mode'].at[slot].set(MODE_INJECT),
            primer_pos=s['primer_pos'].at[slot].set(zi),
            in_primer=s['in_primer'].at[slot].set(True),
            bars=s['bars'].at[slot].set(zi),
            inj_pos=s['inj_pos'].at[slot].set(zi),
            cur_pos=s['cur_pos'].at[slot].set(zi),
            failed=s['failed'].at[slot].set(zi),
            rejects=s['rejects'].at[slot].set(zi),
            esteps=s['esteps'].at[slot].set(zi),
            status=s['status'].at[slot].set(STATUS_RUNNING),
        )
        if self.is_performer:
            # zero the slot's FAVOR (S, z): the masked update path ADDS to
            # the carried accumulators, so stale state must not leak into
            # the next job.  S/z are [n_layer, B, ...] — batch is axis 1.
            # (GPT-2 needs no clear: its cache positions >= the reset t=0
            # are overwritten before they are attended to.)
            keep = (jnp.arange(B) != slot).reshape((1, B))
            upd['state'] = jax.tree_util.tree_map(
                lambda a: a * keep.reshape(
                    (1, B) + (1,) * (a.ndim - 2)).astype(a.dtype), s['state'])
        return dict(s, **upd)

    def _idle_slot(self, s, slot):
        return dict(s, status=s['status'].at[slot].set(STATUS_IDLE))

    def _reset_slots(self, s, mask, idle_mask, inj_tokens, inj_segs,
                     inj_len, primer, primer_len, target_bars):
        """Masked batched refill: ONE dispatch re-arms every finished slot.

        ``mask``/``idle_mask`` [B] bool; the job arrays are full B-shaped
        (rows where ``mask`` is False are ignored).  Per-slot ``_reset_slot``
        calls cost one relay dispatch each — with tens of finishes per
        harvest that dominated serve() wall time (round-4 measurement); this
        folds a whole harvest's refills plus queue-exhausted idling into a
        single jitted update."""
        B = self.batch

        def w(field, new):
            cur = s[field]
            mm = mask.reshape((B,) + (1,) * (cur.ndim - 1))
            return jnp.where(mm, new, cur)

        zi = jnp.zeros((B,), jnp.int32)
        plen = primer_len.astype(jnp.int32)
        fresh_out = jnp.zeros((B, self.max_events + 8), jnp.int32)
        fresh_out = jax.lax.dynamic_update_slice(fresh_out, primer, (0, 0))
        upd = dict(
            inj_tokens=w('inj_tokens', inj_tokens),
            inj_segs=w('inj_segs', inj_segs),
            inj_len=w('inj_len', inj_len),
            primer=w('primer', primer),
            primer_len=w('primer_len', plen),
            target_bars=w('target_bars', target_bars),
            out=w('out', fresh_out),
            out_segs=w('out_segs', jnp.zeros_like(s['out_segs'])),
            need_re=w('need_re', jnp.zeros_like(s['need_re'])),
            reanchors=w('reanchors', zi),
            logits=w('logits', jnp.zeros_like(s['logits'])),
            t=w('t', zi),
            out_len=w('out_len', plen),
            mode=w('mode', jnp.full((B,), MODE_INJECT, jnp.int32)),
            primer_pos=w('primer_pos', zi),
            in_primer=w('in_primer', jnp.ones((B,), jnp.bool_)),
            bars=w('bars', zi),
            inj_pos=w('inj_pos', zi),
            cur_pos=w('cur_pos', zi),
            failed=w('failed', zi),
            rejects=w('rejects', zi),
            esteps=w('esteps', zi),
            status=jnp.where(mask, STATUS_RUNNING,
                             jnp.where(idle_mask, STATUS_IDLE, s['status'])),
        )
        if self.is_performer:
            # zero refilled slots' FAVOR (S, z): the masked update path ADDS
            # to the carried accumulators (batch is axis 1 of [n_layer,...])
            keep = ~mask
            upd['state'] = jax.tree_util.tree_map(
                lambda a: a * keep.reshape(
                    (1, B) + (1,) * (a.ndim - 2)).astype(a.dtype), s['state'])
        return dict(s, **upd)

    def _put_b(self, x):
        """Upload one B-leading array — batch-sharded over the mesh's data
        axes when serving multi-chip, plain ``jnp.asarray`` otherwise."""
        if self.mesh is None:
            return jnp.asarray(x)
        from ..parallel.mesh import batch_sharding
        return jax.device_put(np.asarray(x), batch_sharding(self.mesh))

    def _put_rng(self, key):
        if self.mesh is None:
            return key
        from ..parallel.mesh import replicated_sharding
        return jax.device_put(key, replicated_sharding(self.mesh))

    def _job_rows(self, inj_tokens, inj_segs, inj_len, primer_arr,
                  primer_len, target_bars, rows):
        """Gather B-shaped job arrays for ``_reset_slots`` (host-side numpy
        fancy-index; rows of unmasked slots are ignored by the where)."""
        r = np.asarray(rows)
        return (self._put_b(inj_tokens[r]), self._put_b(inj_segs[r]),
                self._put_b(inj_len[r]), self._put_b(primer_arr[r]),
                self._put_b(primer_len[r]), self._put_b(target_bars[r]))

    def _prep_jobs(self, primers, lead_sheet_bars, max_bars):
        """Pack N jobs into padded arrays [N, ...] (N need not equal B)."""
        N = len(primers)
        track_full = self.vocab.event2idx['Track_Full']
        track_lead = self.vocab.event2idx['Track_LeadSheet']

        # static injection-matrix shape so the loop compiles once per batch
        n_bars_max = self.max_bars
        assert max(len(bars) for bars in lead_sheet_bars) <= n_bars_max
        inj_tokens = np.zeros((N, n_bars_max, self.max_bar_tokens), np.int32)
        inj_segs = np.zeros((N, n_bars_max, self.max_bar_tokens), np.int32)
        inj_len = np.zeros((N, n_bars_max), np.int32)
        target_bars = np.zeros(N, np.int32)
        prim_rows = []
        for b, (primer, bars) in enumerate(zip(primers, lead_sheet_bars)):
            tb = len(bars) if max_bars is None else min(max_bars, len(bars))
            target_bars[b] = tb
            for k, bar in enumerate(bars):
                # injection row = [Track_LeadSheet]? no: the sampled
                # Track_LeadSheet opens the bar; inject bar events + Track_Full
                row = list(bar) + [track_full]
                if len(row) > self.max_bar_tokens:
                    raise ValueError(
                        f'lead-sheet bar {k} of element {b} has {len(bar)} '
                        f'tokens; bar + Track_Full terminator exceeds '
                        f'max_bar_tokens={self.max_bar_tokens} — raise '
                        f'max_bar_tokens (truncating would drop conditioning '
                        f'events and the Track_Full terminator)')
                inj_tokens[b, k, :len(row)] = row
                inj_segs[b, k, :len(row)] = [0] * (len(row) - 1) + [1]
                inj_len[b, k] = len(row)
            # the primer phase feeds primer + Track_LeadSheet, then bar 0
            # injection row follows; all appear in the output stream
            prim_rows.append(list(primer) + [track_lead])

        # static primer pad, bucketed to 16 to bound serve() recompiles
        pmax = max(16, -(-max(len(p) for p in prim_rows) // 16) * 16)
        primer_arr = np.zeros((N, pmax), np.int32)
        primer_len = np.zeros(N, np.int32)
        for b, p in enumerate(prim_rows):
            primer_arr[b, :len(p)] = p
            primer_len[b] = len(p)
        return (inj_tokens, inj_segs, inj_len, primer_arr, primer_len,
                target_bars)

    def generate(self, primers: Sequence[Sequence[int]],
                 lead_sheet_bars: Sequence[List[List[int]]], *,
                 seed: int = 0, max_bars: Optional[int] = None,
                 ) -> Tuple[List[List[int]], dict]:
        """primers: B token lists; lead_sheet_bars: B lists of per-bar token
        lists.  Returns B token streams (each dropping its final token, as
        the reference does)."""
        B = self.batch
        assert len(primers) == B and len(lead_sheet_bars) == B
        (inj_tokens, inj_segs, inj_len, primer_arr, primer_len,
         target_bars) = self._prep_jobs(primers, lead_sheet_bars, max_bars)

        t0 = time.time()
        args = (self._put_b(inj_tokens), self._put_b(inj_segs),
                self._put_b(inj_len), self._put_b(primer_arr),
                self._put_b(primer_len), self._put_b(target_bars),
                self._put_rng(jax.random.PRNGKey(seed)))
        resumed = 0
        if self._tier_loops is not None:
            # cache ladder: walk ascending tiers; each resume pads the k/v
            # buffers and continues the SAME carried loop state (streams are
            # bitwise the single-big-cache run's)
            s = self._tier_loops[0](*args)
            for tier in self._tier_resumes:
                status = np.asarray(s['status'])
                if not (status == STATUS_OVERFLOW).any():
                    break
                resumed += 1
                s = tier(s)
            out, out_len, status, bars, reanchors, rejects = (
                s['out'], s['out_len'], s['status'], s['bars'],
                s['reanchors'], s['rejects'])
        else:
            out, out_len, status, bars, reanchors, rejects = self._loop(*args)
        out = np.asarray(out)
        out_len = np.asarray(out_len)
        secs = time.time() - t0

        streams = []
        status_np = np.asarray(status)
        for b in range(B):
            toks = out[b, :out_len[b]].tolist()
            # reference semantics: a stuck model returns the full partial
            # stream; all other terminations drop the final token
            streams.append(toks if status_np[b] == STATUS_STUCK else toks[:-1])
        stats = {'seconds': secs, 'status': np.asarray(status).tolist(),
                 'bars': np.asarray(bars).tolist(),
                 'events': out_len.tolist(),
                 'reanchors': np.asarray(reanchors).tolist(),
                 'rejects': np.asarray(rejects).tolist(),
                 # ladder tier migrations this call (0 = never left tier 0
                 # or the ladder is off)
                 'tier_resumes': resumed}
        return streams, stats

    def serve(self, primers: Sequence[Sequence[int]],
              lead_sheet_bars: Sequence[List[List[int]]], *,
              seed: int = 0, max_bars: Optional[int] = None,
              ) -> Tuple[List[List[int]], dict]:
        """Continuous batching: N jobs stream through the B device slots.

        The lockstep ``generate`` waits for the LONGEST song in every wave —
        e2e measurements show songs finishing anywhere between tens and
        hundreds of events apart, so short songs idle their slot.  Here the
        compiled loop hands control back to the host the moment any slot's
        song terminates; the host harvests it and re-arms the slot with the
        next queued job via a tiny jitted in-place update (no recompile, no
        wave barrier).  The reference's serving loop processes one file at a
        time (``stage2_accompaniment/inference.py:422-485``); this replaces
        both that and round-3's lockstep waves.

        Same per-song semantics and sampling stream discipline as
        ``generate`` (each job consumes splits from the shared chain in slot
        completion order, so token streams differ from lockstep runs of the
        same seed — all are valid reference-semantics samples).

        Returns (streams, stats) in submission order; ``stats`` carries the
        per-job fields of ``generate`` plus ``wall_seconds`` and ``chunks``
        (host refill round-trips)."""
        N = len(primers)
        assert len(lead_sheet_bars) == N
        B = self.batch
        if N == 0:
            return [], {'wall_seconds': 0.0, 'chunks': 0, 'status': [],
                        'bars': [], 'events': [], 'reanchors': [],
                        'rejects': [], 'seconds': 0.0}
        (inj_tokens, inj_segs, inj_len, primer_arr, primer_len,
         target_bars) = self._prep_jobs(primers, lead_sheet_bars, max_bars)

        t0 = time.time()
        first = min(B, N)
        fill = list(range(first)) + [0] * (B - first)   # extras idled below
        s = self._initj(self._put_b(inj_tokens[fill]),
                        self._put_b(inj_segs[fill]),
                        self._put_b(inj_len[fill]),
                        self._put_b(primer_arr[fill]),
                        self._put_b(primer_len[fill]),
                        self._put_b(target_bars[fill]),
                        self._put_rng(jax.random.PRNGKey(seed)))
        slot_job: List[Optional[int]] = list(range(first)) + [None] * (B - first)
        if first < B:
            # one masked dispatch idles every unused slot
            idle0 = np.zeros(B, bool)
            idle0[first:] = True
            s = self._refill(s, self._put_b(np.zeros(B, bool)),
                             self._put_b(idle0),
                             *self._job_rows(inj_tokens, inj_segs, inj_len,
                                             primer_arr, primer_len,
                                             target_bars, [0] * B))
        next_job = first

        streams: List[Optional[List[int]]] = [None] * N
        status_out = [0] * N
        bars_out = [0] * N
        events_out = [0] * N
        reanchors_out = [0] * N
        rejects_out = [0] * N
        chunks = 0

        while True:
            status = np.asarray(s['status'])
            if not (status == STATUS_RUNNING).any():
                break
            s = self._chunk(s)
            chunks += 1
            status = np.asarray(s['status'])
            finished = [b for b in range(B)
                        if slot_job[b] is not None
                        and status[b] not in (STATUS_RUNNING, STATUS_IDLE)]
            if not finished:
                continue
            # harvest BEFORE re-arming: _refill donates s.  One bundled
            # device_get (not per-slot device slices, and not five separate
            # np.asarray round-trips: each readback pays relay latency)
            (out_np, out_len, bars_v, rean_v, rej_v) = jax.device_get(
                (s['out'], s['out_len'], s['bars'], s['reanchors'],
                 s['rejects']))
            for b in finished:
                j = slot_job[b]
                toks = out_np[b, :out_len[b]].tolist()
                # reference semantics: a stuck model returns the full
                # partial stream; others drop the final token
                streams[j] = toks if status[b] == STATUS_STUCK else toks[:-1]
                status_out[j] = int(status[b])
                bars_out[j] = int(bars_v[b])
                events_out[j] = int(out_len[b])
                reanchors_out[j] = int(rean_v[b])
                rejects_out[j] = int(rej_v[b])
            # one masked dispatch refills/idles the whole harvest
            mask = np.zeros(B, bool)
            idle = np.zeros(B, bool)
            rows = [0] * B
            for b in finished:
                if next_job < N:
                    mask[b] = True
                    rows[b] = next_job
                    slot_job[b] = next_job
                    next_job += 1
                else:
                    idle[b] = True
                    slot_job[b] = None
            s = self._refill(s, self._put_b(mask), self._put_b(idle),
                             *self._job_rows(inj_tokens, inj_segs, inj_len,
                                             primer_arr, primer_len,
                                             target_bars, rows))

        secs = time.time() - t0
        stats = {'seconds': secs, 'wall_seconds': secs, 'chunks': chunks,
                 'status': status_out, 'bars': bars_out,
                 'events': events_out, 'reanchors': reanchors_out,
                 'rejects': rejects_out}
        return streams, stats
