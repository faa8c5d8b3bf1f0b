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
                     max_klen: int, batch: int, full_attention: bool = True,
                     resume: bool = False, cache_layout: str = 'khd'):
    is_beat = jnp.asarray(tables.is_beat)
    beat_pos = jnp.asarray(tables.beat_pos)
    is_bar = jnp.asarray(tables.is_bar)
    is_pad = jnp.asarray(tables.is_pad)
    is_eos = jnp.asarray(tables.is_eos)
    is_key = jnp.asarray(tables.is_key)
    key_major = jnp.asarray(tables.key_major)

    sample_vp = jax.vmap(nucleus_sample, in_axes=(0, 0, 0, 0))

    def song(params, primer: jax.Array, primer_len: jax.Array,
             prompt_bars: jax.Array, target_bars: jax.Array,
             want_major: jax.Array, rng_or_state):
        """primer [B, P] (token matrix; single-emotion mode is P=1),
        primer_len/prompt_bars/target_bars/want_major [B].

        Prompt continuation (reference ``generate_plain_xl`` primer +
        prompt_bars, ``inference_utils.py:61-75``): primer tokens are
        teacher-forced before sampling begins.  Elements whose primer is
        shorter than the batch max re-feed their last primer token for the
        remaining iterations — identical cache semantics to a rejected
        sample (the reference also re-feeds the last token on rejects), so
        the shared lockstep write clock is preserved.

        ``resume`` builds the CONTINUATION tier of the tiered-Kmax decode:
        ``rng_or_state`` is the final carry of a smaller-Kmax loop whose
        elements hit STATUS_OVERFLOW.  The small cache is copied into the
        head of a fresh ``max_klen`` cache (unwritten slots are masked by
        the ``pos > t`` check in ``full_decode_attention``, so logits are
        Kmax-independent given the same history), overflowed elements flip
        back to RUNNING, and the while_loop continues with the carried rng
        stream — the two-tier composition is bitwise identical to running
        the large-Kmax loop alone, with no replayed iterations."""
        if resume:
            state = dict(rng_or_state)
            small = state['cache']
            cache = model.apply(params, batch, max_klen, cache_layout,
                                method=PlainTransformer.init_decode_cache)
            cache['k'] = jax.lax.dynamic_update_slice(
                cache['k'], small['k'], (0, 0, 0, 0, 0))
            cache['v'] = jax.lax.dynamic_update_slice(
                cache['v'], small['v'], (0, 0, 0, 0, 0))
            state['cache'] = cache
            state['status'] = jnp.where(state['status'] == STATUS_OVERFLOW,
                                        STATUS_RUNNING, state['status'])
        else:
            cache = model.apply(params, batch, max_klen, cache_layout,
                                method=PlainTransformer.init_decode_cache)
            out = jnp.zeros((batch, max_events + 8), dtype=jnp.int32)
            out = jax.lax.dynamic_update_slice(out, primer, (0, 0))
            pos0 = jnp.arange(max_events + 8)
            out = jnp.where(pos0[None, :] < primer_len[:, None], out, 0)

            state = dict(
                cache=cache,
                t=jnp.int32(0),
                last=primer[:, 0],
                fed=jnp.ones((batch,), jnp.int32),  # primer tokens consumed
                out=out,
                out_len=primer_len.astype(jnp.int32),
                bars=prompt_bars.astype(jnp.int32),
                cur_pos=jnp.zeros((batch,), jnp.int32),
                failed=jnp.zeros((batch,), jnp.int32),
                rejects=jnp.zeros((batch,), jnp.int32),
                iters=jnp.int32(0),
                status=jnp.full((batch,), STATUS_RUNNING, jnp.int32),
                rng=rng_or_state,
            )
        P = primer.shape[1]

        def running(s):
            return (s['status'] == STATUS_RUNNING) & (s['bars'] < target_bars)

        def cond(s):
            return jnp.any(running(s)) & (s['iters'] < max_iters)

        def body(s):
            # full_attention: the chunked flash decode's fori_loop composes
            # with this while_loop's carried output buffer into a program
            # the axon AOT helper cannot compile at batch >= 8 (SIGABRT /
            # timeout; bisected 2026-08) — the whole-cache einsum compiles
            # at any batch and unblocks B=16 stage-1 serving
            logits, cache = model.apply(params, s['last'], s['t'], s['cache'],
                                        full_attention=full_attention,
                                        layout=cache_layout,
                                        method=PlainTransformer.decode_step)
            t = s['t'] + 1
            rng, sub = jax.random.split(s['rng'])
            keys = jax.random.split(sub, batch)

            # elements still consuming their primer teacher-force the next
            # primer token; rules/bars/appends don't apply to them
            in_primer = s['fed'] < primer_len
            prim_next = primer[jnp.arange(batch),
                               jnp.minimum(s['fed'], P - 1)]

            key_step = (jnp.logical_and(functional, s['out_len'] == 1)
                        & ~in_primer)
            # ONE batched sort: the key step's (temp, top_p) regime is
            # selected per element instead of sampling twice and picking —
            # bit-identical (both former calls shared the same rng keys)
            t_eff = jnp.where(key_step, key_temp, temp)
            p_eff = jnp.where(key_step, key_top_p, top_p)
            w_samp = sample_vp(keys, logits, t_eff, p_eff)
            word = jnp.where(in_primer, prim_next, w_samp)

            key_ok = is_key[word] & (key_major[word] == want_major)
            reject_key = key_step & ~key_ok
            reject_beat = is_beat[word] & (beat_pos[word] < s['cur_pos']) & ~reject_key
            reject_pad = is_pad[word] & ~reject_key & ~reject_beat
            reject = (reject_key | reject_beat | reject_pad) & ~in_primer

            act = running(s)
            sampled = act & ~in_primer
            failed = jnp.where(sampled & reject_beat, s['failed'] + 1,
                               jnp.where(sampled & is_beat[word] & ~reject, 0,
                                         s['failed']))
            stuck = failed >= 256

            accept = sampled & ~reject
            fed = s['fed'] + (act & in_primer).astype(jnp.int32)
            idx = jnp.minimum(s['out_len'], max_events + 7)
            # one-hot where-update instead of a scatter: a batched scatter
            # in this while_loop body sends the axon AOT compile helper
            # into a pathological path at B>=8 (bisected 2026-08: scan and
            # the Performer loop tolerate the same scatter; here the
            # compile either times out or SIGABRTs).  The masked select
            # costs O(B * max_events) VPU work per step — negligible next
            # to the 12-layer forward.
            pos = jnp.arange(s['out'].shape[1])
            hit = (pos[None, :] == idx[:, None]) & accept[:, None]
            out = jnp.where(hit, word[:, None], s['out'])
            out_len = s['out_len'] + accept.astype(jnp.int32)
            bars = s['bars'] + (accept & is_bar[word]).astype(jnp.int32)
            cur_pos = jnp.where(accept & is_bar[word], 0,
                                jnp.where(accept & is_beat[word],
                                          beat_pos[word], s['cur_pos']))
            last = jnp.where(accept | (act & in_primer), word, s['last'])

            done = accept & (is_eos[word] | (out_len > max_events))
            overflow = t >= max_klen - 1
            status = jnp.where(act & stuck, STATUS_STUCK,
                               jnp.where(done, STATUS_DONE,
                                         jnp.where(act & overflow,
                                                   STATUS_OVERFLOW,
                                                   s['status'])))
            return dict(cache=cache, t=t, last=last, fed=fed, out=out,
                        out_len=out_len, bars=bars, cur_pos=cur_pos,
                        failed=failed,
                        rejects=s['rejects'] + (sampled
                                                & reject).astype(jnp.int32),
                        iters=s['iters'] + 1, status=status,
                        rng=rng)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(song)


class Stage1BatchGenerator:
    """Generate a batch of songs in one device call (emotion-token primers
    or full prompt-continuation primers)."""

    def __init__(self, model: PlainTransformer, params, vocab: Vocab, *,
                 batch: int = 8, temp: float = 1.2, top_p: float = 0.97,
                 max_events: int = 512, max_bars: int = 128,
                 functional: bool = True, reject_slack: int = 1024,
                 fast_slack: Optional[int] = 256,
                 tiers: Optional[List[int]] = None,
                 full_attention: bool = True,
                 cache_layout: Optional[str] = None,
                 mesh=None):
        """``full_attention=True`` (default) decodes with the whole-cache
        einsum — the compile-safe path on the axon AOT helper at B>=8 (see
        the loop-body comment).  ``False`` selects the chunked flash decode
        (prefix-proportional HBM reads; preferable where it compiles).

        ``fast_slack`` / ``tiers``: the whole-cache einsum costs O(Kmax)
        per step, and Kmax = max_events + reject_slack sizes for the
        WORST-case song — under trained weights rejects are near zero
        (measured ~0.01/token in BENCH_e2e vs ~1.3 under random weights)
        and most songs EOS well below the event budget, so almost every
        song fits a much smaller cache.  The loop therefore runs a LADDER
        of cache sizes: songs that outgrow one tier's cache CONTINUE —
        carried state incl. the rng stream, no replayed iterations,
        bitwise-identical streams — in the next tier's loop, up to the
        full Kmax.  Round-4 attribution at B=16: 2.6 ms vs 7.0 ms per
        loop step for Kmax 768 vs 1536.

        ``fast_slack=256`` (default) gives the ladder
        [max_events + 256, max_events + reject_slack]; ``None`` disables
        tiering.  ``tiers`` overrides with explicit intermediate Kmax
        values (values below max_events are legal — a spill mid-song or
        even mid-primer just continues in the next tier; useful when the
        expected song length sits far below the event budget, e.g. the
        2400-event full_song mode where most songs EOS under 600).  Each
        tier's loop compiles lazily on first use.

        ``cache_layout``: ``'khd'`` ([B, Kmax, H, Dh] caches), ``'dk'``
        (K-in-lanes [B, H, Dh, Kmax] — avoids the 4x TPU tile padding on
        the whole-cache einsum's per-step reads), or ``'hkd'``
        ([B, H, Kmax, Dh] hedge — sublane-offset writes, 2x read padding;
        see ``ops.attention.full_decode_attention``).  Token streams agree
        up to reduction-order rounding (tested).  Defaults to the
        ``EMODIS_S1_CACHE_LAYOUT`` env var, else ``'khd'``."""
        import os as _os
        if cache_layout is None:
            cache_layout = _os.environ.get('EMODIS_S1_CACHE_LAYOUT', 'khd')
        assert cache_layout in ('khd', 'dk', 'hkd'), cache_layout
        # Multi-chip serving (the stage-2 design, stage2_batch.py): with a
        # >1-device mesh every B-leading input is committed batch-sharded
        # over the mesh data axes and the ONE compiled loop runs SPMD; the
        # per-element math is unchanged, so streams are bit-identical to
        # the 1-device run (tests/test_multichip_serving.py).  The
        # reference generates single-GPU one song at a time
        # (stage1_compose/inference.py:200-294).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            dp = (self.mesh.shape.get('dp', 1)
                  * self.mesh.shape.get('dcn', 1))
            if batch % dp:
                raise ValueError(
                    f'batch={batch} not divisible by the mesh data axes '
                    f'(dp*dcn={dp})')
        self.model = model
        self.params = params
        self.vocab = vocab
        self.batch = batch
        self.max_bars = max_bars
        self.max_events = max_events
        self.tables = build_rule_tables(vocab)
        full_klen = max_events + reject_slack
        # serve() machinery (continuous batching) builds lazily on first use
        self._full_klen = full_klen
        self._temp = temp
        self._top_p = top_p
        self._functional = functional
        self._serve_parts = None
        self._serve_chunk = None
        self._cache_layout = cache_layout
        if tiers is None:
            tiers = ([max_events + fast_slack]
                     if fast_slack is not None and fast_slack < reject_slack
                     else [])
        klens = sorted({int(k) for k in tiers if 0 < k < full_klen})
        klens.append(full_klen)
        common = dict(temp=temp, top_p=top_p, key_temp=1.1, key_top_p=0.97,
                      max_events=max_events, functional=functional,
                      max_iters=max_events * 2 + 2048, batch=batch,
                      full_attention=full_attention,
                      cache_layout=cache_layout)
        self._song = _make_batch_loop(model, self.tables, max_klen=klens[0],
                                      **common)
        self._resumes = [_make_batch_loop(model, self.tables, max_klen=k,
                                          resume=True, **common)
                         for k in klens[1:]]
        # back-compat alias used by tests/benches to detect tiering
        self._resume = self._resumes[0] if self._resumes else None

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

    def generate(self, emotions: List[str], seed: int = 0,
                 target_bars=None,
                 primers: Optional[List[List[str]]] = None,
                 prompt_bars: Optional[List[int]] = None,
                 ) -> Tuple[List[Optional[List[str]]], dict]:
        """``primers``: optional per-element event lists for prompt
        continuation (each should start with its Emotion token; reference
        ``generate_plain_xl`` primer + prompt_bars mode).  Without them each
        element's primer is just its emotion token.  Primer lengths are
        padded to the batch max (bucketed to 64 to bound recompiles)."""
        assert len(emotions) == self.batch
        if primers is None:
            prim_rows = [[self.vocab.event2idx['Emotion_{}'.format(e)]]
                         for e in emotions]
            pb = np.zeros(self.batch, np.int32)
        else:
            assert len(primers) == self.batch
            prim_rows = [self.vocab.encode(p) for p in primers]
            # default: bar counter starts at (Bar_None count - 1), the
            # reference convention — get_leadsheet_prompt's primer carries
            # prompt_n_bars + 1 bar tokens while generate_plain_xl starts
            # generated_bars at prompt_n_bars (inference.py:35-38,
            # inference_utils.py:57-60)
            pb = np.asarray(prompt_bars if prompt_bars is not None
                            else [max(0, sum(1 for e in p if e == 'Bar_None')
                                      - 1)
                                  for p in primers], np.int32)
        longest = max(len(p) for p in prim_rows)
        assert longest <= self.max_events, 'primer longer than max_events'
        # bucket to 64 to bound recompiles, but never wider than the output
        # buffer (max_events + 8) that the primer is written into
        P = 1 if longest == 1 else min(-(-longest // 64) * 64,
                                       self.max_events + 8)
        prim = np.zeros((self.batch, P), np.int32)
        plen = np.zeros(self.batch, np.int32)
        for b, row in enumerate(prim_rows):
            prim[b, :len(row)] = row
            # short rows re-feed their final token (reject-equivalent)
            prim[b, len(row):] = row[-1]
            plen[b] = len(row)
        want = self._put_b(np.asarray([emotion_wants_major(e)
                                       for e in emotions]))
        if isinstance(target_bars, (list, tuple, np.ndarray)):
            tb = self._put_b(np.minimum(np.asarray(target_bars, np.int32),
                                        self.max_bars))
        else:
            tb = self._put_b(np.full((self.batch,),
                                     target_bars or self.max_bars, np.int32))

        t0 = time.time()
        args = (self.params, self._put_b(prim), self._put_b(plen),
                self._put_b(pb), tb, want)
        s = self._song(*args, self._put_rng(jax.random.PRNGKey(seed)))
        status = np.asarray(s['status'])
        resumed = 0
        for tier in self._resumes:
            # walk the ladder: songs that outgrew the previous tier's cache
            # CONTINUE at the next Kmax from carried state (bitwise-identical
            # to a single big-cache run); stop as soon as nothing spilled
            if not (status == STATUS_OVERFLOW).any():
                break
            resumed += int((status == STATUS_OVERFLOW).sum())
            s = tier(*args, s)
            status = np.asarray(s['status'])
        out = np.asarray(s['out'])
        out_len = np.asarray(s['out_len'])
        bars, rejects = s['bars'], s['rejects']
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
                 'events': out_len.tolist(),
                 'rejects': np.asarray(rejects).tolist(),
                 # songs that outgrew the fast cache and continued in the
                 # full-Kmax tier (0 when tiering is off or nothing spilled)
                 'resumed': resumed,
                 # TOTAL device loop iterations across all ladder tiers
                 # (iters rides the carry through resumes).  Lockstep runs
                 # as many iterations as the SLOWEST element needs; mean
                 # per-element productive steps understate per-iteration
                 # cost by the idle tail (bench_s1_attrib divides by this)
                 'iters': int(s['iters'])}
        return songs, stats

    def serve(self, emotions: List[str], *, seed: int = 0,
              target_bars=None, chunk_steps: int = 128,
              primers: Optional[List[List[str]]] = None,
              prompt_bars: Optional[List[int]] = None,
              ) -> Tuple[List[Optional[List[str]]], dict]:
        """Continuous batching: N jobs stream through the B device slots
        (the stage-2 ``serve`` design, adapted to stage 1's cache decode).
        ``primers``/``prompt_bars`` enable prompt-continuation jobs with
        the same conventions as :meth:`generate` (N rows, padded to a
        shared bucketed width; a new width retraces the serve jits once).

        The lockstep ``generate`` idles finished slots until the slowest
        song is done — measured idle_frac 0.47 at B=16 under worst-case
        random-weight rejection (BENCH_s1_attrib_r04).  Here the compiled
        loop decodes with PER-ELEMENT cache clocks
        (``PlainTransformer.decode_step_pe``), hands control back to the
        host after a finish once at least ``chunk_steps`` device steps have
        elapsed (bounding relay round-trips), and each harvest re-arms all
        finished slots in ONE masked dispatch.

        Sampling stream discipline matches ``generate`` (a shared rng chain
        split once per device step); token streams differ from lockstep
        runs of the same seed — all are valid reference-semantics samples.
        Returns (songs, stats) in submission order; stats carries the
        per-job fields of ``generate`` plus ``chunks``.  serve uses the
        full Kmax directly (no cache ladder): a spilled song's OVERFLOW is
        terminal, exactly like a ladder-less ``generate``."""
        N = len(emotions)
        B = self.batch
        if N == 0:
            return [], {'seconds': 0.0, 'chunks': 0, 'status': [],
                        'bars': [], 'events': [], 'rejects': [],
                        'resumed': 0}
        if self._serve_parts is None or self._serve_chunk != chunk_steps:
            full_klen = self._full_klen
            self._serve_parts = _make_serve_parts(
                self.model, self.tables, temp=self._temp, top_p=self._top_p,
                key_temp=1.1, key_top_p=0.97, max_events=self.max_events,
                functional=self._functional,
                max_iters=self.max_events * 2 + 2048, max_klen=full_klen,
                batch=B, chunk_steps=chunk_steps,
                cache_layout=self._cache_layout)
            self._serve_chunk = chunk_steps
        init_j, chunk_j, refill_j = self._serve_parts

        if primers is None:
            prim = np.asarray([[self.vocab.event2idx['Emotion_{}'.format(e)]]
                               for e in emotions], np.int32)   # [N, 1]
            plen = np.ones(N, np.int32)
            pb = np.zeros(N, np.int32)
        else:
            assert len(primers) == N
            prim_rows = [self.vocab.encode(p) for p in primers]
            pb = np.asarray(prompt_bars if prompt_bars is not None
                            else [max(0, sum(1 for e in p if e == 'Bar_None')
                                      - 1)
                                  for p in primers], np.int32)
            longest = max(len(p) for p in prim_rows)
            assert longest <= self.max_events, 'primer longer than max_events'
            P = 1 if longest == 1 else min(-(-longest // 64) * 64,
                                           self.max_events + 8)
            prim = np.zeros((N, P), np.int32)
            plen = np.zeros(N, np.int32)
            for b, row in enumerate(prim_rows):
                prim[b, :len(row)] = row
                prim[b, len(row):] = row[-1]
                plen[b] = len(row)
        want = np.asarray([emotion_wants_major(e) for e in emotions])
        if isinstance(target_bars, (list, tuple, np.ndarray)):
            tb = np.minimum(np.asarray(target_bars, np.int32), self.max_bars)
        else:
            tb = np.full(N, target_bars or self.max_bars, np.int32)

        def rows(r):
            r = np.asarray(r)
            return (self._put_b(prim[r]), self._put_b(plen[r]),
                    self._put_b(pb[r]), self._put_b(tb[r]),
                    self._put_b(want[r]))

        t0 = time.time()
        first = min(B, N)
        fill = list(range(first)) + [0] * (B - first)
        s = init_j(self.params, *rows(fill),
                   self._put_rng(jax.random.PRNGKey(seed)))
        slot_job: List[Optional[int]] = (list(range(first))
                                         + [None] * (B - first))
        if first < B:
            idle0 = np.zeros(B, bool)
            idle0[first:] = True
            s = refill_j(s, self._put_b(np.zeros(B, bool)),
                         self._put_b(idle0), *rows([0] * B))
        next_job = first

        songs_tok: List[Optional[List[int]]] = [None] * N
        st_out = [0] * N
        bars_out = [0] * N
        ev_out = [0] * N
        rej_out = [0] * N
        chunks = 0

        def finished_mask(status, bars, tgt):
            return ((status != STATUS_RUNNING) & (status != STATUS_IDLE)) \
                | ((status == STATUS_RUNNING) & (bars >= tgt))

        while True:
            status = np.asarray(s['status'])
            bars_v = np.asarray(s['bars'])
            tgt_v = np.asarray(s['target_bars'])
            live = (status == STATUS_RUNNING) & (bars_v < tgt_v)
            if not live.any():
                pass  # fall through: harvest whatever remains, then exit
            else:
                s = chunk_j(self.params, s)
                chunks += 1
                status = np.asarray(s['status'])
                bars_v = np.asarray(s['bars'])
                tgt_v = np.asarray(s['target_bars'])
            fin = [b for b in range(B)
                   if slot_job[b] is not None
                   and finished_mask(status[b:b + 1], bars_v[b:b + 1],
                                     tgt_v[b:b + 1])[0]]
            if not fin:
                if not ((status == STATUS_RUNNING)
                        & (bars_v < tgt_v)).any():
                    break
                continue
            out_np, out_len, rej_v = jax.device_get(
                (s['out'], s['out_len'], s['rejects']))
            for b in fin:
                j = slot_job[b]
                st_out[j] = int(status[b])
                bars_out[j] = int(bars_v[b])
                ev_out[j] = int(out_len[b])
                rej_out[j] = int(rej_v[b])
                songs_tok[j] = (None if status[b] == STATUS_STUCK
                                else out_np[b, :out_len[b]].tolist())
            mask = np.zeros(B, bool)
            idle = np.zeros(B, bool)
            fill_rows = [0] * B
            for b in fin:
                if next_job < N:
                    mask[b] = True
                    fill_rows[b] = next_job
                    slot_job[b] = next_job
                    next_job += 1
                else:
                    idle[b] = True
                    slot_job[b] = None
            s = refill_j(s, self._put_b(mask), self._put_b(idle),
                         *rows(fill_rows))

        secs = time.time() - t0
        songs: List[Optional[List[str]]] = []
        for toks in songs_tok:
            songs.append(None if toks is None
                         else self.vocab.decode(toks[:-1]))
        stats = {'seconds': secs, 'chunks': chunks, 'status': st_out,
                 'bars': bars_out, 'events': ev_out, 'rejects': rej_out,
                 'resumed': 0}
        return songs, stats


STATUS_IDLE = 4          # serve(): slot has no job (queue exhausted)


def _make_serve_parts(model: PlainTransformer, tables, *, temp: float,
                      top_p: float, key_temp: float, key_top_p: float,
                      max_events: int, functional: bool, max_iters: int,
                      max_klen: int, batch: int, chunk_steps: int,
                      cache_layout: str = 'khd'):
    """Compiled pieces of stage-1 CONTINUOUS BATCHING.

    The lockstep loop shares ONE cache write clock (every element appends
    at the same ``t`` — the reference's retry semantics make that legal),
    which is also why it cannot refill a finished slot mid-flight: a fresh
    song needs ``t = 0`` while its neighbours are at ``t = 500``.  serve()
    therefore decodes with the PER-ELEMENT-clock step
    (``PlainTransformer.decode_step_pe`` — bitwise the shared-clock step at
    uniform ``t``) and keeps every per-job field in the carry so a single
    masked dispatch can re-arm harvested slots (the stage-2 serve design,
    ``stage2_batch._reset_slots``).

    Returns (init_j, chunk_j, refill_j):
      init_j(params, primer, primer_len, prompt_bars, target_bars,
             want_major, rng) -> state
      chunk_j(params, state) -> state    # >= chunk_steps, exit on finish
      refill_j(state, mask, idle_mask, primer, primer_len, prompt_bars,
               target_bars, want_major) -> state
    """
    is_beat = jnp.asarray(tables.is_beat)
    beat_pos = jnp.asarray(tables.beat_pos)
    is_bar = jnp.asarray(tables.is_bar)
    is_eos = jnp.asarray(tables.is_eos)
    is_pad = jnp.asarray(tables.is_pad)
    is_key = jnp.asarray(tables.is_key)
    key_major = jnp.asarray(tables.key_major)
    sample_vp = jax.vmap(nucleus_sample, in_axes=(0, 0, 0, 0))
    E = max_events + 8

    def fresh_rows(primer, primer_len):
        out = jnp.zeros((batch, E), jnp.int32)
        out = jax.lax.dynamic_update_slice(out, primer, (0, 0))
        pos0 = jnp.arange(E)
        return jnp.where(pos0[None, :] < primer_len[:, None], out, 0)

    def init(params, primer, primer_len, prompt_bars, target_bars,
             want_major, rng):
        cache = model.apply(params, batch, max_klen, cache_layout,
                            method=PlainTransformer.init_decode_cache)
        return dict(
            cache=cache,
            t=jnp.zeros((batch,), jnp.int32),
            last=primer[:, 0],
            fed=jnp.ones((batch,), jnp.int32),
            out=fresh_rows(primer, primer_len),
            out_len=primer_len.astype(jnp.int32),
            bars=prompt_bars.astype(jnp.int32),
            cur_pos=jnp.zeros((batch,), jnp.int32),
            failed=jnp.zeros((batch,), jnp.int32),
            rejects=jnp.zeros((batch,), jnp.int32),
            esteps=jnp.zeros((batch,), jnp.int32),
            status=jnp.full((batch,), STATUS_RUNNING, jnp.int32),
            rng=rng,
            # job fields ride the carry so refills are one masked update
            primer=primer, primer_len=primer_len.astype(jnp.int32),
            target_bars=target_bars.astype(jnp.int32),
            want_major=want_major,
        )

    def running(s):
        return (s['status'] == STATUS_RUNNING) & (s['bars'] < s['target_bars'])

    def body(s):
        P = s['primer'].shape[1]
        logits, cache = model.apply(params_ref[0], s['last'], s['t'],
                                    s['cache'], layout=cache_layout,
                                    method=PlainTransformer.decode_step_pe)
        t = s['t'] + 1
        rng, sub = jax.random.split(s['rng'])
        keys = jax.random.split(sub, batch)

        in_primer = s['fed'] < s['primer_len']
        prim_next = s['primer'][jnp.arange(batch),
                                jnp.minimum(s['fed'], P - 1)]
        key_step = (jnp.logical_and(functional, s['out_len'] == 1)
                    & ~in_primer)
        t_eff = jnp.where(key_step, key_temp, temp)
        p_eff = jnp.where(key_step, key_top_p, top_p)
        w_samp = sample_vp(keys, logits, t_eff, p_eff)
        word = jnp.where(in_primer, prim_next, w_samp)

        key_ok = is_key[word] & (key_major[word] == s['want_major'])
        reject_key = key_step & ~key_ok
        reject_beat = (is_beat[word] & (beat_pos[word] < s['cur_pos'])
                       & ~reject_key)
        reject_pad = is_pad[word] & ~reject_key & ~reject_beat
        reject = (reject_key | reject_beat | reject_pad) & ~in_primer

        act = running(s)
        sampled = act & ~in_primer
        failed = jnp.where(sampled & reject_beat, s['failed'] + 1,
                           jnp.where(sampled & is_beat[word] & ~reject, 0,
                                     s['failed']))
        stuck = failed >= 256

        accept = sampled & ~reject
        fed = s['fed'] + (act & in_primer).astype(jnp.int32)
        idx = jnp.minimum(s['out_len'], E - 1)
        pos = jnp.arange(E)
        hit = (pos[None, :] == idx[:, None]) & accept[:, None]
        out = jnp.where(hit, word[:, None], s['out'])
        out_len = s['out_len'] + accept.astype(jnp.int32)
        bars = s['bars'] + (accept & is_bar[word]).astype(jnp.int32)
        cur_pos = jnp.where(accept & is_bar[word], 0,
                            jnp.where(accept & is_beat[word],
                                      beat_pos[word], s['cur_pos']))
        last = jnp.where(accept | (act & in_primer), word, s['last'])

        done = accept & (is_eos[word] | (out_len > max_events))
        overflow = t >= max_klen - 1
        esteps = s['esteps'] + act.astype(jnp.int32)
        status = jnp.where(act & (stuck | (esteps >= max_iters)),
                           STATUS_STUCK,
                           jnp.where(done, STATUS_DONE,
                                     jnp.where(act & overflow,
                                               STATUS_OVERFLOW,
                                               s['status'])))
        return dict(s, cache=cache, t=t, last=last, fed=fed, out=out,
                    out_len=out_len, bars=bars, cur_pos=cur_pos,
                    failed=failed,
                    rejects=s['rejects'] + (sampled
                                            & reject).astype(jnp.int32),
                    esteps=esteps, status=status, rng=rng)

    # params can't close over a traced jit arg from body(); thread it via a
    # one-element list the chunk wrapper fills before tracing
    params_ref = [None]

    def chunk(params, s):
        params_ref[0] = params
        entry = running(s)
        floor = jnp.int32(chunk_steps)

        def cond(carry):
            st, i = carry
            run = running(st)
            return jnp.any(run) & (jnp.all(run == entry) | (i < floor))

        def step(carry):
            st, i = carry
            return body(st), i + 1

        s, _ = jax.lax.while_loop(cond, step, (s, jnp.int32(0)))
        return s

    def refill(s, mask, idle_mask, primer, primer_len, prompt_bars,
               target_bars, want_major):
        plen = primer_len.astype(jnp.int32)

        def w(field, new):
            cur = s[field]
            mm = mask.reshape((batch,) + (1,) * (cur.ndim - 1))
            return jnp.where(mm, new, cur)

        zi = jnp.zeros((batch,), jnp.int32)
        upd = dict(
            t=w('t', zi),
            last=w('last', primer[:, 0]),
            fed=w('fed', jnp.ones((batch,), jnp.int32)),
            out=w('out', fresh_rows(primer, plen)),
            out_len=w('out_len', plen),
            bars=w('bars', prompt_bars.astype(jnp.int32)),
            cur_pos=w('cur_pos', zi),
            failed=w('failed', zi),
            rejects=w('rejects', zi),
            esteps=w('esteps', zi),
            status=jnp.where(mask, STATUS_RUNNING,
                             jnp.where(idle_mask, STATUS_IDLE, s['status'])),
            primer=w('primer', primer),
            primer_len=w('primer_len', plen),
            target_bars=w('target_bars', target_bars.astype(jnp.int32)),
            want_major=w('want_major', want_major),
        )
        # the cache needs no clear: decode_step_pe masks positions > t[b],
        # so a refilled slot's stale prefix is invisible from t = 0
        return dict(s, **upd)

    return (jax.jit(init), jax.jit(chunk, donate_argnums=1),
            jax.jit(refill, donate_argnums=0))
