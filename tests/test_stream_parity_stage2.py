"""Stage-2 event-stream parity against the ACTUAL reference decode code.

The reference's real ``generate_conditional``
(``stage2_accompaniment/inference.py:229-327``) runs with its real
``MusicGPT2`` backbone (HF GPT2Blocks forced to eager attention — the only
change needed under HF 4.57; the math is the 4.28 semantics our converter is
validated against).  The same random weights converted to flax run
:func:`infer.reference_exact.generate_stage2_reference_exact` — KV-cache
decode + exact numpy sampling.  With ``np.random.seed`` fixed identically,
streams must match token-for-token: teacher-forced per-bar lead-sheet
injection, seg accounting, beat-monotonicity rejection, PAD/early-EOS skips,
the 256-strike stuck exit, and the sliding-window regime are all covered.
"""

import numpy as np
import pytest

import ref_loader

torch = pytest.importorskip('torch')

from emo_disentanger_tpu.core.vocab import Vocab
from emo_disentanger_tpu.models import MusicGPT2
from emo_disentanger_tpu.train.convert_pt import convert_gpt2_pt
from emo_disentanger_tpu.infer.reference_exact import (
    generate_stage2_reference_exact,
)

pytestmark = pytest.mark.skipif(not ref_loader.available(),
                                reason='reference repo not mounted')


def _vocab():
    events = ['Emotion_Q1', 'Emotion_Q2', 'Emotion_Q3', 'Emotion_Q4',
              'Key_C', 'Key_c', 'Tempo_90', 'Tempo_110', 'Tempo_130',
              'Tempo_160', 'Track_LeadSheet', 'Track_Full',
              'Bar_None', 'EOS_None', 'PAD_None',
              'Chord_I_M', 'Chord_V_7', 'Chord_None_None',
              'Note_Octave_4', 'Note_Octave_5', 'Note_Degree_I',
              'Note_Degree_V', 'Note_Duration_480', 'Note_Duration_960',
              'Note_Pitch_60', 'Note_Pitch_64', 'Note_Pitch_67',
              'Note_Velocity_16', 'Note_Velocity_20']
    events += ['Beat_{}'.format(b) for b in range(16)]
    events = sorted(set(events))
    return Vocab({e: i for i, e in enumerate(events)},
                 {i: e for i, e in enumerate(events)})


def _lead_sheet(vocab, n_bars=3):
    bars = []
    for b in range(n_bars):
        evs = ['Bar_None', 'Beat_0', 'Chord_I_M' if b % 2 == 0 else 'Chord_V_7',
               'Note_Octave_5', 'Note_Degree_I', 'Note_Duration_480']
        bars.append([vocab.event2idx[e] for e in evs])
    return bars


def _make_pair(tmp_path, vocab, out_scale=60.0, seed=13):
    """Random-weight reference MusicGPT2 (real module, eager blocks) + the
    converted flax params."""
    m = ref_loader.load_stage2_gpt2_eager()
    torch.manual_seed(seed)
    ref_model = m.music_gpt2.MusicGPT2(
        n_token=vocab.size, n_layer=2, n_head=2, d_model=32, d_ff=64,
        d_embed=32, dropout=0.0, use_segment_emb=True, n_segment_types=2)
    # sharpen the output distribution: flat random-weight logits crash the
    # reference's nucleus on its single-True edge (np.where(after)[0][1])
    with torch.no_grad():
        ref_model.dec_out_proj.weight.mul_(out_scale)
    ref_model.eval()
    path = str(tmp_path / 'g2.pt')
    torch.save(ref_model.state_dict(), path)

    model = MusicGPT2(n_token=vocab.size, n_layer=2, n_head=2, d_model=32,
                      d_ff=64, d_embed=32, dropout=0.0,
                      use_segment_emb=True, n_segment_types=2)
    params = convert_gpt2_pt(path, n_layer=2)
    return ref_model, model, params


def _run_both(ref_inf, ref_model, model, params, vocab, seed, *,
              n_bars=3, max_events=220, temp=1.2, top_p=0.97,
              inadmissibles=None, window=2048):
    lead = _lead_sheet(vocab, n_bars)
    primer = [vocab.event2idx[e]
              for e in ('Emotion_Q1', 'Key_C', 'Tempo_110')]

    np.random.seed(seed)
    with torch.no_grad():
        ref_stream = ref_inf.generate_conditional(
            ref_model, vocab.event2idx, vocab.idx2event,
            [list(b) for b in lead], list(primer),
            max_events=max_events, max_bars=n_bars, temp=temp, top_p=top_p,
            inadmissibles=(None if inadmissibles is None
                           else np.array(inadmissibles)),
            model_type='gpt2')

    np.random.seed(seed)
    ours, _ = generate_stage2_reference_exact(
        model, params, vocab, lead_sheet_events=[list(b) for b in lead],
        primer=list(primer), max_events=max_events, max_bars=n_bars,
        temp=temp, top_p=top_p,
        inadmissibles=(None if inadmissibles is None
                       else np.array(inadmissibles)),
        window=window)
    return list(ref_stream), ours


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_stage2_stream_bit_parity(seed, tmp_path):
    vocab = _vocab()
    ref_model, model, params = _make_pair(tmp_path, vocab)
    ref_inf = ref_loader.load_stage2_inference()
    ref_stream, ours = _run_both(ref_inf, ref_model, model, params, vocab,
                                 seed)
    assert ours == ref_stream, (vocab.decode(ours)[-12:],
                                vocab.decode(ref_stream)[-12:])


def test_stage2_stream_parity_window_slide(tmp_path):
    """The sliding-window regime (len >= max_dec_inp_len): shrink the
    reference's module-global window to 48 so the slide engages within a
    short generation, and replay with the same window."""
    vocab = _vocab()
    ref_model, model, params = _make_pair(tmp_path, vocab)
    ref_inf = ref_loader.load_stage2_inference()
    saved = ref_inf.max_dec_inp_len
    try:
        ref_inf.max_dec_inp_len = 48
        ref_stream, ours = _run_both(ref_inf, ref_model, model, params,
                                     vocab, seed=5, n_bars=4,
                                     max_events=260, window=48)
    finally:
        ref_inf.max_dec_inp_len = saved
    # the run must actually have outgrown the window for this to test
    # anything
    assert len(ref_stream) > 48
    assert ours == ref_stream, (vocab.decode(ours)[-12:],
                                vocab.decode(ref_stream)[-12:])


def test_stage2_stream_parity_inadmissible_tempo(tmp_path):
    """The inadmissible-tempo mask path (construct_inadmissible_set +
    in-place -inf in temperature, inference.py:60-86)."""
    vocab = _vocab()
    ref_model, model, params = _make_pair(tmp_path, vocab)
    ref_inf = ref_loader.load_stage2_inference()
    inad = ref_inf.construct_inadmissible_set(110, vocab.event2idx,
                                              tolerance=20)
    assert len(inad) > 0                     # Tempo_90/130/160 in-vocab...
    assert vocab.event2idx['Tempo_160'] in inad
    assert vocab.event2idx['Tempo_110'] not in inad
    ref_stream, ours = _run_both(ref_inf, ref_model, model, params, vocab,
                                 seed=1, inadmissibles=list(inad))
    assert ours == ref_stream
    # masked tempi can never be sampled into the full track
    for t in inad:
        assert t not in ours[3:]


def test_stage2_generate_conditional_loop_vs_ref_multi_seed(tmp_path):
    """Aggregate: across additional seeds the streams stay token-exact
    (documents the observed agreement rate like stage-1's 15/16; any
    divergent seed would be fp32 near-tie rank swaps, but none were
    observed on seeds 0..9 at this scale)."""
    vocab = _vocab()
    ref_model, model, params = _make_pair(tmp_path, vocab)
    ref_inf = ref_loader.load_stage2_inference()
    agree = 0
    total = 0
    for seed in range(4, 10):
        ref_stream, ours = _run_both(ref_inf, ref_model, model, params,
                                     vocab, seed, n_bars=2, max_events=160)
        total += 1
        agree += int(ours == ref_stream)
    assert agree == total, f'{agree}/{total} seeds token-exact'
