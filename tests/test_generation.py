"""End-to-end generation tests with tiny random-weight models: the decode
loops must terminate, respect the rule tables, and be seed-deterministic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emo_disentanger_tpu.core.vocab import Vocab
from emo_disentanger_tpu.models import PlainTransformer, MusicPerformer, MusicGPT2
from emo_disentanger_tpu.infer.stage1 import Stage1Generator, STATUS_STUCK
from emo_disentanger_tpu.infer.stage2 import Stage2Generator
from emo_disentanger_tpu.infer.pipeline import (
    roman_events_to_absolute, extract_midi_events_from_generation,
    emotion_candidates_for_file,
)
from emo_disentanger_tpu.infer.convert2midi import events_to_midi


def tiny_vocab():
    events = ['Emotion_Positive', 'Emotion_Negative', 'Emotion_Q1',
              'Key_C', 'Key_c', 'Key_G',
              'Bar_None', 'EOS_None',
              'Track_LeadSheet', 'Track_Full',
              'Tempo_110',
              'Chord_I_M', 'Chord_V_7', 'Chord_None_None']
    events += ['Beat_{}'.format(b) for b in range(16)]
    events += ['Note_Octave_5', 'Note_Degree_I', 'Note_Degree_V',
               'Note_Duration_480', 'Note_Velocity_64']
    events = sorted(set(events))
    e2i = {e: i for i, e in enumerate(events)}
    i2e = {i: e for i, e in enumerate(events)}
    return Vocab(e2i, i2e)


@pytest.fixture(scope='module')
def vocab():
    return tiny_vocab()


SMALL = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32, dropout=0.0)


def test_stage1_generation_terminates_and_rules_hold(vocab):
    model = PlainTransformer(vocab_size=vocab.size, **SMALL)
    toks = jnp.ones((1, 8), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)

    gen = Stage1Generator(model, params, vocab, temp=1.2, top_p=0.97,
                          max_events=48, max_bars=4, functional=True,
                          reject_slack=256)
    events, stats = gen.generate('Positive', seed=3)
    assert stats['status'] != 0 or stats['bars'] >= 4 or stats['n_events'] >= 48
    if events is not None:
        assert events[0] == 'Emotion_Positive'
        # functional key rule: 2nd token is a MAJOR key for Positive
        assert events[1].startswith('Key_')
        assert events[1].split('_')[1] in ('C', 'G')
        # beat positions never decrease within a bar
        cur = 0
        for e in events[2:]:
            if e == 'Bar_None':
                cur = 0
            elif e.startswith('Beat_'):
                pos = int(e.split('_')[1])
                assert pos >= cur
                cur = pos
        assert 'PAD_None' not in events


def test_stage1_deterministic_under_seed(vocab):
    model = PlainTransformer(vocab_size=vocab.size, **SMALL)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), dtype=jnp.int32))
    gen = Stage1Generator(model, params, vocab, temp=1.2, top_p=0.97,
                          max_events=32, max_bars=3, functional=True,
                          reject_slack=128)
    a, _ = gen.generate('Negative', seed=11)
    b, _ = gen.generate('Negative', seed=11)
    c, _ = gen.generate('Negative', seed=12)
    assert a == b
    assert a is None or c is None or isinstance(c, list)


def _lead_bars(vocab, n=3):
    bar = ['Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5', 'Note_Degree_I',
           'Note_Duration_480', 'Beat_4', 'Chord_V_7']
    return [[vocab.event2idx[e] for e in bar] for _ in range(n)]


@pytest.mark.parametrize('kind', ['gpt2', 'performer'])
def test_stage2_generation(vocab, kind):
    if kind == 'gpt2':
        model = MusicGPT2(n_token=vocab.size, **SMALL)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 8), dtype=jnp.int32),
                            jnp.zeros((1, 8), dtype=jnp.int32))
        omegas = None
    else:
        model = MusicPerformer(n_token=vocab.size, favor_dims=16, **SMALL)
        omegas = None
        m = model
        omegas = m.draw_omegas(jax.random.PRNGKey(5))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 8), dtype=jnp.int32), omegas,
                            jnp.zeros((1, 8), dtype=jnp.int32))

    gen = Stage2Generator(model, params, vocab, temp=1.1, top_p=0.99,
                          max_events=200, gpt2_cache_len=256, gpt2_window=128,
                          omegas=omegas)
    primer = [vocab.event2idx['Emotion_Q1'], vocab.event2idx['Key_C'],
              vocab.event2idx['Tempo_110']]
    bars = _lead_bars(vocab, 3)
    tokens, stats = gen.generate(primer, bars, seed=1)
    events = vocab.decode(tokens)
    # the teacher-forced lead sheet must appear verbatim per bar
    assert events[3] == 'Track_LeadSheet'
    assert 'Track_Full' in events
    n_lead = sum(1 for e in events if e == 'Track_LeadSheet')
    assert 1 <= n_lead <= 3
    # deterministic
    tokens2, _ = gen.generate(primer, bars, seed=1)
    assert tokens == tokens2


def test_roman_to_absolute_roundtrip_strings():
    evs = ['Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M', 'Note_Octave_5',
           'Note_Degree_I', 'Note_Duration_480']
    out = roman_events_to_absolute('Key_C', evs)
    assert 'Note_Pitch_60' in out
    assert 'Chord_0_M' in out


def test_extract_midi_events():
    evs = ['Emotion_Q1', 'Key_C', 'Tempo_110',
           'Track_LeadSheet', 'Bar_None', 'Beat_0', 'Chord_I_M',
           'Track_Full', 'Bar_None', 'Beat_0', 'Note_Octave_5',
           'Note_Degree_I', 'Note_Duration_480', 'Note_Velocity_64',
           'Track_LeadSheet', 'Bar_None', 'Beat_0', 'Chord_V_7',
           'Track_Full', 'Bar_None', 'Beat_4', 'Note_Octave_5',
           'Note_Degree_V', 'Note_Duration_480', 'Note_Velocity_64']
    bars = extract_midi_events_from_generation('Key_C', evs, relative_melody=True)
    assert len(bars) == 2
    assert bars[0][0] == 'Bar_None'
    assert any(e.startswith('Note_Pitch') for e in bars[0])


def test_events_to_midi_renders(tmp_path):
    evs = ['Bar_None', 'Beat_0', 'Chord_0_M', 'Note_Pitch_60',
           'Note_Duration_480', 'Beat_4', 'Note_Pitch_64', 'Note_Duration_480',
           'Bar_None', 'Beat_0', 'Chord_7_7', 'Note_Pitch_67',
           'Note_Duration_960', 'EOS_None']
    path = str(tmp_path / 'x.mid')
    midi = events_to_midi('Key_C', evs, 'lead_sheet', output_midi_path=path,
                          play_chords=True)
    assert len(midi.instruments) == 2          # melody + chord track
    assert len(midi.instruments[0].notes) == 3
    assert midi.instruments[0].notes[0].pitch == 60
    # chord markers rendered back to absolute letters
    chord_markers = [m for m in midi.markers if m.text.startswith('Chord-')]
    assert chord_markers[0].text == 'Chord-C_M'
    assert chord_markers[1].text == 'Chord-G_7'
    from emo_disentanger_tpu.data.midi_io import MidiFile
    r = MidiFile.parse(path)
    assert len(r.instruments) == 2


def test_emotion_candidates():
    assert emotion_candidates_for_file('samp_00_Positive_roman.txt') == ['Q1', 'Q4']
    assert emotion_candidates_for_file('samp_00_Negative.txt') == ['Q2', 'Q3']
    assert emotion_candidates_for_file('x_Q3.txt') == ['Q3']


def test_roman_conversion_fuzz():
    """Random event soups through the string converters must not crash."""
    import numpy as np
    from emo_disentanger_tpu.infer.pipeline import roman_events_to_absolute
    from emo_disentanger_tpu.infer.convert2midi import events_to_midi
    rng = np.random.RandomState(0)
    pool = ['Bar_None', 'Beat_0', 'Beat_4', 'Beat_15', 'Chord_I_M',
            'Chord_V_7', 'Chord_None_None', 'Note_Octave_5', 'Note_Octave_2',
            'Note_Degree_I', 'Note_Degree_V', 'Note_Duration_480',
            'Note_Velocity_64', 'Tempo_110', 'Tempo_Conti', 'EOS_None',
            'Key_C', 'Key_c', 'Track_LeadSheet', 'Track_Full']
    for trial in range(20):
        events = [pool[i] for i in rng.randint(0, len(pool), size=40)]
        out = roman_events_to_absolute('Key_C', events)
        assert not any(e.startswith('Note_Octave') or e.startswith('Note_Degree')
                       for e in out)
        midi = events_to_midi('Key_C', out, 'full_song')
        assert midi is not None
