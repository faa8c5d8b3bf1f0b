"""Golden tests for the EMOPIA tokenizer pipeline on a tiny synthetic song."""

import numpy as np
import pytest

from emo_disentanger_tpu.data.midi_io import (
    MidiFile, Instrument, Note, TempoChange, Marker, TimeSignature,
)
from emo_disentanger_tpu.data.emopia import (
    analyze_midi, quantize_to_corpus,
    corpus_to_leadsheet, corpus_to_stage2, corpus_to_fullsong,
)
from emo_disentanger_tpu.core.events import events_to_strs


def make_song(n_bars=2, key='C'):
    """Two bars: melody C4-E4-G4-C5 per bar (quarter notes), C major chord at
    bar start, G7 at bar 2, tempo 120 throughout."""
    m = MidiFile(ticks_per_beat=480)
    m.time_signature_changes.append(TimeSignature(4, 4, 0))
    m.tempo_changes.append(TempoChange(tempo=120.0, time=0))
    inst = Instrument(program=0, name='piano')
    pitches = [60, 64, 67, 72]
    for bar in range(n_bars):
        for i, p in enumerate(pitches):
            st = bar * 1920 + i * 480
            inst.notes.append(Note(velocity=70, pitch=p, start=st, end=st + 480))
    m.instruments.append(inst)
    m.markers.append(Marker(text='C_maj_C', time=0))
    m.markers.append(Marker(text='G_7_G', time=1920))
    m.max_tick = n_bars * 1920
    return m


def test_leadsheet_remi_layout():
    midi = make_song()
    reg = analyze_midi(midi, 'C', melody_only=True)
    corpus = quantize_to_corpus(reg)
    assert corpus.last_bar == 2
    assert corpus.global_key == 'C'
    assert corpus.global_bpm == 119  # nearest bpm bin to 120 (bins: 32,35,...,119,122)

    pos, events = corpus_to_leadsheet(corpus, 'Positive')
    evs = events_to_strs(events)
    assert evs[0] == 'Emotion_Positive'
    assert 'Key_C' not in evs            # REMI has no key token
    assert evs[1] == 'Bar_None'
    # bar 1: beat 0 has chord + note
    assert evs[2] == 'Beat_0'
    assert evs[3] == 'Chord_0_M'
    assert evs[4] == 'Note_Pitch_60'
    assert evs[5] == 'Note_Duration_480'
    assert evs[-1] == 'EOS_None'
    assert pos == [1, 1 + evs[1:].index('Bar_None', 1) + 0] or len(pos) == 2
    # both bars are marked
    assert sum(1 for e in evs if e == 'Bar_None') == 2


def test_leadsheet_functional_layout():
    midi = make_song()
    reg = analyze_midi(midi, 'C', melody_only=True, relative_chord=True)
    corpus = quantize_to_corpus(reg)
    pos, events = corpus_to_leadsheet(corpus, 'Positive',
                                      relative_melody=True, relative_chord=True)
    evs = events_to_strs(events)
    assert evs[:2] == ['Emotion_Positive', 'Key_C']
    assert 'Chord_I_M' in evs            # C major in C = I
    assert 'Chord_V_7' in evs            # G7 in C = V
    assert 'Note_Octave_5' in evs and 'Note_Degree_I' in evs
    assert 'Note_Pitch_60' not in evs
    assert evs[-1] == 'EOS_None'


def test_chord_fill_repeats_previous():
    midi = make_song()
    reg = analyze_midi(midi, 'C', melody_only=True, chord_conti=False)
    # 8 beats, chord markers at beats 0 and 4 -> repeats fill the rest
    chord_markers = [m for m in reg.markers if not m.text.startswith('global')]
    assert len(chord_markers) == 8
    assert chord_markers[1].text == chord_markers[0].text  # repeat of C major


def test_chord_fill_conti():
    midi = make_song()
    reg = analyze_midi(midi, 'C', melody_only=True, chord_conti=True)
    chord_markers = [m for m in reg.markers if not m.text.startswith('global')]
    assert chord_markers[1].text == 'Conti_Conti_Conti'


def test_stage2_layout():
    midi = make_song()
    lead = quantize_to_corpus(analyze_midi(midi, 'C', melody_only=True,
                                           chord_conti=False, tempo_conti=True,
                                           relative_chord=True))
    full = quantize_to_corpus(analyze_midi(make_song(), 'C', melody_only=False,
                                           chord_conti=True, tempo_conti=True,
                                           relative_chord=True))
    lead_pos, full_pos, events = corpus_to_stage2(
        lead, full, 'Q1', relative_melody=True, relative_chord=True)
    evs = events_to_strs(events)
    assert evs[:3] == ['Emotion_Q1', 'Key_C', 'Tempo_119']
    assert len(lead_pos) == len(full_pos) == 2
    # spans tile the sequence after the 3-token prefix
    assert lead_pos[0][0] == 3
    assert lead_pos[0][1] == full_pos[0][0]
    assert full_pos[0][1] == lead_pos[1][0]
    assert full_pos[1][1] == len(events)
    # track headers at span starts
    assert evs[lead_pos[0][0]] == 'Track_LeadSheet'
    assert evs[full_pos[0][0]] == 'Track_Full'
    # EOS sits at the end of the LAST LEAD span (reference quirk,
    # midi2events_emopia.py:579-581)
    assert evs[lead_pos[1][1] - 1] == 'EOS_None'
    # full track carries velocities, lead track does not
    lead_span = evs[lead_pos[0][0]:lead_pos[0][1]]
    full_span = evs[full_pos[0][0]:full_pos[0][1]]
    assert not any(e.startswith('Note_Velocity') for e in lead_span)
    assert any(e.startswith('Note_Velocity') for e in full_span)
    # full track has a tempo event at each quarter beat (0/4/8/12)
    assert sum(1 for e in full_span if e.startswith('Tempo')) == 4


def test_fullsong_layout():
    midi = make_song()
    corpus = quantize_to_corpus(analyze_midi(midi, 'C', melody_only=False))
    pos, events = corpus_to_fullsong(corpus, 'Q3')
    evs = events_to_strs(events)
    assert evs[0] == 'Emotion_Q3'
    assert evs[1].startswith('Tempo_')
    assert any(e.startswith('Note_Velocity') for e in evs)
    assert evs[-1] == 'EOS_None'
    assert len(pos) == 2


def test_duration_cap_and_zero_drop():
    m = MidiFile(ticks_per_beat=480)
    m.tempo_changes.append(TempoChange(tempo=110.0, time=0))
    inst = Instrument()
    inst.notes = [
        Note(velocity=70, pitch=60, start=0, end=4000),   # > 1 bar -> capped
        Note(velocity=70, pitch=62, start=10, end=50),    # rounds to 0 -> kept? 40 ticks -> 0
    ]
    m.instruments.append(inst)
    m.markers.append(Marker(text='C_maj_C', time=0))
    m.max_tick = 4000
    corpus = quantize_to_corpus(analyze_midi(m, 'C', melody_only=False))
    notes = [n for items in corpus.notes.values() for n in items]
    assert len(notes) == 1
    assert notes[0].duration == 1920


def test_velocity_binning():
    from emo_disentanger_tpu.core.quantize import DEFAULT_VELOCITY_BINS, nearest_bin
    assert nearest_bin(DEFAULT_VELOCITY_BINS, 0) == 4
    assert nearest_bin(DEFAULT_VELOCITY_BINS, 127) == 127
    v = nearest_bin(DEFAULT_VELOCITY_BINS, 70)
    assert v in DEFAULT_VELOCITY_BINS and abs(v - 70) <= 2
