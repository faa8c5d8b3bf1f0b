"""MIDI reader/writer round-trip tests."""

import numpy as np

from emo_disentanger_tpu.data.midi_io import (
    MidiFile, Instrument, Note, TempoChange, Marker, TimeSignature,
)


def _make_midi():
    m = MidiFile(ticks_per_beat=480)
    m.time_signature_changes.append(TimeSignature(4, 4, 0))
    m.tempo_changes.append(TempoChange(tempo=120.0, time=0))
    m.tempo_changes.append(TempoChange(tempo=90.0, time=1920))
    m.markers.append(Marker(text='C_maj_C', time=0))
    m.markers.append(Marker(text='G_7_G', time=1920))
    inst = Instrument(program=0, name='piano')
    inst.notes = [
        Note(velocity=80, pitch=60, start=0, end=480),
        Note(velocity=90, pitch=64, start=480, end=960),
        Note(velocity=100, pitch=67, start=960, end=2400),
    ]
    m.instruments.append(inst)
    m.max_tick = 2400
    return m


def test_roundtrip(tmp_path):
    m = _make_midi()
    path = str(tmp_path / 'x.mid')
    m.dump(path)
    r = MidiFile.parse(path)

    assert r.ticks_per_beat == 480
    assert len(r.instruments) == 1
    notes = r.instruments[0].notes
    assert [(n.pitch, n.start, n.end, n.velocity) for n in notes] == \
           [(60, 0, 480, 80), (64, 480, 960, 90), (67, 960, 2400, 100)]
    assert [(round(t.tempo), t.time) for t in r.tempo_changes] == [(120, 0), (90, 1920)]
    assert [(mk.text, mk.time) for mk in r.markers] == [('C_maj_C', 0), ('G_7_G', 1920)]
    assert r.time_signature_changes[0].numerator == 4
    assert r.max_tick >= 2400


def test_overlapping_same_pitch_notes(tmp_path):
    m = MidiFile(ticks_per_beat=480)
    inst = Instrument()
    inst.notes = [
        Note(velocity=70, pitch=60, start=0, end=960),
        Note(velocity=75, pitch=60, start=480, end=1440),
    ]
    m.instruments.append(inst)
    path = str(tmp_path / 'o.mid')
    m.dump(path)
    r = MidiFile.parse(path)
    got = sorted((n.start, n.end) for n in r.instruments[0].notes)
    # FIFO pairing: first-on matches first-off
    assert got == [(0, 960), (480, 1440)]


def test_multi_instrument(tmp_path):
    m = MidiFile(ticks_per_beat=480)
    for k in range(3):
        inst = Instrument(name=f'track{k}')
        inst.notes = [Note(velocity=64, pitch=50 + k, start=0, end=480)]
        m.instruments.append(inst)
    path = str(tmp_path / 'm.mid')
    m.dump(path)
    r = MidiFile.parse(path)
    assert len(r.instruments) == 3
    assert sorted(i.notes[0].pitch for i in r.instruments) == [50, 51, 52]
