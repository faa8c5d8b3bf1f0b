"""L0 music-theory math tests."""

import numpy as np
import pytest

from emo_disentanger_tpu.core import theory as T


ALL_KEYS = list(T.MAJOR_KEY) + list(T.MINOR_KEY)


def test_key_tables():
    assert T.KEY_TO_IDX['C'] == 0 and T.KEY_TO_IDX['A'] == 9
    assert T.IDX_TO_KEY[11] == 'B'


@pytest.mark.parametrize('key', list(T.MAJOR_KEY))
def test_major_roundtrip_all_pitches(key):
    for pitch in range(21, 109):
        octave, roman = T.pitch2degree(key, pitch)
        assert T.degree2pitch(key, octave, roman) == pitch


@pytest.mark.parametrize('key', list(T.MINOR_KEY))
def test_minor_roundtrip_diatonic(key):
    # minor keys round-trip exactly on the 10 unambiguous semitones;
    # semitones 4 and 11 map onto neighbours by design (see make_minor_maps)
    tonic = T.KEY_TO_IDX[key.upper()]
    for pitch in range(21, 109):
        degree = (pitch % 12 + 12 - tonic) % 12
        octave, roman = T.pitch2degree(key, pitch)
        back = T.degree2pitch(key, octave, roman)
        if degree in (4, 11):
            assert abs(back - pitch) == 1
        else:
            assert back == pitch


def test_minor_maps_deterministic_and_configurable():
    d2r, r2d = T.make_minor_maps()
    assert d2r[4] == 'III' and d2r[11] == 'VII'
    assert r2d['II#'] == 3 and r2d['V#'] == 8
    d2r2, r2d2 = T.make_minor_maps('IV', 'I', 2, 7)
    assert d2r2[4] == 'IV' and d2r2[11] == 'I'
    assert r2d2['II#'] == 2 and r2d2['V#'] == 7


def test_pitch2degree_octave_convention():
    # C major, pitch 60 (C4): degree 0, octave 5 (60//12)
    assert T.pitch2degree('C', 60) == (5, 'I')
    # A major, pitch 60: degree 3 semitones above A -> octave (60-3)//12 = 4
    octave, roman = T.pitch2degree('A', 60)
    assert (octave, roman) == (4, 'II#')


def test_absolute_relative_inverse():
    events = [
        {'name': 'Key', 'value': 'D'},
        {'name': 'Bar', 'value': None},
        {'name': 'Note_Pitch', 'value': 62},
        {'name': 'Note_Duration', 'value': 480},
        {'name': 'Note_Pitch', 'value': 69},
    ]
    rel = T.absolute2relative(events)
    names = [e['name'] for e in rel]
    assert names == ['Key', 'Bar', 'Note_Octave', 'Note_Degree',
                     'Note_Duration', 'Note_Octave', 'Note_Degree']
    back = T.relative2absolute(rel)
    assert back == events


def test_relative2absolute_clamps_to_piano_range():
    rel = [
        {'name': 'Key', 'value': 'C'},
        {'name': 'Note_Octave', 'value': 0},
        {'name': 'Note_Degree', 'value': 'I'},
    ]
    out = T.relative2absolute(rel)
    assert out[-1] == {'name': 'Note_Pitch', 'value': 21}


def test_switch_key():
    assert T.switch_key('C') == 'c'
    assert T.switch_key('c#') == 'C#'
    assert T.switch_key('Key_G') == 'Key_g'
    assert T.switch_key('Key_g') == 'Key_G'


def test_switch_melody_mode_flip():
    clip2keymode = {'Q1_clip': 0}
    events = [{'name': 'Note_Pitch', 'value': 64}]  # E in C major -> III
    # positive & major -> switched to minor: III in c minor is semitone 3 -> 63
    out = T.switch_melody('Q1_clip', events, clip2keymode)
    assert out == [{'name': 'Note_Pitch', 'value': 63}]
    # positive & minor stays
    clip2keymode = {'Q1_clip': 1}
    assert T.switch_melody('Q1_clip', events, clip2keymode) == events
