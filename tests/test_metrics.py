"""Objective event-stream metrics."""

import numpy as np

from emo_disentanger_tpu.infer import metrics as M

STREAM = [
    'Emotion_Q1', 'Key_C', 'Tempo_110',
    'Bar_None', 'Beat_0', 'Chord_0_M', 'Note_Pitch_60', 'Note_Duration_480',
    'Note_Velocity_64', 'Beat_4', 'Note_Pitch_64', 'Note_Duration_480',
    'Note_Velocity_70',
    'Bar_None', 'Beat_0', 'Chord_7_7', 'Note_Pitch_67', 'Note_Duration_480',
    'Note_Velocity_76', 'Beat_4', 'Note_Pitch_61', 'Note_Duration_480',
    'Note_Velocity_80',
    'EOS_None',
]


def test_find_key_and_mode():
    assert M.find_key(STREAM) == 'C'
    assert M.mode_label(STREAM) == 'major'
    assert M.mode_label(['Key_c']) == 'minor'


def test_scale_consistency():
    # pitches 60, 64, 67 in C major; 61 (C#) is off-scale -> 3/4
    assert abs(M.scale_consistency(STREAM) - 0.75) < 1e-9


def test_note_density_and_velocity():
    assert M.note_density(STREAM) == 2.0
    assert abs(M.mean_velocity(STREAM) - np.mean([64, 70, 76, 80])) < 1e-9
    assert M.mean_tempo(STREAM) == 110.0
    assert M.pitch_range(STREAM) == 7


def test_groove_consistency():
    # both bars have onsets at beats 0 and 4 -> identical grids
    assert M.groove_consistency(STREAM) == 1.0


def test_emotion_profile_keys():
    prof = M.emotion_profile(STREAM)
    assert prof['mode'] == 'major'
    assert prof['n_bars'] == 2.0
    assert set(prof) >= {'scale_consistency', 'note_density', 'mean_velocity',
                         'mean_tempo', 'pitch_range', 'groove_consistency'}


def test_scale_consistency_functional_rep():
    """The stage-2 functional layout carries Note_Octave/Note_Degree pairs
    instead of Note_Pitch; metrics must reconstruct pitches through
    core.theory.degree2pitch (regression: EVAL_r05 initially reported 0.0
    scale_consistency / pitch_range for every quadrant)."""
    stream = ['Key_C', 'Bar_None', 'Beat_0',
              'Note_Octave_5', 'Note_Degree_I', 'Note_Duration_480',
              'Note_Octave_5', 'Note_Degree_III', 'Note_Duration_480',
              'Note_Octave_5', 'Note_Degree_IV#', 'Note_Duration_480',
              'Note_Octave_6', 'Note_Degree_V', 'Note_Duration_480']
    # I, III, V diatonic in C major; IV# is not -> 3/4
    assert abs(M.scale_consistency(stream) - 0.75) < 1e-9
    # pitches: 60, 64, 66, 79 -> range 19
    assert M.pitch_range(stream) == 19
    # minor key: in a-minor (tonic 9), I=57@oct4... III (semitone 3) is
    # diatonic in minor, VII (semitone 11, the raised resolution) is not
    # in the natural-minor scale set
    stream_m = ['Key_a', 'Bar_None', 'Beat_0',
                'Note_Octave_4', 'Note_Degree_I', 'Note_Duration_480',
                'Note_Octave_4', 'Note_Degree_III', 'Note_Duration_480']
    assert abs(M.scale_consistency(stream_m) - 1.0) < 1e-9
