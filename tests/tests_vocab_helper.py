"""Tiny vocab shared by generation tests."""

from emo_disentanger_tpu.core.vocab import Vocab


def tiny_vocab2():
    events = ['Emotion_Q1', 'Emotion_Q2', 'Key_C', 'Key_c',
              'Bar_None', 'EOS_None', 'Track_LeadSheet', 'Track_Full',
              'Tempo_110', 'Chord_I_M', 'Chord_V_7', 'Chord_None_None']
    events += ['Beat_{}'.format(b) for b in range(16)]
    events += ['Note_Octave_5', 'Note_Degree_I', 'Note_Degree_V',
               'Note_Duration_480', 'Note_Velocity_64']
    events = sorted(set(events))
    return Vocab({e: i for i, e in enumerate(events)},
                 {i: e for i, e in enumerate(events)})
