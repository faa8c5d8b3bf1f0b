"""Coverage for the vocabulary builder configs, splits, and utilities."""

import os
import pickle

import numpy as np
import pytest

from emo_disentanger_tpu.core.vocab import (
    Vocab, build_full_vocab, events_to_dictionary, build_dictionary_from_dir,
)
from emo_disentanger_tpu.data.splits import split_hooktheory
from emo_disentanger_tpu.utils.profiling import Throughput, step_timer
from emo_disentanger_tpu.infer.pipeline import construct_inadmissible_set


def test_full_vocab_shapes():
    # functional stage-1 vocab: 3 emotions + 133 chords + 9 octaves +
    # 12 degrees + 16 durations (no velocity/tempo)
    v = build_full_vocab(add_velocity=False, add_emotion=True, add_tempo=False,
                         num_emotion=2, relative=True)
    assert len(v) == 3 + (12 * 11 + 1) + 9 + 12 + 16
    assert 'Emotion_Positive' in v and 'Chord_I_M' in v
    assert 'Note_Octave_1' in v and 'Note_Octave_9' in v
    assert not any(e.startswith('Note_Velocity') for e in v)

    # REMI stage-2 vocab: 5 emotions + chords + 88 pitches + 42 velocities +
    # 16 durations + 65 tempos
    v2 = build_full_vocab(add_velocity=True, add_emotion=True, add_tempo=True,
                          num_emotion=4, relative=False)
    assert len(v2) == 5 + (12 * 11 + 1) + 88 + 42 + 16 + 65
    assert 'Note_Pitch_21' in v2 and 'Note_Pitch_108' in v2
    assert 'Tempo_32' in v2 and 'Tempo_224' in v2


def test_dictionary_determinism_and_sorting():
    events = [[{'name': 'Bar', 'value': None}, {'name': 'Beat', 'value': 0}]]
    a = events_to_dictionary(events, num_emotion=2, relative=True,
                             add_velocity=False, add_tempo=False)
    b = events_to_dictionary(events, num_emotion=2, relative=True,
                             add_velocity=False, add_tempo=False)
    assert a == b
    e2w, w2e = a
    keys = list(e2w)
    assert keys == sorted(keys)              # sorted string order
    assert all(w2e[i] == k for k, i in e2w.items())


def test_build_dictionary_from_dir(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, 'events'))
    evs = [{'name': 'Bar', 'value': None}, {'name': 'EOS', 'value': None}]
    with open(os.path.join(root, 'events', 'x.pkl'), 'wb') as f:
        pickle.dump(([0], evs), f)
    path = build_dictionary_from_dir(root, event_pos=1, num_emotion=2,
                                     relative=True, add_velocity=False,
                                     add_tempo=False)
    vocab = Vocab.load(path)
    assert 'Bar_None' in vocab.event2idx and 'EOS_None' in vocab.event2idx
    assert vocab.idx2event[vocab.pad_id] == 'PAD_None'


def test_split_hooktheory_seeded(tmp_path):
    events_dir = str(tmp_path / 'events')
    os.makedirs(events_dir)
    for i in range(20):
        open(os.path.join(events_dir, f'c{i:02d}.pkl'), 'w').close()
    out = str(tmp_path / 'splits')
    train1, valid1 = split_hooktheory(events_dir, out)
    train2, valid2 = split_hooktheory(events_dir, out)
    assert train1 == train2 and valid1 == valid2
    assert len(valid1) == 2 and len(train1) == 18
    assert not set(train1) & set(valid1)


def test_throughput_and_step_timer():
    tp = Throughput(n_chips=2)
    tp.add(100)
    tp.add(50)
    rep = tp.report()
    assert rep['tokens'] == 150
    assert rep['tokens_per_sec'] > 0
    assert abs(rep['tokens_per_sec_per_chip'] * 2 - rep['tokens_per_sec']) < 1e-6

    st = step_timer()
    for _ in range(3):
        with st:
            pass
    s = st.summary()
    assert s['n'] == 3 and s['mean_s'] >= 0


def test_construct_inadmissible_set():
    e2i = {'Tempo_100': 0, 'Tempo_150': 1, 'Tempo_Conti': 2, 'Bar_None': 3}
    forbid = construct_inadmissible_set(110, e2i, vocab_size=4, tolerance=20)
    assert forbid[1] and not forbid[0]       # 150 is >20 bpm away, 100 is not
    assert not forbid[2] and not forbid[3]   # Conti and non-tempo untouched


def test_evaluate_dir(tmp_path):
    from emo_disentanger_tpu.cli.evaluate import evaluate_dir
    pos = ['Key_C', 'Bar_None', 'Beat_0', 'Note_Pitch_60', 'Note_Duration_480']
    neg = ['Key_c', 'Bar_None', 'Beat_0', 'Note_Pitch_63', 'Note_Duration_480']
    (tmp_path / 'samp_00_Positive.txt').write_text('\n'.join(pos))
    (tmp_path / 'samp_00_Negative.txt').write_text('\n'.join(neg))
    (tmp_path / 'samp_00_Positive_roman.txt').write_text('ignored')
    report = evaluate_dir(str(tmp_path))
    assert set(report) == {'Positive', 'Negative'}
    assert report['Positive']['major_ratio'] == 1.0
    assert report['Negative']['major_ratio'] == 0.0
    assert report['Positive']['n_pieces'] == 1

    # stage-2 outputs carry BOTH tags (samp_00_Positive_Q1_full.txt):
    # the quadrant must win the grouping (EVAL artifact contract)
    (tmp_path / 'samp_01_Positive_Q1_full.txt').write_text('\n'.join(pos))
    (tmp_path / 'samp_01_Negative_Q3_full.txt').write_text('\n'.join(neg))
    report = evaluate_dir(str(tmp_path))
    assert set(report) == {'Positive', 'Negative', 'Q1', 'Q3'}
    assert report['Q1']['major_ratio'] == 1.0
    assert report['Q3']['major_ratio'] == 0.0
