"""Shared test helpers: synthetic corpora on disk in the pipeline's pickle
formats, plus tiny config dicts."""

import os
import pickle

import numpy as np

from emo_disentanger_tpu.data.midi_io import (
    MidiFile, Instrument, Note, TempoChange, Marker, TimeSignature,
)
from emo_disentanger_tpu.data.emopia import (
    analyze_midi, quantize_to_corpus,
    corpus_to_leadsheet, corpus_to_stage2,
)
from emo_disentanger_tpu.core.vocab import events_to_dictionary


def synth_midi(n_bars=4, seed=0, key='C'):
    rng = np.random.RandomState(seed)
    m = MidiFile(ticks_per_beat=480)
    m.time_signature_changes.append(TimeSignature(4, 4, 0))
    m.tempo_changes.append(TempoChange(tempo=float(rng.choice([90, 110, 120])), time=0))
    mel = Instrument(program=0, name='melody')
    acc = Instrument(program=0, name='acc')
    bass = Instrument(program=0, name='bass')
    scale = [60, 62, 64, 65, 67, 69, 71, 72]
    for bar in range(n_bars):
        for i in range(4):
            st = bar * 1920 + i * 480
            p = int(rng.choice(scale))
            mel.notes.append(Note(velocity=int(rng.randint(50, 100)), pitch=p,
                                  start=st, end=st + 480))
            acc.notes.append(Note(velocity=60, pitch=p - 12, start=st, end=st + 240))
            bass.notes.append(Note(velocity=55, pitch=p - 24, start=st, end=st + 480))
    m.instruments.extend([mel, acc, bass])
    roots = ['C', 'F', 'G', 'A']
    quals = ['maj', 'maj', '7', 'min']
    for bar in range(n_bars):
        r = roots[bar % 4]
        q = quals[bar % 4]
        m.markers.append(Marker(text=f'{r}_{q}_{r}', time=bar * 1920))
    m.max_tick = n_bars * 1920
    return m


def write_stage1_corpus(root, n_pieces=6, functional=True, n_bars=4):
    """events/<piece>.pkl (bar_pos, events) + dictionary.pkl; returns paths."""
    events_dir = os.path.join(root, 'events')
    os.makedirs(events_dir, exist_ok=True)
    all_events = []
    names = []
    for i in range(n_pieces):
        emotion = ['Positive', 'Negative'][i % 2]
        midi = synth_midi(n_bars=n_bars, seed=i)
        reg = analyze_midi(midi, 'C' if i % 2 == 0 else 'a', melody_only=True,
                           relative_chord=functional)
        corpus = quantize_to_corpus(reg)
        pos, evs = corpus_to_leadsheet(corpus, emotion,
                                       relative_melody=functional,
                                       relative_chord=functional)
        name = f'Q{(i % 4) + 1}_piece{i}.pkl'
        with open(os.path.join(events_dir, name), 'wb') as f:
            pickle.dump((pos, evs), f)
        all_events.append(evs)
        names.append(name)
    e2w, w2e = events_to_dictionary(all_events, add_velocity=False,
                                    add_tempo=False, num_emotion=2,
                                    relative=functional)
    with open(os.path.join(root, 'dictionary.pkl'), 'wb') as f:
        pickle.dump((e2w, w2e), f)
    return events_dir, os.path.join(root, 'dictionary.pkl'), names


def write_stage2_corpus(root, n_pieces=4, functional=True, n_bars=4):
    events_dir = os.path.join(root, 'events')
    os.makedirs(events_dir, exist_ok=True)
    all_events = []
    names = []
    keys = ['C', 'a', 'G', 'e']
    for i in range(n_pieces):
        emotion = f'Q{(i % 4) + 1}'
        key = keys[i % len(keys)]
        midi = synth_midi(n_bars=n_bars, seed=100 + i)
        lead = quantize_to_corpus(analyze_midi(
            midi, key, melody_only=True, chord_conti=False, tempo_conti=True,
            relative_chord=functional))
        full = quantize_to_corpus(analyze_midi(
            synth_midi(n_bars=n_bars, seed=100 + i), key, melody_only=False,
            chord_conti=True, tempo_conti=True, relative_chord=functional))
        lead_pos, full_pos, evs = corpus_to_stage2(
            lead, full, emotion, relative_melody=functional,
            relative_chord=functional)
        name = f'{emotion}_piece{i}.pkl'
        with open(os.path.join(events_dir, name), 'wb') as f:
            pickle.dump((lead_pos, full_pos, evs), f)
        all_events.append(evs)
        names.append(name)
    e2w, w2e = events_to_dictionary(all_events, add_velocity=True,
                                    add_tempo=True, num_emotion=4,
                                    relative=functional)
    with open(os.path.join(root, 'dictionary.pkl'), 'wb') as f:
        pickle.dump((e2w, w2e), f)
    return events_dir, os.path.join(root, 'dictionary.pkl'), names


def write_fullsong_corpus(root, n_pieces=4, functional=True, n_bars=4):
    """One-stage full-song corpus: events/<piece>.pkl (pos, events) with
    velocity+tempo, 4-quadrant emotions."""
    from emo_disentanger_tpu.data.emopia import corpus_to_fullsong
    events_dir = os.path.join(root, 'events')
    os.makedirs(events_dir, exist_ok=True)
    all_events = []
    names = []
    keys = ['C', 'a', 'G', 'e']
    for i in range(n_pieces):
        emotion = f'Q{(i % 4) + 1}'
        midi = synth_midi(n_bars=n_bars, seed=300 + i)
        corpus = quantize_to_corpus(analyze_midi(
            midi, keys[i % 4], melody_only=False, relative_chord=functional))
        pos, evs = corpus_to_fullsong(corpus, emotion,
                                      relative_melody=functional,
                                      relative_chord=functional)
        name = f'{emotion}_full{i}.pkl'
        with open(os.path.join(events_dir, name), 'wb') as f:
            pickle.dump((pos, evs), f)
        all_events.append(evs)
        names.append(name)
    e2w, w2e = events_to_dictionary(all_events, add_velocity=True,
                                    add_tempo=True, num_emotion=4,
                                    relative=functional)
    with open(os.path.join(root, 'dictionary.pkl'), 'wb') as f:
        pickle.dump((e2w, w2e), f)
    return events_dir, os.path.join(root, 'dictionary.pkl'), names
