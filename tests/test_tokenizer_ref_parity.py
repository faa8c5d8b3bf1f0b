"""Tokenizer bit-parity against the REFERENCE's own pipeline code.

The reference tokenizers (``/root/reference/representations/
midi2events_emopia.py`` etc.) are executed directly — with ``miditoolkit``
stubbed by this framework's own SMF reader (:mod:`..data.midi_io`), the same
trick ``test_stream_parity.py`` uses for torch models — on synthetic MIDI
files, and their ``(positions, events)`` output is asserted event-for-event
identical to :mod:`emo_disentanger_tpu.data.emopia`'s.

The reference's ``convert_key`` resolves four degree-map entries with
``random.choice`` at import time (``convert_key.py:54,61,67,72``); the stub
pins each choice to the deterministic resolution ``core.theory.make_minor_maps``
documents, so both sides use identical maps.
"""

import importlib.util
import random
import sys
import types

import numpy as np
import pytest

import ref_loader

pytestmark = pytest.mark.skipif(not ref_loader.available(),
                                reason='reference repo not mounted')

REPR_DIR = '/root/reference/representations'

from emo_disentanger_tpu.data import midi_io
from emo_disentanger_tpu.data.midi_io import (
    Instrument, Marker, MidiFile, Note, TempoChange, TimeSignature,
)
from emo_disentanger_tpu.data import emopia as our_emopia


# ---------------------------------------------------------------------------
# reference-module loading with stubbed dependencies
# ---------------------------------------------------------------------------

def _pinned_choice(seq):
    """Deterministic stand-in for random.choice matching make_minor_maps
    defaults: first option for the name maps, harmonically-closer option
    for the inverse maps."""
    pins = {('III', 'IV'): 'III', ('VII', 'I'): 'VII',
            (2, 3): 3, (7, 8): 8}
    key = tuple(seq)
    if key in pins:
        return pins[key]
    raise AssertionError(f'unexpected random.choice({seq}) in convert_key')


def _stub_modules():
    """sys.modules entries that satisfy the reference tokenizers' imports."""
    import pickle

    tqdm_mod = types.ModuleType('tqdm')
    tqdm_mod.tqdm = lambda it, **kw: it

    mtk = types.ModuleType('miditoolkit')
    mtk_midi = types.ModuleType('miditoolkit.midi')
    mtk_parser = types.ModuleType('miditoolkit.midi.parser')
    mtk_containers = types.ModuleType('miditoolkit.midi.containers')

    def _MidiFile(path=None, *a, **k):
        return MidiFile.parse(path) if path is not None else MidiFile()

    mtk_parser.MidiFile = _MidiFile
    mtk_containers.Note = Note
    mtk_containers.TempoChange = TempoChange
    mtk_containers.Marker = Marker
    mtk_containers.TimeSignature = TimeSignature
    mtk_containers.Instrument = Instrument
    mtk_midi.parser = mtk_parser
    mtk_midi.containers = mtk_containers
    mtk.midi = mtk_midi

    return {'pickle5': pickle, 'tqdm': tqdm_mod, 'miditoolkit': mtk,
            'miditoolkit.midi': mtk_midi,
            'miditoolkit.midi.parser': mtk_parser,
            'miditoolkit.midi.containers': mtk_containers}


def _load_ref_module(name, stubs):
    spec = importlib.util.spec_from_file_location(name, f'{REPR_DIR}/{name}.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod          # so sibling ref modules can import it
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def ref():
    """Reference tokenizer modules, loaded once with stubbed deps."""
    stubs = _stub_modules()
    saved = {}
    names = list(stubs) + ['convert_key', 'midi2events_emopia',
                           'midi2events_hooktheory', 'utils',
                           'midi2events_pop1k7']
    for n in names:
        saved[n] = sys.modules.get(n)
    for n, m in stubs.items():
        sys.modules[n] = m

    orig_choice = random.choice
    random.choice = _pinned_choice
    try:
        convert_key = _load_ref_module('convert_key', stubs)
    finally:
        random.choice = orig_choice

    try:
        emopia = _load_ref_module('midi2events_emopia', stubs)
        # pop1k7/hooktheory also need the reference's `utils`
        utils_stub = types.ModuleType('utils')
        utils_stub.json_read = lambda p: __import__('json').load(open(p))
        import pickle as _pkl
        utils_stub.pickle_dump = lambda obj, f: _pkl.dump(obj, open(f, 'wb'))
        utils_stub.pickle_load = lambda f: _pkl.load(open(f, 'rb'))
        sys.modules['utils'] = utils_stub
        hooktheory = _load_ref_module('midi2events_hooktheory', stubs)
        pop1k7 = _load_ref_module('midi2events_pop1k7', stubs)
        yield types.SimpleNamespace(convert_key=convert_key, emopia=emopia,
                                    hooktheory=hooktheory, pop1k7=pop1k7)
    finally:
        for n, old in saved.items():
            if old is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = old


# ---------------------------------------------------------------------------
# synthetic MIDI corpus
# ---------------------------------------------------------------------------

BEAT = 480
BAR = 4 * BEAT


def _make_midi(seed: int, n_bars: int = 6) -> bytes:
    """A 3-track performance MIDI with chord markers and tempo changes,
    shaped like an EMOPIA+ clip (melody / texture / bass + markers)."""
    rng = np.random.RandomState(seed)
    midi = MidiFile(ticks_per_beat=BEAT)
    midi.time_signature_changes.append(TimeSignature(4, 4, 0))

    # tempo: one at 0, a few mid-song (some off the beat grid)
    midi.tempo_changes.append(TempoChange(tempo=float(rng.randint(60, 180)), time=0))
    for _ in range(3):
        t = int(rng.randint(1, n_bars * 4)) * BEAT
        if rng.random() < 0.5:
            t += int(rng.randint(1, BEAT))      # off-grid: median-only
        midi.tempo_changes.append(TempoChange(tempo=float(rng.randint(60, 180)), time=t))
    midi.tempo_changes.sort(key=lambda x: x.time)

    # chord markers: root_quality_bass at (mostly) beat-aligned times
    roots = ['C', 'D', 'E', 'F', 'G', 'A', 'B', 'C#', 'F#']
    quals = ['maj', 'min', '7', 'maj7', 'min7', 'dim', 'sus4', 'aug',
             'dim7', 'hdim7', 'sus2']
    for b in range(0, n_bars * 4, 2):
        root = roots[rng.randint(len(roots))]
        qual = quals[rng.randint(len(quals))]
        bass = roots[rng.randint(len(roots))]
        t = b * BEAT + int(rng.randint(-40, 40))     # jitter -> np.round snap
        midi.markers.append(Marker(text=f'{root}_{qual}_{bass}', time=max(0, t)))

    def track(name, lo, hi, density, max_dur):
        inst = Instrument(program=0, name=name)
        t = int(rng.randint(0, 2 * BEAT))
        while t < n_bars * BAR - BEAT:
            dur = int(rng.randint(60, max_dur))
            inst.notes.append(Note(velocity=int(rng.randint(30, 127)),
                                   pitch=int(rng.randint(lo, hi)),
                                   start=t, end=t + dur))
            t += int(rng.randint(60, density))
        return inst

    midi.instruments.append(track('melody', 60, 84, 700, 1200))
    midi.instruments.append(track('texture', 48, 72, 350, 800))
    midi.instruments.append(track('bass', 28, 52, 900, 2000))
    return midi.to_bytes()


CASES = [(0, 'G', 'functional'), (1, 'c#', 'functional'), (2, 'F', 'remi'),
         (3, 'a', 'functional'), (4, 'D#', 'remi')]


def _flags(representation):
    if representation == 'remi':
        return dict(transpose_to_C=False, relative_chord=False,
                    relative_melody=False)
    return dict(transpose_to_C=False, relative_chord=True,
                relative_melody=True)


def _write(tmp_path, seed):
    p = tmp_path / f's{seed}.mid'
    p.write_bytes(_make_midi(seed))
    return str(p)


# ---------------------------------------------------------------------------
# EMOPIA parity: all three layouts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('seed,key,representation', CASES)
def test_emopia_lead_parity(ref, tmp_path, seed, key, representation):
    f = _flags(representation)
    path = _write(tmp_path, seed)

    robj = ref.emopia.analyzer(path, key, only_melody=True, chord_conti=False,
                               tempo_conti=False,
                               relative_chord=f['relative_chord'],
                               transpose_to_C=f['transpose_to_C'])
    rdata = ref.emopia.midi2corpus(robj)
    rpos, revents = ref.emopia.corpus2lead(
        rdata, 'Positive', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    ours_midi = our_emopia.analyze_midi(
        MidiFile.parse(path), key, melody_only=True, chord_conti=False,
        tempo_conti=False, relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C'])
    corpus = our_emopia.quantize_to_corpus(ours_midi)
    opos, oevents = our_emopia.corpus_to_leadsheet(
        corpus, 'Positive', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    assert list(rpos) == list(opos)
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]


@pytest.mark.parametrize('seed,key,representation', CASES)
def test_emopia_stage2_parity(ref, tmp_path, seed, key, representation):
    f = _flags(representation)
    path = _write(tmp_path, seed)

    rlead = ref.emopia.midi2corpus(ref.emopia.analyzer(
        path, key, only_melody=True, chord_conti=False, tempo_conti=True,
        relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    rfull = ref.emopia.midi2corpus(ref.emopia.analyzer(
        path, key, only_melody=False, chord_conti=True, tempo_conti=True,
        relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    rlp, rfp, revents = ref.emopia.corpus2full(
        rlead, rfull, 'Q2', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    olead = our_emopia.quantize_to_corpus(our_emopia.analyze_midi(
        MidiFile.parse(path), key, melody_only=True, chord_conti=False,
        tempo_conti=True, relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    ofull = our_emopia.quantize_to_corpus(our_emopia.analyze_midi(
        MidiFile.parse(path), key, melody_only=False, chord_conti=True,
        tempo_conti=True, relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    olp, ofp, oevents = our_emopia.corpus_to_stage2(
        olead, ofull, 'Q2', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    assert [tuple(p) for p in rlp] == [tuple(p) for p in olp]
    assert [tuple(p) for p in rfp] == [tuple(p) for p in ofp]
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]


@pytest.mark.parametrize('seed,key,representation', CASES)
def test_emopia_fullsong_parity(ref, tmp_path, seed, key, representation):
    f = _flags(representation)
    path = _write(tmp_path, seed)

    rdata = ref.emopia.midi2corpus(ref.emopia.analyzer(
        path, key, only_melody=False, chord_conti=False, tempo_conti=False,
        relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    rpos, revents = ref.emopia.corpus2lead_full(
        rdata, 'Q4', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    corpus = our_emopia.quantize_to_corpus(our_emopia.analyze_midi(
        MidiFile.parse(path), key, melody_only=False, chord_conti=False,
        tempo_conti=False, relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C']))
    opos, oevents = our_emopia.corpus_to_fullsong(
        corpus, 'Q4', relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    assert list(rpos) == list(opos)
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]


def test_emopia_transpose_to_c_parity(ref, tmp_path):
    """The transpose-to-C path (unused by the released configs but part of
    the reference CLI surface) must also agree."""
    path = _write(tmp_path, 7)
    for key in ['E', 'g#']:
        robj = ref.emopia.analyzer(path, key, only_melody=True,
                                   chord_conti=False, tempo_conti=False,
                                   relative_chord=False, transpose_to_C=True)
        rdata = ref.emopia.midi2corpus(robj)
        rpos, revents = ref.emopia.corpus2lead(rdata, 'Negative')

        corpus = our_emopia.quantize_to_corpus(our_emopia.analyze_midi(
            MidiFile.parse(path), key, melody_only=True, chord_conti=False,
            tempo_conti=False, relative_chord=False, transpose_to_C=True))
        opos, oevents = our_emopia.corpus_to_leadsheet(corpus, 'Negative')

        assert list(rpos) == list(opos)
        assert [dict(e) for e in revents] == [dict(e) for e in oevents]


# ---------------------------------------------------------------------------
# HookTheory parity
# ---------------------------------------------------------------------------

def _make_annotation(seed: int):
    rng = np.random.RandomState(100 + seed)
    n_bars = int(rng.randint(4, 9))
    minor = bool(rng.randint(2))
    intervals = [2, 1, 2, 2, 1, 2] if minor else [2, 2, 1, 2, 2, 2]
    melody, harmony = [], []
    t = 0.0
    while t < n_bars * 4 - 1:
        dur = float(rng.choice([0.5, 1.0, 1.5, 2.0]))
        melody.append({'onset': t, 'offset': t + dur,
                       'pitch_class': int(rng.randint(12)),
                       'octave': int(rng.randint(-1, 2))})
        t += dur
    # a zero-length note (skipped by both sides)
    melody.append({'onset': 2.0, 'offset': 2.0, 'pitch_class': 0, 'octave': 0})
    qualities = [[4, 3], [3, 4], [3, 3], [4, 4], [2, 5], [5, 2],
                 [4, 3, 3], [4, 3, 4], [3, 4, 3], [3, 3, 3], [3, 3, 4],
                 [4, 3, 3, 4],        # 9th-ish: simplified via prefix/invert
                 [3, 4, 5],           # inversion-resolvable
                 [1, 1, 1]]           # unresolvable -> None chord
    for b in range(0, n_bars * 4, 2):
        harmony.append({'onset': float(b), 'offset': float(b + 2),
                        'root_pitch_class': int(rng.randint(12)),
                        'root_position_intervals':
                            qualities[int(rng.randint(len(qualities)))]})
    return {'keys': [{'tonic_pitch_class': int(rng.randint(12)),
                      'scale_degree_intervals': intervals}],
            'melody': melody, 'harmony': harmony}


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
@pytest.mark.parametrize('representation', ['functional', 'remi'])
def test_hooktheory_parity(ref, tmp_path, seed, representation):
    from emo_disentanger_tpu.data import hooktheory as our_ht
    f = _flags(representation)
    ann = _make_annotation(seed)

    # reference flow: annotation -> midi obj -> dump -> re-parse -> events
    robj = ref.hooktheory.annotation2midi(
        ann, relative_chord=f['relative_chord'],
        transpose_to_C=f['transpose_to_C'])
    path = str(tmp_path / f'ht{seed}_{representation}.mid')
    robj.dump(filename=path)
    rdata = ref.emopia.midi2corpus(MidiFile.parse(path))
    rpos, revents = ref.emopia.corpus2lead(
        rdata, None, relative_melody=f['relative_melody'],
        relative_chord=f['relative_chord'])

    got = our_ht.clip_to_leadsheet_events(
        {'annotations': ann}, relative_chord=f['relative_chord'],
        relative_melody=f['relative_melody'],
        transpose_to_C=f['transpose_to_C'], min_bars=0)
    assert got is not None
    opos, oevents = got
    assert list(rpos) == list(opos)
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]


def test_hooktheory_chord_simplify_parity(ref):
    from emo_disentanger_tpu.data.hooktheory import chord_simplify as ours
    rng = np.random.RandomState(3)
    cases = []
    for n in (1, 2, 3, 4, 5):
        for _ in range(40):
            cases.append([int(x) for x in rng.randint(1, 6, size=n)])
    for iv in cases:
        r = ref.hooktheory.chord_simplify(list(iv), invert=True)
        o = ours(list(iv), invert=True)
        assert (r is False and o is False) or list(r) == list(o), (iv, r, o)


# ---------------------------------------------------------------------------
# Pop1K7 parity
# ---------------------------------------------------------------------------

def _make_ce_events(seed: int):
    """Synthetic Compose&Embellish (skyline_pos, midi_pos, events) triple.

    Respects the invariants of the real C&E pickles that the reference
    relies on (it crashes otherwise): every emitted Beat carries at least
    one event, and Tempo/Chord events in the Midi track appear only at
    quarter beats 0/4/8/12 (``event2full`` only resolves Conti / tracks
    prev state at those beats, ``midi2events_pop1k7.py:169-193``)."""
    rng = np.random.RandomState(200 + seed)
    n_bars = int(rng.randint(3, 7))
    ev = [{'name': 'Tempo', 'value': int(rng.choice([80, 110, 140]))}]
    skyline_pos, midi_pos = [], []
    qualities = ['M', 'm', '7', 'M7', 'm7', 'o', 'sus4']

    def note(lead):
        out = [{'name': 'Note_Pitch', 'value': int(rng.randint(30, 95))},
               {'name': 'Note_Duration', 'value': int(rng.choice([240, 480, 960]))}]
        if not lead:
            out.append({'name': 'Note_Velocity', 'value': int(rng.randint(40, 120))})
        return out

    for bar in range(n_bars):
        sk_start = len(ev)
        ev.append({'name': 'Track', 'value': 'Skyline'})
        ev.append({'name': 'Bar', 'value': None})
        for b in sorted(rng.choice(16, size=rng.randint(1, 6), replace=False)):
            ev.append({'name': 'Beat', 'value': int(b)})
            has_chord = rng.random() < 0.6
            if has_chord:
                if rng.random() < 0.15:
                    val = 'None_None'
                else:
                    val = f'{int(rng.randint(12))}_' \
                          f'{qualities[int(rng.randint(len(qualities)))]}'
                ev.append({'name': 'Chord', 'value': val})
            if rng.random() < 0.8 or not has_chord:
                ev.extend(note(lead=True))
        mid_start = len(ev)
        ev.append({'name': 'Track', 'value': 'Midi'})
        ev.append({'name': 'Bar', 'value': None})
        for b in sorted(rng.choice(16, size=rng.randint(2, 8), replace=False)):
            ev.append({'name': 'Beat', 'value': int(b)})
            quarter = b in (0, 4, 8, 12)
            emitted = 0
            if quarter and rng.random() < 0.6:
                val = 'Conti' if rng.random() < 0.3 else int(rng.choice([80, 110, 140]))
                ev.append({'name': 'Tempo', 'value': val})
                emitted += 1
            if quarter and rng.random() < 0.5:
                if rng.random() < 0.2:
                    val = 'Conti_Conti'
                else:
                    val = f'{int(rng.randint(12))}_' \
                          f'{qualities[int(rng.randint(len(qualities)))]}'
                ev.append({'name': 'Chord', 'value': val})
                emitted += 1
            for _ in range(int(rng.randint(0 if emitted else 1, 3))):
                ev.extend(note(lead=False))
        skyline_pos.append((sk_start, mid_start))
        midi_pos.append((mid_start, len(ev)))
    return skyline_pos, midi_pos, ev


@pytest.mark.parametrize('seed,key', [(0, 'C'), (1, 'e'), (2, 'G#'), (3, 'a#')])
@pytest.mark.parametrize('representation', ['functional', 'remi'])
def test_pop1k7_stage2_parity(ref, seed, key, representation):
    import copy
    from emo_disentanger_tpu.data import pop1k7 as our_p
    f = _flags(representation)
    _, _, events = _make_ce_events(seed)

    rlp, rfp, revents = ref.pop1k7.event2lead_full(
        copy.deepcopy(events), key, f['relative_chord'], f['relative_melody'])
    olp, ofp, oevents = our_p.events_to_stage2(
        copy.deepcopy(events), key, relative_chord=f['relative_chord'],
        relative_melody=f['relative_melody'])

    assert [tuple(p) for p in rlp] == [tuple(p) for p in olp]
    assert [tuple(p) for p in rfp] == [tuple(p) for p in ofp]
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]


@pytest.mark.parametrize('seed,key', [(0, 'C'), (1, 'e'), (2, 'G#'), (3, 'a#')])
@pytest.mark.parametrize('representation', ['functional', 'remi'])
def test_pop1k7_fullsong_parity(ref, seed, key, representation):
    import copy
    from emo_disentanger_tpu.data import pop1k7 as our_p
    f = _flags(representation)
    skyline_pos, midi_pos, events = _make_ce_events(seed)

    rpos, revents = ref.pop1k7.event2full(
        list(skyline_pos), list(midi_pos), copy.deepcopy(events), key,
        f['relative_chord'], f['relative_melody'])
    opos, oevents = our_p.events_to_fullsong(
        list(skyline_pos), list(midi_pos), copy.deepcopy(events), key,
        relative_chord=f['relative_chord'],
        relative_melody=f['relative_melody'])

    assert list(rpos) == list(opos)
    assert [dict(e) for e in revents] == [dict(e) for e in oevents]
