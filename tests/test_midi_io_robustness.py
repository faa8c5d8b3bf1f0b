"""Real-world SMF robustness: hand-crafted adversarial files a foreign
producer could emit (the reference leans on battle-tested miditoolkit,
``midi2events_emopia.py:9,65``; ``data/midi_io.py`` owns the format here and
must survive the same wild inputs).

Each quirk gets a byte-level fixture NOT produced by our own writer:
running status, format 0, PPQN != 480, velocity-0 note-offs, interleaved
multi-track/multi-channel events, unsorted-across-tracks and duplicate
tempo/marker events.  Asserts: parse -> write -> parse fixpoint on musical
content, and tokenizer non-crash through analyze/quantize/leadsheet.
"""

import struct

from emo_disentanger_tpu.data.midi_io import MidiFile
from emo_disentanger_tpu.data.emopia import (
    analyze_midi, quantize_to_corpus, corpus_to_leadsheet,
)


def vl(n: int) -> bytes:
    out = bytearray([n & 0x7F])
    n >>= 7
    while n:
        out.insert(0, 0x80 | (n & 0x7F))
        n >>= 7
    return bytes(out)


def meta(dt: int, mtype: int, payload: bytes) -> bytes:
    return vl(dt) + bytes([0xFF, mtype]) + vl(len(payload)) + payload


def tempo_ev(dt: int, bpm: int) -> bytes:
    return meta(dt, 0x51, int(60_000_000 / bpm).to_bytes(3, 'big'))


def marker_ev(dt: int, text: str) -> bytes:
    return meta(dt, 0x06, text.encode())


def timesig_ev(dt: int) -> bytes:
    return meta(dt, 0x58, bytes([4, 2, 24, 8]))


def trk(body: bytes) -> bytes:
    body = body + vl(0) + b'\xff\x2f\x00'
    return b'MTrk' + struct.pack('>I', len(body)) + body


def smf(fmt: int, division: int, tracks) -> bytes:
    return (b'MThd' + struct.pack('>IHHH', 6, fmt, len(tracks), division)
            + b''.join(trk(t) for t in tracks))


def _tokenize(m: MidiFile):
    """Tokenizer non-crash contract: analyze -> quantize -> lead sheet."""
    reg = analyze_midi(m, 'C', melody_only=True)
    corpus = quantize_to_corpus(reg)
    pos, events = corpus_to_leadsheet(corpus, 'Positive')
    assert len(events) > 0 and len(pos) > 0
    return events


def _fixpoint(m: MidiFile):
    """parse(write(m)) preserves the musical content."""
    r = MidiFile.parse_bytes(m.to_bytes())
    assert r.ticks_per_beat == m.ticks_per_beat
    a = sorted((n.pitch, n.start, n.end, n.velocity)
               for i in m.instruments for n in i.notes)
    b = sorted((n.pitch, n.start, n.end, n.velocity)
               for i in r.instruments for n in i.notes)
    assert a == b
    assert ([(round(t.tempo), t.time) for t in r.tempo_changes]
            == [(round(t.tempo), t.time) for t in m.tempo_changes])
    assert ([(mk.text, mk.time) for mk in r.markers]
            == [(mk.text, mk.time) for mk in m.markers])
    return r


def test_format0_running_status_velocity0_noteoffs():
    """Format 0: meta + markers + notes share ONE track; note-ons reuse the
    status byte (running status) and close via velocity-0 note-ons."""
    body = (
        timesig_ev(0)
        + tempo_ev(0, 120)
        + marker_ev(0, 'C_maj_C')
        + vl(0) + bytes([0x90, 60, 80])       # note-on C4
        + vl(0) + bytes([64, 80])             # running status: on E4
        + vl(480) + bytes([60, 0])            # running: vel-0 off C4
        + vl(0) + bytes([64, 0])              # running: vel-0 off E4
        + marker_ev(0, 'G_7_G')
        + vl(0) + bytes([0x90, 67, 80])       # on G4 at tick 480
        + vl(480) + bytes([0x80, 67, 64])     # explicit off at 960
    )
    m = MidiFile.parse_bytes(smf(0, 480, [body]))
    assert m.ticks_per_beat == 480
    notes = sorted((n.pitch, n.start, n.end) for i in m.instruments
                   for n in i.notes)
    assert notes == [(60, 0, 480), (64, 0, 480), (67, 480, 960)]
    assert [(mk.text, mk.time) for mk in m.markers] == [
        ('C_maj_C', 0), ('G_7_G', 480)]
    assert [(round(t.tempo), t.time) for t in m.tempo_changes] == [(120, 0)]
    _fixpoint(m)
    _tokenize(m)


def test_unsorted_across_tracks_and_duplicate_meta():
    """Tempo/marker events landing out of order across tracks, plus
    duplicates at the same tick, must come back sorted and intact."""
    conductor_late = tempo_ev(0, 90) + tempo_ev(1920, 60) + tempo_ev(0, 60)
    conductor_early = (marker_ev(0, 'C_maj_C') + marker_ev(0, 'C_maj_C')
                       + tempo_ev(480, 120) + marker_ev(1440, 'G_7_G'))
    notes = (vl(0) + bytes([0x90, 60, 80])
             + vl(960) + bytes([0x80, 60, 64])
             + vl(0) + bytes([0x90, 64, 80])
             + vl(480) + bytes([0x80, 64, 64]))
    m = MidiFile.parse_bytes(
        smf(1, 480, [conductor_late, conductor_early, notes]))
    times = [t.time for t in m.tempo_changes]
    assert times == sorted(times) and times == [0, 480, 1920, 1920]
    assert [mk.time for mk in m.markers] == [0, 0, 1920]
    _fixpoint(m)
    _tokenize(m)


def test_non480_ppqn_rescale_and_tokenize():
    """PPQN=960 file: raw ticks are double; to_resolution(480) brings the
    content onto the tokenizer grid."""
    body = (
        tempo_ev(0, 110)
        + marker_ev(0, 'C_maj_C')
        + vl(0) + bytes([0x90, 60, 80])
        + vl(960) + bytes([0x80, 60, 64])      # one beat at 960 PPQN
        + marker_ev(0, 'F_min_F')              # tick 960 (=beat 1)
        + vl(0) + bytes([0x90, 65, 80])
        + vl(1920) + bytes([0x80, 65, 64])     # two beats
    )
    m = MidiFile.parse_bytes(smf(0, 960, [body]))
    assert m.ticks_per_beat == 960
    r = m.to_resolution(480)
    assert r.ticks_per_beat == 480
    notes = sorted((n.pitch, n.start, n.end) for i in r.instruments
                   for n in i.notes)
    assert notes == [(60, 0, 480), (65, 480, 1440)]
    assert [mk.time for mk in r.markers] == [0, 480]
    # original object untouched
    assert m.instruments[0].notes[0].end == 960
    _fixpoint(r)
    evs = _tokenize(r)
    assert any(e['name'] == 'Note_Pitch' and e['value'] == 60 for e in evs
               if isinstance(e, dict)) or len(evs) > 3


def test_odd_ppqn_rounding():
    """PPQN=96 (old-school sequencer): rescale factor 5, exact."""
    body = (tempo_ev(0, 100)
            + marker_ev(0, 'C_maj_C')
            + vl(0) + bytes([0x90, 62, 70])
            + vl(96) + bytes([0x80, 62, 64])
            + vl(0) + bytes([0x90, 65, 70])
            + vl(96) + bytes([0x80, 65, 64]))
    m = MidiFile.parse_bytes(smf(0, 96, [body])).to_resolution(480)
    ns = sorted((n.start, n.end) for n in m.instruments[0].notes)
    assert ns == [(0, 480), (480, 960)]
    _tokenize(m)


def test_interleaved_channels_one_track():
    """One track, two channels with interleaved on/offs: note pairing is
    per (channel, pitch), so same-pitch notes on different channels must
    not steal each other's note-offs."""
    body = (
        tempo_ev(0, 120)
        + marker_ev(0, 'C_maj_C')
        + vl(0) + bytes([0x90, 60, 80])        # ch0 on C4
        + vl(0) + bytes([0x91, 60, 90])        # ch1 on C4
        + vl(240) + bytes([0x80, 60, 64])      # ch0 off at 240
        + vl(240) + bytes([0x81, 60, 64])      # ch1 off at 480
    )
    m = MidiFile.parse_bytes(smf(0, 480, [body]))
    notes = sorted((n.start, n.end, n.velocity) for i in m.instruments
                   for n in i.notes)
    assert notes == [(0, 240, 80), (0, 480, 90)]


def test_dangling_note_and_cc_noise():
    """Unclosed note-on at end of track is closed at track end; CC/pitch
    bend/aftertouch/program/sysex bytes are skipped without derailing."""
    body = (
        tempo_ev(0, 120)
        + marker_ev(0, 'C_maj_C')
        + vl(0) + bytes([0xC0, 5])              # program change
        + vl(0) + bytes([0xB0, 64, 127])        # sustain CC
        + vl(0) + bytes([0xE0, 0x00, 0x40])     # pitch bend
        + vl(0) + bytes([0xA0, 60, 50])         # aftertouch
        + vl(0) + bytes([0xF0]) + vl(3) + b'\x01\x02\xf7'   # sysex
        + vl(0) + bytes([0x90, 60, 80])
        + vl(240) + bytes([0xD0, 10])           # channel pressure
        + vl(240)                                # dangling: no note-off
    ) + b'\x90\x62\x70'                          # second on, also dangling
    m = MidiFile.parse_bytes(smf(0, 480, [body]))
    notes = sorted((n.pitch, n.start) for i in m.instruments
                   for n in i.notes)
    assert (60, 0) in notes
    assert m.instruments[0].program == 5


def test_smpte_division_rejected():
    data = b'MThd' + struct.pack('>IHHH', 6, 0, 1, 0xE250)
    try:
        MidiFile.parse_bytes(data)
    except ValueError as e:
        assert 'SMPTE' in str(e)
    else:
        raise AssertionError('SMPTE division must be rejected')
