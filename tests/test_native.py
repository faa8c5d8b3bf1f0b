"""Native C++ kernels vs their numpy fallbacks (and vs the Python dataset)."""

import numpy as np
import pytest

from emo_disentanger_tpu import native
from emo_disentanger_tpu.core.quantize import (
    DEFAULT_VELOCITY_BINS, DEFAULT_SHIFT_BINS, TICK_RESOL, BAR_RESOL,
)


def test_native_builds():
    assert native.AVAILABLE, 'g++ build of csrc/emodis_native.cpp failed'


def test_quantize_notes_matches_python():
    rng = np.random.RandomState(0)
    n = 500
    starts = rng.randint(0, 20000, size=n).astype(np.int64)
    ends = starts + rng.randint(1, 4000, size=n)
    vels = rng.randint(1, 128, size=n).astype(np.int64)

    qt, dur, vel, shift = native.quantize_notes(
        starts, ends, vels, shift_ticks=1920, tick_resol=TICK_RESOL,
        bar_resol=BAR_RESOL, vel_bins=DEFAULT_VELOCITY_BINS,
        shift_bins=DEFAULT_SHIFT_BINS)

    # scalar reference (core.quantize semantics)
    from emo_disentanger_tpu.core.quantize import nearest_bin, quantize_tick
    for i in range(n):
        s = starts[i] - 1920
        want_qt = quantize_tick(s)
        assert qt[i] == want_qt
        assert vel[i] == nearest_bin(DEFAULT_VELOCITY_BINS, vels[i])
        assert shift[i] == nearest_bin(DEFAULT_SHIFT_BINS, s - want_qt)
        d = min(ends[i] - starts[i], BAR_RESOL)
        d = quantize_tick(d)
        assert dur[i] == (d if d else -1)


def test_make_stage2_target_matches_dataset_python():
    rng = np.random.RandomState(1)
    n = 200
    inp = rng.randint(0, 50, size=n).astype(np.int32)
    pad_id, eos_id = 99, 98
    starts = np.asarray([10, 60, 120], dtype=np.int64)
    ends = np.asarray([40, 100, 180], dtype=np.int64)

    tgt, mask = native.make_stage2_target(inp, starts, ends, pad_id, eos_id)

    # expected semantics
    want_tgt = np.full(n, pad_id, dtype=np.int32)
    want_mask = np.zeros(n, dtype=np.int32)
    for b, (f0, f1) in enumerate(zip(starts, ends)):
        want_mask[f0:f1] = 1
        if b != 2:
            want_tgt[f0:f1] = inp[f0 + 1:f1 + 1]
        else:
            want_tgt[f0:f1 - 1] = inp[f0 + 1:f1]
            want_tgt[f1 - 1] = eos_id
    np.testing.assert_array_equal(tgt, want_tgt)
    np.testing.assert_array_equal(mask, want_mask)


def test_pad_batch():
    rows = [np.arange(3, dtype=np.int32), np.arange(7, dtype=np.int32),
            np.arange(0, dtype=np.int32)]
    out = native.pad_batch(rows, max_len=5, pad_id=-1)
    np.testing.assert_array_equal(out[0], [0, 1, 2, -1, -1])
    np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(out[2], [-1] * 5)
