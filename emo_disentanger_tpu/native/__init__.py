"""ctypes bindings for the native C++ data-pipeline kernels (``csrc/``).

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-numpy fallback so the framework works without a toolchain.
``AVAILABLE`` reports whether the native library loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), '..', '..', 'csrc',
                    'emodis_native.cpp')
_LIB = os.path.join(os.path.dirname(_SRC), 'libemodis_native.so')

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(src):
        return False
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', src, '-o', lib],
            check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(os.path.abspath(_LIB))
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    p64 = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
    p32 = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.quantize_notes.argtypes = [i64, p64, p64, p64, i64, i64, i64,
                                   p64, i64, p64, i64, p64, p64, p64, p64]
    lib.make_stage2_target.argtypes = [i64, p32, i64, p64, p64, i32, i32,
                                       p32, p32]
    lib.pad_batch.argtypes = [i64, i64, p32, p64, p64, i32, p32]
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def quantize_notes(starts: np.ndarray, ends: np.ndarray, velocities: np.ndarray,
                   shift_ticks: int, tick_resol: int, bar_resol: int,
                   vel_bins: np.ndarray, shift_bins: np.ndarray,
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-note quantization; returns (quant_time, duration(-1=drop),
    velocity bin, shift bin)."""
    n = len(starts)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    ends = np.ascontiguousarray(ends, dtype=np.int64)
    velocities = np.ascontiguousarray(velocities, dtype=np.int64)
    vel_bins = np.ascontiguousarray(vel_bins, dtype=np.int64)
    shift_bins = np.ascontiguousarray(shift_bins, dtype=np.int64)

    lib = _load()
    if lib is not None:
        qt = np.empty(n, dtype=np.int64)
        dur = np.empty(n, dtype=np.int64)
        vel = np.empty(n, dtype=np.int64)
        shift = np.empty(n, dtype=np.int64)
        lib.quantize_notes(n, starts, ends, velocities, shift_ticks,
                           tick_resol, bar_resol, vel_bins, len(vel_bins),
                           shift_bins, len(shift_bins), qt, dur, vel, shift)
        return qt, dur, vel, shift

    # numpy fallback
    s = starts - shift_ticks
    qt = (np.round(s / tick_resol) * tick_resol).astype(np.int64)
    vel = vel_bins[np.argmin(np.abs(vel_bins[None, :] - velocities[:, None]), axis=1)]
    shift = shift_bins[np.argmin(np.abs(shift_bins[None, :] - (s - qt)[:, None]), axis=1)]
    dur = np.minimum(ends - starts, bar_resol)
    dur = (np.round(dur / tick_resol) * tick_resol).astype(np.int64)
    dur = np.where(dur == 0, -1, dur)
    return qt, dur, vel, shift


def make_stage2_target(inp: np.ndarray, full_starts: np.ndarray,
                       full_ends: np.ndarray, pad_id: int, eos_id: int,
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Stage-2 target + track mask from offset-adjusted full-track spans."""
    inp = np.ascontiguousarray(inp, dtype=np.int32)
    full_starts = np.ascontiguousarray(full_starts, dtype=np.int64)
    full_ends = np.ascontiguousarray(full_ends, dtype=np.int64)
    n = len(inp)

    lib = _load()
    if lib is not None:
        tgt = np.empty(n, dtype=np.int32)
        mask = np.empty(n, dtype=np.int32)
        lib.make_stage2_target(n, inp, len(full_starts), full_starts,
                               full_ends, pad_id, eos_id, tgt, mask)
        return tgt, mask

    tgt = np.full(n, pad_id, dtype=np.int32)
    mask = np.zeros(n, dtype=np.int32)
    n_bars = len(full_starts)
    for b in range(n_bars):
        f0, f1 = int(full_starts[b]), int(full_ends[b])
        if f0 >= n:
            break
        mask[f0:min(f1, n)] = 1
        if b != n_bars - 1:
            hi = min(f1, n - 1)
            tgt[f0:hi] = inp[f0 + 1:hi + 1]
        else:
            hi = min(f1 - 1, n - 1)
            tgt[f0:hi] = inp[f0 + 1:hi + 1]
            if 0 <= f1 - 1 < n:
                tgt[f1 - 1] = eos_id
    return tgt, mask


def pad_batch(rows, max_len: int, pad_id: int) -> np.ndarray:
    """List of int32 token rows -> [B, max_len] padded matrix."""
    batch = len(rows)
    rows = [np.ascontiguousarray(r, dtype=np.int32) for r in rows]
    lib = _load()
    if lib is None:
        out = np.full((batch, max_len), pad_id, dtype=np.int32)
        for i, r in enumerate(rows):
            n = min(len(r), max_len)
            out[i, :n] = r[:n]
        return out
    flat = np.concatenate(rows) if rows else np.zeros(0, dtype=np.int32)
    lengths = np.asarray([len(r) for r in rows], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    out = np.empty((batch, max_len), dtype=np.int32)
    lib.pad_batch(batch, max_len, flat, lengths, offsets, pad_id, out)
    return out
