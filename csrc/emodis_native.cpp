// Native data-pipeline kernels for emo-disentanger-tpu.
//
// The reference's host-side hot paths run through torch's C++ DataLoader
// machinery (24 worker processes, stage1_compose/train.py:260); this library
// is the TPU framework's native equivalent: the per-note quantization inner
// loops of the tokenizer and the per-epoch batch/target packing of the
// datasets, callable from Python via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC emodis_native.cpp -o libemodis_native.so

#include <cstdint>
#include <cstdlib>
#include <cmath>
#include <algorithm>

extern "C" {

// Snap value to the nearest bin (ties to the lower bin, matching
// numpy argmin(abs(bins - v)) with first-match semantics).
static inline int64_t nearest_bin(const int64_t* bins, int64_t n, double v) {
    // bins are sorted ascending; binary search then compare neighbours
    int64_t lo = 0, hi = n - 1;
    if (v <= (double)bins[0]) return bins[0];
    if (v >= (double)bins[n - 1]) return bins[n - 1];
    while (hi - lo > 1) {
        int64_t mid = (lo + hi) / 2;
        if ((double)bins[mid] <= v) lo = mid; else hi = mid;
    }
    double dlo = std::fabs(v - (double)bins[lo]);
    double dhi = std::fabs(v - (double)bins[hi]);
    return (dlo <= dhi) ? bins[lo] : bins[hi];
}

// Round to the grid exactly like numpy's round-half-to-even:
// q = round(t / resol) * resol.
static inline int64_t quantize_tick(double tick, int64_t resol) {
    double x = tick / (double)resol;
    double r = std::nearbyint(x);       // banker's rounding in default FE mode
    return (int64_t)r * resol;
}

// Quantize n notes: grid-snap starts, bin velocities and onset shifts,
// round durations (cap at bar_resol, zero durations flagged with -1).
// Mirrors midi2events quantization (reference midi2events_emopia.py:261-295).
void quantize_notes(
    int64_t n,
    const int64_t* starts, const int64_t* ends, const int64_t* velocities,
    int64_t shift_ticks, int64_t tick_resol, int64_t bar_resol,
    const int64_t* vel_bins, int64_t n_vel,
    const int64_t* shift_bins, int64_t n_shift,
    int64_t* out_qt, int64_t* out_dur, int64_t* out_vel, int64_t* out_shift)
{
    for (int64_t i = 0; i < n; ++i) {
        int64_t start = starts[i] - shift_ticks;
        int64_t qt = quantize_tick((double)start, tick_resol);
        out_qt[i] = qt;
        out_vel[i] = nearest_bin(vel_bins, n_vel, (double)velocities[i]);
        out_shift[i] = nearest_bin(shift_bins, n_shift, (double)(start - qt));
        int64_t dur = ends[i] - starts[i];
        if (dur > bar_resol) dur = bar_resol;
        dur = quantize_tick((double)dur, tick_resol);
        out_dur[i] = (dur == 0) ? -1 : dur;   // -1 => drop the note
    }
}

// Build the stage-2 training target and track mask from full-track spans.
// Mirrors REMISkylineToMidiTransformerDataset.make_target_and_mask
// (reference stage2_accompaniment/dataloader.py:127-144): targets are PAD
// outside the spans; inside, target = next input token; the last span's last
// position targets EOS.
void make_stage2_target(
    int64_t seq_len,
    const int32_t* inp,
    int64_t n_bars,
    const int64_t* full_starts, const int64_t* full_ends,  // offset-adjusted
    int32_t pad_id, int32_t eos_id,
    int32_t* out_tgt, int32_t* out_mask)
{
    for (int64_t i = 0; i < seq_len; ++i) {
        out_tgt[i] = pad_id;
        out_mask[i] = 0;
    }
    for (int64_t b = 0; b < n_bars; ++b) {
        int64_t f0 = full_starts[b];
        int64_t f1 = full_ends[b];
        if (f0 >= seq_len) break;
        int64_t hi_mask = std::min(f1, seq_len);
        for (int64_t i = f0; i < hi_mask; ++i) out_mask[i] = 1;
        if (b != n_bars - 1) {
            int64_t hi = std::min(f1, seq_len - 1);
            for (int64_t i = f0; i < hi; ++i) out_tgt[i] = inp[i + 1];
        } else {
            int64_t hi = std::min(f1 - 1, seq_len - 1);
            for (int64_t i = f0; i < hi; ++i) out_tgt[i] = inp[i + 1];
            if (f1 - 1 < seq_len && f1 - 1 >= 0) out_tgt[f1 - 1] = eos_id;
        }
    }
}

// Pad a batch of variable-length token rows into a fixed [B, L] int32 matrix.
void pad_batch(
    int64_t batch, int64_t max_len,
    const int32_t* flat, const int64_t* lengths, const int64_t* offsets,
    int32_t pad_id, int32_t* out)
{
    for (int64_t b = 0; b < batch; ++b) {
        int64_t len = std::min(lengths[b], max_len);
        const int32_t* src = flat + offsets[b];
        int32_t* dst = out + b * max_len;
        for (int64_t i = 0; i < len; ++i) dst[i] = src[i];
        for (int64_t i = len; i < max_len; ++i) dst[i] = pad_id;
    }
}

}  // extern "C"
