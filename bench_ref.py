"""Measure the REFERENCE's own decode code (torch, CPU) — the BASELINE.md
mandate to anchor `vs_baseline` against the reference itself rather than
only an in-framework reimplementation.

What can and cannot be measured in this container:

* stage-1 TXL decode — MEASURED below: the reference's actual
  ``generate_plain_xl`` (``stage1_compose/inference_utils.py:51-135``)
  driving the reference's ``PlainTransformer`` at the production
  12L/8H/512d shape on CPU with the published sampling settings.
* stage-2 Performer — NOT runnable: ``pytorch-fast-transformers`` (CUDA-era
  build) cannot be installed here; the reference model class fails at
  import.  `bench.py`'s in-framework window re-forward (same math, same
  chip) remains the stage-2 baseline.
* stage-2 GPT-2 — NOT runnable: the reference targets transformers 4.28;
  the installed 4.57 removed the APIs its ``MusicGPT2`` uses.

Requires /root/reference; prints one JSON line per measured metric.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))

N_EVENTS = 64          # enough steps to amortize the first-iteration cost
MODEL = dict(n_layer=12, n_head=8, d_model=512, d_ff=2048, d_embed=512)


def main():
    import ref_loader
    if not ref_loader.available():
        print(json.dumps({'error': '/root/reference not mounted'}))
        return
    import numpy as np
    import torch
    from test_stream_parity import _load_ref_inference_utils, _vocab

    torch.set_num_threads(os.cpu_count() or 8)
    vocab = _vocab()
    m = ref_loader.load_stage1_models()
    torch.manual_seed(3)
    ref_model = m.plain_transformer.PlainTransformer(
        MODEL['d_embed'], vocab.size, MODEL['n_layer'], MODEL['n_head'],
        MODEL['d_model'], MODEL['d_ff'], 160, 800,
        dec_dropout=0.0, pre_lnorm=True)
    ref_model.eval()
    riu = _load_ref_inference_utils()

    primer = ['Emotion_Positive']
    np.random.seed(0)
    t0 = time.perf_counter()
    with torch.no_grad():
        # remi representation skips the key-determine step (a random-weight
        # model rarely samples a Key token first, which would abort)
        tokens, _ = riu.generate_plain_xl(
            ref_model, vocab.event2idx, vocab.idx2event,
            max_bars=128, max_events=N_EVENTS, primer=primer,
            temp=1.2, top_p=0.97, representation='remi',
            key_determine=None)
    secs = time.perf_counter() - t0
    n = len(tokens) if tokens is not None else N_EVENTS
    print(json.dumps({
        'metric': 'REFERENCE stage-1 TXL decode, its own generate_plain_xl '
                  '(torch CPU, 12L/8H/512d, T=1.2 p=0.97, single stream)',
        'value': round(n / secs, 2),
        'unit': 'tokens/sec',
        'detail': {'events': int(n), 'seconds': round(secs, 2),
                   'torch_threads': torch.get_num_threads()},
    }))


if __name__ == '__main__':
    main()
