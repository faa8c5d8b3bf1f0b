"""Single-process dropout bit-economy A/B (round-5 task, VERDICT r4 #3).

``EMODIS_DROPOUT_BITECON`` is read at TRACE time (models/dropout.py), so
one process can time both variants by building a fresh train step after
flipping the env var — avoiding the relay's between-process compile
variance.  ROOFLINE.md ceiling item 2 projects ~10 ms/step recovered at
the production shape (B=16, L=3072, bf16 compute), lifting MFU ~27.7% ->
~30%.  Prints one JSON line per variant plus the verdict line.

Run on the chip: ``python bench_bitecon.py``.
"""

import json
import os

import jax.numpy as jnp

import bench_extra


def main():
    results = {}
    for flag in ('0', '1'):
        os.environ['EMODIS_DROPOUT_BITECON'] = flag
        tps, mfu = bench_extra.bench_train_step(batch=16, seqlen=3072,
                                                dtype=jnp.bfloat16)
        name = 'bitecon' if flag == '1' else 'baseline'
        results[name] = tps
        print(json.dumps({'metric': 'dropout bit-economy A/B train step '
                                    '(B=16, L=3072, bf16 compute / f32 '
                                    'master+Adam)',
                          'variant': name,
                          'value': round(tps, 1),
                          'mfu': round(mfu, 4),
                          'unit': 'tokens/sec/chip'}), flush=True)
    ms_base = 16 * 3072 / results['baseline'] * 1e3
    ms_bit = 16 * 3072 / results['bitecon'] * 1e3
    print(json.dumps({'metric': 'dropout bit-economy verdict',
                      'ms_per_step_baseline': round(ms_base, 2),
                      'ms_per_step_bitecon': round(ms_bit, 2),
                      'recovered_ms': round(ms_base - ms_bit, 2),
                      'speedup': round(results['bitecon']
                                       / results['baseline'], 4)}),
          flush=True)


if __name__ == '__main__':
    main()
