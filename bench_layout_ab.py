"""Single-process decode-state layout A/B (round-5 task, VERDICT r4 #2).

Times the REAL decode scans from ``bench_extra`` under each plumbed
memory layout in ONE process, so the comparison is not confounded by the
axon relay's between-process compile variance (CLAUDE.md: the same sub
can take 230s in one fresh process and >480s in another — but steady-state
*run* timing within a process is stable):

  * stage-2 GPT-2 KV cache:   'khd' (production) vs 'dk' (K-in-lanes)
  * stage-2 Performer FAVOR S: 'md' (production) vs 'dm' (transposed)

Stage-1 TXL ('khd'/'hkd'/'dk') is covered by ``bench_s1_layout.py``'s
``model_level`` pass, which already runs all three in one process.

ROOFLINE.md §decode predicts 'dk' ~2x on the GPT-2 whole-cache read and
'dm' ~1.3x on the Performer state update ([B,M,Dh]=f32 [16,128,64] pads
Dh 64->128 lanes).  Prints one JSON line per measurement.

Run on the chip: ``python bench_layout_ab.py``.
"""

import json

import bench_extra


def main():
    for layout in ('khd', 'dk'):
        tps = bench_extra.bench_gpt2(16, layout=layout)
        print(json.dumps({'metric': 'layout A/B stage2_gpt2 decode',
                          'batch': 16, 'layout': layout,
                          'value': round(tps, 1),
                          'unit': 'tokens/sec/chip'}), flush=True)
    for layout in ('md', 'dm'):
        tps = bench_extra.bench_performer(16, state_layout=layout)
        print(json.dumps({'metric': 'layout A/B stage2_performer decode',
                          'batch': 16, 'state_layout': layout,
                          'value': round(tps, 1),
                          'unit': 'tokens/sec/chip'}), flush=True)


if __name__ == '__main__':
    main()
