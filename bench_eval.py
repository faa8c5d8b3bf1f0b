"""Quality-regression artifact: objective per-quadrant generation metrics.

Serving speedups must not silently degrade output sanity, so each round
checks in an ``EVAL_r{N}.json`` built from the TRAINED-recipe pipeline:
production-shape models trained to loss plateau on the synthetic corpus
(``bench_e2e.train_production``), stage-1 lead sheets for both valences,
stage-2 performances for all four arousal quadrants, then
``cli/evaluate.py``'s objective correlates (key-mode ratio, scale
consistency, note density, velocity/tempo means, groove) aggregated per
quadrant.  The measurable expectations mirror the paper's claims
(reference README.md:2; evaluation itself lives outside the reference
repo): Q1/Q4 (positive valence) lean major-mode, Q2/Q3 minor; the
synthetic corpus carries no arousal signal, so density/velocity contrasts
are tracked, not asserted.

Run on the chip: ``python bench_eval.py [out.json]`` — prints the report
and writes it (default ``EVAL_r05.json`` next to this file).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), 'tests'))


def run_eval(n_files=16, s1_steps=150, s2_steps=250, s2_bars=8,
             s2_events=1500, s1_batch=8, s2_batch=32):
    import bench_e2e
    from helpers import write_stage1_corpus, write_stage2_corpus
    from emo_disentanger_tpu.cli.evaluate import evaluate_dir
    from emo_disentanger_tpu.infer.stage1_batch import Stage1BatchGenerator
    from emo_disentanger_tpu.infer.stage2_batch import Stage2BatchGenerator
    from emo_disentanger_tpu.utils.precision import cast_params

    t0 = time.time()
    tmp = tempfile.mkdtemp(prefix='bench_eval_')
    try:
        s1_dir, s1_vocab, _ = write_stage1_corpus(
            os.path.join(tmp, 'corpus1'), n_pieces=24, n_bars=8)
        s2_dir, s2_vocab, _ = write_stage2_corpus(
            os.path.join(tmp, 'corpus2'), n_pieces=24, n_bars=8)
        vocab = bench_e2e.union_vocab([s1_vocab, s2_vocab])

        p1, p2, omegas, info = bench_e2e.train_production(
            vocab, s1_dir, s2_dir, s1_steps=s1_steps, s2_steps=s2_steps)
        s1, _, s2, _, _ = bench_e2e.build_models(vocab)
        gen1 = Stage1BatchGenerator(s1, cast_params(p1), vocab,
                                    batch=s1_batch, temp=1.2, top_p=0.97,
                                    max_events=bench_e2e.S1_EVENTS,
                                    max_bars=128)
        gen2 = Stage2BatchGenerator(s2, cast_params(p2), vocab,
                                    batch=s2_batch, temp=1.1, top_p=0.99,
                                    max_events=s2_events,
                                    max_bar_tokens=256, max_bars=s2_bars,
                                    omegas=omegas)

        out_dir = os.path.join(tmp, 'gen_eval')
        files, _, _ = bench_e2e.stage1_to_files(
            gen1, vocab, out_dir, seed=11, n_files=n_files,
            s1_batch=s1_batch)
        bench_e2e.stage2_render(gen2, vocab, files, out_dir, seed=12,
                                s2_batch=s2_batch, s2_bars=s2_bars,
                                write_txt=True)
        report = evaluate_dir(out_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    return {
        'metric': 'objective generation metrics per quadrant '
                  '(TRAINED synthetic-corpus recipe, production shapes, '
                  f'{n_files} lead sheets x 2 quadrants each)',
        'train_info': info,
        'quadrants': report,
        'wall_seconds': round(time.time() - t0, 1),
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'EVAL_r05.json')
    result = run_eval()
    print(json.dumps(result, indent=1))
    with open(out_path, 'w') as f:
        json.dump(result, f, indent=1)


if __name__ == '__main__':
    main()
