"""Master CLI dispatch: ``python -m emo_disentanger_tpu <command> ...``."""

import sys

COMMANDS = {
    'train-stage1': ('emo_disentanger_tpu.cli.train_stage1', 'stage-1 training'),
    'train-stage2': ('emo_disentanger_tpu.cli.train_stage2', 'stage-2 training'),
    'infer-stage1': ('emo_disentanger_tpu.cli.inference_stage1', 'stage-1 generation'),
    'infer-stage2': ('emo_disentanger_tpu.cli.inference_stage2', 'stage-2 generation'),
    'midi2events': ('emo_disentanger_tpu.cli.midi2events', 'dataset tokenization'),
    'events2words': ('emo_disentanger_tpu.cli.events2words', 'vocabulary build'),
    'data-splits': ('emo_disentanger_tpu.cli.data_splits', 'train/valid splits'),
    'evaluate': ('emo_disentanger_tpu.cli.evaluate', 'objective generation metrics'),
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ('-h', '--help', 'help'):
        print('usage: python -m emo_disentanger_tpu <command> [args]\n')
        for name, (_, desc) in COMMANDS.items():
            print(f'  {name:<14} {desc}')
        return 0
    cmd = sys.argv[1]
    if cmd not in COMMANDS:
        print(f'unknown command {cmd!r}; try --help')
        return 1
    import importlib
    mod = importlib.import_module(COMMANDS[cmd][0])
    return mod.main(sys.argv[2:])


if __name__ == '__main__':
    sys.exit(main() or 0)
