"""CLI: stage-1 training.

Preserves the reference surface (``stage1_compose/train.py:191-204``):
``-c/--configuration`` and ``-r/--representation``; config choices map to
this package's ``configs/stage1`` but arbitrary YAML paths are accepted too.
"""

import argparse
import os

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs', 'stage1')
KNOWN = ['hooktheory_pretrain.yaml', 'emopia_finetune.yaml',
         'pop1k7_pretrain.yaml', 'emopia_finetune_full.yaml']


def resolve_config(name: str) -> str:
    if os.path.exists(name):
        return name
    base = os.path.basename(name)
    cand = os.path.normpath(os.path.join(CONFIG_DIR, base))
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError(name)


def main(argv=None):
    parser = argparse.ArgumentParser(description='stage-1 (compose) training')
    required = parser.add_argument_group('required arguments')
    required.add_argument('-c', '--configuration', required=True,
                          help='training config YAML (one of {} or a path)'
                          .format(KNOWN))
    required.add_argument('-r', '--representation', required=True,
                          choices=['remi', 'functional'])
    parser.add_argument('--max_epoch', type=int, default=None)
    parser.add_argument('--n_devices', type=int, default=None)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args(argv)

    from ..train import train_stage1
    return train_stage1.run(resolve_config(args.configuration),
                            args.representation,
                            max_epoch_override=args.max_epoch,
                            n_devices=args.n_devices, seed=args.seed)


if __name__ == '__main__':
    main()
