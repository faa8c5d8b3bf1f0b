"""Train/valid split builders (reference: ``representations/data_splits.py``).

EMOPIA: the provided train+val CSVs merge into the training set, the test CSV
becomes validation.  HookTheory: a 90/10 shuffled split with a fixed seed
(the reference uses ``sklearn.train_test_split(random_state=42)``; we use
sklearn when present for bit-identical splits and fall back to a seeded numpy
permutation otherwise).
"""

from __future__ import annotations

import csv
import os
import pickle
from typing import List, Tuple


def _read_clip_names(csv_path: str) -> List[str]:
    with open(csv_path, 'r') as f:
        rows = list(csv.reader(f))
    header, content = rows[0], rows[1:]
    col = header.index('clip_name')
    return [r[col] for r in content]


def split_emopia(split_dir: str, output_dir: str) -> Tuple[List[str], List[str]]:
    os.makedirs(output_dir, exist_ok=True)
    train = _read_clip_names(os.path.join(split_dir, 'train_clip.csv'))
    valid = _read_clip_names(os.path.join(split_dir, 'val_clip.csv'))
    test = _read_clip_names(os.path.join(split_dir, 'test_clip.csv'))

    train_set = [c[:-4] + '.pkl' for c in train] + [c[:-4] + '.pkl' for c in valid]
    valid_set = [c[:-4] + '.pkl' for c in test]

    with open(os.path.join(output_dir, 'train.pkl'), 'wb') as f:
        pickle.dump(train_set, f)
    with open(os.path.join(output_dir, 'valid.pkl'), 'wb') as f:
        pickle.dump(valid_set, f)
    return train_set, valid_set


def split_hooktheory(events_dir: str, output_dir: str,
                     test_size: float = 0.1, seed: int = 42) -> Tuple[List[str], List[str]]:
    os.makedirs(output_dir, exist_ok=True)
    pkl_files = os.listdir(events_dir)
    try:
        from sklearn.model_selection import train_test_split
        train_set, valid_set = train_test_split(pkl_files, test_size=test_size,
                                                random_state=seed)
    except ImportError:
        import numpy as np
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(pkl_files))
        n_valid = int(round(len(pkl_files) * test_size))
        valid_set = [pkl_files[i] for i in order[:n_valid]]
        train_set = [pkl_files[i] for i in order[n_valid:]]

    with open(os.path.join(output_dir, 'train.pkl'), 'wb') as f:
        pickle.dump(train_set, f)
    with open(os.path.join(output_dir, 'valid.pkl'), 'wb') as f:
        pickle.dump(valid_set, f)
    return list(train_set), list(valid_set)
