"""Small IO helpers (reference: ``representations/utils.py``, torch-free)."""

from __future__ import annotations

import json
import pickle
from typing import Any

import yaml


def pickle_load(path: str) -> Any:
    with open(path, 'rb') as f:
        return pickle.load(f)


def pickle_dump(obj: Any, path: str) -> None:
    with open(path, 'wb') as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def json_read(path: str) -> Any:
    with open(path, 'r') as f:
        return json.load(f)


def json_write(obj: Any, path: str) -> None:
    with open(path, 'w') as f:
        json.dump(obj, f)


def load_yaml(path: str) -> dict:
    with open(path, 'r') as f:
        return yaml.safe_load(f)
