"""Checkpointing: orbax save/load with the reference's naming convention.

The reference saves ``ep{N:03d}_loss{L:.3f}_params.pt`` / ``_optim.pt`` per
interval (``stage1_compose/train.py:317-323``).  Here each checkpoint is an
orbax directory ``ep{N:03d}_loss{L:.3f}`` holding params (and optionally the
optimizer state for resume), plus a small JSON manifest.
"""

from __future__ import annotations

import json
import os
import re
import warnings
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_RE = re.compile(r'ep(\d+)_loss([\d.]+?)(?:_params(?:\.pt)?)?$')


def checkpoint_name(epoch: int, loss: float) -> str:
    return 'ep{:03d}_loss{:.3f}'.format(epoch, loss)


_ASYNC_CKPTR = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(ckpt_dir: str, epoch: int, loss: float, params: Any,
                    opt_state: Optional[Any] = None,
                    extra: Optional[Dict] = None,
                    async_save: bool = False) -> str:
    """``async_save=True`` returns as soon as device buffers are snapshotted
    and writes in the background (orbax AsyncCheckpointer) — keeps preempt
    windows short on TPU; call :func:`wait_for_checkpoints` before exit."""
    path = os.path.abspath(os.path.join(ckpt_dir, checkpoint_name(epoch, loss)))
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()  # at most one outstanding write
        ckptr.save(os.path.join(path, 'params'), args=ocp.args.StandardSave(params))
        if opt_state is not None:
            ckptr.wait_until_finished()
            ckptr.save(os.path.join(path, 'optim'),
                       args=ocp.args.StandardSave(opt_state))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, 'params'), params)
            if opt_state is not None:
                ckptr.save(os.path.join(path, 'optim'), opt_state)
    manifest = {'epoch': epoch, 'loss': float(loss)}
    manifest.update(extra or {})
    with open(os.path.join(path, 'manifest.json'), 'w') as f:
        json.dump(manifest, f)
    return path


def wait_for_checkpoints() -> None:
    """Block until outstanding async checkpoint writes complete."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, params_template: Any,
                    opt_template: Optional[Any] = None) -> Tuple[Any, Optional[Any]]:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(os.path.join(path, 'params'), params_template)
        opt_state = None
        if opt_template is not None and os.path.isdir(os.path.join(path, 'optim')):
            opt_state = ckptr.restore(os.path.join(path, 'optim'), opt_template)
    return params, opt_state


def gc_checkpoints(ckpt_dir: str, keep_last: int,
                   keep_best: bool = True) -> list:
    """Keep-last-k retention: delete all but the ``keep_last`` most recent
    checkpoints (by epoch) — and, with ``keep_best``, always retain the
    lowest-loss one.  Returns the deleted paths.  The reference keeps every
    interval checkpoint (``stage1_compose/train.py:317-323``); long
    pretrains at ckpt_interval=1 fill disks without a policy."""
    import shutil
    if keep_last <= 0 or not os.path.isdir(ckpt_dir):
        return []
    entries = []
    for name in os.listdir(ckpt_dir):
        m = CKPT_RE.match(name)
        if m:
            entries.append((int(m.group(1)),
                            float(m.group(2).rstrip('.')), name))
    entries.sort()                                    # by epoch
    protect = {name for _, _, name in entries[-keep_last:]}
    if keep_best and entries:
        protect.add(min(entries, key=lambda e: e[1])[2])
    deleted = []
    failed = []
    for _, _, name in entries:
        if name not in protect:
            path = os.path.join(ckpt_dir, name)
            # CKPT_RE also matches file-form checkpoints (.pt exports):
            # rmtree is a no-op on files, so pick the right removal and
            # only report paths that actually went away
            try:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                else:
                    os.remove(path)
            except OSError:
                pass
            if os.path.exists(path):
                failed.append(path)   # e.g. rmtree died midway
            else:
                deleted.append(path)
    if failed:
        # observable, non-fatal: GC runs inside the training loop
        warnings.warn('checkpoint GC could not remove: '
                      + ', '.join(failed), RuntimeWarning)
    return deleted


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_ep = -1
    for name in os.listdir(ckpt_dir):
        m = CKPT_RE.match(name)
        if m and int(m.group(1)) > best_ep:
            best_ep = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best
