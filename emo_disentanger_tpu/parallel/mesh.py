"""Device mesh and sharding rules.

The reference is strictly single-process single-GPU (no ``torch.distributed``
anywhere; ``stage2_accompaniment/train.py:234``).  This framework trains
data-parallel over a ``jax.sharding.Mesh`` as a first-class capability:

* mesh axes ``('dp', 'tp')`` — batch sharded over ``dp``; ``tp`` is available
  for sharding the vocab projection / attention heads of larger variants
  (the 39M reference-scale models replicate parameters, letting XLA insert
  gradient psums over ICI via jit's partitioner);
* works identically on a real TPU slice and on the virtual
  ``--xla_force_host_platform_device_count`` CPU mesh used in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1) -> Mesh:
    """Build a ('dp', 'tp') mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % tp:
        raise ValueError(f'n_devices={n_devices} not divisible by tp={tp}')
    dp = n_devices // tp
    grid = np.asarray(devices[:n_devices]).reshape(dp, tp)
    return Mesh(grid, ('dp', 'tp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate the rest."""
    return NamedSharding(mesh, P('dp'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays with B sharded over dp.

    On a 1-device mesh a plain device_put is used: NamedSharding-committed
    arrays trigger a pathological reshard path on some single-device
    platforms (axon relay) even though the sharding is a no-op.
    """
    if mesh.size == 1:
        return jax.tree_util.tree_map(jax.device_put, batch)
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if getattr(x, 'ndim', 0) >= 1 else x,
        batch)


def dp_padded_batch_size(mesh: Mesh, batch_size: int) -> int:
    """Smallest batch size >= ``batch_size`` divisible by the mesh's dp
    axis.  Batch-sharded device_put requires dim 0 % dp == 0; drivers pad
    short/odd batches with PAD-target rows (zero loss weight) up to this."""
    dp = mesh.shape.get('dp', mesh.size)
    return -(-batch_size // dp) * dp


def pad_batch_to(batch: dict, batch_size: int) -> dict:
    """Pad a possibly-short final batch up to ``batch_size`` by repeating the
    last row (keeps shapes static for jit; metrics weight by true size)."""
    import numpy as np
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim >= 1 and v.shape[0] < batch_size:
            reps = np.repeat(v[-1:], batch_size - v.shape[0], axis=0)
            v = np.concatenate([v, reps], axis=0)
        out[k] = v
    return out
