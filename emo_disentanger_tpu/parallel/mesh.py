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


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              dcn: int = 1) -> Mesh:
    """Build a device mesh.

    ``dcn == 1`` (default): a ('dp', 'tp') single-slice mesh — batch over
    dp, optional tensor parallelism over tp, all collectives on ICI.

    ``dcn > 1``: a ('dcn', 'dp', 'tp') multi-slice mesh — the standard
    multi-slice recipe: pure data parallelism across slices (gradient
    all-reduce rides DCN once per step), dp/tp within each slice on ICI.
    When the runtime exposes slice topology (``device.slice_index``),
    devices are grouped so the ``dcn`` axis aligns with real slice
    boundaries; otherwise (CPU test meshes) a plain reshape emulates it.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % (tp * dcn):
        raise ValueError(
            f'n_devices={n_devices} not divisible by tp*dcn={tp * dcn}')
    dp = n_devices // (tp * dcn)
    devs = devices[:n_devices]
    if dcn == 1:
        grid = np.asarray(devs).reshape(dp, tp)
        return Mesh(grid, ('dp', 'tp'))
    slice_ids = [getattr(d, 'slice_index', None) for d in devs]
    if all(s is not None for s in slice_ids):
        # real multi-slice topology: the dcn axis MUST align with slice
        # boundaries, otherwise the inner ('dp','tp') ICI axes would
        # silently straddle DCN links
        n_slices = len(set(slice_ids))
        if n_slices != dcn:
            raise ValueError(
                f'dcn={dcn} does not match the runtime topology '
                f'({n_slices} slices over the first {n_devices} devices)')
        by_slice = {}
        for d, s in zip(devs, slice_ids):
            by_slice.setdefault(s, []).append(d)
        rows = [by_slice[s] for s in sorted(by_slice)]
        if not all(len(r) == dp * tp for r in rows):
            raise ValueError(
                f'uneven devices per slice: {[len(r) for r in rows]}')
        grid = np.asarray(rows).reshape(dcn, dp, tp)
    else:
        # no slice topology exposed (CPU test meshes): emulate via reshape
        grid = np.asarray(devs).reshape(dcn, dp, tp)
    return Mesh(grid, ('dcn', 'dp', 'tp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axes ((dcn, dp) on a
    multi-slice mesh, dp otherwise), replicate the rest."""
    if 'dcn' in mesh.axis_names:
        return NamedSharding(mesh, P(('dcn', 'dp')))
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
    dp = mesh.shape.get('dp', mesh.size) * mesh.shape.get('dcn', 1)
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
