"""Parameter precision casting for inference.

Weights stream from HBM every decode step; storing them in bfloat16 halves
the traffic on the latency-bound B=1 path and feeds the MXU natively.
Training keeps float32 master weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params(params, dtype=jnp.bfloat16):
    """Cast all float32 leaves of a param tree to ``dtype``."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x,
        params)
