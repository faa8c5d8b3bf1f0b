"""Tensor-parallel parameter sharding rules.

The 39M reference-scale models replicate parameters (DP-only), but the mesh
carries a ``tp`` axis for larger variants.  These rules shard the widest
matrices over ``tp`` — attention/FF projections by output column, their
reducing counterparts by input row, and the vocabulary projection by output
column — so XLA inserts the matching all-reduces over ICI.

Param-name driven (suffix match on the flax tree path), model-agnostic across
the three families here.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix, PartitionSpec) — first match wins.  Column-parallel for
# expanding projections, row-parallel for contracting ones.
DEFAULT_RULES = [
    (('qkv_net', 'kernel'), P(None, 'tp')),
    (('c_attn', 'kernel'), P(None, 'tp')),
    (('q_proj', 'kernel'), P(None, 'tp')),
    (('k_proj', 'kernel'), P(None, 'tp')),
    (('v_proj', 'kernel'), P(None, 'tp')),
    (('r_net', 'kernel'), P(None, 'tp')),
    (('o_net', 'kernel'), P('tp', None)),
    (('attn_proj', 'kernel'), P('tp', None)),
    (('out_proj', 'kernel'), P(None, 'tp')),   # vocab / per-layer out proj
    (('fc1', 'kernel'), P(None, 'tp')),
    (('c_fc', 'kernel'), P(None, 'tp')),
    (('linear1', 'kernel'), P(None, 'tp')),
    (('fc2', 'kernel'), P('tp', None)),
    (('mlp_proj', 'kernel'), P('tp', None)),
    (('linear2', 'kernel'), P('tp', None)),
]


def _spec_for(path, leaf, rules) -> P:
    names = tuple(getattr(p, 'key', getattr(p, 'name', None)) for p in path)
    # the Performer reuses the name ``out_proj`` for the per-layer attention
    # output projection (contracting: row-parallel) AND the final vocab
    # projection (expanding: column-parallel); disambiguate by layer scope
    if names[-2:] == ('out_proj', 'kernel') and any(
            isinstance(n, str) and n.startswith(('layer_', 'block_'))
            for n in names):
        return P('tp', None)
    for suffix, spec in rules:
        if names[-len(suffix):] == suffix:
            # only shard when the dimension divides evenly
            return spec
    return P()


def shard_params(params, mesh: Mesh, rules=None):
    """device_put a param tree with TP rules over the mesh (replicated over
    dp).  Dimensions that don't divide the tp axis stay replicated."""
    rules = rules if rules is not None else DEFAULT_RULES
    tp = mesh.shape.get('tp', 1)

    def place(path, leaf):
        spec = _spec_for(path, leaf, rules)
        if tp <= 1 or spec == P():
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        # verify divisibility for each sharded dim
        for dim, axis in enumerate(spec):
            if axis == 'tp' and leaf.shape[dim] % tp:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def placement_report(params, mesh: Mesh, rules=None):
    """Map each param path to its intended PartitionSpec (after the
    divisibility check) — used by tests to assert PER-RULE placement rather
    than just "something is sharded"."""
    rules = rules if rules is not None else DEFAULT_RULES
    tp = mesh.shape.get('tp', 1)
    report = {}

    def visit(path, leaf):
        names = tuple(getattr(p, 'key', getattr(p, 'name', None)) for p in path)
        spec = _spec_for(path, leaf, rules)
        if tp > 1 and spec != P():
            for dim, axis in enumerate(spec):
                if axis == 'tp' and leaf.shape[dim] % tp:
                    spec = P()
                    break
        report['/'.join(str(n) for n in names)] = spec
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return report
