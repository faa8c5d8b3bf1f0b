"""Tensor-parallel sharding: outputs must match the replicated model on the
virtual (dp=4, tp=2) mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from emo_disentanger_tpu.models import MusicPerformer, MusicGPT2
from emo_disentanger_tpu.parallel.mesh import make_mesh
from emo_disentanger_tpu.parallel.sharding_rules import shard_params


def test_gpt2_tp_matches_replicated():
    model = MusicGPT2(n_token=48, n_layer=2, n_head=2, d_model=32, d_ff=64,
                      d_embed=32, dropout=0.0)
    toks = (jnp.arange(24).reshape(2, 12) * 3) % 47
    seg = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks, seg)
    want = model.apply(params, toks, seg)

    mesh = make_mesh(8, tp=2)
    sharded = shard_params(params, mesh)
    # at least one big kernel actually ends up sharded over tp
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x.sharding, sharded))
    assert any(not s.is_fully_replicated for s in shardings)

    got = jax.jit(lambda p: model.apply(p, toks, seg))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_performer_tp_matches_replicated():
    model = MusicPerformer(n_token=48, n_layer=2, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, dropout=0.0, favor_dims=16)
    toks = (jnp.arange(24).reshape(2, 12) * 5) % 47
    seg = jnp.zeros((2, 12), jnp.int32)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0), toks, omegas, seg)
    want = model.apply(params, toks, omegas, seg)

    mesh = make_mesh(8, tp=2)
    sharded = shard_params(params, mesh)
    got = jax.jit(lambda p: model.apply(p, toks, omegas, seg))(sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
