"""Tensor-parallel sharding on the virtual (dp=4, tp=2) mesh.

Three contracts:
* per-rule placement — every kernel the rules target lands with exactly the
  intended PartitionSpec (column-parallel expanding, row-parallel
  contracting, vocab projection column-parallel);
* inference equality — TP-sharded params produce the replicated model's
  outputs;
* dp x tp TRAINING equality — a 3-step Adam run over the (dp=4, tp=2) mesh
  tracks the dp-only (dp=8) run's losses (the partitioner inserts the
  gradient/activation collectives; same math).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from emo_disentanger_tpu.models import MusicPerformer, MusicGPT2
from emo_disentanger_tpu.parallel.mesh import make_mesh, shard_batch
from emo_disentanger_tpu.parallel.sharding_rules import (
    placement_report, shard_params,
)


def test_placement_report_per_rule():
    """Each targeted kernel gets its intended spec — not merely 'something
    is sharded'."""
    model = MusicPerformer(n_token=48, n_layer=2, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, dropout=0.0, favor_dims=16)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    toks = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks, omegas,
                        jnp.zeros((1, 8), jnp.int32))
    mesh = make_mesh(8, tp=2)
    report = placement_report(params, mesh)

    col = P(None, 'tp')
    row = P('tp', None)
    for i in range(2):
        assert report[f'params/layer_{i}/q_proj/kernel'] == col
        assert report[f'params/layer_{i}/k_proj/kernel'] == col
        assert report[f'params/layer_{i}/v_proj/kernel'] == col
        # attention output projection contracts: row-parallel
        assert report[f'params/layer_{i}/out_proj/kernel'] == row
        assert report[f'params/layer_{i}/linear1/kernel'] == col
        assert report[f'params/layer_{i}/linear2/kernel'] == row
    # final vocab projection expands: column-parallel
    assert report['params/out_proj/kernel'] == col
    # embeddings stay replicated
    assert report['params/token_emb/embedding'] == P()

    # and the actual placement matches the report
    sharded = shard_params(params, mesh)
    ker = sharded['params']['layer_0']['linear1']['kernel']
    assert ker.sharding.spec == col
    ker = sharded['params']['layer_0']['out_proj']['kernel']
    assert ker.sharding.spec == row


def test_gpt2_tp_matches_replicated():
    model = MusicGPT2(n_token=48, n_layer=2, n_head=2, d_model=32, d_ff=64,
                      d_embed=32, dropout=0.0)
    toks = (jnp.arange(24).reshape(2, 12) * 3) % 47
    seg = jnp.zeros((2, 12), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks, seg)
    want = model.apply(params, toks, seg)

    mesh = make_mesh(8, tp=2)
    report = placement_report(params, mesh)
    assert report['params/block_0/c_attn/kernel'] == P(None, 'tp')
    assert report['params/block_0/attn_proj/kernel'] == P('tp', None)
    assert report['params/block_0/c_fc/kernel'] == P(None, 'tp')
    assert report['params/block_0/mlp_proj/kernel'] == P('tp', None)

    sharded = shard_params(params, mesh)
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


def _train_losses(mesh, params, model, omegas, batches, n_steps=3):
    from emo_disentanger_tpu.train import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step,
        stage2_performer_loss_fn)
    if mesh.shape.get('tp', 1) > 1:
        params = shard_params(params, mesh)
    optimizer = make_optimizer(OptimizerConfig(max_lr=1e-3, warmup_steps=1))
    state = init_train_state(params, optimizer)
    step = make_train_step(stage2_performer_loss_fn(model, 47), optimizer,
                           mesh, donate=False)
    losses = []
    for i in range(n_steps):
        batch = shard_batch(mesh, batches[i])
        state, loss, _ = step(state, batch, None, {'omegas': omegas})
        losses.append(float(loss))
    return losses


def test_dp_tp_training_matches_dp_only():
    """3 Adam steps on (dp=4, tp=2) give the same losses as dp=8 with
    replicated params: TP must not change the training math."""
    model = MusicPerformer(n_token=48, n_layer=2, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, dropout=0.0, favor_dims=16)
    omegas = model.draw_omegas(jax.random.PRNGKey(1))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))

    rng = np.random.RandomState(0)
    B, L = 8, 24
    batches = []
    for _ in range(3):
        batches.append({
            'dec_inp': rng.randint(0, 47, (B, L)).astype('int32'),
            'dec_tgt': rng.randint(0, 47, (B, L)).astype('int32'),
            'track_mask': rng.randint(0, 2, (B, L)).astype('int32'),
            'chord_idx': np.zeros((B, L), 'int32'),
            'melody_idx': np.zeros((B, L), 'int32'),
        })

    dp_losses = _train_losses(make_mesh(8), params, model, omegas, batches)
    tp_losses = _train_losses(make_mesh(8, tp=2), params, model, omegas,
                              batches)
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-4, atol=2e-5)

    # multi-slice: ('dcn', 'dp', 'tp') with dp across slices over DCN —
    # batch sharded over (dcn x dp), same math as single-slice dp
    ms_losses = _train_losses(make_mesh(8, dcn=2), params, model, omegas,
                              batches)
    np.testing.assert_allclose(ms_losses, dp_losses, rtol=2e-4, atol=2e-5)
    ms_tp_losses = _train_losses(make_mesh(8, tp=2, dcn=2), params, model,
                                 omegas, batches)
    np.testing.assert_allclose(ms_tp_losses, dp_losses, rtol=2e-4, atol=2e-5)


def test_multislice_mesh_shapes():
    """dcn-axis construction: axes, shape, and batch padding math."""
    from emo_disentanger_tpu.parallel.mesh import (batch_sharding,
                                                   dp_padded_batch_size)
    mesh = make_mesh(8, dcn=2)
    assert mesh.axis_names == ('dcn', 'dp', 'tp')
    assert mesh.shape['dcn'] == 2 and mesh.shape['dp'] == 4
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec(
        ('dcn', 'dp'))
    assert dp_padded_batch_size(mesh, 5) == 8
    mesh2 = make_mesh(8, tp=2, dcn=2)
    assert mesh2.shape == {'dcn': 2, 'dp': 2, 'tp': 2}
