"""Model tests: forward shapes, decode-cache vs full-forward parity,
XL memory consistency, loss masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emo_disentanger_tpu.models import PlainTransformer, MusicPerformer, MusicGPT2

V = 40
SMALL = dict(n_layer=2, n_head=2, d_model=32, d_ff=64, d_embed=32, dropout=0.0)


@pytest.fixture(scope='module')
def txl():
    model = PlainTransformer(vocab_size=V, mem_len=8, **SMALL)
    toks = jnp.arange(24).reshape(2, 12) % (V - 1)
    params = model.init(jax.random.PRNGKey(0), toks)
    return model, params


def test_txl_forward_shape(txl):
    model, params = txl
    toks = jnp.ones((2, 12), dtype=jnp.int32)
    logits, mems = model.apply(params, toks)
    assert logits.shape == (2, 12, V)
    assert len(mems) == model.n_layer + 1
    assert mems[0].shape == (2, 8, 32)


def test_txl_mems_match_full_forward(txl):
    """Running two 6-token segments with XL mems == one 12-token forward."""
    model, params = txl
    toks = (jnp.arange(24).reshape(2, 12) * 7) % (V - 1)
    full_logits, _ = model.apply(params, toks)

    # segment 1 (mem_len=8 keeps only the last 8 hiddens, but seg1 len 6 < 8
    # so everything is retained and seg2 sees the exact same context)
    logits1, mems = model.apply(params, toks[:, :6])
    logits2, _ = model.apply(params, toks[:, 6:], mems)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(full_logits[:, :6]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(full_logits[:, 6:]),
                               rtol=2e-4, atol=2e-4)


def test_txl_decode_cache_matches_forward(txl):
    """Token-by-token KV-cache decode == teacher-forced full forward."""
    model, params = txl
    toks = (jnp.arange(20).reshape(1, 20) * 3) % (V - 1)
    full_logits, _ = model.apply(params, toks)

    cache = model.apply(params, 1, 20, method=PlainTransformer.init_decode_cache)
    step = jax.jit(lambda tok, t, c: model.apply(
        params, tok, t, c, method=PlainTransformer.decode_step))
    step_logits = []
    for t in range(20):
        logits, cache = step(toks[:, t], jnp.int32(t), cache)
        step_logits.append(logits)
    got = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full_logits),
                               rtol=2e-3, atol=2e-3)


def test_txl_loss_ignores_pad(txl):
    model, params = txl
    logits = jnp.zeros((1, 4, V))
    pad = V - 1
    tgt_all_pad = jnp.full((1, 4), pad)
    loss = model.compute_loss(logits, tgt_all_pad)
    assert float(loss) == 0.0
    tgt = jnp.array([[1, 2, pad, pad]])
    loss = model.compute_loss(logits, tgt)
    np.testing.assert_allclose(float(loss), np.log(V), rtol=1e-5)


@pytest.fixture(scope='module')
def performer():
    model = MusicPerformer(n_token=V, favor_dims=16, **SMALL)
    toks = jnp.ones((2, 12), dtype=jnp.int32)
    seg = jnp.zeros((2, 12), dtype=jnp.int32)
    omegas = model.draw_omegas(jax.random.PRNGKey(7))
    params = model.init(jax.random.PRNGKey(0), toks, omegas, seg)
    return model, params, omegas


def test_performer_forward_shape(performer):
    model, params, omegas = performer
    toks = jnp.ones((2, 12), dtype=jnp.int32)
    seg = jnp.zeros((2, 12), dtype=jnp.int32)
    logits = model.apply(params, toks, omegas, seg)
    assert logits.shape == (2, 12, V)
    last = model.apply(params, toks, omegas, seg, keep_last_only=True)
    np.testing.assert_allclose(np.asarray(last), np.asarray(logits[:, -1]), rtol=1e-5)


def test_performer_decode_matches_forward(performer):
    """O(1)-state decode == full-context forward at every position."""
    model, params, omegas = performer
    toks = (jnp.arange(16).reshape(1, 16) * 5) % (V - 1)
    seg = (jnp.arange(16).reshape(1, 16) % 2)
    full = model.apply(params, toks, omegas, seg)

    state = model.apply(params, 1, method=MusicPerformer.init_decode_state)
    step = jax.jit(lambda tok, sg, t, st: model.apply(
        params, tok, sg, t, omegas, st, method=MusicPerformer.decode_step))
    outs = []
    for t in range(16):
        logits, state = step(toks[:, t], seg[:, t], jnp.int32(t), state)
        outs.append(logits)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


@pytest.fixture(scope='module')
def gpt2():
    model = MusicGPT2(n_token=V, **SMALL)
    toks = jnp.ones((2, 12), dtype=jnp.int32)
    seg = jnp.zeros((2, 12), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks, seg)
    return model, params


def test_gpt2_forward_shape(gpt2):
    model, params = gpt2
    toks = jnp.ones((2, 12), dtype=jnp.int32)
    seg = jnp.zeros((2, 12), dtype=jnp.int32)
    logits = model.apply(params, toks, seg)
    assert logits.shape == (2, 12, V)


def test_gpt2_decode_matches_forward(gpt2):
    model, params = gpt2
    toks = (jnp.arange(16).reshape(1, 16) * 11) % (V - 1)
    seg = (jnp.arange(16).reshape(1, 16) % 2)
    full = model.apply(params, toks, seg)

    cache = model.apply(params, 1, 16, method=MusicGPT2.init_decode_cache)
    step = jax.jit(lambda tok, sg, t, c: model.apply(
        params, tok, sg, t, c, method=MusicGPT2.decode_step))
    outs = []
    for t in range(16):
        logits, cache = step(toks[:, t], seg[:, t], jnp.int32(t), cache)
        outs.append(logits)
    got = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=2e-3, atol=2e-3)


def test_gpt2_causality(gpt2):
    """Changing a future token must not change past logits."""
    model, params = gpt2
    toks = (jnp.arange(10).reshape(1, 10)) % (V - 1)
    seg = jnp.zeros((1, 10), dtype=jnp.int32)
    a = model.apply(params, toks, seg)
    toks2 = toks.at[0, 7].set(V - 2)
    b = model.apply(params, toks2, seg)
    np.testing.assert_allclose(np.asarray(a[:, :7]), np.asarray(b[:, :7]),
                               rtol=1e-5, atol=1e-6)


def test_update_mems_varlen():
    from emo_disentanger_tpu.models.txl import update_mems_varlen
    B, mlen, L, D = 2, 4, 3, 2
    mems = jnp.arange(B * mlen * D, dtype=jnp.float32).reshape(B, mlen, D)
    hids = 100 + jnp.arange(B * L * D, dtype=jnp.float32).reshape(B, L, D)
    seg_len = jnp.array([2, 0])
    out = update_mems_varlen(mems, hids, seg_len)
    # sample 0: keep last 4 of concat(mems0[0:4], hids0[0:2]) = mems0[2:4]+hids0[0:2]
    np.testing.assert_array_equal(np.asarray(out[0, :2]), np.asarray(mems[0, 2:4]))
    np.testing.assert_array_equal(np.asarray(out[0, 2:]), np.asarray(hids[0, :2]))
    # sample 1: unchanged
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(mems[1]))
