"""uint8 dropout (EMODIS_DROPOUT_BITECON, default ON since round 5):
mean-preserving at the quantized rate; '=0' restores nn.Dropout bitwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from emo_disentanger_tpu.models import dropout as dmod
from emo_disentanger_tpu.models.dropout import Dropout


def _run(mod, x, rng, det=False):
    return mod.apply({}, x, deterministic=det, rngs={'dropout': rng})


def test_opt_out_delegates_to_nn_dropout(monkeypatch):
    monkeypatch.setenv('EMODIS_DROPOUT_BITECON', '0')
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128), jnp.float32)
    rng = jax.random.PRNGKey(7)
    ours = _run(Dropout(0.1), x, rng)
    ref = _run(nn.Dropout(0.1), x, rng)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_default_is_bitecon(monkeypatch):
    # round-5 flip: flag unset -> uint8 path (survivors carry the
    # quantized scale, which plain nn.Dropout's f32 1/keep never equals)
    monkeypatch.delenv('EMODIS_DROPOUT_BITECON', raising=False)
    x = jnp.ones((64, 128), jnp.bfloat16)
    out = np.asarray(_run(Dropout(0.1), x, jax.random.PRNGKey(7)),
                     dtype=np.float32)
    expect = float(jnp.asarray(256.0 / (256 - 26), jnp.bfloat16))
    np.testing.assert_allclose(out[out != 0.0], expect, rtol=0)


@pytest.mark.parametrize('rate', [0.1, 0.3])
def test_bitecon_mask_statistics(monkeypatch, rate):
    monkeypatch.setenv('EMODIS_DROPOUT_BITECON', '1')
    x = jnp.ones((256, 512), jnp.bfloat16)
    out = np.asarray(_run(Dropout(rate), x, jax.random.PRNGKey(3)),
                     dtype=np.float32)
    t = round(rate * 256)
    drop_frac = (out == 0.0).mean()
    assert abs(drop_frac - t / 256) < 0.01
    # survivors carry exactly the quantized inverse-keep scale (bf16-rounded)
    survivors = out[out != 0.0]
    expect = float(jnp.asarray(256.0 / (256 - t), jnp.bfloat16))
    np.testing.assert_allclose(survivors, expect, rtol=0)
    # mean preservation at the quantized rate
    assert abs(out.mean() - 1.0) < 0.02


def test_bitecon_deterministic_and_zero_rate(monkeypatch):
    monkeypatch.setenv('EMODIS_DROPOUT_BITECON', '1')
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    rng = jax.random.PRNGKey(2)
    np.testing.assert_array_equal(
        np.asarray(_run(Dropout(0.1), x, rng, det=True)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(_run(Dropout(0.0), x, rng)), np.asarray(x))


def test_bitecon_works_under_rbg_keys(monkeypatch):
    """The train step hands Dropout rbg-impl keys (train.trainer.dropout_rng);
    random.bits must accept them on the uint8 path."""
    monkeypatch.setenv('EMODIS_DROPOUT_BITECON', '1')
    x = jnp.ones((32, 64), jnp.bfloat16)
    rng = jax.random.key(5, impl='rbg')
    out = np.asarray(_run(Dropout(0.1), x, rng), dtype=np.float32)
    assert ((out == 0.0).mean() > 0.05) and (out.max() > 1.0)
