"""Linear-attention op: scan/pallas vs naive einsum, decode-state parity,
gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emo_disentanger_tpu.ops.linear_attention import (
    causal_linear_attention, causal_linear_attention_ref, _scan_impl,
    draw_orthogonal_features, favor_causal_attention, favor_features,
    linear_attention_decode_step,
)


def _random_features(key, B=2, H=3, L=100, M=32, Dv=16):
    k1, k2, k3 = jax.random.split(key, 3)
    phi_q = jax.random.uniform(k1, (B, H, L, M), minval=0.01, maxval=1.0)
    phi_k = jax.random.uniform(k2, (B, H, L, M), minval=0.01, maxval=1.0)
    v = jax.random.normal(k3, (B, H, L, Dv))
    return phi_q, phi_k, v


def test_scan_matches_ref(rng_key):
    phi_q, phi_k, v = _random_features(rng_key)
    ref = causal_linear_attention_ref(phi_q, phi_k, v)
    out = causal_linear_attention(phi_q, phi_k, v, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_scan_odd_length(rng_key):
    # length not a multiple of the chunk exercises padding
    phi_q, phi_k, v = _random_features(rng_key, L=37)
    ref = causal_linear_attention_ref(phi_q, phi_k, v)
    out = causal_linear_attention(phi_q, phi_k, v, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('layout', ['md', 'dm'])
def test_decode_state_matches_parallel(rng_key, layout):
    # 'dm' (S transposed [.., Dv, M]) is the default since round 5
    phi_q, phi_k, v = _random_features(rng_key, B=1, H=2, L=20, M=8, Dv=4)
    ref = causal_linear_attention_ref(phi_q, phi_k, v)

    S = jnp.zeros((1, 2, 8, 4) if layout == 'md' else (1, 2, 4, 8))
    z = jnp.zeros((1, 2, 8))
    outs = []
    for t in range(20):
        o, S, z = linear_attention_decode_step(
            phi_q[:, :, t], phi_k[:, :, t], v[:, :, t], S, z,
            state_layout=layout)
        outs.append(o)
    got = jnp.stack(outs, axis=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_gradients_flow(rng_key):
    phi_q, phi_k, v = _random_features(rng_key, B=1, H=1, L=32, M=8, Dv=4)

    def loss_op(q, k, vv):
        return jnp.sum(causal_linear_attention(q, k, vv, 16) ** 2)

    def loss_ref(q, k, vv):
        return jnp.sum(causal_linear_attention_ref(q, k, vv) ** 2)

    g_op = jax.grad(loss_op, argnums=(0, 1, 2))(phi_q, phi_k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(phi_q, phi_k, v)
    for a, b in zip(g_op, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_orthogonal_features_shape_and_orthogonality(rng_key):
    omega = draw_orthogonal_features(rng_key, 16, 32)
    assert omega.shape == (16, 32)
    # rows within a block are orthogonal: w_i . w_j / (|w_i||w_j|) ~ 0
    w = np.asarray(omega).T           # [32, 16]
    blk = w[:16]
    normed = blk / np.linalg.norm(blk, axis=1, keepdims=True)
    gram = normed @ normed.T
    np.testing.assert_allclose(gram, np.eye(16), atol=1e-5)


def test_favor_stabilizers_cancel(rng_key):
    """Stabilized and unstabilized features give the same normalized output."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    q = jax.random.normal(k1, (1, 2, 24, 8))
    k = jax.random.normal(k2, (1, 2, 24, 8))
    v = jax.random.normal(k3, (1, 2, 24, 4))
    omega = draw_orthogonal_features(rng_key, 8, 16)

    out_stab = causal_linear_attention_ref(
        favor_features(q, omega, is_query=True),
        favor_features(k, omega, is_query=False), v)
    # raw: no stabilization at all
    def raw(x):
        xs = x * (x.shape[-1] ** -0.25)
        u = xs @ omega
        return jnp.exp(u - 0.5 * jnp.sum(xs * xs, -1, keepdims=True)) / jnp.sqrt(16)
    out_raw = causal_linear_attention_ref(raw(q), raw(k), v)
    np.testing.assert_allclose(np.asarray(out_stab), np.asarray(out_raw),
                               rtol=2e-4, atol=2e-5)


def test_favor_approximates_softmax(rng_key):
    """With many features, FAVOR+ attention approaches causal softmax attention."""
    k1, k2, k3, k4 = jax.random.split(rng_key, 4)
    d = 8
    q = jax.random.normal(k1, (1, 1, 16, d)) * 0.5
    k = jax.random.normal(k2, (1, 1, 16, d)) * 0.5
    v = jax.random.normal(k3, (1, 1, 16, 4))
    omega = draw_orthogonal_features(k4, d, 2048)

    out = causal_linear_attention_ref(
        favor_features(q, omega, is_query=True),
        favor_features(k, omega, is_query=False), v)

    scores = jnp.einsum('bhid,bhjd->bhij', q, k) / jnp.sqrt(d)
    mask = jnp.tril(jnp.ones((16, 16), dtype=bool))
    scores = jnp.where(mask, scores, -1e30)
    exact = jnp.einsum('bhij,bhjd->bhid', jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), atol=0.15)


# ---------------------------------------------------------------------------
# fused FAVOR+ attention (feature map inside the kernel)
# ---------------------------------------------------------------------------

def _random_qkv(key, B=2, H=2, L=64, Dh=16, Dv=16):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, H, L, Dh))
    k = jax.random.normal(k2, (B, H, L, Dh))
    v = jax.random.normal(k3, (B, H, L, Dv))
    return q, k, v


def test_fused_matches_composition(rng_key):
    q, k, v = _random_qkv(rng_key)
    omega = draw_orthogonal_features(jax.random.PRNGKey(5), 16, 32)
    fused = favor_causal_attention(q, k, v, omega, 16)
    phi_q = favor_features(q, omega, is_query=True)
    phi_k = favor_features(k, omega, is_query=False)
    composed = causal_linear_attention(phi_q, phi_k, v, 16)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=2e-4, atol=2e-5)


def test_fused_odd_length(rng_key):
    q, k, v = _random_qkv(rng_key, L=41)
    omega = draw_orthogonal_features(jax.random.PRNGKey(5), 16, 32)
    fused = favor_causal_attention(q, k, v, omega, 16)
    phi_q = favor_features(q, omega, is_query=True)
    phi_k = favor_features(k, omega, is_query=False)
    composed = causal_linear_attention_ref(phi_q, phi_k, v)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_composition(rng_key):
    q, k, v = _random_qkv(rng_key, B=1, H=1, L=32, Dh=8, Dv=8)
    omega = draw_orthogonal_features(jax.random.PRNGKey(5), 8, 16)

    def loss_fused(q_, k_, v_):
        return jnp.sum(favor_causal_attention(q_, k_, v_, omega, 16) ** 2)

    def loss_composed(q_, k_, v_):
        phi_q = favor_features(q_, omega, is_query=True)
        phi_k = favor_features(k_, omega, is_query=False)
        return jnp.sum(causal_linear_attention_ref(phi_q, phi_k, v_) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_c = jax.grad(loss_composed, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_omega_gradient_is_zero(rng_key):
    """omega is a random-feature buffer, never trained — its gradient is
    defined as zero (the reference strips feature_map.omega from
    checkpoints)."""
    q, k, v = _random_qkv(rng_key, B=1, H=1, L=16, Dh=8, Dv=8)
    omega = draw_orthogonal_features(jax.random.PRNGKey(5), 8, 16)
    g = jax.grad(lambda o: jnp.sum(favor_causal_attention(q, k, v, o, 16)))(omega)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_fused_bf16_dot_economy_interpret(rng_key, monkeypatch):
    """The PRODUCTION train-path numerics: under bf16 compute the fused
    kernels switch dot operands (and the uw backward residual) to bf16
    (``_dot_dtype_for``), a tradeoff previously pinned only by on-chip
    loss curves.  Run the real Pallas fwd+bwd kernels in interpret mode
    with bf16 inputs and bound fwd/grad drift against the f32 composition
    (advisor r3)."""
    monkeypatch.setenv('EMODIS_PALLAS_INTERPRET', '1')
    q, k, v = _random_qkv(rng_key, B=1, H=2, L=64, Dh=8, Dv=8)
    omega = draw_orthogonal_features(jax.random.PRNGKey(5), 8, 16)

    def loss_kernel(q_, k_, v_):
        out = favor_causal_attention(q_.astype(jnp.bfloat16),
                                     k_.astype(jnp.bfloat16),
                                     v_.astype(jnp.bfloat16),
                                     omega.astype(jnp.bfloat16), 32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_composed(q_, k_, v_):
        phi_q = favor_features(q_, omega, is_query=True)
        phi_k = favor_features(k_, omega, is_query=False)
        return jnp.sum(causal_linear_attention_ref(phi_q, phi_k, v_) ** 2)

    # the interpret-mode kernel really ran with bf16 dot operands: assert
    # the selected dtype to guard against a silent f32 fallback
    from emo_disentanger_tpu.ops.linear_attention import (
        _dot_dtype_for, _use_pallas)
    assert _use_pallas()
    assert _dot_dtype_for(jnp.zeros((1,), jnp.bfloat16)) == jnp.bfloat16

    out_k, g_k = jax.value_and_grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    out_c, g_c = jax.value_and_grad(loss_composed, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(out_k), float(out_c), rtol=3e-2)
    for a, b in zip(g_k, g_c):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        # bf16 operands: elementwise relative error bounded vs the grad scale
        denom = np.maximum(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 6e-2


def test_fused_decode_layer_matches_composed(rng_key):
    """The whole-layer fused decode kernel (interpret mode on CPU) must
    reproduce the composed decode_step (projections + favor_features +
    linear_attention_decode_step + norms + FF) over a multi-step roll,
    including the update_mask state freeze."""
    import numpy as np
    from emo_disentanger_tpu.models.performer import MusicPerformer

    model = MusicPerformer(n_token=48, n_layer=2, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, dropout=0.0, favor_dims=16)
    omegas = model.draw_omegas(jax.random.PRNGKey(3))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    B = 4
    # the fused kernel carries [M, Dh] state: pin 'md' (default is 'dm')
    sa = model.apply(params, B, 'md',
                     method=MusicPerformer.init_decode_state)
    sb = model.apply(params, B, 'md',
                     method=MusicPerformer.init_decode_state)
    rng = np.random.RandomState(0)

    def roll(mdl, x, state, mask, fused):
        S_all, z_all = state['S'], state['z']
        h = x
        for i, layer in enumerate(mdl.layers):
            h, S_all, z_all = layer.decode_step(
                h, omegas[i], i, S_all, z_all, update_mask=mask, fused=fused,
                state_layout='md')
        return h, {'S': S_all, 'z': z_all}

    def step_layer(x, state, mask, fused):
        return model.apply(params, x, state, mask, fused, method=roll)

    for t in range(5):
        x = jnp.asarray(rng.randn(B, 1, 32).astype('f4'))
        mask = jnp.asarray((rng.random(B) > 0.3))
        ha, sa = step_layer(x, sa, mask, fused=False)
        hb, sb = step_layer(x, sb, mask, fused=True)
        np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(sa['S']), np.asarray(sb['S']),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(sa['z']), np.asarray(sb['z']),
                                   rtol=2e-4, atol=2e-5)


def test_fused_decode_layer_batch_grid(rng_key, monkeypatch):
    """The batch-group grid path (serving batches whose VMEM footprint
    exceeds one block — the round-2 B=16 scoped-VMEM OOM regression):
    force groups of 2 and check multi-group output == single-group."""
    import numpy as np
    from emo_disentanger_tpu.ops import performer_decode as pd
    from emo_disentanger_tpu.models.performer import MusicPerformer

    model = MusicPerformer(n_token=48, n_layer=1, n_head=2, d_model=32,
                           d_ff=64, d_embed=32, dropout=0.0, favor_dims=16)
    omegas = model.draw_omegas(jax.random.PRNGKey(3))
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32),
                        omegas, jnp.zeros((1, 8), jnp.int32))
    B = 6
    rng = np.random.RandomState(1)

    def roll(mdl, x, state, mask):
        h, S_all, z_all = mdl.layers[0].decode_step(
            x, omegas[0], 0, state['S'], state['z'],
            update_mask=mask, fused=True, state_layout='md')
        return h, {'S': S_all, 'z': z_all}

    def step_layer(x, state, mask):
        return model.apply(params, x, state, mask, method=roll)

    x = jnp.asarray(rng.randn(B, 1, 32).astype('f4'))
    mask = jnp.asarray(rng.random(B) > 0.3)

    s0 = model.apply(params, B, 'md',
                     method=MusicPerformer.init_decode_state)
    h_whole, s_whole = step_layer(x, s0, mask)

    monkeypatch.setattr(pd, '_batch_group', lambda *a, **k: 2)
    s1 = model.apply(params, B, 'md',
                     method=MusicPerformer.init_decode_state)
    h_grid, s_grid = step_layer(x, s1, mask)

    np.testing.assert_allclose(np.asarray(h_whole), np.asarray(h_grid),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_whole['S']),
                               np.asarray(s_grid['S']),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_whole['z']),
                               np.asarray(s_grid['z']),
                               rtol=1e-5, atol=1e-6)
