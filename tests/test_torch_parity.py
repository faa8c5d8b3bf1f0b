"""Numerical parity against the reference's torch models (CPU).

Random-initialized reference modules are saved as ``.pt``, converted with the
framework's weight converters, and both sides run the same tokens: logits
must agree to fp32 tolerance.  This validates both the converter name/layout
maps and the flax reimplementations.

The Performer cannot be cross-checked here (pytorch-fast-transformers and its
CUDA kernel are not installed); its parity is covered by the internal
kernel-vs-naive and decode-vs-forward equivalence tests.  The reference
``MusicGPT2`` no longer runs under the installed transformers (4.57 changed
GPT2Block), so the GPT-2 check builds a reference-format state dict and
verifies against a self-contained torch implementation of the HF 4.28 block
semantics.
"""

import os

import numpy as np
import pytest

import ref_loader

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from emo_disentanger_tpu.models import PlainTransformer, MusicGPT2
from emo_disentanger_tpu.train.convert_pt import convert_stage1_pt, convert_gpt2_pt

pytestmark = pytest.mark.skipif(not ref_loader.available(),
                                reason='reference repo not mounted')

V = 50
L = 24
B = 2


@pytest.fixture(scope='module')
def stage1_pair(tmp_path_factory):
    m = ref_loader.load_stage1_models()
    torch.manual_seed(0)
    ref = m.plain_transformer.PlainTransformer(
        32, V, 2, 2, 32, 64, 0, L, dec_dropout=0.0, pre_lnorm=True)
    ref.eval()
    path = str(tmp_path_factory.mktemp('pt') / 's1.pt')
    torch.save(ref.state_dict(), path)

    model = PlainTransformer(vocab_size=V, d_embed=32, n_layer=2, n_head=2,
                             d_model=32, d_ff=64, dropout=0.0, pre_lnorm=True)
    params = convert_stage1_pt(path, n_layer=2)
    return ref, model, params, path


def test_stage1_logits_match(stage1_pair):
    ref, model, params, _ = stage1_pair
    rng = np.random.RandomState(1)
    toks = rng.randint(0, V - 1, size=(B, L))

    with torch.no_grad():
        t_out = ref(torch.from_numpy(toks.T), tuple())
    t_logits = t_out[0].numpy().transpose(1, 0, 2)     # [L,B,V] -> [B,L,V]

    j_logits, _ = model.apply(params, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(j_logits), t_logits,
                               rtol=2e-4, atol=2e-4)


def test_stage1_generate_step_matches(stage1_pair):
    """Reference ``generate`` (mems path) vs our KV-cache decode, step by step."""
    ref, model, params, path = stage1_pair
    rng = np.random.RandomState(2)
    toks = rng.randint(0, V - 1, size=(10,))

    # reference: token-by-token with mems (mem_len = tgt_len at inference)
    m = ref_loader.load_stage1_models()
    ref_inf = m.plain_transformer.PlainTransformer(
        32, V, 2, 2, 32, 64, 32, 32, dec_dropout=0.0, pre_lnorm=True)
    ref_inf.load_state_dict(torch.load(path, weights_only=True))
    ref_inf.eval()

    mems = tuple()
    ref_logits = []
    with torch.no_grad():
        for t in range(10):
            inp = torch.tensor([[toks[t]]])
            lg, mems = ref_inf.generate(inp, mems)
            ref_logits.append(lg.numpy())

    cache = model.apply(params, 1, 32, method=PlainTransformer.init_decode_cache)
    got = []
    for t in range(10):
        lg, cache = model.apply(params, jnp.asarray([toks[t]]), jnp.int32(t),
                                cache, method=PlainTransformer.decode_step)
        got.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.stack(got), np.stack(ref_logits),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# GPT-2: converter + block semantics vs a self-contained torch reference
# ---------------------------------------------------------------------------

def _gelu_new(x):
    import math
    return 0.5 * x * (1.0 + torch.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * torch.pow(x, 3.0))))


def _torch_gpt2_forward(state, toks, seg, n_layer, n_head, d):
    """HF-4.28 GPT2Block semantics + the reference MusicGPT2 wrapper
    (``music_gpt2.py:70-92``), in plain torch."""
    import math
    dh = d // n_head
    emb = torch.nn.functional.embedding(toks, state['token_emb.emb_lookup.weight'])
    emb = emb * math.sqrt(d)
    semb = torch.nn.functional.embedding(seg, state['segemb.emb_lookup.weight'])
    emb = emb + semb * math.sqrt(d)
    Lq = toks.shape[1]
    # interleaved sinusoidal pe
    pe = torch.zeros(Lq, d)
    pos = torch.arange(Lq, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    h = emb + pe[None]

    def ln(x, w, b):
        return torch.nn.functional.layer_norm(x, (d,), w, b, eps=1e-5)

    for i in range(n_layer):
        p = f'transformer_decoder.{i}'
        a = ln(h, state[p + '.ln_1.weight'], state[p + '.ln_1.bias'])
        qkv = a @ state[p + '.attn.c_attn.weight'] + state[p + '.attn.c_attn.bias']
        q, k, v = qkv.split(d, dim=-1)
        def heads(x):
            return x.view(x.shape[0], x.shape[1], n_head, dh).transpose(1, 2)
        q, k, v = heads(q), heads(k), heads(v)
        att = (q @ k.transpose(-1, -2)) / math.sqrt(dh)
        mask = torch.tril(torch.ones(Lq, Lq, dtype=torch.bool))
        att = att.masked_fill(~mask, float('-inf'))
        att = torch.softmax(att, dim=-1)
        o = (att @ v).transpose(1, 2).reshape(h.shape)
        o = o @ state[p + '.attn.c_proj.weight'] + state[p + '.attn.c_proj.bias']
        h = h + o
        a = ln(h, state[p + '.ln_2.weight'], state[p + '.ln_2.bias'])
        a = _gelu_new(a @ state[p + '.mlp.c_fc.weight'] + state[p + '.mlp.c_fc.bias'])
        a = a @ state[p + '.mlp.c_proj.weight'] + state[p + '.mlp.c_proj.bias']
        h = h + a
    return h @ state['dec_out_proj.weight'].T + state['dec_out_proj.bias']


def test_gpt2_converter_and_block_semantics(tmp_path):
    torch.manual_seed(3)
    n_layer, n_head, d, ff = 2, 2, 32, 64
    state = {
        'token_emb.emb_lookup.weight': torch.randn(V, d) * 0.05,
        'segemb.emb_lookup.weight': torch.randn(2, d) * 0.05,
        'dec_out_proj.weight': torch.randn(V, d) * 0.05,
        'dec_out_proj.bias': torch.zeros(V),
    }
    for i in range(n_layer):
        p = f'transformer_decoder.{i}'
        state.update({
            p + '.ln_1.weight': torch.ones(d) + torch.randn(d) * 0.01,
            p + '.ln_1.bias': torch.zeros(d),
            p + '.ln_2.weight': torch.ones(d) + torch.randn(d) * 0.01,
            p + '.ln_2.bias': torch.zeros(d),
            p + '.attn.c_attn.weight': torch.randn(d, 3 * d) * 0.05,  # Conv1D [in,out]
            p + '.attn.c_attn.bias': torch.randn(3 * d) * 0.01,
            p + '.attn.c_proj.weight': torch.randn(d, d) * 0.05,
            p + '.attn.c_proj.bias': torch.zeros(d),
            p + '.mlp.c_fc.weight': torch.randn(d, ff) * 0.05,
            p + '.mlp.c_fc.bias': torch.zeros(ff),
            p + '.mlp.c_proj.weight': torch.randn(ff, d) * 0.05,
            p + '.mlp.c_proj.bias': torch.zeros(d),
        })
    path = str(tmp_path / 'g.pt')
    torch.save(state, path)

    rng = np.random.RandomState(5)
    toks = rng.randint(0, V - 1, size=(B, 16))
    seg = rng.randint(0, 2, size=(B, 16))

    with torch.no_grad():
        expect = _torch_gpt2_forward(state, torch.from_numpy(toks),
                                     torch.from_numpy(seg), n_layer, n_head, d)

    model = MusicGPT2(n_token=V, n_layer=n_layer, n_head=n_head, d_model=d,
                      d_ff=ff, d_embed=d, dropout=0.0)
    params = convert_gpt2_pt(path, n_layer=n_layer)
    got = model.apply(params, jnp.asarray(toks), jnp.asarray(seg))
    np.testing.assert_allclose(np.asarray(got), expect.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_stage1_mems_segments_match(stage1_pair):
    """Two-segment XL training forward (mems recurrence) vs the reference."""
    ref, model, params, path = stage1_pair
    m = ref_loader.load_stage1_models()
    ref_mem = m.plain_transformer.PlainTransformer(
        32, V, 2, 2, 32, 64, 12, 12, dec_dropout=0.0, pre_lnorm=True)
    ref_mem.load_state_dict(torch.load(path, weights_only=True))
    ref_mem.eval()

    model_mem = PlainTransformer(vocab_size=V, d_embed=32, n_layer=2,
                                 n_head=2, d_model=32, d_ff=64, dropout=0.0,
                                 pre_lnorm=True, mem_len=12)

    rng = np.random.RandomState(7)
    seg1 = rng.randint(0, V - 1, size=(2, 12))
    seg2 = rng.randint(0, V - 1, size=(2, 12))

    with torch.no_grad():
        out1 = ref_mem(torch.from_numpy(seg1.T), tuple())
        t_logits1, t_mems = out1[0], out1[1:]
        out2 = ref_mem(torch.from_numpy(seg2.T), t_mems)
        t_logits2 = out2[0]

    j_logits1, j_mems = model_mem.apply(params, jnp.asarray(seg1))
    j_logits2, _ = model_mem.apply(params, jnp.asarray(seg2), j_mems)

    np.testing.assert_allclose(np.asarray(j_logits1),
                               t_logits1.numpy().transpose(1, 0, 2),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_logits2),
                               t_logits2.numpy().transpose(1, 0, 2),
                               rtol=2e-3, atol=2e-3)
