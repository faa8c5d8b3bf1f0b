"""End-to-end event-stream parity against the ACTUAL reference decode code.

A random-weight reference ``PlainTransformer`` (torch, CPU) runs the
reference's own ``generate_plain_xl``; the same weights converted to flax run
:func:`infer.reference_exact.generate_stage1_reference_exact`.  With
``np.random.seed`` fixed identically, the two event streams should be
token-for-token identical (logits agree to fp32 rounding; the sampling
arithmetic and RNG-consumption order are replayed exactly).  Occasional
divergence can only come from fp32 rounding flipping a nucleus boundary, so
the test requires exact equality on the seeds it pins.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

import ref_loader

torch = pytest.importorskip('torch')

import jax.numpy as jnp

from emo_disentanger_tpu.core.vocab import Vocab
from emo_disentanger_tpu.models import PlainTransformer
from emo_disentanger_tpu.train.convert_pt import convert_stage1_pt
from emo_disentanger_tpu.infer.reference_exact import (
    generate_stage1_reference_exact,
)

pytestmark = pytest.mark.skipif(not ref_loader.available(),
                                reason='reference repo not mounted')


def _load_ref_inference_utils():
    """Load the reference's inference_utils with stub deps."""
    import types
    # stub module deps the reference file imports
    utils_stub = types.ModuleType('utils')
    utils_stub.tensor_to_numpy = lambda t: t.cpu().detach().numpy()
    ck_stub = types.ModuleType('convert_key')
    from emo_disentanger_tpu.core.theory import MAJOR_KEY, MINOR_KEY
    ck_stub.MAJOR_KEY = MAJOR_KEY
    ck_stub.MINOR_KEY = MINOR_KEY
    saved = {}
    for name, mod in [('utils', utils_stub), ('convert_key', ck_stub)]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        spec = importlib.util.spec_from_file_location(
            'ref_inference_utils',
            '/root/reference/stage1_compose/inference_utils.py')
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old
    return mod


def _vocab():
    events = ['Emotion_Positive', 'Emotion_Negative',
              'Key_C', 'Key_G', 'Key_c', 'Key_g',
              'Bar_None', 'EOS_None', 'Chord_I_M', 'Chord_V_7',
              'Note_Octave_4', 'Note_Octave_5', 'Note_Degree_I',
              'Note_Degree_V', 'Note_Duration_480', 'Note_Duration_960']
    events += ['Beat_{}'.format(b) for b in range(16)]
    events = sorted(set(events))
    return Vocab({e: i for i, e in enumerate(events)},
                 {i: e for i, e in enumerate(events)})


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_stage1_stream_bit_parity(seed, tmp_path):
    vocab = _vocab()
    m = ref_loader.load_stage1_models()
    torch.manual_seed(11)
    tgt_len = 64
    ref_model = m.plain_transformer.PlainTransformer(
        32, vocab.size, 2, 2, 32, 64, tgt_len, tgt_len,
        dec_dropout=0.0, pre_lnorm=True)
    # sharpen the output distribution: with flat random-weight logits the
    # REFERENCE's nucleus crashes on its single-True edge
    # (np.where(after)[0][1], inference_utils.py:34)
    with torch.no_grad():
        ref_model.dec_out_proj.weight.mul_(60.0)
    ref_model.eval()
    path = str(tmp_path / 'w.pt')
    torch.save(ref_model.state_dict(), path)

    riu = _load_ref_inference_utils()

    np.random.seed(seed)
    ref_err = None
    ref_tokens = None
    try:
        with torch.no_grad():
            ref_tokens, _ = riu.generate_plain_xl(
                ref_model, vocab.event2idx, vocab.idx2event,
                max_bars=3, max_events=40,
                primer=['Emotion_Positive'], temp=1.2, top_p=0.97,
                representation='functional', key_determine='rule')
    except ValueError as e:            # 'key generation failed'
        ref_err = str(e)
    # reference returns generated[:-1]

    model = PlainTransformer(vocab_size=vocab.size, d_embed=32, n_layer=2,
                             n_head=2, d_model=32, d_ff=64, dropout=0.0,
                             pre_lnorm=True)
    params = convert_stage1_pt(path, n_layer=2)

    np.random.seed(seed)
    our_err = None
    ours = None
    try:
        ours, _ = generate_stage1_reference_exact(
            model, params, vocab, primer_events=['Emotion_Positive'],
            max_bars=3, max_events=40, temp=1.2, top_p=0.97,
            representation='functional', max_klen=256)
    except ValueError as e:
        our_err = str(e)

    if ref_err is not None:
        # even the failure mode (non-Key token at step 1) must match
        assert our_err == ref_err
        return
    if ref_tokens is None:
        assert ours is None
        return
    assert ours is not None
    assert ours[:-1] == list(ref_tokens), (
        vocab.decode(ours[:-1]), vocab.decode(ref_tokens))


def test_stage1_prompt_mode_stream_parity(tmp_path):
    """Prompt continuation (multi-token primer, prompt_bars) parity.

    Pinned to seeds that agree: across seeds 0..15 the streams are
    token-exact on 15/16.  The one divergence (seed 9) is measured and
    documented in PARITY.md section 1: after an identical 18-token prefix
    both sides keep the identical 32-candidate nucleus set and the shared
    RNG draw lands at sorted position 28 on both — but two near-tied
    candidate probabilities (gap 2.2e-5 < the ~5e-5 fp32 torch-vs-flax
    logit noise at that step) swap argsort rank, returning Bar_None on the
    reference vs EOS_None here.  A rank swap of near-ties, not a
    nucleus-boundary change; irreducible without bit-identical matmuls."""
    vocab = _vocab()
    m = ref_loader.load_stage1_models()
    torch.manual_seed(21)
    ref_model = m.plain_transformer.PlainTransformer(
        32, vocab.size, 2, 2, 32, 64, 64, 64, dec_dropout=0.0, pre_lnorm=True)
    with torch.no_grad():
        ref_model.dec_out_proj.weight.mul_(60.0)
    ref_model.eval()
    path = str(tmp_path / 'w.pt')
    torch.save(ref_model.state_dict(), path)
    riu = _load_ref_inference_utils()

    primer = ['Emotion_Positive', 'Key_C', 'Bar_None', 'Beat_0', 'Chord_I_M',
              'Note_Octave_5', 'Note_Degree_I', 'Note_Duration_480']

    np.random.seed(0)
    with torch.no_grad():
        ref_tokens, _ = riu.generate_plain_xl(
            ref_model, vocab.event2idx, vocab.idx2event,
            max_bars=3, max_events=40, primer=primer, prompt_bars=1,
            temp=1.2, top_p=0.97, representation='functional',
            key_determine='rule')

    model = PlainTransformer(vocab_size=vocab.size, d_embed=32, n_layer=2,
                             n_head=2, d_model=32, d_ff=64, dropout=0.0,
                             pre_lnorm=True)
    params = convert_stage1_pt(path, n_layer=2)
    np.random.seed(0)
    ours, _ = generate_stage1_reference_exact(
        model, params, vocab, primer_events=primer, prompt_bars=1,
        max_bars=3, max_events=40, temp=1.2, top_p=0.97,
        representation='functional', max_klen=256)

    if ref_tokens is None:
        assert ours is None
        return
    assert ours is not None
    assert ours[:-1] == list(ref_tokens)
