"""Torch ``.pt`` checkpoint -> flax parameter converter.

Maps the reference's released weights (three different torch module layouts)
onto this framework's flax trees:

* stage 1 ``PlainTransformer`` — fused ``qkv_net`` TXL layers, shared
  r_w/r_r biases (``stage1_compose/model/plain_transformer.py``);
* stage 2 ``MusicPerformer`` — fast-transformers per-projection attention
  (``feature_map.omega`` entries are dropped, matching the reference's load
  behaviour, ``stage2_accompaniment/train.py:306-308``);
* stage 2 ``MusicGPT2`` — HF ``GPT2Block`` Conv1D layout (weights already
  [in, out], no transpose).

torch is used CPU-only and only inside this module.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location='cpu', weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if 'feature_map.omega' not in k}


def _ln(state, prefix):
    """Torch LayerNorm -> this framework's LayerNorm wrapper params."""
    return {'LayerNorm_0': {'scale': state[prefix + '.weight'],
                            'bias': state[prefix + '.bias']}}


def _dense(state, prefix, transpose=True, bias=True):
    w = state[prefix + '.weight']
    out = {'kernel': w.T if transpose else w}
    if bias:
        out['bias'] = state[prefix + '.bias']
    return out


def convert_stage1_pt(path: str, n_layer: int = 12) -> Dict[str, Any]:
    """Reference ``PlainTransformer`` state dict -> flax params tree."""
    s = _load_state_dict(path)
    params: Dict[str, Any] = {
        'word_emb': {'embedding': s['word_emb.emb_lookup.weight']},
        'r_w_bias': s['decoder.r_w_bias'],
        'r_r_bias': s['decoder.r_r_bias'],
        'out_proj': _dense(s, 'dec_out_proj'),
    }
    for i in range(n_layer):
        t = f'decoder.layers.{i}'
        params[f'layer_{i}'] = {
            'attn': {
                'qkv_net': _dense(s, f'{t}.dec_attn.qkv_net', bias=False),
                'r_net': _dense(s, f'{t}.dec_attn.r_net', bias=False),
                'o_net': _dense(s, f'{t}.dec_attn.o_net', bias=False),
                'layer_norm': _ln(s, f'{t}.dec_attn.layer_norm'),
            },
            'ff': {
                'fc1': _dense(s, f'{t}.pos_ff.CoreNet.0'),
                'fc2': _dense(s, f'{t}.pos_ff.CoreNet.3'),
                'layer_norm': _ln(s, f'{t}.pos_ff.layer_norm'),
            },
        }
    return {'params': params}


def convert_performer_pt(path: str, n_layer: int = 12) -> Dict[str, Any]:
    """Reference ``MusicPerformer`` state dict -> flax params tree."""
    s = _load_state_dict(path)
    params: Dict[str, Any] = {
        'token_emb': {'embedding': s['token_emb.emb_lookup.weight']},
        'out_proj': _dense(s, 'dec_out_proj'),
    }
    if 'segemb.emb_lookup.weight' in s:
        params['segemb'] = {'embedding': s['segemb.emb_lookup.weight']}
    for i in range(n_layer):
        t = f'transformer_decoder.decoder_layers.{i}'
        params[f'layer_{i}'] = {
            'q_proj': _dense(s, f'{t}.attention.query_projection'),
            'k_proj': _dense(s, f'{t}.attention.key_projection'),
            'v_proj': _dense(s, f'{t}.attention.value_projection'),
            'out_proj': _dense(s, f'{t}.attention.out_projection'),
            'linear1': _dense(s, f'{t}.linear1'),
            'linear2': _dense(s, f'{t}.linear2'),
            'norm1': _ln(s, f'{t}.norm1'),
            'norm2': _ln(s, f'{t}.norm2'),
        }
    return {'params': params}


def convert_gpt2_pt(path: str, n_layer: int = 12) -> Dict[str, Any]:
    """Reference ``MusicGPT2`` state dict -> flax params tree.

    HF Conv1D weights are stored [in, out] so no transpose is applied.
    """
    s = _load_state_dict(path)
    params: Dict[str, Any] = {
        'token_emb': {'embedding': s['token_emb.emb_lookup.weight']},
        'out_proj': _dense(s, 'dec_out_proj'),
    }
    if 'segemb.emb_lookup.weight' in s:
        params['segemb'] = {'embedding': s['segemb.emb_lookup.weight']}
    for i in range(n_layer):
        t = f'transformer_decoder.{i}'
        params[f'block_{i}'] = {
            'ln_1': _ln(s, f'{t}.ln_1'),
            'ln_2': _ln(s, f'{t}.ln_2'),
            'c_attn': _dense(s, f'{t}.attn.c_attn', transpose=False),
            'attn_proj': _dense(s, f'{t}.attn.c_proj', transpose=False),
            'c_fc': _dense(s, f'{t}.mlp.c_fc', transpose=False),
            'mlp_proj': _dense(s, f'{t}.mlp.c_proj', transpose=False),
        }
    return {'params': params}
