"""Load the reference's torch model modules (read-only, CPU) for numerical
parity tests.  The reference model dirs aren't packages, so we synthesize
one for their relative imports."""

import importlib.util
import os
import sys
import types

REF = '/root/reference'


def available() -> bool:
    return os.path.isdir(REF)


def _load(pkg_name: str, mod_dir: str, names):
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]
    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [mod_dir]
    sys.modules[pkg_name] = pkg
    for name in names:
        spec = importlib.util.spec_from_file_location(
            f'{pkg_name}.{name}', os.path.join(mod_dir, name + '.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f'{pkg_name}.{name}'] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def load_stage1_models():
    return _load('ref_s1_model', os.path.join(REF, 'stage1_compose', 'model'),
                 ['transformer_helpers', 'optimus_txl_decoder',
                  'plain_transformer'])


def load_stage2_gpt2():
    return _load('ref_s2_model', os.path.join(REF, 'stage2_accompaniment', 'model'),
                 ['transformer_helpers', 'music_gpt2'])


def load_stage2_gpt2_eager():
    """Like :func:`load_stage2_gpt2` but with the module's ``GPT2Config``
    wrapped to pin ``_attn_implementation='eager'`` — HF >= 4.36 leaves it
    None when GPT2Block is constructed directly (as the reference does,
    ``music_gpt2.py:51``), which crashes block construction on HF 4.57."""
    m = load_stage2_gpt2()
    orig = m.music_gpt2.GPT2Config
    if getattr(orig, '__name__', '') != '_EagerGPT2Config':
        def _EagerGPT2Config(**kw):
            cfg = orig(**kw)
            cfg._attn_implementation = 'eager'
            return cfg
        _EagerGPT2Config.__name__ = '_EagerGPT2Config'
        m.music_gpt2.GPT2Config = _EagerGPT2Config
    return m


def load_stage2_inference():
    """Load the reference's REAL ``stage2_accompaniment/inference.py``
    (``generate_conditional`` and its sampling utilities) with its data/midi
    dependencies stubbed out — they are only touched by the CLI main, not by
    the generation loop under test."""
    import importlib.util
    name = 'ref_s2_inference'
    if name in sys.modules:
        return sys.modules[name]
    stubs = {}
    for mod_name, attrs in [
            ('dataloader', ['REMISkylineToMidiTransformerDataset',
                            'pickle_load']),
            ('convert2midi', ['event_to_midi']),
            ('convert_key', ['degree2pitch', 'roman2majorDegree',
                             'roman2minorDegree'])]:
        mod = types.ModuleType(mod_name)
        for a in attrs:
            setattr(mod, a, None)
        stubs[mod_name] = mod
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            name, os.path.join(REF, 'stage2_accompaniment', 'inference.py'))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return mod
