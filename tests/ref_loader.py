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
