"""emo_disentanger_tpu — a TPU-native (JAX/XLA/Pallas) framework for
emotion-conditioned symbolic piano music generation.

Re-designed from scratch with the capability surface of EMO-Disentanger
(ISMIR 2024, "Emotion-driven Piano Music Generation via Two-stage
Disentanglement and Functional Representation"; reference layout documented
in SURVEY.md):

* two-stage generation — stage 1 "compose" (valence-conditioned lead sheet,
  Transformer-XL decoder) and stage 2 "embellish" (arousal-conditioned
  performance, Performer / GPT-2 decoder), plus the one-stage REMI baseline;
* functional (Roman-numeral, key-relative) and REMI representations;
* data pipelines for EMOPIA+, HookTheory and Pop1K7;
* TPU-first compute: flax models, Pallas causal linear-attention kernel,
  lax.scan/while_loop token decoders with KV / FAVOR-state caches,
  on-device nucleus sampling, pjit data-parallel training over a
  jax.sharding.Mesh.

Subpackages
-----------
core      music-theory math, quantization bins, event/vocab definitions
data      MIDI/JSON tokenizers, splits, train-time datasets (numpy)
models    flax modules: TXL decoder, Performer, GPT-2
ops       Pallas kernels + sampling primitives
parallel  mesh construction and sharding rules
train     training drivers, optimizer schedule, checkpointing
infer     autoregressive generation + MIDI rendering
cli       argparse entry points mirroring the reference CLI
"""

__version__ = "0.1.0"
