from .txl import PlainTransformer, masked_cross_entropy
from .performer import MusicPerformer
from .gpt2 import MusicGPT2
