from .midi_io import MidiFile, Note, TempoChange, Marker, TimeSignature, Instrument
from .emopia import (
    analyze_midi, quantize_to_corpus,
    corpus_to_leadsheet, corpus_to_stage2, corpus_to_fullsong, Corpus,
)
from .datasets import Stage1Dataset, Stage2Dataset
