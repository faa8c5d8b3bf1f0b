from .rules import build_rule_tables, emotion_wants_major
from .stage1 import Stage1Generator
from .stage2 import Stage2Generator
from .convert2midi import events_to_midi, RenderMode, TempoEvent
from .pipeline import (
    roman_events_to_absolute, events_to_txt, read_generated_events,
    extract_midi_events_from_generation, emotion_candidates_for_file,
)
