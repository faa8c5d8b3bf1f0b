from .io import pickle_load, pickle_dump, json_read, json_write, load_yaml
from .logging import EpochLogger, write_valloss_line
