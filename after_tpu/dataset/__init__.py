from .audio_example import AudioExample
from .store import RecordReader, RecordWriter
from .dataset import CombinedDataset, DataLoader, SimpleDataset
from .collate import make_collate_fn
from .midi import MidiFile, Note
from . import audio, parsers
