"""Convert a standard MIDI file to the native host's notes tensor:
raw float32 (n_frames, n_poly, 2) of (pitch, velocity) pairs sampled at
the artifact's latent frame rate — the streaming note-pair conditioning
the reference's Max device feeds nn~ (export_midi.py).

usage: python scripts/midi_to_notes.py song.mid artifact_dir notes.bin
"""
import json, os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
from after_tpu.dataset.midi import MidiFile


def main():
    mid_path, art, out_path = sys.argv[1:4]
    manifest = json.load(open(os.path.join(art, "manifest.json")))
    n_poly = manifest["n_poly"]
    assert n_poly > 0, "not a MIDI artifact"
    sr, ratio = manifest["sr"], manifest["ratio"]
    mf = MidiFile(mid_path)
    latent_rate = sr / ratio
    n_frames = max(manifest["chunk_size"],
                   int(np.ceil(mf.duration() * latent_rate)))
    # pad up to whole buffers
    cs = manifest["chunk_size"]
    n_frames = ((n_frames + cs - 1) // cs) * cs
    times = np.arange(n_frames) / latent_rate
    notes = mf.get_note_pairs(times, n_poly)
    notes.tofile(out_path)
    print(f"{out_path}: {n_frames} frames x {n_poly} poly "
          f"({n_frames // cs} buffers of {cs})")


if __name__ == "__main__":
    main()
