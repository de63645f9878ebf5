"""`after-tpu import_dataset` — migrate a dataset prepared by the PyTorch
reference (AudioExample protobufs in LMDB,
/root/reference/after_scripts/prepare_dataset.py:412-416) into the
after_tpu sharded record store, with no liblmdb dependency.

    after-tpu import_dataset --input_path ref_db/ --output_path db/

The imported store is a drop-in input for `after-tpu train`,
`train_autoencoder`, `update_dataset` and `serve`: waveforms, latents,
augmented latents, descriptors, metadata and (for midi datasets) the
pickled PrettyMIDI blobs are all carried over — the MIDI is re-encoded as
this repo's MidiFile so the piano-roll collate path works without
pretty_midi.
"""

from __future__ import annotations

import argparse

from ..dataset.lmdb_import import import_lmdb


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="after-tpu import_dataset",
                                description=__doc__)
    p.add_argument("--input_path", required=True,
                   help="reference LMDB dir (contains data.mdb) or file")
    p.add_argument("--output_path", required=True,
                   help="output record-store directory")
    p.add_argument("--max_records", type=int, default=None)
    args = p.parse_args(argv)
    n = import_lmdb(args.input_path, args.output_path,
                    max_records=args.max_records)
    return 0 if n > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
