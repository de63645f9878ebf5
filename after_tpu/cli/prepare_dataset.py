"""`after-tpu prepare_dataset`: corpus -> record store with TPU-batched
codec latents.

Reference: /root/reference/after_scripts/prepare_dataset.py — walk files via
parser, resample to target sr, normalise, tile/pad into `num_signal` chunks,
silence-gate, batch-encode latents `z` with the codec, optional pitch/stretch
augmented latents and MIDI slices, write AudioExample records.

TPU redesign: codec encodes run as one jitted batch-8 graph; all decoding /
augmentation stays on host CPU workers.
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from ..config import get_ae_config
from ..dataset import AudioExample, RecordReader, RecordWriter
from ..dataset.audio import load_wav, normalize_signal
from ..dataset.midi import MidiFile
from ..dataset.parsers import get_parser


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu prepare_dataset")
    p.add_argument("--input_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--parser", default="simple_audio")
    p.add_argument("--emb_model_path", default=None,
                   help="codec checkpoint dir (utils.checkpoint layout); "
                        "omit to store waveforms only")
    p.add_argument("--num_signal", type=int, default=524288)
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--normalize", action="store_true", default=True)
    p.add_argument("--cut_silences", action="store_true")
    p.add_argument("--silence_threshold", type=float, default=0.05)
    p.add_argument("--save_waveform", action="store_true")
    p.add_argument("--augmentations", type=int, default=0,
                   help="number of pitch/stretch augmented latent copies")
    p.add_argument("--midi", action="store_true",
                   help="store sliced MIDI per chunk (simple_midi/slakh)")
    p.add_argument("--basic_pitch", default=None,
                   help="path to a basic-pitch torch checkpoint: transcribe "
                        "audio to MIDI when no .mid file exists")
    p.add_argument("--descriptors", action="append", default=None,
                   help="audio descriptors to store per chunk, interpolated "
                        "to the latent frame rate (reference "
                        "prepare_dataset.py:350, transforms.py:273-337); "
                        "repeatable, from {centroid,bandwidth,rolloff,"
                        "flatness,rms}, or 'all'")
    p.add_argument("--beat_track", action="store_true",
                   help="store beat_clock/downbeat_clock phase ramps per "
                        "chunk (reference --beat_track)")
    p.add_argument("--beat_this_ckpt", default=None,
                   help="BeatThis torch checkpoint for the RoFormer tracker "
                        "(dataset/beat_tracker.py); omit to use the "
                        "energy-flux estimator")
    p.add_argument("--max_files", type=int, default=None)
    return p


def _chunk_signal(x: np.ndarray, num_signal: int) -> List[np.ndarray]:
    """Tile short files, pad the tail (prepare_dataset.py:255-292)."""
    if len(x) < num_signal:
        reps = int(np.ceil(num_signal / max(len(x), 1)))
        x = np.tile(x, reps)[:num_signal]
        return [x]
    n = len(x) // num_signal
    chunks = [x[i * num_signal:(i + 1) * num_signal] for i in range(n)]
    rest = x[n * num_signal:]
    if len(rest) > num_signal // 4:
        chunks.append(np.pad(rest, (0, num_signal - len(rest))))
    return chunks


class CodecEncoderFn:
    """Jitted batched codec encode (host->TPU boundary, once per batch)."""

    def __init__(self, ckpt_dir: str, sr: int):
        import jax
        import jax.numpy as jnp
        from ..models import AudioCodec
        from ..utils.checkpoint import restore_checkpoint

        from ..config import load_codec_config

        tree = restore_checkpoint(ckpt_dir)
        self.cfg = load_codec_config(ckpt_dir)
        self.codec = AudioCodec(self.cfg)
        self.variables = tree["codec_vars"] if "codec_vars" in tree else tree
        self.ratio = self.cfg.ratio

        import functools

        @functools.partial(jax.jit)
        def enc(vars_, x):
            return self.codec.apply(vars_, x, method=AudioCodec.encode)

        self._enc = enc

    def __call__(self, batch: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp
        z = self._enc(self.variables, jnp.asarray(batch)[..., None])
        return np.asarray(z).transpose(0, 2, 1)  # store as (C, T)


def pitch_stretch_augment(x: np.ndarray, sr: int, rng: np.random.RandomState
                          ) -> np.ndarray:
    """Host-side pitch-shift/time-stretch augmentation (PSTS equivalent,
    /root/reference/after/dataset/transforms.py:138-212) via phase-vocoder
    time-stretch + polyphase resample."""
    from ..dataset.transforms import pitch_shift_time_stretch
    semitones = rng.uniform(-2, 2)
    stretch = rng.uniform(0.8, 1.25)
    return pitch_shift_time_stretch(x, sr, semitones, stretch)


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    parser = get_parser(args.parser)
    audio_files, midi_files, metadatas = parser(args.input_path)
    if args.max_files:
        audio_files = audio_files[:args.max_files]
        midi_files = midi_files[:args.max_files]
        metadatas = metadatas[:args.max_files]
    print(f"[prepare_dataset] {len(audio_files)} files")

    encoder = (CodecEncoderFn(args.emb_model_path, args.sr)
               if args.emb_model_path else None)
    transcriber = None
    if args.basic_pitch:
        import jax
        from ..dataset.basic_pitch import BasicPitch, load_torch_weights
        transcriber = BasicPitch()
        variables = transcriber.init(jax.random.PRNGKey(0))
        ported = load_torch_weights(args.basic_pitch)
        transcriber.variables = {**variables, **ported}
    beat_tracker = None
    if args.beat_this_ckpt:
        from ..dataset.beat_tracker import Audio2Beats
        beat_tracker = Audio2Beats(args.beat_this_ckpt)
    KNOWN_DESCRIPTORS = ["centroid", "bandwidth", "rolloff", "flatness",
                         "rms"]
    descriptor_names = list(args.descriptors or [])
    if descriptor_names == ["all"]:
        descriptor_names = list(KNOWN_DESCRIPTORS)
    unknown = set(descriptor_names) - set(KNOWN_DESCRIPTORS)
    if unknown:  # fail before any audio is loaded/encoded
        raise SystemExit(f"unknown descriptors {sorted(unknown)}; "
                         f"available: {KNOWN_DESCRIPTORS} (or 'all')")
    rng = np.random.RandomState(0)

    with RecordWriter(args.output_path) as writer:
        idx = 0
        pending, pending_meta = [], []

        def flush():
            nonlocal idx, pending, pending_meta
            if not pending:
                return
            # pad the ragged tail flush up to --batch_size with zero rows so
            # every encode reuses the one compiled batch_size-shaped graph
            # (a tail-shaped batch would force a second multi-minute remote
            # compile through this sandbox's relay); rows past len(pending)
            # are dropped below
            batch = np.stack(pending)
            if encoder is not None and len(pending) < args.batch_size:
                batch = np.concatenate(
                    [batch, np.zeros((args.batch_size - len(pending),)
                                     + batch.shape[1:], np.float32)])
            zs = encoder(batch) if encoder is not None else None
            # encode PSTS augmentations at the SAME batched shape as the
            # originals: one reused compiled graph + one relay dispatch per
            # augmentation slot instead of a per-record batch-1 graph
            zaugs = []
            if encoder is not None and args.augmentations > 0:
                for ai in range(args.augmentations):
                    augs = []
                    for bi in range(len(pending)):
                        aug = pitch_stretch_augment(pending[bi], args.sr,
                                                    rng)
                        aug = np.pad(aug[:args.num_signal],
                                     (0, max(0, args.num_signal - len(aug))))
                        augs.append(aug.astype(np.float32))
                    while len(augs) < len(batch):
                        augs.append(np.zeros(args.num_signal, np.float32))
                    zaugs.append(encoder(np.stack(augs)))
            for bi in range(len(pending)):
                ae = AudioExample()
                if zs is not None:
                    ae.put_array("z", zs[bi].astype(np.float32))
                if args.save_waveform or encoder is None:
                    ae.put_array("waveform", pending[bi], dtype=np.int16)
                meta, midi = pending_meta[bi]
                ae.put_metadata(meta)
                if midi is not None:
                    ae.put_buffer("midi_bytes", midi, [len(midi)])
                if args.beat_track:
                    from ..dataset.transforms import (estimate_beats,
                                                      estimate_downbeats,
                                                      get_beat_signal)
                    z_len = (args.num_signal // encoder.ratio
                             if encoder is not None
                             else args.num_signal // 2048)
                    dur = args.num_signal / args.sr
                    if beat_tracker is not None:
                        beats, downs = beat_tracker(pending[bi], args.sr)
                    else:
                        _, beats = estimate_beats(pending[bi], args.sr)
                        downs = estimate_downbeats(pending[bi], args.sr,
                                                   beats)
                    ae.put_array("beat_clock",
                                 get_beat_signal(beats, dur, z_len))
                    ae.put_array("downbeat_clock",
                                 get_beat_signal(downs, dur, z_len))
                if descriptor_names:
                    from ..dataset.transforms import audio_descriptors
                    z_len = (args.num_signal // encoder.ratio
                             if encoder is not None
                             else args.num_signal // 2048)
                    feats = audio_descriptors(pending[bi], args.sr, z_len)
                    for name in descriptor_names:
                        ae.put_array(name, feats[name])
                for ai, za_batch in enumerate(zaugs):
                    ae.put_array(f"z_aug_{ai}",
                                 np.asarray(za_batch[bi], np.float32))
                writer.put(f"{idx:08d}", ae.serialize())
                idx += 1
            print(f"[prepare_dataset] wrote {idx} examples", flush=True)
            pending, pending_meta = [], []

        for fi, (af, mf, meta) in enumerate(
                zip(audio_files, midi_files, metadatas)):
            try:
                x, _ = load_wav(af, sr=args.sr)
            except Exception as e:
                print(f"[prepare_dataset] skip {af}: {e}")
                continue
            if args.normalize:
                x = normalize_signal(x)
            midi = MidiFile(mf) if (args.midi and mf) else None
            if midi is None and transcriber is not None:
                midi = transcriber.transcribe(x, args.sr)
            for ci, chunk in enumerate(_chunk_signal(x, args.num_signal)):
                if args.cut_silences and np.abs(chunk).max() < args.silence_threshold:
                    continue
                midi_bytes = None
                if midi is not None:
                    t0 = ci * args.num_signal / args.sr
                    t1 = t0 + args.num_signal / args.sr
                    sliced = midi.slice(t0, t1)
                    import pickle
                    midi_bytes = pickle.dumps(sliced)
                pending.append(chunk.astype(np.float32))
                pending_meta.append((dict(meta, chunk=str(ci)), midi_bytes))
                if len(pending) >= args.batch_size:
                    flush()
        flush()
    print(f"[prepare_dataset] wrote {idx} examples -> {args.output_path}")
    return 0


def update_main(argv=None) -> int:
    """Re-encode z for an existing store (reference update_dataset.py)."""
    p = argparse.ArgumentParser(prog="after-tpu update_dataset")
    p.add_argument("--dataset_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--emb_model_path", required=True)
    p.add_argument("--sr", type=int, default=44100)
    args = p.parse_args(argv)

    reader = RecordReader(args.dataset_path)
    encoder = CodecEncoderFn(args.emb_model_path, args.sr)
    with RecordWriter(args.output_path) as writer:
        for key, raw in reader.items():
            ae = AudioExample(raw)
            wav = ae.get("waveform")
            z = encoder(wav[None])[0]
            ae.put_array("z", z.astype(np.float32))
            writer.put(key, ae.serialize())
    print(f"[update_dataset] rewrote {len(reader)} examples")
    return 0
