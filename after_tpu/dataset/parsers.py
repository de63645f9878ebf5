"""Corpus parsers: map a dataset directory to (audio_files, midi_files,
metadatas).

Reference: /root/reference/after/dataset/parsers.py (simple_audio :83,
simple_midi :104, slakh :8, vital_parser :125, get_parser :161).  This
environment decodes WAV only (see audio.py); other extensions are listed so
users see what was skipped.
"""

from __future__ import annotations

import os
from typing import List

AUDIO_EXTS = (".wav", ".WAV")
UNSUPPORTED_EXTS = (".mp3", ".flac", ".ogg", ".opus", ".aif", ".aiff", ".m4a")
MIDI_EXTS = (".mid", ".midi", ".MID")

# Slakh instrument ban list (parsers.py:14-20)
SLAKH_BANNED = ("drum", "percussion", "sound effect", "sound fx")


def _walk(path: str, exts) -> List[str]:
    out = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(exts):
                out.append(os.path.join(root, f))
    return sorted(out)


def simple_audio(path: str, **kwargs):
    audio = _walk(path, AUDIO_EXTS)
    skipped = _walk(path, UNSUPPORTED_EXTS)
    if skipped:
        print(f"[parsers] skipped {len(skipped)} non-wav files "
              f"(no decoder available in this environment)")
    metadatas = [{"path": f, "name": os.path.splitext(os.path.basename(f))[0]}
                 for f in audio]
    return audio, [None] * len(audio), metadatas


def simple_midi(path: str, **kwargs):
    """Pair each audio file with a same-stem .mid file (parsers.py:104-122)."""
    audio, _, metadatas = simple_audio(path)
    midis = []
    for f in audio:
        stem = os.path.splitext(f)[0]
        found = None
        for ext in MIDI_EXTS:
            if os.path.exists(stem + ext):
                found = stem + ext
                break
        midis.append(found)
    keep = [i for i, m in enumerate(midis) if m is not None]
    return ([audio[i] for i in keep], [midis[i] for i in keep],
            [metadatas[i] for i in keep])


def slakh(path: str, **kwargs):
    """Slakh2100 stems layout: Track*/stems/*.wav + MIDI/*.mid with a
    metadata.yaml instrument map; drums/fx stems are banned (parsers.py:8-80)."""
    import yaml
    audio, midis, metadatas = [], [], []
    for track in sorted(os.listdir(path)):
        tdir = os.path.join(path, track)
        meta_file = os.path.join(tdir, "metadata.yaml")
        stems_dir = os.path.join(tdir, "stems")
        if not (os.path.isdir(stems_dir) and os.path.exists(meta_file)):
            continue
        with open(meta_file) as f:
            meta = yaml.safe_load(f)
        for stem_id, info in (meta.get("stems") or {}).items():
            inst = str(info.get("inst_class", "")).lower()
            if any(b in inst for b in SLAKH_BANNED):
                continue
            wav = os.path.join(stems_dir, stem_id + ".wav")
            mid = os.path.join(tdir, "MIDI", stem_id + ".mid")
            if os.path.exists(wav):
                audio.append(wav)
                midis.append(mid if os.path.exists(mid) else None)
                metadatas.append({"path": wav, "track": track,
                                  "instrument": inst})
    return audio, midis, metadatas


def vital(path: str, **kwargs):
    """Flat folder of single-note renders named <patch>_<pitch>.wav
    (parsers.py:125-158 flavour)."""
    audio = _walk(path, AUDIO_EXTS)
    metadatas = []
    for f in audio:
        name = os.path.splitext(os.path.basename(f))[0]
        parts = name.rsplit("_", 1)
        metadatas.append({"path": f, "patch": parts[0],
                          "pitch": parts[1] if len(parts) > 1 else ""})
    return audio, [None] * len(audio), metadatas


_PARSERS = {"simple_audio": simple_audio, "simple_midi": simple_midi,
            "slakh": slakh, "vital": vital}


def get_parser(name: str):
    if name not in _PARSERS:
        raise KeyError(f"unknown parser {name!r}; available: {sorted(_PARSERS)}")
    return _PARSERS[name]
