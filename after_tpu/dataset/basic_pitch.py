"""Automatic music transcription (audio -> MIDI) — JAX port of basic-pitch.

Reference: /root/reference/after/dataset/basic_pitch_torch/ (a PyTorch port
of Spotify's basic-pitch ICASSP-2022 model), used by `prepare_dataset
--basic_pitch` to derive MIDI for the midi configs (prepare_dataset.py:285).

Pipeline (model.py:141-220):
    22.05 kHz audio -> CQT (27.5 Hz base, 3 bins/semitone, hop 256)
    -> log-normalised dB -> harmonic stacking (0.5x..7x)
    -> small conv net with contour / note / onset heads
    -> polyphonic note extraction -> MidiFile

The CQT here is a direct Gabor-atom bank (ops.streaming_spectral) rather
than nnAudio's multi-rate CQT2010v2, so activations differ slightly from the
vendored torch port; thresholds are the reference defaults.  Weights can be
ported from the vendored checkpoint via `load_torch_weights`.
"""

from __future__ import annotations

import math
from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .midi import MidiFile, Note

# constants (basic_pitch_torch/constants.py)
FFT_HOP = 256
CONTOURS_BINS_PER_SEMITONE = 3
ANNOTATIONS_BASE_FREQUENCY = 27.5
ANNOTATIONS_N_SEMITONES = 88
AUDIO_SAMPLE_RATE = 22050
MAX_N_SEMITONES = int(np.floor(12.0 * np.log2(0.5 * AUDIO_SAMPLE_RATE
                                              / ANNOTATIONS_BASE_FREQUENCY)))
N_FREQ_BINS_CONTOURS = ANNOTATIONS_N_SEMITONES * CONTOURS_BINS_PER_SEMITONE
STACK_HARMONICS = (0.5, 1, 2, 3, 4, 5, 6, 7)


def _n_cqt_bins() -> int:
    n_semi = min(int(np.ceil(12.0 * np.log2(len(STACK_HARMONICS)))
                     + ANNOTATIONS_N_SEMITONES), MAX_N_SEMITONES)
    return n_semi * CONTOURS_BINS_PER_SEMITONE


def normalized_log(x: jnp.ndarray) -> jnp.ndarray:
    """dB-scale each (T, F) plane to [0, 1] (model.py:26-43)."""
    power = jnp.square(x)
    log_power = 10.0 * jnp.log10(power + 1e-10)
    mn = jnp.min(log_power, axis=(1, 2), keepdims=True)
    off = log_power - mn
    mx = jnp.max(off, axis=(1, 2), keepdims=True)
    return jnp.nan_to_num(off / jnp.maximum(mx, 1e-10))


def harmonic_stacking(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F) -> (B, T, n_out, H) shifted copies (model.py:95-140)."""
    shifts = [int(round(12.0 * CONTOURS_BINS_PER_SEMITONE * math.log2(h)))
              for h in STACK_HARMONICS]
    out = []
    F = x.shape[-1]
    for s in shifts:
        if s == 0:
            cur = x
        elif s > 0:
            cur = jnp.pad(x[:, :, s:], ((0, 0), (0, 0), (0, s)))
        else:
            cur = jnp.pad(x[:, :, :s], ((0, 0), (0, 0), (-s, 0)))
        out.append(cur)
    h = jnp.stack(out, axis=-1)
    return h[:, :, :N_FREQ_BINS_CONTOURS]


class BasicPitchNet(nn.Module):
    """Conv heads over the harmonically-stacked CQT (model.py:141-220).

    Input: (B, T, F=264, H=8) hCQT.  Outputs dict of (B, T, bins) in [0,1].
    """

    @nn.compact
    def __call__(self, hcqt, training: bool = False):
        # contour head: conv(3 x 39) -> BN -> relu -> conv(5) -> sigmoid
        h = nn.Conv(8, (3, 39), padding="SAME", name="contour_conv1")(hcqt)
        h = nn.BatchNorm(use_running_average=not training, epsilon=1e-3,
                         name="contour_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (5, 5), padding="SAME", name="contour_conv2")(h)
        contour = nn.sigmoid(h)

        # note head: strided conv (1,3) over freq -> conv -> sigmoid
        cn = jnp.pad(contour, ((0, 0), (3, 3), (2, 2), (0, 0)))
        h = nn.Conv(32, (7, 7), strides=(1, 3), padding="VALID",
                    name="note_conv1")(cn)
        h = nn.relu(h)
        h = nn.Conv(1, (7, 3), padding="SAME", name="note_conv2")(h)
        note = nn.sigmoid(h)

        # onset head: strided conv on hCQT + concat note -> conv -> sigmoid
        co = jnp.pad(hcqt, ((0, 0), (2, 2), (1, 1), (0, 0)))
        h = nn.Conv(32, (5, 5), strides=(1, 3), padding="VALID",
                    name="onset_conv1")(co)
        h = nn.BatchNorm(use_running_average=not training, epsilon=1e-3,
                         name="onset_bn")(h)
        h = nn.relu(h)
        h = jnp.concatenate([note, h], axis=-1)
        h = nn.Conv(1, (3, 3), padding="SAME", name="onset_conv2")(h)
        onset = nn.sigmoid(h)

        return {"contour": contour[..., 0], "note": note[..., 0],
                "onset": onset[..., 0]}


class BasicPitch:
    """Full transcription pipeline."""

    def __init__(self, variables=None):
        self.net = BasicPitchNet()
        self.variables = variables

    def init(self, rng):
        dummy = jnp.zeros((1, 100, N_FREQ_BINS_CONTOURS, len(STACK_HARMONICS)))
        net_vars = self.net.init(rng, dummy)
        self.variables = {"net": net_vars,
                          "cqt_bn": {"mean": jnp.zeros(()),
                                     "var": jnp.ones(())}}
        return self.variables

    def activations(self, audio: np.ndarray) -> Dict[str, np.ndarray]:
        """22.05 kHz mono audio -> onset/note/contour activations (T, bins)."""
        from ..ops.streaming_spectral import multirate_cqt
        x = jnp.asarray(audio, jnp.float32).reshape(1, -1)
        spec = multirate_cqt(x, AUDIO_SAMPLE_RATE,
                             ANNOTATIONS_BASE_FREQUENCY, _n_cqt_bins(),
                             12 * CONTOURS_BINS_PER_SEMITONE, FFT_HOP)
        spec = normalized_log(spec)
        # bn over the cqt (model.py get_cqt use_batch_norm)
        bn = self.variables.get("cqt_bn")
        if bn is not None and np.ndim(bn["mean"]) == 0:
            spec = (spec - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-3)
        hcqt = harmonic_stacking(spec)
        out = self.net.apply(self.variables["net"], hcqt)
        return {k: np.asarray(v[0]) for k, v in out.items()}

    def transcribe(self, audio: np.ndarray, sr: int,
                   onset_thresh: float = 0.5, frame_thresh: float = 0.3,
                   min_note_len: int = 11) -> MidiFile:
        """audio -> MidiFile via polyphonic note extraction
        (note_creation.py:347 defaults)."""
        from .audio import resample
        if sr != AUDIO_SAMPLE_RATE:
            audio = resample(np.asarray(audio), sr, AUDIO_SAMPLE_RATE)
        acts = self.activations(audio)
        return notes_from_activations(acts["onset"], acts["note"],
                                      onset_thresh, frame_thresh,
                                      min_note_len)


def notes_from_activations(onsets: np.ndarray, frames: np.ndarray,
                           onset_thresh: float = 0.5,
                           frame_thresh: float = 0.3,
                           min_note_len: int = 11,
                           energy_tol: int = 11) -> MidiFile:
    """Polyphonic note extraction (note_creation.py:281-470 semantics):
    onset peaks start notes; a note ends after `energy_tol` consecutive
    below-threshold frames; short notes are dropped."""
    T, n_bins = frames.shape
    fps = AUDIO_SAMPLE_RATE / FFT_HOP
    # local onset peaks above threshold (boundary frames can be peaks too)
    padded = np.pad(onsets, ((1, 1), (0, 0)), constant_values=-1.0)
    peaks = ((padded[1:-1] > padded[:-2]) & (padded[1:-1] >= padded[2:])
             & (onsets > onset_thresh))

    notes: List[Note] = []
    remaining = frames.copy()
    for t0, pitch_bin in zip(*np.where(peaks)):
        t = t0 + 1
        gap = 0
        while t < T and gap < energy_tol:
            if remaining[t, pitch_bin] < frame_thresh:
                gap += 1
            else:
                gap = 0
            t += 1
        t_end = t - gap
        if t_end - t0 < min_note_len:
            continue
        amp = float(frames[t0:t_end, pitch_bin].mean())
        remaining[t0:t_end, pitch_bin] = 0
        notes.append(Note(pitch=pitch_bin + 21,   # bin 0 = A0 (midi 21)
                          velocity=int(np.clip(amp, 0, 1) * 127),
                          start=t0 / fps, end=t_end / fps))
    notes.sort(key=lambda n: n.start)
    return MidiFile(notes=notes)


# ---------------------------------------------------------------------------
# torch weight porting (the vendored checkpoint at
# /root/reference/after/dataset/basic_pitch_torch/assets/*.pth)
# ---------------------------------------------------------------------------


def load_torch_weights(path: str) -> Dict:
    """Port the vendored basic-pitch torch checkpoint into BasicPitchNet
    variables (conv kernels (O,I,kh,kw) -> (kh,kw,I,O))."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]

    def conv(prefix):
        w = sd[prefix + ".weight"].numpy().transpose(2, 3, 1, 0)
        return {"kernel": w, "bias": sd[prefix + ".bias"].numpy()}

    def bn(prefix):
        p = {"scale": sd[prefix + ".weight"].numpy(),
             "bias": sd[prefix + ".bias"].numpy()}
        s = {"mean": sd[prefix + ".running_mean"].numpy(),
             "var": sd[prefix + ".running_var"].numpy()}
        return p, s

    cbn_p, cbn_s = bn("conv_contour.1")
    obn_p, obn_s = bn("conv_onset_pre.1")
    params = {
        "contour_conv1": conv("conv_contour.0"),
        "contour_bn": cbn_p,
        "contour_conv2": conv("conv_contour.3"),
        "note_conv1": conv("conv_note.0"),
        "note_conv2": conv("conv_note.2"),
        "onset_conv1": conv("conv_onset_pre.0"),
        "onset_bn": obn_p,
        "onset_conv2": conv("conv_onset_post.0"),
    }
    stats = {"contour_bn": cbn_s, "onset_bn": obn_s}
    cqt_bn = {"mean": jnp.asarray(sd["bn_layer.running_mean"].numpy()[0]),
              "var": jnp.asarray(sd["bn_layer.running_var"].numpy()[0])}
    return {"net": {"params": params, "batch_stats": stats},
            "cqt_bn": cqt_bn}
