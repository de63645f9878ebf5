"""Beat This! beat/downbeat tracker — TPU port of the vendored RoFormer.

Reference: /root/reference/after/dataset/beat_this (model/beat_tracker.py,
model/roformer.py, model/postprocessor.py, preprocessing.py, inference.py).
The reference downloads its checkpoint ("final0") at first use; this port
implements the architecture, the log-mel frontend, the minimal
postprocessor, and a torch-state-dict weight loader so a checkpoint drops
in when available.  Without weights, `dataset.transforms.estimate_beats` /
`estimate_downbeats` remain the functional fallback.

TPU-first layout: spectrograms ride (B, F, T, C) (channels-last convs on
the MXU); the log-mel frontend is built from the host-designed filterbank
in ops/stft.py and fuses under one jit per chunk.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotary import apply_rotary, rotary_angles
from ..ops.stft import mel_filterbank, spectrogram

FPS = 50                # 22050 / 441 (preprocessing.py LogMelSpect defaults)
SR = 22050
N_FFT, HOP, N_MELS = 1024, 441, 128


# ---------------------------------------------------------------------------
# RoFormer pieces (model/roformer.py)
# ---------------------------------------------------------------------------


class RMSNorm(nn.Module):
    """F.normalize(x, -1) * sqrt(size) * gamma (roformer.py:22-33)."""

    size: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.size,))
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(norm, 1e-12) * np.sqrt(self.size) * gamma


class RoFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(self.dim, name="norm")(x)
        h = nn.Dense(self.dim * self.mult, name="in")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, name="out")(h)


class RoAttention(nn.Module):
    """Gated rotary attention (roformer.py:82-132): RMSNorm -> qkv ->
    rotary(q,k) -> SDPA -> sigmoid per-head gates -> out projection."""

    dim: int
    heads: int
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        H, D = self.heads, self.dim_head
        h = RMSNorm(self.dim, name="norm")(x)
        qkv = nn.Dense(3 * H * D, use_bias=False, name="to_qkv")(h)
        qkv = qkv.reshape(B, N, 3, H, D).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        ang = jnp.asarray(rotary_angles(
            np.arange(N, dtype=np.float64), D))
        q = apply_rotary(q, ang)
        k = apply_rotary(k, ang)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(D)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        gates = nn.Dense(H, name="to_gates")(h)          # (B, N, H)
        out = out * jax.nn.sigmoid(gates).transpose(0, 2, 1)[..., None]
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class RoTransformer(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int = 32
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = RoAttention(self.dim, self.heads, self.dim_head,
                            name=f"attn_{i}")(x) + x
            x = RoFeedForward(self.dim, self.ff_mult,
                              name=f"ff_{i}")(x) + x
        return RMSNorm(self.dim, name="norm")(x)


# ---------------------------------------------------------------------------
# BeatThis network (model/beat_tracker.py)
# ---------------------------------------------------------------------------


class PartialFTTransformer(nn.Module):
    """Attention+FF once across frequencies, once across time, on a
    (B, F, T, C) grid (beat_tracker.py:247-300)."""

    dim: int
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        B, F, T, C = x.shape
        H = C // self.dim_head
        # frequency-directed: sequences of F per (b, t)
        h = x.transpose(0, 2, 1, 3).reshape(B * T, F, C)
        h = RoAttention(C, H, self.dim_head, name="attnF")(h) + h
        h = RoFeedForward(C, name="ffF")(h) + h
        # time-directed: sequences of T per (b, f)
        h = h.reshape(B, T, F, C).transpose(0, 2, 1, 3).reshape(B * F, T, C)
        h = RoAttention(C, H, self.dim_head, name="attnT")(h) + h
        h = RoFeedForward(C, name="ffT")(h) + h
        return h.reshape(B, F, T, C)


class BeatThis(nn.Module):
    """Spectrogram (B, T, 128 mel) -> framewise beat/downbeat logits
    (beat_tracker.py:17-200, sum_head variant)."""

    spect_dim: int = N_MELS
    transformer_dim: int = 512
    ff_mult: int = 4
    n_layers: int = 6
    head_dim: int = 32
    stem_dim: int = 32

    @nn.compact
    def __call__(self, spect) -> Dict[str, jnp.ndarray]:
        B, T, FQ = spect.shape
        # stem: per-mel-bin BatchNorm (inference stats) -> (4,3)/(4,1) conv
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         name="stem_bn1d")(spect)
        h = h.transpose(0, 2, 1)[..., None]               # (B, F, T, 1)
        h = nn.Conv(self.stem_dim, (4, 3), strides=(4, 1),
                    padding=((0, 0), (1, 1)), use_bias=False,
                    name="stem_conv")(h)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         name="stem_bn2d")(h)
        h = nn.gelu(h, approximate=False)

        dim = self.stem_dim
        for i in range(3):
            h = PartialFTTransformer(dim, self.head_dim,
                                     name=f"partial_{i}")(h)
            h = nn.Conv(dim * 2, (2, 3), strides=(2, 1),
                        padding=((0, 0), (1, 1)), use_bias=False,
                        name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             name=f"bn_{i}")(h)
            h = nn.gelu(h, approximate=False)
            dim *= 2

        # "b c f t -> b t (c f)": channel-major concat over remaining freqs
        Bq, Fq, Tq, Cq = h.shape
        h = h.transpose(0, 2, 3, 1).reshape(Bq, Tq, Cq * Fq)
        h = nn.Dense(self.transformer_dim, name="linear")(h)

        h = RoTransformer(self.transformer_dim, self.n_layers,
                          self.transformer_dim // self.head_dim,
                          self.head_dim, self.ff_mult,
                          name="transformer")(h)

        bd = nn.Dense(2, name="head")(h)                  # (B, T, 2)
        beat, downbeat = bd[..., 0], bd[..., 1]
        # SumHead: beat logits absorb the downbeat logits
        return {"beat": beat + downbeat, "downbeat": downbeat}


# ---------------------------------------------------------------------------
# log-mel frontend (preprocessing.py LogMelSpect)
# ---------------------------------------------------------------------------


def log_mel_spect(x: jnp.ndarray) -> jnp.ndarray:
    """(T,) 22.05 kHz waveform -> (frames, 128) log1p(1000 * mel);
    torchaudio conventions: hann 1024/441, normalized='frame_length'
    (divide by sqrt(n_fft)), power=1, slaney mel scale 30..11000 Hz."""
    spec = spectrogram(x, N_FFT, HOP, power=1.0, normalized=False,
                       center=True) / np.sqrt(N_FFT)
    fb = mel_filterbank(SR, N_FFT, N_MELS, fmin=30.0, fmax=11000.0,
                        htk=False, slaney_norm=False)
    mel = spec @ jnp.asarray(fb.T)                        # (frames, mels)
    return jnp.log1p(1000.0 * mel)


# ---------------------------------------------------------------------------
# minimal postprocessor (model/postprocessor.py:88-139)
# ---------------------------------------------------------------------------


def _pick_peaks(logits: np.ndarray, fps: int) -> np.ndarray:
    """Local maxima within +/-3 frames with logit > 0 -> times in seconds."""
    T = len(logits)
    padded = np.pad(logits, (3, 3), constant_values=-1000.0)
    windows = np.stack([padded[i:i + T] for i in range(7)], axis=0)
    is_peak = (logits >= windows.max(axis=0)) & (logits > 0)
    frames = np.nonzero(is_peak)[0]
    # deduplicate adjacent peaks (postprocessor.deduplicate_peaks width=1)
    keep = []
    for f in frames:
        if keep and f - keep[-1] <= 1:
            continue
        keep.append(f)
    return np.asarray(keep, dtype=np.float64) / fps


def postprocess_minimal(beat_logits: np.ndarray,
                        downbeat_logits: np.ndarray,
                        fps: int = FPS) -> Tuple[np.ndarray, np.ndarray]:
    beat = _pick_peaks(np.asarray(beat_logits), fps)
    down = _pick_peaks(np.asarray(downbeat_logits), fps)
    if len(beat):
        down = np.unique([beat[np.argmin(np.abs(beat - d))] for d in down])
    return beat, down


# ---------------------------------------------------------------------------
# DBN postprocessor (model/postprocessor.py:31-38,142-177): the reference
# delegates to madmom's DBNDownBeatTrackingProcessor(beats_per_bar=[3,4],
# min_bpm=55, max_bpm=215, transition_lambda=100).  madmom isn't in this
# image, so the bar-pointer hidden-Markov model (Boeck et al., "Joint beat
# and downbeat tracking with recurrent neural networks", ISMIR 2016) is
# implemented from first principles in numpy:
#   states   (meter b, beat interval tau, beat-in-bar, position-in-beat)
#   obs      each beat split into 16 cells; cell 0 observes the (down)beat
#            activation, the rest (1 - beat - down)/(16 - 1)
#   trans    deterministic position advance; at beat boundaries the tempo
#            may change with penalty exp(-lambda * |tau'/tau - 1|)
#   decode   exact Viterbi; beats = frames entering position 0, downbeats =
#            beats with beat-in-bar 0, each snapped to the max activation
#            inside its cell-0 window (madmom correct=True)
# ---------------------------------------------------------------------------

_OBS_LAMBDA = 16  # observation cells per beat (madmom default)


def _tempo_transition(taus: np.ndarray, lam: float) -> np.ndarray:
    """log P(tau_to | tau_from): exponential_transition, rows normalized."""
    ratio = taus[None, :] / taus[:, None].astype(np.float64)
    p = np.exp(-lam * np.abs(ratio - 1.0))
    p /= p.sum(axis=1, keepdims=True)
    return np.log(p)


def postprocess_dbn(beat_logits: np.ndarray, downbeat_logits: np.ndarray,
                    fps: int = FPS, beats_per_bar=(3, 4),
                    min_bpm: float = 55.0, max_bpm: float = 215.0,
                    transition_lambda: float = 100.0,
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Joint beat/downbeat decode of framewise logits via the bar-pointer
    DBN (the reference Postprocessor(type="dbn") path)."""
    eps = 1e-5
    # tanh form is overflow-free for the -1000 border fills
    beat = 0.5 * (1.0 + np.tanh(0.5 * np.asarray(beat_logits, np.float64)))
    down = 0.5 * (1.0 + np.tanh(0.5 * np.asarray(downbeat_logits,
                                                 np.float64)))
    beat = beat * (1 - eps) + eps / 2
    down = down * (1 - eps) + eps / 2
    # artificial multiclass activations (postp_dbn_item): [beat-only, down]
    act = np.stack([np.maximum(beat - down, eps / 2), down], axis=1)
    T = len(act)
    # per-frame log-densities of the 3 observation classes
    log_obs = np.log(np.stack([
        np.maximum((1.0 - act.sum(1)) / (_OBS_LAMBDA - 1), 1e-30),
        act[:, 0], act[:, 1]], axis=1))          # (T, 3)

    taus = np.arange(int(round(60.0 * fps / max_bpm)),
                     int(round(60.0 * fps / min_bpm)) + 1)
    n_tau, tau_max = len(taus), int(taus[-1])
    log_trans = _tempo_transition(taus, transition_lambda)
    pos_valid = np.arange(tau_max)[None, :] < taus[:, None]   # (n_tau, pos)

    best = (-np.inf, None)  # (final log prob, decoded per-frame path)
    for b in beats_per_bar:
        # observation class per state (n_tau, b, pos)
        cell = (np.arange(tau_max)[None, :] * _OBS_LAMBDA) // taus[:, None]
        obs_idx = np.where(cell == 0, 1, 0)[:, None, :] * np.ones(
            (1, b, 1), np.int64)
        obs_idx[:, 0, :][cell == 0] = 2        # first beat of bar: downbeat
        n_states = b * int(taus.sum())
        delta = np.where(pos_valid[:, None, :], -np.log(float(n_states)),
                         -np.inf) + log_obs[0][obs_idx]
        bp_tau = np.zeros((T, n_tau, b), np.int64)   # argmax tau' at pos 0
        tau_end = taus - 1                           # last position per tau
        for t in range(1, T):
            ends = delta[np.arange(n_tau), :, tau_end]       # (n_tau, b)
            prev_beat = ends[:, (np.arange(b) - 1) % b]      # wrap bar
            # scores of entering pos 0 at tempo tau from each tau'
            score = prev_beat[:, None, :] + log_trans[:, :, None]
            bp_tau[t] = np.argmax(score, axis=0)
            new0 = np.max(score, axis=0)                     # (n_tau, b)
            delta[:, :, 1:] = delta[:, :, :-1]
            delta[:, :, 0] = new0
            delta = np.where(pos_valid[:, None, :], delta, -np.inf)
            delta += log_obs[t][obs_idx]
        flat = np.argmax(delta)
        if delta.flat[flat] > best[0]:
            ti, bi, pi = np.unravel_index(flat, delta.shape)
            path = np.empty((T, 3), np.int64)                # tau_i, beat, pos
            path[T - 1] = (ti, bi, pi)
            for t in range(T - 1, 0, -1):
                ti, bi, pi = path[t]
                path[t - 1] = ((ti, bi, pi - 1) if pi > 0 else
                               (bp_tau[t, ti, bi], (bi - 1) % b,
                                int(tau_end[bp_tau[t, ti, bi]])))
            best = (delta.flat[flat], path)

    path = best[1]
    if path is None or T == 0:
        return np.array([]), np.array([])
    onsets = np.nonzero(path[:, 2] == 0)[0]
    # snap each beat to the max combined activation inside its cell-0
    # window (madmom correct=True)
    window = (np.arange(tau_max)[None, :] * _OBS_LAMBDA
              < taus[:, None]).sum(1)            # cell-0 width per tempo
    comb = act.sum(1)
    times, numbers = [], []
    for f in onsets:
        w = int(window[path[f, 0]])
        seg = comb[f:min(f + w, T)]
        times.append((f + int(np.argmax(seg))) / fps)
        numbers.append(int(path[f, 1]))
    times = np.asarray(times, np.float64)
    numbers = np.asarray(numbers)
    return times, times[numbers == 0]


class Postprocessor:
    """Reference-API postprocessor (model/postprocessor.py:9-38): maps
    framewise beat/downbeat LOGITS to (beat_times, downbeat_times) seconds
    via "minimal" peak picking or the "dbn" bar-pointer decode."""

    def __init__(self, type: str = "minimal", fps: int = FPS):
        if type not in ("minimal", "dbn"):
            raise ValueError(f"unknown postprocessor type: {type}")
        self.type = type
        self.fps = fps

    def __call__(self, beat_logits, downbeat_logits
                 ) -> Tuple[np.ndarray, np.ndarray]:
        fn = (postprocess_minimal if self.type == "minimal"
              else postprocess_dbn)
        return fn(np.asarray(beat_logits), np.asarray(downbeat_logits),
                  fps=self.fps)


# ---------------------------------------------------------------------------
# inference driver (inference.py Audio2Beats, chunked with borders)
# ---------------------------------------------------------------------------


class Audio2Beats:
    """waveform -> (beat_times, downbeat_times).

    checkpoint_path: torch state dict (.pth / torchscript-free) of the
    reference BeatThis model; None runs the randomly-initialized network
    (only useful for tests — prefer transforms.estimate_beats then).
    dbn switches peak picking to the bar-pointer Viterbi decode
    (reference inference.py:294-301 Audio2Beats(dbn=...))."""

    CHUNK, BORDER = 1500, 6

    def __init__(self, checkpoint_path: Optional[str] = None,
                 dbn: bool = False):
        self.postprocessor = Postprocessor(type="dbn" if dbn else "minimal")
        self.net = BeatThis()
        if checkpoint_path:
            self.variables = load_torch_weights(checkpoint_path)
        else:
            # only init when no checkpoint: the jitted full-model init is
            # an expensive throwaway on remote-compile backends otherwise
            spect = jnp.zeros((1, self.CHUNK, N_MELS))
            self.variables = jax.jit(self.net.init)(jax.random.PRNGKey(0),
                                                    spect)
        self._fwd = jax.jit(
            lambda v, s: self.net.apply(v, s))

    def __call__(self, waveform: np.ndarray, sr: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
        from .audio import resample
        x = np.asarray(waveform, np.float32).reshape(-1)
        if sr != SR:
            x = resample(x, sr, SR)
        spect = np.asarray(log_mel_spect(jnp.asarray(x)))
        T = len(spect)
        C, Bd = self.CHUNK, self.BORDER
        beat = np.full(T, -1000.0, np.float32)
        down = np.full(T, -1000.0, np.float32)
        starts = list(range(-Bd, T - Bd, C - 2 * Bd)) or [-Bd]
        for s in starts:
            lo, hi = max(s, 0), min(s + C, T)
            chunk = spect[lo:hi]
            pad = C - len(chunk)
            chunk = np.pad(chunk, ((max(0, -s), pad - max(0, -s)), (0, 0)))
            out = self._fwd(self.variables, jnp.asarray(chunk)[None])
            b = np.asarray(out["beat"])[0]
            d = np.asarray(out["downbeat"])[0]
            off = max(0, -s)
            take_lo, take_hi = lo + Bd, min(hi, T)
            src_lo = take_lo - s
            beat[take_lo:take_hi] = b[src_lo:src_lo + take_hi - take_lo]
            down[take_lo:take_hi] = d[src_lo:src_lo + take_hi - take_lo]
        # the first border frames never get predictions (reference masks
        # borders too); leave them at -1000 (never peaks)
        return self.postprocessor(beat, down)


# ---------------------------------------------------------------------------
# torch checkpoint port
# ---------------------------------------------------------------------------


def _t(w):
    return jnp.asarray(np.asarray(w).T)


def _conv2d(w):
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return jnp.asarray(np.asarray(w).transpose(2, 3, 1, 0))


def load_torch_weights(path: str):
    """Load + map a reference BeatThis checkpoint file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return map_torch_state_dict(sd)


def map_torch_state_dict(sd):
    """Map the reference BeatThis state dict onto this module's params."""
    def strip(k):
        # torch.compile may wrap the outer module: strip '_orig_mod.' FIRST
        # so '_orig_mod.model.*' keys also lose the 'model.' prefix
        k = k.replace("_orig_mod.", "")
        return k.replace("model.", "", 1) if k.startswith("model.") else k

    sd = {strip(k): v.detach().numpy() if hasattr(v, "detach") else v
          for k, v in sd.items()}
    g = lambda k: np.asarray(sd[k])

    def attn(prefix):
        return {"norm": {"gamma": jnp.asarray(g(f"{prefix}.norm.gamma"))},
                "to_qkv": {"kernel": _t(g(f"{prefix}.to_qkv.weight"))},
                "to_gates": {"kernel": _t(g(f"{prefix}.to_gates.weight")),
                             "bias": jnp.asarray(g(f"{prefix}.to_gates.bias"))},
                "to_out": {"kernel": _t(g(f"{prefix}.to_out.0.weight"))}}

    def ff(prefix):
        return {"norm": {"gamma": jnp.asarray(g(f"{prefix}.net.0.gamma"))},
                "in": {"kernel": _t(g(f"{prefix}.net.1.weight")),
                       "bias": jnp.asarray(g(f"{prefix}.net.1.bias"))},
                "out": {"kernel": _t(g(f"{prefix}.net.4.weight")),
                        "bias": jnp.asarray(g(f"{prefix}.net.4.bias"))}}

    def bn(prefix):
        return ({"scale": jnp.asarray(g(f"{prefix}.weight")),
                 "bias": jnp.asarray(g(f"{prefix}.bias"))},
                {"mean": jnp.asarray(g(f"{prefix}.running_mean")),
                 "var": jnp.asarray(g(f"{prefix}.running_var"))})

    params, stats = {}, {}
    params["stem_bn1d"], stats["stem_bn1d"] = bn("frontend.stem.bn1d")
    params["stem_conv"] = {"kernel": _conv2d(g("frontend.stem.conv2d.weight"))}
    params["stem_bn2d"], stats["stem_bn2d"] = bn("frontend.stem.bn2d")
    for i in range(3):
        base = f"frontend.blocks.{i}"
        params[f"partial_{i}"] = {
            "attnF": attn(f"{base}.partial.attnF"),
            "ffF": ff(f"{base}.partial.ffF"),
            "attnT": attn(f"{base}.partial.attnT"),
            "ffT": ff(f"{base}.partial.ffT")}
        params[f"conv_{i}"] = {"kernel": _conv2d(g(f"{base}.conv2d.weight"))}
        params[f"bn_{i}"], stats[f"bn_{i}"] = bn(f"{base}.norm")
    params["linear"] = {"kernel": _t(g("frontend.linear.weight")),
                        "bias": jnp.asarray(g("frontend.linear.bias"))}
    tr = {}
    for i in range(6):
        tr[f"attn_{i}"] = attn(f"transformer_blocks.layers.{i}.0")
        tr[f"ff_{i}"] = ff(f"transformer_blocks.layers.{i}.1")
    tr["norm"] = {"gamma": jnp.asarray(g("transformer_blocks.norm.gamma"))}
    params["transformer"] = tr
    params["head"] = {
        "kernel": _t(g("task_heads.beat_downbeat_lin.weight")),
        "bias": jnp.asarray(g("task_heads.beat_downbeat_lin.bias"))}
    return {"params": params, "batch_stats": stats}
