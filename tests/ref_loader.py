"""Test helper: import reference modules from /root/reference (read-only)
with stubs for their unavailable dependencies (gin, torchaudio, cached_conv
in offline mode), for numeric-parity testing against ported weights."""

import importlib.util
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


def install_stubs():
    if "cached_conv" not in sys.modules:
        cc = types.ModuleType("cached_conv")

        def get_padding(kernel_size, stride=1, dilation=1, mode="centered"):
            total = max((kernel_size - 1) * dilation + 1 - stride, 0)
            if mode == "causal":
                return (total, 0)
            left = (total + 1) // 2
            return (left, total - left)

        class Conv1d(nn.Conv1d):
            def __init__(self, *a, padding=(0, 0), cumulative_delay=0, **k):
                self._pad = (padding if isinstance(padding, tuple)
                             else (padding, padding))
                super().__init__(*a, **k)
                self.cumulative_delay = 0

            def forward(self, x):
                return super().forward(F.pad(x, self._pad))

        class ConvTranspose1d(nn.ConvTranspose1d):
            def __init__(self, *a, cumulative_delay=0, **k):
                super().__init__(*a, **k)
                self.cumulative_delay = 0

        class CachedSequential(nn.Sequential):
            def __init__(self, *mods):
                super().__init__(*mods)
                self.cumulative_delay = 0

        class AlignBranches(nn.Module):
            def __init__(self, *branches, delays=None, cumulative_delay=0):
                super().__init__()
                self.branches = nn.ModuleList(branches)
                self.cumulative_delay = 0

            def forward(self, x):
                return [b(x) for b in self.branches]

        cc.Conv1d = Conv1d
        cc.ConvTranspose1d = ConvTranspose1d
        cc.CachedSequential = CachedSequential
        cc.AlignBranches = AlignBranches
        cc.get_padding = get_padding
        cc.use_cached_conv = lambda b: None
        cc.convs = cc
        sys.modules["cached_conv"] = cc

    if "gin" not in sys.modules:
        gin = types.ModuleType("gin")
        gin.configurable = lambda f=None, **k: (f if f is not None
                                                else (lambda g: g))
        gin.register = gin.configurable
        sys.modules["gin"] = gin

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tr = types.ModuleType("torchaudio.transforms")

        class _S:
            def __init__(self, *a, **k):
                pass

        tr.MelSpectrogram = _S
        tr.Spectrogram = _S
        ta.transforms = tr
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tr

    if "einops_exts" not in sys.modules:
        eex = types.ModuleType("einops_exts")
        eex.rearrange_many = lambda *a, **k: None
        sys.modules["einops_exts"] = eex


_PATCHES = {
    "from scipy.signal import firwin, kaiser, kaiser_beta, kaiserord":
        "from scipy.signal import firwin, kaiserord",
    "from .rotary_embedding import RotaryEmbedding":
        "from ref_rotary import RotaryEmbedding",
    "from ..core import": "from ref_core import",
    "from .pqmf import": "from ref_pqmf import",
    "from .blocks import": "from ref_blocks import",
    # old-scipy API shims
    "h = firwin(N, wc, window=('kaiser', beta), scale=False, nyq=np.pi)":
        "h = firwin(N, float(np.asarray(wc).ravel()[0]), "
        "window=('kaiser', beta), scale=False, fs=2 * np.pi)",
    # beat_this relative imports
    "from .roformer import Transformer, Attention, FeedForward":
        "from ref_beat_roformer import Transformer, Attention, FeedForward",
    "from ..utils import replace_state_dict_key":
        "replace_state_dict_key = lambda sd, old, new: "
        "{k.replace(old, new): v for k, v in sd.items()}",
}


def load_ref(name: str, path: str):
    """Load a reference module with import-line patches applied."""
    install_stubs()
    if name in sys.modules:
        return sys.modules[name]
    src = open(path).read()
    for old, new in _PATCHES.items():
        src = src.replace(old, new)
    mod = types.ModuleType(name)
    mod.__file__ = path
    sys.modules[name] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_reference_codec_module():
    load_ref("ref_core", "/root/reference/after/autoencoder/core.py")
    load_ref("ref_pqmf", "/root/reference/after/autoencoder/networks/pqmf.py")
    return load_ref(
        "ref_sns",
        "/root/reference/after/autoencoder/networks/SimpleNetsStream.py")


def load_reference_transformerv2():
    load_ref("ref_rotary",
             "/root/reference/after/diffusion/networks/rotary_embedding.py")
    return load_ref(
        "ref_transformerv2",
        "/root/reference/after/diffusion/networks/transformerv2.py")


def load_reference_ecapa():
    return load_ref(
        "ref_ecapa",
        "/root/reference/after/diffusion/networks/ecapa_encoder.py")


def load_reference_encoder1d():
    return load_ref("ref_encoder1d",
                    "/root/reference/after/diffusion/networks/encoder.py")


def _install_rotary_torch_stub():
    """Offline stand-in for the rotary_embedding_torch pip package (used by
    the vendored beat_this): interleaved-pair rotation, theta 10000,
    positions 0..n-1 — the exact subset BeatThis uses."""
    if "rotary_embedding_torch" in sys.modules:
        return
    import torch

    class RotaryEmbedding(torch.nn.Module):
        def __init__(self, dim, theta=10000):
            super().__init__()
            inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv)

        def rotate_queries_or_keys(self, x):
            n = x.shape[-2]
            t = torch.arange(n, dtype=torch.float32)
            freqs = torch.einsum("i,j->ij", t, self.inv_freq)
            freqs = freqs.repeat_interleave(2, dim=-1)
            cos, sin = freqs.cos(), freqs.sin()
            d = freqs.shape[-1]
            xr, xp = x[..., :d], x[..., d:]
            x1, x2 = xr[..., 0::2], xr[..., 1::2]
            rot = torch.stack([-x2, x1], dim=-1).reshape(xr.shape)
            return torch.cat([xr * cos + rot * sin, xp], dim=-1)

    m = types.ModuleType("rotary_embedding_torch")
    m.RotaryEmbedding = RotaryEmbedding
    sys.modules["rotary_embedding_torch"] = m


def load_reference_beat_this():
    install_stubs()
    _install_rotary_torch_stub()
    load_ref("ref_beat_roformer",
             "/root/reference/after/dataset/beat_this/model/roformer.py")
    return load_ref(
        "ref_beat_tracker",
        "/root/reference/after/dataset/beat_this/model/beat_tracker.py")
