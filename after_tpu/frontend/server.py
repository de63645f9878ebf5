"""Local web frontend: the framework's end-user control surface.

The reference ships Max4Live devices whose JS dynamically instantiates
`nn~ <model> generate_timbre` and binds an XY pad over the model's density
PNG (/root/reference/after.m4l/afterv2.js:44, the pad background is set to
`<model>.png` at :66), plus manual "mega testor" Max patches
(/root/reference/patchs/).  That UI is a Max-editor artifact around a
libtorch host; the TPU-native equivalent here is a dependency-free local web
app over `TransferPipeline`:

- XY pad over the timbre-map density PNG (`utils/latent_map.py`), position
  decoded to a timbre vector with the same SmallAutoencoder projector the
  Max device uses (`map2latent` <-> `projector.decode`);
- timbre can instead be set from an uploaded reference audio (the notebook
  flow, audio_to_audio_demo.ipynb);
- structure audio upload -> diffusion transfer -> rendered WAV back.

Stdlib HTTP only (http.server); all model calls are serialized behind one
lock (a single TPU chip serves one graph at a time anyway).
"""

from __future__ import annotations

import io
import json
import os
import threading
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.io.wavfile

from ..config import AfterConfig
from ..dataset.audio import normalize_signal, resample
from ..diffusion import TransferPipeline
from ..utils.latent_map import (SmallAutoencoder, generate_map_png,
                                png_bytes, train_projector)

_STATIC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "index.html")


def _parse_wav(data: bytes, target_sr: int) -> np.ndarray:
    """WAV bytes -> float32 mono (T,) at target_sr."""
    sr, x = scipy.io.wavfile.read(io.BytesIO(data))
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    elif x.dtype == np.int32:
        x = x.astype(np.float32) / 2147483648.0
    elif x.dtype == np.uint8:
        x = (x.astype(np.float32) - 128.0) / 128.0
    else:
        x = x.astype(np.float32)
    if x.ndim > 1:
        x = x.mean(axis=1)
    if sr != target_sr:
        x = resample(x, sr, target_sr)
    return normalize_signal(x)


def _wav_bytes(x: np.ndarray, sr: int) -> bytes:
    buf = io.BytesIO()
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    scipy.io.wavfile.write(buf, sr, (x * 32767).astype(np.int16))
    return buf.getvalue()


class AfterFrontend:
    """Model-facing half of the web app: owns the pipeline, the current
    timbre vector, and the XY-pad projector."""

    def __init__(self, cfg: AfterConfig, variables,
                 projector_params=None, embeddings: Optional[np.ndarray] = None,
                 nb_steps: int = 20, max_seconds: float = 12.0,
                 map_dir: Optional[str] = None):
        self.cfg = cfg
        self.pipe = TransferPipeline(cfg)
        self.variables = self.pipe.prepare_variables(variables)
        self.nb_steps = int(nb_steps)
        self.max_samples = int(max_seconds * cfg.sr)
        self.lock = threading.Lock()
        self.zsem = np.zeros((1, cfg.zt_channels), np.float32)
        self.projector = SmallAutoencoder(in_dim=cfg.zt_channels)
        self.projector_params = projector_params
        emb2d = None
        if projector_params is not None and embeddings is not None:
            emb2d = np.asarray(self.projector.apply(
                projector_params, jnp.asarray(embeddings),
                method=SmallAutoencoder.encode))
        if map_dir and os.path.exists(os.path.join(map_dir, "map.png")):
            # density PNG baked into an exported artifact at export time
            with open(os.path.join(map_dir, "map.png"), "rb") as f:
                self.map_png = f.read()
        else:
            if emb2d is None:
                emb2d = np.zeros((1, 2), np.float32)
            self.map_png = png_bytes(generate_map_png(emb2d, os.devnull))

    # -- model ops (call under self.lock) ---------------------------------

    def _prep_audio(self, wav: bytes) -> jnp.ndarray:
        x = _parse_wav(wav, self.cfg.sr)[: self.max_samples]
        ratio = self.cfg.autoencoder.ratio
        T = max(ratio, (len(x) + ratio - 1) // ratio * ratio)
        x = np.pad(x, (0, T - len(x)))
        return jnp.asarray(x)[None, :, None]

    def set_xy(self, x: float, y: float):
        """XY-pad position -> timbre vector (afterv2.js pad -> map2latent)."""
        if self.projector_params is None:
            raise ValueError("no projector trained (pass --store to serve)")
        xy = jnp.asarray([[float(x), float(y)]], jnp.float32)
        self.zsem = np.asarray(self.projector.apply(
            self.projector_params, xy, method=SmallAutoencoder.decode))
        return self.zsem

    def set_timbre_audio(self, wav: bytes):
        """Reference-audio timbre (notebook flow); returns the pad position
        of the new timbre if a projector exists."""
        audio = self._prep_audio(wav)
        z = self.pipe.encode(self.variables, audio)
        self.zsem = np.asarray(self.pipe.timbre(self.variables, z))
        if self.projector_params is not None:
            xy = self.projector.apply(self.projector_params,
                                      jnp.asarray(self.zsem),
                                      method=SmallAutoencoder.encode)
            return np.asarray(xy)[0].tolist()
        return None

    @partial(jax.jit, static_argnums=(0, 3))
    def _generate(self, variables, audio, nb_steps, zsem, gt, gs, rng):
        z_struct = self.pipe.encode(variables, audio)
        time_cond = self.pipe.structure(variables, z_struct)
        x0 = jax.random.normal(rng, z_struct.shape)
        z_out = self.pipe.diffuse(variables, x0, zsem, time_cond, nb_steps,
                                  guidance_timbre=gt, guidance_structure=gs)
        return self.pipe.decode(variables, z_out)

    def transfer(self, wav: bytes, nb_steps: Optional[int] = None,
                 guidance_timbre: float = 1.0, guidance_structure: float = 1.0,
                 seed: int = 0) -> bytes:
        audio = self._prep_audio(wav)
        out = self._generate(self.variables, audio,
                             int(nb_steps or self.nb_steps),
                             jnp.asarray(self.zsem),
                             jnp.float32(guidance_timbre),
                             jnp.float32(guidance_structure),
                             jax.random.PRNGKey(seed))
        return _wav_bytes(np.asarray(out)[0, :, 0], self.cfg.sr)

    @partial(jax.jit, static_argnums=(0, 3))
    def _generate_midi(self, variables, roll, nb_steps, zsem, gt, gs, rng):
        x0 = jax.random.normal(
            rng, (roll.shape[0], roll.shape[1], self.cfg.denoiser.n_channels))
        z_out = self.pipe.diffuse(variables, x0, zsem, roll, nb_steps,
                                  guidance_timbre=gt, guidance_structure=gs)
        return self.pipe.decode(variables, z_out)

    def transfer_midi(self, mid: bytes, nb_steps: Optional[int] = None,
                      guidance_timbre: float = 1.0,
                      guidance_structure: float = 1.0,
                      seed: int = 0) -> bytes:
        """MIDI file -> audio (the afterv2midi.js device surface): the
        128-bin piano roll sampled at the latent rate is the structure
        conditioning directly (midi-config models, zs_channels=128)."""
        if self.cfg.structure_type != "midi":
            raise ValueError("not a MIDI model (structure_type != 'midi'); "
                             "use /api/transfer with audio instead")
        from ..dataset.midi import MidiFile

        mf = MidiFile(data=mid)
        latent_rate = self.cfg.sr / self.cfg.autoencoder.ratio
        dur = min(max(mf.duration(), 1.0 / latent_rate),
                  self.max_samples / self.cfg.sr)
        T = max(8, int(dur * latent_rate))
        times = np.arange(T) / latent_rate
        roll = (mf.get_piano_roll(times) / 127.0).T[None]  # (1, T, 128)
        out = self._generate_midi(self.variables,
                                  jnp.asarray(roll, jnp.float32),
                                  int(nb_steps or self.nb_steps),
                                  jnp.asarray(self.zsem),
                                  jnp.float32(guidance_timbre),
                                  jnp.float32(guidance_structure),
                                  jax.random.PRNGKey(seed))
        return _wav_bytes(np.asarray(out)[0, :, 0], self.cfg.sr)

    def info(self) -> dict:
        return {"sr": self.cfg.sr, "zt_channels": self.cfg.zt_channels,
                "nb_steps": self.nb_steps,
                "ratio": self.cfg.autoencoder.ratio,
                "max_seconds": self.max_samples / self.cfg.sr,
                "is_midi": self.cfg.structure_type == "midi",
                "has_projector": self.projector_params is not None}


class ArtifactFrontend:
    """Frontend over an EXPORTED artifact (`after-tpu serve --artifact`):
    the continuous consumer of the production artifact path.  Where
    AfterFrontend drives the offline TransferPipeline from checkpoints,
    this streams buffer-by-buffer through the same compiled StableHLO
    graphs the native host executes — the role the Max device plays for the
    reference's exported .ts models (/root/reference/after.m4l/afterv2.js).

    The XY pad uses the artifact's own baked `map2latent`/`latent2map`
    graphs and `map.png` (exported with `after-tpu export --db_path ...`);
    nb_steps / guidance are the artifact's live-settable attributes."""

    def __init__(self, path: str, nb_steps: Optional[int] = None,
                 max_seconds: float = 12.0):
        from ..streaming.export import ExportedStreamer

        self.path = path
        self.st = ExportedStreamer(path)
        m = self.st.manifest
        self.sr = int(m["sr"])
        self.audio_chunk = int(m["audio_chunk"])
        self.chunk_size = int(m["chunk_size"])
        self.batch = int(m.get("batch_size", 1))
        self.is_midi = int(m.get("n_poly", 0)) > 0
        self.n_poly = int(m.get("n_poly", 0))
        self.zt_channels = int(m["config"]["zt_channels"])
        if nb_steps is not None:
            self.st.set_attribute("nb_steps", nb_steps)
        self.max_samples = int(max_seconds * self.sr)
        self.lock = threading.Lock()
        self.zsem = np.zeros((self.batch, self.zt_channels), np.float32)
        self.has_projector = bool(m.get("latent_map")) and \
            self.st.has_method("map2latent")
        png = os.path.join(path, "map.png")
        if os.path.exists(png):
            with open(png, "rb") as f:
                self.map_png = f.read()
        else:
            self.map_png = png_bytes(
                generate_map_png(np.zeros((1, 2), np.float32), os.devnull))

    def _chunks(self, wav: bytes) -> np.ndarray:
        """WAV bytes -> (N, B, audio_chunk, 1) buffer sequence (voice 0
        carries the signal; extra batched voices are fed zeros)."""
        x = _parse_wav(wav, self.sr)[: self.max_samples]
        A = self.audio_chunk
        n = max(A, (len(x) + A - 1) // A * A)
        x = np.pad(x, (0, n - len(x)))
        bufs = np.zeros((n // A, self.batch, A, 1), np.float32)
        bufs[:, 0, :, 0] = x.reshape(n // A, A)
        return bufs

    def set_xy(self, x: float, y: float):
        if not self.has_projector:
            raise ValueError("artifact has no latent map (re-export with "
                             "--db_path to bake the XY pad)")
        xy = jnp.tile(jnp.asarray([[float(x), float(y)]], jnp.float32),
                      (self.batch, 1))
        self.zsem = np.asarray(self.st.call("map2latent", xy))
        return self.zsem

    def set_timbre_audio(self, wav: bytes):
        """Stream the reference audio through the artifact's stateful
        `timbre` method (its ring buffer accumulates context); the final
        buffer's output is the new timbre vector."""
        zt = None
        for buf in self._chunks(wav):
            zt = self.st.call("timbre", jnp.asarray(buf))
        self.zsem = np.asarray(zt)
        if self.has_projector:
            xy = self.st.call("latent2map", jnp.asarray(self.zsem))
            return np.asarray(xy)[0].tolist()
        return None

    def transfer(self, wav: bytes, nb_steps: Optional[int] = None,
                 guidance_timbre: float = 1.0,
                 guidance_structure: float = 1.0, seed: int = 0) -> bytes:
        if self.is_midi:
            raise ValueError("MIDI artifact: use /api/midi with a .mid file")
        if nb_steps is not None:
            self.st.set_attribute("nb_steps", nb_steps)
        self.st.set_attribute("guidance_timbre", guidance_timbre)
        self.st.set_attribute("guidance_structure", guidance_structure)
        zsem = jnp.asarray(self.zsem)
        outs = []
        for i, buf in enumerate(self._chunks(wav)):
            key = jax.random.key_data(jax.random.PRNGKey(seed * 100003 + i))
            y = self.st.call("generate_timbre", jnp.asarray(buf), zsem, key)
            outs.append(np.asarray(y)[0, :, 0])
        return _wav_bytes(np.concatenate(outs), self.sr)

    def transfer_midi(self, mid: bytes, nb_steps: Optional[int] = None,
                      guidance_timbre: float = 1.0,
                      guidance_structure: float = 1.0,
                      seed: int = 0) -> bytes:
        """MIDI file -> note-pair buffers -> diffuse_midi + decode, buffer
        by buffer (the afterv2midi.js device loop)."""
        if not self.is_midi:
            raise ValueError("not a MIDI artifact; use /api/transfer")
        from ..dataset.midi import MidiFile

        if nb_steps is not None:
            self.st.set_attribute("nb_steps", nb_steps)
        self.st.set_attribute("guidance_timbre", guidance_timbre)
        self.st.set_attribute("guidance_structure", guidance_structure)
        mf = MidiFile(data=mid)
        latent_rate = self.sr / (self.audio_chunk // self.chunk_size)
        dur = min(max(mf.duration(), 1.0 / latent_rate),
                  self.max_samples / self.sr)
        T = int(np.ceil(dur * latent_rate / self.chunk_size)
                ) * self.chunk_size
        pairs = mf.get_note_pairs(np.arange(T) / latent_rate, self.n_poly)
        zsem = jnp.asarray(self.zsem)
        outs = []
        for i in range(0, T, self.chunk_size):
            notes = np.zeros((self.batch, self.chunk_size, self.n_poly, 2),
                             np.float32)
            notes[0] = pairs[i:i + self.chunk_size]
            key = jax.random.key_data(jax.random.PRNGKey(seed * 100003 + i))
            z = self.st.call("diffuse_midi", jnp.asarray(notes), zsem, key)
            y = self.st.call("decode", z)
            outs.append(np.asarray(y)[0, :, 0])
        return _wav_bytes(np.concatenate(outs), self.sr)

    def info(self) -> dict:
        return {"sr": self.sr, "zt_channels": self.zt_channels,
                "nb_steps": self.st.get_attribute("nb_steps"),
                "ratio": self.audio_chunk // self.chunk_size,
                "max_seconds": self.max_samples / self.sr,
                "is_midi": self.is_midi,
                "has_projector": self.has_projector,
                "artifact": self.path}


def make_handler(app: AfterFrontend):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, obj, code=200):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                with open(_STATIC, "rb") as f:
                    self._send(200, f.read(), "text/html; charset=utf-8")
            elif self.path == "/map.png":
                self._send(200, app.map_png, "image/png")
            elif self.path == "/api/info":
                self._json(app.info())
            else:
                self._json({"error": "not found"}, 404)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        def do_POST(self):
            try:
                if self.path == "/api/xy":
                    req = json.loads(self._body())
                    with app.lock:
                        z = app.set_xy(req["x"], req["y"])
                    self._json({"zsem": z[0].tolist()})
                elif self.path == "/api/timbre":
                    with app.lock:
                        xy = app.set_timbre_audio(self._body())
                    self._json({"xy": xy})
                elif self.path.startswith(("/api/transfer", "/api/midi")):
                    from urllib.parse import parse_qs, urlparse
                    q = {k: v[0] for k, v in
                         parse_qs(urlparse(self.path).query).items()}
                    fn = (app.transfer_midi
                          if self.path.startswith("/api/midi")
                          else app.transfer)
                    with app.lock:
                        wav = fn(
                            self._body(),
                            nb_steps=int(q["steps"]) if "steps" in q else None,
                            guidance_timbre=float(q.get("gt", 1.0)),
                            guidance_structure=float(q.get("gs", 1.0)),
                            seed=int(q.get("seed", 0)))
                    self._send(200, wav, "audio/wav")
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # surface model errors to the client
                self._json({"error": str(e)}, 400)

    return Handler


def serve(app: AfterFrontend, host: str = "127.0.0.1", port: int = 8675):
    """Blocking server loop; returns the server if port==0 probing fails."""
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((host, port), make_handler(app))
    print(f"[serve] after_tpu frontend at http://{host}:{server.server_port}")
    server.serve_forever()
