"""AOT export of the streaming graph — the TorchScript-export replacement.

Reference: nn_tilde's `export_to_ts` (/root/reference/after_scripts/
export.py:518) compiles the Streamer into a .ts artifact that the nn~ C++
external executes buffer-by-buffer.

Here each streaming method is lowered with `jax.export` (StableHLO) into a
portable artifact directory:

    <out>/
      manifest.json            methods, chunk/ratio metadata, config
      <method>.stablehlo       serialized jax.export artifact
      state/                   initial StreamState arrays (.npz) + treedef

Weights are baked into the artifacts as constants (like .ts); only the
explicit stream state and audio buffers cross the host boundary.  A PJRT C
API host (native/) can load and execute these per audio buffer; Python hosts
use `load_exported` below.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from ..config import to_json
from .streamer import Streamer, StreamState


def _flatten_state(state: StreamState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def write_compile_options(out_dir: str) -> None:
    """Serialized CompileOptionsProto for the native PJRT host.

    Shared by export_streamer and the codec-only export (cli/export.py) so
    the jax-private API access lives in exactly one place.
    """
    try:
        from jax._src.lib import _jax as _jaxlib
        with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
            f.write(_jaxlib.CompileOptions().SerializeAsString())
    except Exception:
        pass


def write_state_bins(sdir: str, leaves) -> None:
    """Raw per-leaf state bins (the v2 native-host state layout)."""
    os.makedirs(sdir, exist_ok=True)
    for i, leaf in enumerate(leaves):
        np.asarray(leaf).tofile(os.path.join(sdir, f"leaf_{i}.bin"))


def export_streamer(streamer: Streamer, variables: Dict[str, Any],
                    out_dir: str, nb_steps: int = 1,
                    guidance_timbre: float = 1.0,
                    guidance_structure: float = 1.0,
                    batch_size: int = 1, donate_state: bool = True,
                    projector_params: Any = None) -> str:
    """Serialize the streaming methods to `out_dir`.

    donate_state bakes input->output aliasing for the stream-state leaves
    into the compiled artifacts: the per-buffer state update happens in
    place on device (no copy of the conv/KV caches per audio callback) on
    any PJRT host, including native/stream_host.cc."""
    os.makedirs(out_dir, exist_ok=True)
    state = streamer.init_state(variables, batch_size)
    leaves, treedef = _flatten_state(state)

    A = streamer.audio_chunk
    T = streamer.chunk_size
    cfg = streamer.cfg
    audio_in = jnp.zeros((batch_size, A, 1), jnp.float32)
    zs_in = jnp.zeros((batch_size, T, cfg.zs_channels), jnp.float32)
    zt_in = jnp.zeros((batch_size, cfg.zt_channels), jnp.float32)
    lat_in = jnp.zeros((batch_size, T, cfg.denoiser.n_channels), jnp.float32)
    rng_in = jnp.zeros((2,), jnp.uint32)
    # live-settable attributes (reference export.py:180-182,331-356
    # registers nb_steps / guidance_* as nn~ attributes the host changes
    # between buffers): here they are RUNTIME scalar inputs of every
    # diffusing method, trailing the rng — no re-export to change them
    steps_in = jnp.zeros((), jnp.int32)
    gt_in = jnp.zeros((), jnp.float32)
    gs_in = jnp.zeros((), jnp.float32)
    attr_in = (steps_in, gt_in, gs_in)

    def pack(f):
        """(state_leaves..., x) closure threading the flat state."""
        def g(leaves, *xs):
            st = jax.tree_util.tree_unflatten(treedef, leaves)
            y, st2 = f(st, *xs)
            return y, jax.tree_util.tree_flatten(st2)[0]
        return g

    methods = {
        "structure": (pack(lambda st, x: streamer.structure(
            variables, st, x)), (audio_in,)),
        "timbre": (pack(lambda st, x: streamer.timbre(
            variables, st, x)), (audio_in,)),
        "diffuse": (pack(lambda st, zs, zt, rng, nb, gt, gs: streamer.diffuse(
            variables, st, zs, zt, nb, gt, gs,
            rng=jax.random.wrap_key_data(rng))),
            (zs_in, zt_in, rng_in) + attr_in),
        "decode": (pack(lambda st, z: streamer.decode(
            variables, st, z)), (lat_in,)),
        "generate": (pack(
            lambda st, zs, zt, rng, nb, gt, gs: streamer.generate(
                variables, st, zs, zt, nb, gt, gs,
                rng=jax.random.wrap_key_data(rng))),
            (zs_in, zt_in, rng_in) + attr_in),
        "generate_timbre": (pack(
            lambda st, x, zt, rng, nb, gt, gs: streamer.generate_timbre(
                variables, st, x, zt, nb, gt, gs,
                rng=jax.random.wrap_key_data(rng))),
            (audio_in, zt_in, rng_in) + attr_in),
        # the full fused a2a step — the reference nn~ `forward`
        # (export.py:486-493): one dispatch per audio callback
        "forward": (pack(
            lambda st, a, b, rng, nb, gt, gs: streamer.forward(
                variables, st, a, b, nb, gt, gs,
                rng=jax.random.wrap_key_data(rng))),
            (audio_in, audio_in, rng_in) + attr_in),
    }
    if streamer.is_midi:
        # MIDI models additionally export the note-pair surface the
        # reference MIDI device drives (export_midi.py:401-417): n_poly
        # (pitch, velocity) signal pairs per latent frame
        notes_in = jnp.zeros((batch_size, T, streamer.n_poly, 2),
                             jnp.float32)
        methods["diffuse_midi"] = (pack(
            lambda st, notes, zt, rng, nb, gt, gs: streamer.diffuse_midi(
                variables, st, notes, zt, nb, gt, gs,
                rng=jax.random.wrap_key_data(rng))),
            (notes_in, zt_in, rng_in) + attr_in)
    if streamer.is_midi:
        # midi models: structure comes from the piano roll, not audio —
        # the audio-structure paths would feed codec latents where the
        # denoiser expects the roll (reference export_midi has neither)
        del methods["generate_timbre"]
        del methods["forward"]

    for name, (fn, xs) in methods.items():
        jitted = (jax.jit(fn, donate_argnums=(0,)) if donate_state
                  else jax.jit(fn))
        exp = jexport.export(jitted)(leaves, *xs)
        with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        # raw StableHLO bytecode for the native PJRT host
        # (native/stream_host.cc compiles this via PJRT_Client_Compile)
        with open(os.path.join(out_dir, f"{name}.mlir.bc"), "wb") as f:
            f.write(exp.mlir_module_serialized)

    if projector_params is not None:
        # stateless XY-pad maps (reference latent2map/map2latent)
        xy_in = jnp.zeros((batch_size, 2), jnp.float32)
        for name, fn, xs in (
                ("latent2map",
                 lambda zt: streamer.latent2map(projector_params, zt),
                 (zt_in,)),
                ("map2latent",
                 lambda xy: streamer.map2latent(projector_params, xy),
                 (xy_in,))):
            exp = jexport.export(jax.jit(fn))(*xs)
            with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
                f.write(exp.serialize())
            with open(os.path.join(out_dir, f"{name}.mlir.bc"), "wb") as f:
                f.write(exp.mlir_module_serialized)

    write_compile_options(out_dir)

    # initial state + treedef layout (npz can't hold bfloat16 — store the
    # raw bits and reconstruct from state_dtypes in the manifest)
    sdir = os.path.join(out_dir, "state")
    os.makedirs(sdir, exist_ok=True)

    def storable(a):
        a = np.asarray(a)
        return a.view(np.uint16) if a.dtype.name == "bfloat16" else a

    np.savez(os.path.join(sdir, "initial_state.npz"),
             **{f"leaf_{i}": storable(l) for i, l in enumerate(leaves)})
    write_state_bins(sdir, leaves)
    manifest = {
        "format_version": 2,
        "methods": streamer.method_specs(),
        "chunk_size": T,
        "audio_chunk": A,
        # voices batched into one graph: B buffers cost ~the same wall time
        # as one (measured: 46.8/47.5/47.7 ms at B=1/4/8 — see PARITY.md),
        # so serving hosts stack concurrent users into a batched artifact
        "batch_size": batch_size,
        "ratio": streamer.ratio,
        "sr": cfg.sr,
        # streamed decode/forward latency a host should compensate:
        # crossfade overlap for non-causal codecs, the causal decoder's
        # static transpose-conv delay otherwise (same keys as the
        # codec-only manifest)
        "decode_lag_frames": streamer.decode_lag_frames,
        "decode_lag_samples": streamer.decode_lag_samples,
        "streaming": ("crossfade" if streamer.crossfade is not None
                      else "cached"),
        "nb_steps": nb_steps,
        # live-settable attribute defaults + bounds (the nn~ attribute
        # registry equivalent); hosts feed these as trailing scalar inputs
        # to every method whose spec lists "attributes"
        "attributes": {
            "nb_steps": {"default": int(nb_steps), "dtype": "int32",
                         "min": 1,
                         "max": int(cfg.denoiser.max_diffusion_steps)},
            "guidance_timbre": {"default": float(guidance_timbre),
                                "dtype": "float32"},
            "guidance_structure": {"default": float(guidance_structure),
                                   "dtype": "float32"},
        },
        # 1 marks a baked XY-pad surface: latent2map/map2latent graphs +
        # map.png + projector.msgpack present (reference latent_project)
        "latent_map": int(projector_params is not None),
        # >0 marks a MIDI artifact: hosts feed diffuse_midi (chunk, n_poly,
        # 2) note pairs instead of structure audio (reference export_midi)
        "n_poly": int(streamer.n_poly) if streamer.is_midi else 0,
        "n_state_leaves": len(leaves),
        "state_shapes": [list(np.shape(l)) for l in leaves],
        "state_dtypes": [str(np.asarray(l).dtype) for l in leaves],
        "config": json.loads(to_json(cfg)),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


class ExportedCodec:
    """Python host for a codec-only artifact (`after-tpu export_autoencoder`):
    stateful encode/decode, each with its own stream state — cached-conv
    state for causal codecs, context/crossfade buffers for non-causal ones
    (reference export_stream.ts, export_autoencoder.py:291-302)."""

    def __init__(self, path: str):
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._fns, self._state = {}, {}
        self._names = tuple(
            n for n in ("encode", "decode", "forward")
            if os.path.exists(os.path.join(path, f"{n}.stablehlo")))
        for name in self._names:
            self._fns[name] = jexport.deserialize(
                open(os.path.join(path, f"{name}.stablehlo"), "rb").read())
        self.reset(path)

    def reset(self, path: str):
        for name in self._names:
            z = np.load(os.path.join(path, f"{name}_state.npz"))
            self._state[name] = [jnp.asarray(z[k]) for k in sorted(
                z.files, key=lambda s: int(s.split("_")[1]))]

    def _call(self, name, x):
        y, st = self._fns[name].call(self._state[name], jnp.asarray(x))
        self._state[name] = list(st)
        return y

    def encode(self, audio):
        """(B, chunk*ratio, 1) audio -> (B, chunk, z) latents."""
        return self._call("encode", audio)

    def decode(self, z):
        """(B, chunk, z) latents -> (B, chunk*ratio, 1) audio (delayed by
        manifest["decode_lag_frames"] latent frames on crossfade codecs)."""
        return self._call("decode", z)

    def forward(self, audio):
        """Fused decode(encode(audio)) round trip in ONE graph — the
        reference AE exports' `forward` method (export_autoencoder.py
        AE_causal:225-247); carries its own combined enc+dec state."""
        return self._call("forward", audio)


class ExportedStreamer:
    """Python host for an exported artifact (mirrors what the C++ PJRT host
    does): holds flat state, calls the deserialized methods per buffer.

    Live-settable attributes (reference nn~ getters/setters,
    export.py:331-356): ``set_attribute("nb_steps"|"guidance_timbre"|
    "guidance_structure", v)`` takes effect on the next buffer — the
    attribute values are trailing runtime inputs of the compiled methods,
    so no recompilation happens."""

    def __init__(self, path: str):
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._methods = {}
        for name in self.manifest["methods"]:
            p = os.path.join(path, f"{name}.stablehlo")
            if os.path.exists(p):
                self._methods[name] = jexport.deserialize(
                    open(p, "rb").read())
        self.attributes = {
            k: v["default"]
            for k, v in self.manifest.get("attributes", {}).items()}
        self.reset(path)

    def has_method(self, name: str) -> bool:
        return name in self._methods

    def set_attribute(self, name: str, value):
        spec = self.manifest.get("attributes", {}).get(name)
        if spec is None:
            raise KeyError(f"no such attribute: {name}")
        value = int(value) if spec["dtype"] == "int32" else float(value)
        if "min" in spec:
            value = max(spec["min"], min(spec["max"], value))
        self.attributes[name] = value
        return value

    def get_attribute(self, name: str):
        return self.attributes[name]

    def _attr_args(self, name: str):
        names = self.manifest["methods"].get(name, {}).get("attributes", ())
        return tuple(
            jnp.asarray(self.attributes[a],
                        jnp.int32 if self.manifest["attributes"][a]["dtype"]
                        == "int32" else jnp.float32)
            for a in names)

    def call(self, name: str, *xs):
        xs = xs + self._attr_args(name)
        if self.manifest["methods"].get(name, {}).get("stateless"):
            return self._methods[name].call(*xs)
        y, new_state = self._methods[name].call(self.state, *xs)
        self.state = list(new_state)
        return y

    def reset(self, path: str):
        import ml_dtypes
        z = np.load(os.path.join(path, "state", "initial_state.npz"))
        dtypes = self.manifest["state_dtypes"]
        self.state = []
        for i in range(self.manifest["n_state_leaves"]):
            a = z[f"leaf_{i}"]
            if dtypes[i] == "bfloat16":
                a = a.view(ml_dtypes.bfloat16)
            self.state.append(jnp.asarray(a))
