"""Web frontend (`after-tpu serve` surface): HTTP API end-to-end on a micro
model — map PNG, XY-pad timbre, timbre-from-audio, transfer round trip."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest
import scipy.io.wavfile

from after_tpu.frontend.server import AfterFrontend, make_handler
from after_tpu.utils.latent_map import train_projector
from tests.test_diffusion import micro_config

# the HTTP/transfer tests compile full pipelines (~1 min apiece on CPU);
# marked slow individually so the file still contributes a fast smoke


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    cfg = micro_config()
    from after_tpu.diffusion import TransferPipeline
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0))

    emb = np.random.RandomState(0).randn(64, cfg.zt_channels).astype(
        np.float32)
    _, proj_params = train_projector(emb, num_steps=50)

    app = AfterFrontend(cfg, variables, projector_params=proj_params,
                        embeddings=emb, nb_steps=2, max_seconds=0.1)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}", cfg
    httpd.shutdown()


def _wav(cfg, seconds=0.05, freq=220.0):
    t = np.arange(int(cfg.sr * seconds)) / cfg.sr
    x = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    buf = io.BytesIO()
    scipy.io.wavfile.write(buf, cfg.sr, (x * 32767).astype(np.int16))
    return buf.getvalue()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers or {})
    return urllib.request.urlopen(req)


def test_frontend_smoke_info_map_and_xy():
    """Fast-loop smoke of the frontend surface (VERDICT r3 #7): app
    construction, /api/info, map.png rendering and XY-pad decode — no
    transfer (the expensive compile)."""
    cfg = micro_config()
    from after_tpu.diffusion import TransferPipeline
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0))
    emb = np.random.RandomState(0).randn(32, cfg.zt_channels).astype(
        np.float32)
    _, proj_params = train_projector(emb, num_steps=20)
    app = AfterFrontend(cfg, variables, projector_params=proj_params,
                        embeddings=emb, nb_steps=1, max_seconds=0.05)
    info = app.info()
    assert info["sr"] == cfg.sr and info["has_projector"]
    assert app.map_png[:8] == b"\x89PNG\r\n\x1a\n"
    z1 = app.set_xy(0.5, -0.5)
    z2 = app.set_xy(-0.5, 0.5)
    assert z1.shape == (1, cfg.zt_channels)
    assert not np.allclose(z1, z2)


@pytest.mark.slow
def test_static_and_info(server):
    base, cfg = server
    html = urllib.request.urlopen(base + "/").read()
    assert b"<canvas" in html and b"/api/transfer" in html
    info = json.loads(urllib.request.urlopen(base + "/api/info").read())
    assert info["sr"] == cfg.sr and info["has_projector"]
    png = urllib.request.urlopen(base + "/map.png").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


@pytest.mark.slow
def test_xy_sets_timbre(server):
    base, cfg = server
    r = _post(base + "/api/xy", json.dumps({"x": 0.3, "y": -0.5}).encode())
    z = json.loads(r.read())["zsem"]
    assert len(z) == cfg.zt_channels
    r2 = _post(base + "/api/xy", json.dumps({"x": -0.8, "y": 0.8}).encode())
    z2 = json.loads(r2.read())["zsem"]
    assert not np.allclose(z, z2)  # the pad actually moves the timbre


@pytest.mark.slow
def test_timbre_from_audio_returns_xy(server):
    base, cfg = server
    r = _post(base + "/api/timbre", _wav(cfg))
    xy = json.loads(r.read())["xy"]
    assert len(xy) == 2 and all(-1.0 <= v <= 1.0 for v in xy)


@pytest.mark.slow
def test_transfer_roundtrip(server):
    base, cfg = server
    wav = _wav(cfg)
    r = _post(base + "/api/transfer?steps=2&gt=1.0&gs=1.0", wav)
    assert r.headers["Content-Type"] == "audio/wav"
    sr, out = scipy.io.wavfile.read(io.BytesIO(r.read()))
    assert sr == cfg.sr
    # at least the (frame-padded) input length; the non-causal decoder may
    # emit a few extra edge samples
    n_in = int(cfg.sr * 0.05)
    assert len(out) >= n_in
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_error_is_json_not_crash(server):
    base, _ = server
    try:
        _post(base + "/api/transfer", b"this is not a wav")
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
        assert "error" in json.loads(e.read())
    assert raised


@pytest.mark.slow
def test_midi_endpoint_rejected_on_a2a_model(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/api/midi", b"MThd")
    assert ei.value.code == 400
    assert "not a MIDI model" in json.loads(ei.value.read())["error"]


def _micro_midi_config():
    from after_tpu.config import get_config, with_overrides
    cfg = get_config("midi")
    cfg = with_overrides(cfg, {
        "denoiser.embed_dim": 64, "denoiser.n_layers": 2,
        "denoiser.noise_embed_dims": 16, "denoiser.mlp_multiplier": 2,
        "encoder.channels": (16, 16, 16, 32),
        "train.n_signal": 32,
        "autoencoder.pqmf_bands": 4, "autoencoder.z_channels": 8,
        "autoencoder.base_channels": 8, "autoencoder.multipliers": (1, 2, 2),
        "autoencoder.factors": (2, 2), "autoencoder.dilations": (1, 3),
        "autoencoder.num_blocks_per_stage": 1,
    })
    return cfg.resolved(in_size=8, n_signal=32)


@pytest.mark.slow
def test_midi_transfer_endpoint():
    """MIDI model: a .mid upload renders audio through /api/midi (the
    afterv2midi.js device surface)."""
    from http.server import ThreadingHTTPServer

    from after_tpu.dataset.midi import MidiFile, Note
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.frontend.server import make_handler

    cfg = _micro_midi_config()
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0))
    app = AfterFrontend(cfg, variables, nb_steps=2, max_seconds=2.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"
        info = json.loads(urllib.request.urlopen(base + "/api/info").read())
        assert info["is_midi"]

        mf = MidiFile(notes=[Note(pitch=60, velocity=100, start=0.0,
                                  end=0.5),
                             Note(pitch=64, velocity=90, start=0.25,
                                  end=0.75)])
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".mid") as f:
            mf.save(f.name)
            mid_bytes = open(f.name, "rb").read()
        r = _post(base + "/api/midi?steps=2", mid_bytes)
        assert r.headers["Content-Type"] == "audio/wav"
        sr, out = scipy.io.wavfile.read(io.BytesIO(r.read()))
        assert sr == cfg.sr and len(out) > 0 and np.isfinite(out).all()
    finally:
        httpd.shutdown()


@pytest.mark.slow
def test_load_frontend_cli_path(tmp_path):
    """cli/serve.load_frontend: real checkpoints + store -> trained
    projector, working transfer (covers the store-layout transpose)."""
    import jax.numpy as jnp

    from after_tpu.cli.serve import build_argparser, load_frontend
    from after_tpu.config import to_json
    from after_tpu.dataset import AudioExample, RecordWriter
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.models import AudioCodec
    from after_tpu.utils.checkpoint import save_checkpoint

    cfg = micro_config()
    pipe = TransferPipeline(cfg)
    variables = jax.jit(pipe.init)(jax.random.PRNGKey(0))

    run_dir, codec_dir, db = (str(tmp_path / d)
                              for d in ("run", "codec", "db"))
    save_checkpoint(run_dir, 1,
                    {"variables": variables["diffusion"],
                     "ema_params": variables["diffusion"]["net"]["params"],
                     "step": 1}, config_json=to_json(cfg))
    save_checkpoint(codec_dir, 1, {"codec_vars": variables["codec"],
                                   "step": 1})
    rng = np.random.RandomState(0)
    with RecordWriter(db) as w:
        for i in range(8):
            ae = AudioExample()
            # reference layout: (C, T)
            ae.put_array("z", rng.randn(cfg.autoencoder.z_channels,
                                        64).astype(np.float32))
            w.put(f"{i:08d}", ae.serialize())

    args = build_argparser().parse_args(
        ["--model_path", run_dir, "--emb_model_path", codec_dir,
         "--store", db, "--map_samples", "8", "--map_steps", "20",
         "--nb_steps", "2", "--max_seconds", "0.1"])
    app = load_frontend(args)
    assert app.projector_params is not None
    assert app.info()["has_projector"]
    app.set_xy(0.1, 0.2)
    wav = app.transfer(_wav(cfg), nb_steps=2)
    sr, out = scipy.io.wavfile.read(io.BytesIO(wav))
    assert sr == cfg.sr and np.isfinite(out).all()
