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

pytestmark = pytest.mark.slow


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


def test_static_and_info(server):
    base, cfg = server
    html = urllib.request.urlopen(base + "/").read()
    assert b"<canvas" in html and b"/api/transfer" in html
    info = json.loads(urllib.request.urlopen(base + "/api/info").read())
    assert info["sr"] == cfg.sr and info["has_projector"]
    png = urllib.request.urlopen(base + "/map.png").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_xy_sets_timbre(server):
    base, cfg = server
    r = _post(base + "/api/xy", json.dumps({"x": 0.3, "y": -0.5}).encode())
    z = json.loads(r.read())["zsem"]
    assert len(z) == cfg.zt_channels
    r2 = _post(base + "/api/xy", json.dumps({"x": -0.8, "y": 0.8}).encode())
    z2 = json.loads(r2.read())["zsem"]
    assert not np.allclose(z, z2)  # the pad actually moves the timbre


def test_timbre_from_audio_returns_xy(server):
    base, cfg = server
    r = _post(base + "/api/timbre", _wav(cfg))
    xy = json.loads(r.read())["xy"]
    assert len(xy) == 2 and all(-1.0 <= v <= 1.0 for v in xy)


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
