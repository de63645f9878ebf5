"""Production-artifact soak: a few hundred buffers through the scale run's
exported streaming artifact (VERDICT r4 weak #6 — stage 8's 8-buffer
playback is too thin to claim deployment readiness), plus one native-host
(native/stream_host) session over the SAME trained artifact so the C++
deployment path is verified against a genuinely trained model, not only
test-scale ones.

Python-host soak: N buffers of mixed program material (sine sweeps, tones,
noise bursts, silence) through `ExportedStreamer.forward`, asserting every
buffer finite, tracking output peak and per-buffer wall latency
(p50/p95/max, which through this sandbox's relay is dominated by the
synchronous readback RPC — see PARITY.md "Native host").

Native-host check: the first chunk-aligned slice of the same program is
rendered by the native host (file mode) and by the live Python streamer
with the host's per-chunk rng convention; outputs must match to 2e-4 and
be finite.

Writes WORK/artifact_soak.json and copies evidence into runs/scale/.

Usage: python scripts/artifact_soak.py [--work /tmp/after_scale]
       [--buffers 300] [--native_buffers 12] [--skip_native]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 44100


def find_artifact(dif_dir):
    art = None
    for d in sorted(os.listdir(dif_dir)):
        if d.startswith("after.audio"):
            art = os.path.join(dif_dir, d)
    assert art, f"no exported artifact under {dif_dir}"
    return art


def program(n_buffers, n, rng):
    """Mixed program material: per-buffer choice of tone / sweep / noise /
    silence, continuous phase across tone buffers."""
    import numpy as np
    total = n_buffers * n
    t = np.arange(total) / SR
    tone = 0.3 * np.sin(2 * np.pi * 220 * t)
    sweep = 0.3 * np.sin(2 * np.pi * (80 + 40 * t) * t)
    out = np.empty(total, np.float32)
    for b in range(n_buffers):
        sl = slice(b * n, (b + 1) * n)
        kind = b % 4
        if kind == 0:
            out[sl] = tone[sl]
        elif kind == 1:
            out[sl] = sweep[sl]
        elif kind == 2:
            out[sl] = 0.2 * rng.randn(n)
        else:
            out[sl] = 0.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--buffers", type=int, default=300)
    ap.add_argument("--native_buffers", type=int, default=12)
    ap.add_argument("--skip_native", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import numpy as np

    from after_tpu.streaming.export import ExportedStreamer
    from scale_run import copy_evidence

    work = args.work
    art = find_artifact(os.path.join(work, "runs", "scale_dif"))
    st = ExportedStreamer(art)
    n = st.manifest["audio_chunk"]
    rng = np.random.RandomState(0)
    x = program(args.buffers, n, rng)
    timbre_noise = 0.1 * rng.randn(args.buffers, n).astype(np.float32)

    lat, peak, t0 = [], 0.0, time.time()
    for i in range(args.buffers):
        tb = time.time()
        y = st.call("forward", x[i * n:(i + 1) * n][None, :, None],
                    timbre_noise[i][None, :, None],
                    jax.random.key_data(jax.random.PRNGKey(i)))
        y = np.asarray(y)   # host readback bounds the honest per-buffer cost
        assert np.isfinite(y).all(), f"non-finite audio at buffer {i}"
        lat.append(time.time() - tb)
        peak = max(peak, float(np.abs(y).max()))
    wall = time.time() - t0
    lat_ms = np.sort(np.asarray(lat) * 1e3)
    result = {
        "artifact": os.path.basename(art),
        "buffers": args.buffers,
        "buffer_seconds": n / SR,
        "audio_minutes": round(args.buffers * n / SR / 60, 2),
        "peak": peak,
        "all_finite": True,
        "latency_ms": {
            "p50": round(float(lat_ms[len(lat_ms) // 2]), 1),
            "p95": round(float(lat_ms[int(len(lat_ms) * 0.95)]), 1),
            "max": round(float(lat_ms[-1]), 1),
        },
        "wall_minutes": round(wall / 60, 2),
        "note": ("per-buffer latency through this sandbox's relay is "
                 "dominated by the synchronous readback RPC (PARITY.md); "
                 "a local PJRT host pays uploads + device compute only"),
    }
    print("[soak] python host:", json.dumps(result, indent=1), flush=True)

    if not args.skip_native:
        from _native_common import axon_env
        from after_tpu.dataset.audio import load_wav, save_wav

        host = os.path.join(REPO, "native", "stream_host")
        if not os.path.exists(host):
            subprocess.check_call(["make", "-C",
                                   os.path.join(REPO, "native")])
        nb = args.native_buffers
        s = x[:nb * n]
        t = (0.1 * np.random.RandomState(1).randn(nb * n)).astype(np.float32)
        save_wav("/tmp/soak_s.wav", s, SR)
        save_wav("/tmp/soak_t.wav", t, SR)
        r = subprocess.run([host, art, "/opt/axon/libaxon_pjrt.so",
                            "/tmp/soak_s.wav", "/tmp/soak_t.wav",
                            "/tmp/soak_out.wav"],
                           env=axon_env(), capture_output=True, text=True,
                           timeout=1800)
        print(r.stderr[-1500:], flush=True)
        assert r.returncode == 0, f"native host rc={r.returncode}"
        out, _ = load_wav("/tmp/soak_out.wav")

        # python reference: the live fused forward with the native host's
        # per-chunk rng convention (key data [chunk+1, 42]) over the same
        # int16-quantized inputs
        s, _ = load_wav("/tmp/soak_s.wav")
        t, _ = load_wav("/tmp/soak_t.wav")
        st.reset(art)
        ref = []
        import jax.numpy as jnp
        for c in range(nb):
            sl = slice(c * n, (c + 1) * n)
            key = jax.random.wrap_key_data(
                jnp.asarray([c + 1, 42], jnp.uint32))
            y = st.call("forward", s[sl][None, :, None].astype(np.float32),
                        t[sl][None, :, None].astype(np.float32),
                        jax.random.key_data(key))
            ref.append(np.asarray(y).ravel())
        ref = np.concatenate(ref)
        m = min(len(out), len(ref))
        err = float(np.abs(out[:m] - ref[:m]).max())
        result["native"] = {
            "buffers": nb, "maxdiff_vs_python": err,
            "finite": bool(np.isfinite(out).all()),
            "pass": bool(err < 2e-4 and np.isfinite(out).all()),
        }
        print(f"[soak] native host over the trained artifact: "
              f"maxdiff {err:.2e} over {m} samples "
              f"({'PASS' if result['native']['pass'] else 'FAIL'})",
              flush=True)

    with open(os.path.join(work, "artifact_soak.json"), "w") as f:
        json.dump(result, f, indent=1)
    copy_evidence(work)
    ok = result["all_finite"] and result.get("native", {}).get("pass", True)
    print("SOAK:", "OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
