"""Interleaved A/B: codec decode with vs without the fused Pallas kernel.

Batch-16 offline serving (the case where kernel-level wins can show up —
batch-1 is dispatch-bound through the relay, see CLAUDE.md).  Both variants
run in ONE process, alternating, because per-process numbers drift between
relay sessions.  Prints one JSON line with both medians.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import dataclasses

from after_tpu.config import AutoEncoderConfig
from after_tpu.models import AudioCodec
from after_tpu.ops import pallas as ops_pallas


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    B = int(os.environ.get("AB_BATCH", 16))
    T_lat = int(os.environ.get("AB_LATENT_T", 256))
    cfg = AutoEncoderConfig()           # base codec (baseAE.gin sizes)
    cfg_f = dataclasses.replace(cfg, fused_kernels=True)
    log(f"pallas enabled: {ops_pallas.enabled()} "
        f"(platform {jax.devices()[0].platform}, "
        f"kind {getattr(jax.devices()[0], 'device_kind', '?')})")

    codec = AudioCodec(cfg)
    codec_f = AudioCodec(cfg_f)
    z = jnp.asarray(np.random.RandomState(0)
                    .randn(B, T_lat, cfg.z_channels).astype(np.float32))

    log("init...")
    variables = jax.jit(codec.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, cfg.ratio * 8, 1)))

    dec = jax.jit(lambda v, z: codec.apply(v, z, method=AudioCodec.decode))
    dec_f = jax.jit(lambda v, z: codec_f.apply(v, z,
                                               method=AudioCodec.decode))
    log("compile baseline...")
    t0 = time.perf_counter()
    jax.block_until_ready(dec(variables, z))
    log(f"  {time.perf_counter() - t0:.0f}s")
    log("compile fused...")
    t0 = time.perf_counter()
    jax.block_until_ready(dec_f(variables, z))
    log(f"  {time.perf_counter() - t0:.0f}s")

    # numerical check on device
    ya = np.asarray(dec(variables, z))
    yb = np.asarray(dec_f(variables, z))
    mse = float(np.mean((ya - yb) ** 2))
    log(f"A/B decode MSE: {mse:.3e}")

    # honest timing (CLAUDE.md): the relay acks block_until_ready early and
    # dedupes identical pure calls — CHAIN the calls (decode output folded
    # back into the next input) and read back a scalar per round.
    rounds, iters = 6, 8
    # one distinct input per round: a repeated (z, chain) sequence is a
    # byte-identical request stream the relay could dedup
    zs = [jnp.asarray(np.random.RandomState(s)
                      .randn(B, T_lat, cfg.z_channels).astype(np.float32))
          for s in range(rounds)]
    t_base, t_fused = [], []
    for r in range(rounds):
        for name, fn, acc in (("base", dec, t_base),
                              ("fused", dec_f, t_fused)):
            zi = zs[r]
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn(variables, zi)
                # fold the output back in: forces serial device execution
                zi = zi + 1e-12 * y[:, :T_lat, :1]
            _ = float(jax.device_get(y[0, -1, 0]))
            acc.append((time.perf_counter() - t0) / iters)
        log(f"round {r}: base {t_base[-1]*1e3:.2f} ms, "
            f"fused {t_fused[-1]*1e3:.2f} ms")

    mb, mf = float(np.median(t_base)), float(np.median(t_fused))
    samples = B * T_lat * cfg.ratio
    print(json.dumps({
        "metric": "codec_decode_batch16_ab",
        "base_ms": round(mb * 1e3, 3), "fused_ms": round(mf * 1e3, 3),
        "speedup": round(mb / mf, 4), "decode_mse": mse,
        "realtime_x_base": round(samples / cfg.sr / mb, 1),
        "realtime_x_fused": round(samples / cfg.sr / mf, 1),
    }))


if __name__ == "__main__":
    main()
