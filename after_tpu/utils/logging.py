"""Training metrics/observability.

Reference: TensorBoard SummaryWriter scalars + audio artifacts
(/root/reference/after/diffusion/model.py:255,447-456,543-561).  Here:

- `MetricsLogger`: windowed-average scalars to TensorBoard (via torch's
  SummaryWriter when available) plus an always-on JSONL stream
  (`model_dir/metrics.jsonl`) so runs are inspectable without TB;
- audio artifacts are written as WAV files under `model_dir/audio/`
  (and to TB when available);
- per-step wall-clock timing is recorded (`steps_per_sec`), a first-class
  feature the reference lacks (SURVEY §5.1).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict

import numpy as np


class MetricsLogger:

    def __init__(self, model_dir: str, flush_every: int = 100,
                 use_tensorboard: bool = True):
        os.makedirs(model_dir, exist_ok=True)
        self.model_dir = model_dir
        self.flush_every = flush_every
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)
        self._pending: Dict[str, list] = {}
        self._jsonl = open(os.path.join(model_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=os.path.join(model_dir,
                                                              "logs"))
            except Exception:
                self._tb = None
        self._t_last = time.perf_counter()
        self._steps_since = 0
        self._stackers: Dict[int, object] = {}

    def log(self, step: int, metrics: Dict[str, float],
            n_steps: int = 1) -> None:
        # values may be device arrays; keep them lazy — only flush() forces
        # the host sync, so training dispatch stays async between flushes
        # n_steps > 1: the metrics summarize a trainer steps_per_call window
        # (steps_per_sec accounting stays correct)
        for k, v in metrics.items():
            self._pending.setdefault(k, []).append(v)
        self._steps_since += n_steps
        if step % self.flush_every == 0 and step > 0:
            self.flush(step)

    def _fetch_pending(self) -> None:
        """One batched device->host sync for the whole window.

        float(v) per scalar costs a full round trip each; a 100-step window
        of ~9 metrics is ~900 sequential syncs — measured ~200 ms/step
        amortized through a remote PJRT relay.  Stack the window's device
        scalars into ONE array (jitted; window sizes repeat, so this
        compiles once) and read it back in a single transfer."""
        import jax
        import jax.numpy as jnp
        flat = [(k, v) for k, vals in self._pending.items() for v in vals]
        dev = [(i, v) for i, (_, v) in enumerate(flat)
               if isinstance(v, jax.Array)]
        if dev:
            fn = self._stackers.get(len(dev))
            if fn is None:
                fn = jax.jit(
                    lambda vs: jnp.stack(
                        [jnp.asarray(v, jnp.float32).reshape(())
                         for v in vs]))
                self._stackers[len(dev)] = fn
            fetched = np.asarray(fn([v for _, v in dev]))
            for (i, _), f in zip(dev, fetched):
                flat[i] = (flat[i][0], float(f))
        for k, v in flat:
            self._sums[k] += float(v)
            self._counts[k] += 1
        self._pending.clear()

    def flush(self, step: int) -> None:
        now = time.perf_counter()
        self._fetch_pending()
        avg = {k: self._sums[k] / max(self._counts[k], 1)
               for k in self._sums}
        avg["steps_per_sec"] = self._steps_since / max(now - self._t_last,
                                                       1e-9)
        self._jsonl.write(json.dumps({"step": step, **avg}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in avg.items():
                self._tb.add_scalar(f"Loss/{k}", v, global_step=step)
        self._sums.clear()
        self._counts.clear()
        self._t_last = now
        self._steps_since = 0

    def log_audio(self, step: int, name: str, audio: np.ndarray,
                  sr: int) -> None:
        from ..dataset.audio import save_wav
        audio = np.asarray(audio).reshape(-1)
        adir = os.path.join(self.model_dir, "audio")
        os.makedirs(adir, exist_ok=True)
        save_wav(os.path.join(adir, f"{name.replace('/', '_')}_{step}.wav"),
                 audio, sr)
        if self._tb is not None:
            self._tb.add_audio(name, audio[None], global_step=step,
                               sample_rate=sr)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def profile_trace(log_dir: str):
    """Context manager capturing a jax.profiler trace (xplane) for TensorBoard
    — per-step profiling as a first-class feature."""
    import jax
    return jax.profiler.trace(log_dir)
