"""Device-resident latent bank: the TPU-native data path for diffusion
training.

The host pipeline (DataLoader + make_collate_fn, matching the reference's
diffusion/utils.py:45-108 semantics) re-uploads ~3 latent crops x batch_size
to the device EVERY step.  At base sizes that is ~4-6 MB/step of host->device
traffic, which dominates wall time whenever the link is slower than the
~20 ms compute (measured in this sandbox: 2.3 steps/s host-fed vs ~50
steps/s device-fed — the PJRT relay moves ~15 MB/s).

When the latent store fits in HBM (it usually does: latents are 2048x
smaller than audio — ~40 MB/hour at base config), upload it ONCE and draw
every batch in-graph:

- records are stacked into one (1 + n_aug, N, T_max, C) bank (slot 0 = "z",
  slots 1.. = pitch/stretch augment copies, ragged lengths padded, invalid/
  short augments marked by length 0 and falling back to z like the host
  collate does);
- each training step draws record indices (weighted, matching
  CombinedDataset.example_weights), crop offsets, and augment choices with
  jax.random inside ONE jitted sampler call, and hands the train step
  device arrays — zero per-step host traffic, two tiny async dispatches.

Semantics mirror make_collate_fn's audio path exactly (same index
distributions; rng streams differ — numpy vs threefry).  MIDI structure
(piano rolls from pickled MidiFile blobs) stays on the host pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class DeviceLatentBank:
    """Latent store resident on device with an in-graph batch sampler.

    Parameters
    ----------
    dataset: indexable of items holding "z" (C, T) plus optional augment
        buffers (CombinedDataset / SimpleDataset).
    n_signal: crop length in latent frames.
    aug_keys: timbre-augmentation buffer names (collate's
        timbre_augmentation_keys).
    weights: per-example sampling weights (CombinedDataset.example_weights);
        None = uniform.
    timbre_limit: window factor for the no-augment timbre crop (collate's
        timbre_limit).
    bank_dtype: storage dtype on device; latents are ~unit-scale so
        jnp.bfloat16 halves HBM at ~1e-2 relative quantisation — keep f32
        unless HBM-bound.
    device: target device for jax.device_put (None = default).
    """

    def __init__(self, dataset, n_signal: int,
                 aug_keys: Sequence[str] = (),
                 weights: Optional[np.ndarray] = None,
                 timbre_limit: Optional[float] = None,
                 bank_dtype=jnp.float32,
                 device=None):
        self.n_signal = int(n_signal)
        self.aug_keys = tuple(aug_keys)
        self.timbre_limit = timbre_limit
        n = len(dataset)
        assert n > 0, "empty dataset"

        # ---- host assembly (one pass over the store) --------------------
        slots = 1 + len(self.aug_keys)
        zs, augs = [], [[] for _ in self.aug_keys]
        for i in range(n):
            item = dataset[i]
            z = np.asarray(item["z"], np.float32)
            assert z.ndim == 2, "bank expects (C, T) latent records"
            zs.append(z)
            for k, key in enumerate(self.aug_keys):
                a = item.get(key)
                augs[k].append(None if a is None
                               else np.asarray(a, np.float32))

        c = zs[0].shape[0]
        t_max = max(z.shape[1] for z in zs)
        for rows in augs:
            t_max = max([t_max] + [a.shape[1] for a in rows if a is not None])

        bank = np.zeros((slots, n, t_max, c), np.float32)
        lens = np.zeros((slots, n), np.int32)
        for i, z in enumerate(zs):
            bank[0, i, :z.shape[1]] = z.T
            lens[0, i] = z.shape[1]
        for k, rows in enumerate(augs):
            for i, a in enumerate(rows):
                # the host collate falls back to z when the augment is
                # missing or shorter than n_signal + 1 (collate.py:68-69);
                # length 0 marks that here
                if a is None or a.shape[1] < self.n_signal + 1:
                    continue
                bank[k + 1, i, :a.shape[1]] = a.T
                lens[k + 1, i] = a.shape[1]

        if weights is None:
            w = np.full(n, 1.0 / n)
        else:
            w = np.asarray(weights, np.float64)
            w = w / w.sum()

        self.n_records = n
        self.channels = c
        self.nbytes = bank.nbytes if bank_dtype == jnp.float32 \
            else bank.size * jnp.dtype(bank_dtype).itemsize
        put = partial(jax.device_put, device=device)
        self._bank = put(bank.astype(bank_dtype))
        self._lens = put(lens)
        self._weights = put(w.astype(np.float32))
        del bank

    # ---- in-graph sampling ----------------------------------------------

    def _uniform_start(self, key, length):
        """randint(0, max(length - n_signal, 1)) per row, traced."""
        maxn = jnp.maximum(length - self.n_signal, 1)
        u = jax.random.uniform(key, length.shape)
        return jnp.minimum((u * maxn).astype(jnp.int32), maxn - 1)

    def _crop(self, rows, starts):
        """rows (B, T_max, C), starts (B,) -> (B, n_signal, C)."""
        return jax.vmap(
            lambda r, s: jax.lax.dynamic_slice(
                r, (s, 0), (self.n_signal, r.shape[-1])))(rows, starts)

    @partial(jax.jit, static_argnums=(0, 2))
    def sample(self, key, batch_size: int) -> Dict[str, jnp.ndarray]:
        """One training batch {x, x_cond, x_time_cond} of (B, n_signal, C),
        distributions matching make_collate_fn's audio path."""
        k_idx, k0, k1, k_aug = jax.random.split(key, 4)
        idx = jax.random.choice(k_idx, self.n_records, (batch_size,),
                                p=self._weights)
        z_rows = self._bank[0, idx]
        z_len = self._lens[0, idx]
        i0 = self._uniform_start(k0, z_len)
        x = self._crop(z_rows, i0).astype(jnp.float32)

        if self.aug_keys:
            which = jax.random.randint(k_aug, (batch_size,), 1,
                                       1 + len(self.aug_keys))
            a_len = self._lens[which, idx]
            valid = a_len >= self.n_signal + 1
            src = jnp.where(valid, which, 0)
            rows = self._bank[src, idx]
            length = jnp.where(valid, a_len, z_len)
            i1 = self._uniform_start(k1, length)
            x_cond = self._crop(rows, i1).astype(jnp.float32)
        else:
            if self.timbre_limit is None:
                i1 = self._uniform_start(k1, z_len)
            else:
                nmax = int(self.n_signal * self.timbre_limit)
                d = jax.random.randint(k1, (batch_size,), -nmax, nmax)
                i1 = jnp.clip(i0 + d, 0,
                              jnp.maximum(z_len - self.n_signal, 0))
            x_cond = self._crop(z_rows, i1).astype(jnp.float32)

        # audio models condition structure on x itself (collate.py:106);
        # same array object -> no extra memory or traffic
        return {"x": x, "x_cond": x_cond, "x_time_cond": x}

    def batches(self, batch_size: int, seed: int = 0
                ) -> Iterator[Dict[str, jnp.ndarray]]:
        """Infinite iterator of device-resident batches (feeds Trainer.fit
        directly: its jnp.asarray conversion is a no-op on device arrays)."""
        key = jax.random.PRNGKey(seed)
        while True:
            key, k = jax.random.split(key)
            yield self.sample(k, batch_size)
