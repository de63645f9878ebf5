"""2-D timbre-latent map projector for XY-pad control surfaces.

Reference: /root/reference/after/diffusion/latent_plot.py (SmallAutoencoder
:20, train_autoencoder :48, prepare_training :109, generate_plot :139): a
tiny MLP autoencoder projects z_timbre to 2-D for the Max4Live XY pad, plus a
blurred density image of the embedding cloud.

JAX/optax implementation; the density map is rendered with
numpy histogram + gaussian blur and written as a PNG (no matplotlib needed).
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from scipy.ndimage import gaussian_filter


class SmallAutoencoder(nn.Module):
    """z_timbre (B, D) <-> 2-D map (latent_plot.py:20-45)."""

    in_dim: int = 6
    hidden: int = 64

    def setup(self):
        self.enc1 = nn.Dense(self.hidden)
        self.enc2 = nn.Dense(self.hidden)
        self.enc3 = nn.Dense(2)
        self.dec1 = nn.Dense(self.hidden)
        self.dec2 = nn.Dense(self.hidden)
        self.dec3 = nn.Dense(self.in_dim)

    def encode(self, x):
        h = nn.relu(self.enc1(x))
        h = nn.relu(self.enc2(h))
        return jnp.tanh(self.enc3(h))

    def decode(self, m):
        h = nn.relu(self.dec1(m))
        h = nn.relu(self.dec2(h))
        return self.dec3(h)

    def __call__(self, x):
        return self.decode(self.encode(x))


def train_projector(embeddings: np.ndarray, num_steps: int = 20000,
                    batch_size: int = 64, lr: float = 1e-3,
                    seed: int = 0) -> Tuple[SmallAutoencoder, dict]:
    """Train the 2-D projector on (N, D) timbre embeddings
    (latent_plot.py:48-106)."""
    emb = jnp.asarray(embeddings, jnp.float32)
    model = SmallAutoencoder(in_dim=emb.shape[-1])
    params = model.init(jax.random.PRNGKey(seed), emb[:2])
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            rec = model.apply(p, batch)
            return jnp.mean(jnp.square(rec - batch))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    for i in range(num_steps):
        idx = rng.randint(0, emb.shape[0], batch_size)
        params, opt_state, loss = step(params, opt_state, emb[idx])
    return model, params


def store_timbre_embeddings(cfg, variables, store: str, n_samples: int = 512,
                            batch_size: int = 16) -> np.ndarray:
    """(N, zt) timbre embeddings from a dataset store's precomputed latents.

    The reference computes these at export time to train the XY-pad
    projector (/root/reference/after_scripts/export.py:109-127); shared here
    by `after-tpu export --db_path` and `after-tpu serve --store`."""
    from ..dataset import SimpleDataset
    from ..diffusion import TransferPipeline

    ds = SimpleDataset(store, keys=("z",))
    if len(ds) == 0:
        raise SystemExit(f"dataset store {store} is empty; cannot train "
                         "the timbre map")
    n = min(n_samples, len(ds))
    pipe = TransferPipeline(cfg)
    embs, batch, shape0 = [], [], None
    for i in np.linspace(0, len(ds) - 1, n).astype(int):
        # records store latents as (C, T) (reference layout); the
        # pipeline runs (B, T, C)
        z = np.asarray(ds[int(i)]["z"], np.float32).T
        if shape0 is None:
            shape0 = z.shape
        elif z.shape != shape0:
            raise SystemExit(
                f"store records have differing latent shapes "
                f"({shape0} vs {z.shape} at record {int(i)}); the timbre "
                "map needs fixed-length records (re-run prepare_dataset)")
        batch.append(z)
        if len(batch) == batch_size:
            embs.append(np.asarray(pipe.timbre(
                variables, jnp.asarray(np.stack(batch)))))
            batch = []
    if batch:
        embs.append(np.asarray(pipe.timbre(
            variables, jnp.asarray(np.stack(batch)))))
    return np.concatenate(embs, axis=0)


def save_projector(out_dir: str, params, embeddings: np.ndarray) -> None:
    """Persist a trained projector + density PNG into an export artifact:
    `projector.msgpack` (flax param bytes) and `map.png` (the XY-pad
    background, reference export.py:520-529 writes `<model>.png`)."""
    import os

    from flax import serialization

    with open(os.path.join(out_dir, "projector.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))
    model = SmallAutoencoder(in_dim=int(np.shape(embeddings)[-1]))
    emb2d = np.asarray(model.apply(params, jnp.asarray(embeddings),
                                   method=SmallAutoencoder.encode))
    generate_map_png(emb2d, os.path.join(out_dir, "map.png"))


def load_projector(art_dir: str, in_dim: int):
    """Projector params from an artifact dir, or None when absent."""
    import os

    from flax import serialization

    path = os.path.join(art_dir, "projector.msgpack")
    if not os.path.exists(path):
        return None
    template = SmallAutoencoder(in_dim=in_dim).init(
        jax.random.PRNGKey(0), jnp.zeros((1, in_dim), jnp.float32))
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def png_bytes(rgb: np.ndarray) -> bytes:
    """Minimal PNG encoder for (H, W, 3) uint8."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF)

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))


def _write_png(path: str, rgb: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(png_bytes(rgb))


def generate_map_png(embeddings_2d: np.ndarray, path: str, bins: int = 500,
                     sigma: float = 12.0, gamma: float = 0.5) -> np.ndarray:
    """Blurred density image of the 2-D embedding cloud
    (latent_plot.py:139-303)."""
    hist, _, _ = np.histogram2d(
        embeddings_2d[:, 0], embeddings_2d[:, 1], bins=bins,
        range=[[-1, 1], [-1, 1]])
    img = gaussian_filter(hist.T[::-1], sigma=sigma)
    img = img / (img.max() + 1e-9)
    img = img ** gamma
    rgb = np.stack([20 + 200 * img, 30 + 160 * img, 60 + 120 * img],
                   axis=-1).clip(0, 255).astype(np.uint8)
    _write_png(path, rgb)
    return rgb
