"""after_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the AFTER framework.

AFTER (Audio Features Transfer and Exploration in Real-time) is a latent
rectified-flow diffusion model for real-time timbre transfer, operating in the
latent space of a streamable multiband neural audio codec.

This package is a ground-up TPU-first re-design (reference:
acids-ircam/AFTER, /root/reference):

- all compute paths are pure-functional JAX, jitted once per entry point;
- streaming state (cached convs, per-diffusion-step KV caches, ring buffers)
  is carried as explicit pytrees through ``step(state, x) -> (state, y)``;
- the k-step Euler sampler is fused with ``lax.scan``;
- attention masks are static host-precomputed constants;
- data parallelism / tensor parallelism ride a ``jax.sharding.Mesh``.

Layout:
    after_tpu.ops         low-level ops (convs, PQMF, STFT, masks, rotary, snake)
    after_tpu.models      network definitions (codec, denoiser, encoders, discriminator)
    after_tpu.diffusion   rectified-flow model, sampler, trainer
    after_tpu.autoencoder codec losses + GAN trainer
    after_tpu.dataset     record store, datasets, parsers, transforms
    after_tpu.parallel    mesh/sharding utilities
    after_tpu.streaming   streaming state + export
    after_tpu.cli         `after-tpu` command line
"""

__version__ = "0.1.0"
