"""`after-tpu` command line — mirrors the reference `after` CLI surface
(/root/reference/after_scripts/main_cli.py:5-8):

    after-tpu prepare_dataset   corpus -> record store with latents
    after-tpu update_dataset    re-encode latents for an existing store
    after-tpu train_autoencoder codec GAN training
    after-tpu export_autoencoder codec streaming export
    after-tpu train             diffusion training
    after-tpu export            a2a streaming export
    after-tpu export_midi       midi-to-audio streaming export

plus three surfaces beyond the reference CLI: `import_torch` (port reference
PyTorch checkpoints), `import_dataset` (convert reference LMDB datasets to
the record store, no liblmdb needed), and `serve` (local web XY-pad UI, the
equivalent of the reference's Max4Live device layer, after.m4l/afterv2.js).
"""

from __future__ import annotations

import sys

AVAILABLE = ["prepare_dataset", "update_dataset", "train_autoencoder",
             "export_autoencoder", "train", "export", "export_midi",
             "import_torch", "import_dataset", "serve"]


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in AVAILABLE:
        print("usage: after-tpu {" + ",".join(AVAILABLE) + "} [args...]")
        return 1
    # AFTER_PLATFORM=cpu routes a subcommand off the accelerator (e.g.
    # dataset preparation on a host that must not claim the TPU session);
    # set before any backend initializes — plain JAX_PLATFORMS env can be
    # overridden by site-level platform pins, jax.config wins
    import os
    plat = os.environ.get("AFTER_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    cmd, rest = argv[0], argv[1:]
    if cmd == "prepare_dataset":
        from . import prepare_dataset
        return prepare_dataset.main(rest)
    if cmd == "update_dataset":
        from . import prepare_dataset
        return prepare_dataset.update_main(rest)
    if cmd == "train":
        from . import train
        return train.main(rest)
    if cmd == "train_autoencoder":
        from . import train_autoencoder
        return train_autoencoder.main(rest)
    if cmd in ("export", "export_midi", "export_autoencoder"):
        from . import export
        return export.main(cmd, rest)
    if cmd == "import_torch":
        from . import import_torch
        return import_torch.main(rest)
    if cmd == "import_dataset":
        from . import import_dataset
        return import_dataset.main(rest)
    if cmd == "serve":
        from . import serve
        return serve.main(rest)
    return 1


if __name__ == "__main__":
    sys.exit(main())
