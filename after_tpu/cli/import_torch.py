"""`after-tpu import_torch`: convert reference PyTorch checkpoints into
after_tpu checkpoint directories.

Makes the numeric-parity path user-facing: a reference-trained codec
(`checkpoint<step>.pt`) or diffusion model (`checkpoint<step>_EMA.pt`)
becomes a drop-in after_tpu checkpoint (utils/checkpoint.py layout) usable by
the inference pipeline, exports, and the native host.

Architecture geometry is derived from the run's own `config.gin` (the
reference re-parses it the same way before export,
/root/reference/after_scripts/export.py:69-77); the flags below override
individual derived values.  The derived after_tpu config is written as
`config.json` next to the imported checkpoint so the export CLIs can read
it (non-causal codecs then auto-route to the crossfade export).
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu import_torch")
    p.add_argument("--checkpoint", required=True, help="reference .pt file")
    p.add_argument("--type", choices=["codec", "diffusion"], required=True)
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--config", default=None,
                   help="reference config.gin (default: the config.gin "
                        "next to --checkpoint, the reference run layout)")
    p.add_argument("--n_stages", type=int, default=None,
                   help="codec: number of down/up stages (default: "
                        "len(factors) from config.gin, else 5)")
    p.add_argument("--num_blocks", type=int, default=None,
                   help="codec: resnet blocks per stage (default: "
                        "len(dilations) from config.gin, else 3)")
    p.add_argument("--use_norm", type=lambda s: bool(int(s)), default=None,
                   help="codec: 1 if the reference model used GroupNorm "
                        "(default from config.gin, else 1)")
    p.add_argument("--n_layers", type=int, default=None,
                   help="diffusion: denoiser layers (default from "
                        "config.gin, else 6)")
    p.add_argument("--n_ecapa_blocks", type=int, default=None)
    p.add_argument("--res2net_scale", type=int, default=None)
    return p


def count_encoder1d_blocks(sd, prefix: str) -> int:
    """Number of V2EncoderBlock1D stages under `prefix` (the final index is
    the out V2ConvBlock1D), auto-detected from the state-dict keys."""
    import re
    pat = re.compile(re.escape(prefix) + r"net\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
    return max(idx) if idx else 0


def main(argv=None) -> int:
    from ..config import ae_to_json, to_json
    from ..utils.checkpoint import save_checkpoint
    from ..utils.gin_import import (codec_config_from_gin,
                                    diffusion_config_from_gin,
                                    find_gin_config)
    from ..utils.port_torch import (load_reference_checkpoint, map_codec,
                                    map_denoiser_v2, map_ecapa,
                                    map_encoder1d)

    args = build_argparser().parse_args(argv)
    sd = load_reference_checkpoint(args.checkpoint)

    gin_path = args.config or find_gin_config(args.checkpoint)
    if gin_path:
        print(f"[import_torch] deriving architecture from {gin_path}")

    def pick(flag, derived, fallback):
        return flag if flag is not None else (
            derived if derived is not None else fallback)

    config_json = None
    if args.type == "codec":
        ae_cfg = codec_config_from_gin(gin_path) if gin_path else None
        n_stages = pick(args.n_stages,
                        len(ae_cfg.factors) if ae_cfg else None, 5)
        # the reference hardcodes 3 resnet blocks per stage
        # (SimpleNetsStream.py:861 num_blocks = [3]*len(factors))
        num_blocks = pick(args.num_blocks,
                          ae_cfg.num_blocks_per_stage if ae_cfg else None, 3)
        use_norm = pick(args.use_norm,
                        ae_cfg.use_norm if ae_cfg else None, True)
        params = map_codec(sd, n_stages=n_stages, num_blocks=num_blocks,
                           use_norm=use_norm)
        tree = {"codec_vars": {"params": params}, "step": 0}
        if ae_cfg is not None:
            config_json = ae_to_json(ae_cfg)
        print(f"[import_torch] codec: stages={n_stages} "
              f"blocks={num_blocks} use_norm={use_norm}"
              + ("" if ae_cfg is None else
                 f" causal={ae_cfg.causal} z={ae_cfg.z_channels}"))
    else:
        cfg = diffusion_config_from_gin(gin_path) if gin_path else None
        n_layers = pick(args.n_layers,
                        cfg.denoiser.n_layers if cfg else None, 6)
        n_ecapa = pick(args.n_ecapa_blocks,
                       len(cfg.encoder.channels) if cfg else None, 4)
        res2net = pick(args.res2net_scale,
                       cfg.encoder.res2net_scale if cfg else None, 8)
        # full diffusion checkpoint: net + encoder + encoder_time +
        # classifier (reference composition, train.py:88-95)
        variables = {"net": {"params": map_denoiser_v2(sd, n_layers)}}
        variables["encoder"] = map_ecapa(sd, n_ecapa, res2net)
        for name in ("encoder_time", "classifier"):
            prefix = name + "."
            if any(k.startswith(prefix) for k in sd):
                n = count_encoder1d_blocks(sd, prefix)
                variables[name] = map_encoder1d(sd, n, prefix=prefix)
                print(f"[import_torch] ported {name} ({n} blocks)")
        tree = {"variables": variables,
                "ema_params": variables["net"]["params"], "step": 0}
        if cfg is not None:
            config_json = to_json(cfg)
        print(f"[import_torch] diffusion: n_layers={n_layers} "
              f"ecapa_blocks={n_ecapa} res2net={res2net}")

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(args.out, 0, tree, config_json=config_json)
    print(f"[import_torch] wrote {args.out}/checkpoint_0"
          + (" + config.json" if config_json else ""))
    return 0
