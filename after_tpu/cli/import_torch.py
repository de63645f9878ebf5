"""`after-tpu import_torch`: convert reference PyTorch checkpoints into
after_tpu checkpoint directories.

Makes the numeric-parity path user-facing: a reference-trained codec
(`checkpoint<step>.pt`) or diffusion model (`checkpoint<step>_EMA.pt`)
becomes a drop-in after_tpu checkpoint (utils/checkpoint.py layout) usable by
the inference pipeline, exports, and the native host.
"""

from __future__ import annotations

import argparse
import os


def build_argparser():
    p = argparse.ArgumentParser(prog="after-tpu import_torch")
    p.add_argument("--checkpoint", required=True, help="reference .pt file")
    p.add_argument("--type", choices=["codec", "diffusion"], required=True)
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--n_stages", type=int, default=5,
                   help="codec: number of down/up stages (len(factors))")
    p.add_argument("--num_blocks", type=int, default=3)
    p.add_argument("--use_norm", type=lambda s: bool(int(s)), default=True,
                   help="codec: 1 if the reference model used GroupNorm "
                        "(default), 0 for norm-free streaming codecs")
    p.add_argument("--n_layers", type=int, default=6,
                   help="diffusion: denoiser layers")
    p.add_argument("--n_ecapa_blocks", type=int, default=4)
    p.add_argument("--res2net_scale", type=int, default=8)
    return p


def count_encoder1d_blocks(sd, prefix: str) -> int:
    """Number of V2EncoderBlock1D stages under `prefix` (the final index is
    the out V2ConvBlock1D), auto-detected from the state-dict keys."""
    import re
    pat = re.compile(re.escape(prefix) + r"net\.(\d+)\.")
    idx = {int(m.group(1)) for k in sd for m in [pat.match(k)] if m}
    return max(idx) if idx else 0


def main(argv=None) -> int:
    from ..utils.checkpoint import save_checkpoint
    from ..utils.port_torch import (load_reference_checkpoint, map_codec,
                                    map_denoiser_v2, map_ecapa,
                                    map_encoder1d)

    args = build_argparser().parse_args(argv)
    sd = load_reference_checkpoint(args.checkpoint)

    if args.type == "codec":
        params = map_codec(sd, n_stages=args.n_stages,
                           num_blocks=args.num_blocks,
                           use_norm=args.use_norm)
        tree = {"codec_vars": {"params": params}, "step": 0}
    else:
        # full diffusion checkpoint: net + encoder + encoder_time +
        # classifier (reference composition, train.py:88-95)
        variables = {"net": {"params": map_denoiser_v2(sd, args.n_layers)}}
        variables["encoder"] = map_ecapa(sd, args.n_ecapa_blocks,
                                         args.res2net_scale)
        for name in ("encoder_time", "classifier"):
            prefix = name + "."
            if any(k.startswith(prefix) for k in sd):
                n = count_encoder1d_blocks(sd, prefix)
                variables[name] = map_encoder1d(sd, n, prefix=prefix)
                print(f"[import_torch] ported {name} ({n} blocks)")
        tree = {"variables": variables,
                "ema_params": variables["net"]["params"], "step": 0}

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(args.out, 0, tree)
    print(f"[import_torch] wrote {args.out}/checkpoint_0")
    return 0
