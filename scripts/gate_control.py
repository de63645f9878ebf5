"""Ground-truth control for the timbre-transfer gate metric (VERDICT r4).

The G5 gate (scripts/scale_gates.py) judges a transfer by whether the
output's timbre embedding (the trained model's own ECAPA over codec
latents) lands closer to the target instrument than the source.  Round 4's
trained model failed it twice; before trusting a retrain, the METRIC itself
needs a control that separates "the gate is wrong" from "the training is
wrong".  No reference pretrained checkpoints exist in /root/reference (only
basic-pitch weights), so the known-good transfer is SYNTHESIZED exactly:
the corpus generator decouples melody from timbre (scale_run.synth_tone's
`melody` argument), so "target instrument playing the source melody" — the
ideal transfer output — can be rendered directly.

Controls, over the same ordered cross-kind pairs as G5:
  positive   output = ground-truth transfer (source melody, target timbre)
             -> the metric must PASS (majority of pairs, positive margin)
  negative   output = the source audio itself (a transfer that did nothing)
             -> the metric must FAIL (majority of pairs, negative margin)

If both controls behave, a model failure on the same metric is a training
defect, full stop.  Results land in WORK/gate_control.json and are copied
into runs/scale/ with the rest of the evidence.

Usage: python scripts/gate_control.py [--work /tmp/after_scale]
       [--platform cpu]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 44100


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) so the control "
                         "can run while the TPU session is busy")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax.numpy as jnp
    import numpy as np

    from after_tpu.config import from_json, load_codec_config, with_overrides
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.utils.checkpoint import restore_checkpoint
    from scale_run import copy_evidence, draw_melody, synth_tone

    work = args.work
    codec_dir = os.path.join(work, "runs", "scale_codec")
    dif_dir = os.path.join(work, "runs", "scale_dif")
    with open(os.path.join(dif_dir, "config.json")) as f:
        cfg = from_json(f.read())
    cfg = with_overrides(cfg, {"autoencoder": load_codec_config(codec_dir)})
    diff_vars = dict(restore_checkpoint(dif_dir)["variables"])
    codec_vars = restore_checkpoint(codec_dir)["codec_vars"]
    variables = {"codec": codec_vars, "diffusion": diff_vars}
    pipe = TransferPipeline(cfg)

    # per-instrument seeds: the same seed renders the same timbre
    # parameters whatever melody it is handed (synth_tone consumes the
    # melody draws either way)
    n = 4 * cfg.autoencoder.ratio * 32
    REG = 2.0

    def seed(k, r):
        return 20000 + 10 * k + r

    def render(k, r, melody=None):
        return synth_tone(k, np.random.RandomState(seed(k, r)), n,
                          register=REG, melody=melody)

    audio = {(k, r): render(k, r) for k in range(4) for r in range(2)}
    melody = {(k, r): draw_melody(np.random.RandomState(seed(k, r)), REG)
              for k in range(4) for r in range(2)}

    def timbre_of(a):
        z = pipe.encode(variables, jnp.asarray(a)[None, :, None])
        return np.asarray(pipe.timbre(variables, z))[0]

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    embs = {key: timbre_of(a) for key, a in audio.items()}

    def panel(output_of):
        pairs, margins = [], []
        for ks in range(4):
            for kt in range(4):
                if ks == kt:
                    continue
                e = timbre_of(output_of(ks, kt))
                c_tgt = cos(e, embs[(kt, 1)])
                c_src = cos(e, embs[(ks, 0)])
                margins.append(c_tgt - c_src)
                pairs.append({"src_kind": ks, "tgt_kind": kt,
                              "cos_to_target": round(c_tgt, 4),
                              "cos_to_source": round(c_src, 4),
                              "pass": bool(c_tgt > c_src)})
        n_pass = sum(p["pass"] for p in pairs)
        return {"pairs": pairs, "n_pass": n_pass, "n_pairs": len(pairs),
                "mean_margin": float(np.mean(margins))}

    # positive control: the ideal transfer output, synthesized exactly —
    # target instrument (kt, 1) playing source (ks, 0)'s melody
    pos = panel(lambda ks, kt: render(kt, 1, melody=melody[(ks, 0)]))
    pos["expect"] = "pass"
    pos["ok"] = bool(pos["n_pass"] > pos["n_pairs"] // 2
                     and pos["mean_margin"] > 0)
    # negative control: a transfer that did nothing (output = source)
    neg = panel(lambda ks, kt: audio[(ks, 0)])
    neg["expect"] = "fail"
    neg["ok"] = bool(neg["n_pass"] < neg["n_pairs"] // 2
                     and neg["mean_margin"] < 0)

    result = {"positive_control": pos, "negative_control": neg,
              "metric_valid": bool(pos["ok"] and neg["ok"])}
    out = os.path.join(work, "gate_control.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    copy_evidence(work)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "pairs"}
                      if isinstance(v, dict) else v
                      for k, v in result.items()}, indent=1))
    print("CONTROL:", "METRIC VALID" if result["metric_valid"]
          else "METRIC INVALID")
    return 0 if result["metric_valid"] else 1


if __name__ == "__main__":
    sys.exit(main())
