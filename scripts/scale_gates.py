"""Objective quality gates for the scale run (VERDICT r4 ask #1).

Run AFTER scripts/scale_run.py completes; reads WORK/scale_run_summary.json
and the run dirs, executes the gates below, merges a "gates" section back
into the summary, and exits non-zero if any gate fails.  The role of the
reference's human-in-the-loop TensorBoard validation
(/root/reference/after/diffusion/model.py:458-561) made objective.

  G1 codec_recon      last held-out val_mrstft < threshold AND the
                      training mrstft dropped below 0.7x its start (the
                      codec learned; val wears a transient bump right
                      after the GAN engages, so the trend gate reads the
                      training curve)
  G2 gan_engaged      feature-matching loss present and nonzero after the
                      adversarial warmup
  G3 diffusion_learn  last val_diffusion_loss below the first
  G4 restart_resumed  diffusion metrics continue across the forced restart
                      step with no gap and no step repeats
  G5 timbre_transfer  controlled transfer panel: held-out instruments from
                      every synth family at ONE fixed register (corpus
                      files confound timbre with per-file octave shifts,
                      and a correct transfer preserves the source
                      register), all ordered cross-kind pairs; pass =
                      majority of pairs land closer (ECAPA cosine) to the
                      target instrument than the source AND the mean
                      margin is positive
  G6 playback_finite  stage-8 exported playback produced finite audio

Usage: python scripts/scale_gates.py [--work /tmp/after_scale]
       [--mrstft_threshold 4.0] [--nb_steps 20]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 44100


def load_pipeline(work, run_name="scale_dif", step=None):
    """Restore a diffusion run + the scale codec into a TransferPipeline,
    applying EMA params like the reference's export path does."""
    from after_tpu.config import from_json, load_codec_config, with_overrides
    from after_tpu.diffusion import TransferPipeline
    from after_tpu.utils.checkpoint import restore_checkpoint

    codec_dir = os.path.join(work, "runs", "scale_codec")
    run_dir = os.path.join(work, "runs", run_name)
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = from_json(f.read())
    cfg = with_overrides(cfg, {"autoencoder": load_codec_config(codec_dir)})
    restored = restore_checkpoint(run_dir, step)
    diff_vars = dict(restored["variables"])
    if "ema_params" in restored:
        diff_vars["net"] = {**diff_vars["net"],
                            "params": restored["ema_params"]}
    codec_vars = restore_checkpoint(codec_dir)["codec_vars"]
    variables = {"codec": codec_vars, "diffusion": diff_vars}
    return TransferPipeline(cfg), variables, cfg


def transfer_panel(pipe, variables, cfg, nb_steps, guidance_timbre,
                   wav_dir=None, rng_seed=0):
    """The G5 controlled transfer panel, reusable across harnesses
    (scale_gates G5, edm_compare): held-out instruments from every synth
    family at ONE fixed register (corpus files confound timbre with
    per-file octave shifts, and a correct transfer preserves the source
    register), all ordered cross-kind pairs; pass = majority of pairs land
    closer (ECAPA cosine) to the target instrument than the source AND the
    mean raw margin is positive."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_run import synth_tone

    n = 4 * cfg.autoencoder.ratio * 32  # 128 latent frames ~ 6 s
    panel_rng = np.random.RandomState(12345)
    insts = {(k, r): jnp.asarray(synth_tone(k, panel_rng, n, register=2.0)
                                 )[None, :, None]
             for k in range(4) for r in range(2)}

    def timbre_of(audio):
        z = pipe.encode(variables, audio)
        return np.asarray(pipe.timbre(variables, z))[0]

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    embs = {key: timbre_of(a) for key, a in insts.items()}
    pairs, margins, finite = [], [], True
    for ks in range(4):
        for kt in range(4):
            if ks == kt:
                continue
            src, tgt = insts[(ks, 0)], insts[(kt, 1)]
            out = pipe.transfer(variables, src, tgt, nb_steps,
                                guidance_timbre=guidance_timbre,
                                rng=jax.random.PRNGKey(rng_seed))
            e = timbre_of(jnp.asarray(np.asarray(out)))
            c_tgt, c_src = cos(e, embs[(kt, 1)]), cos(e, embs[(ks, 0)])
            finite &= bool(np.isfinite(np.asarray(out)).all())
            # raw margin for the gate decision; rounding is display-only
            # (ADVICE r4: a near-zero aggregate must not flip on rounding)
            margins.append(c_tgt - c_src)
            pairs.append({"src_kind": ks, "tgt_kind": kt,
                          "cos_to_target": round(c_tgt, 4),
                          "cos_to_source": round(c_src, 4),
                          "pass": bool(c_tgt > c_src)})
            if wav_dir and (ks, kt) == (2, 3):  # audible evidence, one pair
                from after_tpu.dataset.audio import save_wav
                for name, a in (("gate_source", src), ("gate_target", tgt),
                                ("gate_transfer", out)):
                    save_wav(os.path.join(wav_dir, f"{name}.wav"),
                             np.clip(np.asarray(a)[0, :, 0], -1, 1), SR)
    n_pass = sum(p["pass"] for p in pairs)
    return {
        "pairs": pairs, "n_pass": n_pass, "n_pairs": len(pairs),
        "mean_margin": float(np.mean(margins)),
        "guidance_timbre": guidance_timbre,
        "output_finite": finite,
        "pass": bool(finite and n_pass > len(pairs) // 2
                     and np.mean(margins) > 0)}


def metrics_rows(run_dir):
    rows = []
    path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    pass
    return rows


def series(rows, key):
    return [(r["step"], r[key]) for r in rows if key in r]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--run_name", default="scale_dif",
                    help="diffusion run dir under WORK/runs to gate")
    ap.add_argument("--mrstft_threshold", type=float, default=4.0)
    ap.add_argument("--nb_steps", type=int, default=20)
    ap.add_argument("--guidance_timbre", type=float, default=2.0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    work = args.work
    spath = os.path.join(work, "scale_run_summary.json")
    with open(spath) as f:
        summary = json.load(f)
    codec_dir = os.path.join(work, "runs", "scale_codec")
    dif_dir = os.path.join(work, "runs", args.run_name)
    gates = {}

    # ---- G1 / G2: codec metrics ---------------------------------------
    ae_rows = metrics_rows(codec_dir)
    mr = series(ae_rows, "mrstft")
    val_mr = series(ae_rows, "val_mrstft")
    last_val = val_mr[-1][1] if val_mr else float("inf")
    first_mr = mr[0][1] if mr else float("inf")
    last_mr = mr[-1][1] if mr else float("inf")
    gates["codec_recon"] = {
        "first_mrstft": first_mr, "last_mrstft": last_mr,
        "last_val_mrstft": last_val,
        "threshold": args.mrstft_threshold,
        "pass": bool(last_val < args.mrstft_threshold
                     and last_mr < 0.7 * first_mr)}
    fm = [v for s, v in series(ae_rows, "feature_matching") if v != 0.0]
    gates["gan_engaged"] = {"nonzero_feature_matching_rows": len(fm),
                            "last": fm[-1] if fm else None,
                            "pass": bool(fm)}

    # ---- G3 / G4: diffusion metrics -----------------------------------
    dif_rows = metrics_rows(dif_dir)
    val_dl = series(dif_rows, "val_diffusion_loss")
    gates["diffusion_learn"] = {
        "first": val_dl[0] if val_dl else None,
        "last": val_dl[-1] if val_dl else None,
        "pass": bool(val_dl and val_dl[-1][1] < val_dl[0][1])}
    steps = [r["step"] for r in dif_rows if "diffusion_loss" in r]
    restart_step = summary.get("restart_step")
    monotonic = all(b > a for a, b in zip(steps, steps[1:]))
    # the gate must be able to fail (VERDICT r4 weak #3): a scale run always
    # performs a forced restart (scale_run.py stage 6), so a summary without
    # restart_step, or metrics that don't span it, FAIL — no auto-pass
    spans = bool(steps) and restart_step is not None and \
        steps[0] < restart_step < steps[-1]
    gates["restart_resumed"] = {
        "monotonic_steps": monotonic, "restart_step": restart_step,
        "first_step": steps[0] if steps else None,
        "last_step": steps[-1] if steps else None,
        "pass": bool(monotonic and spans and steps)}

    # ---- G5: timbre transfer gate (runs the model) --------------------
    # controlled panel: held-out instruments (seed 12345 — the corpus used
    # seed 7) from the same four synth families at one register
    import numpy as np

    pipe, variables, cfg = load_pipeline(work, args.run_name)
    gates["timbre_transfer"] = transfer_panel(
        pipe, variables, cfg, args.nb_steps, args.guidance_timbre,
        wav_dir=work)

    # ---- G6: stage-8 playback -----------------------------------------
    sp = summary.get("stages", {}).get("stream_playback", {})
    gates["playback_finite"] = {
        "peak": sp.get("peak"), "buffers": sp.get("buffers"),
        "pass": bool(sp and np.isfinite(sp.get("peak", np.nan))
                     and sp.get("peak", 0) > 0)}

    summary["gates"] = gates
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
    from scale_run import copy_evidence
    copy_evidence(work)
    ok = all(g["pass"] for g in gates.values())
    print(json.dumps(gates, indent=1))
    print("GATES:", "ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
