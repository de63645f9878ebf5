"""EDM vs rectified-flow on the scale-run corpus (VERDICT r4 ask #8).

The reference advertises a `--model edm` switch that is dead code upstream
(/root/reference/after_scripts/train.py:88-95 imports a class that doesn't
exist); here diffusion/edm.py is a working implementation.  This script
characterizes it beyond unit sanity: train EDM with the SAME data, flags
and 15k-step budget as the scale run's phase-1+2 rectified-flow, then run
the scale_gates timbre-transfer gate on both (same source/target/rng) and
record val-loss trajectories (NOT cross-comparable between objectives —
the objectives weigh noise levels differently — but each should decrease).

Run AFTER scripts/scale_run.py.  Writes WORK/edm_compare.json and the
transfer WAVs; docs/training.md records the production-readiness verdict.

Usage: python scripts/edm_compare.py [--work /tmp/after_scale]
       [--steps 15000] [--skip_train]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SR = 44100


def train_edm(work, steps, log_dir):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    argv = [
        "train", "--name", "scale_edm", "--db_path",
        os.path.join(work, "db"), "--emb_model_path",
        os.path.join(work, "runs", "scale_codec"), "--out_path",
        os.path.join(work, "runs"), "--config", "base", "--model", "edm",
        "--batch_size", "64", "--rng_impl", "rbg",
        "--compute_dtype", "bfloat16", "--augmentation_keys", "all",
        "--data_on_device",
        "--override", f"train.timbre_warmup={steps * 2 // 5}",
        "--override", f"train.steps_valid={steps // 6}",
        "--override", f"train.steps_save={steps // 2}",
        "--max_steps", str(steps),
    ]
    logf = os.path.join(log_dir, "train_edm.log")
    t0 = time.time()
    with open(logf, "w") as f:
        rc = subprocess.call(
            [sys.executable, "-m", "after_tpu.cli.main"] + argv, cwd=REPO,
            env=env, stdout=f, stderr=subprocess.STDOUT, timeout=7200)
    if rc != 0:
        tail = subprocess.run(["tail", "-25", logf], capture_output=True,
                              text=True).stdout
        raise SystemExit(f"EDM training FAILED rc={rc}\n{tail}")
    return time.time() - t0


def evaluate(work, run_name, step, nb_steps, guidance_timbre):
    """G5-style timbre-transfer gate for one diffusion run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from after_tpu.config import from_json, load_codec_config, with_overrides
    from after_tpu.dataset.audio import load_wav, save_wav
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
    variables = {"codec": restore_checkpoint(codec_dir)["codec_vars"],
                 "diffusion": diff_vars}
    pipe = TransferPipeline(cfg)

    n = 4 * cfg.autoencoder.ratio * 32

    def load(i):
        x, sr = load_wav(os.path.join(work, "corpus", f"tone_{i:03d}.wav"))
        return jnp.asarray(np.asarray(x, np.float32)[:n])[None, :, None]

    src, tgt = load(94), load(95)
    out = pipe.transfer(variables, src, tgt, nb_steps,
                        guidance_timbre=guidance_timbre,
                        rng=jax.random.PRNGKey(0))

    def timbre_of(audio):
        return np.asarray(pipe.timbre(
            variables, pipe.encode(variables, audio)))[0]

    zt_s, zt_t = timbre_of(src), timbre_of(tgt)
    zt_o = timbre_of(jnp.asarray(np.asarray(out)))

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    save_wav(os.path.join(work, f"{run_name}_transfer.wav"),
             np.clip(np.asarray(out)[0, :, 0], -1, 1), SR)

    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except ValueError:
                pass
    val = [(r["step"], r["val_diffusion_loss"]) for r in rows
           if "val_diffusion_loss" in r]
    return {
        "step": int(restored.get("step", step or -1)),
        "cos_to_target": cos(zt_o, zt_t),
        "cos_to_source": cos(zt_o, zt_s),
        "output_finite": bool(np.isfinite(np.asarray(out)).all()),
        "val_diffusion_loss_first": val[0] if val else None,
        "val_diffusion_loss_last": val[-1] if val else None,
        "transfer_pass": bool(np.isfinite(np.asarray(out)).all()
                              and cos(zt_o, zt_t) > cos(zt_o, zt_s)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--nb_steps", type=int, default=20)
    ap.add_argument("--guidance_timbre", type=float, default=2.0)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    log_dir = os.path.join(args.work, "logs")
    os.makedirs(log_dir, exist_ok=True)

    result = {"steps_budget": args.steps}
    if not args.skip_train:
        dt = train_edm(args.work, args.steps, log_dir)
        result["edm_train_minutes"] = round(dt / 60, 2)

    # rectified flow at the SAME budget (the scale run's 15k checkpoint)
    result["rectified_15k"] = evaluate(args.work, "scale_dif", args.steps,
                                       args.nb_steps, args.guidance_timbre)
    result["edm"] = evaluate(args.work, "scale_edm", None,
                             args.nb_steps, args.guidance_timbre)

    with open(os.path.join(args.work, "edm_compare.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
