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
    # SAME recipe as scale_run.py's rectified-flow stages (imported, so the
    # two scripts can never drift: anti-leak schedule + the round-5
    # disentanglement recipe) with only --model edm differing — the
    # comparison isolates the diffusion objective
    from scale_run import recipe_overrides
    argv = [
        "train", "--name", "scale_edm", "--db_path",
        os.path.join(work, "db"), "--emb_model_path",
        os.path.join(work, "runs", "scale_codec"), "--out_path",
        os.path.join(work, "runs"), "--config", "base", "--config", "cycle",
        "--model", "edm",
        "--batch_size", "64", "--rng_impl", "rbg",
        "--compute_dtype", "bfloat16", "--augmentation_keys", "all",
        "--data_on_device",
    ] + recipe_overrides() + [
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
    """The G5 controlled transfer panel for one diffusion run (shared with
    scale_gates so the two harnesses can never judge by different rules)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_gates import load_pipeline, transfer_panel

    pipe, variables, cfg = load_pipeline(work, run_name, step)
    panel = transfer_panel(pipe, variables, cfg, nb_steps, guidance_timbre)

    rows = []
    with open(os.path.join(work, "runs", run_name, "metrics.jsonl")) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except ValueError:
                pass
    val = [(r["step"], r["val_diffusion_loss"]) for r in rows
           if "val_diffusion_loss" in r]
    vtm = [(r["step"], r["val_transfer_margin"]) for r in rows
           if "val_transfer_margin" in r]
    return {
        "step": step,
        "n_pass": panel["n_pass"], "n_pairs": panel["n_pairs"],
        "mean_margin": panel["mean_margin"],
        # aggregate cosines kept for the report table
        "cos_to_target": float(sum(p["cos_to_target"]
                                   for p in panel["pairs"])
                               / panel["n_pairs"]),
        "cos_to_source": float(sum(p["cos_to_source"]
                                   for p in panel["pairs"])
                               / panel["n_pairs"]),
        "output_finite": panel["output_finite"],
        "val_diffusion_loss_first": val[0] if val else None,
        "val_diffusion_loss_last": val[-1] if val else None,
        "val_transfer_margin_last": vtm[-1] if vtm else None,
        "transfer_pass": panel["pass"],
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
