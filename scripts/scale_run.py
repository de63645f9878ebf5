"""Full production pipeline at base scale on the real TPU, through the CLIs.

The reference README's three-stage workflow (train_autoencoder ->
prepare_dataset -> train -> export, /root/reference/README.md:21-23) run
end-to-end at REAL sizes (baseAE codec, base+cycle diffusion config,
batch 64) on one v5e chip, with a forced mid-run restart to prove
full-state resume in anger:

  1. synthesize a 96-file tonal corpus (~10 min of audio)
  2. after-tpu prepare_dataset           (raw waveform store)
  3. after-tpu train_autoencoder         3k steps, GAN engages at 1.5k
  4. after-tpu prepare_dataset           (latents + 2 PSTS augments)
  5. after-tpu train                     15k steps (phase 1 -> phase 2)
  6. after-tpu train --restart 15000     -> 30k steps (cycle joins at 10k)
  7. after-tpu export                    streaming artifacts
  8. ExportedStreamer playback sanity    (finite audio out, state threads)

Each stage is its own subprocess (one TPU session at a time).  Progress
and a final summary land in WORK/scale_run_summary.json.  Stage logs in
WORK/logs/.  Expected wall: 60-90 min, dominated by AE training + remote
compiles on a cold cache.

Usage:  python scripts/scale_run.py [--work /tmp/after_scale] [--fast]
        (--fast cuts steps 10x for a smoke pass)
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SR = 44100
NUM_SIGNAL = 524288


def log(m):
    print(f"[scale_run] {m}", flush=True)


# ---------------------------------------------------------------------------
# corpus synthesis (numpy only; melodic + timbral variety)
# ---------------------------------------------------------------------------

def draw_melody(rng, register=None):
    """The melody draws of synth_tone, exposed so a control harness can
    capture an instrument's tune and hand it to another instrument."""
    import numpy as np
    scale = 110.0 * 2 ** (np.array([0, 2, 3, 5, 7, 8, 10, 12]) / 12.0)
    reg = 2.0 ** rng.randint(0, 3) if register is None else register
    n_notes = rng.randint(6, 16)
    return rng.choice(scale, n_notes) * reg


def synth_tone(kind, rng, n, register=None, melody=None):
    """One synthetic instrument playing a random melody, (n,) float32.

    Every kind draws per-file timbre parameters so the corpus spans a
    continuous timbre manifold (within-kind instruments genuinely differ);
    a degenerate 4-archetype corpus lets structure codes leak timbre
    undetected.  `register=None` draws a random octave; a fixed value
    removes the register confound for controlled transfer evaluation.

    `melody` (a note-frequency array) replaces the random melody while
    leaving the rng stream — and therefore the instrument's timbre
    parameters — untouched: the same rng seed renders the SAME instrument
    playing a different tune.  That synthesizes exact ground-truth
    transfers (source melody, target timbre) for validating the transfer
    gate's metric (scripts/gate_control.py).
    """
    import numpy as np
    t = np.arange(n) / SR
    notes = draw_melody(rng, register)
    if melody is not None:  # draws above still consumed: timbre stays pinned
        notes = np.asarray(melody, np.float64)
    n_notes = len(notes)
    seg = n // n_notes
    f0 = np.repeat(notes, seg)[:n]
    f0 = np.pad(f0, (0, n - len(f0)), mode="edge")
    phase = 2 * np.pi * np.cumsum(f0) / SR

    def envelope(n_env):
        s = n // n_env
        e = np.concatenate([np.exp(-4.0 * np.arange(s) / s)] * n_env)
        return np.pad(e[:n], (0, max(0, n - len(e))), mode="edge")

    if kind == 0:      # FM voice: carrier/mod ratio + index
        ratio = rng.choice([0.5, 1.0, 2.0, 3.0])
        index = rng.uniform(0.5, 4.0)
        x = np.sin(phase + index * np.sin(ratio * phase))
    elif kind == 1:    # plucked harmonics: count, tilt, decay
        nh = rng.randint(4, 9)
        tilt = rng.uniform(0.5, 1.8)
        x = sum(np.sin((k + 1) * phase) / (k + 1) ** tilt
                for k in range(nh)) * envelope(rng.randint(8, 24))
    else:
        if kind == 2:  # detuned pad: detune width, partial count, tilt
            det = rng.uniform(0.002, 0.012)
            nh = rng.randint(2, 6)
            tilt = rng.uniform(0.8, 2.0)
            x = sum(sum(np.sin((k + 1) * phase * d) / (k + 1) ** tilt
                        for d in (1 - det, 1.0, 1 + det))
                    for k in range(nh))
        else:          # breath: noise ratio, bandwidth, brightness
            bw = rng.choice([8, 16, 32, 64])
            mix = rng.uniform(0.25, 0.6)
            band = np.convolve(rng.randn(n), np.ones(bw) / bw, "same")
            h2 = rng.uniform(0.0, 0.5)
            x = ((1 - mix) * (np.sin(phase) + h2 * np.sin(2 * phase))
                 + mix * band * envelope(8) * 3.0)
    x = np.tanh(1.5 * x / np.max(np.abs(x) + 1e-9))
    tremolo = 1.0 + 0.1 * np.sin(2 * np.pi * rng.uniform(0.5, 6.0) * t)
    return (0.8 * x * tremolo).astype(np.float32)


def synth_corpus(out_dir, n_files, rng, shared_melodies=True):
    """With `shared_melodies` (default), each melody in a pool of
    n_files//4 tunes is rendered by ALL FOUR instrument families, so the
    note sequence cannot identify the file — and therefore cannot identify
    its timbre.  Round 4/5 diagnosis: with one unique melody per file the
    structure codes can pass timbre to the denoiser BY MELODY IDENTITY (a
    lookup the adversarial classifier then wins against any plausible
    weight, since removing melody identity from structure would destroy the
    structure signal itself); real music doesn't pair each tune with
    exactly one timbre, and neither should the benchmark corpus."""
    import numpy as np
    sys.path.insert(0, REPO)
    from after_tpu.dataset.audio import save_wav

    os.makedirs(out_dir, exist_ok=True)
    n = int(NUM_SIGNAL * 1.05)
    melodies = ([draw_melody(rng) for _ in range(max(n_files // 4, 1))]
                if shared_melodies else None)
    for i in range(n_files):
        melody = melodies[i // 4] if melodies else None
        save_wav(os.path.join(out_dir, f"tone_{i:03d}.wav"),
                 synth_tone(i % 4, rng, n, melody=melody), SR)
    log(f"corpus: {n_files} files x {n / SR:.1f}s"
        + (f" ({len(melodies)} shared melodies x 4 families)"
           if melodies else "") + f" -> {out_dir}")


def copy_evidence(work, dest=None):
    """Copy the committed-able evidence (summary, gate wavs, run metrics,
    run configs) from WORK into the repo's runs/scale/ so a fresh run leaves
    durable artifacts without manual steps — /tmp is wiped between rounds
    and round 4's real results were nearly lost to that."""
    import shutil
    dest = dest or os.path.join(REPO, "runs", "scale")
    os.makedirs(dest, exist_ok=True)
    for it in ("scale_run_summary.json", "gate_control.json",
               "artifact_soak.json", "edm_compare.json",
               "gate_source.wav", "gate_target.wav", "gate_transfer.wav"):
        p = os.path.join(work, it)
        if os.path.exists(p):
            shutil.copy2(p, dest)
    for run, tag in (("scale_codec", "codec"), ("scale_dif", "dif")):
        for f in ("metrics.jsonl", "config.json"):
            p = os.path.join(work, "runs", run, f)
            if os.path.exists(p):
                shutil.copy2(p, os.path.join(dest, f"{tag}_{f}"))
    log(f"evidence copied to {dest}")


# ---------------------------------------------------------------------------
# the training recipe (shared with scripts/edm_compare.py so the EDM
# comparison differs from the rectified-flow run ONLY in --model)
# ---------------------------------------------------------------------------


def recipe_overrides(div: int = 1):
    """The scale run's diffusion-training overrides at budget 1/div.

    Two groups, both required for a passing transfer gate (failure history
    in SCALE_RUN.md / runs/scale/README.md):

    - the anti-leak schedule scaled to this budget: the reference's
      base.gin values (adversarial_warmup=60000,
      stop_training_encoder_step=PHASE_1_STEP) target a 1M-step run —
      kept unscaled, the classifier pressure never reaches full weight,
      the timbre encoder never freezes, and structure codes leak timbre
      (measured on run r4: transfer output cos_to_source 0.95+);
    - the round-5 disentanglement recipe (runs D3+D4; diagnosis in
      runs/scale/transfer_diag_d3.json): continuous full-rate structure
      codes carried the whole timbre (null-timbre sampling reproduced the
      source at cos 0.994) — FSQ-quantize them so the adversarial game is
      winnable, raise the encoder's share of that game from 0.075 to 0.4
      with the classifier updated every step, and use a plain-mse cycle
      loss (mse_margin_0.05 sat at its floor, zero gradient).  D3's 12-dim
      FSQ (~28 bits/frame) still leaked (null-timbre cos 0.973, gate 4/12)
      — adversarial pressure only removes classifier-ACCESSIBLE
      information, so D4 applies the information-theoretic fix instead: a
      hard capacity cap of 4 FSQ dims x 5 levels (~9.3 bits/frame), enough
      for melody/rhythm but not for the source's spectral envelope.
      zs_channels must shrink 12->4 end-to-end (encoder_time output width,
      classifier input, denoiser conditioning pad).
    """
    return [
        "--override", f"train.timbre_warmup={6000 // div}",
        "--override", f"train.adversarial_warmup={3000 // div}",
        "--override", f"train.stop_training_encoder_step={6000 // div}",
        "--override", f"train.cycle_start_step={10000 // div}",
        "--override", "zs_channels=4",
        "--override", "encoder_time.channels=[64,128,256,512,4]",
        "--override", "encoder_time.quantizer_levels=[5,5,5,5]",
        "--override", "classifier.in_size=4",
        "--override", "train.adversarial_weight=0.4",
        "--override", "train.update_classifier_every=1",
        "--override", "train.cycle_loss_type=mse",
    ]


# ---------------------------------------------------------------------------
# stage runner
# ---------------------------------------------------------------------------

STAGE_TIMEOUT = 7200


def run_stage(name, argv, work, env_extra=None, timeout=None):
    timeout = STAGE_TIMEOUT if timeout is None else timeout
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    env.update(env_extra or {})
    logf = os.path.join(work, "logs", f"{name}.log")
    os.makedirs(os.path.dirname(logf), exist_ok=True)
    t0 = time.time()
    log(f"stage {name}: {' '.join(argv)}")
    try:
        with open(logf, "w") as f:
            rc = subprocess.call([sys.executable, "-m", "after_tpu.cli.main"]
                                 + argv, cwd=REPO, env=env, stdout=f,
                                 stderr=subprocess.STDOUT, timeout=timeout)
    except subprocess.TimeoutExpired:
        tail = subprocess.run(["tail", "-25", logf], capture_output=True,
                              text=True).stdout
        raise SystemExit(
            f"stage {name} TIMED OUT after {timeout / 60:.0f} min and was "
            f"killed. The TPU session claim may linger for several minutes "
            f"— wait before rerunning with --skip_to.\n{tail}")
    dt = time.time() - t0
    log(f"stage {name}: rc={rc} in {dt / 60:.1f} min (log: {logf})")
    if rc != 0:
        tail = subprocess.run(["tail", "-25", logf], capture_output=True,
                              text=True).stdout
        raise SystemExit(f"stage {name} FAILED rc={rc}\n{tail}")
    return dt


def metrics_summary(run_dir, keys=("loss_diffusion", "loss_total")):
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except ValueError:
                    pass
    out = {"n_rows": len(rows)}
    for key in keys:
        vals = [(r.get("step"), r[key]) for r in rows if key in r]
        if vals:
            out[key] = {"first": vals[0], "last": vals[-1],
                        "min": min(v for _, v in vals)}
    steps = [r["step"] for r in rows if "steps_per_sec" in r]
    sps = [r["steps_per_sec"] for r in rows if "steps_per_sec" in r]
    if sps:
        out["steps_per_sec_median"] = sorted(sps)[len(sps) // 2]
        out["steps_per_sec_last"] = sps[-1]
        out["last_step"] = steps[-1]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--skip_to", type=int, default=0,
                    help="resume the pipeline at stage N (1-8)")
    ap.add_argument("--stage_timeout", type=int, default=7200,
                    help="per-stage subprocess timeout in seconds")
    ap.add_argument("--data_on_device", action="store_true",
                    help="train diffusion from the device-resident latent "
                         "bank (no per-step host upload; ~15x faster "
                         "through this sandbox's relay)")
    args = ap.parse_args()
    global STAGE_TIMEOUT
    STAGE_TIMEOUT = args.stage_timeout
    work = args.work
    os.makedirs(work, exist_ok=True)
    div = 10 if args.fast else 1

    corpus = os.path.join(work, "corpus")
    db_raw = os.path.join(work, "db_raw")
    db = os.path.join(work, "db")
    runs = os.path.join(work, "runs")
    # resume merges into the previous invocation's stage records
    summary = {"work": work, "fast": args.fast, "stages": {}}
    spath = os.path.join(work, "scale_run_summary.json")
    if args.skip_to > 0 and os.path.exists(spath):
        with open(spath) as f:
            prev = json.load(f)
        summary["stages"].update(prev.get("stages", {}))

    ae_steps = 3000 // div
    ae_warm = 1500 // div
    dif_mid = 15000 // div
    dif_end = 45000 // div

    def record(name, dt):
        summary["stages"][name] = {"minutes": round(dt / 60, 2)}
        with open(os.path.join(work, "scale_run_summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    if args.skip_to <= 1:
        import numpy as np
        synth_corpus(corpus, n_files=96, rng=np.random.RandomState(7))

    if args.skip_to <= 2:
        dt = run_stage("prepare_raw", [
            "prepare_dataset", "--input_path", corpus, "--output_path",
            db_raw, "--save_waveform"], work)
        record("prepare_raw", dt)

    if args.skip_to <= 3:
        dt = run_stage("train_ae", [
            # --streaming trains the codec causal/norm-free: stage 7's fused
            # a2a export needs a causal codec (non-causal codecs export via
            # the separate crossfade path, cli/export.py export_autoencoder)
            "train_autoencoder", "--name", "scale_codec", "--streaming",
            "--db_path", db_raw, "--out_path", runs,
            "--max_steps", str(ae_steps),
            "--override", f"train.warmup_steps={ae_warm}",
            "--override", f"train.steps_save={ae_steps // 2}",
            "--override", f"train.steps_valid={ae_steps // 3}",
        ], work)
        record("train_ae", dt)
        summary["stages"]["train_ae"]["metrics"] = metrics_summary(
            os.path.join(runs, "scale_codec"),
            keys=("mrstft", "total_loss", "feature_matching", "val_mrstft"))

    if args.skip_to <= 4:
        # encode latents on the host CPU: ~36 batches of codec encode do
        # not need the chip, and a CPU run never contends for the TPU
        # session claim (a freshly released/killed claim can block the
        # next TPU process for many minutes in this sandbox)
        dt = run_stage("prepare_latents", [
            "prepare_dataset", "--input_path", corpus, "--output_path", db,
            "--emb_model_path", os.path.join(runs, "scale_codec"),
            "--augmentations", "2"], work,
            env_extra={"AFTER_PLATFORM": "cpu"})
        record("prepare_latents", dt)

    dif_common = [
        "train", "--name", "scale_dif", "--db_path", db,
        "--emb_model_path", os.path.join(runs, "scale_codec"),
        "--out_path", runs, "--config", "base", "--config", "cycle",
        "--batch_size", "64", "--rng_impl", "rbg",
        "--compute_dtype", "bfloat16", "--augmentation_keys", "all",
    ] + recipe_overrides(div) + [
        "--override", f"train.steps_valid={2500 // div}",
        "--override", f"train.steps_save={7500 // div}",
    ] + (["--data_on_device"] if args.data_on_device else [])
    if args.skip_to <= 5:
        dt = run_stage("train_dif_p1",
                       dif_common + ["--max_steps", str(dif_mid)], work)
        record("train_dif_p1", dt)

    if args.skip_to <= 6:
        dt = run_stage("train_dif_p2", dif_common + [
            "--max_steps", str(dif_end), "--restart", str(dif_mid)], work)
        summary["restart_step"] = dif_mid  # scripts/scale_gates.py G4
        record("train_dif_p2", dt)
        summary["stages"]["train_dif_p2"]["metrics"] = metrics_summary(
            os.path.join(runs, "scale_dif"),
            keys=("diffusion_loss", "adversarial_loss", "cycle_cond",
                  "val_diffusion_loss", "skipped_nonfinite"))

    if args.skip_to <= 7:
        dt = run_stage("export", [
            "export", "--model_path", os.path.join(runs, "scale_dif"),
            "--emb_model_path", os.path.join(runs, "scale_codec"),
            "--nb_steps", "4",
            # bake the XY-pad timbre map from the run's own dataset
            # (reference export.py:109-129 latent_project behavior)
            "--db_path", db], work)
        record("export", dt)

    if args.skip_to <= 8:
        # exported-artifact playback through the Python host (stage 8 runs
        # inline: ExportedStreamer is this process's only TPU session)
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(REPO, ".jax_cache"))
        os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                              "1")
        sys.path.insert(0, REPO)
        import jax
        import numpy as np
        from after_tpu.streaming.export import ExportedStreamer
        art = None
        for d in sorted(os.listdir(os.path.join(runs, "scale_dif"))):
            if d.startswith("after.audio"):
                art = os.path.join(runs, "scale_dif", d)
        assert art, "no exported artifact found"
        t0 = time.time()
        st = ExportedStreamer(art)
        rng = np.random.RandomState(0)
        n = st.manifest["audio_chunk"]
        peak = 0.0
        for i in range(8):
            x = 0.3 * np.sin(2 * np.pi * 220 * (i * n + np.arange(n)) / SR
                             ).astype(np.float32)
            y = st.call("forward", x[None, :, None],
                        0.1 * rng.randn(1, n, 1).astype(np.float32),
                        jax.random.key_data(jax.random.PRNGKey(i)))
            y = np.asarray(y)
            assert np.isfinite(y).all(), "non-finite streamed audio"
            peak = max(peak, float(np.abs(y).max()))
        summary["stages"]["stream_playback"] = {
            "minutes": round((time.time() - t0) / 60, 2),
            "buffers": 8, "peak": peak}

    with open(os.path.join(work, "scale_run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    copy_evidence(work)
    log("DONE " + json.dumps(summary))


if __name__ == "__main__":
    main()
