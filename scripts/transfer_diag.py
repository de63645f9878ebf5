"""Transfer-failure diagnostics on an existing scale-run checkpoint.

Round-5 context: gate_control proved the G5 metric valid (ground-truth
transfers score +0.75, no-ops -0.77), yet the trained model scores -0.35
on the same panel while its in-training latent-space val_transfer_margin
is +0.23.  This harness separates the remaining hypotheses WITHOUT
retraining, by running the G5 panel on the saved checkpoint and measuring
the margin at BOTH probe points and several guidance strengths:

  latent margin   embed the sampled latents directly (the val metric's
                  probe point) -> how strongly the denoiser follows the
                  timbre conditioning
  audio margin    decode -> re-encode -> embed (the gate's probe point)
                  -> how much of that shift survives the codec round trip
  null-timbre     sample with the timbre condition dropped (CFG null row)
                  and report cos(out, source): high = the STRUCTURE codes
                  alone reproduce the source timbre (leak)

Usage: python scripts/transfer_diag.py [--work /tmp/after_scale]
       [--guidances 1,2,3,4,6] [--nb_steps 20]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/after_scale")
    ap.add_argument("--run_name", default="scale_dif")
    ap.add_argument("--guidances", default="1,2,3,4,6")
    ap.add_argument("--nb_steps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from scale_gates import load_pipeline
    from scale_run import synth_tone

    pipe, variables, cfg = load_pipeline(args.work, args.run_name)

    n = 4 * cfg.autoencoder.ratio * 32
    panel_rng = np.random.RandomState(12345)
    insts = {(k, r): jnp.asarray(synth_tone(k, panel_rng, n, register=2.0)
                                 )[None, :, None]
             for k in range(4) for r in range(2)}

    def embed_latents(z):
        return np.asarray(pipe.timbre(variables, z))[0]

    def embed_audio(a):
        return embed_latents(pipe.encode(variables, a))

    def cos(a, b):
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    embs = {key: embed_audio(a) for key, a in insts.items()}
    z_structs = {key: pipe.encode(variables, a) for key, a in insts.items()}
    tconds = {key: pipe.structure(variables, z)
              for key, z in z_structs.items()}
    conds = {key: np.asarray(pipe.timbre(variables, z))
             for key, z in z_structs.items()}

    report = {"nb_steps": args.nb_steps, "sweeps": []}

    null_cond = jnp.full((1, cfg.zt_channels), cfg.drop_value)

    for g in [float(x) for x in args.guidances.split(",")]:
        lat_m, aud_m, null_src = [], [], []
        for ks in range(4):
            for kt in range(4):
                if ks == kt:
                    continue
                tcond = tconds[(ks, 0)]
                cond = jnp.asarray(conds[(kt, 1)])
                x0 = jax.random.normal(jax.random.PRNGKey(0),
                                       z_structs[(ks, 0)].shape)
                z_out = pipe.diffuse(variables, x0, cond, tcond,
                                     args.nb_steps, guidance_timbre=g)
                e_lat = embed_latents(z_out)
                audio = pipe.decode(variables, z_out)
                e_aud = embed_audio(jnp.asarray(np.asarray(audio)))
                e_t, e_s = embs[(kt, 1)], embs[(ks, 0)]
                lat_m.append(cos(e_lat, e_t) - cos(e_lat, e_s))
                aud_m.append(cos(e_aud, e_t) - cos(e_aud, e_s))
                if kt == (ks + 1) % 4:  # one null probe per source kind
                    z_null = pipe.diffuse(variables, x0, null_cond, tcond,
                                          args.nb_steps, guidance_timbre=1.0,
                                          guidance_structure=1.0)
                    null_src.append(cos(embed_latents(z_null), e_s))
        row = {"guidance_timbre": g,
               "latent_margin": float(np.mean(lat_m)),
               "latent_pass": int(sum(m > 0 for m in lat_m)),
               "audio_margin": float(np.mean(aud_m)),
               "audio_pass": int(sum(m > 0 for m in aud_m)),
               "null_timbre_cos_to_source": float(np.mean(null_src))}
        report["sweeps"].append(row)
        print(json.dumps(row), flush=True)

    out = args.out or os.path.join(args.work, "transfer_diag.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
