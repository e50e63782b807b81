"""Attribute the headline bench's persistent ~0.5% loss offset.

Every our-plant parity cell lands 0.4-0.55% ABOVE the reference's final
produced-mel loss with the same sign (parity_matrix_r04.json: +0.008 to
+0.011 absolute), while the authentic-VTL cells land within 0.05-0.16%.
The offset is systematic, and the obvious suspect is dtype: the reference
plans in torch float64, our device leg in float32 (config.py).

This tool pins the attribution with a controlled experiment at the exact
headline parity configuration (bench.py: acoustic_semvec, plain criterion,
zeros init, 2 outer x 25 inner, log_ii=1, continue-learning on, shared
seeded converted weights, our C++ plant on both legs, same copy-synthesis
target):

* ``ref``       — the reference's own plan_resynth, torch f64 (measured
                  fresh so the artifact is self-contained)
* ``tpu-f32``   — our leg, default TPU float32, seeds 1/2/3 (bounds the
                  stochastic spread from continue-learning RNG)
* ``cpu-f32``   — our leg, XLA:CPU float32 (separates dtype from
                  platform: if cpu-f32 tracks tpu-f32, the platform is
                  innocent)
* ``cpu-f64``   — our leg, PAULE_TPU_X64=1 on XLA:CPU — the same
                  configuration the test suite runs under (f64 planning,
                  f64 mel, f64 Adam)

If cpu-f64 collapses onto the reference while both f32 legs carry the
offset, the headline's 0.5% is measured (not asserted) to be float32
planning numerics; if cpu-f64 keeps the offset, something behavioral
remains and the artifact says so.

OUTCOME (see the artifact's "conclusion"): the hypothesis was WRONG in an
interesting way — cpu-f32 ALSO collapsed onto the reference (-0.04%), so
the offset is not float32 but the TPU MXU's default bf16-input matmul
path.  A seventh leg (tpu-f32-fullprec) with
jax_default_matmul_precision=float32 collapses the TPU offset to -0.04%
at ~5-10% wall cost; that setting is now the package default
(paule_tpu/config.py).

Each leg runs in its own subprocess because jax's x64 switch and platform
choice are process-global on this host (sitecustomize pre-imports jax, so
env vars alone don't switch platforms — the leg runner updates the live
jax config before backend init, the tests/conftest.py pattern).

Writes docs/measurements/dtype_attribution_r04.json.
Run detached (CPU-heavy legs, ~20-30 min): PYTHONPATH=. python
tools/dtype_attribution.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _leg_common():
    """Shared setup: backend init, weights, target, init_cp."""
    import jax

    if os.environ.get("DTYPE_ATTR_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.devices()  # init backend before torch (tunnel deadlock gotcha)

    import bench

    models = bench.make_reference_models()
    params_fwd, params_emb = bench.convert_params(models[0], models[1])
    cp_true = bench.make_cp_true()
    target = bench.make_target_ours(cp_true)

    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import normalize_mel

    n_mel = np.asarray(normalize_mel(
        librosa_melspec(target[0], target[1]))).shape[0]
    init_cp = np.zeros((2 * n_mel, 30))
    return bench, models, params_fwd, params_emb, target, init_cp


def run_leg_ours(seed):
    bench, _, params_fwd, params_emb, target, init_cp = _leg_common()

    from paule_tpu import config
    from paule_tpu.api import Paule

    p = Paule(seed=seed, pred_model=params_fwd, embedder=params_emb)
    t0 = time.perf_counter()
    r = bench.run_ours(p, target, init_cp, bench.PARITY_OUTER)
    dt = time.perf_counter() - t0
    import jax

    return {
        "final_loss": float(r.prod_loss_steps[-1]),
        "curve": [round(float(x), 4) for x in r.prod_loss_steps],
        "t_s": round(dt, 1),
        "dtype": str(config.DTYPE.__name__),
        "platform": jax.default_backend(),
        "seed": seed,
    }


def run_leg_ref():
    bench, models, _, _, target, init_cp = _leg_common()

    t_ref, _, loss_ref, laps, curve = bench.bench_reference(
        target, models, init_cp, bench.PARITY_OUTER, plant="ours")
    return {
        "final_loss": float(loss_ref),
        "curve": [round(float(x), 4) for x in curve],
        "t_s": round(t_ref, 1),
        "dtype": "float64 (torch)",
        "platform": "cpu",
    }


def main_leg(name):
    seed = int(os.environ.get("DTYPE_ATTR_SEED", "1"))
    out = run_leg_ref() if name == "ref" else run_leg_ours(seed)
    out["leg"] = name
    print("DTYPE_ATTR_RESULT " + json.dumps(out), flush=True)
    return 0


LEGS = [
    # (key, extra env).  The tpu-f32-sN legs pin the MXU's bf16-input
    # matmul path explicitly: the experiment's outcome made full-precision
    # matmuls the package default (config.py PAULE_TPU_MATMUL_PRECISION),
    # so reproducing the offset now requires opting back out.
    ("ref", {"DTYPE_ATTR_PLATFORM": "cpu"}),
    ("tpu-f32-s1", {"DTYPE_ATTR_SEED": "1",
                    "PAULE_TPU_MATMUL_PRECISION": "default"}),
    ("tpu-f32-s2", {"DTYPE_ATTR_SEED": "2",
                    "PAULE_TPU_MATMUL_PRECISION": "default"}),
    ("tpu-f32-s3", {"DTYPE_ATTR_SEED": "3",
                    "PAULE_TPU_MATMUL_PRECISION": "default"}),
    ("cpu-f32", {"DTYPE_ATTR_PLATFORM": "cpu"}),
    ("cpu-f64", {"DTYPE_ATTR_PLATFORM": "cpu", "PAULE_TPU_X64": "1"}),
    ("tpu-f32-fullprec", {"DTYPE_ATTR_SEED": "1",
                          "PAULE_TPU_MATMUL_PRECISION": "float32"}),
]


def main():
    results = {}
    for key, extra in LEGS:
        env = dict(os.environ)
        env.pop("PAULE_TPU_X64", None)
        env.update(extra)
        leg = "ref" if key == "ref" else "ours"
        print(f"[dtype-attr] leg {key}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "leg", leg],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=3600)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("DTYPE_ATTR_RESULT ")]
        if proc.returncode != 0 or not line:
            print(f"[dtype-attr] leg {key} FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", file=sys.stderr, flush=True)
            results[key] = {"error": proc.returncode}
            continue
        results[key] = json.loads(line[-1].split(" ", 1)[1])
        print(f"[dtype-attr] leg {key}: loss "
              f"{results[key]['final_loss']:.4f} "
              f"({time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)

    ref_loss = results.get("ref", {}).get("final_loss")
    analysis = {}
    if ref_loss:
        for key, r in results.items():
            if key == "ref" or "final_loss" not in r:
                continue
            analysis[key] = {
                "abs_offset": round(r["final_loss"] - ref_loss, 5),
                "rel_offset": round(
                    (r["final_loss"] - ref_loss) / abs(ref_loss), 5),
            }
        f32_seeds = [results[k]["final_loss"] for k in
                     ("tpu-f32-s1", "tpu-f32-s2", "tpu-f32-s3")
                     if "final_loss" in results.get(k, {})]
        if f32_seeds:
            analysis["tpu_f32_seed_spread"] = round(
                max(f32_seeds) - min(f32_seeds), 5)

    out = {
        "question": "is the headline bench's systematic +0.4-0.55% loss "
                    "offset (ours above reference, same sign in every "
                    "our-plant parity cell) attributable to float32 "
                    "planning vs the reference's float64?",
        "config": "bench.py headline parity cell: acoustic_semvec, zeros "
                  "init, 2 outer x 25 inner, log_ii=1, continue-learning "
                  "on, shared seeded converted weights, our C++ plant "
                  "both legs, same copy-synthesis target",
        "legs": results,
        "analysis": analysis,
    }
    path = os.path.join(REPO, "docs/measurements/dtype_attribution_r04.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "leg":
        sys.exit(main_leg(sys.argv[2]))
    sys.exit(main())
