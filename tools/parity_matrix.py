"""Loss-parity matrix across planning variants (VERDICT r3 item 3).

The headline bench A/Bs one cell (acoustic_semvec, plain criterion,
zeros init).  This tool runs a small-budget (2-outer, full inner loop,
synthesis every step, continue-learning on) reference-vs-ours loss A/B for
the OTHER variants:

* ``somatosensory``  — use_somatosensory_feedback=True (tube models)
* ``speech_classifier`` — use_speech_classifier=True
* ``semvec_objective``  — objective='semvec' (acoustic target, semvec loss)
* ``inverse_init``      — initialize_from='acoustic' (converted InverseModel)
* ``past_cp_smiling``   — smiling=True + a frozen past_cp prefix
* ``vtl_somatosensory`` — somatosensory feedback with BOTH legs driving
  the reference's authentic ``libVocalTractLabApi.so`` as plant (ours via
  ``Paule(plant=VTLPlant())``, the reference via its own unmodified
  ``speak_and_extract_tube_information``) on a VTL copy-synthesis target
  — the full incremental-synthesis + per-frame tube-extraction path,
  authentic end to end (opt-in: slow, ~25 min; env PARITY_CELLS)

Both legs of every cell share: the reference's own seeded torch models
(state_dicts converted to our parameters), our C++ synthesizer as the
plant (injected into the reference's ``speak`` /
``speak_and_extract_tube_information`` module globals,
/root/reference/paule/paule.py:43-46), the same copy-synthesis target, the
same initial trajectory, and the same DSP.  The reference leg executes
`/root/reference/paule/paule.py:391` unmodified.

Per cell the recorded number is the final produced-mel loss of each leg
(for ``semvec_objective`` additionally the final produced-semvec loss) and
their relative difference.  Matching dynamics across all cells rules out
variant-only divergences (train-mode dropout cadence, tube-loss
composition, constraint ordering) that the formula-level tests can't see.

Writes docs/measurements/parity_matrix_r04.json.
Run detached (CPU-heavy, ~40 min): PYTHONPATH=. python tools/parity_matrix.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: PARITY_OUTER=10 runs a cell at the headline's FULL budget; its result
#: is recorded under "<cell>_full" (VERDICT r5 #6: a slow-manifesting
#: variant divergence — e.g. tube-model continue-learning drift — is
#: invisible at 2 outers)
N_OUTER = int(os.environ.get("PARITY_OUTER", "2"))
N_INNER = 25
N_EPOCHS = 10
N_BATCHES = 3
BATCH_SIZE = 8
SECONDS = 1.0
N_CP = int(round(SECONDS * 44100 / 110))
if N_CP % 2:
    N_CP += 1
REFERENCE_ROOT = os.environ.get("BENCH_REFERENCE_ROOT", "/root/reference")


def make_cp_true():
    rng = np.random.default_rng(0)
    return np.clip(rng.normal(0, 0.05, (N_CP + 1, 30)).cumsum(0) * 0.2,
                   -1, 1)


def make_torch_models():
    """All torch models any cell needs, seeded once; returns the dict of
    torch modules (shared state_dict source for both legs)."""
    from paule_tpu.reference_bridge import import_reference

    import_reference(REFERENCE_ROOT)
    import torch
    import paule.models as M

    torch.manual_seed(0)
    return {
        "fwd": M.ForwardModel(num_lstm_layers=1, hidden_size=720).double(),
        "emb": M.EmbeddingModel(num_lstm_layers=2, hidden_size=720).double(),
        "inv": M.InverseModelMelTimeSmoothResidual(
            num_lstm_layers=1, hidden_size=720).double(),
        "cp_gen": M.Generator().double(),
        "mel_gen": M.Generator(output_size=60).double(),
        "speech_cls": M.LinearClassifier(input_dim=60,
                                         output_dim=1).double(),
        "cp_tube": M.ForwardModel(num_lstm_layers=1, hidden_size=360,
                                  output_size=10, input_size=30,
                                  apply_half_sequence=False).double(),
        "tube_mel": M.ForwardModel(num_lstm_layers=1, hidden_size=360,
                                   output_size=60, input_size=10,
                                   apply_half_sequence=True).double(),
        "tube_emb": M.EmbeddingModel(
            input_size=10, num_lstm_layers=2, hidden_size=720, dropout=0.7,
            post_upsampling_size=0).double(),
    }


def convert_all(tm):
    from paule_tpu.models import torch_convert as TC

    return {
        "fwd": TC.convert("forward", tm["fwd"].state_dict()),
        "emb": TC.convert("embedder", tm["emb"].state_dict()),
        "inv": TC.convert("inverse", tm["inv"].state_dict()),
        "speech_cls": TC.convert("linear_classifier",
                                 tm["speech_cls"].state_dict()),
        "cp_tube": TC.convert("forward", tm["cp_tube"].state_dict()),
        "tube_mel": TC.convert("forward", tm["tube_mel"].state_dict()),
        "tube_emb": TC.convert("embedder", tm["tube_emb"].state_dict()),
    }


def inject_our_plant():
    """Our C++ synthesizer as the reference's plant — BOTH entry points.

    The originals (the reference's authentic VTL-backed functions) are
    stashed on first call so :func:`restore_vtl_plant` can put them back
    for the ``vtl_*`` cells."""
    import paule.paule as P
    import paule.util as U

    from paule_tpu import synth

    synth.initialize()
    if not hasattr(U, "_vtl_speak"):
        U._vtl_speak = U.speak
        U._vtl_extract = U.speak_and_extract_tube_information

    def speak_ours(cp_denorm):
        return synth.speak(np.asarray(cp_denorm, dtype=np.float64))

    def extract_ours(cp_denorm):
        return synth.speak_and_extract_tube_information(
            np.asarray(cp_denorm, dtype=np.float64))

    P.speak = speak_ours
    P.speak_and_extract_tube_information = extract_ours
    U.speak = speak_ours
    U.speak_and_extract_tube_information = extract_ours


def restore_vtl_plant():
    """Back to the reference's own authentic-VTL plant functions."""
    import paule.paule as P
    import paule.util as U

    if hasattr(U, "_vtl_speak"):
        U.speak = U._vtl_speak
        U.speak_and_extract_tube_information = U._vtl_extract
    P.speak = U.speak
    P.speak_and_extract_tube_information = \
        U.speak_and_extract_tube_information


def run_reference(cell, target, init_cp, past_cp=None):
    import torch
    import paule.paule as P

    cell = cell.removeprefix("vtl_") or cell  # vtl_* cells share kwargs
    tm = make_torch_models()  # fresh seeded weights per cell/leg
    torch.set_num_threads(os.cpu_count() or 1)
    kwargs = dict(pred_model=tm["fwd"], inv_model=tm["inv"],
                  embedder=tm["emb"], cp_gen_model=tm["cp_gen"],
                  mel_gen_model=tm["mel_gen"],
                  device=torch.device("cpu"))
    if cell == "speech_classifier":
        kwargs.update(use_speech_classifier=True,
                      speech_classifier=tm["speech_cls"])
    if cell == "somatosensory":
        kwargs.update(use_somatosensory_feedback=True,
                      cp_tube_model=tm["cp_tube"],
                      tube_mel_model=tm["tube_mel"],
                      tube_embedder=tm["tube_emb"])
    if cell == "past_cp_smiling":
        kwargs.update(smiling=True)
    model = P.Paule(**kwargs)
    plan = dict(target_acoustic=target, objective="acoustic_semvec",
                initial_cp=None if cell == "inverse_init"
                else init_cp.copy(),
                initialize_from="acoustic" if cell == "inverse_init"
                else None,
                log_ii=1, log_semantics=True, n_outer=N_OUTER,
                n_inner=N_INNER, n_batches=N_BATCHES,
                batch_size=BATCH_SIZE, n_epochs=N_EPOCHS,
                continue_learning=True, verbose=False, plot=False)
    if cell == "semvec_objective":
        plan["objective"] = "semvec"
    if cell == "past_cp_smiling":
        plan["past_cp"] = past_cp.copy()
    t0 = time.perf_counter()
    r = model.plan_resynth(**plan)
    dt = time.perf_counter() - t0
    out = {"t_s": round(dt, 1),
           "prod_loss": float(r.prod_loss_steps[-1]),
           "prod_loss_curve": [round(float(x), 4)
                               for x in r.prod_loss_steps]}
    if hasattr(r, "prod_semvec_loss_steps") and r.prod_semvec_loss_steps:
        out["prod_semvec_loss"] = float(r.prod_semvec_loss_steps[-1])
    return out


def run_ours(cell, params, target, init_cp, past_cp=None):
    from paule_tpu.api import Paule

    # pretrained_dir="random": both legs must share the seeded converted
    # weights — the in-repo release must not leak into the ours leg
    kwargs = dict(seed=1, pred_model=params["fwd"],
                  embedder=params["emb"], pretrained_dir="random")
    if cell.startswith("vtl_"):
        from paule_tpu.synth.vtl_plant import VTLPlant

        kwargs["plant"] = VTLPlant()
        cell = cell.removeprefix("vtl_")
    if cell == "inverse_init":
        kwargs["inv_model"] = params["inv"]
    if cell == "speech_classifier":
        kwargs.update(use_speech_classifier=True,
                      speech_classifier=params["speech_cls"])
    if cell == "somatosensory":
        kwargs.update(use_somatosensory_feedback=True,
                      cp_tube_model=params["cp_tube"],
                      tube_mel_model=params["tube_mel"],
                      tube_embedder=params["tube_emb"])
    if cell == "past_cp_smiling":
        kwargs.update(smiling=True)
    p = Paule(**kwargs)
    plan = dict(target_acoustic=target, objective="acoustic_semvec",
                initial_cp=None if cell == "inverse_init"
                else init_cp.copy(),
                initialize_from="acoustic" if cell == "inverse_init"
                else None,
                log_ii=1, log_semantics=True, n_outer=N_OUTER,
                n_inner=N_INNER, n_batches=N_BATCHES,
                batch_size=BATCH_SIZE, n_epochs=N_EPOCHS,
                continue_learning=True, verbose=False)
    if cell == "semvec_objective":
        plan["objective"] = "semvec"
    if cell == "past_cp_smiling":
        plan["past_cp"] = past_cp.copy()
    t0 = time.perf_counter()
    r = p.plan_resynth(**plan)
    dt = time.perf_counter() - t0
    out = {"t_s": round(dt, 1),
           "prod_loss": float(r.prod_loss_steps[-1]),
           "prod_loss_curve": [round(float(x), 4)
                               for x in r.prod_loss_steps]}
    if hasattr(r, "prod_semvec_loss_steps") and len(
            r.prod_semvec_loss_steps):
        out["prod_semvec_loss"] = float(r.prod_semvec_loss_steps[-1])
    return out


def main():
    def stage(msg):
        print(f"[parity-matrix] {msg}", file=sys.stderr, flush=True)

    import jax

    jax.devices()  # init backend before torch (tunnel deadlock gotcha)
    stage(f"jax backend: {jax.default_backend()}")

    tm = make_torch_models()
    params = convert_all(tm)
    del tm
    inject_our_plant()

    from paule_tpu import synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

    cp_true = make_cp_true()
    target = synth.speak(inv_normalize_cp(cp_true))
    target = (target[0], float(target[1]))
    n_mel = np.asarray(normalize_mel(
        librosa_melspec(target[0], target[1]))).shape[0]
    init_cp = np.zeros((2 * n_mel, 30))
    past_cp = np.clip(
        np.random.default_rng(7).normal(0, 0.05, (20, 30)).cumsum(0) * 0.2,
        -1, 1)

    cells = ["speech_classifier", "semvec_objective", "inverse_init",
             "past_cp_smiling", "somatosensory"]
    if os.environ.get("PARITY_CELLS"):
        cells = os.environ["PARITY_CELLS"].split(",")

    # the vtl_* cells copy-synthesize their target through the authentic
    # VTL plant (both legs then plan through it) — built lazily once
    vtl_target = vtl_init_cp = None

    def vtl_setup():
        nonlocal vtl_target, vtl_init_cp
        restore_vtl_plant()
        if vtl_target is None:
            from paule_tpu.synth.vtl_plant import VTLPlant

            sig, sr = VTLPlant().speak(inv_normalize_cp(cp_true))
            vtl_target = (sig, float(sr))
            nm = np.asarray(normalize_mel(
                librosa_melspec(sig, float(sr)))).shape[0]
            vtl_init_cp = np.zeros((2 * nm, 30))
        return vtl_target, vtl_init_cp

    budget_str = (f"{N_OUTER} outer x {N_INNER} inner, log_ii=1, "
                  f"continue-learning on ({N_EPOCHS} epochs x {N_BATCHES} "
                  f"batches x {BATCH_SIZE})")
    results = {}
    for cell in cells:
        if cell.startswith("vtl_"):
            cell_target, cell_init = vtl_setup()
        else:
            inject_our_plant()
            cell_target, cell_init = target, init_cp
        stage(f"cell {cell}: ours leg...")
        ours = run_ours(cell, params, cell_target, cell_init, past_cp)
        stage(f"cell {cell}: reference leg (~{N_OUTER * 4} min)...")
        ref = run_reference(cell, cell_target, cell_init, past_cp)
        rel = (abs(ours["prod_loss"] - ref["prod_loss"])
               / max(abs(ref["prod_loss"]), 1e-9))
        key = cell if N_OUTER == 2 else f"{cell}_full"
        results[key] = {
            "ours": ours, "reference": ref,
            "budget": budget_str,
            "prod_loss_rel_diff": round(rel, 4),
            "parity_ok": bool(rel <= 0.10),
        }
        if "prod_semvec_loss" in ours and "prod_semvec_loss" in ref:
            rs = (abs(ours["prod_semvec_loss"] - ref["prod_semvec_loss"])
                  / max(abs(ref["prod_semvec_loss"]), 1e-9))
            results[key]["semvec_loss_rel_diff"] = round(rs, 4)
        stage(f"cell {key}: ours {ours['prod_loss']:.4f} vs ref "
              f"{ref['prod_loss']:.4f} (rel {rel:.4f})")

    # merge into an existing artifact so opt-in cells (PARITY_CELLS=...)
    # extend the matrix instead of clobbering the committed cells; the
    # r5 artifact seeds itself from the committed r4 matrix
    path = "docs/measurements/parity_matrix_r05.json"
    merged = dict(results)
    prior_path = path if os.path.exists(path) else \
        "docs/measurements/parity_matrix_r04.json"
    if os.path.exists(prior_path):
        with open(prior_path) as fh:
            prior = json.load(fh).get("cells", {})
        merged = {**prior, **results}
    out = {
        "budget": f"per-cell 'budget' field (default {budget_str})",
        "shared": "same seeded torch weights (converted), same "
                  "copy-synthesis target, same plant on both legs (our "
                  "C++ synth injected into the reference's speak/"
                  "speak_and_extract_tube_information; vtl_* cells: the "
                  "reference's own authentic VTL library, ours via "
                  "Paule(plant=VTLPlant()), VTL copy-synthesis target), "
                  "same DSP",
        "reference_code": "/root/reference/paule/paule.py:391 unmodified",
        "cells": merged,
        "all_parity_ok": bool(all(c["parity_ok"]
                                  for c in merged.values())),
    }
    os.makedirs("docs/measurements", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
