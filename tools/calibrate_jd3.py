"""Calibrated-speaker acoustic validation against the real VTL (VERDICT r3
item 6).

Executes the documented calibration recipe (docs/speakers.md,
docs/examples/calibrate_speaker.py) on the imported JD3 speaker and
validates it at the FORMANT level against the reference's native
VocalTractLab binary:

1. parse JD3 (synth/speaker_import.py), build a sustained-vowel cp
   trajectory per phone (constant tract = the JD3 ``<shape>``, constant
   glottis = the modal shape) — the SAME (T, 30) denormalized cp drives
   both synthesizers (their 19+11 param orderings are positionally
   identical);
2. synthesize each phone through the authentic VTL
   (synth/vtl_plant.VTLPlant) and measure F1/F2 by LPC
   (dsp/formants.lpc_formants);
3. import JD3 to our INI (anatomy-estimated base length), synthesize the
   same cps with OUR synthesizer, measure the same formants;
4. calibrate: ONE scalar — a 1-D search over ``base_length_cm`` around
   the anatomy estimate minimizing the mean |log F1 ratio| across the
   measured phone set (single-phone anchors proved unstable: they fit
   tract-shape error with a length scalar and push other phones through
   model nonlinearities) — then re-measure;
5. write ``paule_tpu/synth/speaker/jd3_calibrated.ini`` (committed) and
   the measured table to ``docs/measurements/jd3_formants_r04.json``.

Our tract model is functional (19 params -> 40-section areas), not VTL's
3-D spline anatomy (speaker_import.py:24-30), so per-phone formants match
in ORDERING and rough magnitude, not Hz-exactly; the table quantifies the
residual per phone.

Run: PYTHONPATH=. python tools/calibrate_jd3.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

JD3 = "/root/reference/paule/vocaltractlab_api/JD3.speaker"
PHONES = ["a", "e", "i", "o", "u", "@"]
T_FRAMES = 265  # 0.66 s sustained
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INI_OUT = os.path.join(REPO, "paule_tpu/synth/speaker/jd3_calibrated.ini")


def phone_cp(parsed, phone):
    """(T, 30) denormalized sustained-phone trajectory (constant rows)."""
    tract = [parsed["tract_shapes"][phone].get(pname, ne)
             for _, pname, _, _, ne in parsed["tract_params"]]
    gneutral = {r[1]: r[4] for r in parsed["glottis_params"]}
    modal = dict(gneutral)
    modal.update(parsed["glottis_shapes"].get(
        "modal", parsed["glottis_shapes"].get("default", {})))
    glottis = [modal[r[1]] for r in parsed["glottis_params"]]
    row = np.asarray(tract + glottis, dtype=np.float64)
    return np.tile(row, (T_FRAMES, 1))


def formants_of(speak, cp):
    sig, sr = speak(cp)
    # bandwidth gate 500 Hz (same on BOTH legs): our waveguide's mid
    # resonances are broader than VTL's (e.g. /u/ F2 bw ~440 vs <300);
    # the default 300 Hz gate would silently drop a present formant and
    # report the next pole up
    return [round(f, 1) for f in __import__(
        "paule_tpu.dsp.formants", fromlist=["lpc_formants"]).lpc_formants(
            sig, sr, n_formants=2, max_bandwidth_hz=500.0)]


def main():
    from paule_tpu import synth
    from paule_tpu.synth.speaker_import import (fit_source,
                                                fit_tract_affine,
                                                import_speaker,
                                                parse_vtl_speaker)
    from paule_tpu.synth.vtl_plant import VTLPlant, vtl_available

    if not vtl_available():
        print("SKIP: VTL library not available")
        return 1

    parsed = parse_vtl_speaker(JD3)
    cps = {ph: phone_cp(parsed, ph) for ph in PHONES}

    # --- VTL ground truth ---
    plant = VTLPlant()
    vtl = {ph: formants_of(plant.speak, cps[ph]) for ph in PHONES}
    print(f"[jd3] VTL formants: {vtl}", file=sys.stderr, flush=True)

    # --- ours, anatomy-estimated import ---
    tmp_ini = "/tmp/jd3_import.ini"
    import_speaker(JD3, tmp_ini, name="JD3")
    synth.initialize(tmp_ini)
    ours0 = {ph: formants_of(synth.speak, cps[ph]) for ph in PHONES}
    print(f"[jd3] ours (uncalibrated): {ours0}", file=sys.stderr, flush=True)

    # --- one-scalar calibration: 1-D search over base_length_cm around
    # the anatomy estimate, minimizing the mean |log F1 ratio| across ALL
    # measured phones.  (Anchoring on a single phone is unstable: a trial
    # F1('a') anchor halved the tract and wrecked every close vowel, and
    # a schwa anchor improved schwa/o/u but pushed 'a' through a model
    # nonlinearity.  The vowel-set objective is robust to any one phone's
    # pole-tracking jump.) ---
    with open(tmp_ini) as fh:
        base = next(float(l.split("=")[1]) for l in fh
                    if l.startswith("base_length_cm"))

    def f1_error(measured):
        errs = [abs(np.log(measured[ph][0] / vtl[ph][0]))
                for ph in PHONES if np.isfinite(measured[ph][0])]
        return float(np.mean(errs))

    candidates = {1.0: (ours0, f1_error(ours0))}
    for scale in (0.85, 0.93, 1.08, 1.18):
        import_speaker(JD3, "/tmp/jd3_cand.ini", name="JD3",
                       base_length_cm=round(base * scale, 2))
        synth.initialize("/tmp/jd3_cand.ini")
        meas = {ph: formants_of(synth.speak, cps[ph]) for ph in PHONES}
        candidates[scale] = (meas, f1_error(meas))
        print(f"[jd3] scale {scale}: mean|logF1err| "
              f"{candidates[scale][1]:.3f}", file=sys.stderr, flush=True)
    best_scale = min(candidates, key=lambda s: candidates[s][1])
    base_cal = base * best_scale

    # --- stage B: fitted tube map (F1 AND F2 — the formant SPACE).  The
    # functional geometric tract spans a far smaller area dynamic range
    # than VTL's 3-D anatomy (~0.3-4 vs 0.25-8 cm², measured in
    # docs/speakers.md), which compresses F2 no matter how the gains are
    # tuned (a [tract_map] coordinate descent moved the mean log-formant
    # error only 0.33 -> 0.31).  Instead the import now FITS the area
    # function itself: speaker_import.fit_tract_affine regresses
    # per-section log-area (+ length/extraction scalars) on the 19 tract
    # params against VTL's own vtlTractToTube over the shape inventory +
    # space-filling samples, embedded as the speaker's [tract_affine]
    # map (evaluated by model.cpp tract_to_tube_affine). ---
    fit = fit_tract_affine(parsed, plant.tract_to_tube, n_samples=2200,
                           seed=0, shape_weight=12,
                           emphasize_shapes=tuple(PHONES),
                           emphasize_weight=60)
    print(f"[jd3] tract_affine fit: {fit['diagnostics']}",
          file=sys.stderr, flush=True)
    import_speaker(JD3, INI_OUT, name="JD3-calibrated",
                   base_length_cm=round(base_cal, 2), tube_fit=fit)
    synth.initialize(INI_OUT)
    ours_pre_source = {ph: formants_of(synth.speak, cps[ph])
                       for ph in PHONES}
    print(f"[jd3] ours (tract_affine, pre-source) audio-LPC: "
          f"{ours_pre_source}", file=sys.stderr, flush=True)

    # --- stage C: glottal SOURCE calibration (VERDICT r5 #4).  The tube
    # map fixed the transfer function, but audio-LPC F1 still read
    # 13-36% low in r4: our kinematic source's steeper spectral tilt
    # biases the all-pole fit toward f0.  fit_source searches the
    # [source] section's derivative mix / skew offset against VTL's own
    # audio formants (F1 driven, F2 penalized so the tract gains are
    # preserved) with the SAME LPC estimator on both legs. ---
    vtl_f12 = {ph: tuple(vtl[ph]) for ph in PHONES}
    n_eval = [0]

    def measure(source):
        n_eval[0] += 1
        import_speaker(JD3, "/tmp/jd3_src.ini", name="JD3-cand",
                       base_length_cm=round(base_cal, 2), tube_fit=fit,
                       source=source)
        synth.initialize("/tmp/jd3_src.ini")
        return {ph: tuple(formants_of(synth.speak, cps[ph]))
                for ph in PHONES}

    src_fit = fit_source(measure, vtl_f12)
    print(f"[jd3] source fit ({n_eval[0]} evals): "
          f"deriv_mix={src_fit['deriv_mix']} "
          f"skew_offset={src_fit['skew_offset']} "
          f"aspiration_db={src_fit['aspiration_db']} "
          f"objective={src_fit['diagnostics']['objective']}",
          file=sys.stderr, flush=True)
    import_speaker(JD3, INI_OUT, name="JD3-calibrated",
                   base_length_cm=round(base_cal, 2), tube_fit=fit,
                   source=src_fit)
    synth.initialize(INI_OUT)
    ours = {ph: formants_of(synth.speak, cps[ph]) for ph in PHONES}
    # transfer-function peaks as the audio-LPC-independent validation
    # channel (LPC on synthesized audio is fragile around weak or merged
    # resonances; VTL's own vtlGetTransferFunction is not comparable —
    # it includes subglottal coupling — so TF-ours vs audio-LPC-VTL)
    from scipy.signal import find_peaks

    def tf_f12(tract_row):
        mag, _ = synth.get_transfer_function(tract_row, n_points=2048)
        freqs = np.arange(2048) * (44100.0 / 2.0) / 2048
        sel = freqs < 4000
        m = 20 * np.log10(np.maximum(mag[sel], 1e-12))
        pk, _props = find_peaks(m, prominence=0.5)
        f = [float(freqs[p]) for p in pk[:2]]
        while len(f) < 2:
            f.append(float("nan"))
        return [round(v, 1) for v in f]

    ours_tf = {ph: tf_f12(cps[ph][0, :19]) for ph in PHONES}
    print(f"[jd3] ours (calibrated, [tract_affine]) audio-LPC: {ours}",
          file=sys.stderr, flush=True)
    print(f"[jd3] ours TF peaks: {ours_tf}", file=sys.stderr, flush=True)
    synth.initialize()  # restore default

    table = {}
    for ph in PHONES:
        tf1, tf2 = ours_tf[ph]
        table[ph] = {
            "vtl_f1_hz": vtl[ph][0], "vtl_f2_hz": vtl[ph][1],
            "ours_f1_hz": ours[ph][0], "ours_f2_hz": ours[ph][1],
            "ours_tf_f1_hz": tf1, "ours_tf_f2_hz": tf2,
            "tf_f1_rel_diff": (round(abs(tf1 - vtl[ph][0]) / vtl[ph][0], 3)
                               if np.isfinite(tf1) else None),
            "tf_f2_rel_diff": (round(abs(tf2 - vtl[ph][1]) / vtl[ph][1], 3)
                               if np.isfinite(tf2) else None),
            "f1_rel_diff": round(abs(ours[ph][0] - vtl[ph][0])
                                 / vtl[ph][0], 3),
            "f2_rel_diff": (round(abs(ours[ph][1] - vtl[ph][1])
                                  / vtl[ph][1], 3)
                            if np.isfinite(ours[ph][1])
                            and np.isfinite(vtl[ph][1]) else None),
        }
    out = {
        "method": "sustained phones (constant JD3 shape + modal glottis, "
                  f"{T_FRAMES} frames), LPC formants (dsp/formants.py), "
                  "VTL = authentic libVocalTractLabApi.so via "
                  "synth/vtl_plant.py",
        "channels": "ours_f*_hz (audio-LPC, same estimator and 500 Hz "
                    "bandwidth gate on BOTH legs) is the authoritative "
                    "comparison; ours_tf_* are raw transfer-function "
                    "peaks at prominence 0.5 dB — they can surface weak "
                    "side resonances (e/i/u rows) and are reported for "
                    "source-independence, not as formant estimates",
        "base_length_estimated_cm": base,
        "base_length_calibrated_cm": round(base_cal, 2),
        "calibration": "stage A: 1-D search over base_length_cm in "
                       "[0.85, 1.18]x the anatomy estimate minimizing "
                       "mean |log F1 ratio| (geometric-fallback scalar); "
                       "stage B: [tract_affine] fitted tube map — "
                       "per-section log-area + length/extraction scalars "
                       "regressed on the 19 tract params against VTL's "
                       "own vtlTractToTube (speaker_import."
                       "fit_tract_affine, quadratic features, shape "
                       "inventory weighted 12x, 2200 samples); "
                       "stage C (r5): [source] glottal-source "
                       "calibration — derivative mix (spectral tilt) + "
                       "skew offset fitted against VTL audio formants "
                       "(speaker_import.fit_source; F1 driven, F2 "
                       "penalized at weight 0.3)",
        "candidate_scales_mean_log_f1_err": {
            str(s): round(e, 4) for s, (_, e) in
            sorted(candidates.items())},
        "chosen_scale": best_scale,
        "tract_affine_fit": fit["diagnostics"],
        "source_fit": {k: v for k, v in src_fit.items()},
        "uncalibrated_ours": ours0,
        "pre_source_ours": ours_pre_source,
        "phones": table,
        "ini": os.path.relpath(INI_OUT, REPO),
    }
    os.makedirs("docs/measurements", exist_ok=True)
    with open("docs/measurements/jd3_formants_r05.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
