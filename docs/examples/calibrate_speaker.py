"""Calibrate a speaker's anatomy scalars to measured acoustic targets.

Recipe from docs/speakers.md: tube resonances scale as 1/length, so one
measured formant of the target speaker's neutral vowel pins
``base_length_cm``, and a comfortable-pitch measurement pins
``fold_length_cm``.  This script calibrates the builtin adult toward a
child-like target (F1 ≈ 650 Hz neutral, F0 ≈ 260 Hz), writes the
``.speaker`` file, and verifies by re-measuring the transfer function.

This is the SCALE calibration (vocal-tract size).  To also calibrate the
formant SPACE of a VocalTractLab import (per-vowel F2 structure), fit a
``[tract_affine]`` tube map against the real VTL's own tract model:
``python -m paule_tpu speaker-import JD3.speaker -o out.ini --fit-tube``
(or ``speaker_import.fit_tract_affine``; measured results in
docs/speakers.md and tools/calibrate_jd3.py).

Run: python docs/examples/calibrate_speaker.py
"""

import os
import tempfile

import numpy as np

from paule_tpu import synth

# ---- targets you measured from the speaker you want to approximate ----
TARGET_F1_HZ = 650.0   # first resonance of the neutral vowel
TARGET_F0_HZ = 260.0   # comfortable pitch

ADULT_FOLD_CM = 1.4    # builtin anchor: 1.4 cm folds <-> ~120 Hz
ADULT_F0_HZ = 120.0


def first_formant_hz(n_points=2048):
    """First peak of the neutral-tract transfer function, in Hz."""
    info = synth.get_param_info("tract")
    neutral = np.asarray(info["neutrals"])
    mag, _phase = synth.get_transfer_function(neutral, n_points=n_points)
    mag = np.asarray(mag)
    # peak pick above 150 Hz (skip the DC shoulder); n_points bins span
    # the Nyquist band
    freqs = np.arange(n_points) * (44100.0 / n_points / 2.0)  # bin -> Hz
    lo = np.searchsorted(freqs, 150.0)
    seg = mag[lo:]
    peaks = [i for i in range(1, len(seg) - 1)
             if seg[i] > seg[i - 1] and seg[i] >= seg[i + 1]]
    return float(freqs[lo + peaks[0]])


def main():
    synth.initialize()  # builtin adult
    f1_ours = first_formant_hz()
    base_cm = 16.0 * (f1_ours / TARGET_F1_HZ)
    fold_cm = ADULT_FOLD_CM * (ADULT_F0_HZ / TARGET_F0_HZ)
    print(f"adult neutral F1 = {f1_ours:.0f} Hz; target {TARGET_F1_HZ:.0f}")
    print(f"-> base_length_cm = {base_cm:.2f}, fold_length_cm = {fold_cm:.2f}")

    path = os.path.join(tempfile.gettempdir(), "calibrated.speaker")
    with open(path, "w") as fh:
        fh.write("[meta]\nname = calibrated\n\n[anatomy]\n"
                 f"base_length_cm = {base_cm:.3f}\n"
                 f"fold_length_cm = {fold_cm:.3f}\n"
                 f"nasal_length_cm = {11.4 * base_cm / 16.0:.3f}\n")

    synth.initialize(path)
    f1_new = first_formant_hz()
    print(f"calibrated neutral F1 = {f1_new:.0f} Hz "
          f"(target {TARGET_F1_HZ:.0f}, "
          f"off by {100 * abs(f1_new - TARGET_F1_HZ) / TARGET_F1_HZ:.1f}%)")

    # optional second iteration for the articulated-length offset
    if abs(f1_new - TARGET_F1_HZ) / TARGET_F1_HZ > 0.03:
        base_cm *= f1_new / TARGET_F1_HZ
        with open(path, "w") as fh:
            fh.write("[meta]\nname = calibrated\n\n[anatomy]\n"
                     f"base_length_cm = {base_cm:.3f}\n"
                     f"fold_length_cm = {fold_cm:.3f}\n"
                     f"nasal_length_cm = {11.4 * base_cm / 16.0:.3f}\n")
        synth.initialize(path)
        f1_new = first_formant_hz()
        print(f"after 2nd iteration: F1 = {f1_new:.0f} Hz")

    synth.initialize()  # restore the default speaker
    print(f"speaker file written to {path}")


if __name__ == "__main__":
    main()
