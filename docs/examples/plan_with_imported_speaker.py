"""Import a VocalTractLab speaker with a FITTED tube map, then plan with it.

End-to-end tour of the r4 speaker-fidelity pipeline:

1. import the reference's JD3 XML speaker to our INI format, fitting a
   ``[tract_affine]`` tube map against the real VTL's own
   ``vtlTractToTube`` (so our synthesizer's area functions — and formant
   space — track VTL's; measured table in docs/speakers.md);
2. copy-synthesize a target utterance with the imported speaker;
3. plan against that target with the imported speaker as the plant
   (``Paule(speaker=...)``) and report the formants of the result.

Requires the reference checkout (JD3.speaker + libVocalTractLabApi.so)
for step 1; without it, fall back to the committed pre-fitted import
(``paule_tpu/synth/speaker/jd3_calibrated.ini``).

Run: python docs/examples/plan_with_imported_speaker.py
"""

import os

import numpy as np

from paule_tpu import synth
from paule_tpu.api import Paule
from paule_tpu.dsp.formants import lpc_formants
from paule_tpu.synth import speaker_import, vtl_plant

JD3_XML = "/root/reference/paule/vocaltractlab_api/JD3.speaker"
OUT_INI = "/tmp/jd3_fitted.ini"
COMMITTED = os.path.join(os.path.dirname(synth.__file__), "speaker",
                         "jd3_calibrated.ini")

# ---- 1. import + fit (or reuse the committed calibrated import) ----
if vtl_plant.vtl_available() and os.path.exists(JD3_XML):
    parsed = speaker_import.parse_vtl_speaker(JD3_XML)
    plant = vtl_plant.VTLPlant()
    fit = speaker_import.fit_tract_affine(
        parsed, plant.tract_to_tube, n_samples=2200, shape_weight=12)
    print("tract_affine fit:", fit["diagnostics"])
    speaker_import.import_speaker(JD3_XML, OUT_INI, name="JD3-fitted",
                                  tube_fit=fit)
    ini = OUT_INI
else:
    print("VTL not available - using the committed calibrated import")
    ini = COMMITTED

# ---- 2. copy-synthesis target: /a i/ through the imported phone table
# (segment file -> gestural interpolation -> cp trajectory, the same
# pipeline the reference drives through VTL's seg/ges files) ----
synth.initialize(ini)
with open("/tmp/ai.seg", "w") as fh:
    fh.write("name = a; duration_s = 0.30;\nname = i; duration_s = 0.30;\n")
cp = synth.seg_to_cps("/tmp/ai.seg")
sig, sr = synth.speak(cp)
print(f"target: {len(sig)/sr:.2f} s of /ai/ through {ini}")

# ---- 3. plan against it with the imported speaker as plant ----
model = Paule(seed=0, speaker=ini)
r = model.plan_resynth(
    target_acoustic=(sig, sr), objective="acoustic",
    initialize_from="acoustic", n_outer=4, n_inner=20, log_ii=5,
    continue_learning=True, n_epochs=3, n_batches=2, batch_size=4,
    verbose=False)
print(f"produced-mel loss: {r.prod_loss_steps[0]:.3f} -> "
      f"{r.prod_loss_steps[-1]:.3f}")

f_target = lpc_formants(sig, sr, n_formants=2, max_bandwidth_hz=500.0)
f_planned = lpc_formants(np.asarray(r.prod_sig), sr, n_formants=2,
                         max_bandwidth_hz=500.0)
print(f"formants target {np.round(f_target, 0)} / "
      f"planned {np.round(f_planned, 0)} Hz")
synth.initialize()  # restore default
