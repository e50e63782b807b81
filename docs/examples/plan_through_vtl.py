"""Plan through the AUTHENTIC VocalTractLab synthesizer (plant injection).

The planner's synthesizer — the "plant" — is pluggable: any object with

* ``speak(cp_denorm) -> (audio, sr)``
* ``speak_and_extract_tube_information(cp_denorm) -> (audio, sr, tube_info)``

over denormalized ``(seq, 30)`` trajectories can drive planning
(behavioral contract: the reference's paule/util.py:175-249, 317-433).
The default is paule_tpu's own thread-pooled C++ synthesizer;
:class:`paule_tpu.synth.vtl_plant.VTLPlant` wraps a real
``libVocalTractLabApi.so`` so a planned trajectory is optimized against —
and finally rendered by — VocalTractLab itself.

Notes when using the VTL plant:

* VTL holds process-global state; every call serializes on a lock, so
  host synthesis is sequential (this dominates wall-clock: VTL renders
  roughly in real time).
* For copy synthesis, generate the target through the SAME plant (as
  below) so the target is reachable by the synthesizer being driven.
"""

import numpy as np

from paule_tpu.api import Paule
from paule_tpu.dsp.mel import librosa_melspec
from paule_tpu.ops.normalize import inv_normalize_cp
from paule_tpu.synth.vtl_plant import DEFAULT_LIB, VTLPlant, vtl_available

if not vtl_available():
    raise SystemExit(
        f"no VTL library at {DEFAULT_LIB} — point vtl_plant.VTLPlant at "
        "your libVocalTractLabApi.so / speaker file")

plant = VTLPlant()  # lib_path=..., speaker_path=... to override

# a VTL copy-synthesis target: something VTL can, by construction, produce
rng = np.random.default_rng(0)
cp_true = np.clip(rng.normal(0, 0.05, (201, 30)).cumsum(0) * 0.2, -1, 1)
sig, sr = plant.speak(inv_normalize_cp(cp_true))
n_mel = np.asarray(librosa_melspec(sig, sr)).shape[0]

p = Paule(seed=1, plant=plant)
results = p.plan_resynth(
    target_acoustic=(sig, float(sr)),
    objective="acoustic_semvec",
    initial_cp=np.zeros((2 * n_mel, 30)),
    initialize_from=None,
    n_outer=5, n_inner=25, log_ii=1,
    continue_learning=True,
    verbose=True)

print("final produced-mel loss:", float(results.prod_loss_steps[-1]))
# results.prod_sig is genuine VocalTractLab audio of the planned trajectory
