"""TPU-native extension example: plan a batch of utterances data-parallel
over a device mesh (one utterance per dp shard), with host synthesis fanned
out over the C++ synthesizer pool."""

import numpy as np

from paule_tpu.api import Paule
from paule_tpu.parallel import batched, make_mesh
from paule_tpu import synth
from paule_tpu.dsp.mel import librosa_melspec
from paule_tpu.ops.normalize import inv_normalize_cp, normalize_mel

paule_model = Paule()

# build a batch of same-length targets (here: copy-synthesis targets)
rng = np.random.default_rng(0)
targets = []
for b in range(8):
    cp = np.clip(rng.normal(0, 0.1, (64, 30)).cumsum(0) * 0.1, -1, 1)
    sig, sr = synth.speak(inv_normalize_cp(cp))
    mel = normalize_mel(librosa_melspec(sig, sr))
    targets.append(mel - mel.min())
target_mels = np.stack(targets)  # (8, 32, 60)

mesh = make_mesh()  # all available devices, pure dp

# one-shot scan (no synthesis feedback):
out = batched.plan_batch(paule_model, target_mels, mesh=mesh, n_steps=50,
                         objective="acoustic")
print("planned:", out["planned_cp"].shape)
print("final planned losses:", out["sub_losses"].total[-1])

# full loop: outer iterations with host synthesis fan-out + shared
# continue-learning on dp-sharded batches (the multi-chip counterpart of
# Paule.plan_resynth):
out = batched.plan_batch_resynth(paule_model, target_mels, mesh=mesh,
                                 n_outer=5, n_inner=25,
                                 objective="acoustic",
                                 continue_learning=True, verbose=True)
print("produced-loss curve:", out["prod_loss_curve"].mean(axis=1))

# variable-length corpora: bucket by exact mel length and batch per bucket
# (also available from the CLI: python -m paule_tpu corpus --batched 8 ...)
from paule_tpu.experiments import plan_corpus_batched  # noqa: E402

wavs = []  # mixed lengths, as (sig, sr) tuples or file paths
for n_cp in (48, 64, 48, 64, 64):
    cp = np.clip(rng.normal(0, 0.1, (n_cp, 30)).cumsum(0) * 0.1, -1, 1)
    wavs.append(synth.speak(inv_normalize_cp(cp)))
per_utt = plan_corpus_batched(paule_model, wavs, mesh=mesh, max_batch=8,
                              plan_kwargs=dict(n_outer=3, n_inner=25,
                                               objective="acoustic"))
print("per-utterance final losses:",
      [round(float(r["prod_loss_curve"][-1]), 3) for r in per_utt])
