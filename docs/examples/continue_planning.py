"""Resume planning from a previous run (port of the reference's
docs/examples/continue_planning.py:27-55): reload the saved predictive-model
parameters and pickled results, then re-plan starting from the previously
planned trajectory (``initial_cp=..., initialize_from=None``)."""

import pickle

import numpy as np

from paule_tpu.api import Paule

save_file = "results/target"

with open(f"{save_file}.pkl", "rb") as pfile:
    old_results = pickle.load(pfile)

pred_params = np.load(f"{save_file}_pred_model.npy", allow_pickle=True)[0]

paule_model = Paule(pred_model=pred_params, use_speech_classifier=True)

results = paule_model.plan_resynth(
    learning_rate_planning=0.01,
    learning_rate_learning=0.001,
    target_acoustic="target.wav",
    initial_cp=old_results.planned_cp,
    initialize_from=None,
    objective="acoustic_semvec",
    n_outer=4, n_inner=8,
    continue_learning=True,
    log_ii=1,
    log_semantics=True,
    n_batches=1, batch_size=8, n_epochs=2,
    verbose=True)

with open(f"{save_file}_continued.pkl", "wb") as pfile:
    pickle.dump(results, pfile)
