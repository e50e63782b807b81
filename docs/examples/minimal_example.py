"""Minimal planning example (port of the reference's
docs/examples/minimal_example.py:10-58).

Plans a cp trajectory for a target recording with the acoustic+semantic
objective, continue-learning the predictive model online, then stores the
model/optimizer state, pickles the results and renders all visualizations.
"""

import os
import pickle

import numpy as np

from paule_tpu import util, visualize
from paule_tpu.api import Paule

# If the reference's pretrained torch weights are available they are
# converted on the fly; otherwise the models start from random init.
pretrained = util.download_pretrained_weights()

paule_model = Paule(use_somatosensory_feedback=False,
                    use_speech_classifier=True,
                    pretrained_dir=pretrained)

# any wav file works; for a self-contained demo we synthesize a target with
# the articulatory synthesizer itself (copy synthesis)
target_acoustic = "target.wav"
if not os.path.exists(target_acoustic):
    from paule_tpu import synth
    from paule_tpu.dsp import audio

    seg = "target.seg"
    with open(seg, "w") as fh:
        fh.write("name = a; duration_s = 0.15;\n"
                 "name = l; duration_s = 0.10;\n"
                 "name = a; duration_s = 0.15;\n")
    cps = synth.seg_to_cps(seg)
    sig, sr = synth.speak(cps)
    audio.write(target_acoustic, sig, sr)

SAVE_DIR = "results"
os.makedirs(SAVE_DIR, exist_ok=True)
save_file = SAVE_DIR + "/" + os.path.basename(target_acoustic)[:-4]

results = paule_model.plan_resynth(
    learning_rate_planning=0.01,
    learning_rate_learning=0.001,
    target_acoustic=target_acoustic,
    initialize_from="acoustic",
    objective="acoustic_semvec",
    past_cp=None,
    n_outer=10, n_inner=25,
    continue_learning=True,
    add_training_data_pred=False,
    log_ii=1,
    log_semantics=True,
    n_batches=3, batch_size=8, n_epochs=10,
    log_gradients=False,
    plot=save_file, seed=None, verbose=True)

# save model parameters (a pytree of jnp arrays)
np.save(f"{save_file}_pred_model.npy",
        np.asarray([paule_model.pred_trainer.params], dtype=object),
        allow_pickle=True)

# save results without model and optimizer
with open(f"{save_file}.pkl", "wb") as pfile:
    pickle.dump(results, pfile)

visualize.visualize_results(results, os.path.basename(save_file), SAVE_DIR)
