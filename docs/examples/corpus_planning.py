"""Corpus planning experiment (the reference's gradient_planning.ipynb
workflow, /root/reference/paule/gradient_planning.ipynb): plan every
recording of a corpus, continue-learning the proxy models across
utterances, and aggregate per-utterance losses.

Layout expected under DATA_DIR: one subdirectory per label containing
``<name>_<label>.flac`` recordings (the reference's Common Voice / GECO
words layout).  The run is resume-safe: already-planned files are skipped
and the model state checkpoints every few utterances.
"""

import numpy as np

from paule_tpu.api import Paule
from paule_tpu import experiments

DATA_DIR = "corpus/"          # flac files, one subdir per label
SAVE_DIR = "corpus_results/"
VALID_PICKLE = None           # optional replay-buffer seed DataFrame pickle
VECTORS_PICKLE = None         # optional label -> semvec DataFrame pickle

continue_data = (experiments.load_continue_data(VALID_PICKLE)
                 if VALID_PICKLE else None)

paule_model = Paule(continue_data=continue_data)

# optional: resume model state from a previous corpus run
# paule_model.load_state(SAVE_DIR + "/checkpoint.pkl")

semvec_lookup = None
if VECTORS_PICKLE:
    import pandas as pd

    vectors = pd.read_pickle(VECTORS_PICKLE)

    def semvec_lookup(label):  # noqa: F811
        match = vectors[vectors.label == label]
        return np.asarray(match.vector.iloc[0]) if len(match) else None

files = experiments.discover_targets(DATA_DIR, save_dir=SAVE_DIR)
experiments.plan_corpus(
    paule_model, files, SAVE_DIR,
    semvec_lookup=semvec_lookup,
    plan_kwargs=dict(
        learning_rate_planning=0.01,
        learning_rate_learning=0.001,
        learning_rate_learning_inv=0.001,
        objective="acoustic_semvec",
        initialize_from="acoustic",
        n_outer=10, n_inner=25,
        continue_learning=True,
        continue_learning_inv=True,
        add_training_data_pred=False,
        add_training_data_inv=True,
        log_ii=1, log_semantics=True,
        n_batches=3, batch_size=8, n_epochs=10,
    ))

final = experiments.collect_results(SAVE_DIR)
print(final[["file", "label", "prod_loss", "prod_semvec_loss"]])
