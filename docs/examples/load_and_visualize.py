"""Load pickled results and re-render (port of the reference's
docs/examples/load_and_visualize.py:10-21), including the manual f0 override
+ re-synthesis trick."""

import pickle

from paule_tpu import synth, visualize
from paule_tpu.ops.normalize import inv_normalize_cp

with open("results/target.pkl", "rb") as pfile:
    results = pickle.load(pfile)

visualize.visualize_results(results, "reloaded", "results")

# manual f0 override: pin the planned f0 channel and listen again
planned_cp = results.planned_cp.copy()
planned_cp[:, 19:20] = 110  # normalized-space f0 pin
sig, sr = synth.speak(inv_normalize_cp(planned_cp))
