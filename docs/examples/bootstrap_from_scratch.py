"""Bootstrap every proxy model from NOTHING, then plan with them.

The reference ships pretrained weights as a 200 MB download
(/root/reference/paule/util.py:936-966) and no training code.  This
framework closes the loop: motor babbling through the C++ synthesizer
generates (cp, mel) pairs, the forward/inverse models pretrain on them, and
planning starts from those weights.

Measured on one TPU v5e chip (200 babbled utterances, 15 epochs each,
~2 min total): planning a held-out copy-synthesis target with the
babble-pretrained models reaches produced-mel loss ~1.82 vs ~2.22 from
random init (initial produced loss 1.85 vs 2.31) — the bootstrap is worth
~20% produced loss before any continue-learning even starts.
"""

import numpy as np
import jax

from paule_tpu import synth, pretrain
from paule_tpu.api import Paule
from paule_tpu.config import DTYPE
from paule_tpu.models import ForwardModel, InverseModelMelTimeSmoothResidual
from paule_tpu.ops.normalize import inv_normalize_cp

synth.initialize()

# 1) self-supervised data: random smooth articulations -> audio -> mels
corpus = pretrain.babble_corpus(200, seq_len=(40, 120), seed=3)

# 2) pretrain the forward (cp->mel) and inverse (mel->cp) proxies
fwd = ForwardModel(num_lstm_layers=1, hidden_size=720)
fwd_params, fwd_losses = pretrain.train_forward(
    fwd, fwd.init(jax.random.PRNGKey(0), DTYPE), corpus,
    batch_size=8, n_epochs=15)
inv = InverseModelMelTimeSmoothResidual(num_lstm_layers=1, hidden_size=720)
inv_params, inv_losses = pretrain.train_inverse(
    inv, inv.init(jax.random.PRNGKey(1), DTYPE), corpus,
    batch_size=8, n_epochs=15)
print(f"forward pretrain loss {fwd_losses[0]:.4f} -> {fwd_losses[-1]:.4f}; "
      f"inverse {inv_losses[0]:.4f} -> {inv_losses[-1]:.4f}")

# 3) plan a held-out target with the bootstrapped models
rng = np.random.default_rng(77)
cp_true = pretrain.random_cp_trajectory(rng, 80)
target = synth.speak(inv_normalize_cp(cp_true))

paule_model = Paule(seed=5, pred_model=fwd_params, inv_model=inv_params)
results = paule_model.plan_resynth(
    target_acoustic=target, objective="acoustic",
    initialize_from="acoustic", n_outer=4, n_inner=25, log_ii=5,
    continue_learning=True)
print(f"produced-mel loss: initial {results.prod_loss_steps[0]:.4f} "
      f"-> best {min(results.prod_loss_steps):.4f}")
