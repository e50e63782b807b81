"""Pretraining the proxy models from scratch.

The reference ships only externally-trained weights (a 200 MB download,
/root/reference/paule/util.py:936-966) and no training code beyond the
online continue-learning.  This module closes the loop: a user of this
framework can bootstrap every model from nothing.

* :func:`babble_corpus` — self-supervised data generation: random smooth cp
  trajectories ("motor babbling") synthesized by the C++ backend (fanned out
  over a :class:`paule_tpu.synth.SynthPool`) paired with their log-mels —
  exactly the (cp, mel) pairs the forward/inverse models learn from.
* :func:`train_forward` / :func:`train_inverse` — supervised training with
  the same jitted optax steps and same-size batching as continue-learning.
* :func:`train_embedder` — supervised mel→semvec regression from a labeled
  DataFrame (e.g. the reference's corpus pickles with ``vector`` columns).
* :func:`train_gan` — conditional WGAN-GP training for the semvec→cp and
  semvec→mel generators against the reference-architecture ``Critic``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .config import DTYPE
from .dsp.mel import librosa_melspec
from .ops.normalize import inv_normalize_cp, normalize_mel
from .planning.trainer import ModelTrainer, train_epochs


# ---------------------------------------------------------------------------
# data generation (motor babbling)
# ---------------------------------------------------------------------------

def random_cp_trajectory(rng, seq_len, *, walk_scale=0.05, smooth=8):
    """A random smooth normalized cp trajectory (seq_len, 30): a clipped
    random walk, boxcar-smoothed so velocities/jerks stay articulator-like."""
    steps = rng.normal(0.0, walk_scale, (seq_len + smooth, 30))
    walk = np.cumsum(steps, axis=0)
    kernel = np.ones(smooth) / smooth
    sm = np.stack([np.convolve(walk[:, c], kernel, mode="valid")
                   for c in range(walk.shape[1])], axis=1)[:seq_len]
    return np.clip(sm - sm.mean(0, keepdims=True), -1.0, 1.0)


def babble_corpus(n_utterances, *, seq_len=(40, 120), seed=0, pool=None,
                  n_workers=4):
    """Generate a (cp_norm, melspec_norm_synthesized) DataFrame by motor
    babbling through the synthesizer.  Sequence lengths are sampled even so
    the 2:1 cp↔mel contract holds."""
    import concurrent.futures as cf

    import pandas as pd

    from . import synth

    rng = np.random.default_rng(seed)
    lo, hi = seq_len if isinstance(seq_len, tuple) else (seq_len, seq_len)
    lens = [int(rng.integers(lo // 2, hi // 2 + 1)) * 2
            for _ in range(n_utterances)]
    cps = [random_cp_trajectory(rng, n) for n in lens]

    own_pool = pool is None
    if own_pool:
        pool = synth.SynthPool(size=n_workers)

    def synth_one(cp):
        sig, sr = pool.speak(inv_normalize_cp(cp))
        return normalize_mel(librosa_melspec(sig, sr))

    try:
        with cf.ThreadPoolExecutor(max_workers=n_workers) as ex:
            mels = list(ex.map(synth_one, cps))
    finally:
        if own_pool:
            pool.close()

    return pd.DataFrame({
        "cp_norm": cps,
        "melspec_norm_synthesized": mels,
        "vector": [None] * n_utterances,
        "segment_data": [False] * n_utterances,
    })


# ---------------------------------------------------------------------------
# supervised model training
# ---------------------------------------------------------------------------

def train_forward(model, params, corpus, *, batch_size=8, n_epochs=10,
                  learning_rate=1e-3, seed=0, dtype=None,
                  exact_batch_only=False, progress=None):
    """Train a cp→mel ForwardModel on a babble corpus; returns
    (params, per-epoch losses)."""
    trainer = ModelTrainer(model, params, loss="rmse",
                           learning_rate=learning_rate)
    import random as pyrandom

    losses = train_epochs(
        trainer, list(corpus["cp_norm"]),
        list(corpus["melspec_norm_synthesized"]),
        np.array([len(c) for c in corpus["cp_norm"]]),
        batch_size=batch_size, n_epochs=n_epochs,
        rng=pyrandom.Random(seed), dtype=dtype or np.dtype(DTYPE),
        exact_batch_only=exact_batch_only, progress=progress)
    return trainer.params, losses


def train_inverse(model, params, corpus, *, batch_size=8, n_epochs=10,
                  learning_rate=1e-3, seed=0, dtype=None,
                  exact_batch_only=False, progress=None):
    """Train a mel→cp InverseModel (cp-trajectory loss: position + velocity
    + acceleration + jerk, reference /root/reference/paule/util.py:640)."""
    trainer = ModelTrainer(model, params, loss="cp_trajectory",
                           learning_rate=learning_rate)
    import random as pyrandom

    losses = train_epochs(
        trainer, list(corpus["melspec_norm_synthesized"]),
        list(corpus["cp_norm"]),
        np.array([len(m) for m in corpus["melspec_norm_synthesized"]]),
        batch_size=batch_size, n_epochs=n_epochs,
        rng=pyrandom.Random(seed), dtype=dtype or np.dtype(DTYPE),
        exact_batch_only=exact_batch_only, progress=progress)
    return trainer.params, losses


def train_embedder(model, params, corpus, *, batch_size=8, n_epochs=10,
                   learning_rate=1e-3, seed=0, dtype=None,
                   input_column="melspec_norm_synthesized",
                   exact_batch_only=False, progress=None):
    """Train a mel→semvec EmbeddingModel on a DataFrame with ``vector``
    labels (mean-squared error to the 300-dim lexical embedding).

    ``input_column`` selects the input sequences — the tube→semvec
    variant trains on ``tube_norm`` features with the same loop."""
    from .ops.padding import pad_batch
    from .planning.trainer import build_length_dict, create_epoch_batches
    import random as pyrandom

    dtype = dtype or np.dtype(DTYPE)
    rng = pyrandom.Random(seed)
    mels = list(corpus[input_column])
    vecs = np.stack([np.asarray(v) for v in corpus["vector"]]).astype(dtype)
    lens = np.array([len(m) for m in mels])
    length_dict = build_length_dict(lens)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s, batch_mel, batch_len, batch_vec):
        def loss_fn(pp):
            pred = model.apply(pp, batch_mel, batch_len)
            return jnp.mean((pred - batch_vec) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    epoch_losses = []
    for e in range(n_epochs):
        batches = create_epoch_batches(
            len(mels), batch_size, shuffle=True, same_size_batching=True,
            training_length_dict=length_dict, rng=rng)
        if exact_batch_only:  # bound compiled (B, T) shapes (train_epochs)
            batches = [b for b in batches if len(b) == batch_size]
        losses = []
        for idxs in batches:
            idxs = list(idxs)
            b_mel = pad_batch(lens[idxs], [mels[i] for i in idxs],
                              dtype=dtype)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(b_mel),
                jnp.asarray(lens[idxs]), jnp.asarray(vecs[idxs]))
            losses.append(loss)
        epoch_losses.append(float(np.mean(jax.device_get(losses))))
        if progress is not None:
            progress(e)
    return params, epoch_losses


# ---------------------------------------------------------------------------
# conditional WGAN-GP for the semvec -> cp / mel generators
# ---------------------------------------------------------------------------

def train_gan(generator, gen_params, critic, critic_params, corpus, *,
              data_column="cp_norm", batch_size=8, n_epochs=10,
              n_critic=5, gp_weight=10.0, learning_rate=1e-4, seed=0,
              noise_size=100, exact_batch_only=False, progress=None):
    """Conditional WGAN-GP: the critic scores (trajectory, semvec) pairs,
    the generator maps (noise, length, semvec) -> trajectory.

    Batches bucket by exact sequence length (the Generator's upsampling
    chain is length-static per compilation).  Returns
    (gen_params, critic_params, per-epoch (critic_loss, gen_loss))."""
    from .ops.padding import pad_batch
    from .planning.trainer import build_length_dict, create_epoch_batches
    import random as pyrandom

    rng = pyrandom.Random(seed)
    key = jax.random.PRNGKey(seed)
    data = list(corpus[data_column])
    vecs = np.stack([np.asarray(v) for v in corpus["vector"]]).astype(
        np.dtype(DTYPE))
    lens = np.array([len(d) for d in data])
    length_dict = build_length_dict(lens)

    gen_opt = optax.adam(learning_rate, b1=0.5, b2=0.9)
    cri_opt = optax.adam(learning_rate, b1=0.5, b2=0.9)
    gen_state = gen_opt.init(gen_params)
    cri_state = cri_opt.init(critic_params)

    def critic_loss_fn(cp_, real, fake, vec, eps, length):
        real_score = critic.apply(cp_, real, length, vec)
        fake_score = critic.apply(cp_, fake, length, vec)
        mix = eps * real + (1.0 - eps) * fake

        def score_of(x):
            return jnp.sum(critic.apply(cp_, x, length, vec))

        grads = jax.grad(score_of)(mix)
        gnorm = jnp.sqrt(
            jnp.sum(grads ** 2, axis=(1, 2)) + 1e-12)
        gp = jnp.mean((gnorm - 1.0) ** 2)
        wdist = jnp.mean(fake_score) - jnp.mean(real_score)
        return wdist + gp_weight * gp

    def gen_loss_fn(gp_, cp_, noise, vec, length):
        fake, gp_stats = generator.apply(gp_, noise, length, vec,
                                         use_running_average=False,
                                         collect_stats=True)
        return -jnp.mean(critic.apply(cp_, fake, length, vec)), gp_stats

    def _adopt_bn_stats(gp_, gp_stats):
        """Copy the train-forward's refreshed batch-norm running stats into
        the (optimizer-updated) generator params — torch updates them
        in place on EVERY train-mode forward, so both the critic and the
        generator steps adopt them."""
        blocks = [dict(bp, bn=dict(
            bp["bn"],
            mean=jax.lax.stop_gradient(sp["bn"]["mean"]),
            var=jax.lax.stop_gradient(sp["bn"]["var"])))
            for bp, sp in zip(gp_["blocks"], gp_stats["blocks"])]
        return dict(gp_, blocks=blocks)

    import functools

    # jit per (batch_size, length) bucket; cached across epochs
    @jax.jit
    def critic_step(cp_, cs_, gp_, real, vec, noise, eps):
        length = real.shape[1]
        fake, gp_stats = generator.apply(gp_, noise, length, vec,
                                         use_running_average=False,
                                         collect_stats=True)
        fake = jax.lax.stop_gradient(fake)
        loss, grads = jax.value_and_grad(critic_loss_fn)(
            cp_, real, fake, vec, eps, length)
        updates, cs_ = cri_opt.update(grads, cs_)
        return (optax.apply_updates(cp_, updates), cs_, loss,
                _adopt_bn_stats(gp_, gp_stats))

    @functools.partial(jax.jit, static_argnames=("length",))
    def gen_step(gp_, gs_, cp_, noise, vec, *, length):
        (loss, gp_stats), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(gp_, cp_, noise, vec, length)
        updates, gs_ = gen_opt.update(grads, gs_)
        return _adopt_bn_stats(optax.apply_updates(gp_, updates),
                               gp_stats), gs_, loss

    epoch_losses = []
    it = 0
    for e in range(n_epochs):
        batches = create_epoch_batches(
            len(data), batch_size, shuffle=True, same_size_batching=True,
            training_length_dict=length_dict, rng=rng)
        if exact_batch_only:  # bound compiled (B, T) shapes (train_epochs)
            batches = [b for b in batches if len(b) == batch_size]
        c_losses, g_losses = [], []
        for idxs in batches:
            idxs = list(idxs)
            real = jnp.asarray(pad_batch(lens[idxs],
                                         [data[i] for i in idxs],
                                         dtype=np.dtype(DTYPE)))
            vec = jnp.asarray(vecs[idxs])
            b = real.shape[0]
            key, k1, k2 = jax.random.split(key, 3)
            noise = jax.random.normal(k1, (b, 1, noise_size), DTYPE)
            eps = jax.random.uniform(k2, (b, 1, 1), DTYPE)
            critic_params, cri_state, cl, gen_params = critic_step(
                critic_params, cri_state, gen_params, real, vec, noise, eps)
            c_losses.append(cl)
            it += 1
            if it % n_critic == 0:
                key, k3 = jax.random.split(key)
                noise = jax.random.normal(k3, (b, 1, noise_size), DTYPE)
                gen_params, gen_state, gl = gen_step(
                    gen_params, gen_state, critic_params, noise, vec,
                    length=int(real.shape[1]))
                g_losses.append(gl)
        epoch_losses.append((
            float(np.mean(jax.device_get(c_losses))) if c_losses else np.nan,
            float(np.mean(jax.device_get(g_losses))) if g_losses else np.nan))
        if progress is not None:
            progress(e)
    return gen_params, critic_params, epoch_losses
