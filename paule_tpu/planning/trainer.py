"""Continue-learning: online training of the proxy models on the audio the
synthesizer actually produced, plus the replay buffer and the same-size
batching strategy.

Mirrors the reference's training behavior
(/root/reference/paule/paule.py:1244-1454) with jitted optax train steps:

* predictive model: RMSE(pred_mel, produced_mel)
* inverse model: cp_trajectory_loss (pos + vel + acc + jerk RMSE)
* cp->tube and tube->mel models: RMSE
* same-size batching buckets samples by exact sequence length so most
  batches need no padding; leftovers are sorted and padded by repeating the
  last frame (loss is computed over the padded tensor, like the reference)
* the replay buffer caps at 1000 rows by random resampling
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..ops.padding import pad_batch


def create_epoch_batches(df_length, batch_size, shuffle=True,
                         same_size_batching=False, training_length_dict=None,
                         rng=random):
    """Batch indices for one epoch (reference paule.py:320-381)."""
    if same_size_batching and training_length_dict is None:
        raise ValueError(
            "Dictionary containing indices of samples with corresponding "
            "length needed for same_size_batching!")

    if same_size_batching:
        epoch = []
        leftovers = []
        for length in np.sort(list(training_length_dict.keys())):
            length_idxs = list(training_length_dict[length])
            rest = len(length_idxs) % batch_size
            rng.shuffle(length_idxs)
            epoch += [
                length_idxs[i * batch_size : (i + 1) * batch_size]
                for i in range(len(length_idxs) // batch_size)
            ]
            if rest > 0:
                leftovers += list(length_idxs[-rest:])
        leftovers = np.asarray(leftovers)
        rest = len(leftovers) % batch_size
        epoch += [
            leftovers[i * batch_size : (i + 1) * batch_size]
            for i in range(len(leftovers) // batch_size)
        ]
        if rest > 0:
            epoch += [leftovers[-rest:]]
        rng.shuffle(epoch)
        return epoch

    rest = df_length % batch_size
    idxs = list(range(df_length))
    if shuffle:
        rng.shuffle(idxs)
    if rest > 0:
        idxs += idxs[: batch_size - rest]  # rolling batching
    return [idxs[i * batch_size : (i + 1) * batch_size]
            for i in range(len(idxs) // batch_size)]


def build_length_dict(lens):
    """length -> indices-with-that-length map for same-size batching."""
    lens = np.asarray(lens)
    return {int(l): np.where(lens == l)[0] for l in np.unique(lens)}


class ModelTrainer:
    """Owns the optax optimizer state for one trainable model and exposes a
    jitted train step keyed by (model, loss kind)."""

    def __init__(self, model, params, *, loss="rmse", learning_rate=0.001):
        self.model = model
        self.params = params
        self.loss_kind = loss
        # the learning rate rides in the optimizer state so it can change
        # mid-session without touching the Adam moments (reference mutates
        # param_groups['lr'] and keeps moments, paule.py:472-478) and
        # without re-jitting the train step
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate)
        self.opt_state = self.optimizer.init(params)
        self._lr = learning_rate
        self._step = self._make_step()

    def set_learning_rate(self, lr):
        if lr is not None and lr != self._lr:
            self._lr = lr
            self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
                lr, dtype=self.opt_state.hyperparams["learning_rate"].dtype)

    def restore_opt_state(self, state):
        """Adopt a (checkpoint-restored) optimizer state.

        Migrates pre-inject_hyperparams checkpoints (plain adam chain
        states, no ``hyperparams`` field) by wrapping them with the
        trainer's current learning rate, and re-syncs the cached lr so a
        later ``set_learning_rate`` compares against the restored value."""
        if not hasattr(state, "hyperparams"):
            fresh = self.optimizer.init(self.params)
            state = fresh._replace(inner_state=state)
        self.opt_state = state
        self._lr = float(state.hyperparams["learning_rate"])

    def _make_step(self):
        model = self.model
        loss_kind = self.loss_kind
        optimizer = self.optimizer

        def loss_fn(p, batch_in, batch_out):
            y_hat = model.apply(p, batch_in)
            if loss_kind == "rmse":
                return L.rmse(y_hat, batch_out)
            elif loss_kind == "cp_trajectory":
                return L.cp_trajectory_loss(y_hat, batch_out)[0]
            raise ValueError(loss_kind)

        @jax.jit
        def train_step(params, opt_state, batch_in, batch_out):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch_in, batch_out)
            updates, opt_state = optimizer.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        @jax.jit
        def train_scan(params, opt_state, all_in, all_out, idx):
            """Run len(idx) sequential optimizer steps in ONE compiled
            program; batches gather on device (idx: (n_steps, batch))."""
            def step(carry, ib):
                p, s = carry
                bi = jnp.take(all_in, ib, axis=0)
                bo = jnp.take(all_out, ib, axis=0)
                loss, grads = jax.value_and_grad(loss_fn)(p, bi, bo)
                updates, s = optimizer.update(grads, s)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), idx)
            return params, opt_state, losses

        self._scan = train_scan
        return train_step

    def train_batch(self, batch_in, batch_out):
        """Run one train step; returns the loss as a *device* scalar so
        callers can defer the host sync (see :func:`train_epochs`)."""
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(batch_in),
            jnp.asarray(batch_out))
        return loss

    def train_scan(self, all_in, all_out, idx):
        """Run ``idx.shape[0]`` sequential steps as one compiled scan;
        returns per-step losses (device array)."""
        self.params, self.opt_state, losses = self._scan(
            self.params, self.opt_state, all_in, all_out, jnp.asarray(idx))
        return losses


def _deferred_fetch(tree, finalize):
    """Start non-blocking device->host copies on every leaf of ``tree`` and
    return a zero-arg thunk that materializes the host values and applies
    ``finalize``.  Lets a caller dispatch more device work (the next outer
    iteration's planning scan) before blocking on training losses."""
    for leaf in jax.tree.leaves(tree):
        try:
            leaf.copy_to_host_async()
        except AttributeError:  # backend without async host copies
            break
    return lambda: finalize(jax.device_get(tree))


def train_epochs(trainer, inps, tgts, lens_in, *, batch_size, n_epochs,
                 rng=random, dtype=np.float32, deferred=False,
                 exact_batch_only=False, progress=None):
    """Train for n_epochs with same-size batching; returns per-epoch mean
    losses.  ``inps``/``tgts`` are sequences (lists / pandas Series) of
    variable-length (T_i, C) arrays.

    Fast path: when every sample has the same length (the common case for
    continue-learning on one utterance's snapshots), ALL steps of all epochs
    compile into scans over on-device index gathers — contiguous runs of
    equal batch size become one dispatch each, instead of one dispatch (and
    one host round-trip) per batch.

    ``exact_batch_only`` drops the leftover (< batch_size) batches each
    epoch: with a few distinct sequence lengths this bounds the compiled
    (B, T) shapes to one per length — on a backend where each new shape
    costs a full XLA compile (TPU), leftover batches of a different size
    every epoch dominate wall-clock.  The shuffle re-draws leftover
    membership per epoch, so every sample still trains in most epochs
    (large-corpus offline pretraining; continue-learning keeps exact
    batches).  ``progress(epoch_idx)`` is called after each epoch's
    dispatches (no device sync)."""
    inps = list(inps)
    tgts = list(tgts)
    lens_in = np.asarray(lens_in)
    epoch_batches = _plan_epoch_batches(len(inps), lens_in, batch_size,
                                        n_epochs, rng)
    if exact_batch_only:
        epoch_batches = [[b for b in ep if len(b) == batch_size]
                         for ep in epoch_batches]

    same_len = (len(set(lens_in.tolist())) == 1
                and len({len(t_) for t_ in tgts}) == 1)
    if same_len:
        all_in = jnp.asarray(np.stack(inps).astype(dtype))
        all_out = jnp.asarray(np.stack(tgts).astype(dtype))
        return _train_epochs_same_len(trainer, all_in, all_out,
                                      epoch_batches, batch_size,
                                      deferred=deferred)

    device_losses = []  # per-epoch lists of device scalars; fetched once
    for e, batches in enumerate(epoch_batches):  # variable-length slow path
        losses = []
        for idxs in batches:
            b_in = pad_batch(lens_in[list(idxs)],
                             [inps[i] for i in idxs], dtype=dtype)
            b_out_seqs = [tgts[i] for i in idxs]
            b_out = pad_batch([len(s) for s in b_out_seqs], b_out_seqs,
                              dtype=dtype)
            losses.append(trainer.train_batch(b_in, b_out))
        device_losses.append(losses)
        if progress is not None:
            progress(e)
    fin = lambda host: [float(np.mean(ls)) for ls in host]
    if deferred:
        return _deferred_fetch(device_losses, fin)
    return fin(jax.device_get(device_losses))  # single sync point


def _plan_epoch_batches(n, lens_in, batch_size, n_epochs, rng):
    """The epoch batch plan shared by :func:`train_epochs` and
    :func:`train_epochs_device`.  ONE implementation on purpose: the two
    entry points are chosen at runtime (replay-mixed vs device-resident
    data) and must consume the rng stream bit-identically for
    reproducibility."""
    length_dict = build_length_dict(np.asarray(lens_in))
    return [
        create_epoch_batches(
            n, batch_size, shuffle=True, same_size_batching=True,
            training_length_dict=length_dict, rng=rng)
        for _ in range(n_epochs)
    ]


def _train_epochs_same_len(trainer, all_in, all_out, epoch_batches,
                           batch_size, deferred=False):
    """Same-length fast path on stacked (N, T, C) device arrays.

    Per epoch, the full-size batches form ONE fixed-shape scan (same
    compiled program every epoch); smaller leftover batches train as
    single steps (their shape is stable too), so the compile count is
    bounded by the number of distinct batch sizes — not by random run
    boundaries.  Within an epoch, full batches run before leftovers (a
    reordering of SGD steps; the epoch's batch order is random anyway)."""
    full_per_epoch = [[np.asarray(b, dtype=np.int32)
                       for b in ep if len(b) == batch_size]
                      for ep in epoch_batches]
    rest_per_epoch = [[list(b) for b in ep if len(b) != batch_size]
                      for ep in epoch_batches]
    if not any(rest_per_epoch):
        # no leftovers anywhere: ALL epochs fuse into ONE scan (the
        # common continue-learning shape — e.g. 24 samples in 3 batches
        # of 8 x 10 epochs = 30 steps, one dispatch); step order is
        # exactly the per-epoch order, so semantics are unchanged
        idx_all = np.concatenate([np.stack(f) for f in full_per_epoch])
        losses = trainer.train_scan(all_in, all_out, idx_all)
        splits = np.cumsum([len(f) for f in full_per_epoch])[:-1]
        fin = lambda host: [float(np.mean(ls)) for ls in
                            np.split(np.asarray(host), splits)]
        if deferred:
            return _deferred_fetch(losses, fin)
        return fin(jax.device_get(losses))
    epoch_parts = []  # per epoch: list of device loss arrays/scalars
    for full, rest in zip(full_per_epoch, rest_per_epoch):
        parts = []
        if full:
            parts.append(trainer.train_scan(
                all_in, all_out, np.stack(full)))
        for b in rest:
            parts.append(trainer.train_batch(
                jnp.take(all_in, jnp.asarray(b), axis=0),
                jnp.take(all_out, jnp.asarray(b), axis=0)))
        epoch_parts.append(parts)
    fin = lambda host: [float(np.mean(np.concatenate(
                            [np.atleast_1d(np.asarray(p)) for p in parts])))
                        for parts in host]
    if deferred:
        return _deferred_fetch(epoch_parts, fin)
    return fin(jax.device_get(epoch_parts))  # one sync point


def train_epochs_device(trainer, all_in, all_out, *, batch_size, n_epochs,
                        rng=random, deferred=False):
    """:func:`train_epochs` for data ALREADY stacked on device.

    Continue-learning's training pairs within one outer iteration are the
    planning scan's own snapshots and the batched metrics program's produced
    mels — both device-resident; training on them directly skips the ~MBs
    of host->device re-upload per outer iteration.  Consumes the rng stream
    exactly like :func:`train_epochs` on equal-length host data."""
    n = int(all_in.shape[0])
    epoch_batches = _plan_epoch_batches(
        n, np.full(n, int(all_in.shape[1])), batch_size, n_epochs, rng)
    return _train_epochs_same_len(trainer, all_in, all_out,
                                  epoch_batches, batch_size,
                                  deferred=deferred)


class ReplayBuffer:
    """Replay data for continue-learning, capped by random resampling
    (reference paule.py:277-282, 1442-1446).  Stored as a pandas DataFrame
    with the reference's column names."""

    LIMIT = 1000

    def __init__(self, data=None, rng=random):
        self.rng = rng
        self.data = data
        if self.data is not None and len(self.data) > self.LIMIT:
            sample = self.rng.sample(range(len(self.data)), self.LIMIT)
            self.data = self.data.iloc[sample].reset_index(drop=True)

    def __len__(self):
        return 0 if self.data is None else len(self.data)

    def append(self, produced_df):
        import pandas as pd

        if self.data is None:
            # Reference quirk kept deliberately
            # (/root/reference/paule/paule.py:1440): a buffer constructed
            # empty (``continue_data=None``) NEVER accumulates — produced
            # data is discarded, so there is no cross-call replay unless the
            # caller seeds ``Paule(continue_data=<DataFrame>)``.  Documented
            # in the Paule docstring.
            return
        self.data = pd.concat([self.data, produced_df]).reset_index(drop=True)
        if len(self.data) > self.LIMIT:
            sample = self.rng.sample(range(len(self.data)), self.LIMIT)
            self.data = self.data.iloc[sample].reset_index(drop=True)

    def sample(self, k):
        idxs = self.rng.sample(range(len(self.data)), k)
        return self.data.iloc[idxs].reset_index(drop=True)
