"""Device-mesh helpers.

The reference is strictly single-device (SURVEY.md §2 parallelism checklist:
no distributed anything).  The TPU-native framework scales two ways:

* **dp** — data parallelism over independent planning instances (a batch of
  utterances) and over continue-learning batches;
* **tp** — tensor parallelism over the LSTM gate dimension (4H) of the proxy
  models, useful for very wide models; XLA inserts the collectives.

Shardings ride the ICI of a single slice; nothing here ever needs DCN.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, *, dp=None, tp=None, devices=None):
    """Build a ('dp', 'tp') mesh over the available devices.

    With only ``n_devices`` given, tp defaults to 1 (pure data parallel) —
    the natural layout for batched planning."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = n, 1
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp * tp} != n_devices={n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def lstm_param_spec():
    """PartitionSpecs for one LSTM layer: shard the 4H gate axis over tp."""
    return {"w_ih": P(None, "tp"), "w_hh": P(None, "tp"), "b": P("tp")}


def shard_lstm_params(mesh, layers):
    """Place LSTM layer params with the gate axis sharded over tp."""
    spec = lstm_param_spec()
    return [
        {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
         for k, v in layer.items()}
        for layer in layers
    ]


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_batch(mesh, tree, axis=0):
    """Shard the leading (batch) axis of every leaf over dp."""
    def place(x):
        spec = [None] * x.ndim
        spec[axis] = "dp"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, tree)
