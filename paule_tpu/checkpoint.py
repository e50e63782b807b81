"""Checkpoint / resume.

The reference handles persistence at the example level with
``torch.save(model.state_dict())`` + pickled result namedtuples
(/root/reference/docs/examples/minimal_example.py:51-56,
/root/reference/docs/examples/continue_planning.py:27-45).  Here the same
capability is a first-class API: one file captures every model parameter
pytree, every optimizer state, the planning RNG and the continue-learning
replay buffer, so ``Paule.save_state`` + ``Paule.load_state`` resume
mid-experiment exactly.

Format: a gzip-free pickle of host (numpy) pytrees — the same trust model as
the reference's torch.save files.  All device arrays are fetched with a
single ``jax.device_get`` per tree.
"""

import pickle

import numpy as np
import jax


FORMAT_VERSION = 1


def to_host(tree):
    """Fetch a pytree of (possibly device) arrays to host numpy.

    Non-array leaves (bools, DataFrames, ...) pass through unchanged."""
    def conv(leaf):
        if isinstance(leaf, jax.Array):
            return np.asarray(jax.device_get(leaf))
        return leaf

    return jax.tree.map(
        conv, tree,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)))


def save_pytree(path, tree):
    with open(path, "wb") as fh:
        pickle.dump({"format": FORMAT_VERSION, "tree": to_host(tree)}, fh,
                    protocol=pickle.HIGHEST_PROTOCOL)


def load_pytree(path, dtype=None):
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    if not isinstance(payload, dict) or "tree" not in payload:
        raise ValueError(f"{path} is not a paule_tpu checkpoint")
    tree = payload["tree"]
    if dtype is not None:
        import jax.numpy as jnp

        tree = jax.tree.map(
            lambda a: jnp.asarray(a, dtype=dtype)
            if np.issubdtype(np.asarray(a).dtype, np.floating) else a, tree)
    return tree


def paule_state(model):
    """Collect the full resumable state of a :class:`paule_tpu.api.Paule`."""
    state = {
        "pred_params": model.pred_trainer.params,
        "pred_opt_state": model.pred_trainer.opt_state,
        "inv_params": model.inv_trainer.params,
        "inv_opt_state": model.inv_trainer.opt_state,
        "embedder_params": model.embedder_params,
        "cp_gen_params": model.cp_gen_params,
        "mel_gen_params": model.mel_gen_params,
        "use_speech_classifier": model.use_speech_classifier,
        "use_somatosensory_feedback": model.use_somatosensory_feedback,
        "smiling": model.smiling,
        "jax_rng": model._jax_rng,
    }
    if model.use_speech_classifier:
        state["speech_classifier_params"] = model.speech_classifier_params
    if model.use_somatosensory_feedback:
        state["cp_tube_params"] = model.tube_trainer.params
        state["cp_tube_opt_state"] = model.tube_trainer.opt_state
        state["tube_mel_params"] = model.tube_mel_trainer.params
        state["tube_mel_opt_state"] = model.tube_mel_trainer.opt_state
        state["tube_embedder_params"] = model.tube_embedder_params
    state["continue_data"] = (model.continue_data.data
                              if len(model.continue_data) > 0 else None)
    return state


def restore_paule_state(model, state, *, dtype=None):
    """Load a :func:`paule_state` dict back into a Paule instance."""
    import jax.numpy as jnp

    dtype = dtype or model.dtype

    def dev(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(a, dtype=dtype)
            if np.issubdtype(np.asarray(a).dtype, np.floating)
            else jnp.asarray(a), tree)

    model.pred_trainer.params = dev(state["pred_params"])
    model.pred_trainer.restore_opt_state(dev(state["pred_opt_state"]))
    model.inv_trainer.params = dev(state["inv_params"])
    model.inv_trainer.restore_opt_state(dev(state["inv_opt_state"]))
    model.embedder_params = dev(state["embedder_params"])
    model.cp_gen_params = dev(state["cp_gen_params"])
    model.mel_gen_params = dev(state["mel_gen_params"])
    if state.get("speech_classifier_params") is not None \
            and model.use_speech_classifier:
        model.speech_classifier_params = dev(
            state["speech_classifier_params"])
    if model.use_somatosensory_feedback and "cp_tube_params" in state:
        model.tube_trainer.params = dev(state["cp_tube_params"])
        model.tube_trainer.restore_opt_state(dev(state["cp_tube_opt_state"]))
        model.tube_mel_trainer.params = dev(state["tube_mel_params"])
        model.tube_mel_trainer.restore_opt_state(
            dev(state["tube_mel_opt_state"]))
        model.tube_embedder_params = dev(state["tube_embedder_params"])
    if "jax_rng" in state:
        model._jax_rng = jnp.asarray(np.asarray(state["jax_rng"]))
    if "continue_data" in state:
        model.continue_data.data = state["continue_data"]
    return model
