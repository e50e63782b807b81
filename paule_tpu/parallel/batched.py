"""Batched multi-utterance planning and sharded continue-learning.

The natural multi-chip extension of the workload (SURVEY.md §2): each chip
plans a different utterance (dp), optionally with the proxy-model gate
dimensions sharded over tp.  The planning scan vmaps the per-utterance
update — each utterance keeps its own Adam state — and the batch axis is
laid out over the mesh's dp axis so XLA keeps everything chip-local except
the (optional) tp collectives.

Host synthesis fans out over a :class:`paule_tpu.synth.SynthPool` — the C++
synthesizer is handle-based precisely so this scales with host threads.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax
from ..planning import engine


@functools.partial(
    jax.jit,
    static_argnames=("models_static", "n_steps", "objective",
                     "use_speech_classifier", "use_somatosensory",
                     "log_semantics", "constraints", "lr"))
def plan_segment_batched(params_dynamic, models_static, xx, opt_state,
                         target_mels, target_semvecs, rng, *, n_steps,
                         objective, use_speech_classifier, use_somatosensory,
                         log_semantics, constraints, lr):
    """Batched planning scan: ``xx (B, T, 30)``, ``target_mels (B, F, 60)``,
    ``target_semvecs (B, 300)``; every utterance keeps an independent loss
    and independent (elementwise) Adam moments.

    The models run NATIVELY batched — one fused LSTM kernel at batch B per
    step (``engine.criterion_batched``) instead of a vmapped per-utterance
    criterion, which lowered to B sequential B=1 recurrence chains and
    cost ~B x the single-utterance latency (r4 roofline finding).  The
    per-utterance losses reduce before the batch sum, so gradients and
    Adam updates are mathematically identical to B independent planners."""
    models = models_static._replace(**params_dynamic)
    opt = optax.adam(lr)
    xx_init = xx

    def loss_fn(x, step_rng):
        total_b, (subs, _pm, _ps, _pt) = engine.criterion_batched(
            models, x, target_mels, target_semvecs, objective=objective,
            use_speech_classifier=use_speech_classifier,
            use_somatosensory=use_somatosensory,
            log_semantics=log_semantics, rng=step_rng)
        return jnp.sum(total_b), subs

    def step(carry, step_rng):
        x, state = carry
        (_, subs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(x, step_rng)
        updates, state = opt.update(grads, state)
        x_new = engine.apply_constraints(
            optax.apply_updates(x, updates), xx_init, constraints)
        return (x_new, state), (subs, x)

    rngs = jax.random.split(rng, n_steps)
    (xx_out, opt_state), (subs, xx_pre) = jax.lax.scan(
        step, (xx, opt_state), rngs)
    return xx_out, opt_state, {"sub_losses": subs, "xx_pre": xx_pre}


def init_batched_opt_state(xx, lr):
    """Adam state over the whole (B, T, 30) batch.  Moments are
    elementwise, so this equals per-utterance states (the r3 vmapped
    layout) for every trajectory."""
    return optax.adam(lr).init(xx)


def _prepare_batch(paule_obj, target_mels, target_semvecs, mesh,
                   learning_rate_planning):
    """Shared setup for the batched planners: target prep, inverse-model
    init, dp sharding, per-utterance optimizer states."""
    from . import mesh as mesh_mod

    dtype = paule_obj.dtype
    target_mels = jnp.asarray(target_mels, dtype=dtype)
    b, f, _ = target_mels.shape

    if target_semvecs is None:
        target_semvecs = paule_obj._j_embed(
            paule_obj.embedder_params, target_mels, None)
    target_semvecs = jnp.asarray(target_semvecs, dtype=dtype)

    # initialize from the inverse model (batched)
    xx = jnp.clip(paule_obj._j_inv(paule_obj.inv_trainer.params,
                                   target_mels), -1.0, 1.0)

    if mesh is not None:
        xx = mesh_mod.shard_batch(mesh, xx)
        target_mels = mesh_mod.shard_batch(mesh, target_mels)
        target_semvecs = mesh_mod.shard_batch(mesh, target_semvecs)

    opt_state = init_batched_opt_state(xx, learning_rate_planning)
    return xx, opt_state, target_mels, target_semvecs


def _synth_one_safe(paule_obj, cp_norm):
    """Synthesize one normalized trajectory through ``paule_obj.plant``,
    honoring the model's ``synthesis_error`` policy: 'skip' substitutes
    silence so one diverged utterance cannot kill the whole batch."""
    try:
        return paule_obj._synthesize(cp_norm)
    except Exception as exc:  # noqa: BLE001
        if paule_obj.synthesis_error == "raise":
            raise
        print(f"WARNING: batch synthesis failed ({exc}); "
              "substituting silence")
        n_audio = max(0, cp_norm.shape[0] - 1) * 110
        tube = (np.zeros((cp_norm.shape[0], 10))
                if paule_obj.use_somatosensory_feedback else None)
        return np.zeros(n_audio), 44100, tube


def _synth_results(paule_obj, cps_norm):
    """Synthesize every trajectory in ``cps_norm (B, T, 30)`` through the
    model's plant (NOT the default pool — an injected plant, e.g. the
    authentic :class:`~paule_tpu.synth.vtl_plant.VTLPlant`, must drive
    this path too).  Batch-capable plants take one native crossing with
    per-item error codes; others fan out per utterance.  Both honor the
    ``synthesis_error`` policy.  Returns a list of ``(sig, sr, tube)``."""
    if paule_obj._plant_has_batch:
        return paule_obj._synthesize_batch(cps_norm)
    return list(paule_obj._executor.map(
        functools.partial(_synth_one_safe, paule_obj), cps_norm))


def plan_batch(paule_obj, target_mels, target_semvecs=None, *, mesh=None,
               n_steps=25, learning_rate_planning=0.01, objective="acoustic",
               log_semantics=False, synthesize=True):
    """Plan a batch of same-length utterances in parallel.

    ``target_mels``: (B, F, 60) normalized log-mels.  Returns a dict with the
    planned trajectories, per-step sub-losses, and (optionally) the
    synthesized audio of the final trajectories (host fan-out).
    """
    xx, opt_state, target_mels, target_semvecs = _prepare_batch(
        paule_obj, target_mels, target_semvecs, mesh,
        learning_rate_planning)
    bundle = paule_obj._bundle()
    params_dynamic, models_static = engine.split_bundle(bundle)

    xx, opt_state, logs = plan_segment_batched(
        params_dynamic, models_static, xx, opt_state, target_mels,
        target_semvecs, paule_obj._next_rng(), n_steps=n_steps,
        objective=objective,
        use_speech_classifier=paule_obj.use_speech_classifier,
        use_somatosensory=paule_obj.use_somatosensory_feedback,
        log_semantics=log_semantics,
        constraints=engine.Constraints(smiling=paule_obj.smiling),
        lr=learning_rate_planning)

    out = {
        "planned_cp": np.asarray(jax.device_get(xx), dtype=np.float64),
        "sub_losses": jax.tree.map(np.asarray,
                                   jax.device_get(logs["sub_losses"])),
    }
    if synthesize:
        results = _synth_results(paule_obj, out["planned_cp"])
        out["prod_sigs"] = [sig for sig, _sr, _tube in results]
    return out


def plan_batch_resynth(paule_obj, target_mels, target_semvecs=None, *,
                       mesh=None, n_outer=5, n_inner=25,
                       learning_rate_planning=0.01, objective="acoustic",
                       log_semantics=False, continue_learning=True,
                       continue_learning_tube=False,
                       n_epochs=2, batch_size=8, verbose=False):
    """Full batched planning loop: the data-parallel counterpart of
    ``Paule.plan_resynth`` for a corpus slice of same-length utterances.

    Structure per outer iteration (mirrors the single-utterance engine, with
    a coarser synthesis cadence chosen for scale — one synthesis per
    utterance per outer iteration instead of per inner step):

    1. one compiled batched scan of ``n_inner`` planning updates, the batch
       axis sharded over the mesh's dp axis (per-utterance Adam states);
    2. every utterance's current trajectory synthesizes concurrently on the
       host pool (with tube extraction for the somatosensory variant);
       produced mels/semvecs/speech-classifier/tube metrics come from the
       same jitted metrics program as ``plan_resynth``
       (``Paule._prod_metrics``), with per-utterance targets;
    3. (optional) continue-learning: the shared predictive model (and, with
       ``continue_learning_tube``, the cp->tube and tube->mel models) trains
       on ALL produced pairs of this iteration, batches sharded over dp.

    Returns a dict with planned trajectories, per-outer-iteration produced
    losses (n_outer, B) for every metric of the model's variant, per-step
    planned sub-losses, produced audio of the final trajectories, and the
    continue-learning loss curves.
    """
    from . import mesh as mesh_mod

    if n_outer < 1:
        raise ValueError("n_outer must be >= 1")

    dtype = paule_obj.dtype
    xx, opt_state, target_mels, target_semvecs = _prepare_batch(
        paule_obj, target_mels, target_semvecs, mesh,
        learning_rate_planning)
    b = int(target_mels.shape[0])
    cons = engine.Constraints(smiling=paule_obj.smiling)
    use_somato = paule_obj.use_somatosensory_feedback
    want_semvec = log_semantics or objective in ("semvec", "acoustic_semvec")

    curves = {}  # metric name -> list of per-outer (B,) arrays

    def log_curves(pm):
        for key in ("prod_loss", "prod_semvec_loss", "prod_sc_loss",
                    "prod_tube_loss", "prod_tube_mel_loss",
                    "prod_tube_semvec_loss"):
            if key in pm:
                curves.setdefault(key, []).append(
                    np.asarray(pm[key], dtype=np.float64))

    pred_model_loss = []
    tube_model_loss = []
    tube_mel_model_loss = []
    sub_losses_all = []
    sigs = None
    prod_mels_host = None

    def train_shared(trainer, all_in, all_out, loss_log):
        # batches keep the dp layout so gradients reduce over ICI; every
        # sample trains every epoch (leftovers included), reshuffled.
        # all_in/all_out may be device arrays (the scan's own trajectories,
        # the metrics program's produced mels) — rows gather on device then,
        # with no host re-upload
        on_device = isinstance(all_in, jax.Array)
        for _ in range(n_epochs):
            order = paule_obj._py_rng.sample(range(b), b)
            for start in range(0, b, batch_size):
                idx = order[start:start + batch_size]
                if on_device:
                    sel = jnp.asarray(np.asarray(idx, np.int32))
                    bi = jnp.take(all_in, sel, axis=0)
                    bo = jnp.take(all_out, sel, axis=0)
                else:
                    bi = jnp.asarray(all_in[idx], dtype=dtype)
                    bo = jnp.asarray(all_out[idx], dtype=dtype)
                if mesh is not None and len(idx) % mesh.shape["dp"] == 0:
                    bi = mesh_mod.shard_batch(mesh, bi)
                    bo = mesh_mod.shard_batch(mesh, bo)
                loss_log.append(trainer.train_batch(bi, bo))

    for ii_outer in range(n_outer):
        bundle = paule_obj._bundle()
        params_dynamic, models_static = engine.split_bundle(bundle)
        xx, opt_state, logs = plan_segment_batched(
            params_dynamic, models_static, xx, opt_state, target_mels,
            target_semvecs, paule_obj._next_rng(), n_steps=n_inner,
            objective=objective,
            use_speech_classifier=paule_obj.use_speech_classifier,
            use_somatosensory=use_somato,
            log_semantics=log_semantics,
            constraints=cons, lr=learning_rate_planning)
        sub_losses_all.append(jax.device_get(logs["sub_losses"]))

        cps = np.asarray(jax.device_get(xx), dtype=np.float64)

        host_dtype = np.float64 if dtype == jnp.float64 else np.float32
        if paule_obj._plant_has_batch:
            # the bucket's trajectories are same-length: ONE native
            # crossing for the whole batch + one stacked upload (same
            # path/error policy as Paule._synthesize_batch)
            results = paule_obj._synthesize_batch(cps)
            sig_devs = [jax.device_put(np.stack(
                [np.asarray(sig, dtype=host_dtype)
                 for sig, _sr, _tube in results]))]
        else:
            # per-utterance plant (e.g. injected VTLPlant): start each
            # signal's host->device upload as its synthesis finishes so
            # the transfer overlaps with the remaining utterances'
            # synthesis
            results, sig_devs = [], []
            for res in paule_obj._executor.map(
                    functools.partial(_synth_one_safe, paule_obj), cps):
                results.append(res)
                sig_devs.append(jax.device_put(
                    np.asarray(res[0], dtype=host_dtype)))
        sigs = [sig for sig, _sr, _tube in results]
        prod_tubes = (np.stack([tube for _s, _r, tube in results])
                      if use_somato else None)
        # sigs=None: the audio is already on device (sig_devs); the host
        # copies live on in the result's prod_sigs
        pm, pm_dev = paule_obj._prod_metrics(
            None, xx, prod_tubes, target_mels, target_semvecs,
            want_semvec, sig_devs=sig_devs, return_device=True)
        log_curves(pm)
        prod_mels_host = np.asarray(pm["prod_mel"], dtype=np.float64)
        if verbose:
            prod_losses = curves["prod_loss"][-1]
            print(f"outer {ii_outer}: prod loss "
                  f"mean {prod_losses.mean():.4f} "
                  f"max {prod_losses.max():.4f}")

        if continue_learning:
            xx_dev = jnp.asarray(xx, dtype=dtype)
            train_shared(paule_obj.pred_trainer, xx_dev,
                         pm_dev["prod_mel"], pred_model_loss)
            if continue_learning_tube and use_somato:
                train_shared(paule_obj.tube_trainer, xx_dev,
                             pm_dev["prod_tube"], tube_model_loss)
                train_shared(paule_obj.tube_mel_trainer, pm_dev["prod_tube"],
                             pm_dev["prod_mel"], tube_mel_model_loss)

    out = {
        "planned_cp": np.asarray(jax.device_get(xx), dtype=np.float64),
        "prod_sigs": sigs,
        "prod_mels": prod_mels_host,
        "prod_loss_curve": np.stack(curves["prod_loss"]),
        "sub_losses": sub_losses_all,
        "pred_model_loss": [float(l) for l in
                            jax.device_get(pred_model_loss)],
    }
    for key in ("prod_semvec_loss", "prod_sc_loss", "prod_tube_loss",
                "prod_tube_mel_loss", "prod_tube_semvec_loss"):
        if key in curves:
            out[f"{key}_curve"] = np.stack(curves[key])
    if use_somato:
        out["prod_tubes"] = prod_tubes
        if continue_learning_tube:
            out["tube_model_loss"] = [float(l) for l in
                                      jax.device_get(tube_model_loss)]
            out["tube_mel_model_loss"] = [
                float(l) for l in jax.device_get(tube_mel_model_loss)]
    return out
