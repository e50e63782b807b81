"""The planning engine: gradient descent on a cp trajectory through learned
proxy models, compiled as one jitted ``lax.scan``.

TPU-first redesign of the reference's inner loop
(/root/reference/paule/paule.py:910-1211): instead of one Python iteration
per optimizer step with eager tensors, a whole *segment* of ``log_ii`` steps
compiles into a single XLA program — forward, backward, Adam update and the
constraint projections all fuse on device.  The host only re-enters between
segments to synthesize the current snapshot (the C++ synthesizer) and to log
produced-audio losses, which is exactly the cadence the reference logs at.

The reference's 9 criterion closures ({acoustic, semvec, acoustic_semvec} x
{plain, speech-classifier, somatosensory},
/root/reference/paule/paule.py:602-776) collapse into one weighted loss
controlled by static flags; loss weights match
/root/reference/paule/paule.py:592-599.

Behavioral quirks reproduced deliberately (SURVEY.md §7 hard part 5):

* the snapshot synthesized at a logging step is the trajectory *before* that
  step's Adam update;
* after each update the trajectory is clamped to ±1.05, the smiling
  constraint pins LP=-1 / HY=1, and ``past_cp`` rows are restored;
* the (tube-)embedder runs in train mode (dropout active) for planning
  predictions and eval mode for produced-audio logging.

One deliberate repair: the reference's ``objective='acoustic'`` +
somatosensory criterion reads ``pred_tube_semvec`` which is never computed on
that path (a latent NameError at /root/reference/paule/paule.py:692); we
compute it and include the term as the code clearly intended.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L

# loss weights (reference /root/reference/paule/paule.py:592-599)
MEL_WEIGHT = 5.0
VELOCITY_WEIGHT = 80.0
JERK_WEIGHT = 400.0
SEMANTIC_WEIGHT = 10.0
SPEECH_CLASSIFIER_WEIGHT = 0.1
LOCAL_LINEAR_WEIGHT = 100_000.0
TUBE_MEL_WEIGHT = MEL_WEIGHT
TUBE_SEMANTIC_WEIGHT = SEMANTIC_WEIGHT

OBJECTIVES = ("acoustic", "semvec", "acoustic_semvec")

# reference module-level criterion aliases (/root/reference/paule/paule.py)
mse_loss = L.mse
rmse_loss = L.rmse
bce_loss = L.bce_with_logits
l2 = L.mse
l1 = L.l1


class SubLosses(NamedTuple):
    """Per-step sub-losses (weighted); inactive terms are zero."""
    total: jnp.ndarray
    mel_loss: jnp.ndarray
    semvec_loss: jnp.ndarray
    velocity_loss: jnp.ndarray
    jerk_loss: jnp.ndarray
    local_linear_loss: jnp.ndarray
    speech_classifier_loss: jnp.ndarray
    tube_mel_loss: jnp.ndarray
    tube_semvec_loss: jnp.ndarray


class ModelBundle(NamedTuple):
    """Static model definitions + their parameter pytrees used in planning."""
    pred_model: object
    pred_params: dict
    embedder: object
    embedder_params: dict
    speech_classifier: object = None
    speech_classifier_params: dict = None
    cp_tube_model: object = None
    cp_tube_params: dict = None
    tube_mel_model: object = None
    tube_mel_params: dict = None
    tube_embedder: object = None
    tube_embedder_params: dict = None


def criterion(models, xx, target_mel, target_semvec, *, objective,
              use_speech_classifier, use_somatosensory, log_semantics, rng):
    """Weighted planning loss.  ``xx`` is the (1, T, 30) trajectory leaf."""
    want_semvec = objective in ("semvec", "acoustic_semvec")

    pred_mel = models.pred_model.apply(models.pred_params, xx)
    mel_rmse = L.rmse(pred_mel, target_mel)

    vel_loss, jerk_loss = L.velocity_jerk_loss(xx, loss=L.mse)
    ll_loss = L.local_linear_loss(xx)

    zero = jnp.zeros((), dtype=xx.dtype)
    semvec_loss = zero
    pred_semvec = jnp.zeros(
        (xx.shape[0], target_semvec.shape[-1]), dtype=xx.dtype)
    if want_semvec or log_semantics:
        # embedder runs in train mode during planning (reference
        # paule.py:923); for the default mel embedder (dropout=0) this is a
        # no-op, kept for architectural parity.  lens=None -> static
        # last-step gather (the planning mel is always full-length)
        pred_semvec = models.embedder.apply(
            models.embedder_params, pred_mel, None,
            deterministic=False, rng=rng)
        semvec_loss = L.rmse(pred_semvec, target_semvec)

    sc_loss = zero
    if use_speech_classifier:
        logits = models.speech_classifier.apply(
            models.speech_classifier_params, pred_mel)
        sc_loss = L.bce_with_logits(logits, jnp.zeros_like(logits))

    tube_mel_loss = zero
    tube_semvec_loss = zero
    pred_tube = None
    if use_somatosensory:
        pred_tube = models.cp_tube_model.apply(models.cp_tube_params, xx)
        pred_tube_mel = models.tube_mel_model.apply(
            models.tube_mel_params, pred_tube)
        tube_mel_loss = L.rmse(pred_tube_mel, target_mel)
        rng_tube = jax.random.fold_in(rng, 1)
        pred_tube_semvec = models.tube_embedder.apply(
            models.tube_embedder_params, pred_tube, None,
            deterministic=False, rng=rng_tube)
        tube_semvec_loss = L.rmse(pred_tube_semvec, target_semvec)

    # weighting
    mel_w = MEL_WEIGHT * mel_rmse
    sem_w = SEMANTIC_WEIGHT * semvec_loss
    vel_w = VELOCITY_WEIGHT * vel_loss
    jerk_w = JERK_WEIGHT * jerk_loss
    ll_w = LOCAL_LINEAR_WEIGHT * ll_loss
    sc_w = SPEECH_CLASSIFIER_WEIGHT * sc_loss
    tmel_w = TUBE_MEL_WEIGHT * tube_mel_loss
    tsem_w = TUBE_SEMANTIC_WEIGHT * tube_semvec_loss

    total = vel_w + jerk_w + ll_w
    if objective in ("acoustic", "acoustic_semvec"):
        total = total + mel_w
    if objective in ("semvec", "acoustic_semvec"):
        total = total + sem_w
    if use_speech_classifier:
        total = total + sc_w
    if use_somatosensory:
        # tube_mel enters the total for EVERY objective (the reference's
        # semvec+somatosensory criterion also scores pred_tube_mel against
        # target_mel, /root/reference/paule/paule.py:744,755 — target_mel
        # always exists, generated from the semvec when not given)
        total = total + tsem_w + tmel_w

    subs = SubLosses(total, mel_w, sem_w, vel_w, jerk_w, ll_w, sc_w,
                     tmel_w, tsem_w)
    return total, (subs, pred_mel, pred_semvec, pred_tube)


def _bmean(x):
    """Mean over every axis except the leading batch axis -> (B,)."""
    return jnp.mean(x.reshape(x.shape[0], -1), axis=1)


def criterion_batched(models, xx, target_mel, target_semvec, *, objective,
                      use_speech_classifier, use_somatosensory,
                      log_semantics, rng):
    """Per-utterance weighted planning loss over a NATIVELY batched
    forward: ``xx (B, T, 30)`` runs through each model ONCE (one fused
    LSTM kernel at batch B instead of B sequential B=1 chains — the r3
    vmapped formulation cost ~B x the single-utterance latency), with
    every reduction per-utterance so the per-b losses and gradients equal
    B independent :func:`criterion` calls.  Returns ``(total_b (B,),
    (SubLosses of (B,) arrays, pred_mel, pred_semvec, pred_tube))``; the
    caller sums ``total_b`` for the gradient (cross-utterance terms are
    zero, so elementwise Adam updates stay per-utterance-exact)."""
    want_semvec = objective in ("semvec", "acoustic_semvec")

    pred_mel = models.pred_model.apply(models.pred_params, xx)
    mel_rmse = jnp.sqrt(_bmean((pred_mel - target_mel) ** 2))

    vel, _acc, jerk = L.vel_acc_jerk(xx, delta_t=1.0)
    vel_loss = _bmean(vel ** 2)
    jerk_loss = _bmean(jerk ** 2)
    ll_loss = _bmean(L.local_linear(xx) ** 2)

    zero = jnp.zeros((xx.shape[0],), dtype=xx.dtype)
    semvec_loss = zero
    pred_semvec = jnp.zeros(
        (xx.shape[0], target_semvec.shape[-1]), dtype=xx.dtype)
    if want_semvec or log_semantics:
        pred_semvec = models.embedder.apply(
            models.embedder_params, pred_mel, None,
            deterministic=False, rng=rng)
        semvec_loss = jnp.sqrt(_bmean((pred_semvec - target_semvec) ** 2))

    sc_loss = zero
    if use_speech_classifier:
        logits = models.speech_classifier.apply(
            models.speech_classifier_params, pred_mel)
        sc_loss = _bmean(
            jnp.maximum(logits, 0.0)
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    tube_mel_loss = zero
    tube_semvec_loss = zero
    pred_tube = None
    if use_somatosensory:
        pred_tube = models.cp_tube_model.apply(models.cp_tube_params, xx)
        pred_tube_mel = models.tube_mel_model.apply(
            models.tube_mel_params, pred_tube)
        tube_mel_loss = jnp.sqrt(
            _bmean((pred_tube_mel - target_mel) ** 2))
        rng_tube = jax.random.fold_in(rng, 1)
        pred_tube_semvec = models.tube_embedder.apply(
            models.tube_embedder_params, pred_tube, None,
            deterministic=False, rng=rng_tube)
        tube_semvec_loss = jnp.sqrt(
            _bmean((pred_tube_semvec - target_semvec) ** 2))

    mel_w = MEL_WEIGHT * mel_rmse
    sem_w = SEMANTIC_WEIGHT * semvec_loss
    vel_w = VELOCITY_WEIGHT * vel_loss
    jerk_w = JERK_WEIGHT * jerk_loss
    ll_w = LOCAL_LINEAR_WEIGHT * ll_loss
    sc_w = SPEECH_CLASSIFIER_WEIGHT * sc_loss
    tmel_w = TUBE_MEL_WEIGHT * tube_mel_loss
    tsem_w = TUBE_SEMANTIC_WEIGHT * tube_semvec_loss

    total = vel_w + jerk_w + ll_w
    if objective in ("acoustic", "acoustic_semvec"):
        total = total + mel_w
    if objective in ("semvec", "acoustic_semvec"):
        total = total + sem_w
    if use_speech_classifier:
        total = total + sc_w
    if use_somatosensory:
        total = total + tsem_w + tmel_w

    subs = SubLosses(total, mel_w, sem_w, vel_w, jerk_w, ll_w, sc_w,
                     tmel_w, tsem_w)
    return total, (subs, pred_mel, pred_semvec, pred_tube)


class Constraints(NamedTuple):
    """Post-update trajectory projections (reference paule.py:1201-1211)."""
    clamp: float = 1.05
    smiling: bool = False
    past_len: int = 0  # number of leading frames pinned to their initial value


def apply_constraints(xx, xx_init, cons: Constraints):
    xx = jnp.clip(xx, -cons.clamp, cons.clamp)
    if cons.smiling:
        # pin LP (idx 4) to -1 and HY (idx 1) to 1
        xx = xx.at[..., 4].set(-1.0).at[..., 1].set(1.0)
    if cons.past_len > 0:
        xx = xx.at[:, : cons.past_len, :].set(xx_init[:, : cons.past_len, :])
    return xx


def _segment_scan(params_dynamic, models_static, xx, opt_state, xx_init,
                  target_mel, target_semvec, rngs, *, objective,
                  use_speech_classifier, use_somatosensory, log_semantics,
                  constraints, lr, log_every=None):
    """Shared scan body of ``plan_segment`` / ``plan_segment_keys``.

    ``xx_init`` is the trajectory the constraint projections anchor to (the
    outer-iteration start); it equals ``xx`` for a whole-iteration segment
    but differs for a mid-iteration chunk.  ``rngs`` carries one key per
    step — chunking a segment is exact because the caller slices the same
    key array the single-segment path would have produced.
    """
    models = models_static._replace(**params_dynamic)
    opt = optax.adam(lr)

    # When the semvec is logged but NOT in the loss (objective='acoustic'
    # with log_semantics), the embedder forward inside the scan runs every
    # inner step while only the sliced log steps are kept (the reference
    # computes pred_semvec at logged steps only, paule.py:953-957).  With a
    # dropout-free embedder (the shipped default) its output is
    # rng-independent, so one batched apply on the sliced pred_mel logs
    # after the scan is bit-identical and ~log_every x cheaper.
    want_semvec_loss = objective in ("semvec", "acoustic_semvec")
    emb_post = (log_semantics and not want_semvec_loss
                and getattr(models.embedder, "dropout", 0.0) == 0.0)

    def loss_fn(x, step_rng):
        total, aux = criterion(
            models, x, target_mel, target_semvec, objective=objective,
            use_speech_classifier=use_speech_classifier,
            use_somatosensory=use_somatosensory,
            log_semantics=log_semantics and not emb_post, rng=step_rng)
        return total, aux

    def step(carry, step_rng):
        x, state = carry
        (_, (subs, pred_mel, pred_semvec, _pt)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(x, step_rng)
        updates, state = opt.update(grads, state)
        x_new = apply_constraints(optax.apply_updates(x, updates), xx_init,
                                  constraints)
        gext = (jnp.max(grads), jnp.min(grads))
        return (x_new, state), (subs, x, pred_mel, pred_semvec, grads, gext)

    (xx_out, opt_state), \
        (subs, xx_pre, pred_mels, pred_semvecs, grads, gext) = \
        jax.lax.scan(step, (xx, opt_state), rngs)
    logs = {"sub_losses": subs, "xx_pre": xx_pre, "pred_mel": pred_mels,
            "pred_semvec": pred_semvecs, "grads": grads,
            "grad_max": gext[0], "grad_min": gext[1]}
    if log_every is not None:
        n_logged = rngs.shape[0] // log_every
        idx = jnp.arange(n_logged) * log_every + (log_every - 1)
        logs = jax.tree.map(lambda a: a[idx], logs)
    if emb_post:
        pm = logs["pred_mel"]  # (L, B, T_mel, 60)
        flat = pm.reshape((pm.shape[0] * pm.shape[1],) + pm.shape[2:])
        sem = models.embedder.apply(models.embedder_params, flat, None,
                                    deterministic=True, rng=None)
        logs["pred_semvec"] = sem.reshape(
            (pm.shape[0], pm.shape[1]) + sem.shape[1:])
    return xx_out, opt_state, logs


@functools.partial(
    jax.jit,
    static_argnames=("models_static", "n_steps", "objective",
                     "use_speech_classifier", "use_somatosensory",
                     "log_semantics", "constraints", "lr", "log_every"))
def plan_segment(params_dynamic, models_static, xx, opt_state, target_mel,
                 target_semvec, rng, *, n_steps, objective,
                 use_speech_classifier, use_somatosensory, log_semantics,
                 constraints, lr, log_every=None):
    """Run ``n_steps`` planning updates as one compiled scan.

    Returns ``(xx, opt_state, logs)`` where ``logs`` holds per-step
    ``SubLosses`` plus the pre-update trajectory snapshots ``xx_pre``
    (snapshot semantics match the reference: the trajectory synthesized at a
    logging step excludes that step's update).

    With ``log_every=k`` the per-step log arrays are sliced *inside* the
    compiled program to the logged cadence (last step of each k-segment,
    i.e. step indices k-1, 2k-1, ...; trailing remainder steps unlogged) —
    avoiding host-side gather dispatches on the hot path.
    """
    rngs = jax.random.split(rng, n_steps)
    return _segment_scan(
        params_dynamic, models_static, xx, opt_state, xx, target_mel,
        target_semvec, rngs, objective=objective,
        use_speech_classifier=use_speech_classifier,
        use_somatosensory=use_somatosensory, log_semantics=log_semantics,
        constraints=constraints, lr=lr, log_every=log_every)


@functools.partial(
    jax.jit,
    static_argnames=("models_static", "objective", "use_speech_classifier",
                     "use_somatosensory", "log_semantics", "constraints",
                     "lr", "log_every"))
def plan_segment_keys(params_dynamic, models_static, xx, opt_state, xx_init,
                      target_mel, target_semvec, rngs, *, objective,
                      use_speech_classifier, use_somatosensory,
                      log_semantics, constraints, lr, log_every=None):
    """``plan_segment`` for one CHUNK of an outer iteration.

    Takes the per-step key array directly (``rngs``, shape ``(steps, ...)``)
    and the iteration-start trajectory ``xx_init`` the constraints anchor
    to.  Running a 25-step segment as e.g. five 5-step chunks with
    ``jax.random.split(rng, 25)`` sliced across the calls executes the
    exact same per-step computation as one ``plan_segment`` call — which is
    what lets the host overlap snapshot synthesis with the device still
    planning the later chunks (api.plan_resynth overlap mode).
    """
    return _segment_scan(
        params_dynamic, models_static, xx, opt_state, xx_init, target_mel,
        target_semvec, rngs, objective=objective,
        use_speech_classifier=use_speech_classifier,
        use_somatosensory=use_somatosensory, log_semantics=log_semantics,
        constraints=constraints, lr=lr, log_every=log_every)


def init_opt_state(xx, lr):
    return optax.adam(lr).init(xx)


def split_bundle(bundle: ModelBundle):
    """Split a ModelBundle into (dynamic params dict, static bundle) so the
    static part can be a jit static argument (model defs are hashable)."""
    dynamic = {}
    static_fields = {}
    for field, value in bundle._asdict().items():
        if field.endswith("_params"):
            dynamic[field] = value
            static_fields[field] = None
        else:
            static_fields[field] = value
    return dynamic, StaticBundle(**static_fields)


class StaticBundle(ModelBundle):
    """Hashable-by-identity ModelBundle for use as a jit static argument."""
    __slots__ = ()

    def __hash__(self):
        return hash(tuple(id(v) for v in self))

    def __eq__(self, other):
        return isinstance(other, StaticBundle) and all(
            a is b for a, b in zip(self, other))
