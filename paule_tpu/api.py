"""The :class:`Paule` facade — keyword-compatible with the reference's
``paule.Paule`` / ``Paule.plan_resynth`` surface
(/root/reference/paule/paule.py:92-1550), built on the TPU-native stack:

* the planning inner loop compiles to one jitted ``lax.scan`` segment per
  ``log_ii`` steps (:mod:`paule_tpu.planning.engine`);
* synthesis + produced-audio metrics run on the host against the C++
  synthesizer at the logging cadence, optionally *asynchronously* on a
  thread pool so the device keeps planning while the host synthesizes
  (``synthesis_async=True``; results are drained at outer-loop boundaries,
  which is also where continue-learning needs them);
* continue-learning updates the proxy models with jitted optax steps
  (:mod:`paule_tpu.planning.trainer`).
"""

import concurrent.futures
import functools
import os
import random
import time

import numpy as np
import jax
import jax.numpy as jnp

from .config import DTYPE
from . import synth
from .dsp.targets import audio_target_to_mel
from .dsp.mel import librosa_melspec, melspec_44100
from .dsp.griffinlim import mel_to_sig
from .ops.normalize import (
    inv_normalize_cp, normalize_mel, normalize_tube)
from .ops import losses as L
from .models import (
    ForwardModel, InverseModelMelTimeSmoothResidual, EmbeddingModel,
    Generator, LinearClassifier)
from .planning import engine
from .planning.engine import (
    Constraints, ModelBundle, MEL_WEIGHT, SEMANTIC_WEIGHT,
    SPEECH_CLASSIFIER_WEIGHT, TUBE_MEL_WEIGHT, TUBE_SEMANTIC_WEIGHT)
from .planning import trainer as trainer_mod
from .planning.results import (
    BestSynthesisAcoustic, BestSynthesisSemantic, BestSynthesisSomatosensory,
    PlanningResults, PlanningResultsWithSomatosensory,
    PlanningResultsWithSpeechClassifier)

DIR = os.path.dirname(__file__)


def _to_np(x):
    if isinstance(x, jax.Array):
        x = jax.device_get(x)
    return np.asarray(x, dtype=np.float64)


class _DeferredMetrics:
    """Device-resident metrics whose host transfer is already in flight.

    Wraps the batched produced-audio metrics output dict: the constructor
    starts a non-blocking ``copy_to_host_async`` for every leaf, and
    :meth:`host` materializes (and caches) the numpy dict — so dispatching
    continue-learning between the two overlaps the metrics device compute
    AND the device->host transfer with the training programs."""

    def __init__(self, out):
        self._fetch = trainer_mod._deferred_fetch(out, lambda host: host)
        self._host = None

    def host(self):
        if self._host is None:
            self._host = self._fetch()
        return self._host


class Paule:
    """Keeps the state of the predictive/inverse/embedder models (and the
    optional speech-classifier or somatosensory models), the continue-
    learning replay data, and the best-synthesis trackers.

    ``continue_data`` seeds the replay buffer (a DataFrame with cp/mel
    columns, capped at 1000 rows).  NOTE the reference-faithful semantics
    (/root/reference/paule/paule.py:1440): with ``continue_data=None`` the
    buffer stays empty FOREVER — produced snapshots train the models within
    each ``plan_resynth`` call but are not accumulated across calls.
    Cross-call replay requires seeding ``continue_data`` with a (possibly
    tiny) DataFrame."""

    def __init__(self, *, pred_model=None, pred_optimizer=None,
                 inv_model=None, inv_optimizer=None, embedder=None,
                 cp_gen_model=None, mel_gen_model=None,
                 use_somatosensory_feedback=False, cp_tube_model=None,
                 tube_optimizer=None, tube_mel_model=None,
                 tube_mel_optimizer=None, tube_embedder=None,
                 continue_data=None, device=None, smiling=False,
                 use_speech_classifier=False, speech_classifier=None,
                 speech_classifier_optimizer=None,
                 pretrained_dir=None, seed=20200905, dtype=None,
                 synthesis_async=True, synthesis_error="raise",
                 physical_forward=False, speaker="default",
                 plan_overlap=True, plant=None):
        del device  # JAX manages device placement; kept for API parity
        del pred_optimizer, inv_optimizer, tube_optimizer  # created below
        del tube_mel_optimizer, speech_classifier_optimizer

        if use_somatosensory_feedback and use_speech_classifier:
            raise NotImplementedError(
                "at the moment you have to choose either to use "
                "`use_somatosenrosry_feedback=True` OR to use "
                "`use_speech_classifier=True` or none")

        self.dtype = dtype or DTYPE
        self.smiling = smiling
        self.use_speech_classifier = use_speech_classifier
        self.use_somatosensory_feedback = use_somatosensory_feedback
        self.synthesis_async = synthesis_async
        if synthesis_error not in ("raise", "skip"):
            raise ValueError("synthesis_error must be 'raise' or 'skip'")
        #: 'raise' propagates synthesizer errors (reference behavior);
        #: 'skip' substitutes silence for a failed snapshot and keeps
        #: planning (production isolation)
        self.synthesis_error = synthesis_error
        #: overlap host synthesis with device planning by running each
        #: outer iteration's scan as a few log_ii-aligned chunks: the
        #: first chunk's snapshots synthesize on the host while the device
        #: is still planning the later chunks.  Numerically EXACT vs the
        #: single-scan path (the chunked calls consume the same per-step
        #: key array — tests/test_api.py::test_plan_overlap_exact).
        #: True -> 2 chunks; an int -> that many chunks.  Each extra chunk
        #: costs one extra blocking device round-trip.  Default ON since
        #: r4: each chunk's snapshots synthesize in ONE native batch
        #: crossing (GIL released) while the device plans the later
        #: chunks — measured ~5% faster per outer even through this dev
        #: host's ~20 ms tunnel, and the synthesis phase drops below the
        #: planning phase (docs/measurements/hot_timing_r04.json); the
        #: win grows on direct-attached TPU hosts and in the
        #: somatosensory variant (tube extraction).  Set False for the
        #: single-scan path.
        self.plan_overlap = plan_overlap
        #: defer the produced-metrics host fetch past the continue-
        #: learning dispatch (hides the fetch behind training compute);
        #: attribute toggle for A/B measurement
        self.defer_metrics_fetch = True
        #: overlap mode: start non-blocking host copies of every planning
        #: chunk's logs at dispatch time, collapsing the per-chunk blocking
        #: round trips into ~one; attribute toggle for A/B measurement
        self.async_chunk_fetch = True
        self._overlap_chunks = (plan_overlap if isinstance(plan_overlap, int)
                                and not isinstance(plan_overlap, bool)
                                else 2)
        self._py_rng = random.Random(seed)
        self._jax_rng = jax.random.PRNGKey(seed)

        synth.initialize(speaker)

        def init_rng():
            self._jax_rng, sub = jax.random.split(self._jax_rng)
            return sub

        sd = self._resolve_weights(pretrained_dir)

        # PREDictive MODEL (cp -> mel); with ``physical_forward=True`` the
        # learned proxy is replaced by the differentiable spectral-domain
        # articulatory model (paule_tpu.spectral) — planning through the
        # physics, no pretrained weights needed
        self.physical_forward = physical_forward
        if physical_forward:
            from .spectral import SpectralForwardModel

            self.pred_model = SpectralForwardModel()
            self.pred_params = {}
        else:
            self.pred_model = ForwardModel(num_lstm_layers=1,
                                           hidden_size=720)
            self.pred_params = (pred_model if pred_model is not None else
                                sd.get("predictive") or
                                self.pred_model.init(init_rng(), self.dtype))

        # INVerse MODEL (mel -> cp)
        self.inv_model = InverseModelMelTimeSmoothResidual(
            num_lstm_layers=1, hidden_size=720)
        self.inv_params = (inv_model if inv_model is not None else
                           sd.get("inverse") or
                           self.inv_model.init(init_rng(), self.dtype))

        # EMBEDDER (mel -> semvec)
        self.embedder = EmbeddingModel(num_lstm_layers=2, hidden_size=720)
        self.embedder_params = (embedder if embedder is not None else
                                sd.get("embedder") or
                                self.embedder.init(init_rng(), self.dtype))

        # conditional GAN generators (semvec -> cp / mel)
        self.cp_gen_model = Generator()
        self.cp_gen_params = (cp_gen_model if cp_gen_model is not None else
                              sd.get("cp_gan") or
                              self.cp_gen_model.init(init_rng(), self.dtype))
        self.mel_gen_model = Generator(output_size=60)
        self.mel_gen_params = (mel_gen_model if mel_gen_model is not None else
                               sd.get("mel_gan") or
                               self.mel_gen_model.init(init_rng(), self.dtype))

        if self.use_speech_classifier:
            self.speech_classifier = LinearClassifier(input_dim=60, output_dim=1)
            self.speech_classifier_params = (
                speech_classifier if speech_classifier is not None else
                sd.get("speech_classifier") or
                self.speech_classifier.init(init_rng(), self.dtype))
        else:
            self.speech_classifier = None
            self.speech_classifier_params = None

        if self.use_somatosensory_feedback:
            self.cp_tube_model = ForwardModel(
                num_lstm_layers=1, hidden_size=360, output_size=10,
                input_size=30, apply_half_sequence=False)
            self.cp_tube_params = (
                cp_tube_model if cp_tube_model is not None else
                sd.get("cp_tube") or
                self.cp_tube_model.init(init_rng(), self.dtype))
            self.tube_mel_model = ForwardModel(
                num_lstm_layers=1, hidden_size=360, output_size=60,
                input_size=10, apply_half_sequence=True)
            self.tube_mel_params = (
                tube_mel_model if tube_mel_model is not None else
                sd.get("tube_mel") or
                self.tube_mel_model.init(init_rng(), self.dtype))
            self.tube_embedder = EmbeddingModel(
                input_size=10, num_lstm_layers=2, hidden_size=720,
                dropout=0.7, post_upsampling_size=0)
            self.tube_embedder_params = (
                tube_embedder if tube_embedder is not None else
                sd.get("tube_embedder") or
                self.tube_embedder.init(init_rng(), self.dtype))
        else:
            self.cp_tube_model = self.tube_mel_model = self.tube_embedder = None
            self.cp_tube_params = self.tube_mel_params = None
            self.tube_embedder_params = None

        # Injected / converted parameters arrive as host numpy arrays (often
        # float64 from torch conversion); committing them to device arrays in
        # the session dtype once keeps jitted calls from re-uploading the
        # full f64 pytrees through the (tunneled) host->device link per call.
        def _cast(tree):
            return None if tree is None else jax.tree.map(
                lambda a: jnp.asarray(a, dtype=self.dtype), tree)

        self.pred_params = _cast(self.pred_params)
        self.inv_params = _cast(self.inv_params)
        self.embedder_params = _cast(self.embedder_params)
        self.cp_gen_params = _cast(self.cp_gen_params)
        self.mel_gen_params = _cast(self.mel_gen_params)
        self.speech_classifier_params = _cast(self.speech_classifier_params)
        self.cp_tube_params = _cast(self.cp_tube_params)
        self.tube_mel_params = _cast(self.tube_mel_params)
        self.tube_embedder_params = _cast(self.tube_embedder_params)

        # trainers (keep optimizer state across plan_resynth calls, like the
        # reference's persistent torch optimizers)
        self.pred_trainer = trainer_mod.ModelTrainer(
            self.pred_model, self.pred_params, loss="rmse")
        self.inv_trainer = trainer_mod.ModelTrainer(
            self.inv_model, self.inv_params, loss="cp_trajectory")
        if self.use_somatosensory_feedback:
            self.tube_trainer = trainer_mod.ModelTrainer(
                self.cp_tube_model, self.cp_tube_params, loss="rmse")
            self.tube_mel_trainer = trainer_mod.ModelTrainer(
                self.tube_mel_model, self.tube_mel_params, loss="rmse")

        self.continue_data = trainer_mod.ReplayBuffer(
            continue_data, rng=self._py_rng)

        self.best_synthesis_acoustic = None
        self.best_synthesis_semantic = None
        if self.use_somatosensory_feedback:
            self.best_synthesis_somatosensory = None
        #: per-phase wall-clock split of the most recent plan_resynth
        self.last_planning_timings = None

        n_workers = min(8, os.cpu_count() or 2)
        self._synth_pool = synth.SynthPool(size=n_workers,
                                           speaker_path=speaker)
        #: the synthesizer the planner drives (the "plant"): any object with
        #: ``speak(cp_denorm) -> (audio, sr)`` and
        #: ``speak_and_extract_tube_information(cp_denorm) ->
        #: (audio, sr, tube_info)`` over denormalized ``(seq, 30)``
        #: trajectories (behavioral contract:
        #: /root/reference/paule/util.py:175-249, 317-433).  Default = our
        #: C++ SynthPool; inject
        #: :class:`paule_tpu.synth.vtl_plant.VTLPlant` to plan through the
        #: reference's authentic VocalTractLab binary.
        self.plant = plant if plant is not None else self._synth_pool
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=n_workers)

        # Persistent jitted apply wrappers.  Model ``apply`` called eagerly
        # dispatches an un-cached `lax.scan` (the LSTM), which re-compiles on
        # every call (~0.6 s each on TPU); routing every host-path model
        # evaluation through these wrappers makes compilation a one-time
        # per-shape cost.  Params are traced arguments, so continue-learning
        # updates never trigger re-compilation.
        self._j_pred = jax.jit(lambda p, x: self.pred_model.apply(p, x))
        self._j_inv = jax.jit(lambda p, x: self.inv_model.apply(p, x))
        self._j_embed = jax.jit(
            lambda p, x, lens: self.embedder.apply(
                p, x, lens, deterministic=True))
        if self.use_speech_classifier:
            self._j_speech_classifier = jax.jit(
                lambda p, x: self.speech_classifier.apply(p, x))
        if self.use_somatosensory_feedback:
            self._j_cp_tube = jax.jit(
                lambda p, x: self.cp_tube_model.apply(p, x))
            self._j_tube_mel = jax.jit(
                lambda p, x: self.tube_mel_model.apply(p, x))
            self._j_tube_embed = jax.jit(
                lambda p, x, lens: self.tube_embedder.apply(
                    p, x, lens, deterministic=True))
        self._j_prod_metrics = self._make_prod_metrics()

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _resolve_weights(self, pretrained_dir):
        """Resolve the initial model weights (paule_tpu.release docstring):

        * ``None`` (default): the in-repo trained release if present
          (zero network access — the TPU-native counterpart of the
          reference's 200 MB download, /root/reference/paule/util.py:936),
          else seeded random init with a one-time hint.
        * ``"random"``: explicit seeded random init.
        * a path: reference-layout torch checkpoint conversion.
        """
        if pretrained_dir == "random":
            return {}
        if pretrained_dir is None:
            from . import release

            if release.release_available():
                weights, _meta = release.load_release(dtype=self.dtype)
                return {k: jax.tree.map(
                    lambda a: jnp.asarray(a, dtype=self.dtype), tree)
                    for k, tree in weights.items()}
            release.print_fallback_hint_once()
            return {}
        return self._load_pretrained(pretrained_dir)

    def _load_pretrained(self, pretrained_dir):
        """Convert reference torch checkpoints if a pretrained dir is given.

        Expected layout mirrors the reference's ``pretrained_models/``
        (/root/reference/paule/paule.py:124-273); any missing file falls
        back to random initialization, but a nonexistent directory raises —
        the caller explicitly asked for pretrained weights, and silently
        serving random ones instead would be a misconfiguration trap."""
        if not pretrained_dir:
            return {}
        if not os.path.isdir(pretrained_dir):
            raise FileNotFoundError(
                f"pretrained_dir {pretrained_dir!r} does not exist")
        from .models import torch_convert as TC

        found = {}
        kinds = {
            "predictive": ("forward", "predictive"),
            "inverse": ("inverse", "inverse"),
            "embedder": ("embedder", "embedder"),
            "cp_gan": ("generator", "cp_gan"),
            "mel_gan": ("generator", "mel_gan"),
            "speech_classifier": ("linear_classifier", "speech_classifier"),
            "cp_tube": ("forward", "somatosensory"),
            "tube_mel": ("forward", "somatosensory"),
            "tube_embedder": ("embedder", "somatosensory"),
        }
        for key, (kind, subdir) in kinds.items():
            d = os.path.join(pretrained_dir, subdir)
            if not os.path.isdir(d):
                continue
            pts = sorted(f for f in os.listdir(d) if f.endswith(".pt"))
            match = None
            for f in pts:
                if key in ("cp_tube",) and "cp_to_tube" not in f:
                    continue
                if key in ("tube_mel",) and "tube_to_mel" not in f:
                    continue
                if key in ("tube_embedder",) and "tube_to_vector" not in f:
                    continue
                match = os.path.join(d, f)
                break
            if match:
                try:
                    params = TC.convert(kind, match)
                    found[key] = jax.tree.map(
                        lambda a: jnp.asarray(a, dtype=self.dtype), params)
                except Exception as exc:  # noqa: BLE001
                    print(f"could not convert {match}: {exc}")
        return found

    def _bundle(self):
        return ModelBundle(
            pred_model=self.pred_model, pred_params=self.pred_trainer.params,
            embedder=self.embedder, embedder_params=self.embedder_params,
            speech_classifier=self.speech_classifier,
            speech_classifier_params=self.speech_classifier_params,
            cp_tube_model=self.cp_tube_model,
            cp_tube_params=(self.tube_trainer.params
                            if self.use_somatosensory_feedback else None),
            tube_mel_model=self.tube_mel_model,
            tube_mel_params=(self.tube_mel_trainer.params
                             if self.use_somatosensory_feedback else None),
            tube_embedder=self.tube_embedder,
            tube_embedder_params=self.tube_embedder_params,
        )

    def _embed(self, mel, deterministic=True, rng=None):
        """mel (1, T, 60) -> semvec (1, 300); full-length mels use the
        static last-step gather (lens=None)."""
        mel = jnp.asarray(mel, dtype=self.dtype)
        if deterministic:
            return self._j_embed(self.embedder_params, mel, None)
        return self.embedder.apply(self.embedder_params, mel, None,
                                   deterministic=deterministic, rng=rng)

    def _tube_embed(self, tube, deterministic=True, rng=None):
        tube = jnp.asarray(tube, dtype=self.dtype)
        if deterministic:
            return self._j_tube_embed(self.tube_embedder_params, tube, None)
        return self.tube_embedder.apply(
            self.tube_embedder_params, tube, None,
            deterministic=deterministic, rng=rng)

    def _next_rng(self):
        self._jax_rng, sub = jax.random.split(self._jax_rng)
        return sub

    # ------------------------------------------------------------------
    # checkpoint / resume (reference persists state at the example level,
    # /root/reference/docs/examples/minimal_example.py:51-56)
    # ------------------------------------------------------------------

    def save_state(self, path):
        """Write all model params, optimizer states, the planning RNG and
        the replay buffer to one checkpoint file."""
        from . import checkpoint as CK

        CK.save_pytree(path, CK.paule_state(self))

    def load_state(self, path):
        """Restore a checkpoint written by :meth:`save_state`."""
        from . import checkpoint as CK

        CK.restore_paule_state(self, CK.load_pytree(path))
        return self

    def _make_prod_metrics(self):
        """Build the jitted batched produced-audio metrics program: all
        logged synthesis snapshots of one outer iteration are featurized,
        embedded and scored in a single compiled call (the per-step eager
        version cost one device round-trip per model per step)."""
        use_sc = self.use_speech_classifier
        use_somato = self.use_somatosensory_feedback
        embedder = self.embedder
        sc = self.speech_classifier
        cp_tube = self.cp_tube_model
        tube_mel = self.tube_mel_model
        tube_embedder = self.tube_embedder
        dtype = self.dtype

        @functools.partial(jax.jit, static_argnames=("want_semvec",))
        def fn(params, sigs, snaps, prod_tubes, target_mel, target_semvec,
               *, want_semvec):
            # targets may be a single row (1, ...) shared across all L
            # snapshots (plan_resynth logging), or per-row (L, ...) when the
            # rows are different utterances (parallel.batched planners)
            out = {}
            prod_mel = normalize_mel(jax.vmap(
                lambda s_: melspec_44100(s_, dtype=dtype))(sigs))
            out["prod_mel"] = prod_mel  # (L, F, 60)
            tm = jnp.broadcast_to(target_mel, prod_mel.shape)
            per_mel = jax.vmap(L.rmse)
            out["prod_loss"] = MEL_WEIGHT * per_mel(prod_mel, tm)
            if want_semvec:
                # lens=None -> static last-step gather (full-length mels)
                prod_semvec = embedder.apply(params["embedder"], prod_mel,
                                             None, deterministic=True)
                out["prod_semvec"] = prod_semvec
                ts = jnp.broadcast_to(target_semvec, prod_semvec.shape)
                out["prod_semvec_loss"] = SEMANTIC_WEIGHT * jax.vmap(
                    L.rmse)(prod_semvec, ts)
            if use_sc:
                logits = sc.apply(params["speech_classifier"], prod_mel)
                out["prod_sc_loss"] = SPEECH_CLASSIFIER_WEIGHT * jax.vmap(
                    lambda lg: L.bce_with_logits(
                        lg, jnp.zeros_like(lg)))(logits)
            if use_somato:
                pred_tube = cp_tube.apply(params["cp_tube"], snaps)
                prod_tube_mel = tube_mel.apply(params["tube_mel"], prod_tubes)
                pred_tube_mel = tube_mel.apply(params["tube_mel"], pred_tube)
                out["pred_tube"] = pred_tube
                out["prod_tube_mel"] = prod_tube_mel
                out["pred_tube_mel"] = pred_tube_mel
                out["prod_tube_loss"] = jax.vmap(L.rmse)(pred_tube,
                                                         prod_tubes)
                out["prod_tube_mel_loss"] = (
                    TUBE_MEL_WEIGHT * per_mel(prod_tube_mel, tm))
                if want_semvec:
                    pts = tube_embedder.apply(
                        params["tube_embedder"], prod_tubes, None,
                        deterministic=True)
                    out["prod_tube_semvec"] = pts
                    ts_t = jnp.broadcast_to(target_semvec, pts.shape)
                    out["prod_tube_semvec_loss"] = (
                        TUBE_SEMANTIC_WEIGHT * jax.vmap(L.rmse)(pts, ts_t))
            return out

        return fn

    def _prod_metrics(self, sigs, snaps_dev, prod_tubes, target_mel_dev,
                      target_semvec_dev, want_semvec, sig_devs=None,
                      return_device=False, deferred=False):
        """Run the batched produced-audio metrics; returns host numpy.

        ``sig_devs`` (optional): per-signal device arrays whose uploads were
        already started during synthesis; stacking them on device skips the
        blocking bulk transfer here.  With ``return_device=True`` also
        returns the device-resident ``{"prod_mel", "prod_tube"}`` arrays so
        continue-learning can train on them without re-uploading.

        With ``deferred=True`` the host transfer is only STARTED
        (``copy_to_host_async``) and a :class:`_DeferredMetrics` handle is
        returned in place of the host dict — the caller can dispatch more
        device work (continue-learning) before materializing, so the
        metrics fetch rides behind the training compute instead of
        blocking between the two programs."""
        params = {"embedder": self.embedder_params}
        if self.use_speech_classifier:
            params["speech_classifier"] = self.speech_classifier_params
        if self.use_somatosensory_feedback:
            params["cp_tube"] = self.tube_trainer.params
            params["tube_mel"] = self.tube_mel_trainer.params
            params["tube_embedder"] = self.tube_embedder_params
        host_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        if sig_devs:
            if sig_devs[0].ndim == 1:  # per-signal uploads
                sigs_dev = jnp.stack(sig_devs)
            elif len(sig_devs) == 1:  # one pre-stacked chunk
                sigs_dev = sig_devs[0]
            else:  # chunked (k, n) uploads
                sigs_dev = jnp.concatenate(sig_devs)
        else:
            sigs_dev = jnp.asarray(np.asarray(sigs, dtype=host_dtype))
        if prod_tubes is not None:
            tubes_dev = jnp.asarray(
                np.asarray(prod_tubes, dtype=host_dtype))
        else:
            tubes_dev = jnp.zeros((sigs_dev.shape[0], 2, 10),
                                  dtype=self.dtype)
        out = self._j_prod_metrics(params, sigs_dev, snaps_dev, tubes_dev,
                                   target_mel_dev, target_semvec_dev,
                                   want_semvec=want_semvec)
        if deferred:
            host = _DeferredMetrics(out)
        else:
            host = jax.device_get(out)
        if return_device:
            dev = {"prod_mel": out["prod_mel"],
                   "prod_tube": (tubes_dev if prod_tubes is not None
                                 else None)}
            return host, dev
        return host

    @property
    def _plant_has_batch(self):
        """Whether :meth:`_synthesize_batch` can run on this plant.

        Guards on the method the batch path will actually call: with
        somatosensory feedback that is ``speak_and_extract_batch``, not
        ``speak_batch`` — a plant implementing only the latter must take
        the per-trajectory path instead of crashing mid-plan."""
        method = ("speak_and_extract_batch"
                  if self.use_somatosensory_feedback else "speak_batch")
        return hasattr(self.plant, method)

    def _synthesize(self, cps_norm):
        """Denormalize + synthesize on the host; returns (sig, sr[, tube]).

        Non-finite trajectories (a diverged planning step) and non-finite
        audio raise ValueError so the ``synthesis_error`` policy applies —
        without the guard a single NaN snapshot would silently produce NaN
        mels and poison every model continue-learning trains."""
        cps = inv_normalize_cp(_to_np(cps_norm))
        if not np.isfinite(cps).all():
            raise ValueError("non-finite cp trajectory (planning diverged?)")
        if self.use_somatosensory_feedback:
            sig, sr, tube_info = \
                self.plant.speak_and_extract_tube_information(cps)
            area = synth.get_area_info_within_oral_cavity(
                tube_info["tube_length_cm"], tube_info["tube_area_cm2"])
            prod_tube = np.concatenate(
                [area,
                 tube_info["incisor_pos_cm"][:, None],
                 tube_info["tongue_tip_side_elevation"][:, None],
                 tube_info["velum_opening_cm2"][:, None]], axis=1)
            prod_tube = normalize_tube(prod_tube)
            if not np.isfinite(sig).all():
                raise ValueError("synthesizer produced non-finite audio")
            if not np.isfinite(prod_tube).all():
                raise ValueError("synthesizer produced non-finite tube data")
            return sig, sr, prod_tube
        sig, sr = self.plant.speak(cps)
        if not np.isfinite(sig).all():
            raise ValueError("synthesizer produced non-finite audio")
        return sig, sr, None

    def _synthesize_batch(self, snapshots):
        """All L logged snapshots in ONE native FFI crossing
        (``pts_synth_block_batch``) instead of L Python/ctypes/executor
        round-trips — the r3 profile showed ~4-6x per-snapshot overhead on
        the per-trajectory path.  Returns a list of ``(sig, sr, tube)``
        like L calls to :meth:`_synthesize`; per-item errors follow the
        ``synthesis_error`` policy (one diverged snapshot doesn't abort
        the batch in 'skip' mode)."""
        cps = inv_normalize_cp(np.asarray(snapshots, dtype=np.float64))
        if self.use_somatosensory_feedback:
            audio, sr, errors, tubes = \
                self.plant.speak_and_extract_batch(cps)
        else:
            audio, sr, errors = self.plant.speak_batch(cps)
            tubes = None
        out = []
        for i in range(cps.shape[0]):
            bad = errors[i] != 0 or not np.isfinite(audio[i]).all()
            prod_tube = None
            if not bad and tubes is not None:
                ti = tubes[i]
                area = synth.get_area_info_within_oral_cavity(
                    ti["tube_length_cm"], ti["tube_area_cm2"])
                prod_tube = normalize_tube(np.concatenate(
                    [area,
                     ti["incisor_pos_cm"][:, None],
                     ti["tongue_tip_side_elevation"][:, None],
                     ti["velum_opening_cm2"][:, None]], axis=1))
                bad = not np.isfinite(prod_tube).all()
            if bad:
                if self.synthesis_error == "raise":
                    raise ValueError(
                        f"synthesis of snapshot {i} failed "
                        f"(error code {int(errors[i])}; -1 = non-finite "
                        "trajectory, planning diverged?)")
                print(f"WARNING: synthesis of snapshot {i} failed "
                      f"(error code {int(errors[i])}); substituting "
                      "silence")
                silent_tube = (np.zeros((cps.shape[1], 10))
                               if self.use_somatosensory_feedback else None)
                out.append((np.zeros(audio.shape[1]), sr, silent_tube))
            else:
                out.append((audio[i], sr, prod_tube))
        return out

    def _prod_mel_of(self, sig, sr):
        mel = librosa_melspec(sig, sr)
        return normalize_mel(mel)

    # ------------------------------------------------------------------
    # the planning API
    # ------------------------------------------------------------------

    def create_epoch_batches(self, df_length, batch_size, shuffle=True,
                             same_size_batching=False,
                             sorted_training_length_keys=None,
                             training_length_dict=None):
        del sorted_training_length_keys
        return trainer_mod.create_epoch_batches(
            df_length, batch_size, shuffle=shuffle,
            same_size_batching=same_size_batching,
            training_length_dict=training_length_dict, rng=self._py_rng)

    def plan_resynth(self, *, learning_rate_planning=0.01,
                     learning_rate_learning=0.001,
                     learning_rate_learning_inv=None,
                     target_acoustic=None,
                     target_semvec=None,
                     target_seq_length=None,
                     initial_cp=None,
                     past_cp=None,
                     initialize_from="acoustic",
                     objective="acoustic",
                     n_outer=5, n_inner=24,
                     continue_learning=True,
                     continue_learning_inv=False,
                     continue_learning_tube=False,
                     add_training_data_pred=False,
                     add_training_data_inv=False,
                     n_batches=3, batch_size=8, n_epochs=10,
                     log_ii=1,
                     log_semantics=True,
                     log_gradients=False,
                     log_signals=False,
                     log_cps=False,
                     plot=False,
                     seed=None,
                     verbose=True):
        """Plan resynthesis cp trajectories (argument surface and semantics
        of /root/reference/paule/paule.py:391-463).

        ``verbose=True`` (the default, like the reference) prints each
        step's losses in the reference's order, which requires blocking
        produced-metrics fetches — the deferred-fetch pipelining
        (``defer_metrics_fetch``) silently falls back to the blocking
        order under verbose.  Pass ``verbose=False`` for the pipelined
        hot path; all returned result series are identical either way
        (docs/performance.md, "Verbose disables the deferral")."""
        if seed:
            self._py_rng.seed(seed)
            self._jax_rng = jax.random.PRNGKey(seed)

        if target_acoustic is None and target_semvec is None:
            raise ValueError(
                "Either target_acoustic or target_semvec has to be not None.")

        if objective not in engine.OBJECTIVES:
            raise ValueError(
                "objective has to be one of 'acoustic_semvec', 'acoustic' "
                "or 'semvec'")

        if learning_rate_learning:
            self.pred_trainer.set_learning_rate(learning_rate_learning)
        if learning_rate_learning_inv:
            self.inv_trainer.set_learning_rate(learning_rate_learning_inv)

        if log_ii is None:
            log_ii = n_inner
        if log_ii > n_inner:
            raise ValueError(
                "results can only be logged between first and last planning "
                "step")

        # ---------------- Phase A: target preparation ----------------
        target_sig = target_sr = None
        target_mel = None
        if isinstance(target_acoustic, str) or (
                isinstance(target_acoustic, (tuple, list))
                and len(target_acoustic) == 2):
            # audio target (path or (sig, sr)): the min-shift target-mel
            # convention is centralized in dsp.targets — same helper as
            # plan_iterative and plan_corpus_batched
            target_sig, target_sr, mel = audio_target_to_mel(target_acoustic)
            target_mel = mel[None]
            target_seq_length = target_mel.shape[1]
        elif target_acoustic is not None:
            target_mel = _to_np(target_acoustic)
            if target_mel.ndim == 2:
                target_mel = target_mel[None]
            target_seq_length = target_mel.shape[1]

        if target_acoustic is None and (target_seq_length is None
                                        or target_semvec is None):
            raise ValueError(
                "if target_acoustic is None you need to give a "
                "target_seq_length and a target_semvec")
        elif target_acoustic is None:
            noise = jax.random.normal(self._next_rng(), (1, 1, 100),
                                      dtype=self.dtype)
            semvec = jnp.asarray(_to_np(target_semvec).reshape(1, 300),
                                 dtype=self.dtype)
            target_mel = self.mel_gen_model.apply(
                self.mel_gen_params, noise, int(target_seq_length), semvec)
            target_mel = _to_np(target_mel)
            target_sig, target_sr = mel_to_sig(target_mel[0])

        target_mel_dev = jnp.asarray(target_mel, dtype=self.dtype)

        if target_semvec is None:
            target_semvec_dev = self._embed(target_mel_dev)
        else:
            target_semvec_dev = jnp.asarray(
                _to_np(target_semvec).reshape(1, 300), dtype=self.dtype)

        # ---------------- Phase B: cp initialization ----------------
        if initial_cp is None:
            if initialize_from == "acoustic":
                cp = self._j_inv(self.inv_trainer.params, target_mel_dev)
                initial_cp = np.clip(_to_np(cp)[0], -1.0, 1.0)
            elif initialize_from == "semvec":
                noise = jax.random.normal(self._next_rng(), (1, 1, 100),
                                          dtype=self.dtype)
                cp = self.cp_gen_model.apply(
                    self.cp_gen_params, noise, 2 * int(target_seq_length),
                    jnp.asarray(_to_np(target_semvec_dev).reshape(1, 300),
                                dtype=self.dtype))
                initial_cp = _to_np(cp)[0]
            else:
                raise ValueError(
                    "initialize_from has to be either 'acoustic' or 'semvec'")
        else:
            if initialize_from is not None:
                raise ValueError(
                    "one of initial_cp and initialize_from has to be None")
            initial_cp = _to_np(initial_cp)
            if initial_cp.shape[0] != target_mel.shape[1] * 2:
                raise ValueError(
                    f"initial_cp {initial_cp.shape[0]}, "
                    f"target_mel {target_mel.shape[1] * 2}")

        if past_cp is not None and past_cp.shape[0] % 2 != 0:
            raise ValueError(
                "past_cp have to be None or the sequence length has to be an "
                "even number")
        past_len = 0
        if past_cp is not None:
            past_cp = _to_np(past_cp)
            initial_cp = np.concatenate((past_cp, initial_cp), axis=0)
            past_len = past_cp.shape[0]

        xx = jnp.asarray(initial_cp[None], dtype=self.dtype)

        constraints = Constraints(clamp=1.05, smiling=self.smiling,
                                  past_len=past_len)

        # ---------------- logging containers ----------------
        logs = {k: [] for k in (
            "prod_loss_steps", "planned_loss_steps", "planned_mel_loss_steps",
            "vel_loss_steps", "jerk_loss_steps", "pred_semvec_loss_steps",
            "prod_semvec_loss_steps", "cp_steps", "pred_semvec_steps",
            "prod_semvec_steps", "grad_steps", "sig_steps", "prod_mel_steps",
            "pred_mel_steps", "pred_model_loss", "inv_model_loss")}
        if self.use_speech_classifier:
            logs["pred_speech_classifier_loss_steps"] = []
            logs["prod_speech_classifier_loss_steps"] = []
        if self.use_somatosensory_feedback:
            for k in ("prod_tube_loss_steps", "pred_tube_mel_loss_steps",
                      "prod_tube_mel_loss_steps", "pred_tube_semvec_loss_steps",
                      "prod_tube_semvec_loss_steps", "pred_tube_steps",
                      "prod_tube_steps", "prod_tube_mel_steps",
                      "pred_tube_mel_steps", "pred_tube_semvec_steps",
                      "prod_tube_semvec_steps", "tube_model_loss",
                      "tube_mel_model_loss"):
                logs[k] = []

        # ---------------- Phase C: initial baseline ----------------
        bundle = self._bundle()
        initial_pred_mel_dev = self._j_pred(bundle.pred_params, xx)
        initial_pred_semvec_dev = self._embed(initial_pred_mel_dev)

        xx_new_numpy = _to_np(xx[0])
        init_syn = self._synthesize(xx_new_numpy)
        initial_sig, initial_sr, initial_prod_tube = init_syn

        # stage all Phase C device values, then fetch them in ONE transfer
        init_fetch = {"pred_mel": initial_pred_mel_dev[0],
                      "pred_semvec": initial_pred_semvec_dev[0]}
        somato_init = {}
        if self.use_somatosensory_feedback:
            initial_pred_tube = self._j_cp_tube(self.tube_trainer.params, xx)
            initial_pred_tube_mel = self._j_tube_mel(
                self.tube_mel_trainer.params, initial_pred_tube)
            initial_pred_tube_semvec = self._tube_embed(initial_pred_tube)
            prod_tube_dev = jnp.asarray(initial_prod_tube[None],
                                        dtype=self.dtype)
            initial_prod_tube_mel = self._j_tube_mel(
                self.tube_mel_trainer.params, prod_tube_dev)
            initial_prod_tube_semvec = self._tube_embed(prod_tube_dev)
            init_fetch.update(
                pred_tube=initial_pred_tube[0],
                prod_tube_mel=initial_prod_tube_mel[0],
                pred_tube_mel=initial_pred_tube_mel[0],
                prod_tube_semvec=initial_prod_tube_semvec[0],
                pred_tube_semvec=initial_pred_tube_semvec[0])

        initial_prod_mel = self._prod_mel_of(initial_sig, initial_sr)

        # past_cp: prepend the produced prefix to the target mel
        if past_cp is not None:
            target_mel = np.concatenate(
                (initial_prod_mel[None, : past_len // 2, :], target_mel),
                axis=1)
            target_mel_dev = jnp.asarray(target_mel, dtype=self.dtype)

        init_fetch["prod_semvec"] = self._embed(
            jnp.asarray(initial_prod_mel[None], dtype=self.dtype))[0]
        init_host = {k: np.asarray(v, dtype=np.float64)
                     for k, v in jax.device_get(init_fetch).items()}
        if self.use_somatosensory_feedback:
            somato_init = {
                "initial_prod_tube": initial_prod_tube,
                "initial_pred_tube": init_host["pred_tube"],
                "initial_prod_tube_mel": init_host["prod_tube_mel"],
                "initial_pred_tube_mel": init_host["pred_tube_mel"],
                "initial_prod_tube_semvec": init_host["prod_tube_semvec"],
                "initial_pred_tube_semvec": init_host["pred_tube_semvec"],
            }
        initial_prod_semvec = init_host["prod_semvec"]
        initial_pred_mel = init_host["pred_mel"]
        initial_pred_semvec = init_host["pred_semvec"]

        self.best_synthesis_acoustic = BestSynthesisAcoustic(
            np.inf, initial_cp, initial_sig, initial_prod_mel,
            initial_pred_mel)
        self.best_synthesis_semantic = BestSynthesisSemantic(
            np.inf, initial_cp, initial_sig, initial_prod_semvec,
            initial_pred_semvec)
        if self.use_somatosensory_feedback:
            self.best_synthesis_somatosensory = BestSynthesisSomatosensory(
                np.inf, np.inf, np.inf, initial_cp, initial_sig,
                somato_init["initial_prod_tube"],
                somato_init["initial_pred_tube"],
                somato_init["initial_prod_tube_mel"],
                somato_init["initial_pred_tube_mel"],
                somato_init["initial_prod_tube_semvec"],
                somato_init["initial_pred_tube_semvec"])

        # planning state
        params_dynamic, models_static = engine.split_bundle(bundle)
        opt_state = engine.init_opt_state(xx, learning_rate_planning)
        n_segments = n_inner // log_ii

        sig = initial_sig
        sr = initial_sr
        prod_mel = initial_prod_mel
        pred_mel_last = initial_pred_mel

        start_perf = time.perf_counter()
        # per-phase wall-clock split (beyond the reference's single final
        # print): planning scan+log fetch / host synthesis / produced-audio
        # metrics / continue-learning.  Exposed as
        # ``self.last_planning_timings`` after the run.
        timings = {"planning": 0.0, "synthesis": 0.0, "metrics": 0.0,
                   "continue_learning": 0.0}
        # tqdm progress on the outer loop, like the reference
        # (/root/reference/paule/paule.py:894); falls back silently
        try:
            from tqdm import trange as _trange
            outer_iter = _trange(n_outer, desc="planning",
                                 disable=not verbose)
        except ImportError:  # pragma: no cover
            outer_iter = range(n_outer)
        # deferred per-iteration finalizers: each entry is the previous
        # iteration's (finish_metrics, continue-learning loss thunks); they
        # are flushed right AFTER the next planning scan is dispatched so
        # their blocking host transfers ride behind queued device compute
        # and the host->device round trips leave no device idle gap.
        deferred_flush = []

        def flush_deferred():
            """Returns the elapsed seconds so a caller inside another
            phase's timing window can shift its start marker."""
            _t_all = time.perf_counter()
            while deferred_flush:
                fm, clp = deferred_flush.pop(0)
                _t = time.perf_counter()
                fm()
                timings["metrics"] += time.perf_counter() - _t
                _t = time.perf_counter()
                for lst, thunk in clp:
                    lst.extend(thunk())
                timings["continue_learning"] += time.perf_counter() - _t
            return time.perf_counter() - _t_all

        for ii_outer in outer_iter:
            seg_logs_ii = {
                "cp": [], "prod_mel": [], "pred_mel": [], "pred_semvec": [],
                "prod_semvec": [], "prod_tube": [], "pred_tube": [],
                "prod_tube_mel": [], "pred_tube_mel": [],
                "pred_tube_semvec": [], "prod_tube_semvec": [],
            }
            # refresh dynamic params (may have been trained last outer iter)
            bundle = self._bundle()
            params_dynamic, models_static = engine.split_bundle(bundle)

            _t0 = time.perf_counter()
            # logged steps: the last step of each log_ii-segment; remainder
            # steps (n_inner % log_ii) run but are never logged, like the
            # reference (slicing happens inside the compiled program)
            want_semvec = (objective in ("semvec", "acoustic_semvec")
                           or log_semantics)

            def _fetch_of(seg_out):
                f = {"subs": seg_out["sub_losses"],
                     "xx_pre": seg_out["xx_pre"][:, 0],   # (L, T, 30)
                     "pred_mel": seg_out["pred_mel"][:, 0]}
                if want_semvec:
                    f["pred_semvec"] = seg_out["pred_semvec"][:, 0]
                if verbose:
                    f["grad_max"] = seg_out["grad_max"]
                    f["grad_min"] = seg_out["grad_min"]
                if log_gradients:
                    f["grads"] = seg_out["grads"]
                return f

            overlap = (self.plan_overlap and self.synthesis_async
                       and n_segments > 1)
            synth_futures = None
            if overlap:
                # ---- chunked scan dispatch: synthesis overlaps planning --
                # A handful of log_ii-aligned chunks queue back to back on
                # the device (dispatch is async); the host fetches each
                # chunk's snapshots as that chunk completes and starts
                # synthesizing them while the device is still planning the
                # later chunks.  EXACT vs the single-scan path: the chunks
                # consume slices of the same per-step key array
                # plan_segment would split internally, and the constraint
                # projections anchor to the same iteration-start
                # trajectory.
                all_rngs = jax.random.split(self._next_rng(), n_inner)
                xx_start = xx
                n_chunks = max(2, self._overlap_chunks)
                spc = max(1, -(-n_segments // n_chunks)) * log_ii
                chunk_outs = []
                c0 = 0
                while c0 < n_inner:
                    c1 = min(c0 + spc, n_inner)
                    if n_inner - c1 < log_ii:
                        c1 = n_inner  # absorb the unlogged remainder
                    xx, opt_state, seg_out = engine.plan_segment_keys(
                        params_dynamic, models_static, xx, opt_state,
                        xx_start, target_mel_dev, target_semvec_dev,
                        all_rngs[c0:c1], objective=objective,
                        use_speech_classifier=self.use_speech_classifier,
                        use_somatosensory=self.use_somatosensory_feedback,
                        log_semantics=log_semantics,
                        constraints=constraints,
                        lr=learning_rate_planning, log_every=log_ii)
                    chunk_outs.append(seg_out)
                    c0 = c1
                # start non-blocking host copies of EVERY chunk's logs up
                # front: each copy fires as its chunk completes on device,
                # so the in-order collects below pay ~one tunnel round
                # trip total instead of one (~28 ms) per chunk
                fetch_trees = [_fetch_of(so) for so in chunk_outs]
                if self.async_chunk_fetch:
                    for ft in fetch_trees:
                        for leaf in jax.tree.leaves(ft):
                            try:
                                leaf.copy_to_host_async()
                            except AttributeError:  # pragma: no cover
                                break
                # previous iteration's fetches, now queued behind the
                # dispatched planning chunks
                _t0 += flush_deferred()
                snaps_dev = jnp.concatenate(
                    [so["xx_pre"][:, 0] for so in chunk_outs])
                synth_futures = []
                host_chunks = []
                snap64_chunks = []
                for ft in fetch_trees:
                    hc = jax.device_get(ft)
                    rows = np.asarray(hc.pop("xx_pre"), dtype=np.float64)
                    snap64_chunks.append(rows)
                    if self._plant_has_batch:
                        # one native crossing per chunk, overlapped with
                        # the later chunks' device planning (the C ABI
                        # releases the GIL for the whole batch)
                        fut = self._executor.submit(
                            self._synthesize_batch, rows)
                        synth_futures.extend(
                            functools.partial(
                                lambda f, j: f.result()[j], fut, j)
                            for j in range(len(rows)))
                    else:
                        synth_futures.extend(
                            self._executor.submit(self._synthesize,
                                                  row).result
                            for row in rows)
                    host_chunks.append(hc)
                host = jax.tree.map(
                    lambda *xs: np.concatenate([np.asarray(x) for x in xs]),
                    *host_chunks)
                snapshots = np.concatenate(snap64_chunks)
            else:
                # ---- ONE compiled scan for the whole outer iteration ----
                # (n_inner steps; per-step snapshots/sub-losses come back
                # from the scan, so planning needs a single device
                # round-trip per outer iteration instead of one per inner
                # step — crucial when the TPU is reached through a
                # high-latency tunnel)
                xx, opt_state, seg_out = engine.plan_segment(
                    params_dynamic, models_static, xx, opt_state,
                    target_mel_dev, target_semvec_dev, self._next_rng(),
                    n_steps=n_inner, objective=objective,
                    use_speech_classifier=self.use_speech_classifier,
                    use_somatosensory=self.use_somatosensory_feedback,
                    log_semantics=log_semantics, constraints=constraints,
                    lr=learning_rate_planning, log_every=log_ii)
                snaps_dev = seg_out["xx_pre"][:, 0]
                # previous iteration's deferred metric/training fetches:
                # the planning scan is dispatched, so these transfers ride
                # behind queued device compute with no device idle gap
                _t0 += flush_deferred()
                # one transfer point for all steps' logs
                host = jax.device_get(_fetch_of(seg_out))
            subs = host["subs"]
            if "xx_pre" in host:  # single-scan branch (overlap built it)
                snapshots = np.asarray(host["xx_pre"], dtype=np.float64)
            pred_mels = np.asarray(host["pred_mel"], dtype=np.float64)

            for s in range(n_segments):
                logs["planned_loss_steps"].append(float(subs.total[s]))
                logs["planned_mel_loss_steps"].append(float(subs.mel_loss[s]))
                logs["vel_loss_steps"].append(float(subs.velocity_loss[s]))
                logs["jerk_loss_steps"].append(float(subs.jerk_loss[s]))
                if want_semvec:
                    logs["pred_semvec_loss_steps"].append(
                        float(subs.semvec_loss[s]))
                    seg_logs_ii["pred_semvec"].append(
                        np.asarray(host["pred_semvec"][s], dtype=np.float64))
                if self.use_speech_classifier:
                    logs["pred_speech_classifier_loss_steps"].append(
                        float(subs.speech_classifier_loss[s]))
                if self.use_somatosensory_feedback:
                    logs["pred_tube_mel_loss_steps"].append(
                        float(subs.tube_mel_loss[s]))
                    logs["pred_tube_semvec_loss_steps"].append(
                        float(subs.tube_semvec_loss[s]))
                if log_gradients:
                    logs["grad_steps"].append(
                        np.asarray(host["grads"][s], dtype=np.float64))
                seg_logs_ii["cp"].append(snapshots[s])
                seg_logs_ii["pred_mel"].append(pred_mels[s])
                if verbose:
                    # gradient-magnitude warnings
                    # (reference /root/reference/paule/paule.py:1056-1060)
                    if host["grad_max"][s] > 10:
                        print("WARNING: gradient is larger than 10")
                    if host["grad_min"][s] < -10:
                        print("WARNING: gradient is smaller than -10")
                    print(f"Iteration {s * log_ii + log_ii - 1}")
                    print("Planned Loss: ", float(subs.total[s]))
                    print("Mel Loss: ", float(subs.mel_loss[s]))
                    print("Vel Loss: ", float(subs.velocity_loss[s]))
                    print("Jerk Loss: ", float(subs.jerk_loss[s]))
                    print("Local Linear Loss: ",
                          float(subs.local_linear_loss[s]))

            timings["planning"] += time.perf_counter() - _t0
            _t0 = time.perf_counter()

            # ---- host synthesis of all logged snapshots ----
            # default path: ONE native crossing for the whole batch of
            # snapshots (pts_synth_block_batch — no per-snapshot
            # Python/ctypes/executor overhead) + ONE device upload.
            # In overlap mode the per-snapshot jobs were already submitted
            # during the planning fetch loop; this phase only collects
            # them, so the "synthesis" timing shows the non-overlapped
            # tail.  synthesis_async=False keeps the strictly-serial
            # per-trajectory path (debug/parity mode).
            host_dtype = (np.float64 if self.dtype == jnp.float64
                          else np.float32)
            if (synth_futures is None and self.synthesis_async
                    and self._plant_has_batch):
                syntheses = self._synthesize_batch(snapshots)
                sig_devs = [jax.device_put(np.stack(
                    [np.asarray(s_[0], dtype=host_dtype)
                     for s_ in syntheses]))]
            else:
                def run_jobs():
                    if synth_futures is not None:
                        return synth_futures  # callables (overlap mode)
                    if self.synthesis_async:
                        # plant without a batch entry (e.g. an injected
                        # VTLPlant): thread-pool fan-out per snapshot
                        return [self._executor.submit(self._synthesize,
                                                      snapshots[s]).result
                                for s in range(n_segments)]
                    return [functools.partial(self._synthesize,
                                              snapshots[s])
                            for s in range(n_segments)]

                syntheses = []
                sig_devs = []  # chunked async uploads, started as
                # syntheses complete so the host->device transfers (tunnel
                # round-trips) overlap with the remaining synthesis jobs;
                # chunks of several signals per put amortize the per-RPC
                # latency (250 singleton puts per run measured noisy on a
                # loaded tunnel)
                put_chunk = 5
                pending = []
                for s, job in enumerate(run_jobs()):
                    try:
                        syntheses.append(job())
                    except Exception as exc:  # noqa: BLE001
                        if self.synthesis_error == "raise":
                            raise
                        print(f"WARNING: synthesis of snapshot {s} failed "
                              f"({exc}); substituting silence")
                        n_audio = max(0, (snapshots[s].shape[0] - 1)) * 110
                        silent_tube = (np.zeros((snapshots[s].shape[0], 10))
                                       if self.use_somatosensory_feedback
                                       else None)
                        syntheses.append((np.zeros(n_audio), 44100,
                                          silent_tube))
                    pending.append(np.asarray(syntheses[-1][0],
                                              dtype=host_dtype))
                    if len(pending) == put_chunk or s == n_segments - 1:
                        sig_devs.append(jax.device_put(np.stack(pending)))
                        pending = []
            sigs = np.stack([s_[0] for s_ in syntheses])
            sr = syntheses[-1][1]
            sig = sigs[-1]
            prod_tubes = None
            if self.use_somatosensory_feedback:
                prod_tubes = np.stack([s_[2] for s_ in syntheses])
            if log_signals:
                logs["sig_steps"].extend(list(sigs))

            timings["synthesis"] += time.perf_counter() - _t0
            _t0 = time.perf_counter()

            # ---- produced-audio metrics: one batched program, DEFERRED
            # host fetch -- the device->host copy is started
            # asynchronously and continue-learning dispatches right
            # behind the metrics program on the device stream, so the
            # fetch hides inside the training compute.  verbose keeps
            # the blocking order (produced losses print before the
            # training output, like the reference).
            dm, pm_dev = self._prod_metrics(sigs, snaps_dev, prod_tubes,
                                            target_mel_dev, target_semvec_dev,
                                            want_semvec, sig_devs=sig_devs,
                                            return_device=True, deferred=True)

            # default-arg capture on purpose: a deferred finish_metrics may
            # run after the NEXT iteration rebinds these loop-scope names
            # (flushed right behind the next planning-scan dispatch)
            def finish_metrics(dm=dm, sigs=sigs, snapshots=snapshots,
                               pred_mels=pred_mels, prod_tubes=prod_tubes,
                               seg_logs_ii=seg_logs_ii,
                               n_segments=n_segments, ii_outer=ii_outer):
                nonlocal prod_mel, pred_mel_last
                pm = dm.host()
                prod_mels_np = np.asarray(pm["prod_mel"], dtype=np.float64)
                prod_mel = prod_mels_np[-1]
                pred_mel_last = pred_mels[-1]
                seg_logs_ii["prod_mel"].extend(list(prod_mels_np))
                if self.use_somatosensory_feedback:
                    seg_logs_ii["prod_tube"].extend(list(prod_tubes))
                    seg_logs_ii["pred_tube"].extend(
                        list(np.asarray(pm["pred_tube"], dtype=np.float64)))
                    seg_logs_ii["prod_tube_mel"].extend(
                        list(np.asarray(pm["prod_tube_mel"], dtype=np.float64)))
                    seg_logs_ii["pred_tube_mel"].extend(
                        list(np.asarray(pm["pred_tube_mel"], dtype=np.float64)))

                for s in range(n_segments):
                    snapshot = snapshots[s]
                    prod_loss = float(pm["prod_loss"][s])
                    logs["prod_loss_steps"].append(prod_loss)

                    if self.use_speech_classifier:
                        sc_loss = float(pm["prod_sc_loss"][s])
                        logs["prod_speech_classifier_loss_steps"].append(sc_loss)
                        if verbose:
                            print("Produced Speech Classifier Loss: ", sc_loss)

                    tube_metrics = {}
                    if self.use_somatosensory_feedback:
                        prod_tube_loss = float(pm["prod_tube_loss"][s])
                        prod_tube_mel_loss = float(pm["prod_tube_mel_loss"][s])
                        logs["prod_tube_loss_steps"].append(prod_tube_loss)
                        logs["prod_tube_mel_loss_steps"].append(prod_tube_mel_loss)
                        tube_metrics = {
                            "prod_tube": prod_tubes[s],
                            "pred_tube": np.asarray(pm["pred_tube"][s],
                                                    dtype=np.float64),
                            "prod_tube_mel": np.asarray(pm["prod_tube_mel"][s],
                                                        dtype=np.float64),
                            "pred_tube_mel": np.asarray(pm["pred_tube_mel"][s],
                                                        dtype=np.float64),
                            "prod_tube_loss": prod_tube_loss,
                            "prod_tube_mel_loss": prod_tube_mel_loss,
                        }

                    if verbose:
                        print("Produced Mel Loss: ", prod_loss)

                    if want_semvec:
                        prod_semvec = np.asarray(pm["prod_semvec"][s],
                                                 dtype=np.float64)
                        seg_logs_ii["prod_semvec"].append(prod_semvec.copy())
                        prod_semvec_loss = float(pm["prod_semvec_loss"][s])
                        logs["prod_semvec_loss_steps"].append(prod_semvec_loss)
                        if verbose:
                            print("Produced Semvec Loss: ", prod_semvec_loss)

                        pred_semvec_np = (seg_logs_ii["pred_semvec"][s]
                                          if seg_logs_ii["pred_semvec"]
                                          else initial_pred_semvec)
                        new_ac = BestSynthesisAcoustic(
                            prod_loss, snapshot, sigs[s], prod_mels_np[s].copy(),
                            pred_mels[s].copy())
                        new_sem = BestSynthesisSemantic(
                            prod_semvec_loss, snapshot, sigs[s], prod_semvec,
                            pred_semvec_np)
                        if self.best_synthesis_acoustic.mel_loss > new_ac.mel_loss:
                            self.best_synthesis_acoustic = new_ac
                        if (self.best_synthesis_semantic.semvec_loss
                                > new_sem.semvec_loss):
                            self.best_synthesis_semantic = new_sem

                        if self.use_somatosensory_feedback:
                            prod_tube_semvec = np.asarray(
                                pm["prod_tube_semvec"][s], dtype=np.float64)
                            seg_logs_ii["prod_tube_semvec"].append(
                                prod_tube_semvec.copy())
                            prod_tube_semvec_loss = float(
                                pm["prod_tube_semvec_loss"][s])
                            logs["prod_tube_semvec_loss_steps"].append(
                                prod_tube_semvec_loss)
                            new_som = BestSynthesisSomatosensory(
                                tube_metrics["prod_tube_loss"],
                                tube_metrics["prod_tube_mel_loss"],
                                prod_tube_semvec_loss, snapshot, sigs[s],
                                tube_metrics["prod_tube"],
                                tube_metrics["pred_tube"],
                                tube_metrics["prod_tube_mel"],
                                tube_metrics["pred_tube_mel"],
                                prod_tube_semvec, None)
                            if (self.best_synthesis_somatosensory.tube_loss
                                    > new_som.tube_loss):
                                self.best_synthesis_somatosensory = new_som
                    else:
                        new_ac = BestSynthesisAcoustic(
                            prod_loss, snapshot, sigs[s], prod_mels_np[s].copy(),
                            pred_mels[s].copy())
                        if self.best_synthesis_acoustic.mel_loss > new_ac.mel_loss:
                            self.best_synthesis_acoustic = new_ac
                        if self.use_somatosensory_feedback:
                            new_som = BestSynthesisSomatosensory(
                                tube_metrics["prod_tube_loss"],
                                tube_metrics["prod_tube_mel_loss"], np.inf,
                                snapshot, sigs[s], tube_metrics["prod_tube"],
                                tube_metrics["pred_tube"],
                                tube_metrics["prod_tube_mel"],
                                tube_metrics["pred_tube_mel"], None, None)
                            if (self.best_synthesis_somatosensory.tube_loss
                                    > new_som.tube_loss):
                                self.best_synthesis_somatosensory = new_som

                if plot and seg_logs_ii["prod_mel"]:
                    from . import visualize
                    target_mel_ii = target_mel[0]
                    if plot is True:
                        visualize.plot_mels(True, target_mel_ii, initial_pred_mel,
                                            initial_prod_mel, pred_mel_last,
                                            seg_logs_ii["prod_mel"][-1])
                    else:
                        visualize.plot_mels(f"{plot}_{ii_outer:03d}.png",
                                            target_mel_ii, initial_pred_mel,
                                            initial_prod_mel, pred_mel_last,
                                            seg_logs_ii["prod_mel"][-1])

                logs["prod_mel_steps"].append(seg_logs_ii["prod_mel"])
                if log_cps:
                    logs["cp_steps"].append(seg_logs_ii["cp"])
                logs["pred_mel_steps"].append(seg_logs_ii["pred_mel"])
                logs["pred_semvec_steps"].append(seg_logs_ii["pred_semvec"])
                logs["prod_semvec_steps"].append(seg_logs_ii["prod_semvec"])
                if self.use_somatosensory_feedback:
                    logs["prod_tube_steps"].append(seg_logs_ii["prod_tube"])
                    logs["pred_tube_steps"].append(seg_logs_ii["pred_tube"])
                    logs["prod_tube_mel_steps"].append(seg_logs_ii["prod_tube_mel"])
                    logs["pred_tube_mel_steps"].append(seg_logs_ii["pred_tube_mel"])
                    logs["pred_tube_semvec_steps"].append(
                        seg_logs_ii["pred_tube_semvec"])
                    logs["prod_tube_semvec_steps"].append(
                        seg_logs_ii["prod_tube_semvec"])


            defer_fetch = (self.defer_metrics_fetch and continue_learning
                           and bool(seg_logs_ii["cp"]) and not verbose)
            if not defer_fetch:
                finish_metrics()
            timings["metrics"] += time.perf_counter() - _t0

            # ---------------- continue learning ----------------
            cl_pending = []
            if continue_learning and seg_logs_ii["cp"]:
                _t0 = time.perf_counter()
                # this outer iteration's training pairs are device-resident
                # already: the scan's own snapshots and the metrics
                # program's produced mels/tubes
                dev_train = {"cp": snaps_dev.astype(self.dtype),
                             "prod_mel": pm_dev["prod_mel"],
                             "prod_tube": pm_dev["prod_tube"]}
                cl_pending = self._continue_learning(
                    seg_logs_ii, target_semvec_dev, logs,
                    continue_learning_inv=continue_learning_inv,
                    continue_learning_tube=continue_learning_tube,
                    add_training_data_pred=add_training_data_pred,
                    add_training_data_inv=add_training_data_inv,
                    n_batches=n_batches, batch_size=batch_size,
                    n_epochs=n_epochs, dev_train=dev_train,
                    deferred_metrics=dm if defer_fetch else None,
                    prod_tubes_host=prod_tubes, defer=defer_fetch)
                timings["continue_learning"] += time.perf_counter() - _t0
            if defer_fetch:
                # materialized after the NEXT iteration's planning dispatch
                # (or right below, after the last iteration)
                deferred_flush.append((finish_metrics, cl_pending))
            else:
                # defer=False means _continue_learning fetched inline
                assert not cl_pending

        flush_deferred()  # last iteration's fetches

        # ---------------- Phase F: final results ----------------
        planned_cp = _to_np(xx[0])
        prod_sig = sig
        prod_sr = sr

        pred_mel_dev = self._j_pred(self.pred_trainer.params, xx)
        pred_semvec_dev = self._embed(pred_mel_dev)
        prod_mel_dev = jnp.asarray(prod_mel[None], dtype=self.dtype)
        prod_semvec_dev = self._embed(prod_mel_dev)

        final_fetch = {"pred_mel": pred_mel_dev[0],
                       "prod_semvec": prod_semvec_dev[0],
                       "pred_semvec": pred_semvec_dev[0]}
        if self.use_somatosensory_feedback:
            pred_tube_dev = self._j_cp_tube(self.tube_trainer.params, xx)
            prod_tube_last = (seg_logs_ii["prod_tube"][-1]
                              if seg_logs_ii["prod_tube"]
                              else somato_init["initial_prod_tube"])
            prod_tube_dev = jnp.asarray(prod_tube_last[None], dtype=self.dtype)
            prod_tube_mel_dev = self._j_tube_mel(
                self.tube_mel_trainer.params, prod_tube_dev)
            pred_tube_mel_dev = self._j_tube_mel(
                self.tube_mel_trainer.params, pred_tube_dev)
            final_fetch.update(
                pred_tube=pred_tube_dev[0],
                prod_tube_mel=prod_tube_mel_dev[0],
                pred_tube_mel=pred_tube_mel_dev[0],
                prod_tube_semvec=self._tube_embed(prod_tube_dev)[0],
                pred_tube_semvec=self._tube_embed(pred_tube_dev)[0])
        final_host = {k: np.asarray(v, dtype=np.float64)
                      for k, v in jax.device_get(final_fetch).items()}

        target_mel_out = target_mel[0]
        prod_mel_out = _to_np(prod_mel)
        pred_mel_out = final_host["pred_mel"]
        prod_semvec_out = final_host["prod_semvec"]
        pred_semvec_out = final_host["pred_semvec"]

        somato_final = {}
        if self.use_somatosensory_feedback:
            somato_final = {
                "prod_tube": prod_tube_last,
                "pred_tube": final_host["pred_tube"],
                "prod_tube_mel": final_host["prod_tube_mel"],
                "pred_tube_mel": final_host["pred_tube_mel"],
                "prod_tube_semvec": final_host["prod_tube_semvec"],
                "pred_tube_semvec": final_host["pred_tube_semvec"],
            }

        timings["total"] = time.perf_counter() - start_perf
        self.last_planning_timings = timings
        print("--- %.2f min ---" % (timings["total"] / 60))
        if verbose:
            split = {k: round(v, 3) for k, v in timings.items()}
            print("phase timings (s):", split)

        if self.use_speech_classifier:
            return PlanningResultsWithSpeechClassifier(
                planned_cp, initial_cp, initial_sig, initial_sr,
                initial_prod_mel, initial_pred_mel, target_sig, target_sr,
                target_mel_out, prod_sig, prod_sr, prod_mel_out, pred_mel_out,
                initial_prod_semvec, initial_pred_semvec, prod_semvec_out,
                pred_semvec_out, logs["prod_loss_steps"],
                logs["planned_loss_steps"], logs["planned_mel_loss_steps"],
                logs["vel_loss_steps"], logs["jerk_loss_steps"],
                logs["pred_semvec_loss_steps"], logs["prod_semvec_loss_steps"],
                logs["pred_speech_classifier_loss_steps"],
                logs["prod_speech_classifier_loss_steps"], logs["cp_steps"],
                logs["pred_semvec_steps"], logs["prod_semvec_steps"],
                logs["grad_steps"], logs["sig_steps"], logs["prod_mel_steps"],
                logs["pred_mel_steps"], logs["pred_model_loss"],
                logs["inv_model_loss"])
        elif self.use_somatosensory_feedback:
            return PlanningResultsWithSomatosensory(
                planned_cp, initial_cp, initial_sig, initial_sr,
                initial_prod_mel, initial_pred_mel,
                somato_init["initial_prod_tube"],
                somato_init["initial_pred_tube"],
                somato_init["initial_prod_tube_mel"],
                somato_init["initial_pred_tube_mel"], target_sig, target_sr,
                target_mel_out, prod_sig, prod_sr, prod_mel_out, pred_mel_out,
                somato_final["prod_tube"], somato_final["pred_tube"],
                somato_final["prod_tube_mel"], somato_final["pred_tube_mel"],
                initial_prod_semvec, initial_pred_semvec,
                somato_init["initial_prod_tube_semvec"],
                somato_init["initial_pred_tube_semvec"], prod_semvec_out,
                pred_semvec_out, somato_final["prod_tube_semvec"],
                somato_final["pred_tube_semvec"], logs["prod_loss_steps"],
                logs["planned_loss_steps"], logs["planned_mel_loss_steps"],
                logs["vel_loss_steps"], logs["jerk_loss_steps"],
                logs["pred_semvec_loss_steps"], logs["prod_semvec_loss_steps"],
                logs["prod_tube_loss_steps"], logs["pred_tube_mel_loss_steps"],
                logs["prod_tube_mel_loss_steps"],
                logs["pred_tube_semvec_loss_steps"],
                logs["prod_tube_semvec_loss_steps"], logs["cp_steps"],
                logs["pred_semvec_steps"], logs["prod_semvec_steps"],
                logs["grad_steps"], logs["sig_steps"], logs["prod_mel_steps"],
                logs["pred_mel_steps"], logs["prod_tube_steps"],
                logs["pred_tube_steps"], logs["prod_tube_mel_steps"],
                logs["pred_tube_mel_steps"], logs["prod_tube_semvec_steps"],
                logs["pred_tube_semvec_steps"], logs["pred_model_loss"],
                logs["inv_model_loss"], logs["tube_model_loss"],
                logs["tube_mel_model_loss"])
        return PlanningResults(
            planned_cp, initial_cp, initial_sig, initial_sr,
            initial_prod_mel, initial_pred_mel, target_sig, target_sr,
            target_mel_out, prod_sig, prod_sr, prod_mel_out, pred_mel_out,
            initial_prod_semvec, initial_pred_semvec, prod_semvec_out,
            pred_semvec_out, logs["prod_loss_steps"],
            logs["planned_loss_steps"], logs["planned_mel_loss_steps"],
            logs["vel_loss_steps"], logs["jerk_loss_steps"],
            logs["pred_semvec_loss_steps"], logs["prod_semvec_loss_steps"],
            logs["cp_steps"], logs["pred_semvec_steps"],
            logs["prod_semvec_steps"], logs["grad_steps"], logs["sig_steps"],
            logs["prod_mel_steps"], logs["pred_mel_steps"],
            logs["pred_model_loss"], logs["inv_model_loss"])

    # ------------------------------------------------------------------
    # continue learning
    # ------------------------------------------------------------------

    def _continue_learning(self, seg_logs_ii, target_semvec_dev, logs, *,
                           continue_learning_inv, continue_learning_tube,
                           add_training_data_pred, add_training_data_inv,
                           n_batches, batch_size, n_epochs, dev_train=None,
                           deferred_metrics=None, prod_tubes_host=None,
                           defer=False):
        import pandas as pd

        n_prod = len(seg_logs_ii["cp"])
        frame_cache = []

        def produced_frame():
            """The reference's per-outer-iteration produced DataFrame,
            built lazily.  On the pure device-resident training path it is
            needed only for the replay-buffer append — and skipped
            entirely when the buffer would discard it anyway
            (ReplayBuffer.append on a ``continue_data=None`` buffer).
            With ``deferred_metrics`` the produced mels come straight from
            the in-flight metrics fetch (plan_resynth fills
            ``seg_logs_ii['prod_mel']`` only after training dispatch)."""
            if frame_cache:
                return frame_cache[0]
            prod_mels = seg_logs_ii["prod_mel"]
            if not prod_mels and deferred_metrics is not None:
                prod_mels = list(np.asarray(
                    deferred_metrics.host()["prod_mel"], dtype=np.float64))
            produced = pd.DataFrame(
                columns=["vector", "cp_norm", "melspec_norm_synthesized",
                         "tube_norm", "segment_data"])
            produced["cp_norm"] = seg_logs_ii["cp"]
            produced["melspec_norm_synthesized"] = prod_mels
            target_semvec_np = _to_np(target_semvec_dev[0])  # fetch once
            produced["vector"] = [target_semvec_np] * n_prod
            produced["segment_data"] = False
            if self.use_somatosensory_feedback:
                tubes = seg_logs_ii["prod_tube"]
                if not tubes and prod_tubes_host is not None:
                    tubes = list(prod_tubes_host)
                produced["tube_norm"] = tubes
            frame_cache.append(produced)
            return produced

        def _scarce_prints(header, k_total):
            # informational prints mirror the reference
            # (/root/reference/paule/paule.py:1255-1299)
            n_train_batches = int(np.ceil(k_total / batch_size))
            reduced_last_batch = k_total % batch_size
            print(header)
            if n_train_batches < n_batches:
                print(f"Training on {n_train_batches} batches instead...")
            if reduced_last_batch > 0:
                print(f"Last batch reduced to {reduced_last_batch} samples "
                      f"instead of {batch_size}...")
            print(" ")

        def sample_training(add_training_data):
            """Returns (training frame, produced-row indices | None).

            The indices are non-None only when EVERY training row is one of
            this outer iteration's produced rows — then the device fast path
            can train directly on the scan's device-resident arrays."""
            if add_training_data and len(self.continue_data) > 0:
                want = int(0.5 * batch_size) * n_batches
                if n_prod < want:
                    # scarce-data fallback (reference paule.py:1255-1266):
                    # ALL produced samples + the same count of replay
                    # samples -> 2n enhanced samples in ceil(2n/batch)
                    # batches.  (The reference would raise if the replay
                    # buffer held fewer than n rows; we clamp instead.)
                    k = min(n_prod, len(self.continue_data))
                    _scarce_prints(
                        "Enhanced training data\n"
                        f"Not enough data produced to fill 50% of "
                        f"{n_batches} batches...", 2 * k)
                else:
                    # the reference would crash here if the replay buffer
                    # held fewer than `want` rows (random.sample larger than
                    # population); we clamp instead
                    k = min(want, len(self.continue_data))
                prod_idx = self._py_rng.sample(range(n_prod), k)
                old = self.continue_data.sample(k)
                mixed = pd.concat(
                    [old, produced_frame().iloc[prod_idx].reset_index(
                        drop=True)]
                ).reset_index(drop=True)
                return mixed, None
            want = batch_size * n_batches
            k = min(want, n_prod)
            if k < want:
                _scarce_prints(
                    "Produced training data\n"
                    f"Not enough data produced to fill {n_batches} "
                    "batches...", k)
            idx = self._py_rng.sample(range(n_prod), k)
            # frame materialized lazily in run_train's host fallback: on
            # the device fast path it is never read
            return None, idx

        def dev_rows(key, idx):
            """Device gather of training rows, or None if unavailable."""
            if dev_train is None or idx is None:
                return None
            arr = dev_train.get(key)
            if arr is None:
                return None
            return jnp.take(arr, jnp.asarray(np.asarray(idx, np.int32)),
                            axis=0)

        def run_train(trainer, in_key, out_key, frame, idx):
            """Train on device-resident rows when possible (no re-upload),
            otherwise on the (possibly replay-mixed) host frame."""
            col = {"cp": "cp_norm", "prod_mel": "melspec_norm_synthesized",
                   "prod_tube": "tube_norm"}
            din, dout = dev_rows(in_key, idx), dev_rows(out_key, idx)
            if din is not None and dout is not None:
                return trainer_mod.train_epochs_device(
                    trainer, din, dout, batch_size=batch_size,
                    n_epochs=n_epochs, rng=self._py_rng, deferred=defer)
            if frame is None:  # pure-produced rows, host fallback
                frame = produced_frame().iloc[idx].reset_index(drop=True)
            ins = list(frame[col[in_key]])
            outs = list(frame[col[out_key]])
            return trainer_mod.train_epochs(
                trainer, ins, outs, np.array([len(x) for x in ins]),
                batch_size=batch_size, n_epochs=n_epochs, rng=self._py_rng,
                dtype=self.dtype, deferred=defer)

        pending = []  # (logs list, thunk) pairs when defer

        def record(lst, out):
            if callable(out):  # deferred fetch: materialized by the caller
                pending.append((lst, out))
            else:
                lst.extend(out)

        # predictive model (the physical forward model has no parameters)
        training, prod_idx = sample_training(add_training_data_pred)
        if not self.physical_forward:
            record(logs["pred_model_loss"], run_train(
                self.pred_trainer, "cp", "prod_mel", training, prod_idx))

        if continue_learning_tube and self.use_somatosensory_feedback:
            record(logs["tube_model_loss"], run_train(
                self.tube_trainer, "cp", "prod_tube", training, prod_idx))
            record(logs["tube_mel_model_loss"], run_train(
                self.tube_mel_trainer, "prod_tube", "prod_mel", training,
                prod_idx))

        if continue_learning_inv:
            training_inv, inv_idx = sample_training(add_training_data_inv)
            record(logs["inv_model_loss"], run_train(
                self.inv_trainer, "prod_mel", "cp", training_inv, inv_idx))

        if self.continue_data.data is not None or frame_cache:
            # an empty buffer discards appends (reference quirk, see
            # ReplayBuffer.append) — skip building the frame entirely then
            if defer and not frame_cache:
                # a seeded replay buffer would otherwise force
                # produced_frame() -> deferred_metrics.host() HERE, blocking
                # on the produced-mel fetch this deferral exists to hide.
                # The append only has to land before the NEXT iteration's
                # sample_training, which runs after flush_deferred — and by
                # flush time finish_metrics has already filled
                # seg_logs_ii['prod_mel'], so the frame builds fetch-free.
                def _append_late():
                    self.continue_data.append(produced_frame())
                    return ()
                pending.append(([], _append_late))
            else:
                self.continue_data.append(produced_frame())
        return pending

    def plan_iterative(self, *, target_acoustic=None, target_semvecs=None,
                       target_seq_lengths=None, overlap=8, **kwargs):
        """Chunked/overlapped planning of long utterances — implemented in
        :mod:`paule_tpu.planning.iterative` (the reference declares this API
        but leaves it a stub, /root/reference/paule/paule.py:383-388)."""
        from .planning.iterative import plan_iterative as _impl

        return _impl(self, target_acoustic=target_acoustic,
                     target_semvecs=target_semvecs,
                     target_seq_lengths=target_seq_lengths, overlap=overlap,
                     **kwargs)
