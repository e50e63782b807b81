"""Train and package the in-repo pretrained-weight release (VERDICT r5 #1).

The reference ships 200 MB of externally trained weights
(/root/reference/paule/util.py:936-966); that artifact is a network
download trained on non-public corpora.  This recipe trains EVERY model the
release needs **from scratch, deterministically,** using only this repo:

* **motor babbling** through the C++ synthesizer → (cp, mel, tube) triples
  for the forward / inverse / somatosensory models;
* a **synthetic lexicon** — V word classes, each a prototype articulation
  with K acoustic variants and a fixed unit-norm 300-dim "semantic" vector
  — for the embedder, the tube embedder and the conditional WGAN-GP
  generators (semvec→cp, semvec→mel), making the semvec-only planning path
  usable end to end;
* **speech/non-speech contrast** (babble vs silence/noise) for the
  LinearClassifier.

Stages checkpoint to ``.release_work/`` so an interrupted run resumes.
Output: ``paule_tpu/pretrained_weights/paule_tpu_release_v1.npz`` (float16
on disk) + ``docs/measurements/weights_r05.json`` (config, per-model val
losses, sha256).

Run on the TPU host:  PYTHONPATH=. python tools/train_release_weights.py
"""

import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORK = os.environ.get("RELEASE_WORK_DIR") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".release_work")
os.makedirs(WORK, exist_ok=True)

# ---- corpus configuration (all deterministic) ----
V_CLASSES = int(os.environ.get("RELEASE_CLASSES", "120"))
K_VARIANTS = int(os.environ.get("RELEASE_VARIANTS", "12"))
N_BABBLE_EXTRA = int(os.environ.get("RELEASE_BABBLE", "360"))
#: few distinct lengths -> few compiled shapes per train step
CLASS_LENGTHS = (40, 60, 80, 100, 120)
BABBLE_LENGTHS = (80, 120, 160, 200)
VAL_PER_CLASS = 2

EPOCHS = {
    "forward": int(os.environ.get("RELEASE_EPOCHS_FWD", "40")),
    "inverse": int(os.environ.get("RELEASE_EPOCHS_INV", "40")),
    "embedder": int(os.environ.get("RELEASE_EPOCHS_EMB", "40")),
    "tube": int(os.environ.get("RELEASE_EPOCHS_TUBE", "30")),
    "gan": int(os.environ.get("RELEASE_EPOCHS_GAN", "40")),
    "classifier": int(os.environ.get("RELEASE_EPOCHS_CLS", "30")),
}
BATCH = 16


def log(msg):
    print(f"[release] {msg}", file=sys.stderr, flush=True)


def epoch_progress(stage_name, every=5):
    t0 = time.perf_counter()

    def cb(e):
        if (e + 1) % every == 0:
            log(f"  {stage_name}: epoch {e + 1} "
                f"({time.perf_counter() - t0:.0f} s)")
    return cb


def stage(name, fn):
    """Run ``fn`` once, pickling its result to the work dir."""
    path = os.path.join(WORK, f"{name}.pkl")
    if os.path.exists(path):
        log(f"stage {name}: cached")
        with open(path, "rb") as fh:
            return pickle.load(fh)
    t0 = time.perf_counter()
    out = fn()
    with open(path, "wb") as fh:
        pickle.dump(out, fh, protocol=pickle.HIGHEST_PROTOCOL)
    log(f"stage {name}: done in {time.perf_counter() - t0:.0f} s")
    return out


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------

def build_corpus():
    import pandas as pd

    from paule_tpu import pretrain, synth
    from paule_tpu.dsp.mel import librosa_melspec
    from paule_tpu.ops.normalize import (
        inv_normalize_cp, normalize_mel, normalize_tube)

    synth.initialize()
    rng = np.random.default_rng(20260820)

    # unit-norm class vectors: the synthetic lexicon's "lexical embeddings"
    vectors = rng.normal(0, 1, (V_CLASSES, 300))
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)

    rows = []
    for c in range(V_CLASSES):
        n = int(rng.choice(CLASS_LENGTHS))
        proto = pretrain.random_cp_trajectory(rng, n)
        for k in range(K_VARIANTS):
            jitter = pretrain.random_cp_trajectory(rng, n, walk_scale=0.03)
            cp = np.clip(proto + 0.35 * jitter, -1.0, 1.0)
            rows.append({"cp_norm": cp, "vector": vectors[c],
                         "class_id": c,
                         "split": "val" if k < VAL_PER_CLASS else "train"})
    for b in range(N_BABBLE_EXTRA):
        n = int(rng.choice(BABBLE_LENGTHS))
        cp = pretrain.random_cp_trajectory(rng, n)
        rows.append({"cp_norm": cp, "vector": None, "class_id": -1,
                     "split": "val" if b % 6 == 0 else "train"})

    pool = synth.SynthPool(size=4)
    t0 = time.perf_counter()
    mels, tubes = [], []
    for i, row in enumerate(rows):
        cps = inv_normalize_cp(row["cp_norm"])
        sig, sr, tube_info = pool.speak_and_extract_tube_information(cps)
        mel = np.asarray(normalize_mel(librosa_melspec(sig, sr)))
        area = synth.get_area_info_within_oral_cavity(
            tube_info["tube_length_cm"], tube_info["tube_area_cm2"])
        tube = normalize_tube(np.concatenate(
            [area, tube_info["incisor_pos_cm"][:, None],
             tube_info["tongue_tip_side_elevation"][:, None],
             tube_info["velum_opening_cm2"][:, None]], axis=1))
        assert np.isfinite(mel).all() and np.isfinite(tube).all(), i
        mels.append(mel.astype(np.float32))
        tubes.append(np.asarray(tube, dtype=np.float32))
        if (i + 1) % 200 == 0:
            log(f"  synthesized {i + 1}/{len(rows)} "
                f"({time.perf_counter() - t0:.0f} s)")
    pool.close()

    df = pd.DataFrame(rows)
    df["melspec_norm_synthesized"] = mels
    df["tube_norm"] = tubes
    log(f"corpus: {len(df)} utterances "
        f"({V_CLASSES}x{K_VARIANTS} lexicon + {N_BABBLE_EXTRA} babble), "
        f"synthesis wall {time.perf_counter() - t0:.0f} s")
    return df


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _val_loss_seq2seq(model, params, inps, tgts, *, loss):
    """Mean per-utterance loss on a validation list (B=1 evaluation)."""
    import jax
    import jax.numpy as jnp

    from paule_tpu.ops import losses as L

    @jax.jit
    def f(p, x, y):
        pred = model.apply(p, x)
        if loss == "rmse":
            return L.rmse(pred, y)
        return L.cp_trajectory_loss(pred, y)[0]

    vals = [float(f(params, jnp.asarray(x[None]), jnp.asarray(y[None])))
            for x, y in zip(inps, tgts)]
    return float(np.mean(vals))


def main():
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    jax.devices()
    log(f"backend: {jax.default_backend()}")

    from paule_tpu import pretrain, release
    from paule_tpu.config import DTYPE
    from paule_tpu.models import (
        EmbeddingModel, ForwardModel, Generator, Critic,
        InverseModelMelTimeSmoothResidual, LinearClassifier)

    corpus = stage("corpus", build_corpus)
    train = corpus[corpus["split"] == "train"].reset_index(drop=True)
    val = corpus[corpus["split"] == "val"].reset_index(drop=True)
    lex_train = train[train["class_id"] >= 0].reset_index(drop=True)
    lex_val = val[val["class_id"] >= 0].reset_index(drop=True)
    log(f"train {len(train)} (lexicon {len(lex_train)}), "
        f"val {len(val)} (lexicon {len(lex_val)})")

    rng = jax.random.PRNGKey(20260820)
    keys = iter(jax.random.split(rng, 16))
    report = {"corpus": {
        "classes": V_CLASSES, "variants": K_VARIANTS,
        "babble_extra": N_BABBLE_EXTRA, "train": len(train),
        "val": len(val), "class_lengths": list(CLASS_LENGTHS),
        "babble_lengths": list(BABBLE_LENGTHS)}, "epochs": EPOCHS}

    # ---- predictive (cp -> mel) ----
    def do_forward():
        m = ForwardModel(num_lstm_layers=1, hidden_size=720)
        params, losses = pretrain.train_forward(
            m, m.init(next(keys), DTYPE), train, batch_size=BATCH,
            n_epochs=EPOCHS["forward"], exact_batch_only=True,
            progress=epoch_progress("forward"))
        vl = _val_loss_seq2seq(m, params,
                               list(val["cp_norm"]),
                               list(val["melspec_norm_synthesized"]),
                               loss="rmse")
        return jax.device_get(params), losses, vl

    pred_params, fwd_losses, fwd_val = stage("forward", do_forward)
    log(f"forward: train {fwd_losses[0]:.4f} -> {fwd_losses[-1]:.4f}, "
        f"val {fwd_val:.4f}")
    report["forward"] = {"train_first": round(fwd_losses[0], 4),
                         "train_last": round(fwd_losses[-1], 4),
                         "val_rmse": round(fwd_val, 4)}

    # ---- inverse (mel -> cp) ----
    def do_inverse():
        m = InverseModelMelTimeSmoothResidual(num_lstm_layers=1,
                                              hidden_size=720)
        params, losses = pretrain.train_inverse(
            m, m.init(next(keys), DTYPE), train, batch_size=BATCH,
            n_epochs=EPOCHS["inverse"], exact_batch_only=True,
            progress=epoch_progress("inverse"))
        vl = _val_loss_seq2seq(m, params,
                               list(val["melspec_norm_synthesized"]),
                               list(val["cp_norm"]),
                               loss="cp_trajectory")
        return jax.device_get(params), losses, vl

    inv_params, inv_losses, inv_val = stage("inverse", do_inverse)
    log(f"inverse: train {inv_losses[0]:.4f} -> {inv_losses[-1]:.4f}, "
        f"val {inv_val:.4f}")
    report["inverse"] = {"train_first": round(inv_losses[0], 4),
                         "train_last": round(inv_losses[-1], 4),
                         "val_cp_trajectory": round(inv_val, 4)}

    # ---- embedder (mel -> semvec) ----
    def do_embedder():
        m = EmbeddingModel(num_lstm_layers=2, hidden_size=720)
        params, losses = pretrain.train_embedder(
            m, m.init(next(keys), DTYPE), lex_train, batch_size=BATCH,
            n_epochs=EPOCHS["embedder"], exact_batch_only=True,
            progress=epoch_progress("embedder"))
        # val MSE + retrieval accuracy (nearest class vector)
        import jax as _jax

        @_jax.jit
        def f(p, x, n):
            return m.apply(p, x, n)

        vecs = np.stack(list(lex_val["vector"]))
        preds = np.concatenate([
            np.asarray(f(params, jnp.asarray(x[None]),
                         jnp.asarray([len(x)])))
            for x in lex_val["melspec_norm_synthesized"]])
        mse = float(np.mean((preds - vecs) ** 2))
        classes = np.stack(
            [np.asarray(v) for v in
             lex_train.groupby("class_id")["vector"].first()])
        sims = preds @ classes.T
        acc = float(np.mean(
            np.argmax(sims, 1) == np.asarray(lex_val["class_id"])))
        return jax.device_get(params), losses, mse, acc

    emb_params, emb_losses, emb_mse, emb_acc = stage("embedder", do_embedder)
    log(f"embedder: train {emb_losses[0]:.5f} -> {emb_losses[-1]:.5f}, "
        f"val mse {emb_mse:.5f}, class retrieval {emb_acc:.1%}")
    report["embedder"] = {"train_first": round(emb_losses[0], 5),
                          "train_last": round(emb_losses[-1], 5),
                          "val_mse": round(emb_mse, 5),
                          "val_class_retrieval": round(emb_acc, 4)}

    # ---- somatosensory trio ----
    def do_tube():
        cp_tube = ForwardModel(num_lstm_layers=1, hidden_size=360,
                               output_size=10, input_size=30,
                               apply_half_sequence=False)
        p1, l1 = pretrain.train_forward(
            cp_tube, cp_tube.init(next(keys), DTYPE),
            train.assign(melspec_norm_synthesized=train["tube_norm"]),
            batch_size=BATCH, n_epochs=EPOCHS["tube"],
            exact_batch_only=True, progress=epoch_progress("cp_tube"))
        v1 = _val_loss_seq2seq(cp_tube, p1, list(val["cp_norm"]),
                               list(val["tube_norm"]), loss="rmse")

        tube_mel = ForwardModel(num_lstm_layers=1, hidden_size=360,
                                output_size=60, input_size=10,
                                apply_half_sequence=True)
        p2, l2 = pretrain.train_forward(
            tube_mel, tube_mel.init(next(keys), DTYPE),
            train.assign(cp_norm=train["tube_norm"]),
            batch_size=BATCH, n_epochs=EPOCHS["tube"],
            exact_batch_only=True, progress=epoch_progress("tube_mel"))
        v2 = _val_loss_seq2seq(tube_mel, p2, list(val["tube_norm"]),
                               list(val["melspec_norm_synthesized"]),
                               loss="rmse")

        tube_emb = EmbeddingModel(input_size=10, num_lstm_layers=2,
                                  hidden_size=720, dropout=0.7,
                                  post_upsampling_size=0)
        p3, l3 = pretrain.train_embedder(
            tube_emb, tube_emb.init(next(keys), DTYPE), lex_train,
            batch_size=BATCH, n_epochs=EPOCHS["tube"],
            input_column="tube_norm", exact_batch_only=True,
            progress=epoch_progress("tube_embedder"))
        return (jax.device_get(p1), l1, v1, jax.device_get(p2), l2, v2,
                jax.device_get(p3), l3)

    (tube_params, tube_losses, tube_val, tmel_params, tmel_losses,
     tmel_val, temb_params, temb_losses) = stage("tube", do_tube)
    log(f"cp->tube: {tube_losses[-1]:.4f} (val {tube_val:.4f}); "
        f"tube->mel: {tmel_losses[-1]:.4f} (val {tmel_val:.4f}); "
        f"tube->semvec: {temb_losses[-1]:.5f}")
    report["somatosensory"] = {
        "cp_tube_train_last": round(tube_losses[-1], 4),
        "cp_tube_val_rmse": round(tube_val, 4),
        "tube_mel_train_last": round(tmel_losses[-1], 4),
        "tube_mel_val_rmse": round(tmel_val, 4),
        "tube_embedder_train_last": round(temb_losses[-1], 5)}

    # ---- speech classifier (babble vs silence/noise) ----
    def do_classifier():
        import optax

        from paule_tpu.dsp.mel import librosa_melspec
        from paule_tpu.ops.normalize import normalize_mel
        from paule_tpu.ops.padding import pad_batch

        m = LinearClassifier(input_dim=60, output_dim=1)
        params = m.init(next(keys), DTYPE)
        rng_np = np.random.default_rng(7)
        pos = list(train["melspec_norm_synthesized"])
        neg = []
        for i in range(len(pos)):
            n_samples = (len(pos[i]) * 2 - 1) * 110
            kind = i % 3
            if kind == 0:
                sig = np.zeros(n_samples)
            elif kind == 1:
                sig = rng_np.normal(0, 10 ** rng_np.uniform(-4, -1),
                                    n_samples)
            else:  # hum: low-frequency tone, non-speech-like
                t = np.arange(n_samples) / 44100.0
                sig = 0.01 * np.sin(
                    2 * np.pi * rng_np.uniform(30, 80) * t)
            neg.append(np.asarray(
                normalize_mel(librosa_melspec(sig, 44100)),
                dtype=np.float32))
        X = pos + neg
        y = np.array([1.0] * len(pos) + [0.0] * len(neg), dtype=np.float32)
        lens = np.array([len(x) for x in X])

        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(p, s, bx, bl, by):
            def loss_fn(pp):
                logit = m.apply(pp, bx, src_lens=bl)
                return jnp.mean(
                    optax.sigmoid_binary_cross_entropy(logit, by))

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s)
            return optax.apply_updates(p, updates), s, loss

        from paule_tpu.planning.trainer import (
            build_length_dict, create_epoch_batches)
        import random as pyrandom

        prng = pyrandom.Random(11)
        ld = build_length_dict(lens)
        losses = []
        cls_progress = epoch_progress("classifier")
        for e in range(EPOCHS["classifier"]):
            ep = []
            batches = [b for b in create_epoch_batches(
                    len(X), BATCH, shuffle=True, same_size_batching=True,
                    training_length_dict=ld, rng=prng)
                if len(b) == BATCH]  # bound compiled (B, T) shapes
            for idxs in batches:
                idxs = list(idxs)
                bx = pad_batch(lens[idxs], [X[i] for i in idxs],
                               dtype=np.dtype("float32"))
                params, opt_state, l_ = step(
                    params, opt_state, jnp.asarray(bx),
                    jnp.asarray(lens[idxs]), jnp.asarray(y[idxs]))
                ep.append(float(l_))
            losses.append(float(np.mean(ep)))
            cls_progress(e)
        # accuracy on val positives + fresh negatives
        vx = list(val["melspec_norm_synthesized"])
        hits = 0
        for x in vx:
            logit = float(np.asarray(
                m.apply(params, jnp.asarray(x[None]),
                        src_lens=jnp.asarray([len(x)]))).reshape(-1)[0])
            hits += logit > 0
        acc = hits / len(vx)
        return jax.device_get(params), losses, float(acc)

    cls_params, cls_losses, cls_acc = stage("classifier", do_classifier)
    log(f"classifier: bce {cls_losses[0]:.4f} -> {cls_losses[-1]:.4f}, "
        f"val speech recall {cls_acc:.1%}")
    report["speech_classifier"] = {
        "train_first": round(cls_losses[0], 4),
        "train_last": round(cls_losses[-1], 4),
        "val_speech_recall": round(cls_acc, 4)}

    # ---- conditional WGAN-GP generators ----
    def do_cp_gan():
        gen = Generator()
        cri = Critic()
        gp, cp_, losses = pretrain.train_gan(
            gen, gen.init(next(keys), DTYPE),
            cri, cri.init(next(keys), DTYPE),
            lex_train, data_column="cp_norm", batch_size=BATCH,
            n_epochs=EPOCHS["gan"], exact_batch_only=True,
            progress=epoch_progress("cp_gan"))
        del cp_
        return jax.device_get(gp), losses

    def do_mel_gan():
        gen = Generator(output_size=60)
        cri = Critic(input_size=60)
        gp, cp_, losses = pretrain.train_gan(
            gen, gen.init(next(keys), DTYPE),
            cri, cri.init(next(keys), DTYPE),
            lex_train, data_column="melspec_norm_synthesized",
            batch_size=BATCH, n_epochs=EPOCHS["gan"], exact_batch_only=True,
            progress=epoch_progress("mel_gan"))
        del cp_
        return jax.device_get(gp), losses

    cp_gan_params, cp_gan_losses = stage("cp_gan", do_cp_gan)
    mel_gan_params, mel_gan_losses = stage("mel_gan", do_mel_gan)
    log(f"cp_gan final (critic, gen) {cp_gan_losses[-1]}; "
        f"mel_gan final {mel_gan_losses[-1]}")
    report["cp_gan"] = {"last_critic_gen": list(
        np.round(cp_gan_losses[-1], 4))}
    report["mel_gan"] = {"last_critic_gen": list(
        np.round(mel_gan_losses[-1], 4))}

    # ---- package ----
    weights = {
        "predictive": pred_params, "inverse": inv_params,
        "embedder": emb_params, "cp_gan": cp_gan_params,
        "mel_gan": mel_gan_params, "speech_classifier": cls_params,
        "cp_tube": tube_params, "tube_mel": tmel_params,
        "tube_embedder": temb_params,
    }
    meta = {"recipe": "tools/train_release_weights.py",
            "trained_on": "TPU v5e (single chip), synthetic babble + "
                          "lexicon via the in-repo C++ synthesizer",
            "seed": 20260820}
    path = release.save_release(weights, metadata=meta,
                                path=os.environ.get("RELEASE_OUT"))
    digest = release.sha256(path)
    size_mb = os.path.getsize(path) / 1e6
    log(f"release written: {path} ({size_mb:.1f} MB, sha256 {digest})")

    report["artifact"] = {
        "path": os.path.relpath(path,
                                os.path.dirname(os.path.dirname(
                                    os.path.abspath(__file__)))),
        "sha256": digest, "size_mb": round(size_mb, 1),
        "storage_dtype": "float16",
        "total_wall_s": round(time.perf_counter() - t_start, 1)}

    out = os.environ.get("RELEASE_REPORT") or os.path.join(
        "docs", "measurements", "weights_r05.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
