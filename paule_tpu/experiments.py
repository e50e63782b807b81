"""Corpus planning experiments — the reference's ``gradient_planning.ipynb``
workflow (/root/reference/paule/gradient_planning.ipynb cells 0-39) as a
first-class, resume-safe API:

* discover target recordings (flac/wav) under a directory, skipping
  utterances that already have results;
* optionally seed the continue-learning replay buffer from a validation
  DataFrame pickle (columns ``vector``, ``cp_norm``,
  ``melspec_norm_synthesized``; flagged ``segment_data=True``);
* plan every utterance with :meth:`paule_tpu.api.Paule.plan_resynth`,
  saving per-utterance pickled results, planned/best audio and a model
  checkpoint as it goes;
* aggregate final per-utterance losses to ``results_loss.txt`` and a
  ``final_results.pkl`` DataFrame.

The planning of *independent* utterances is also the natural data-parallel
axis on TPU — see :mod:`paule_tpu.parallel.batched` for planning a batch of
same-length utterances sharded over a device mesh.
"""

import os
import pickle
import random

import numpy as np


AUDIO_EXTS = (".flac", ".wav")


def discover_targets(data_dir, *, save_dir=None, shuffle=True, seed=23082022):
    """List audio files under ``data_dir`` (one subdirectory per label, like
    the reference's corpus layout), omitting files whose results already
    exist under ``save_dir`` — so an interrupted run resumes where it
    stopped."""
    files = []
    for root, _dirs, names in os.walk(data_dir):
        for name in sorted(names):
            if name.endswith(AUDIO_EXTS) and not name.startswith("._"):
                files.append(os.path.join(root, name))
    if shuffle:
        random.Random(seed).shuffle(files)
    if save_dir and os.path.isdir(save_dir):
        done = set()
        for root, _dirs, names in os.walk(save_dir):
            for name in names:
                if (name.endswith("_results.pkl")
                        and name != "final_results.pkl"):
                    done.add(name[: -len("_results.pkl")])
                elif name.endswith("_batched.pkl"):
                    done.add(name[: -len("_batched.pkl")])
        files = [f for f in files
                 if os.path.splitext(os.path.basename(f))[0] not in done]
    return files


def load_continue_data(valid_pickle, *, n_samples=12, seed=23082022):
    """Subsample a validation DataFrame pickle into a replay buffer seed
    (reference notebook cells 4-8)."""
    import pandas as pd

    valid = pd.read_pickle(valid_pickle)
    rng = random.Random(seed)
    idx = rng.sample(range(len(valid)), min(n_samples, len(valid)))
    cols = [c for c in ("vector", "cp_norm", "melspec_norm_synthesized",
                        "tube_norm") if c in valid.columns]
    data = valid.iloc[idx][cols].copy().reset_index(drop=True)
    data["segment_data"] = True
    return data


def label_of(path):
    """Label convention of the reference corpus: ``<name>_<label>.flac``."""
    stem = os.path.splitext(os.path.basename(path))[0]
    return stem.split("_")[-1]


def plan_corpus(paule_model, files, save_dir, *, semvec_lookup=None,
                checkpoint_every=10, write_audio=True, plan_kwargs=None,
                verbose=True):
    """Plan every utterance in ``files``, saving results incrementally.

    ``semvec_lookup``: optional ``label -> (300,) vector`` mapping (e.g.
    built from the reference's ``lexical_embedding_vectors.pkl``); without
    it the target semvec is inferred from the target audio by the embedder,
    like ``plan_resynth`` does by default.

    Returns the list of per-utterance result-file paths.
    """
    from .dsp import audio as audio_io

    plan_kwargs = dict(plan_kwargs or {})
    plan_kwargs.setdefault("objective", "acoustic_semvec")
    plan_kwargs.setdefault("initialize_from", "acoustic")
    plan_kwargs.setdefault("verbose", False)

    os.makedirs(save_dir, exist_ok=True)
    if not files and verbose:
        print("plan_corpus: no target files to plan (corpus empty or "
              "everything already planned)")
    result_files = []
    for i, path in enumerate(files):
        label = label_of(path)
        out_dir = os.path.join(save_dir, label)
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(path))[0]
        prefix = os.path.join(out_dir, stem)

        kwargs = dict(plan_kwargs)
        if semvec_lookup is not None:
            vec = semvec_lookup(label) if callable(semvec_lookup) \
                else semvec_lookup.get(label)
            if vec is not None:
                kwargs["target_semvec"] = np.asarray(vec)

        if verbose:
            print(f"[{i + 1}/{len(files)}] planning {path}")
        results = paule_model.plan_resynth(target_acoustic=path, **kwargs)

        with open(prefix + "_results.pkl", "wb") as fh:
            pickle.dump(results, fh, protocol=4)
        result_files.append(prefix + "_results.pkl")
        if write_audio:
            audio_io.write(prefix + "_planned.flac", results.prod_sig,
                           results.prod_sr)
            best = paule_model.best_synthesis_acoustic
            if best is not None and best.prod_sig is not None:
                audio_io.write(prefix + "_best_planned.flac", best.prod_sig,
                               results.prod_sr)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            paule_model.save_state(os.path.join(save_dir, "checkpoint.pkl"))

    if checkpoint_every:
        paule_model.save_state(os.path.join(save_dir, "checkpoint.pkl"))
    return result_files


def plan_corpus_batched(paule_model, targets, *, mesh=None, max_batch=8,
                        semvecs=None, plan_kwargs=None, verbose=True,
                        on_result=None, pad_to_multiple=None):
    """Plan a corpus data-parallel: utterances bucket by EXACT mel length
    (no padding, no masking — planning losses stay exact, mirroring the
    same-size batching idea of continue-learning), each bucket splits into
    batches of ``<= max_batch``, and every batch plans in one
    :func:`paule_tpu.parallel.batched.plan_batch_resynth` call (per-utterance
    Adam states, dp-sharded over ``mesh`` when given).

    ``max_batch=8`` is the measured single-chip knee: the planning scan's
    wall is latency-flat through B=8 (~7.6x utterance throughput), and
    beyond it each doubling costs ~1.5-1.6x wall for ~1.2-1.4x throughput
    (docs/measurements/batch_scaling_r04.json).  Raise it only when
    per-utterance latency is irrelevant; a dp mesh multiplies the knee.

    ``targets``: list of audio file paths, ``(sig, sr)`` tuples, or
    precomputed normalized ``(F, 60)`` mels.  ``semvecs``: optional
    per-utterance (300,) vectors aligned with ``targets``.

    Returns a list (input order) of per-utterance dicts with ``planned_cp``,
    ``prod_sig``, ``prod_loss_curve`` (per outer iteration) and any variant
    metric curves the model logs.  ``on_result(index, result)`` fires as
    soon as each utterance's batch completes (for incremental/resume-safe
    persistence).

    ``pad_to_multiple``: with exact-length bucketing alone, a realistic
    corpus of diverse lengths degenerates into many B=1 buckets (one XLA
    compilation each).  Set e.g. ``pad_to_multiple=16`` to round every
    target mel length UP to a multiple of 16 frames by appending silence
    frames (exactly 0 in normalized units — the anchor value), merging
    near-lengths into shared buckets; planned trajectories and produced
    outputs are trimmed back to each utterance's true length.  The
    trailing frames plan a bit of silence, which costs a few percent of
    compute but no loss fidelity on the real frames (losses in
    ``*_curve`` are still computed over the padded target; final
    reported metrics should use the trimmed outputs).
    """
    from .dsp.targets import audio_target_to_mel
    from .parallel import batched

    plan_kwargs = dict(plan_kwargs or {})
    plan_kwargs.setdefault("objective", "acoustic_semvec")

    def to_mel(t):
        if isinstance(t, str) or (isinstance(t, tuple) and len(t) == 2):
            return audio_target_to_mel(t)[2]
        return np.asarray(t)  # precomputed normalized mel

    mels = [to_mel(t) for t in targets]
    true_frames = [m.shape[0] for m in mels]
    if pad_to_multiple:
        k = int(pad_to_multiple)
        mels = [np.pad(m, ((0, (-m.shape[0]) % k), (0, 0)))
                if m.shape[0] % k else m for m in mels]
    buckets = {}
    for i, m in enumerate(mels):
        buckets.setdefault(m.shape[0], []).append(i)

    results = [None] * len(targets)
    for length in sorted(buckets):
        idxs = buckets[length]
        for start in range(0, len(idxs), max_batch):
            batch_idx = idxs[start:start + max_batch]
            tmels = np.stack([mels[i] for i in batch_idx])
            tsem = (np.stack([np.asarray(semvecs[i]) for i in batch_idx])
                    if semvecs is not None else None)
            batch_mesh = mesh
            if mesh is not None and len(batch_idx) % mesh.shape["dp"] != 0:
                batch_mesh = None  # leftover batch runs unsharded
            if verbose:
                print(f"planning bucket len={length}: "
                      f"{len(batch_idx)} utterances")
            out = batched.plan_batch_resynth(
                paule_model, tmels, tsem, mesh=batch_mesh, **plan_kwargs)
            for j, i in enumerate(batch_idx):
                n_true = true_frames[i]
                per = {
                    "planned_cp": out["planned_cp"][j][:2 * n_true],
                    "prod_sig": out["prod_sigs"][j][:(2 * n_true - 1) * 110],
                    "prod_mel": out["prod_mels"][j][:n_true],
                    "prod_loss_curve": out["prod_loss_curve"][:, j],
                }
                for key, val in out.items():
                    if key.endswith("_curve") and key != "prod_loss_curve":
                        per[key] = val[:, j]
                results[i] = per
                if on_result is not None:
                    on_result(i, per)
    return results


def collect_results(save_dir, *, out_txt="results_loss.txt",
                    out_pickle="final_results.pkl"):
    """Aggregate per-utterance final losses (reference notebook cells
    29-37): one row per utterance with the last produced mel / semvec /
    planned losses; writes a tab-separated txt and a DataFrame pickle."""
    import pandas as pd

    rows = []
    for root, _dirs, names in os.walk(save_dir):
        for name in sorted(names):
            if name.endswith("_batched.pkl"):
                # plan_corpus_batched per-utterance dicts
                with open(os.path.join(root, name), "rb") as fh:
                    res = pickle.load(fh)
                rows.append({
                    "file": name[: -len("_batched.pkl")],
                    "label": os.path.basename(root),
                    "prod_loss": float(res["prod_loss_curve"][-1]),
                    "planned_loss": np.nan,
                    "planned_mel_loss": np.nan,
                    "vel_loss": np.nan,
                    "jerk_loss": np.nan,
                    "prod_semvec_loss": float(
                        res["prod_semvec_loss_curve"][-1])
                    if "prod_semvec_loss_curve" in res else np.nan,
                    "planned_cp": res["planned_cp"],
                    "prod_mel": res["prod_mel"],
                    "prod_semvec": None,
                })
                continue
            if (not name.endswith("_results.pkl")
                    or name == "final_results.pkl"):
                continue
            with open(os.path.join(root, name), "rb") as fh:
                res = pickle.load(fh)
            row = {
                "file": name[: -len("_results.pkl")],
                "label": os.path.basename(root),
                "prod_loss": res.prod_loss_steps[-1]
                if res.prod_loss_steps else np.nan,
                "planned_loss": res.planned_loss_steps[-1]
                if res.planned_loss_steps else np.nan,
                "planned_mel_loss": res.planned_mel_loss_steps[-1]
                if res.planned_mel_loss_steps else np.nan,
                "vel_loss": res.vel_loss_steps[-1]
                if res.vel_loss_steps else np.nan,
                "jerk_loss": res.jerk_loss_steps[-1]
                if res.jerk_loss_steps else np.nan,
                "prod_semvec_loss": res.prod_semvec_loss_steps[-1]
                if res.prod_semvec_loss_steps else np.nan,
                "planned_cp": res.planned_cp,
                "prod_mel": res.prod_mel,
                "prod_semvec": res.prod_semvec,
            }
            rows.append(row)
    all_cols = ["file", "label", "prod_loss", "planned_loss",
                "planned_mel_loss", "vel_loss", "jerk_loss",
                "prod_semvec_loss", "planned_cp", "prod_mel", "prod_semvec"]
    # explicit columns so an empty corpus yields an empty frame with the
    # documented schema instead of a KeyError on the column selection below
    final = pd.DataFrame(rows, columns=all_cols)
    if out_txt:
        cols = all_cols[:8]
        final[cols].to_csv(os.path.join(save_dir, out_txt), sep="\t",
                           index=False)
    if out_pickle:
        final.to_pickle(os.path.join(save_dir, out_pickle), protocol=4)
    return final
