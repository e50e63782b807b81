"""Chunked / overlapped planning of long utterances.

The reference declares ``plan_iterative(..., overlap=8)`` but leaves it an
unimplemented stub (/root/reference/paule/paule.py:383-388).  This is the
real implementation — our one deliberate capability extension, since the API
already promises it (SURVEY.md §7 build order step 7):

* an acoustic target is split into chunks of ``chunk_size`` mel frames; a
  semvec-only target is a sequence of words, each a (300,) embedding with a
  mel-frame length — every word plans against its mel-GAN generated target
  mel (the plan_resynth semvec-only path, reference paule.py:515-522);
* each chunk/word is planned with ``plan_resynth``, conditioning on the last
  ``overlap`` cp frames of the previously planned audio via ``past_cp`` (the
  reference's own continuation mechanism, paule.py:575-583);
* planned chunks are stitched (the conditioned prefix is dropped).

Long sequences thus never enter a single compilation — each chunk compiles
once and is reused for every same-length chunk.
"""

import numpy as np

from ..dsp.targets import audio_target_to_mel


def plan_iterative(paule_obj, *, target_acoustic=None, target_semvecs=None,
                   target_seq_lengths=None, overlap=8, chunk_size=64,
                   **kwargs):
    """Plan a long utterance in overlapping chunks.

    Returns ``(planned_cp, results)`` where ``planned_cp`` is the stitched
    (seq, 30) trajectory and ``results`` the per-chunk PlanningResults.
    """
    if overlap % 2 != 0:
        raise ValueError("overlap must be an even number of cp frames")

    if target_acoustic is None and target_semvecs is None:
        raise ValueError(
            "Either target_acoustic or target_semvecs has to be not None.")

    # per-chunk plan_resynth target kwargs
    if target_acoustic is not None:
        # acoustic target: build the full normalized mel and chunk it
        _sig, _sr, mel = audio_target_to_mel(target_acoustic)

        n_frames = mel.shape[0]
        chunks = []
        start = 0
        while start < n_frames:
            end = min(start + chunk_size, n_frames)
            if n_frames - end < chunk_size // 4 and end < n_frames:
                end = n_frames  # absorb a tiny tail into the last chunk
            chunks.append((start, end))
            start = end
        targets = [{"target_acoustic": mel[a:b]} for (a, b) in chunks]
    else:
        # semvec-only: one chunk per word; plan_resynth generates each
        # word's target mel with the mel GAN (reference paule.py:515-522)
        target_semvecs = np.asarray(target_semvecs)
        if target_semvecs.ndim == 1:
            target_semvecs = target_semvecs[None]
        if target_seq_lengths is None:
            raise ValueError(
                "semvec-only iterative planning needs target_seq_lengths "
                "(mel frames per word)")
        target_seq_lengths = np.atleast_1d(np.asarray(target_seq_lengths))
        if len(target_seq_lengths) != len(target_semvecs):
            raise ValueError(
                "target_semvecs and target_seq_lengths must have the same "
                "length")
        targets = [
            {"target_acoustic": None, "target_semvec": sv,
             "target_seq_length": int(length)}
            for sv, length in zip(target_semvecs, target_seq_lengths)
        ]
        kwargs.setdefault("objective", "acoustic_semvec")

    results = []
    planned_parts = []
    past_cp = None
    kwargs.setdefault("verbose", False)
    kwargs.pop("initialize_from", None)
    for target_kwargs in targets:
        res = paule_obj.plan_resynth(
            past_cp=past_cp, initialize_from="acoustic",
            **target_kwargs, **kwargs)
        results.append(res)
        planned = res.planned_cp
        past_len = 0 if past_cp is None else past_cp.shape[0]
        planned_new = planned[past_len:]
        planned_parts.append(planned_new)
        past_cp = planned[-overlap:] if overlap > 0 else None

    planned_cp = np.concatenate(planned_parts, axis=0)
    return planned_cp, results
