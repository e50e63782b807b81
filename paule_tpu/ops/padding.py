"""Sequence padding / batching helpers (host-side, numpy).

Behavioral contracts from the reference (/root/reference/paule/util.py:252-269,
483-540, 674-726): padding repeats the *last value* (not zeros) so that the
unmasked losses the trainer uses are only mildly perturbed by padding, and the
optional onset channel marks the first frame of each sequence.
"""

import numpy as np


def audio_padding(sig, samplerate, winlen=0.010):
    """Zero-pad half a window length on each side."""
    pad = int(np.ceil(samplerate * winlen) / 2)
    z = np.zeros(pad)
    return np.concatenate((z, sig, z))


def pad_same_to_even_seq_length(seq):
    if seq.shape[0] % 2 == 0:
        return seq
    return np.concatenate((seq, seq[-1:, :]), axis=0)


def half_seq_by_average_pooling(seq):
    if len(seq) % 2:
        seq = pad_same_to_even_seq_length(seq)
    return (seq[::2, :] + seq[1::2, :]) / 2


def add_and_pad(xx, max_len, with_onset_dim=False):
    """Pad a (seq, feat) array to ``max_len`` by repeating its last row."""
    xx = np.asarray(xx)
    seq_length = xx.shape[0]
    if with_onset_dim:
        onset = np.zeros((seq_length, 1), dtype=xx.dtype)
        onset[0, 0] = 1
        xx = np.concatenate((xx, onset), axis=1)
    if max_len < seq_length:
        raise ValueError(f"max_len {max_len} < sequence length {seq_length}")
    if max_len > seq_length:
        reps = (max_len - seq_length,) + (1,) * (xx.ndim - 1)
        xx = np.concatenate((xx, np.tile(xx[-1:], reps)), axis=0)
    return xx


def pad_batch(lens, sequences, with_onset_dim=False, dtype=None):
    """Stack variable-length sequences into one (batch, max_len, feat) array.

    ``sequences`` is any iterable of (seq_i, feat) arrays (e.g. a pandas
    Series like the reference's ``pad_batch_online``).
    """
    max_len = int(max(int(l) for l in lens))
    out = np.stack(
        [add_and_pad(x, max_len, with_onset_dim=with_onset_dim) for x in sequences]
    )
    if dtype is not None:
        out = out.astype(dtype)
    return out


# reference-compatible alias
pad_batch_online = pad_batch
