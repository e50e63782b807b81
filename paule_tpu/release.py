"""In-repo pretrained-weight release.

The reference distributes 200 MB of externally trained weights via a
network download (/root/reference/paule/util.py:936-966) and its whole
planning story assumes them.  That artifact is a separate download and the
training corpus behind it is not public; this framework instead ships its
OWN versioned weight release, trained from scratch on TPU with
:mod:`paule_tpu.pretrain` (motor babbling through the C++ synthesizer plus
a synthetic lexicon for the semantic models — recipe:
``tools/train_release_weights.py``), committed in the repo so
``Paule()`` constructs usable models with **zero network access**.

Artifact format: a single compressed ``.npz`` holding every model's
parameter pytree (float16 on disk, cast to the session dtype at load), the
tree structures as a JSON manifest, and release metadata.  No pickle: the
artifact is data-only and loading it executes nothing.

Weight resolution in :class:`paule_tpu.api.Paule`:

* ``pretrained_dir=None`` (default) — load the in-repo release if present,
  else fall back to seeded random init (a one-line hint is printed once).
  ``PAULE_TPU_NO_RELEASE=1`` forces the fallback.
* ``pretrained_dir="random"`` — explicit seeded random initialization.
* ``pretrained_dir=<path>`` — convert a reference-layout torch checkpoint
  directory (``paule/pretrained_models/``).
"""

import json
import os

import numpy as np

#: bumped on every re-training; the artifact embeds it
RELEASE_VERSION = "v1"

RELEASE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "pretrained_weights")
RELEASE_BASENAME = "paule_tpu_release_{version}.npz"

#: model keys the release may carry (same keys Paule._load_pretrained
#: produces; somatosensory + speech-classifier models included so every
#: planning variant starts trained)
MODEL_KEYS = ("predictive", "inverse", "embedder", "cp_gan", "mel_gan",
              "speech_classifier", "cp_tube", "tube_mel", "tube_embedder")

_PRINTED_FALLBACK_HINT = False


def release_path(version=RELEASE_VERSION):
    return os.path.join(RELEASE_DIR,
                        RELEASE_BASENAME.format(version=version))


def release_available(version=RELEASE_VERSION):
    if os.environ.get("PAULE_TPU_NO_RELEASE", "0") == "1":
        return False
    return os.path.exists(release_path(version))


# ---------------------------------------------------------------------------
# pytree <-> flat-arrays round trip (data-only, no pickle)
# ---------------------------------------------------------------------------

def _flatten(tree, prefix, arrays):
    """Recursively flatten a dict/list/tuple pytree of numpy-compatible
    leaves into ``arrays`` (npz payload) and a JSON-able ``manifest``
    mirroring the structure with leaf ids at the leaves."""
    if isinstance(tree, dict):
        return {k: _flatten(v, f"{prefix}.{k}", arrays)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [_flatten(v, f"{prefix}[{i}]", arrays)
               for i, v in enumerate(tree)]
        return {"__list__": out}
    if tree is None:
        return {"__none__": True}
    leaf = np.asarray(tree)
    if np.issubdtype(leaf.dtype, np.floating):
        leaf = leaf.astype(np.float16)
    arrays[prefix] = leaf
    return {"__leaf__": prefix}


def _unflatten(node, arrays, cast):
    if isinstance(node, dict):
        if "__leaf__" in node:
            return cast(arrays[node["__leaf__"]])
        if "__none__" in node:
            return None
        if "__list__" in node:
            return [_unflatten(v, arrays, cast) for v in node["__list__"]]
        return {k: _unflatten(v, arrays, cast) for k, v in node.items()}
    raise ValueError(f"malformed release manifest node: {node!r}")


def save_release(weights, *, path=None, version=RELEASE_VERSION,
                 metadata=None):
    """Write a release artifact.  ``weights`` maps model keys (subset of
    :data:`MODEL_KEYS`) to parameter pytrees.  Returns the path."""
    unknown = set(weights) - set(MODEL_KEYS)
    if unknown:
        raise ValueError(f"unknown model keys: {sorted(unknown)}")
    path = path or release_path(version)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays, manifest = {}, {}
    for key, tree in weights.items():
        import jax

        host = jax.tree.map(lambda a: np.asarray(a), tree)
        manifest[key] = _flatten(host, key, arrays)
    meta = {"version": version, "models": sorted(weights),
            "format": 1, **(metadata or {})}
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"meta": meta, "trees": manifest}).encode(),
        dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_release(path=None, *, dtype=None, version=RELEASE_VERSION):
    """Load a release artifact -> dict of model-key -> parameter pytree
    (numpy arrays, float leaves cast to ``dtype`` or float32)."""
    path = path or release_path(version)
    with np.load(path) as npz:
        payload = json.loads(bytes(npz["__manifest__"].tobytes()).decode())
        arrays = {k: npz[k] for k in npz.files if k != "__manifest__"}
    target = np.dtype(dtype) if dtype is not None else np.float32

    def cast(a):
        if np.issubdtype(a.dtype, np.floating):
            return a.astype(target)
        return a

    return {key: _unflatten(node, arrays, cast)
            for key, node in payload["trees"].items()}, payload["meta"]


def load_release_metadata(path=None, version=RELEASE_VERSION):
    path = path or release_path(version)
    with np.load(path) as npz:
        return json.loads(
            bytes(npz["__manifest__"].tobytes()).decode())["meta"]


def sha256(path=None, version=RELEASE_VERSION):
    import hashlib

    path = path or release_path(version)
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def print_fallback_hint_once():
    global _PRINTED_FALLBACK_HINT
    if not _PRINTED_FALLBACK_HINT:
        _PRINTED_FALLBACK_HINT = True
        print("paule_tpu: no pretrained weight release found — models "
              "start from seeded random init (train your own with "
              "tools/train_release_weights.py, or pass pretrained_dir=)")
