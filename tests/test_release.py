"""The in-repo pretrained-weight release (paule_tpu.release): artifact
round-trip, Paule() default resolution, and the random-init escape hatch.
Role parity: the reference's weight distribution,
/root/reference/paule/util.py:936-966."""

import numpy as np
import pytest

from paule_tpu import release


def small_weights():
    rng = np.random.default_rng(0)
    return {
        "predictive": {"lstm": [{"w_ih": rng.normal(size=(4, 8)),
                                 "w_hh": rng.normal(size=(2, 8)),
                                 "b": rng.normal(size=8)}],
                       "post_linear": {"w": rng.normal(size=(2, 3)),
                                       "b": np.zeros(3)}},
        "embedder": {"linears": [{"w": rng.normal(size=(3, 3)),
                                  "b": np.zeros(3)}],
                     "flag": None},
    }


def test_roundtrip_structure_and_dtype(tmp_path):
    w = small_weights()
    path = release.save_release(
        w, path=str(tmp_path / "rel.npz"), metadata={"note": "test"})
    loaded, meta = release.load_release(path)
    assert meta["version"] == release.RELEASE_VERSION
    assert meta["note"] == "test"
    assert sorted(meta["models"]) == ["embedder", "predictive"]
    assert isinstance(loaded["predictive"]["lstm"], list)
    assert loaded["embedder"]["flag"] is None
    assert loaded["predictive"]["post_linear"]["w"].dtype == np.float32
    # float16 storage: equal to ~1e-3, not bit-equal
    np.testing.assert_allclose(
        loaded["predictive"]["lstm"][0]["w_ih"],
        w["predictive"]["lstm"][0]["w_ih"], rtol=2e-3, atol=2e-3)
    # f64 load path
    loaded64, _ = release.load_release(path, dtype=np.float64)
    assert loaded64["predictive"]["lstm"][0]["w_hh"].dtype == np.float64


def test_unknown_model_key_rejected(tmp_path):
    with pytest.raises(ValueError, match="unknown model keys"):
        release.save_release({"nonsense": {"w": np.zeros(2)}},
                             path=str(tmp_path / "x.npz"))


def test_sha256_stable(tmp_path):
    path = release.save_release(small_weights(),
                                path=str(tmp_path / "rel.npz"))
    assert release.sha256(path) == release.sha256(path)


def test_no_release_env_forces_fallback(monkeypatch):
    monkeypatch.setenv("PAULE_TPU_NO_RELEASE", "1")
    assert not release.release_available()


@pytest.mark.slow
def test_paule_resolution_modes(tmp_path, monkeypatch):
    """Paule() loads the release when present; pretrained_dir='random'
    ignores it; absence falls back to seeded random init."""
    from paule_tpu.api import Paule

    # a real-shaped release for just the predictive model
    probe = Paule(seed=5, pretrained_dir="random")
    pred = probe.pred_params
    import jax

    bumped = jax.tree.map(lambda a: np.asarray(a) * 0 + 0.125, pred)
    path = release.save_release({"predictive": bumped},
                                path=str(tmp_path / "rel.npz"))
    monkeypatch.setattr(release, "release_path",
                        lambda version=release.RELEASE_VERSION: path)

    p_auto = Paule(seed=5)
    leaf = np.asarray(
        jax.tree_util.tree_leaves(p_auto.pred_params)[0])
    assert np.allclose(leaf, 0.125)

    p_rand = Paule(seed=5, pretrained_dir="random")
    leaf_r = np.asarray(
        jax.tree_util.tree_leaves(p_rand.pred_params)[0])
    assert not np.allclose(leaf_r, 0.125)
    # same-seed random init is deterministic
    leaf_p = np.asarray(
        jax.tree_util.tree_leaves(probe.pred_params)[0])
    np.testing.assert_array_equal(leaf_r, leaf_p)
