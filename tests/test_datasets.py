"""Dataset loading + preprocessing tests (runs with real files if present,
synthetic surrogates otherwise)."""

import numpy as np
import pytest

from particles_tpu import datasets


class TestPreprocessing:
    def test_prepare_predictors(self):
        rng = np.random.default_rng(0)
        X = rng.normal(loc=3.0, scale=2.0, size=(100, 4))
        out = datasets.prepare_predictors(X)
        assert out.shape == (100, 5)
        np.testing.assert_allclose(out[:, 0], 1.0)
        np.testing.assert_allclose(out[:, 1:].mean(axis=0), 0.0, atol=1e-6)
        np.testing.assert_allclose(out[:, 1:].std(axis=0), 0.5, atol=1e-6)

    def test_no_intercept(self):
        X = np.random.default_rng(1).normal(size=(50, 3))
        out = datasets.prepare_predictors(X, add_intercept=False)
        assert out.shape == (50, 3)


@pytest.mark.parametrize("cls", [datasets.Boston, datasets.Concrete])
def test_regression_datasets(cls):
    d = cls()
    preds, resp = d.data
    assert preds.ndim == 2 and resp.ndim == 1
    assert preds.shape[0] == resp.shape[0]
    np.testing.assert_allclose(preds[:, 0], 1.0)


@pytest.mark.parametrize(
    "cls", [datasets.Pima, datasets.Liver, datasets.Eeg, datasets.Sonar]
)
def test_binary_datasets(cls):
    d = cls()
    flipped = d.data
    assert flipped.ndim == 2
    d2 = cls(return_y=True)
    preds, y = d2.data
    assert set(np.unique(y)) <= {-1.0, 1.0}
    np.testing.assert_allclose(preds * y[:, None], flipped, atol=1e-10)


def test_log_returns():
    d = datasets.GBP_vs_USD_9798()
    assert d.data.ndim == 1
    assert d.data.shape[0] == d.raw_data.shape[0] - 1
    assert np.isfinite(d.data).all()


@pytest.mark.parametrize("cls", [datasets.Nutria, datasets.Neuro])
def test_timeseries_datasets(cls):
    d = cls()
    assert d.data.ndim == 1
    assert np.isfinite(d.data).all()
    assert (d.data >= 0).all()


REAL_RAW_SHAPES = {
    datasets.Nutria: (120,),
    datasets.Neuro: (3000,),
    datasets.GBP_vs_USD_9798: (751,),
    datasets.Boston: (506, 14),
    datasets.Concrete: (1030, 9),
    datasets.Pima: (768, 9),
    datasets.Liver: (579, 11),
    datasets.Eeg: (14980, 15),
    datasets.Sonar: (208, 61),
}


@pytest.mark.parametrize("cls", list(REAL_RAW_SHAPES))
def test_real_data_bundled(cls):
    """The nine raw files ship with the package: every dataset must load
    real data (no synthetic surrogate) from particles_tpu/data, regardless
    of whether a reference checkout exists."""
    from pathlib import Path

    pkg_data = Path(datasets.__file__).parent / "data"
    assert (pkg_data / cls.file_name).exists(), cls.file_name
    d = cls()
    assert not d.synthetic
    assert d.raw_data.shape == REAL_RAW_SHAPES[cls]


def test_synthetic_fallback_warns():
    class Missing(datasets.Nutria):
        file_name = "definitely_not_a_file.txt"

    with pytest.warns(UserWarning, match="SYNTHETIC"):
        d = Missing()
    assert d.synthetic


def test_prepare_predictors_1d_vector():
    """Regression: a single (n,) predictor must become an (n, 2) design
    matrix, not a (1, n) all-NaN row (np.atleast_2d footgun)."""
    from particles_tpu import datasets

    out = datasets.prepare_predictors(np.array([1.0, 2.0, 3.0, 4.0]))
    assert out.shape == (4, 2)
    assert np.isfinite(out).all()
    assert (out[:, 0] == 1.0).all()
    np.testing.assert_allclose(out[:, 1].std(), 0.5, rtol=1e-6)
