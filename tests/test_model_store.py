"""Durable trained-model store (VERDICT r3 #6): a second process (or
node) must serve IVF queries with ZERO training passes — the trained
centroids persist as versioned parquet keyed by source identity and
hyper-parameters, and a reload is bit-exact."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from go_data_publisher_ray.stages import kmeans as km
from go_data_publisher_ray.state.models import ModelStore


def _model(seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    return {
        "cell_ids": np.arange(4, dtype=np.int64),
        "c4": rng.integers(-10_000, 10_000, (4, 8)).astype(np.int64),
    }


def test_roundtrip_and_versioning(tmp_path):
    store = ModelStore(str(tmp_path))
    meta = {"source": "x", "k": 4, "trainer": "t1"}
    m1 = _model(1)
    v = store.save("kmeans_abc", km.model_to_table(m1), meta)
    assert v == 1
    t, got_meta = store.load("kmeans_abc", expect_meta=meta)
    back = km.model_from_table(t)
    np.testing.assert_array_equal(back["cell_ids"], m1["cell_ids"])
    np.testing.assert_array_equal(back["c4"], m1["c4"])
    assert got_meta["version"] == 1

    # a retrain appends; the newest matching version wins
    m2 = _model(2)
    assert store.save("kmeans_abc", km.model_to_table(m2), meta) == 2
    t2, meta2 = store.load("kmeans_abc", expect_meta=meta)
    np.testing.assert_array_equal(km.model_from_table(t2)["c4"], m2["c4"])
    assert meta2["version"] == 2

    # provenance mismatch (regenerated source, different k...) is a miss
    assert store.load("kmeans_abc", expect_meta={**meta, "k": 8}) is None
    assert store.load("nope", expect_meta=meta) is None


def test_crashed_save_is_not_served(tmp_path):
    """The meta json rename is the commit: a parquet without meta
    (crash window) must be skipped in favor of the last committed one."""
    store = ModelStore(str(tmp_path))
    meta = {"source": "x", "k": 4, "trainer": "t1"}
    m1 = _model(1)
    store.save("m", km.model_to_table(m1), meta)
    # fake a crash: v2 parquet exists, no meta
    import pyarrow.parquet as pq

    pq.write_table(
        km.model_to_table(_model(9)), os.path.join(str(tmp_path), "m", "v000002.parquet")
    )
    t, got = store.load("m", expect_meta=meta)
    assert got["version"] == 1
    np.testing.assert_array_equal(km.model_from_table(t)["c4"], m1["c4"])


def test_second_process_serves_without_training(
    ray_session, tmp_path, monkeypatch
):
    """The done-criterion: after one process trains and persists, a
    fresh process (fresh in-memory cache) must serve the model from the
    store — training is forbidden via monkeypatch."""
    from go_data_publisher_ray.pipelines import queries as q

    monkeypatch.setenv("GDP_MODEL_DIR", str(tmp_path / "models"))
    monkeypatch.setattr(q, "_KM_MODELS", {})
    sf = "/root/testdata/sf0.001"
    trained = q._kmeans_model(sf)

    # "new process": empty hot cache, training would blow up
    monkeypatch.setattr(q, "_KM_MODELS", {})
    def _no_train(*a, **kw):
        raise AssertionError("second process must not retrain")
    monkeypatch.setattr(km, "train_kmeans", _no_train)
    served = q._kmeans_model(sf)
    np.testing.assert_array_equal(served["cell_ids"], trained["cell_ids"])
    np.testing.assert_array_equal(served["c4"], trained["c4"])
