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


def test_staleness_policy(tmp_path):
    """Drift policy (VERDICT r4 #7): a tolerated numeric key may drift
    within rel_tol, ignored keys may drift freely, everything else
    stays exact — and a miss falls through to retrain-and-version."""
    store = ModelStore(str(tmp_path))
    meta1 = {"source": "x", "k": 4, "trainer": "t1", "size": 1000, "mtime_ns": 111}
    m1 = _model(1)
    assert store.save("m", km.model_to_table(m1), meta1) == 1

    # exact mode: any size/mtime drift is a miss (today's behavior)
    grew_2pct = {**meta1, "size": 1020, "mtime_ns": 222}
    assert store.load("m", expect_meta=grew_2pct) is None

    # 2% growth within a 5% tolerance, mtime ignored: served stale
    pol = {"size": 0.05, "mtime_ns": None}
    hit = store.load("m", expect_meta=grew_2pct, staleness=pol)
    assert hit is not None and hit[1]["version"] == 1

    # keys outside the policy still match exactly
    assert (
        store.load("m", expect_meta={**grew_2pct, "trainer": "t2"}, staleness=pol)
        is None
    )

    # 100% growth exceeds tolerance -> miss -> caller retrains+versions
    doubled = {**meta1, "size": 2000, "mtime_ns": 333}
    assert store.load("m", expect_meta=doubled, staleness=pol) is None
    m2 = _model(2)
    assert store.save("m", km.model_to_table(m2), doubled) == 2  # monotone
    assert store.versions("m") == [1, 2]

    # the fresh version now wins for its own identity...
    t2, got2 = store.load("m", expect_meta=doubled, staleness=pol)
    assert got2["version"] == 2
    np.testing.assert_array_equal(km.model_from_table(t2)["c4"], m2["c4"])
    # ...and newest-first scan serves it for near-doubled sources too
    t3, got3 = store.load(
        "m", expect_meta={**doubled, "size": 2040}, staleness=pol
    )
    assert got3["version"] == 2


def test_kmeans_drift_policy(ray_session, tmp_path, monkeypatch):
    """End to end on the kmeans path: model reused across a small
    source change, retrained exactly once after a large append,
    versions monotone."""
    import shutil

    import pyarrow.parquet as pq

    from go_data_publisher_ray.pipelines import queries as q

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    shutil.copy("/root/testdata/sf0.001/embeddings.parquet",
                os.path.join(sf, "embeddings.parquet"))
    monkeypatch.setenv("GDP_MODEL_DIR", str(tmp_path / "models"))
    monkeypatch.setenv("GDP_MODEL_STALENESS", "0.05")
    monkeypatch.setattr(q, "_KM_MODELS", {})

    calls = []
    real_train = km.train_kmeans
    def counting_train(*a, **kw):
        calls.append(1)
        return real_train(*a, **kw)
    monkeypatch.setattr(km, "train_kmeans", counting_train)

    trained = q._kmeans_model(sf)
    assert len(calls) == 1

    # small change: same bytes, new mtime (regenerated source) — served
    # from the store, no retrain, fresh process simulated via empty cache
    src = os.path.join(sf, "embeddings.parquet")
    os.utime(src, ns=(os.stat(src).st_atime_ns, os.stat(src).st_mtime_ns + 10**9))
    monkeypatch.setattr(q, "_KM_MODELS", {})
    served = q._kmeans_model(sf)
    assert len(calls) == 1
    np.testing.assert_array_equal(served["c4"], trained["c4"])

    # large append: ~2x rows — exceeds 5% tolerance, retrains ONCE
    t = pq.read_table(src)
    pq.write_table(pa.concat_tables([t, t]), src)
    monkeypatch.setattr(q, "_KM_MODELS", {})
    q._kmeans_model(sf)
    assert len(calls) == 2

    store = ModelStore(str(tmp_path / "models"))
    names = os.listdir(str(tmp_path / "models"))
    assert len(names) == 1  # one lineage: stable identity names the model
    assert store.versions(names[0]) == [1, 2]

    # and the retrained version is served thereafter with no new pass
    monkeypatch.setattr(q, "_KM_MODELS", {})
    q._kmeans_model(sf)
    assert len(calls) == 2


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
