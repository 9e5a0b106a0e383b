"""Storage-adapter primitives (state/storage.py): both implementations
honor the same contract — atomic whole-object put, first-writer-wins
conditional put, atomic scratch-file promotion — and the manifest
commit points built on them behave identically (concurrent epoch
commits adopt the winner; compaction-id collisions fail loudly)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from go_data_publisher_ray.state.manifest import FileEntry, Manifest
from go_data_publisher_ray.state.storage import get_storage

ADAPTERS = ["posix", "objectstore"]


@pytest.mark.parametrize("name", ADAPTERS)
def test_put_bytes_overwrites(name, tmp_path):
    st = get_storage(name)
    p = str(tmp_path / "obj")
    st.put_bytes(p, b"one")
    st.put_bytes(p, b"two")
    assert open(p, "rb").read() == b"two"
    assert not [n for n in os.listdir(tmp_path) if n != "obj"], "no temp litter"


@pytest.mark.parametrize("name", ADAPTERS)
def test_put_if_absent_first_writer_wins(name, tmp_path):
    st = get_storage(name)
    p = str(tmp_path / "commit.json")
    assert st.put_bytes_if_absent(p, b"winner") is True
    assert st.put_bytes_if_absent(p, b"loser") is False
    assert open(p, "rb").read() == b"winner"
    assert not [n for n in os.listdir(tmp_path) if n != "commit.json"]


@pytest.mark.parametrize("name", ADAPTERS)
def test_finalize_file_promotes_and_consumes(name, tmp_path):
    st = get_storage(name)
    tmp, final = str(tmp_path / "scratch"), str(tmp_path / "data.parquet")
    with open(tmp, "wb") as f:
        f.write(b"payload")
    st.finalize_file(tmp, final)
    assert open(final, "rb").read() == b"payload"
    assert not os.path.exists(tmp)


@pytest.mark.parametrize("name", ADAPTERS)
def test_link_or_copy(name, tmp_path):
    st = get_storage(name)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    with open(src, "wb") as f:
        f.write(b"shared")
    st.link_or_copy(src, dst)
    assert open(dst, "rb").read() == b"shared"
    if name == "objectstore":  # no hardlinks on an object store
        assert os.stat(src).st_ino != os.stat(dst).st_ino


def test_unknown_storage_rejected():
    with pytest.raises(ValueError, match="unknown GDP_STORAGE"):
        get_storage("nfsv2")


@pytest.mark.parametrize("name", ADAPTERS)
def test_concurrent_epoch_commit_adopts_winner(name, tmp_path, monkeypatch):
    """Two appliers committing the same epoch: the loser adopts the
    winner's record instead of overwriting it (first-writer-wins, the
    ES create-semantics analog)."""
    monkeypatch.setenv("GDP_STORAGE", name)
    lake = str(tmp_path / "lake")
    man = Manifest(lake, num_partitions=2)
    schema = pa.schema([("url", pa.string()), ("lsn", pa.int64())])
    fe = FileEntry(path="part=00000/delta_000001.parquet", partition=0, rows=3, bytes=10, max_lsn=7)
    first = man.commit_epoch(1, [fe], schema, metrics={"who": "a"})
    second = Manifest(lake).commit_epoch(1, [fe], schema, metrics={"who": "b"})
    assert first["metrics"]["who"] == "a"
    assert second["metrics"]["who"] == "a", "loser must adopt the winner"
    rec = json.load(open(os.path.join(lake, "manifest", "epoch_000001.json")))
    assert rec["metrics"]["who"] == "a"

    # force-reapply is the sanctioned overwrite path
    forced = man.commit_epoch(1, [fe], schema, metrics={"who": "late"}, overwrite=True)
    assert forced["metrics"]["who"] == "late"


@pytest.mark.parametrize("name", ADAPTERS)
def test_concurrent_compaction_refused(name, tmp_path, monkeypatch):
    monkeypatch.setenv("GDP_STORAGE", name)
    lake = str(tmp_path / "lake")
    man = Manifest(lake, num_partitions=1)
    schema = pa.schema([("url", pa.string()), ("lsn", pa.int64())])
    fe = FileEntry(path="part=00000/base_c0.parquet", partition=0, rows=1, bytes=5, max_lsn=1)
    man.commit_compaction(3, [fe], schema, cid=0)
    with pytest.raises(RuntimeError, match="concurrent compaction"):
        Manifest(lake).commit_compaction(5, [fe], schema, cid=0)
