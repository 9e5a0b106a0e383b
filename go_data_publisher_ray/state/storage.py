"""Storage adapter: the commit primitives the engine relies on, behind
one small interface (VERDICT r4 "What's missing" #2).

Every durable commit in the engine reduces to three primitives:

- ``put_bytes``          — atomic whole-object write, overwrite allowed
                           (cursors, lake.json, checkpoints: small
                           mutable metadata, single logical writer);
- ``put_bytes_if_absent``— conditional create, first writer wins — THE
                           commit primitive for manifest records
                           (epoch_E.json / compact_C.json: existence IS
                           the commit);
- ``finalize_file``      — promote a fully-written local scratch file
                           to its final object name with no partially-
                           written state ever visible (parquet data
                           files; deterministic names + bytes make
                           re-promotion an idempotent overwrite).

``PosixStorage`` (default) maps these to rename/link on a shared POSIX
filesystem (NFS/Lustre).  ``ObjectStoreStorage`` is the in-tree fake of
an S3-style store, where NONE of rename/link exist for visible objects:
PUT is atomic whole-object last-writer-wins, conditional PUT
(`If-None-Match: *`, public S3/GCS semantics since 2024/always) gives
put-if-absent, and promotion is a (multipart) upload completed
atomically by the store.  The fake provides exactly those guarantees on
the local filesystem — the point is that engine code can only express
object-store-representable operations through this interface, so a
deployment whose lake root is an object store works by construction.
Internally the fake may use local primitives to SIMULATE the store's
own atomicity (an S3 PUT is atomic inside S3); what it never does is
give the engine a cross-name rename or a hardlink.

What deliberately stays outside the interface:

- directory swaps (feed publish `epoch=E` dirs, split_shard staging).
  Object stores have no atomic prefix rename; the documented protocol
  there is marker-based (write objects under the final prefix, commit
  by put-if-absent of a marker object, readers test the marker) — the
  feed's `_epoch_meta.json` / the lake's `lake.json` are already shaped
  to be those markers.  On POSIX the dir rename is both simpler and
  stronger, so those call sites keep it and carry a pointer here.
- ``split_shard``'s hardlink fan-out: on stores without links it
  degrades to server-side copy via ``link_or_copy`` (cost: one object
  copy per shared base file instead of a free link).

Selection: ``GDP_STORAGE=posix|objectstore`` (env), read when a
component is constructed — stage classes capture the choice on the
driver and carry it to workers, so a mid-run env flip cannot split a
single commit across substrates.
"""

from __future__ import annotations

import os
import shutil
import uuid


class PosixStorage:
    """Shared-POSIX-filesystem primitives: rename is atomic and
    replaces; link gives put-if-absent."""

    name = "posix"

    def put_bytes(self, path: str, data: bytes, *, sync: bool = True) -> None:
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            if sync:
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_bytes_if_absent(self, path: str, data: bytes, *, sync: bool = True) -> bool:
        """First writer wins; returns False if the object already
        existed.  ``link(tmp, final)`` is the classic POSIX conditional
        create: atomic, content fully durable before visible."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            if sync:
                f.flush()
                os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def finalize_file(self, tmp: str, final: str) -> None:
        os.replace(tmp, final)

    def link_or_copy(self, src: str, dst: str) -> None:
        os.link(src, dst)


class ObjectStoreStorage:
    """In-tree fake of an S3-style object store (see module docstring).

    Local ``os.replace`` INSIDE these methods simulates the store's own
    internal atomicity (a completed PUT / multipart upload appears
    atomically); the engine-visible contract is the object-store one:
    no rename of a committed object, no hardlink, last-writer-wins PUT,
    conditional PUT for commits."""

    name = "objectstore"

    def put_bytes(self, path: str, data: bytes, *, sync: bool = True) -> None:
        # atomic whole-object PUT, last writer wins
        tmp = f"{path}.upload-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            if sync:
                f.flush()
                os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_bytes_if_absent(self, path: str, data: bytes, *, sync: bool = True) -> bool:
        # conditional PUT (If-None-Match: *): exactly one creator wins,
        # and a winner's object is visible WITH its full content or not
        # at all (real stores guarantee this; a loser's immediate read
        # of the winner's object must succeed).  The local simulation
        # with those exact semantics is write-aside + link — internal
        # to the fake, never exposed to engine code.
        tmp = f"{path}.upload-{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
            if sync:
                f.flush()
                os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def finalize_file(self, tmp: str, final: str) -> None:
        # complete-multipart-upload: bytes move into the store; the
        # object appears atomically under its final name, the local
        # scratch file is consumed
        up = f"{final}.upload-{uuid.uuid4().hex}"
        shutil.copyfile(tmp, up)
        os.replace(up, final)
        os.remove(tmp)

    def link_or_copy(self, src: str, dst: str) -> None:
        # no hardlinks: server-side object copy
        up = f"{dst}.upload-{uuid.uuid4().hex}"
        shutil.copyfile(src, up)
        os.replace(up, dst)


_STORAGES = {"posix": PosixStorage(), "objectstore": ObjectStoreStorage()}


def get_storage(name: str | None = None):
    """Resolve a storage implementation.  ``name=None`` reads
    ``GDP_STORAGE`` (default posix).  Stage classes that run on workers
    should resolve ONCE at construction (driver side) and carry
    ``storage.name`` with them."""
    if name is None:
        name = os.environ.get("GDP_STORAGE", "posix")
    try:
        return _STORAGES[name]
    except KeyError:
        raise ValueError(
            f"unknown GDP_STORAGE {name!r}: expected one of {sorted(_STORAGES)}"
        ) from None
