"""Pluggable all-or-none publication of staged directory writes.

The streaming maintainers (``ann_dedup``, ``stateful``) need one
primitive: make a directory of parquet files visible to readers
ATOMICALLY, so a crash mid-write never leaves a partially-visible
batch and a foreachBatch replay can tell "already published" from
"crashed mid-write". Two implementations of that primitive:

- ``PosixRenameCommitter`` — stage to ``<final>._next``, then one
  ``os.rename``. Atomic on POSIX filesystems (local disk, NFS);
  WRONG on object stores, where "rename" is a non-atomic
  copy-then-delete per key.
- ``ManifestCommitter`` — write INTO the final path, then write a
  small marker file (``_HS_COMMITTED``) last. A single small PUT is
  atomic on every object store, so the marker is the commit point;
  directory contents without the marker are invisible to readers.
  The marker is underscore-prefixed, so Spark's parquet reader skips
  it inside data directories.

Both sides of the contract matter: writers go through ``publish`` and
readers go through ``published``/``is_published`` — readers must
NEVER list the parent directory themselves, because uncommitted
content (a stale ``._next`` staging dir, a marker-less partial) is
physically present under the parent in both schemes. Reading the
corpus from the explicit published-path list is what makes a crash
between stage and commit harmless: the replayed batch neither sees
its own half-written output as "already accepted" nor double-appends.

Reference note: the reference (dvgodoy/handyspark) has no streaming
surface — this is beyond-reference scaffolding for the 100-TB
ingestion path, following the manifest-last protocol of lakehouse
table formats (a commit is one small atomic object; data files are
invisible until referenced).
"""
from __future__ import annotations

import os
from collections.abc import Callable

from .fs import FS, LocalFS


class DirCommitter:
    """Publish a directory write with all-or-none visibility.

    Control-plane IO (markers, listings, discards, renames) goes
    through the ``fs`` binding (``fs.FS``; default ``LocalFS``) — pass
    an ``FsspecFS`` to run the same protocol against a real object
    store, or a ``MemoryFS`` to test it under injected crashes and
    non-atomic renames. The data plane (``write_fn`` writing parquet)
    still receives a path string for the engine to write to."""

    def __init__(self, fs: FS | None = None):
        self.fs = fs or LocalFS()

    def publish(self, write_fn: Callable[[str], None], final: str) -> None:
        """Run ``write_fn(path)`` so that ``final`` becomes visible
        atomically; any pre-existing uncommitted leftovers for the
        same ``final`` (a crashed prior attempt) are discarded first."""
        raise NotImplementedError

    def is_published(self, final: str) -> bool:
        raise NotImplementedError

    def published(self, parent: str) -> list[str]:
        """Absolute paths of the published child directories of
        ``parent`` (sorted) — staging leftovers and partial writes
        excluded. This list, not the parent path, is what readers
        hand to ``spark.read.parquet(*paths)``."""
        raise NotImplementedError


class PosixRenameCommitter(DirCommitter):
    """Stage-then-rename: atomic on POSIX-visible filesystems (local
    disk, NFS). The staging suffix lives NEXT TO the final path, so a
    crashed stage is found and discarded by the retry of the same
    publish — and is never returned by ``published``."""

    SUFFIX = "._next"

    def publish(self, write_fn, final):
        staged = final + self.SUFFIX
        self.fs.rm_recursive(staged)                # crashed prior stage
        write_fn(staged)
        self.fs.rename(staged, final)

    def is_published(self, final):
        return self.fs.exists(final)

    def published(self, parent):
        if not self.fs.isdir(parent):
            return []
        return sorted(
            os.path.join(parent, d) for d in self.fs.listdir(parent)
            if self.fs.isdir(os.path.join(parent, d))
            and not d.endswith((self.SUFFIX, "._prev")))


class ManifestCommitter(DirCommitter):
    """Marker-last: correct where rename is not atomic (S3/GCS-style
    object stores — there "rename" is copy+delete per key, and a
    reader can observe half the keys). Data is written straight into
    the final path; the single-object marker PUT is the commit point.
    A marker-less directory is a crashed write: invisible to
    ``published``, discarded and rewritten by the retrying publish.

    Every step maps to a PRIMITIVE operation of the bound ``fs``: the
    discard is a prefix delete, the marker write a single PUT — which
    is the point of the protocol. Bind ``FsspecFS`` for a real object
    store; the default ``LocalFS`` keeps local behavior (fsynced
    marker) identical to prior rounds."""

    MARKER = "_HS_COMMITTED"

    def publish(self, write_fn, final):
        if self.fs.isdir(final) and not self.is_published(final):
            self.fs.rm_recursive(final)             # crashed prior write
        write_fn(final)
        # The marker PUT is the commit point, so it must be durable
        # (LocalFS: flush+fsync+rename; object store: one PUT) before
        # this publish is reported done — a torn marker after power
        # loss would make a fully-written batch permanently invisible
        # (or worse, get discarded and rewritten as "crashed" on the
        # retry).
        self.fs.put_atomic(os.path.join(final, self.MARKER), "1")

    def is_published(self, final):
        return self.fs.exists(os.path.join(final, self.MARKER))

    def published(self, parent):
        if not self.fs.isdir(parent):
            return []
        return sorted(
            os.path.join(parent, d) for d in self.fs.listdir(parent)
            if self.is_published(os.path.join(parent, d)))
