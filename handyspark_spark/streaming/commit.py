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
import shutil
from collections.abc import Callable


class DirCommitter:
    """Publish a directory write with all-or-none visibility."""

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
        shutil.rmtree(staged, ignore_errors=True)   # crashed prior stage
        write_fn(staged)
        os.rename(staged, final)

    def is_published(self, final):
        return os.path.exists(final)

    def published(self, parent):
        if not os.path.isdir(parent):
            return []
        return sorted(
            os.path.join(parent, d) for d in os.listdir(parent)
            if os.path.isdir(os.path.join(parent, d))
            and not d.endswith((self.SUFFIX, "._prev")))


class ManifestCommitter(DirCommitter):
    """Marker-last: correct where rename is not atomic (S3/GCS-style
    object stores — there "rename" is copy+delete per key, and a
    reader can observe half the keys). Data is written straight into
    the final path; the single-object marker PUT is the commit point.
    A marker-less directory is a crashed write: invisible to
    ``published``, discarded and rewritten by the retrying publish.

    This implementation does the discard with ``shutil`` (the test
    environment is a local FS); on a real object store the discard is
    a prefix delete and the marker write a single PUT — both primitive
    store operations, which is the point of the protocol."""

    MARKER = "_HS_COMMITTED"

    def publish(self, write_fn, final):
        if os.path.isdir(final) and not self.is_published(final):
            shutil.rmtree(final)                    # crashed prior write
        write_fn(final)
        # flush+fsync the marker: it IS the commit point, so it must
        # hit stable storage before this publish is reported done — a
        # torn marker after power loss would make a fully-written
        # batch permanently invisible (or worse, get discarded and
        # rewritten as "crashed" on the retry).
        with open(os.path.join(final, self.MARKER), "w") as f:
            f.write("1")
            f.flush()
            os.fsync(f.fileno())

    def is_published(self, final):
        return os.path.exists(os.path.join(final, self.MARKER))

    def published(self, parent):
        if not os.path.isdir(parent):
            return []
        return sorted(
            os.path.join(parent, d) for d in os.listdir(parent)
            if self.is_published(os.path.join(parent, d)))
