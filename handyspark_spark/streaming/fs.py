"""Filesystem binding for the streaming commit protocols.

``commit.DirCommitter`` and ``stateful.VersionedStateStore`` are
object-store-SAFE by protocol (marker-last / versioned-pointer), but
until round 8 their IO was hard-wired to ``os``/``shutil`` — the
protocol was proven only under a simulated non-atomic rename on the
local disk. This module is the seam that makes the binding real: a
minimal filesystem surface shaped like the operations an object store
actually offers, with three implementations —

- ``LocalFS`` — the default; byte-compatible with the previous
  ``os``/``shutil`` behavior (atomic single-key put via
  write-tmp + fsync + rename).
- ``FsspecFS`` — adapter over any `fsspec
  <https://filesystem-spec.readthedocs.io>`_ filesystem (s3fs, gcsfs,
  adlfs, memory, local). Import-gated: constructing it without fsspec
  installed raises ImportError naming the missing package.
- ``MemoryFS`` — an in-process KEY-VALUE store with object-store
  semantics, used by the tests: no real directories ("a directory
  exists" means "some key has that prefix"), ``put_atomic`` is one
  atomic key assignment (a single PUT), and ``rename`` is a
  NON-ATOMIC key-by-key copy-then-delete — exactly the property that
  makes stage-and-rename unsafe on S3/GCS. A crash-injection hook
  (``fail_after``) aborts after N mutating operations so tests can
  leave a mid-rename / mid-publish wreck behind and assert the
  protocol recovers.

The data-plane (Spark writing parquet) stays a path the engine
understands — this seam carries the CONTROL plane: markers, pointers,
listings, discards. That is where the atomicity arguments live; the
data files are invisible until the control plane says otherwise.

Reference note: the reference (dvgodoy/handyspark) has no streaming or
sink surface — this is beyond-reference scaffolding for the 100-TB
ingestion path.
"""
from __future__ import annotations

import os
import shutil


class CrashInjected(RuntimeError):
    """Raised by MemoryFS when the fail_after budget is exhausted —
    models a process dying mid-protocol."""


class FS:
    """Minimal object-store-shaped filesystem surface.

    Only the operations the commit protocols need, each chosen to map
    onto a PRIMITIVE store operation: ``put_atomic`` is one PUT,
    ``rm_recursive`` is a prefix delete, ``listdir`` is a prefix
    listing. ``rename`` exists because ``PosixRenameCommitter`` needs
    it — and is exactly the operation that is NOT primitive on object
    stores, which the MemoryFS implementation makes observable."""

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """First-level child NAMES under ``path`` (empty when absent)."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def rm_recursive(self, path: str) -> None:
        """Delete ``path`` and everything under it (prefix delete).
        No-op when absent."""
        raise NotImplementedError

    def put_atomic(self, path: str, data: str) -> None:
        """Write a small text object so readers see either the old
        content or the new — never a torn fragment. One PUT on an
        object store; write-tmp + fsync + rename on POSIX."""
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Move a subtree. Atomic ONLY on POSIX-visible filesystems;
        implementations for object stores perform (and may crash
        inside) a per-key copy-then-delete."""
        raise NotImplementedError

    def mtime(self, path: str) -> float | None:
        """Last-modified time of an object as a POSIX timestamp, or
        ``None`` when the store does not expose one (age-based policies
        must then fall back to their 'age unknowable' branch)."""
        return None


class LocalFS(FS):
    """os/shutil binding — the default; matches the pre-seam behavior
    of the committers byte for byte."""

    def exists(self, path):
        return os.path.exists(path)

    def isdir(self, path):
        return os.path.isdir(path)

    def listdir(self, path):
        return os.listdir(path) if os.path.isdir(path) else []

    def makedirs(self, path):
        os.makedirs(path, exist_ok=True)

    def rm_recursive(self, path):
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        elif os.path.exists(path):
            os.remove(path)

    def put_atomic(self, path, data):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def read_text(self, path):
        with open(path) as f:
            return f.read()

    def rename(self, src, dst):
        os.rename(src, dst)

    def mtime(self, path):
        try:
            return os.stat(path).st_mtime
        except OSError:
            return None


class FsspecFS(FS):
    """Adapter over an fsspec filesystem instance (s3fs, gcsfs, the
    builtin ``memory``/``file`` implementations, ...).

    ``put_atomic`` maps to ``fs.pipe`` — one whole-object PUT, atomic
    per key on every object store. ``rename`` maps to fsspec's
    recursive ``mv``, which on object stores IS copy-then-delete —
    i.e. this adapter faithfully preserves the reason
    ``PosixRenameCommitter`` must not be used there."""

    def __init__(self, fs=None, protocol: str | None = None, **kw):
        if fs is None:
            import fsspec  # raises ImportError when not installed
            fs = fsspec.filesystem(protocol or "file", **kw)
        self.fs = fs

    def exists(self, path):
        return self.fs.exists(path)

    def isdir(self, path):
        return self.fs.isdir(path)

    def listdir(self, path):
        if not self.fs.isdir(path):
            return []
        out = []
        for p in self.fs.ls(path, detail=False):
            name = str(p).rstrip("/").rsplit("/", 1)[-1]
            out.append(name)
        return out

    def makedirs(self, path):
        self.fs.makedirs(path, exist_ok=True)

    def rm_recursive(self, path):
        if self.fs.exists(path):
            self.fs.rm(path, recursive=True)

    def put_atomic(self, path, data):
        self.fs.pipe(path, data.encode())

    def read_text(self, path):
        return self.fs.cat(path).decode()

    def rename(self, src, dst):
        self.fs.mv(src, dst, recursive=True)

    def mtime(self, path):
        try:
            ts = self.fs.modified(path)
        except (NotImplementedError, OSError, KeyError, ValueError):
            return None
        return ts.timestamp() if ts is not None else None


class MemoryFS(FS):
    """In-process key-value store with OBJECT-STORE semantics, for
    exercising the commit protocols against the failure modes that a
    local disk cannot produce:

    - keys, not directories — ``isdir`` means "some key has this
      prefix", so a deleted last child deletes the 'directory';
    - ``put_atomic`` is one dict assignment — the single-PUT commit
      point;
    - ``rename`` is copy-then-delete KEY BY KEY, and the
      ``fail_after`` crash hook can kill the process model between
      keys — leaving exactly the half-renamed wreck a real object
      store leaves.

    Every mutating primitive ticks the crash budget; reads are free."""

    def __init__(self, fail_after: int | None = None):
        self.store: dict[str, str] = {}
        self.fail_after = fail_after
        self.ops = 0

    def _tick(self):
        if self.fail_after is not None:
            if self.ops >= self.fail_after:
                raise CrashInjected(
                    f"injected crash after {self.ops} mutating ops")
            self.ops += 1

    @staticmethod
    def _norm(path):
        return path.rstrip("/")

    def exists(self, path):
        p = self._norm(path)
        return p in self.store or self.isdir(p)

    def isdir(self, path):
        pref = self._norm(path) + "/"
        return any(k.startswith(pref) for k in self.store)

    def listdir(self, path):
        pref = self._norm(path) + "/"
        names = {k[len(pref):].split("/", 1)[0]
                 for k in self.store if k.startswith(pref)}
        return sorted(names)

    def makedirs(self, path):
        pass                        # directories don't exist in a KV store

    def rm_recursive(self, path):
        p = self._norm(path)
        pref = p + "/"
        for k in [k for k in self.store
                  if k == p or k.startswith(pref)]:
            self._tick()
            del self.store[k]

    def put_atomic(self, path, data):
        self._tick()
        self.store[self._norm(path)] = data

    def read_text(self, path):
        return self.store[self._norm(path)]

    def rename(self, src, dst):
        """NON-atomic: copy each key, then delete each source key —
        a crash between ticks leaves src and dst both partially
        populated, the signature object-store rename failure."""
        s, d = self._norm(src), self._norm(dst)
        keys = [k for k in self.store if k == s or k.startswith(s + "/")]
        for k in sorted(keys):
            self._tick()
            self.store[d + k[len(s):]] = self.store[k]
        for k in sorted(keys):
            self._tick()
            self.store.pop(k, None)
