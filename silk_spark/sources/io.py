"""Metadata IO backends for LakeTable.

LakeTable's correctness hinges on exactly three storage capabilities:
atomic publish of a small pointer file (the commit point), read of
the pointed-at metadata document, and listing Spark-written data
files. This module isolates the first two behind `MetadataIO` so the
object-store swap is demonstrably contained:

  * LocalMetadataIO — POSIX dir; atomicity via write-tmp + os.replace,
    CAS via O_CREAT|O_EXCL create-if-absent.
  * InMemoryMetadataIO — dict-backed fake (tests / ephemeral tables);
    CAS via lock-guarded setdefault.
  * An S3/object-store implementation maps 1:1: write_atomic = PUT,
    try_create = conditional PUT with `If-None-Match: *` (native on
    S3 since 2024, GCS `x-goog-if-generation-match: 0`, Azure
    `If-None-Match: *`); on a real deployment the Iceberg catalog
    replaces this layer entirely (see lake.py module docstring).

MULTI-WRITER PROTOCOL (Iceberg HadoopTableOperations-style): the
versioned metadata document `v<k>.metadata.json` is itself the
compare-and-swap point — a committer may only CREATE it, never
overwrite, so of two writers that both loaded version k-1 exactly one
wins the `try_create("v<k>...")` race; the loser gets False, raises
`CommitConflictError`, and must refresh + re-apply (its data files
are orphans, never referenced — same garbage semantics as Iceberg's
failed commits, cleaned by maintenance). `version-hint.text` is a
best-effort READ CACHE of the current version, written after the CAS
by the winner only; readers probe forward from the hint (lake.py
`_load_meta`), so a crash between CAS and hint write loses nothing.

Data files themselves are written by Spark executors straight to the
table root (parquet); only their LISTING crosses this interface.
"""

from __future__ import annotations

import os
import threading
import uuid
from typing import Protocol


class CommitConflictError(Exception):
    """Another writer committed the version this writer was about to
    publish. The table handle must refresh() and re-apply the batch
    (merge_batch is idempotent per batch_id, so blind retry is safe)."""


class MetadataIO(Protocol):
    def write_atomic(self, name: str, text: str) -> None: ...

    def try_create(self, name: str, text: str) -> bool: ...

    def read(self, name: str) -> str: ...

    def exists(self, name: str) -> bool: ...


class LocalMetadataIO:
    """Metadata documents as files under a local directory; atomic
    publish via tmp-file + rename (POSIX atomic within a filesystem);
    create-if-absent via O_CREAT|O_EXCL + hardlink-free two-phase
    (tmp write, then link(2) which fails if the target exists)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _p(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write_atomic(self, name: str, text: str) -> None:
        tmp = self._p(name) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, self._p(name))

    def try_create(self, name: str, text: str) -> bool:
        """Atomic create-if-absent: write the full document to a tmp
        file, then `os.link` it to the final name — link(2) is atomic
        and fails with EEXIST if another writer won, and the target is
        never observable partially written."""
        tmp = self._p(name) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(text)
        try:
            os.link(tmp, self._p(name))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read(self, name: str) -> str:
        with open(self._p(name)) as f:
            return f.read()

    def exists(self, name: str) -> bool:
        return os.path.exists(self._p(name))


class InMemoryMetadataIO:
    """Dict-backed fake: same visibility semantics (a document appears
    fully written or not at all), no disk. Share one instance across
    LakeTable handles to model one 'catalog'."""

    def __init__(self):
        self._docs: dict[str, str] = {}
        self._lock = threading.Lock()

    def write_atomic(self, name: str, text: str) -> None:
        self._docs[name] = text  # dict assignment is the atomic publish

    def try_create(self, name: str, text: str) -> bool:
        with self._lock:
            if name in self._docs:
                return False
            self._docs[name] = text
            return True

    def read(self, name: str) -> str:
        return self._docs[name]

    def exists(self, name: str) -> bool:
        return name in self._docs
