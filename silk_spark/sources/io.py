"""Metadata IO backends for LakeTable.

LakeTable's correctness hinges on exactly three storage capabilities:
atomic publish of a small pointer file (the commit point), read of
the pointed-at metadata document, and listing Spark-written data
files. This module isolates the first two behind `MetadataIO` so the
object-store swap is demonstrably contained:

  * LocalMetadataIO — POSIX dir; atomicity via write-tmp + os.replace.
  * InMemoryMetadataIO — dict-backed fake (tests / ephemeral tables).
  * An S3/object-store implementation would use conditional PUT
    (If-None-Match / DynamoDB lock) on the SAME three methods; on a
    real deployment the Iceberg catalog replaces this layer entirely
    (see lake.py module docstring for the 1:1 mapping).

SINGLE-WRITER LIMIT: the commit protocol is last-writer-wins on the
pointer; there is no compare-and-swap, so exactly one writer (the
driver of the CDC pipeline) may commit at a time. Multi-writer needs
the catalog/conditional-PUT variant above. Readers are unaffected
(they see the last published pointer).

Data files themselves are written by Spark executors straight to the
table root (parquet); only their LISTING crosses this interface.
"""

from __future__ import annotations

import os
import uuid
from typing import Protocol


class MetadataIO(Protocol):
    def write_atomic(self, name: str, text: str) -> None: ...

    def read(self, name: str) -> str: ...

    def exists(self, name: str) -> bool: ...


class LocalMetadataIO:
    """Metadata documents as files under a local directory; atomic
    publish via tmp-file + rename (POSIX atomic within a filesystem)."""

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

    def write_atomic(self, name: str, text: str) -> None:
        self._docs[name] = text  # dict assignment is the atomic publish

    def read(self, name: str) -> str:
        return self._docs[name]

    def exists(self, name: str) -> bool:
        return name in self._docs
