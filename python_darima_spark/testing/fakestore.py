"""A fake RENAME-LESS object store behind the ledger's ``_fs`` seam.

The ingest ledger (:mod:`python_darima_spark.operators.ledger`) claims:
rename-mode 2PC is safe exactly where per-file rename is atomic
(POSIX/HDFS/ABFS), and manifest mode is what makes commits whole-batch
atomic on stores that FAKE rename as copy+delete (S3A without a
committer; the reference's own deployment ran on object storage, see
/root/reference/gcp/job.sh:6-7 + darima_config.json:6-7). No sandbox
here can reach a real s3a:// or gs:// endpoint, so this module makes
the claim testable offline: a Python shim implementing the subset of
the Hadoop ``FileSystem`` surface the ledger calls, with object-store
semantics instead of POSIX ones —

* ``create`` = **atomic PUT**: bytes are buffered in the returned
  stream and become visible all-at-once on ``close()`` (a reader can
  never observe a partial object — S3's documented behavior). With
  ``overwrite=False`` an existing destination raises (conditional
  PUT / If-None-Match), exactly the primitive Delta-on-S3-style
  commit protocols use.
* ``rename`` = **non-atomic COPY (chunked, partial destination
  visible mid-copy) + DELETE** — the degenerate rename connectors
  without a server-side atomic move actually perform. A crash hook
  fires between chunks, so tests can freeze the exact torn-file state
  per-file-atomic rename makes impossible. Destination-exists returns
  False (S3A contract), source-missing returns False.
* everything else (exists / delete / mkdirs / listFiles / listStatus /
  open / makeQualified) delegates to the real Hadoop filesystem — the
  fake changes MUTATION semantics only, so Spark jobs still write the
  staged files and parquet still reads committed ones.
* ``renameIsAtomic = False`` — the capability flag
  :func:`~python_darima_spark.operators.ledger.commit_manifest_ingest`
  consults to choose PUT-publish over tmp+rename for the manifest.

Used by tests/test_fakestore_ledger.py to prove both directions of the
docs' claim: rename-mode 2PC **breaks** on this store (a crash mid-copy
leaves a torn data file under its final name, and the replay's
dest-exists skip keeps it forever), while manifest mode **survives** a
crash at every protocol point with readers seeing none-or-all of each
batch, never a torn file.
"""

from __future__ import annotations

import os
from typing import Callable

# copy chunk size: small enough that fixture-scale parquet files span
# several chunks (so "torn mid-copy" states exist), large enough to
# keep the tests fast
_COPY_CHUNK = 1024


def _local(jpath) -> str:
    """Local filesystem path of a (possibly file:-qualified) Hadoop
    Path / path string."""
    s = jpath if isinstance(jpath, str) else jpath.toString()
    if s.startswith("file:"):
        s = s[len("file:") :]
        while s.startswith("//"):
            s = s[1:]
    return s


class _PutStream:
    """Buffered stream with atomic-PUT visibility on close."""

    def __init__(self, fs: "FakeRenamelessFS", path: str, overwrite: bool):
        self._fs = fs
        self._path = path
        self._overwrite = overwrite
        self._buf = bytearray()
        self._closed = False

    def write(self, data) -> None:
        self._buf.extend(bytes(data))

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._fs.put_hook(self._path)
        if not self._overwrite and os.path.exists(self._path):
            raise IOError(
                f"fakes3: conditional PUT failed, {self._path} exists"
            )
        os.makedirs(os.path.dirname(self._path), exist_ok=True)
        tmp = self._path + ".__put_inflight"
        with open(tmp, "wb") as fh:
            fh.write(self._buf)
        # the PUT itself is atomic: the object appears whole or not at
        # all (os.replace stands in for S3's all-or-nothing visibility)
        os.replace(tmp, self._path)


class FakeRenamelessFS:
    """Hadoop-FileSystem-shaped shim with object-store mutation
    semantics (see module docstring). ``real`` is the genuine java
    FileSystem for the same paths; reads and listings delegate to it."""

    renameIsAtomic = False  # noqa: N815 - mirrors a java-ish capability name

    def __init__(self, real):
        self._real = real
        # test seams: fire between copy chunks / before PUT visibility
        self.copy_hook: Callable[[str, int], None] = lambda dst, n: None
        self.put_hook: Callable[[str], None] = lambda path: None

    # --- mutations with object-store semantics -------------------------
    def create(self, jpath, overwrite: bool = True) -> _PutStream:
        return _PutStream(self, _local(jpath), bool(overwrite))

    def rename(self, jsrc, jdst) -> bool:
        src, dst = _local(jsrc), _local(jdst)
        if not os.path.exists(src):
            return False
        if os.path.exists(dst):
            return False  # S3A contract: rename to existing dest fails
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        copied = 0
        with open(src, "rb") as sf, open(dst, "wb") as df:
            while True:
                chunk = sf.read(_COPY_CHUNK)
                if not chunk:
                    break
                df.write(chunk)
                df.flush()  # partial destination is VISIBLE mid-copy
                copied += len(chunk)
                self.copy_hook(dst, copied)
        os.remove(src)
        return True

    # --- everything else: delegate to the real filesystem --------------
    def __getattr__(self, name):
        return getattr(self._real, name)


def fake_fs_router(real_fs_fn, fake_root: str):
    """A drop-in replacement for ``ledger._fs`` that returns a
    :class:`FakeRenamelessFS` for paths under ``fake_root`` and the real
    filesystem for everything else. The fake instance is shared (one
    per router) so tests can arm its crash hooks once."""
    holder: dict[str, FakeRenamelessFS] = {}

    def _route(spark, path: str):
        real = real_fs_fn(spark, path)
        if _local(path).startswith(fake_root):
            if "fs" not in holder:
                holder["fs"] = FakeRenamelessFS(real)
            else:
                holder["fs"]._real = real
            return holder["fs"]
        return real

    _route.fake = holder  # type: ignore[attr-defined]
    return _route
