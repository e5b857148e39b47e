"""Ledger semantics on a RENAME-LESS object store (round-9 VERDICT ask
#2): exercise both ledger modes against the offline fake store in
python_darima_spark.testing.fakestore — create = atomic PUT, rename =
non-atomic chunked copy + delete — and prove the property the docs
claim: rename-mode 2PC BREAKS there (a crash mid-copy leaves a torn
data file under its final name that replay keeps forever), while
manifest mode survives a crash at every protocol point with readers
seeing none-or-all of each batch.

The user story is the reference's own deployment: it ran against
object-store buckets (reference gcp/job.sh:6-7, darima_config.json:6-7),
exactly the store class where Hadoop's rename is copy+delete.
"""

from __future__ import annotations

import glob
import os
import types

import pandas as pd
import pytest

from python_darima_spark.operators import ledger
from python_darima_spark.operators.ledger import (
    commit_staged_ingest,
    read_manifested_table,
    staged_parquet_writer,
)
from python_darima_spark.testing.fakestore import fake_fs_router


def _batch(spark, lo: int, hi: int, parts: int = 3):
    """A batch wide enough that each parquet file spans several fake
    copy chunks (1 KiB), so torn mid-copy states exist."""
    pdf = pd.DataFrame(
        {
            "doc_id": range(lo, hi),
            # distinct tokens per row: keeps parquet from dictionary-
            # compressing the file below one fake-store copy chunk
            "text": [
                " ".join(f"tok{i}x{j}" for j in range(40))
                for i in range(lo, hi)
            ],
        }
    )
    return spark.createDataFrame(pdf).repartition(parts)


@pytest.fixture()
def fake_fs(monkeypatch, tmp_path):
    router = fake_fs_router(ledger._fs, str(tmp_path))
    monkeypatch.setattr(ledger, "_fs", router)
    yield router
    # hooks disarmed by fixture teardown (fresh router per test)


def test_fake_store_semantics(spark, fake_fs, tmp_path):
    """The fake really is rename-less: a crash mid-copy leaves a
    PARTIAL destination visible and the source intact; an interrupted
    PUT leaves nothing."""
    src, dst = str(tmp_path / "src.bin"), str(tmp_path / "dst.bin")
    with open(src, "wb") as fh:
        fh.write(b"x" * 5000)
    fs = ledger._fs(spark, src)
    assert getattr(fs, "renameIsAtomic") is False

    def boom_copy(path, n):
        if n >= 2048:
            raise RuntimeError("crash mid-copy")

    fs.copy_hook = boom_copy
    with pytest.raises(RuntimeError, match="mid-copy"):
        fs.rename(src, dst)
    assert os.path.exists(src)  # delete never ran
    assert 0 < os.path.getsize(dst) < 5000  # torn object VISIBLE
    fs.copy_hook = lambda path, n: None

    put_path = str(tmp_path / "obj.bin")
    fs.put_hook = lambda path: (_ for _ in ()).throw(
        RuntimeError("crash mid-PUT")
    )
    out = fs.create(put_path, False)
    out.write(b"hello")
    with pytest.raises(RuntimeError, match="mid-PUT"):
        out.close()
    assert not os.path.exists(put_path)  # PUT is all-or-nothing
    fs.put_hook = lambda path: None


def test_rename_is_atomic_probe(spark, tmp_path):
    """Capability probe: explicit flag wins; known object-store schemes
    are rename-less; POSIX paths default to atomic."""
    dummy = types.SimpleNamespace()
    assert ledger._rename_is_atomic(spark, dummy, str(tmp_path))
    assert ledger._rename_is_atomic(spark, dummy, f"file://{tmp_path}")
    assert not ledger._rename_is_atomic(spark, dummy, "s3a://bucket/tbl")
    assert not ledger._rename_is_atomic(spark, dummy, "gs://bucket/tbl")
    flagged = types.SimpleNamespace(renameIsAtomic=False)
    assert not ledger._rename_is_atomic(spark, flagged, str(tmp_path))
    # the REAL java filesystem (no python attr) probes to atomic on file://
    real = ledger._fs(spark, str(tmp_path))
    assert ledger._rename_is_atomic(spark, real, str(tmp_path))


def test_rename_mode_breaks_on_renameless_store(spark, fake_fs, tmp_path):
    """The negative half of the docs' claim: rename-mode 2PC on a
    copy+delete store corrupts the table under a mid-copy crash, and
    REPLAY cannot heal it — the dest-exists skip (sound where rename is
    atomic, because dest-exists implies whole) keeps the torn file."""
    table = str(tmp_path / "tbl_rename")
    df = _batch(spark, 0, 200)

    crashed = {"dst": None}

    def boom(dst, n):
        if crashed["dst"] is None and n >= 1024:
            crashed["dst"] = dst
            raise RuntimeError("injected crash mid-copy")

    fake_router_fs = ledger._fs(spark, table)  # shared fake instance
    fake_router_fs.copy_hook = boom
    with pytest.raises(RuntimeError, match="mid-copy"):
        commit_staged_ingest(
            spark, table, "b0", staged_parquet_writer(df), mode="rename"
        )
    torn = crashed["dst"]
    assert torn is not None and os.path.exists(torn)
    # replay heals nothing: the torn destination exists, so its rename
    # returns False and the protocol (correctly, for atomic-rename
    # stores) assumes it is whole
    fake_router_fs.copy_hook = lambda dst, n: None
    commit_staged_ingest(
        spark, table, "b0", staged_parquet_writer(df), mode="rename"
    )
    assert os.path.exists(f"{table}/_ingest_b0.done")
    with pytest.raises(Exception):
        # the torn parquet file is unreadable: the committed table is
        # PERMANENTLY corrupt — this is why mode="rename" must not be
        # used on rename-less stores
        spark.read.parquet(table).count()


def _read_ids(spark, table: str) -> list[int]:
    return sorted(
        r.doc_id
        for r in read_manifested_table(spark, table).select("doc_id").collect()
    )


@pytest.mark.parametrize(
    "crash_point", ["staged", "manifest-put", "put-inflight", "manifested"]
)
def test_manifest_mode_survives_on_renameless_store(
    spark, fake_fs, tmp_path, monkeypatch, crash_point
):
    """The positive half: on the same store, manifest mode commits by
    atomic PUT (no .tmp, no rename anywhere in the commit), a crash at
    EVERY protocol point leaves the reader seeing none-or-all of each
    batch, and replay converges to exactly-once."""
    table = str(tmp_path / "tbl_manifest")
    b0, b1 = _batch(spark, 0, 120), _batch(spark, 200, 320)
    # batch 0 commits cleanly
    commit_staged_ingest(
        spark, table, "b0", staged_parquet_writer(b0), mode="manifest"
    )
    ids0 = _read_ids(spark, table)
    assert ids0 == list(range(0, 120))

    # crash batch 1 at the injected point
    if crash_point == "put-inflight":
        fs = ledger._fs(spark, table)

        def boom_put(path):
            if path.endswith("_ingest_b1.manifest"):
                raise RuntimeError("injected crash mid-PUT")

        fs.put_hook = boom_put
        with pytest.raises(RuntimeError, match="mid-PUT"):
            commit_staged_ingest(
                spark, table, "b1", staged_parquet_writer(b1),
                mode="manifest",
            )
        fs.put_hook = lambda path: None
    else:

        def boom(point):
            if point == f"{crash_point}:{table}":
                raise RuntimeError(f"injected crash at {point}")

        monkeypatch.setattr(ledger, "_crash_hook", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            commit_staged_ingest(
                spark, table, "b1", staged_parquet_writer(b1),
                mode="manifest",
            )
        monkeypatch.setattr(ledger, "_crash_hook", lambda p: None)

    # mid-crash visibility: batch 0 exactly; batch 1 all-or-nothing
    mid = _read_ids(spark, table)
    if crash_point == "manifested":
        assert mid == ids0 + list(range(200, 320))  # PUT completed
    else:
        assert mid == ids0  # b1 invisible, b0 untouched

    # replay converges to exactly-once
    commit_staged_ingest(
        spark, table, "b1", staged_parquet_writer(b1), mode="manifest"
    )
    assert _read_ids(spark, table) == ids0 + list(range(200, 320))
    # PUT-publish really was used: no .tmp manifest was ever created
    assert not glob.glob(f"{table}/*.manifest.tmp")
    assert os.path.exists(f"{table}/_ingest_b1.manifest")
