"""Remote/object-store path support for driver-side metadata I/O.

The reference opens S3 Zarr stores through fsspec with storage options
(specs/cli.py:140-160, zarr_format.py:13-42). These tests exercise the
same plumbing against the built-in memory:// backend (no network, no
fsspec needed) and pin the degrade-to-WARNING contract for schemes no
backend can serve.
"""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mlcast_sourcedata_validator_spark.sources import fs
from mlcast_sourcedata_validator_spark.sources.properties import (
    read_properties_or_warning,
    read_table_properties,
    write_table_properties,
)
from mlcast_sourcedata_validator_spark.sources.tables import (
    list_date_partitions,
)
from mlcast_sourcedata_validator_spark.operators.storage import (
    compile_codec,
    compile_format,
    compile_partitioning,
)
from mlcast_sourcedata_validator_spark.suite import CheckSpec, RunContext


@pytest.fixture(autouse=True)
def _clean_memfs():
    fs.memfs_clear()
    yield
    fs.memfs_clear()


def _parquet_bytes(compression: str = "zstd") -> bytes:
    buf = io.BytesIO()
    pq.write_table(pa.table({"a": [1, 2, 3]}), buf, compression=compression)
    return buf.getvalue()


def _mem_table(compression: str = "zstd") -> str:
    root = "memory://tbl"
    for d in ("2024-01-01", "2024-01-02"):
        with fs.open_file(f"{root}/date={d}/part-0.parquet", "wb") as f:
            f.write(_parquet_bytes(compression))
    return root


def _ctx(path, opts=None):
    return RunContext(spark=None, df=None, suite=None, run_id="t",
                      table_path=path, storage_options=opts)


def test_scheme_split_and_join():
    assert fs.split_scheme("s3://b/k") == ("s3", "b/k")
    assert fs.split_scheme("/local/p") == (None, "/local/p")
    assert not fs.is_remote("/local/p") and fs.is_remote("s3://b")
    assert fs.join("s3://b/t", "x", "y") == "s3://b/t/x/y"
    assert fs.join("/a", "b") == os.path.join("/a", "b")


def test_memory_backend_roundtrip():
    fs.write_text("memory://box/f.txt", "hi")
    assert fs.read_text("memory://box/f.txt") == "hi"
    assert fs.exists("memory://box/f.txt")
    assert fs.isdir("memory://box") and not fs.isdir("memory://box/f.txt")
    assert fs.listdir("memory://box") == ["f.txt"]
    with pytest.raises(FileNotFoundError):
        fs.open_file("memory://box/missing", "rb")


def test_bounded_parquet_listing(tmp_path):
    """The walk must stop at `limit` matches — an 8-footer sample never
    lists a million-file table."""
    for i in range(40):
        d = tmp_path / f"date=2024-01-{i % 4 + 1:02d}"
        d.mkdir(exist_ok=True)
        (d / f"part-{i:03d}.parquet").write_bytes(b"x")
    got = fs.list_parquet_files(str(tmp_path), limit=3)
    assert len(got) == 3
    assert fs.list_parquet_files(str(tmp_path)) and len(
        fs.list_parquet_files(str(tmp_path))
    ) == 40
    # generator really is lazy: pulling one item must not require the rest
    it = fs.iter_files(str(tmp_path))
    first = next(it)
    assert first.endswith(".parquet")


def test_properties_sidecar_on_memory_store():
    write_table_properties("memory://tbl", {"license": "CC-BY-4.0"})
    assert read_table_properties("memory://tbl") == {"license": "CC-BY-4.0"}
    props, warn = read_properties_or_warning("memory://tbl")
    assert warn is None and props["license"] == "CC-BY-4.0"


def test_unavailable_scheme_degrades_to_warning(monkeypatch):
    def _boom(scheme, storage_options):
        raise fs.FsUnavailable(f"no backend for {scheme}://")

    monkeypatch.setattr(fs, "_fsspec_fs", _boom)
    props, warn = read_properties_or_warning("s3://bucket/tbl")
    assert props == {} and "no backend" in warn
    spec = CheckSpec("c", "storage", "6.2", "compressed")
    rep = compile_codec(spec, None).fn(_ctx("s3://bucket/tbl"))
    assert [r.status for r in rep.results] == ["WARNING"]
    assert "no backend" in rep.results[0].detail


def test_storage_checks_run_against_memory_table():
    """The full storage-check family works on a remote-style URL: codec
    sampling reads footers through the fs layer, partition listing sees
    the hive dirs — parity with the reference's S3 storage checks."""
    root = _mem_table("zstd")
    rep = compile_codec(
        CheckSpec("c", "storage", "6.2", "zstd",
                  {"recommended": "zstd"}), None
    ).fn(_ctx(root))
    assert [r.status for r in rep.results] == ["PASS"]

    rep2 = compile_codec(
        CheckSpec("c", "storage", "6.2", "zstd",
                  {"recommended": "zstd"}), None
    ).fn(_ctx(_mem_table_with("snappy", "memory://tbl2")))
    assert [r.status for r in rep2.results] == ["WARNING"]

    repp = compile_partitioning(
        CheckSpec("p", "storage", "6.1", "partitioned",
                  {"partition_key": "date"}), None
    ).fn(_ctx(root))
    assert [r.status for r in repp.results] == ["PASS"]

    repf = compile_format(
        CheckSpec("f", "storage", "6.3", "format"), None
    ).fn(_ctx(root))
    assert [r.status for r in repf.results] == ["PASS"]

    assert list_date_partitions(root) == ["2024-01-01", "2024-01-02"]


def _mem_table_with(compression: str, root: str) -> str:
    with fs.open_file(f"{root}/date=2024-01-01/part-0.parquet", "wb") as f:
        f.write(_parquet_bytes(compression))
    return root


class _FakeFsspecFS:
    """Minimal AbstractFileSystem stand-in over a local directory: maps
    'fake://<rest>' to <root>/<rest>. Mirrors the base-class quirk that
    ls() defaults to detail=True (dict listings)."""

    def __init__(self, root):
        self.root = root

    def _p(self, path):
        rest = path.split("://", 1)[1] if "://" in path else path
        return os.path.join(self.root, rest)

    def exists(self, path):
        return os.path.exists(self._p(path))

    def isdir(self, path):
        return os.path.isdir(self._p(path))

    def open(self, path, mode="rb"):
        if "w" in mode:
            os.makedirs(os.path.dirname(self._p(path)), exist_ok=True)
        return open(self._p(path), mode)

    def ls(self, path, detail=True):
        entries = sorted(os.listdir(self._p(path)))
        full = [path.rstrip("/") + "/" + e for e in entries]
        if detail:  # base-class default: dicts with FULL paths as names
            return [
                {"name": f,
                 "type": "directory" if os.path.isdir(self._p(f)) else "file"}
                for f in full
            ]
        return full

    def walk(self, path):
        # real AbstractFileSystem.walk ignores in-place dirs mutation and
        # visits directories in backend-defined order — emulate that by
        # yielding copies in REVERSED order so any caller relying on
        # os.walk-style control would be caught
        levels = list(os.walk(self._p(path)))
        for root, dirs, files in reversed(levels):
            rel = os.path.relpath(root, self.root)
            yield rel.replace(os.sep, "/"), list(dirs), list(files)


@pytest.fixture
def fake_fsspec(tmp_path, monkeypatch):
    import sys
    import types

    inst = _FakeFsspecFS(str(tmp_path))
    mod = types.ModuleType("fsspec")
    created = {}

    def filesystem(scheme, **storage_options):
        created["scheme"] = scheme
        created["opts"] = storage_options
        return inst

    mod.filesystem = filesystem
    monkeypatch.setitem(sys.modules, "fsspec", mod)
    return tmp_path, created


def test_fsspec_backend_roundtrip(fake_fsspec):
    """The fsspec code path (scheme dispatch, storage_options plumbing,
    detail=False listing, walk-based bounded iteration) exercised against
    a stand-in filesystem — the sandbox has no real fsspec."""
    root, created = fake_fsspec
    fs.write_text("fake://tbl/sub/_table_properties.json", '{"license": "MIT"}',
                  storage_options={"anon": True})
    assert created["scheme"] == "fake" and created["opts"] == {"anon": True}
    assert fs.exists("fake://tbl/sub/_table_properties.json")
    assert fs.isdir("fake://tbl")
    assert fs.read_text("fake://tbl/sub/_table_properties.json") == \
        '{"license": "MIT"}'
    # detail=True default of the base class must not leak dicts
    assert fs.listdir("fake://tbl") == ["sub"]
    (root / "tbl" / "a.parquet").write_bytes(b"x")
    (root / "tbl" / "sub" / "b.parquet").write_bytes(b"x")
    got = fs.list_parquet_files("fake://tbl", limit=1)
    assert len(got) == 1 and got[0].startswith("fake://")
    assert len(fs.list_parquet_files("fake://tbl")) == 2

    props = read_table_properties("fake://tbl/sub")
    assert props == {"license": "MIT"}


def test_partitioning_listdir_backend_error_degrades_to_warning(monkeypatch):
    """A backend exception that is NOT FsUnavailable (fsspec auth/
    transient errors surface as arbitrary exception types) must degrade
    the partitioning check to WARNING, not abort the suite — run_suite
    does not wrap driver checks."""
    root = _mem_table("zstd")

    def _flaky_listdir(path, storage_options=None):
        raise PermissionError("403: access denied by backend")

    monkeypatch.setattr(fs, "listdir", _flaky_listdir)
    rep = compile_partitioning(
        CheckSpec("p", "storage", "6.1", "partitioned",
                  {"partition_key": "date"}), None
    ).fn(_ctx(root))
    assert [r.status for r in rep.results] == ["WARNING"]
    assert "access denied" in rep.results[0].detail


def test_stat_files_and_fingerprint_across_backends(tmp_path):
    """stat_files yields (path, size) on local and memory backends;
    partition_fingerprint built on it is stable under re-listing,
    ignores reader-invisible files (_SUCCESS/.crc), and changes when a
    data file's name or size changes."""
    from mlcast_sourcedata_validator_spark.checkpoint import (
        partition_fingerprint,
    )

    # local backend
    pdir = tmp_path / "tbl" / "date=2024-01-01"
    pdir.mkdir(parents=True)
    (pdir / "part-0.parquet").write_bytes(b"abc")
    (pdir / "part-1.parquet").write_bytes(b"defg")
    stats = dict(fs.stat_files(str(pdir)))
    assert stats[str(pdir / "part-0.parquet")] == 3
    assert stats[str(pdir / "part-1.parquet")] == 4

    f1 = partition_fingerprint(str(tmp_path / "tbl"), "2024-01-01")
    assert f1 == partition_fingerprint(str(tmp_path / "tbl"), "2024-01-01")
    # committer bookkeeping must not change the fingerprint
    (pdir / "_SUCCESS").write_bytes(b"")
    (pdir / ".part-0.parquet.crc").write_bytes(b"xxxx")
    assert partition_fingerprint(str(tmp_path / "tbl"), "2024-01-01") == f1
    # a grown data file must
    (pdir / "part-1.parquet").write_bytes(b"defgh")
    assert partition_fingerprint(str(tmp_path / "tbl"), "2024-01-01") != f1

    # memory backend
    fs.write_text("memory://mt/date=2024-01-01/part-0.parquet", "abc")
    m1 = partition_fingerprint("memory://mt", "2024-01-01")
    fs.write_text("memory://mt/date=2024-01-01/part-0.parquet", "abcd")
    assert partition_fingerprint("memory://mt", "2024-01-01") != m1
    sizes = dict(fs.stat_files("memory://mt/date=2024-01-01"))
    assert list(sizes.values()) == [4]
