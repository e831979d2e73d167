"""fan_out's natural-split estimator (sources/parquet.py) — the
row-group-aware rework (VERDICT r17 item 5 + ADVICE r17 ceiling fix).

Pure driver-side unit tests: no Spark session. The estimator is what
decides fan-vs-no-op, so pinning it pins the helper's scale behavior:
- a big SINGLE-row-group file must estimate 1 split (the pathology the
  helper exists for — byte math alone would call it splittable);
- a many-row-group file of the same bytes estimates its byte splits;
- ceiling division: a file just over one split-size is 2 splits, not 1;
- remote URIs estimate None (never fanned).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cyrela_etl_spark.sources.parquet import _estimate_natural_splits, _local_path

# small max_split so test files stay tiny: 64 KB "splits"
MAX_SPLIT = 64 * 1024


def _write(path: str, n_rows: int, row_group_size: int) -> None:
    import hashlib

    # unique per-row payload so dictionary encoding can't shrink the file
    pad = [hashlib.md5(str(i).encode()).hexdigest() * 3 for i in range(n_rows)]
    table = pa.table({"x": list(range(n_rows)), "pad": pad})
    pq.write_table(
        table, path, row_group_size=row_group_size, compression="none",
        use_dictionary=False,
    )


@pytest.fixture()
def big_single_group(tmp_path):
    p = str(tmp_path / "single.parquet")
    _write(p, 4096, row_group_size=4096)  # ~290 KB, ONE row group
    assert os.path.getsize(p) > 2 * MAX_SPLIT
    assert pq.ParquetFile(p).metadata.num_row_groups == 1
    return p


@pytest.fixture()
def big_many_groups(tmp_path):
    p = str(tmp_path / "many.parquet")
    _write(p, 4096, row_group_size=256)  # same bytes, 16 row groups
    assert pq.ParquetFile(p).metadata.num_row_groups == 16
    return p


def test_single_row_group_estimates_one_split(big_single_group):
    # byte math says ~5 splits; the footer says the file cannot split
    est = _estimate_natural_splits([big_single_group], target=32, max_split=MAX_SPLIT)
    assert est == 1


def test_many_row_groups_estimate_byte_splits(big_many_groups):
    size = os.path.getsize(big_many_groups)
    expected = -(-size // MAX_SPLIT)  # ceil; 16 row groups don't bind
    est = _estimate_natural_splits([big_many_groups], target=32, max_split=MAX_SPLIT)
    assert est == min(expected, 16)
    assert est > 1


def test_ceiling_division(tmp_path):
    # a file just over max_split is 2 splits (ADVICE r17: floor said 1)
    p = str(tmp_path / "remainder.parquet")
    _write(p, 1200, row_group_size=100)  # many groups so bytes bind
    size = os.path.getsize(p)
    est = _estimate_natural_splits([p], target=32, max_split=size - 1)
    assert est == 2


def test_footer_read_is_bounded_by_target(big_single_group, monkeypatch):
    # once the running estimate reaches target, no further footers open
    import cyrela_etl_spark.sources.parquet as mod

    opened: list[str] = []
    real = pq.ParquetFile

    class Counting:
        def __new__(cls, path, *a, **k):
            opened.append(path)
            return real(path, *a, **k)

    monkeypatch.setattr(pq, "ParquetFile", Counting)
    files = [big_single_group] * 80
    est = mod._estimate_natural_splits(files, target=4, max_split=MAX_SPLIT)
    assert est == 4  # 4 files x 1 split each, then early-out
    assert len(opened) <= 4


def test_remote_uri_returns_none():
    assert _estimate_natural_splits(["s3a://bucket/part-0.parquet"], target=8) is None


def test_local_path_forms():
    assert _local_path("file:///a/b.parquet") == "/a/b.parquet"
    assert _local_path("/a/b.parquet") == "/a/b.parquet"
    assert _local_path("hdfs://nn/a.parquet") is None
