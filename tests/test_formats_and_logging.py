"""Format connector roundtrips + facade log-sink parity (O7)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from map_reduce_framework_spark.mapreduce import run_map_reduce
from map_reduce_framework_spark.sources import formats, load_table

from .conftest import SF_DIR


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_pq")
    formats.write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = formats.read_parquet(spark, path).select(*orders.columns)
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(orders, "o_orderkey")
    # partition pruning: a status filter must prune to one directory
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where(F.col("o_orderstatus") == "F").explain()
    assert "o_orderstatus" in buf.getvalue()


def test_csv_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_csv")
    formats.write_csv(nation, path)
    back = formats.read_csv(
        spark, path, "n_nationkey int, n_name string, n_regionkey int"
    ).select(*nation.columns)
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(nation, "n_nationkey")


def test_json_roundtrip(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").limit(200)
    path = str(tmp_path / "events_json")
    formats.write_json(events, path)
    back = formats.read_json(
        spark,
        path,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).select(*events.columns)
    assert _sorted_rows(back, "event_id") == _sorted_rows(events, "event_id")


def test_xml_roundtrip(spark, tmp_path):
    """XML source/sink (built into Spark 4): schema-stable roundtrip of a
    dimension table AND a timestamp-bearing event slice."""
    nation = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_xml")
    formats.write_xml(nation, path, row_tag="nation")
    back = formats.read_xml(
        spark, path, "n_nationkey int, n_name string, n_regionkey int",
        row_tag="nation",
    ).select(*nation.columns)
    assert _sorted_rows(back, "n_nationkey") == _sorted_rows(nation, "n_nationkey")

    events = load_table(spark, SF_DIR, "events").limit(50)
    epath = str(tmp_path / "events_xml")
    formats.write_xml(events, epath)
    eback = formats.read_xml(
        spark,
        epath,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).select(*events.columns)
    assert _sorted_rows(eback, "event_id") == _sorted_rows(events, "event_id")


def test_mapreduce_log_sink(spark, tmp_path):
    log = str(tmp_path / ".MapReduceFramework.log")

    def m(k, v):
        yield k % 2, v

    def r(k, vals):
        yield k, sum(vals)

    out = run_map_reduce(
        spark, [(i, i) for i in range(10)], m, r, num_partitions=2, log_path=log
    )
    assert out == [(0, 20), (1, 25)]
    lines = open(log).read().splitlines()
    assert lines[0] == "RunMapReduceFramework started with 2 threads"
    assert lines[-1] == "RunMapReduceFramework finished"
    stamp = r"\[\d{2}\.\d{2}\.\d{4} \d{2}:\d{2}:\d{2}\]"
    assert sum(bool(re.fullmatch(f"Thread ExecMap created {stamp}", l)) for l in lines) == 2
    assert sum(bool(re.fullmatch(f"Thread ExecReduce terminated {stamp}", l)) for l in lines) == 2
    assert any(re.fullmatch(r"Map and Shuffle took \d+ ns", l) for l in lines)
    assert any(re.fullmatch(r"Reduce took \d+ ns", l) for l in lines)


def test_mapreduce_log_empty_input(spark, tmp_path):
    log = str(tmp_path / "empty.log")
    out = run_map_reduce(spark, [], lambda k, v: [], lambda k, v: [], log_path=log)
    assert out == []
    lines = open(log).read().splitlines()
    assert lines[-1] == "RunMapReduceFramework finished"


def test_orc_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc")
    formats.write_orc(orders, path)
    back = formats.read_orc(spark, path).select(*orders.columns)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )


def test_binary_file_source_reads_payloads(spark, tmp_path):
    """binaryFile source: one row per file, content bytes intact, and
    pathGlobFilter prunes by extension before reading."""
    payloads = {
        "a.img": b"\x89PNG-fake-bytes",
        "b.img": b"GIF89a-fake",
        "c.txt": b"not media",
    }
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    df = formats.read_binary_files(spark, str(tmp_path), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {k: v for k, v in payloads.items() if k.endswith(".img")}
    lengths = {
        r["path"].rsplit("/", 1)[-1]: r["length"] for r in df.collect()
    }
    assert lengths == {"a.img": 15, "b.img": 11}


def test_text_lines_roundtrip(spark, tmp_path):
    """Raw text-lines sink → source roundtrip preserves the document
    multiset (line-oriented corpora are the plain-text ingest format)."""
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.sources.formats import (
        read_text_lines,
        write_text_lines,
    )

    docs = load_table(spark, SF_DIR, "documents")
    dest = str(tmp_path / "corpus_txt")
    write_text_lines(docs, dest)
    back = read_text_lines(spark, dest)
    assert sorted(r["value"] for r in back.collect()) == sorted(
        r["text"] for r in docs.collect()
    )


def test_jsonl_corrupt_record_audit(spark, tmp_path):
    """Permissive JSONL ingest must keep good rows, capture bad lines in
    _corrupt_record, and account for every input line."""
    from map_reduce_framework_spark.sources.formats import read_jsonl_audited

    src = tmp_path / "feed.jsonl"
    good = ['{"doc_id": 1, "text": "alpha"}', '{"doc_id": 2, "text": "beta"}']
    bad = ['{"doc_id": 3, "text": ', "not json at all"]
    src.write_text("\n".join(good + bad) + "\n")
    df = read_jsonl_audited(
        spark, str(src), "doc_id long, text string"
    ).cache()
    n_bad = df.where("_corrupt_record IS NOT NULL").count()
    n_good = df.where("_corrupt_record IS NULL").count()
    assert n_bad == len(bad)
    assert n_good == len(good)
    assert {r["text"] for r in df.where("_corrupt_record IS NULL").collect()} == {
        "alpha",
        "beta",
    }


def test_training_shards_roundtrip_and_manifest(spark, tmp_path):
    """Shard export: every row lands exactly once, every shard respects
    the record cap, and the manifest's counts reconcile with the data."""
    from map_reduce_framework_spark.sources import load_table
    from map_reduce_framework_spark.sources.shards import (
        shard_manifest,
        write_training_shards,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    cap = 40
    write_training_shards(docs, out, max_records_per_file=cap)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )

    man = shard_manifest(spark, out).collect()
    assert len(man) > 0
    assert sum(r.n_rows for r in man) == docs.count()
    for r in man:
        assert r.n_rows <= cap
        assert r.bytes > 0
        assert r.min_id <= r.max_id
        assert f"source={r.source}" in r.shard


def test_footer_probe_sees_beyond_the_first_shard(tmp_path):
    """A sharded table whose LAST part file carries the nanos encoding
    must still trip the probe (round-6: `_footer_timestamp_kinds` now
    checks first/middle/last footers, not one file — the boundary of a
    mid-table re-encoding lands at some file boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from map_reduce_framework_spark.sources.tables import (
        _footer_timestamp_kinds,
    )

    d = tmp_path / "events.parquet"
    d.mkdir()
    us = pa.table({"ts": pa.array([0, 1], pa.timestamp("us"))})
    ns = pa.table({"ts": pa.array([0, 1], pa.timestamp("ns"))})
    pq.write_table(us, d / "part-00000.parquet")
    pq.write_table(us, d / "part-00001.parquet")
    pq.write_table(ns, d / "part-00002.parquet")
    naive, nanos = _footer_timestamp_kinds(str(d))
    assert nanos, "nanos shard at the end of the table went undetected"
    assert naive  # the us shards are tz-naive
    # single-file path unchanged
    naive1, nanos1 = _footer_timestamp_kinds(str(d / "part-00000.parquet"))
    assert naive1 and not nanos1


def test_failure_contract_stderr_and_exit(capsys):
    """Reference parity (MapReduceFramework.cpp:204-216): an engine-side
    failure prints the exact stderr line and exits EXIT_FAILURE."""
    import pytest

    from map_reduce_framework_spark.mapreduce import failure_checker_printer

    failure_checker_printer("pthread_mutex_lock()", 0)  # SUCCESS: no-op
    with pytest.raises(SystemExit) as exc:
        failure_checker_printer("open()", 1)
    assert exc.value.code == 1
    assert (
        capsys.readouterr().err
        == "MapReduceFramework Failure: open() failed.\n"
    )


def test_failure_contract_unopenable_log(spark, tmp_path, capsys):
    """A log path that cannot be opened routes through the failure
    contract at run START, like the reference's FILE_OPEN check
    (MapReduceFramework.cpp:685-690)."""
    import pytest

    bad = str(tmp_path / "no-such-dir" / ".MapReduceFramework.log")
    with pytest.raises(SystemExit) as exc:
        run_map_reduce(
            spark, [(1, 1)], lambda k, v: [(k, v)], lambda k, vs: [(k, len(vs))],
            log_path=bad,
        )
    assert exc.value.code == 1
    assert (
        "MapReduceFramework Failure: open() failed."
        in capsys.readouterr().err
    )
