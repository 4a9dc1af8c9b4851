"""Golden tests for the Search and WordCount parity clients (SURVEY §5)."""

from __future__ import annotations

import pytest

from map_reduce_framework_spark.operators.search_client import search
from map_reduce_framework_spark.operators.wordcount_client import (
    wordcount_mr,
    wordcount_mr_df,
)
from map_reduce_framework_spark.operators.relational import wordcount

from .conftest import SF_DIR


@pytest.fixture()
def search_tree(tmp_path):
    """Spec PDF p.5 fixture: files TA BLA osTargil sos targilOs."""
    d = tmp_path / "dirA"
    d.mkdir()
    for name in ["TA", "BLA", "osTargil", "sos", "targilOs"]:
        (d / name).touch()
    return str(d)


def test_search_golden(spark, search_tree):
    # spec PDF p.5: query "os" over the folder => exactly "osTargil sos"
    out = search(spark, [("os", search_tree)])
    assert sorted(name for _, name in out) == ["osTargil", "sos"]


def test_search_invalid_dir_silent(spark, search_tree):
    # invalid path contributes 0 rows, silently (Search.cpp:186-189)
    out = search(
        spark, [("os", search_tree), ("os", "/no/such/dir/anywhere")]
    )
    assert sorted(name for _, name in out) == ["osTargil", "sos"]


def test_search_multi_folder_duplicates(spark, search_tree, tmp_path):
    # same file name in two folders => two output rows (§2.3d)
    d2 = tmp_path / "dirB"
    d2.mkdir()
    (d2 / "sos").touch()
    out = search(spark, [("os", search_tree), ("os", str(d2))])
    assert sorted(name for _, name in out) == ["osTargil", "sos", "sos"]


def test_search_dot_entries_match(spark, tmp_path):
    # readdir parity: '.' and '..' are listed and can match a '.' query
    d = tmp_path / "dirC"
    d.mkdir()
    (d / "a.txt").touch()
    out = search(spark, [(".", str(d))])
    assert sorted(name for _, name in out) == [".", "..", "a.txt"]


def test_wordcount_object_path(spark):
    docs = [("d1", "a b a"), ("d2", "b c"), ("d3", "")]
    out = wordcount_mr(spark, docs)
    assert out == [("a", 2), ("b", 2), ("c", 1)]


def test_wordcount_three_ways_agree(spark):
    """Layer A native, DataFrame facade, and object facade all agree on
    the documents table (sf0.001)."""
    native = {
        (r["word"], r["cnt"]) for r in wordcount(spark, SF_DIR).collect()
    }
    facade_df = {
        (r["word"], r["cnt"])
        for r in wordcount_mr_df(spark, SF_DIR).collect()
    }
    assert native == facade_df

    docs = [
        (str(r["doc_id"]), r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    object_path = set(wordcount_mr(spark, docs))
    assert object_path == native


def test_search_df_matches_object_path(spark, search_tree, tmp_path):
    from map_reduce_framework_spark.operators.search_client import search_df

    d2 = tmp_path / "dirB"
    d2.mkdir()
    (d2 / "sos").touch()
    pairs = [
        ("os", search_tree),
        ("os", str(d2)),
        ("os", "/no/such/dir"),
    ]
    df_out = sorted(
        (r["query"], r["name"]) for r in search_df(spark, pairs).collect()
    )
    obj_out = sorted(search(spark, pairs))
    assert df_out == obj_out == [
        ("os", "osTargil"),
        ("os", "sos"),
        ("os", "sos"),
    ]


def test_cli_writes_default_log(spark, search_tree, tmp_path, monkeypatch, capsys):
    """The CLI client mirrors the reference's unconditional log sink
    (MapReduceFramework.cpp:685): every run writes
    .MapReduceFramework.log in the working directory."""
    from map_reduce_framework_spark.operators.search_client import main

    monkeypatch.chdir(tmp_path)
    assert main(["os", search_tree]) == 0
    assert capsys.readouterr().out.split() == ["osTargil", "sos"]
    lines = (tmp_path / ".MapReduceFramework.log").read_text().splitlines()
    assert lines[0].startswith("RunMapReduceFramework started with")
    assert lines[-1] == "RunMapReduceFramework finished"
