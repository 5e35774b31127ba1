"""Config loader validation + CLI list (no-Spark paths in-process)."""

from __future__ import annotations

import tempfile

import pytest


def test_load_config_defaults_and_governance():
    from kafka_overwatch_spark.config import load_config

    yml = """
clusters:
  prod:
    cluster_scan_interval_in_seconds: 30
    topic_exclude_regexes: ["^_.*$"]
    governance:
      topic_naming_convention:
        regexes: ["^[a-z]+\\\\..*$"]
        ignore_regexes: ["^_.*$"]
  staging: {}
"""
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as fh:
        fh.write(yml)
        path = fh.name
    cfg = load_config(path)
    assert set(cfg) == {"prod", "staging"}
    assert cfg["prod"].cluster_scan_interval_in_seconds == 30
    assert cfg["prod"].governance.topic_naming_convention.regexes
    assert cfg["staging"].cluster_scan_interval_in_seconds == 60  # default
    assert cfg["staging"].governance is None


def test_load_config_rejects_bad_interval():
    from kafka_overwatch_spark.config import load_config

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as fh:
        fh.write("clusters:\n  x:\n    cluster_scan_interval_in_seconds: 0\n")
        path = fh.name
    with pytest.raises(ValueError, match="must be > 0"):
        load_config(path)


def test_cli_list_names_every_registered_query(capsys):
    from kafka_overwatch_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for expected in (
        "topics_df",
        "dedup_minhash_lsh",
        "cluster_report_scalars",
        "lag_distribution",
    ):
        assert expected in out
    assert "[rows-only]" in out and "[oracle]" in out


def test_cli_unknown_query_exit_code(spark, snaps):
    from kafka_overwatch_spark.cli import main

    # patch _spark to reuse the test session (avoid stop())
    import kafka_overwatch_spark.cli as cli

    orig_spark, orig_stop = cli._spark, spark.stop
    cli._spark = lambda: spark
    spark.stop = lambda: None
    try:
        rc = main(["query", "--name", "nope", "--sf-dir", "/root/testdata/sf0.001"])
    finally:
        cli._spark = orig_spark
        spark.stop = orig_stop
    assert rc == 2


def test_config_governance_regexes_drive_report(spark, snaps, tmp_path):
    """A config file's naming conventions override the default governance
    regexes in the report (S10 -> report integration)."""
    import json

    from kafka_overwatch_spark.config import load_config
    from kafka_overwatch_spark.operators.report import report_json

    p = tmp_path / "ow.yaml"
    p.write_text(
        """
clusters:
  primary:
    governance:
      topic_naming_convention:
        regexes: [".*"]
        ignore_regexes: []
"""
    )
    cfg = load_config(str(p))["primary"]
    payload = json.loads(
        report_json(snaps, governance_config=cfg.governance)
    )
    tnc = payload["governance"]["topic_naming_convention"]
    # everything matches .* → full compliance, nothing ignored
    assert tnc["non_compliant_count"] == 0
    assert tnc["total_ignored"] == 0
    assert tnc["compliant_percentage"] == 100.0
    # CG block untouched (no override given) — defaults still apply
    assert payload["governance"]["consumer_group_naming_convention"][
        "total"
    ] > 0


def test_cli_validate_and_dataset_card(spark, snaps):
    """The two r5 service commands run end-to-end; --strict propagates
    the fixture's known failing checks as a nonzero exit."""
    import kafka_overwatch_spark.cli as cli
    from kafka_overwatch_spark.cli import main

    orig_spark, orig_stop = cli._spark, spark.stop
    cli._spark = lambda: spark
    spark.stop = lambda: None
    try:
        assert main(["validate", "--sf-dir", "/root/testdata/sf0.001"]) == 0
        assert (
            main(["validate", "--sf-dir", "/root/testdata/sf0.001", "--strict"])
            == 1
        )
        assert main(["dataset-card", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    finally:
        cli._spark = orig_spark
        spark.stop = orig_stop


def test_cli_curate_corpus_writes_artifacts(spark, tmp_path):
    """curate-corpus writes corpus/rejected/card/manifest; kept +
    rejected partition the corpus; every artifact count matches the
    manifest; the kept set equals quality∧exact∧fuzzy computed
    directly."""
    import json

    from kafka_overwatch_spark import cli
    from kafka_overwatch_spark.cli import main
    from kafka_overwatch_spark.pipelines.curation import curate
    from kafka_overwatch_spark.pipelines.dedup import minhash_fuzzy_dedup
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "artifacts")
    orig_spark, orig_stop = cli._spark, spark.stop
    cli._spark = lambda: spark
    spark.stop = lambda: None
    try:
        assert main(["curate-corpus", "--sf-dir", sf, "--out", out]) == 0
    finally:
        cli._spark, spark.stop = orig_spark, orig_stop

    manifest = json.load(open(f"{out}/manifest.json"))
    card = json.load(open(f"{out}/card.json"))
    kept = spark.read.parquet(f"{out}/corpus")
    rejected = spark.read.parquet(f"{out}/rejected")
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    assert kept.count() == manifest["kept"] == card["n_docs"]
    assert rejected.count() == manifest["total_docs"] - manifest["kept"]
    assert (
        manifest["quality_fail"] + manifest["exact_dup"]
        + manifest["fuzzy_dup"] + manifest["kept"]
        == manifest["total_docs"] == docs.count()
    )
    # kept ∪ rejected partitions the corpus, disjointly
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    rej_ids = {r.doc_id for r in rejected.select("doc_id").collect()}
    assert kept_ids.isdisjoint(rej_ids)
    assert kept_ids | rej_ids == {
        r.doc_id for r in docs.select("doc_id").collect()
    }
    # composition law: fuzzy keepers are elected among the BASE
    # survivors (a quality-rejected cluster keeper must never shadow
    # its quality-passing near-dups), so kept == the keep-set of
    # minhash_fuzzy_dedup restricted to curate()'s output
    base_df = curate(docs).select("doc_id")
    base = {r.doc_id for r in base_df.collect()}
    fuzzy = {
        r.doc_id
        for r in minhash_fuzzy_dedup(docs.join(base_df, "doc_id", "semi"))
        .filter(F.col("keep"))
        .select("doc_id")
        .collect()
    }
    assert fuzzy <= base
    assert kept_ids == fuzzy
    # kept rows carry text + split + quality columns
    assert {"text", "split", "quality_score", "n_tokens"} <= set(kept.columns)
