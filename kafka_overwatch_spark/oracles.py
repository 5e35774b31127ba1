"""DuckDB oracle SQL for every registered query (the driver's t2 gate).

Each entry is a standalone DuckDB statement over the raw testdata views
(region/nation/.../documents/embeddings). Queries over the Kafka snapshot
model embed the snapshot CTE chain (rendered for DuckDB from the same
common-dialect source the Spark side executes — see ``snapshot.py``), so
the oracle and the engine agree on the *inputs* and the comparison tests
the *query semantics*.

Oracle-parity conventions (see SURVEY §7 "hard parts"):
- every integer aggregated/derived column CAST to BIGINT (DuckDB widens
  SUM to HUGEINT; Spark stays LONG)
- double columns rounded to ≤6 decimals on both sides
- int-truncation (`int()` in the reference) expressed as floor() of the
  same double expression on both sides — never a bare CAST (DuckDB CAST
  rounds, Spark CAST truncates)
- timestamps exported as epoch seconds (BIGINT)
- exact percentile: pandas quantile(0.75) == Spark percentile() ==
  DuckDB quantile_cont()
"""

from __future__ import annotations

from .snapshot import duckdb_with_prefix


def _snap(body: str) -> str:
    return f"WITH {duckdb_with_prefix()},\n{body}"


def _snap_plain(select: str) -> str:
    return f"WITH {duckdb_with_prefix()}\n{select}"


# Shared derived-frame CTEs (duckdb dialect), appended after the snapshot
# chain by queries that need them. Parametrized by cluster: the report
# family is per-cluster (one report per cluster, `overwatch.py:92-120`);
# fleet-wide queries pass cluster=None and carry the cluster column.


def _topics_df_cte(cluster: str | None = "primary", sfx: str = "") -> str:
    cl = f" AND cluster = '{cluster}'" if cluster else ""
    clw = f" WHERE cluster = '{cluster}'" if cluster else ""
    return f"""
po_final_scan{sfx} AS (
  SELECT * FROM partition_offsets WHERE scan_id = 3{cl}
),
po_base{sfx} AS (
  SELECT topic, partition_id, end_offset AS end0, ts AS ts0
  FROM partition_offsets WHERE scan_id = 0{cl}
),
per_topic{sfx} AS (
  SELECT f.topic,
    CAST(count(*) AS BIGINT) AS partitions,
    CAST(sum(f.end_offset - f.start_offset) AS BIGINT) AS total_messages,
    CAST(sum(f.end_offset - b.end0) AS BIGINT) AS new_messages,
    CAST(max(CASE WHEN f.partition_id = 0
             THEN date_diff('second', b.ts0, f.ts) END) AS BIGINT)
      AS eval_elapsed_time
  FROM po_final_scan{sfx} f
  JOIN po_base{sfx} b ON f.topic = b.topic AND f.partition_id = b.partition_id
  GROUP BY f.topic
),
cg_active{sfx} AS (
  SELECT group_id,
    (state NOT IN ('DEAD','EMPTY') AND members > 0) AS is_active
  FROM consumer_groups{clw}
),
gcounts{sfx} AS (
  SELECT topic,
    CAST(count(*) AS BIGINT) AS consumer_groups,
    CAST(sum(CASE WHEN is_active THEN 1 ELSE 0 END) AS BIGINT)
      AS active_groups
  FROM (SELECT DISTINCT group_id, topic FROM group_offsets{clw}) go
  JOIN cg_active{sfx} USING (group_id)
  GROUP BY topic
),
topics_df{sfx} AS (
  SELECT p.topic AS name, p.partitions, p.total_messages, p.new_messages,
    p.eval_elapsed_time,
    CAST(coalesce(g.consumer_groups, 0) AS BIGINT) AS consumer_groups,
    CAST(coalesce(g.active_groups, 0) AS BIGINT) AS active_groups,
    CAST(coalesce(floor(p.new_messages / p.eval_elapsed_time), 0) AS BIGINT)
      AS messages_per_seconds
  FROM per_topic{sfx} p LEFT JOIN gcounts{sfx} g ON p.topic = g.topic
)
"""


TOPICS_DF_CTE = _topics_df_cte("primary")


def _lag_cte(cluster: str | None = None) -> str:
    cl = f" AND cluster = '{cluster}'" if cluster else ""
    return f"""
po_final_scan AS (
  SELECT cluster, topic, partition_id, start_offset, end_offset
  FROM partition_offsets WHERE scan_id = 3{cl}
),
go_valid AS (
  SELECT g.cluster, g.group_id, g.topic, g.partition_id, g.committed_offset,
         p.start_offset, p.end_offset
  FROM group_offsets g
  JOIN po_final_scan p
    ON g.cluster = p.cluster AND g.topic = p.topic
   AND g.partition_id = p.partition_id
),
go_measured AS (
  -- P11 ordering: zero-message partitions are skipped (continue) BEFORE
  -- the committed<0 break is evaluated (reference groups.py:111-130)
  SELECT * FROM go_valid WHERE (end_offset - start_offset) > 0
),
first_bad AS (
  SELECT cluster, group_id, topic, min(partition_id) AS first_bad
  FROM go_measured WHERE committed_offset < 0
  GROUP BY cluster, group_id, topic
),
lag_rows AS (
  SELECT v.cluster, v.group_id, v.topic, v.partition_id,
    CAST(v.end_offset - v.committed_offset AS BIGINT) AS lag
  FROM go_measured v
  LEFT JOIN first_bad fb ON v.cluster = fb.cluster
    AND v.group_id = fb.group_id AND v.topic = fb.topic
  WHERE (fb.first_bad IS NULL OR v.partition_id < fb.first_bad)
)
"""


LAG_CTE = _lag_cte(None)

# Shared verbatim with the Spark side (operators/usage.py).
from .operators.usage import WASTE_PREDICATES as WASTE_FILTERS  # noqa: E402


def _report_scalars_ctes(cluster: str, sfx: str) -> str:
    """CTE chain of the report-scalars companion for one cluster; names
    suffixed so per-cluster bodies can coexist in one UNION statement."""
    return (
        _topics_df_cte(cluster, sfx)
        + f""",
tot{sfx} AS (SELECT count(*) AS total FROM topics_df{sfx}),
ma{sfx} AS (
  SELECT name, partitions, total_messages, new_messages, active_groups
  FROM topics_df{sfx},
    (SELECT quantile_cont(new_messages, 0.75) AS q_new,
            quantile_cont(total_messages, 0.75) AS q_total
     FROM topics_df{sfx}) t
  WHERE new_messages > q_new AND total_messages > q_total
    AND active_groups > 0
),
gov{sfx} AS (
  SELECT name,
    regexp_matches(name, '^_.*$') AS excluded_name,
    regexp_matches(name, '^[a-z]+\\.[a-z]+\\..*$') AS compliant_name
  FROM topics WHERE cluster = '{cluster}'
),
ggov{sfx} AS (
  SELECT group_id AS name,
    regexp_matches(group_id, '^_.*$') AS excluded_name,
    regexp_matches(group_id, '^cg-[0-9]+$') AS compliant_name
  FROM consumer_groups WHERE cluster = '{cluster}'
)"""
    )


def _report_scalars_select(cluster: str, sfx: str) -> str:
    """SELECT body of the report-scalars companion for one cluster."""
    cat_scalars = ",\n".join(
        f"""
  (SELECT '{{' || coalesce(string_agg(
      '"' || name || '":' || CAST(partitions AS STRING), ',' ORDER BY name),
      '') || '}}' FROM topics_df{sfx} WHERE {flt}) AS {cat}_topics_json,
  (SELECT CAST(count(name) AS BIGINT) FROM topics_df{sfx} WHERE {flt})
    AS {cat}_topics_count,
  (SELECT CAST(coalesce(sum(partitions), 0) AS BIGINT) FROM topics_df{sfx}
   WHERE {flt}) AS {cat}_partitions_sum,
  (SELECT CAST(floor((CAST(count(name) AS DOUBLE)
      / (SELECT total FROM tot{sfx})) * 100) AS BIGINT) FROM topics_df{sfx}
   WHERE {flt}) AS {cat}_pct"""
        for cat, flt in WASTE_FILTERS.items()
    )
    gov_block = ",\n".join(
        f"""
  (SELECT CAST(count(*) AS BIGINT) FROM {g}{sfx}) AS {p}_total,
  (SELECT CAST(sum(CASE WHEN excluded_name THEN 1 ELSE 0 END) AS BIGINT)
   FROM {g}{sfx}) AS {p}_total_ignored,
  (SELECT CAST(count(*) - sum(CASE WHEN excluded_name THEN 1 ELSE 0 END)
      AS BIGINT) FROM {g}{sfx}) AS {p}_total_measured,
  (SELECT CAST(sum(CASE WHEN NOT compliant_name AND NOT excluded_name
      THEN 1 ELSE 0 END) AS BIGINT) FROM {g}{sfx})
    AS {p}_non_compliant_count,
  (SELECT round(100 - (CAST(sum(CASE WHEN NOT compliant_name AND NOT
      excluded_name THEN 1 ELSE 0 END) AS DOUBLE) * 100)
      / (count(*) - sum(CASE WHEN excluded_name THEN 1 ELSE 0 END)), 6)
   FROM {g}{sfx}) AS {p}_compliant_percentage"""
        for g, p in (("gov", "gov"), ("ggov", "ggov"))
    )
    return f"""
SELECT
  '{cluster}' AS cluster_name,
  (SELECT CAST(count(name) AS BIGINT) FROM topics_df{sfx}) AS stat_topics,
  (SELECT CAST(coalesce(sum(partitions), 0) AS BIGINT) FROM topics_df{sfx})
    AS stat_partitions,
  (SELECT '{{' || coalesce(string_agg(
      '"' || name || '":{{"partitions":' || CAST(partitions AS STRING)
      || ',"total_messages":' || CAST(total_messages AS STRING)
      || ',"new_messages":' || CAST(new_messages AS STRING)
      || ',"active_groups":' || CAST(active_groups AS STRING) || '}}',
      ',' ORDER BY name), '') || '}}' FROM ma{sfx}) AS most_active_json,
  (SELECT CAST(count(*) AS BIGINT) FROM consumer_groups
   WHERE cluster = '{cluster}') AS cg_total,
  (SELECT CAST(coalesce(sum(CASE WHEN state NOT IN ('DEAD','EMPTY')
      AND members > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
   FROM consumer_groups WHERE cluster = '{cluster}') AS cg_active,
  (SELECT CAST(count(*) - coalesce(sum(CASE WHEN state NOT IN
      ('DEAD','EMPTY') AND members > 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
   FROM consumer_groups WHERE cluster = '{cluster}') AS cg_inactive,
{cat_scalars},
{gov_block},
  (SELECT CAST(count(*) AS BIGINT) FROM subjects) AS sr_subjects_count,
  (SELECT CAST(count(*) AS BIGINT) FROM schemas) AS sr_schemas_count,
  (SELECT CAST(count(*) AS BIGINT) FROM subject_versions)
    AS sr_versions_count,
  (SELECT CAST(count(*) AS BIGINT) FROM subjects
   WHERE replace(replace(subject, '-value', ''), '-key', '')
         NOT IN (SELECT name FROM topics WHERE cluster = '{cluster}'))
    AS sr_unused_subjects_count,
  (SELECT '[' || coalesce(string_agg('"' || subject || '"', ','
      ORDER BY subject), '') || ']' FROM subjects
   WHERE replace(replace(subject, '-value', ''), '-key', '')
         NOT IN (SELECT name FROM topics WHERE cluster = '{cluster}'))
    AS sr_detected_unused_json"""


def oracle_queries() -> dict[str, str]:
    q: dict[str, str] = {}

    # --- snapshot passthroughs (fixture-parity sanity) ---
    q["snapshot_partition_offsets"] = _snap_plain(
        """
SELECT cluster, topic, partition_id, scan_id, start_offset, end_offset,
  CAST(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS BIGINT)
    AS ts_sec
FROM partition_offsets"""
    )
    q["snapshot_topics"] = _snap_plain(
        "SELECT cluster, name, partitions, retention_ms, cleanup_policy FROM topics"
    )
    q["snapshot_consumer_groups"] = _snap_plain(
        "SELECT cluster, group_id, state, members FROM consumer_groups"
    )
    q["snapshot_group_offsets"] = _snap_plain(
        "SELECT cluster, group_id, topic, partition_id, committed_offset "
        "FROM group_offsets"
    )
    q["snapshot_topic_configs"] = _snap_plain(
        "SELECT cluster, topic, config_key, config_value FROM topic_configs"
    )
    q["snapshot_subjects"] = _snap_plain("SELECT registry, subject FROM subjects")
    q["snapshot_subject_versions"] = _snap_plain(
        "SELECT registry, subject, version, schema_id FROM subject_versions"
    )
    q["snapshot_schemas"] = _snap_plain(
        "SELECT registry, schema_id, schema_type, schema_string FROM schemas"
    )

    # --- topics_df and derived reports ---
    q["topics_df"] = _snap(TOPICS_DF_CTE + "\nSELECT * FROM topics_df")

    for cat, flt in WASTE_FILTERS.items():
        q[f"waste_{cat}"] = _snap(
            TOPICS_DF_CTE
            + f"\nSELECT name, partitions FROM topics_df WHERE {flt}"
        )

    q["waste_summary"] = _snap(
        TOPICS_DF_CTE
        + ",\ntot AS (SELECT count(*) AS total FROM topics_df)\n"
        + "\nUNION ALL\n".join(
            f"""
SELECT '{cat}' AS category,
  CAST(count(name) AS BIGINT) AS topics_count,
  CAST(coalesce(sum(partitions), 0) AS BIGINT) AS topic_partitions_sum,
  CAST(floor((CAST(count(name) AS DOUBLE) / (SELECT total FROM tot)) * 100)
    AS BIGINT) AS cluster_percentage
FROM topics_df WHERE {flt}"""
            for cat, flt in WASTE_FILTERS.items()
        )
    )

    q["most_active_topics"] = _snap(
        TOPICS_DF_CTE
        + """,
thresholds AS (
  SELECT quantile_cont(new_messages, 0.75) AS q_new,
         quantile_cont(total_messages, 0.75) AS q_total
  FROM topics_df
)
SELECT name, partitions, total_messages, new_messages, active_groups
FROM topics_df, thresholds
WHERE new_messages > q_new AND total_messages > q_total
  AND active_groups > 0"""
    )

    q["cluster_statistics"] = _snap(
        TOPICS_DF_CTE
        + """
SELECT CAST(count(name) AS BIGINT) AS topics,
       CAST(coalesce(sum(partitions), 0) AS BIGINT) AS partitions
FROM topics_df"""
    )
    # fleet surface: the same statistics per cluster (one pruned pipeline
    # per cluster, CTE names suffixed — duplicating the reference's
    # per-cluster report loop)
    q["cluster_statistics_by_cluster"] = _snap(
        _topics_df_cte("analytics", "_a")
        + ",\n"
        + _topics_df_cte("primary", "_p")
        + """
SELECT 'analytics' AS cluster,
  CAST(count(name) AS BIGINT) AS topics,
  CAST(coalesce(sum(partitions), 0) AS BIGINT) AS partitions
FROM topics_df_a
UNION ALL
SELECT 'primary' AS cluster,
  CAST(count(name) AS BIGINT) AS topics,
  CAST(coalesce(sum(partitions), 0) AS BIGINT) AS partitions
FROM topics_df_p"""
    )

    # --- lag / groups_df (cluster-carrying; fleet-wide) ---
    q["lag_per_partition"] = _snap(
        LAG_CTE
        + "\nSELECT cluster, group_id, topic, partition_id, lag FROM lag_rows"
    )
    q["lag_per_topic"] = _snap(
        LAG_CTE
        + """
SELECT cluster, group_id, topic, CAST(sum(lag) AS BIGINT) AS total_lag,
  CAST(count(*) AS BIGINT) AS partitions_measured
FROM lag_rows GROUP BY cluster, group_id, topic
HAVING sum(lag) <> 0"""
    )
    # per-group lag distribution (SLA/hotspot view over partitions)
    q["lag_distribution"] = _snap(
        LAG_CTE
        + """
SELECT cluster, group_id,
  CAST(count(*) AS BIGINT) AS partitions_measured,
  CAST(sum(lag) AS BIGINT) AS total_lag,
  CAST(max(lag) AS BIGINT) AS max_partition_lag,
  round(quantile_cont(lag, 0.5), 6) AS p50_lag,
  round(quantile_cont(lag, 0.95), 6) AS p95_lag,
  round(max(lag) * 1.0 / nullif(sum(lag), 0), 6) AS hotspot_share
FROM lag_rows GROUP BY cluster, group_id"""
    )
    # hash-checkable companion of lag_nested: the partition_lags array
    # rendered exactly as Spark's to_json emits it
    q["lag_nested_json"] = _snap(
        LAG_CTE
        + """
SELECT cluster, group_id, topic, CAST(sum(lag) AS BIGINT) AS total_lag,
  '[' || string_agg(
    '{"partition_id":' || CAST(partition_id AS STRING)
    || ',"lag":' || CAST(lag AS STRING) || '}',
    ',' ORDER BY partition_id, lag) || ']' AS partition_lags_json
FROM lag_rows GROUP BY cluster, group_id, topic
HAVING sum(lag) <> 0"""
    )
    q["groups_df"] = _snap(
        _lag_cte("primary")
        + """,
elapsed AS (
  SELECT CAST(date_diff('second',
    (SELECT ts FROM scan_ts WHERE scan_id = 0),
    (SELECT ts FROM scan_ts WHERE scan_id = 3)) AS BIGINT)
    AS eval_elapsed_time
),
overall AS (
  SELECT group_id, CAST(sum(lag) AS BIGINT) AS overall_lag
  FROM lag_rows GROUP BY group_id
)
SELECT cg.group_id AS name, cg.members, cg.state, e.eval_elapsed_time,
  CAST(coalesce(o.overall_lag, 0) AS BIGINT) AS overall_lag,
  (cg.state NOT IN ('DEAD','EMPTY') AND cg.members > 0) AS is_active
FROM consumer_groups cg
LEFT JOIN overall o ON cg.group_id = o.group_id
CROSS JOIN elapsed e
WHERE cg.cluster = 'primary'"""
    )

    # hash-checkable companion of cluster_report: every leaf of the nested
    # report struct as a column; the two map leaves rendered as the exact
    # JSON strings Spark's to_json emits (sorted keys, no whitespace).
    # Parameterized by (cluster, CTE suffix) so the fleet variant can
    # UNION ALL per-cluster bodies in one statement.
    q["cluster_report_scalars"] = _snap(
        _report_scalars_ctes("primary", "")
        + _report_scalars_select("primary", "")
    )
    q["cluster_report_scalars_by_cluster"] = _snap(
        _report_scalars_ctes("analytics", "_a")
        + ",\n"
        + _report_scalars_ctes("primary", "_p")
        + _report_scalars_select("analytics", "_a")
        + "\nUNION ALL\n"
        + _report_scalars_select("primary", "_p")
    )

    # --- governance (per-cluster: 'primary') ---
    gov_topics = """
gov AS (
  SELECT name,
    regexp_matches(name, '^_.*$') AS excluded_name,
    regexp_matches(name, '^[a-z]+\\.[a-z]+\\..*$') AS compliant_name
  FROM topics WHERE cluster = 'primary'
)"""
    q["governance_topics"] = _snap(gov_topics + "\nSELECT * FROM gov")
    q["governance_groups"] = _snap(
        """
gov AS (
  SELECT group_id AS name,
    regexp_matches(group_id, '^_.*$') AS excluded_name,
    regexp_matches(group_id, '^cg-[0-9]+$') AS compliant_name
  FROM consumer_groups WHERE cluster = 'primary'
)
SELECT * FROM gov"""
    )
    # reference CG bug mode: topic regexes evaluated against group names
    q["governance_groups_reference_mode"] = _snap(
        """
gov AS (
  SELECT group_id AS name,
    regexp_matches(group_id, '^_.*$') AS excluded_name,
    regexp_matches(group_id, '^[a-z]+\\.[a-z]+\\..*$') AS compliant_name
  FROM consumer_groups WHERE cluster = 'primary'
)
SELECT * FROM gov"""
    )

    q["governance_summary"] = _snap(
        gov_topics
        + """
SELECT
  CAST(count(*) AS BIGINT) AS total,
  CAST(sum(CASE WHEN excluded_name THEN 1 ELSE 0 END) AS BIGINT)
    AS total_ignored,
  CAST(count(*) - sum(CASE WHEN excluded_name THEN 1 ELSE 0 END) AS BIGINT)
    AS total_measured,
  CAST(sum(CASE WHEN NOT compliant_name AND NOT excluded_name THEN 1 ELSE 0
      END) AS BIGINT) AS non_compliant_count,
  round(100 - (CAST(sum(CASE WHEN NOT compliant_name AND NOT excluded_name
      THEN 1 ELSE 0 END) AS DOUBLE) * 100)
    / (count(*) - sum(CASE WHEN excluded_name THEN 1 ELSE 0 END)), 6)
    AS compliant_percentage
FROM gov"""
    )

    # --- schema registry ---
    q["sr_unused_subjects"] = _snap_plain(
        """
SELECT registry, subject FROM subjects
WHERE replace(replace(subject, '-value', ''), '-key', '')
      NOT IN (SELECT name FROM topics)"""
    )
    q["sr_summary"] = _snap_plain(
        """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM subjects) AS subjects_count,
  (SELECT CAST(count(*) AS BIGINT) FROM schemas) AS schemas_count,
  (SELECT CAST(count(*) AS BIGINT) FROM subject_versions) AS versions_count,
  (SELECT CAST(count(*) AS BIGINT) FROM subjects
   WHERE replace(replace(subject, '-value', ''), '-key', '')
         NOT IN (SELECT name FROM topics)) AS unused_subjects_count"""
    )
    q["sr_schema_type_breakdown"] = _snap_plain(
        """
SELECT schema_type, CAST(count(*) AS BIGINT) AS schemas_count
FROM schemas GROUP BY schema_type"""
    )
    q["sr_backup_index"] = _snap_plain(
        """
SELECT sv.registry, sv.subject, sv.version, sv.schema_id, s.schema_type,
  concat(sv.subject, '::', CAST(sv.version AS STRING), '::', s.schema_type,
         '::', CAST(sv.schema_id AS STRING), '.txt') AS backup_file,
  s.schema_string
FROM subject_versions sv JOIN schemas s ON sv.schema_id = s.schema_id"""
    )

    # --- window / time-series ---
    q["w1_offset_deltas"] = _snap_plain(
        """
SELECT topic, partition_id, scan_id,
  CAST(end_offset - coalesce(lag(end_offset) OVER w, end_offset) AS BIGINT)
    AS delta_messages
FROM partition_offsets
WINDOW w AS (PARTITION BY topic, partition_id ORDER BY scan_id)"""
    )
    q["w2_new_since_baseline"] = _snap_plain(
        """
SELECT topic, partition_id, scan_id,
  CAST(end_offset - first_value(end_offset) OVER w AS BIGINT) AS new_messages
FROM partition_offsets
WINDOW w AS (PARTITION BY topic, partition_id ORDER BY scan_id)"""
    )
    q["w3_first_offset_evolution"] = _snap_plain(
        """
SELECT topic, partition_id,
  CAST(max(start_offset) - min(start_offset) AS BIGINT) AS retention_drift
FROM partition_offsets
GROUP BY topic, partition_id
HAVING max(start_offset) - min(start_offset) > 0"""
    )
    q["cluster_scan_summary"] = _snap(
        """
per_scan AS (
  SELECT cluster, scan_id,
    CAST(sum(end_offset) AS BIGINT) AS total_end_offsets,
    CAST(count(DISTINCT topic) AS BIGINT) AS topics,
    CAST(count(*) AS BIGINT) AS partitions
  FROM partition_offsets GROUP BY cluster, scan_id
)
SELECT cluster, scan_id, total_end_offsets, topics, partitions,
  CAST(total_end_offsets - coalesce(
    lag(total_end_offsets) OVER (PARTITION BY cluster ORDER BY scan_id),
    total_end_offsets) AS BIGINT) AS new_messages
FROM per_scan"""
    )

    q["sr_subject_version_counts"] = _snap_plain(
        """
SELECT registry, subject, CAST(count(*) AS BIGINT) AS versions,
  CAST(max(version) AS BIGINT) AS latest_version
FROM subject_versions GROUP BY registry, subject"""
    )

    q["topic_throughput_timeseries"] = _snap_plain(
        """
SELECT topic, scan_id,
  CAST(sum(delta) AS BIGINT) AS new_messages,
  CAST(max(elapsed_sec) AS BIGINT) AS elapsed_sec,
  CAST(coalesce(floor(sum(delta) / max(elapsed_sec)), 0) AS BIGINT)
    AS messages_per_seconds
FROM (
  SELECT topic, partition_id, scan_id,
    end_offset - coalesce(lag(end_offset) OVER w, end_offset) AS delta,
    date_diff('second', coalesce(lag(ts) OVER w, ts), ts) AS elapsed_sec
  FROM partition_offsets
  WINDOW w AS (PARTITION BY topic, partition_id ORDER BY scan_id)
) d
GROUP BY topic, scan_id"""
    )

    # kafka-ops extensions: partition skew + consumer fan-out
    q["partition_balance"] = _snap(
        """
per_part AS (
  SELECT topic, partition_id,
    CAST(end_offset - start_offset AS BIGINT) AS messages
  FROM partition_offsets WHERE scan_id = 3 AND cluster = 'primary'
),
agg AS (
  SELECT topic,
    CAST(count(*) AS BIGINT) AS partitions,
    CAST(max(messages) AS BIGINT) AS max_messages,
    CAST(min(messages) AS BIGINT) AS min_messages,
    CAST(sum(messages) AS BIGINT) AS total_messages
  FROM per_part GROUP BY topic
)
SELECT topic, partitions, max_messages, min_messages,
  round(max_messages / (CAST(total_messages AS DOUBLE) / partitions), 6)
    AS max_over_avg
FROM agg WHERE partitions > 1 AND total_messages > 0"""
    )
    q["group_topic_matrix"] = _snap_plain(
        """
SELECT g.group_id,
  CAST(count(DISTINCT g.topic) AS BIGINT) AS topics_consumed,
  CAST(count(*) AS BIGINT) AS partitions_with_offsets,
  CAST(sum(CASE WHEN g.committed_offset < 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS unset_offsets
FROM group_offsets g
JOIN (SELECT DISTINCT topic FROM partition_offsets
      WHERE cluster = 'primary') t ON g.topic = t.topic
WHERE g.cluster = 'primary'
GROUP BY g.group_id"""
    )

    # K4: prometheus gauge families (long format)
    q["metrics_snapshot"] = _snap(
        LAG_CTE
        + """,
po_final_metrics AS (
  SELECT cluster, topic FROM partition_offsets WHERE scan_id = 3
),
tc AS (
  SELECT cluster, CAST(count(DISTINCT topic) AS BIGINT) AS topics,
    CAST(count(*) AS BIGINT) AS partitions
  FROM po_final_metrics GROUP BY cluster
)
SELECT 'kafka_topics_total' AS metric, cluster,
  CAST(NULL AS STRING) AS group_id, CAST(NULL AS STRING) AS topic,
  topics AS value
FROM tc
UNION ALL
SELECT 'kafka_partitions_total', cluster, NULL, NULL, partitions FROM tc
UNION ALL
SELECT 'kafka_consumer_groups_total', cluster, NULL, NULL,
  CAST(count(*) AS BIGINT)
FROM consumer_groups GROUP BY cluster
UNION ALL
SELECT 'kafka_consumer_group_lag', cluster, group_id, topic,
  CAST(sum(lag) AS BIGINT)
FROM lag_rows GROUP BY cluster, group_id, topic
HAVING sum(lag) <> 0"""
    )

    # deeq-style validation suite: 9 pinned checks, two of which FAIL
    # on the fixture by design (events.value range, ghost group-offset
    # topics) — all-zero violations would leave the machinery untested
    q["validation_report"] = _snap("""
c1 AS (
  SELECT 'unique' AS "check", 'orders.o_orderkey' AS target,
    CAST(count(*) AS BIGINT) AS checked,
    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
  FROM orders
),
c2 AS (
  SELECT 'unique', 'lineitem.(l_orderkey,l_linenumber)',
    CAST(count(*) AS BIGINT),
    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
  FROM lineitem
),
c3 AS (
  SELECT 'referential', 'lineitem.l_orderkey->orders',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l.l_orderkey = o.o_orderkey
),
c4 AS (
  SELECT 'range', 'lineitem.l_discount in [0,1]',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
      AS BIGINT)
  FROM lineitem
),
c5 AS (
  SELECT 'accepted_values', 'customer.c_mktsegment',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE','BUILDING',
      'FURNITURE','HOUSEHOLD','MACHINERY') THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer
),
c6 AS (
  SELECT 'accepted_values', 'events.event_type',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN event_type NOT IN ('click','error','purchase',
      'signup','view') THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
),
c7 AS (
  SELECT 'range', 'events.value <= 100',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM events
),
c8 AS (
  SELECT 'consistency', 'documents.n_chars == length(text)',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
      AS BIGINT)
  FROM documents
),
c9 AS (
  SELECT 'referential', 'group_offsets.topic->topics (ghost rows)',
    CAST(count(*) AS BIGINT),
    CAST(sum(CASE WHEN t.name IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM group_offsets g
  LEFT JOIN (SELECT DISTINCT name FROM topics) t ON g.topic = t.name
),
allc AS (
  SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL
  SELECT * FROM c3 UNION ALL SELECT * FROM c4 UNION ALL
  SELECT * FROM c5 UNION ALL SELECT * FROM c6 UNION ALL
  SELECT * FROM c7 UNION ALL SELECT * FROM c8 UNION ALL
  SELECT * FROM c9
)
SELECT "check", target, checked, violations,
  violations = 0 AS pass
FROM allc""")

    # least-squares throughput trend per topic (native regr_slope /
    # regr_r2 in both engines — identical sum-based formulas)
    q["topic_throughput_trend"] = _snap("""
per_scan AS (
  SELECT cluster, topic, scan_id,
    sum(end_offset) AS total_end,
    max(date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts))
      AS ts_sec
  FROM partition_offsets GROUP BY 1, 2, 3
)
SELECT cluster, topic,
  CAST(count(*) AS BIGINT) AS scans,
  round(regr_slope(CAST(total_end AS DOUBLE), CAST(ts_sec AS DOUBLE)), 6)
    AS slope_msgs_per_sec,
  round(regr_r2(CAST(total_end AS DOUBLE), CAST(ts_sec AS DOUBLE)), 6)
    AS r2
FROM per_scan GROUP BY cluster, topic
HAVING count(*) >= 2""")

    # P12 extension: include/exclude regex scan filter
    q["topics_scan_filtered"] = _snap_plain(
        """
SELECT cluster, name, partitions FROM topics
WHERE regexp_matches(name, '^app\\..*$')
  AND NOT regexp_matches(name, '^_.*$')
  AND NOT regexp_matches(name, '.*\\.click\\..*$')"""
    )

    # --- sinks expressed as queries ---
    # S1.4 map column surface: the full config map per topic as the JSON
    # string Spark's to_json(map) emits (key-sorted entries)
    q["topics_config_map"] = _snap(
        """
cfgmap AS (
  SELECT cluster, topic,
    '{' || string_agg('"' || config_key || '":"' || config_value || '"',
      ',' ORDER BY config_key) || '}' AS configs_json
  FROM topic_configs GROUP BY cluster, topic
)
SELECT t.cluster, t.name, t.partitions,
  coalesce(c.configs_json, '{}') AS configs_json
FROM topics t LEFT JOIN cfgmap c
  ON t.name = c.topic AND t.cluster = c.cluster"""
    )
    # K6 faithful restore command: every non-default config as a
    # --config key="value" continuation line + the reference's
    # bootstrap-server trailer; bare create command when no configs
    q["restore_commands"] = _snap(
        """
cfg AS (
  SELECT topic,
    string_agg('--config ' || config_key || '="' || config_value || '"',
      ' \\' || chr(10) ORDER BY config_key) AS configs_str
  FROM topic_configs WHERE cluster = 'primary' GROUP BY topic
)
SELECT name,
  CASE WHEN c.configs_str IS NULL THEN
    'kafka-topics.sh --create --topic ' || name || ' --partitions '
      || CAST(partitions AS STRING)
  ELSE
    'kafka-topics.sh --create --topic ' || name || ' --partitions '
      || CAST(partitions AS STRING) || ' \\' || chr(10)
      || c.configs_str || ' \\' || chr(10)
      || '--bootstrap-server ${BOOTSTRAP_SERVER} '
      || '${CLIENT_CONFIG_PATH+:--command-config CLIENT_CONFIG_PATH}'
  END AS command
FROM topics t LEFT JOIN cfg c ON t.name = c.topic
WHERE t.cluster = 'primary'"""
    )

    # SCD2 interval compression of per-partition liveness (gaps and
    # islands over the scan axis; scan 0 has no predecessor → 'stalled')
    q["scd2_partition_liveness"] = _snap_plain(
        """
SELECT cluster, topic, partition_id, state,
  CAST(island AS BIGINT) AS interval_seq,
  CAST(min(scan_id) AS BIGINT) AS valid_from_scan,
  CAST(max(scan_id) AS BIGINT) AS valid_to_scan,
  CAST(count(*) AS BIGINT) AS scans,
  CAST(max(end_offset) - min(end_offset) AS BIGINT) AS offset_growth
FROM (
  SELECT *, sum(changed) OVER (
      PARTITION BY cluster, topic, partition_id ORDER BY scan_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM (
    SELECT *, CASE WHEN lag(state) OVER w IS NULL
        OR lag(state) OVER w <> state THEN 1 ELSE 0 END AS changed
    FROM (
      SELECT cluster, topic, partition_id, scan_id, end_offset,
        CASE WHEN end_offset > lag(end_offset) OVER (
            PARTITION BY cluster, topic, partition_id ORDER BY scan_id)
          THEN 'advancing' ELSE 'stalled' END AS state
      FROM partition_offsets
    ) s
    WINDOW w AS (PARTITION BY cluster, topic, partition_id
      ORDER BY scan_id)
  ) m
) i
GROUP BY cluster, topic, partition_id, state, island"""
    )

    # MERGE upsert stated as the OTHER classic form: updates ∪ (target
    # ANTI JOIN updates) — the Spark side is one full-outer coalesce
    q["snapshot_upsert_topics"] = _snap(
        """
upd AS (
  SELECT cluster, name, CAST(partitions + 10 AS BIGINT) AS partitions,
    retention_ms, cleanup_policy
  FROM topics WHERE partitions >= 4
  UNION ALL
  SELECT 'primary', 'upsert.demo.topic', CAST(1 AS BIGINT),
    CAST(60000 AS BIGINT), 'compact'
)
SELECT cluster, name, partitions, retention_ms, cleanup_policy FROM upd
UNION ALL
SELECT t.cluster, t.name, CAST(t.partitions AS BIGINT),
  t.retention_ms, t.cleanup_policy
FROM topics t
ANTI JOIN upd u ON t.cluster = u.cluster AND t.name = u.name"""
    )

    # point-in-time temporal join stated as the literal BETWEEN join
    # (the Spark side explodes intervals into an equi-join — two
    # different algorithms, same rows)
    q["scd2_point_in_time"] = _snap(
        """
st AS (
  SELECT cluster, topic, partition_id, scan_id, end_offset,
    CASE WHEN end_offset > lag(end_offset) OVER (
        PARTITION BY cluster, topic, partition_id ORDER BY scan_id)
      THEN 'advancing' ELSE 'stalled' END AS state
  FROM partition_offsets
),
mk AS (
  SELECT *, CASE WHEN lag(state) OVER w IS NULL
      OR lag(state) OVER w <> state THEN 1 ELSE 0 END AS changed
  FROM st
  WINDOW w AS (PARTITION BY cluster, topic, partition_id ORDER BY scan_id)
),
isl AS (
  SELECT *, sum(changed) OVER (
      PARTITION BY cluster, topic, partition_id ORDER BY scan_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM mk
),
iv AS (
  SELECT cluster, topic, partition_id, state,
    CAST(island AS BIGINT) AS interval_seq,
    min(scan_id) AS f, max(scan_id) AS t
  FROM isl GROUP BY cluster, topic, partition_id, state, island
)
SELECT po.cluster, po.topic, po.partition_id,
  CAST(po.scan_id AS BIGINT) AS scan_id,
  CAST(po.end_offset AS BIGINT) AS end_offset,
  iv.state, iv.interval_seq
FROM partition_offsets po
JOIN iv ON po.cluster = iv.cluster AND po.topic = iv.topic
  AND po.partition_id = iv.partition_id
  AND po.scan_id BETWEEN iv.f AND iv.t"""
    )

    return q
