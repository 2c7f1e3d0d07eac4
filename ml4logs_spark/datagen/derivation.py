"""Dialect-neutral SQL templates deriving the transcripts star schema.

The driver's testdata has no transcripts table, so the pipeline's input —
an Iceberg-style table ``(conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp)`` per BASELINE.json's input_hint —
is derived *deterministically* from the driver-generated ``events`` table.
Every expression below parses and evaluates identically in Spark SQL and
DuckDB, so the driver's DuckDB oracle sees exactly the same rows as Spark.

Design notes
------------
- text is rendered from a planted template grammar (5 shapes x 5 event
  types -> ~18 distinct masked templates), the analog of HDFS log lines
  mined by Drain in the reference (/root/reference/src/ml4logs/features/
  parser/ibm_drain.py:40-47).
- every 10th user is merged into conversation conv-00000000, planting one
  deliberately giant conversation (skew fixture; ~10x median size).
- three literal fixture conversations are appended: a single-turn conv
  (timedelta edge case, reference extract_timedeltas.py:77-78), a conv
  with duplicate ts (ordering must come from turn_idx), and an empty-text
  turn (null-handling fixture).
- NULL never reaches concat(): Spark's concat is NULL-propagating while
  DuckDB's is NULL-skipping, so the tool slot is coalesced to 'none'
  before concatenation.
- floats never reach string rendering: doubles are floor()ed to BIGINT
  first (double->string formatting differs between engines).
"""

from __future__ import annotations

# {EVENTS} is replaced by a table reference:
#   Spark : parquet.`<sf_dir>/events.parquet`
#   DuckDB: events   (view pre-registered by the driver)
TRANSCRIPTS_SQL = """
SELECT
  concat('conv-', lpad(CAST(conv_key AS STRING), 8, '0')) AS conv_id,
  CAST(row_number() OVER (PARTITION BY conv_key ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                    WHEN 2 THEN 'tool' ELSE 'system' END AS role,
  CASE event_id % 5
    WHEN 0 THEN concat('svc ', event_type, ' request ', CAST(kval AS STRING),
                       ' accepted from user ', CAST(user_id AS STRING))
    WHEN 1 THEN concat('svc ', event_type, ' completed in ', CAST(vnum AS STRING),
                       ' ms status ok')
    WHEN 2 THEN concat('tool ',
                       CASE WHEN event_id % 4 IN (1, 2)
                            THEN concat('tool_', CAST(event_id % 8 AS STRING))
                            ELSE 'none' END,
                       ' invoked with arg ', CAST(kval AS STRING),
                       ' by member ', CAST(user_id AS STRING))
    WHEN 3 THEN concat('error code ', CAST(event_id % 997 AS STRING),
                       ' while processing ', event_type, ' payload')
    ELSE concat('heartbeat session ', CAST(user_id % 50 AS STRING), ' ok')
  END AS text,
  CASE WHEN event_id % 4 IN (1, 2)
       THEN concat('tool_', CAST(event_id % 8 AS STRING))
       ELSE CAST(NULL AS STRING) END AS tool,
  ts
FROM (
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS conv_key,
         CAST(floor(value) AS BIGINT) AS vnum,
         CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS kval
  FROM {EVENTS}
) ev
UNION ALL
SELECT 'conv-sing0001', CAST(0 AS INT), 'user',
       'svc click request 7 accepted from user 1',
       CAST(NULL AS STRING), TIMESTAMP '2024-03-01 00:00:00'
UNION ALL
SELECT 'conv-dupts001', CAST(0 AS INT), 'user',
       'svc view completed in 10 ms status ok',
       CAST(NULL AS STRING), TIMESTAMP '2024-03-01 00:00:01'
UNION ALL
SELECT 'conv-dupts001', CAST(1 AS INT), 'assistant',
       'error code 13 while processing view payload',
       'tool_1', TIMESTAMP '2024-03-01 00:00:01'
UNION ALL
SELECT 'conv-dupts001', CAST(2 AS INT), 'tool', '',
       'tool_2', TIMESTAMP '2024-03-01 00:00:02'
"""

ROLE_DIM_SQL = """
SELECT * FROM (VALUES
  ('user', 'human', 1),
  ('assistant', 'agent', 2),
  ('tool', 'agent', 3),
  ('system', 'infra', 4)
) AS t(role, role_group, route_weight)
"""

TOOL_DIM_SQL = """
SELECT * FROM (VALUES
  ('tool_0', 'search', true),
  ('tool_1', 'code', false),
  ('tool_2', 'io', false),
  ('tool_3', 'search', true),
  ('tool_4', 'code', false),
  ('tool_5', 'io', false),
  ('tool_6', 'search', true),
  ('tool_7', 'code', false)
) AS t(tool, tool_family, is_sensitive)
"""

# Per-conversation label dim (analog of reference labels.csv,
# /root/reference/src/ml4logs/data/hdfs.py:106-123). A conversation is
# "anomalous" when >25% of its turns are error-template turns. Two ghost
# conv_ids absent from transcripts exercise the semi-join filter
# (reference data/hdfs.py:61-62).
LABELS_SQL = """
SELECT conv_id,
       (4 * sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)) > count(*) AS label
FROM ({TRANSCRIPTS}) t
GROUP BY conv_id
UNION ALL SELECT 'conv-ghost001', false
UNION ALL SELECT 'conv-ghost002', true
"""

# The deterministic "mask" parse: digit runs -> <*>. This is the
# SQL-expressible projection of what the Drain-style miner learns on this
# grammar (operators/drain.py implements the real miner; tests assert the
# two agree on this corpus). NOTE dialect split: Spark's regexp_replace is
# replace-all; DuckDB needs the 'g' flag.
def mask_expr(col: str, dialect: str = "spark") -> str:
    if dialect == "duckdb":
        return f"regexp_replace({col}, '[0-9]+', '<*>', 'g')"
    return f"regexp_replace({col}, '[0-9]+', '<*>')"


def transcripts_sql(events_ref: str) -> str:
    return TRANSCRIPTS_SQL.format(EVENTS=events_ref)


def labels_sql(events_ref: str) -> str:
    return LABELS_SQL.format(TRANSCRIPTS=transcripts_sql(events_ref))
