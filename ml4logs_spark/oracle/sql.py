"""DuckDB-dialect oracle SQL mirrors of every Spark query in
``__spark_entry__.queries()``.

Each string is self-contained ANSI-ish SQL over the driver's
pre-registered views (``events`` etc.), reusing the shared dialect-neutral
derivation from datagen/derivation.py. The few dialect-split spots are:

- ``regexp_replace`` needs the 'g' flag here (Spark is replace-all);
- ``epoch_us(ts)`` here vs ``unix_micros(ts)`` in Spark;
- ``range(0, n)`` table function here vs ``spark.range(n)``.

All float outputs are round(x, 6) on BOTH sides; timestamps are always
surfaced as epoch microseconds (BIGINT) so the driver's value-hash
compare is engine-stable.
"""

from __future__ import annotations

from ml4logs_spark.datagen.derivation import (
    ROLE_DIM_SQL,
    TOOL_DIM_SQL,
    labels_sql,
    mask_expr,
    transcripts_sql,
)

EVENTS_VIEW = "events"

# Shared CTE prologue: transcripts -> masked templates -> template dim ->
# parsed turns -> dims -> labels -> long-form counts.
_PROLOGUE = """
WITH t AS ({transcripts}),
pt AS (SELECT t.*, {mask} AS template FROM t),
dim AS (
  SELECT CAST(dense_rank() OVER (ORDER BY template) AS BIGINT) AS template_id,
         template, count(*) AS occurrences
  FROM pt GROUP BY template
),
td AS (
  SELECT conv_id, turn_idx,
         log10(coalesce(
           (epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000.0,
           0.0) + 1.0) AS tdval
  FROM t
),
parsed AS (SELECT pt.*, dim.template_id FROM pt JOIN dim USING (template)),
role_dim AS ({role_dim}),
tool_dim AS ({tool_dim}),
labels AS ({labels}),
counts AS (
  SELECT conv_id, tool, template_id, count(*) AS cnt
  FROM parsed GROUP BY conv_id, tool, template_id
),
fitc AS (SELECT * FROM counts WHERE substring(md5(conv_id), 1, 1) <= 'b'),
idf AS (
  SELECT template_id,
         ln((SELECT count(DISTINCT conv_id) FROM fitc) * 1.0
            / count(DISTINCT conv_id)) AS idf
  FROM fitc GROUP BY template_id
),
scored AS (
  SELECT s.conv_id, s.score, l.label
  FROM (
    SELECT conv_id,
           sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)
             * 1.0 / count(*) AS score
    FROM parsed GROUP BY conv_id
  ) s JOIN labels l USING (conv_id)
)
"""


def _q(body: str) -> str:
    return _PROLOGUE.format(
        transcripts=transcripts_sql(EVENTS_VIEW),
        mask=mask_expr("text", "duckdb"),
        role_dim=ROLE_DIM_SQL,
        tool_dim=TOOL_DIM_SQL,
        labels=labels_sql(EVENTS_VIEW),
    ) + body


# Stub-encoder mirror (operators/encode.py HashEncoder): value_i =
# int(md5(text:i)[:4], 16) / 65535 - 0.5, the 4 leading nibbles read via
# instr over the hex alphabet (no engine-specific hex->int cast).
_MD5_TI = "md5(coalesce(t.text, '') || ':' || g.i)"
_NIBBLE_VAL = " + ".join(
    f"(instr('0123456789abcdef', substring({_MD5_TI}, {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
    for k in range(4)
)

ORACLES: dict[str, str] = {
    "transcripts_scan": _q(
        "SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us FROM t"
    ),
    "template_dim": _q("SELECT template_id, template, occurrences FROM dim"),
    "parsed_turns": _q(
        "SELECT conv_id, turn_idx, template_id FROM parsed"
    ),
    "enrich_turns": _q(
        """
        SELECT p.conv_id, p.turn_idx, p.role, r.role_group, r.route_weight,
               p.tool, td.tool_family, td.is_sensitive
        FROM parsed p
        LEFT JOIN role_dim r USING (role)
        LEFT JOIN tool_dim td USING (tool)
        """
    ),
    "route_sink_counts": _q(
        """
        SELECT template_id % 8 AS template_bucket, role,
               count(*) AS n_rows, count(DISTINCT conv_id) AS n_convs
        FROM parsed GROUP BY template_id % 8, role
        """
    ),
    "conv_tool_counts": _q("SELECT conv_id, tool, template_id, cnt FROM counts"),
    "tfidf_features": _q(
        """
        SELECT c.conv_id, c.tool, c.template_id, c.cnt,
               round(c.cnt * i.idf, 6) AS tfidf
        FROM counts c LEFT JOIN idf i USING (template_id)
        """
    ),
    "timedeltas": _q(
        "SELECT conv_id, turn_idx, round(tdval, 6) AS td FROM td"
    ),
    "next_template": _q(
        """
        SELECT conv_id, turn_idx, template_id,
               lead(template_id) OVER
                 (PARTITION BY conv_id ORDER BY turn_idx) AS next_template_id
        FROM parsed
        """
    ),
    "conv_stats": _q(
        """
        SELECT conv_id, count(*) AS conv_size,
               count(DISTINCT tool) AS n_tools,
               epoch_us(min(ts)) AS first_ts_us,
               epoch_us(max(ts)) AS last_ts_us
        FROM t GROUP BY conv_id
        """
    ),
    "conv_offsets": _q(
        """
        SELECT conv_id, conv_size,
               CAST(coalesce(sum(conv_size) OVER
                 (ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS conv_offset
        FROM (SELECT conv_id, count(*) AS conv_size FROM t GROUP BY conv_id) s
        """
    ),
    "labels_scan": _q("SELECT conv_id, label FROM labels"),
    "labeled_turns": _q(
        """
        SELECT conv_id, turn_idx
        FROM t WHERE conv_id IN (SELECT conv_id FROM labels)
        """
    ),
    "conv_scores": _q("SELECT conv_id, round(score, 6) AS score, label FROM scored"),
    "confusion_at_half": _q(
        """
        SELECT tp, fp, fn, tn,
               round(tp * 1.0 / nullif(tp + fp, 0), 6) AS precision,
               round(tp * 1.0 / nullif(tp + fn, 0), 6) AS recall,
               round((2.0 * tp / nullif(tp + fp, 0) * (tp * 1.0 / nullif(tp + fn, 0)))
                 / nullif(tp * 1.0 / nullif(tp + fp, 0)
                          + tp * 1.0 / nullif(tp + fn, 0), 0), 6) AS f1
        FROM (
          SELECT CAST(sum(CASE WHEN score >= 0.5 AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                 CAST(sum(CASE WHEN score >= 0.5 AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                 CAST(sum(CASE WHEN score < 0.5 AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                 CAST(sum(CASE WHEN score < 0.5 AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS tn
          FROM scored
        ) c
        """
    ),
    "error_threshold": _q(
        """
        SELECT round(avg(score) + 2 * stddev_samp(score), 6) AS threshold,
               count(*) AS n_normal
        FROM scored WHERE NOT label
        """
    ),
    "threshold_sweep": _q(
        """
        SELECT round(g.i / 20.0, 6) AS threshold,
               CAST(sum(CASE WHEN s.score >= g.i / 20.0 AND s.label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s.score >= g.i / 20.0 AND NOT s.label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s.score < g.i / 20.0 AND s.label THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               round(2.0 * sum(CASE WHEN s.score >= g.i / 20.0 AND s.label THEN 1 ELSE 0 END)
                 / nullif(2 * sum(CASE WHEN s.score >= g.i / 20.0 AND s.label THEN 1 ELSE 0 END)
                          + sum(CASE WHEN s.score >= g.i / 20.0 AND NOT s.label THEN 1 ELSE 0 END)
                          + sum(CASE WHEN s.score < g.i / 20.0 AND s.label THEN 1 ELSE 0 END), 0), 6) AS f1
        FROM scored s CROSS JOIN (SELECT range AS i FROM range(0, 21)) g
        GROUP BY g.i
        """
    ),
    "head_limit": _q(
        """
        SELECT conv_id, turn_idx, role, text, epoch_us(ts) AS ts_us
        FROM t ORDER BY conv_id, turn_idx LIMIT 50
        """
    ),
    "tool_conv_union_distinct": _q(
        """
        SELECT DISTINCT conv_id FROM (
          SELECT conv_id FROM t WHERE text LIKE 'error code %'
          UNION ALL
          SELECT conv_id FROM t WHERE tool IS NOT NULL
        ) u
        """
    ),
    "timedelta_minmax": _q(
        """
        SELECT conv_id, turn_idx,
               round(CASE WHEN mx = mn THEN 0.0
                 ELSE least(greatest((tdval - mn) / (mx - mn), 0.0), 1.0)
               END, 6) AS td_scaled
        FROM td CROSS JOIN (
          SELECT min(tdval) AS mn, max(tdval) AS mx FROM td
          WHERE substring(md5(conv_id), 1, 1) <= 'b'
        ) bounds
        """
    ),
    "tfidf_centered": _q(
        """
        SELECT c.conv_id, c.tool, c.template_id,
               round(c.cnt * i.idf
                     - coalesce(m.mu, 0.0), 6) AS tfidf_centered
        FROM counts c
        LEFT JOIN idf i USING (template_id)
        LEFT JOIN (
          SELECT c2.template_id, avg(c2.cnt * i2.idf) AS mu
          FROM counts c2 LEFT JOIN idf i2 USING (template_id)
          WHERE substring(md5(c2.conv_id), 1, 1) <= 'b'
          GROUP BY c2.template_id
        ) m ON m.template_id = c.template_id
        """
    ),
    "conv_top_template": _q(
        """
        -- structural mirror of Spark's max_by(template_id, struct(n,
        -- -template_id)): rank by n DESC then template_id ASC and keep
        -- rank 1 — no magic-number key that could collide at large ids.
        SELECT conv_id, template_id AS top_template_id, n AS top_n
        FROM (
          SELECT conv_id, template_id, n,
                 row_number() OVER (
                   PARTITION BY conv_id ORDER BY n DESC, template_id) AS rn
          FROM (
            SELECT conv_id, template_id, CAST(sum(cnt) AS BIGINT) AS n
            FROM counts GROUP BY conv_id, template_id
          ) p
        ) r WHERE rn = 1
        """
    ),
    "conv_td_median": _q(
        "SELECT conv_id, round(quantile_cont(tdval, 0.5), 6) AS td_median "
        "FROM td GROUP BY conv_id"
    ),
    "conv_value_maxpool": _q(
        "SELECT conv_id, round(max(tdval), 6) AS max_td FROM td GROUP BY conv_id"
    ),
    "merged_features": _q(
        """
        SELECT td.conv_id, td.turn_idx, round(td.tdval, 6) AS f_td,
               CAST(p.template_id AS DOUBLE) AS f_template,
               CAST(length(p.text) AS DOUBLE) AS f_len
        FROM td JOIN parsed p USING (conv_id, turn_idx)
        """
    ),
    "turn_embeddings": _q(
        f"""
        SELECT t.conv_id, t.turn_idx, g.i AS dim_idx,
               round(({_NIBBLE_VAL}) / 65535.0 - 0.5, 6) AS val
        FROM t CROSS JOIN (SELECT range AS i FROM range(0, 8)) g
        """
    ),
    "conv_turnvec_maxpool": _q(
        f"""
        SELECT t.conv_id, g.i AS dim_idx,
               round(max(({_NIBBLE_VAL}) / 65535.0 - 0.5), 6) AS max_val
        FROM t CROSS JOIN (SELECT range AS i FROM range(0, 8)) g
        GROUP BY t.conv_id, g.i
        """
    ),
    "dense_fit_counts": _q(
        """
        SELECT g.conv_id, g.template_id, CAST(coalesce(a.cnt, 0) AS BIGINT) AS cnt
        FROM (
          SELECT c1.conv_id, f1.template_id
          FROM (SELECT DISTINCT conv_id FROM counts) c1
          CROSS JOIN (SELECT DISTINCT template_id FROM fitc) f1
        ) g
        LEFT JOIN (
          SELECT conv_id, template_id, CAST(sum(cnt) AS BIGINT) AS cnt
          FROM counts GROUP BY conv_id, template_id
        ) a ON a.conv_id = g.conv_id AND a.template_id = g.template_id
        """
    ),
    "conv_sessions": _q(
        """
        SELECT conv_id, turn_idx,
               CAST(sum(boundary) OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
                 AS session_idx
        FROM (
          SELECT conv_id, turn_idx,
                 CASE WHEN (epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000.0 > 3600
                      OR lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                      THEN 1 ELSE 0 END AS boundary
          FROM t
        ) b
        """
    ),
    "session_stats": _q(
        """
        SELECT conv_id, session_idx, count(*) AS n_turns,
               round((max(us) - min(us)) / 1000000.0, 6) AS duration_s
        FROM (
          SELECT conv_id, epoch_us(ts) AS us,
                 CAST(sum(boundary) OVER (PARTITION BY conv_id ORDER BY turn_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT)
                   AS session_idx
          FROM (
            SELECT conv_id, turn_idx, ts,
                   CASE WHEN (epoch_us(ts) - lag(epoch_us(ts)) OVER
                         (PARTITION BY conv_id ORDER BY turn_idx)) / 1000000.0 > 3600
                        OR lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NULL
                        THEN 1 ELSE 0 END AS boundary
            FROM t
          ) b
        ) s
        GROUP BY conv_id, session_idx
        """
    ),
    "timedelta_standardize": _q(
        """
        SELECT conv_id, turn_idx,
               round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                          ELSE (tdval - mu) / sd END, 6) AS td_z
        FROM td CROSS JOIN (
          SELECT avg(tdval) AS mu, stddev_samp(tdval) AS sd FROM td
          WHERE substring(md5(conv_id), 1, 1) <= 'b'
        ) stats
        """
    ),
    "conv_template_seq": _q(
        """
        SELECT conv_id,
               array_to_string(list(CAST(template_id AS STRING)
                                    ORDER BY turn_idx), ',') AS template_seq
        FROM parsed GROUP BY conv_id
        """
    ),
    "conv_bucket_pivot": _q(
        "SELECT conv_id, "
        + ", ".join(
            f"CAST(sum(CASE WHEN template_id % 8 = {b} THEN 1 ELSE 0 END) AS BIGINT) AS b{b}"
            for b in range(8)
        )
        + " FROM parsed GROUP BY conv_id"
    ),
    "enrich_rollup": _q(
        """
        SELECT CASE WHEN GROUPING(role_group) = 1 THEN 'ALL'
                    ELSE coalesce(role_group, 'NONE') END AS role_group,
               CASE WHEN GROUPING(tool_family) = 1 THEN 'ALL'
                    ELSE coalesce(tool_family, 'NONE') END AS tool_family,
               count(*) AS n
        FROM (
          SELECT p.conv_id, r.role_group, td2.tool_family
          FROM parsed p
          LEFT JOIN role_dim r USING (role)
          LEFT JOIN tool_dim td2 USING (tool)
        ) e
        GROUP BY ROLLUP (role_group, tool_family)
        """
    ),
}

# conversation-level exact dedup: canonical ordered-turn-text hash,
# keep the lowest conv_id per hash (transcripts have unique
# (conv_id, turn_idx), so ORDER BY turn_idx is total)
ORACLES["conv_dedup_survivors"] = _q("""
SELECT conv_id FROM (
  SELECT h, min(conv_id) AS conv_id FROM (
    SELECT conv_id,
           md5(string_agg(
                 concat(length(coalesce(text, '')), ':', coalesce(text, '')),
                 chr(31) ORDER BY turn_idx)) AS h
    FROM t GROUP BY conv_id
  ) c GROUP BY h
) k
""")


# agent-loop detection: gaps-and-islands runs of identical
# (role, coalesce(tool, '')) in turn_idx order; every sum()/count()
# surfaced is CAST to BIGINT (DuckDB HUGEINT rule)
ORACLES["conv_loop_flags"] = _q("""
, lk AS (
  SELECT conv_id, turn_idx,
         concat_ws(chr(31), role, coalesce(tool, '')) AS k
  FROM t
),
lr AS (
  SELECT conv_id, turn_idx,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> k THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS run_id
  FROM (
    SELECT conv_id, turn_idx, k,
           lag(k) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM lk
  )
),
lrl AS (
  SELECT conv_id, run_id, count(*) AS run_len
  FROM lr GROUP BY conv_id, run_id
)
SELECT conv_id,
       CAST(sum(run_len) AS BIGINT) AS n_turns,
       CAST(max(run_id) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS max_run,
       max(run_len) >= 3 AS loop_flag
FROM lrl GROUP BY conv_id
""")

# corpus-wide role -> next-role transition counts within conversations
ORACLES["role_transition_counts"] = _q("""
SELECT role_a, role_b, count(*) AS n FROM (
  SELECT role AS role_a,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS role_b
  FROM t
) WHERE role_b IS NOT NULL
GROUP BY role_a, role_b
""")


# conversation-level near-dup mirror: conv-as-document adapter
# (space-joined turn texts in turn_idx order) feeding the SAME
# shingle/minhash/band construction as the documents prologue
# (docs_sql._SHINGLES/_MH_EXPRS/_bands_sql), so Spark and oracle
# share one set of constants
from ml4logs_spark.oracle.docs_sql import (  # noqa: E402
    _MH_EXPRS as _CMH,
    _SHINGLES as _CSH,
    _bands_sql as _cbands_sql,
)

ORACLES["conv_jaccard_pairs"] = _q(f"""
, cd AS (
  SELECT conv_id AS doc_id,
         string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS text
  FROM t GROUP BY conv_id
),
csh AS (SELECT doc_id, {_CSH} AS shingles FROM cd),
csig AS (
  SELECT doc_id,
         {_CMH}
  FROM csh
),
cbands AS ({_cbands_sql("csig")}),
ccand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM cbands a JOIN cbands b USING (band, h)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
cjac AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
           AS jaccard
  FROM ccand c
  JOIN csh sa ON sa.doc_id = c.doc_a
  JOIN csh sb ON sb.doc_id = c.doc_b
)
SELECT doc_a AS conv_a, doc_b AS conv_b, jaccard
FROM cjac
""")


# consecutive-duplicate turn removal: NULL-safe (role, tool, text)
# compare against the immediately-previous turn; lag(turn_idx) gates
# the first turn (matches the Spark operator's guard)
ORACLES["dedup_consecutive_turns"] = _q("""
, lagged AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         lag(turn_idx) OVER w AS p_idx,
         lag(role) OVER w AS p_role,
         lag(tool) OVER w AS p_tool,
         lag(text) OVER w AS p_text
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM lagged
WHERE NOT (p_idx IS NOT NULL
           AND role IS NOT DISTINCT FROM p_role
           AND tool IS NOT DISTINCT FROM p_tool
           AND text IS NOT DISTINCT FROM p_text)
""")

# conversation-granular stream packing: per-conv whitespace token
# totals, exclusive prefix sum in conv_id order, budget division
ORACLES["pack_conversations"] = _q("""
, csizes AS (
  SELECT conv_id,
         CAST(coalesce(sum(len(list_filter(
           str_split(coalesce(text, ''), ' '), x -> x <> ''))), 0)
           AS BIGINT) AS conv_tokens
  FROM t GROUP BY conv_id
),
coff AS (
  SELECT conv_id, conv_tokens,
         CAST(coalesce(sum(conv_tokens) OVER
           (ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
  FROM csizes
)
SELECT conv_id, conv_tokens, token_offset,
       CAST(token_offset // 2048 AS BIGINT) AS seq_id,
       CAST(token_offset % 2048 AS BIGINT) AS seq_pos
FROM coff
""")

# conversation-level SFT quality gate (windows.conv_quality_flags at
# the driver query's thresholds: turns 2..100, role run <=4,
# user_frac >=0.2, tool_frac <=0.3, opening in (user, system));
# fractions rounded 6dp on both engines before comparison
ORACLES["conv_quality_flags"] = _q("""
, lr AS (
  SELECT conv_id, turn_idx, r,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> r THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
           AS run_id
  FROM (
    SELECT conv_id, turn_idx, coalesce(role, '') AS r,
           lag(coalesce(role, ''))
             OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM t
  )
),
rl AS (
  SELECT conv_id, turn_idx, r,
         count(*) OVER (PARTITION BY conv_id, run_id) AS run_len
  FROM lr
),
ag AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(max(run_len) AS BIGINT) AS max_role_run,
         round(sum(CASE WHEN r = 'user' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS user_frac,
         round(sum(CASE WHEN r = 'tool' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS tool_frac,
         min_by(r, turn_idx) AS opening_role
  FROM rl GROUP BY conv_id
)
SELECT *,
       (pass_turn_count AND pass_role_run AND pass_user_frac
        AND pass_tool_frac AND pass_opening) AS passes
FROM (
  SELECT *,
         (n_turns >= 2 AND n_turns <= 100) AS pass_turn_count,
         (max_role_run <= 4) AS pass_role_run,
         (user_frac >= 0.2) AS pass_user_frac,
         (tool_frac <= 0.3) AS pass_tool_frac,
         (opening_role IN ('user', 'system')) AS pass_opening
  FROM ag
)
""")

# full transcript curation chain (curate.curate_transcripts at the
# driver query's thresholds: turns 2..100, role run <=4, user_frac
# >=0.2, tool_frac <=0.3, seq_tokens 2048, no near-dup stage): conv
# exact dedup on RAW text -> stutter strip -> quality gate on CLEANED
# turns -> conv-granular stream packing. Composes the four verified
# stage oracles; every surfaced sum()/count() CAST to BIGINT
ORACLES["curated_transcripts"] = _q("""
, ch AS (
  SELECT conv_id,
         md5(string_agg(
               concat(length(coalesce(text, '')), ':', coalesce(text, '')),
               chr(31) ORDER BY turn_idx)) AS h
  FROM t GROUP BY conv_id
),
keepc AS (SELECT min(conv_id) AS conv_id FROM ch GROUP BY h),
s AS (SELECT t.* FROM t JOIN keepc USING (conv_id)),
lagged AS (
  SELECT conv_id, turn_idx, role, text, tool,
         lag(turn_idx) OVER w AS p_idx,
         lag(role) OVER w AS p_role,
         lag(tool) OVER w AS p_tool,
         lag(text) OVER w AS p_text
  FROM s WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
clean AS (
  SELECT conv_id, turn_idx, role, text, tool
  FROM lagged
  WHERE NOT (p_idx IS NOT NULL
             AND role IS NOT DISTINCT FROM p_role
             AND tool IS NOT DISTINCT FROM p_tool
             AND text IS NOT DISTINCT FROM p_text)
),
qlr AS (
  SELECT conv_id, turn_idx, r,
         CAST(sum(CASE WHEN prev IS NULL OR prev <> r THEN 1 ELSE 0 END)
              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT)
           AS run_id
  FROM (
    SELECT conv_id, turn_idx, coalesce(role, '') AS r,
           lag(coalesce(role, ''))
             OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM clean
  )
),
qrl AS (
  SELECT conv_id, turn_idx, r,
         count(*) OVER (PARTITION BY conv_id, run_id) AS run_len
  FROM qlr
),
qag AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(max(run_len) AS BIGINT) AS max_role_run,
         round(sum(CASE WHEN r = 'user' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS user_frac,
         round(sum(CASE WHEN r = 'tool' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS tool_frac,
         min_by(r, turn_idx) AS opening_role
  FROM qrl GROUP BY conv_id
),
gate AS (
  SELECT conv_id FROM qag
  WHERE n_turns >= 2 AND n_turns <= 100 AND max_role_run <= 4
        AND user_frac >= 0.2 AND tool_frac <= 0.3
        AND opening_role IN ('user', 'system')
),
kept AS (SELECT clean.* FROM clean JOIN gate USING (conv_id)),
csizes AS (
  SELECT conv_id,
         CAST(coalesce(sum(len(list_filter(
           str_split(coalesce(text, ''), ' '), x -> x <> ''))), 0)
           AS BIGINT) AS conv_tokens
  FROM kept GROUP BY conv_id
),
coff AS (
  SELECT conv_id, conv_tokens,
         CAST(coalesce(sum(conv_tokens) OVER
           (ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING
            AND 1 PRECEDING), 0) AS BIGINT) AS token_offset
  FROM csizes
)
SELECT k.conv_id, k.turn_idx, k.role, k.tool, k.text,
       c.conv_tokens, c.token_offset,
       CAST(c.token_offset // 2048 AS BIGINT) AS seq_id,
       CAST(c.token_offset % 2048 AS BIGINT) AS seq_pos
FROM kept k JOIN coff c USING (conv_id)
""")

# day-2 conversation dedup (dedup.incremental_conv_dedup at the driver
# split: md5(conv_id) first hex 0-7 = history-as-state, 8-f = new
# batch): new conversations whose canonical ordered-turn-text hash is
# not in the history's hash dim, deduped in-batch (min conv_id per
# hash). Green == incremental path equals this batch computation.
ORACLES["incremental_conv_dedup"] = _q("""
, hist AS (SELECT * FROM t WHERE substr(md5(conv_id), 1, 1) < '8'),
nw AS (SELECT * FROM t WHERE substr(md5(conv_id), 1, 1) >= '8'),
hh AS (
  SELECT md5(string_agg(
           concat(length(coalesce(text, '')), ':', coalesce(text, '')),
           chr(31) ORDER BY turn_idx)) AS h
  FROM hist GROUP BY conv_id
),
nh AS (
  SELECT conv_id,
         md5(string_agg(
           concat(length(coalesce(text, '')), ':', coalesce(text, '')),
           chr(31) ORDER BY turn_idx)) AS h
  FROM nw GROUP BY conv_id
),
fresh AS (
  SELECT conv_id, h FROM nh
  WHERE h NOT IN (SELECT h FROM hh)
)
SELECT min(conv_id) AS conv_id FROM fresh GROUP BY h
""")

# transcript-chain attrition report (curate.curate_transcripts_attrition
# at the driver thresholds: turns 2..100, role run <=4, user_frac
# >=0.2, tool_frac <=0.3): per-stage (n_convs, n_turns) for raw ->
# exact_dedup -> stutter_strip -> quality_gate, mirroring the chain's
# stage semantics (gate on CLEANED turns); the unpivot is 4 UNION ALL
# rows off the single-row aggregate
ORACLES["curate_transcripts_attrition"] = _q("""
, ch AS (
  SELECT conv_id,
         md5(string_agg(
               concat(length(coalesce(text, '')), ':', coalesce(text, '')),
               chr(31) ORDER BY turn_idx)) AS h,
         count(*) AS n_raw
  FROM t GROUP BY conv_id
),
keepc AS (SELECT min(conv_id) AS conv_id FROM ch GROUP BY h),
lagged AS (
  SELECT conv_id, turn_idx, coalesce(role, '') AS r,
         (lag(turn_idx) OVER w IS NOT NULL
          AND role IS NOT DISTINCT FROM lag(role) OVER w
          AND tool IS NOT DISTINCT FROM lag(tool) OVER w
          AND text IS NOT DISTINCT FROM lag(text) OVER w) AS dup
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
clean AS (SELECT conv_id, turn_idx, r FROM lagged WHERE NOT dup),
qlr AS (
  SELECT conv_id, turn_idx, r,
         sum(CASE WHEN prev IS NULL OR prev <> r THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS run_id
  FROM (
    SELECT conv_id, turn_idx, r,
           lag(r) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
    FROM clean
  )
),
qrl AS (
  SELECT conv_id, turn_idx, r,
         count(*) OVER (PARTITION BY conv_id, run_id) AS run_len
  FROM qlr
),
cagg AS (
  SELECT conv_id,
         count(*) AS n_clean,
         max(run_len) AS max_run,
         round(sum(CASE WHEN r = 'user' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS user_frac,
         round(sum(CASE WHEN r = 'tool' THEN 1 ELSE 0 END) * 1.0
               / count(*), 6) AS tool_frac,
         min_by(r, turn_idx) AS opening
  FROM qrl GROUP BY conv_id
),
conv AS (
  SELECT ch.conv_id, ch.n_raw, cagg.n_clean,
         (keepc.conv_id IS NOT NULL) AS alive_dedup,
         ((keepc.conv_id IS NOT NULL)
          AND cagg.n_clean >= 2 AND cagg.n_clean <= 100
          AND cagg.max_run <= 4 AND cagg.user_frac >= 0.2
          AND cagg.tool_frac <= 0.3
          AND cagg.opening IN ('user', 'system')) AS alive_gate
  FROM ch
  JOIN cagg USING (conv_id)
  LEFT JOIN keepc ON keepc.conv_id = ch.conv_id
),
w1 AS (
  SELECT CAST(count(*) AS BIGINT) AS raw_convs,
         CAST(sum(n_raw) AS BIGINT) AS raw_turns,
         CAST(sum(CASE WHEN alive_dedup THEN 1 ELSE 0 END) AS BIGINT)
           AS dedup_convs,
         CAST(sum(CASE WHEN alive_dedup THEN n_raw ELSE 0 END) AS BIGINT)
           AS dedup_turns,
         CAST(sum(CASE WHEN alive_dedup THEN n_clean ELSE 0 END) AS BIGINT)
           AS clean_turns,
         CAST(sum(CASE WHEN alive_gate THEN 1 ELSE 0 END) AS BIGINT)
           AS gate_convs,
         CAST(sum(CASE WHEN alive_gate THEN n_clean ELSE 0 END) AS BIGINT)
           AS gate_turns
  FROM conv
)
SELECT CAST(1 AS INT) AS stage_idx, 'raw' AS stage,
       raw_convs AS n_convs, raw_turns AS n_turns FROM w1
UNION ALL
SELECT CAST(2 AS INT), 'exact_dedup', dedup_convs, dedup_turns FROM w1
UNION ALL
SELECT CAST(3 AS INT), 'stutter_strip', dedup_convs, clean_turns FROM w1
UNION ALL
SELECT CAST(4 AS INT), 'quality_gate', gate_convs, gate_turns FROM w1
""")

# day-2 conversation near-dup mirror: same conv adapter + the shared
# shingle/minhash/band constants as conv_jaccard_pairs, split like
# incremental_conv_dedup (md5(conv_id) hex: 0-7 history, 8-f new);
# history participates only via band table + hashed-shingle store
# semantics (the store hash matches dedup.STORE_HASH_CHARS)
from ml4logs_spark.operators.dedup import STORE_HASH_CHARS as _STORE_CHARS  # noqa: E402

_CSTORE = (
    "list_sort(list_distinct(list_transform(shingles, "
    f"s -> substring(md5(s), 1, {_STORE_CHARS}))))"
)

ORACLES["incremental_conv_near_dups"] = _q(f"""
, cd AS (
  SELECT conv_id AS doc_id,
         string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS text,
         substr(md5(conv_id), 1, 1) < '8' AS is_hist
  FROM t GROUP BY conv_id
),
sh_h AS (SELECT doc_id, {_CSH} AS shingles FROM cd WHERE is_hist),
sh_n AS (SELECT doc_id, {_CSH} AS shingles FROM cd WHERE NOT is_hist),
sig_h AS (SELECT doc_id, {_CMH} FROM sh_h),
sig_n AS (SELECT doc_id, {_CMH} FROM sh_n),
bands_h AS ({_cbands_sql("sig_h")}),
bands_n AS ({_cbands_sql("sig_n")}),
cand AS (
  SELECT least(a.doc_id, b.doc_id) AS doc_a,
         greatest(a.doc_id, b.doc_id) AS doc_b
  FROM bands_n a JOIN bands_h b USING (band, h)
  WHERE a.doc_id <> b.doc_id
  UNION
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands_n a JOIN bands_n b USING (band, h)
  WHERE a.doc_id < b.doc_id
),
store AS (
  SELECT doc_id, {_CSTORE} AS sh_sig FROM sh_h
  UNION ALL
  SELECT doc_id, {_CSTORE} AS sh_sig FROM sh_n
)
SELECT c.doc_a AS conv_a, c.doc_b AS conv_b,
       round(len(list_intersect(sa.sh_sig, sb.sh_sig)) * 1.0
             / len(list_distinct(list_concat(sa.sh_sig, sb.sh_sig))), 6)
         AS jaccard
FROM cand c
JOIN store sa ON sa.doc_id = c.doc_a
JOIN store sb ON sb.doc_id = c.doc_b
WHERE round(len(list_intersect(sa.sh_sig, sb.sh_sig)) * 1.0
            / len(list_distinct(list_concat(sa.sh_sig, sb.sh_sig))), 6)
      >= 0.15
""")

# conversation branch (proper-prefix) dedup, over the constructed
# branch fixture (md5-nibble-'0' convs re-ingested truncated to
# ceil(n/2) turns under a '-cut' id). The oracle checks TRUE prefix
# semantics directly — cumulative length-prefixed frame strings with a
# boundary separator — deliberately mechanism-independent of the Spark
# side's positional-hash join, so a hash-path bug cannot hide.
_BRANCH_AUG = """
b0 AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS pos,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM t
),
aug AS (
  SELECT conv_id, turn_idx, role, text, tool, ts FROM t
  UNION ALL
  SELECT conv_id || '-cut', turn_idx, role, text, tool, ts FROM b0
  WHERE substring(md5(conv_id), 1, 1) = '0' AND pos < (n + 1) // 2
),
fr AS (
  SELECT conv_id,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS pos,
         concat(length(coalesce(text, '')), ':', coalesce(text, '')) AS frame
  FROM aug
),
seq AS (
  SELECT conv_id, string_agg(frame, chr(31) ORDER BY pos) AS s,
         count(*) AS n
  FROM fr GROUP BY conv_id
),
ppairs AS (
  SELECT a.conv_id AS conv_short, b2.conv_id AS conv_long,
         CAST(a.n AS INT) AS shared_turns, CAST(b2.n AS INT) AS long_len
  FROM seq a JOIN seq b2
    ON b2.n > a.n
   AND substring(b2.s, 1, length(a.s) + 1) = a.s || chr(31)
)
"""

ORACLES["conv_prefix_dups"] = _q(f"""
, {_BRANCH_AUG}
SELECT conv_short, conv_long, shared_turns, long_len FROM ppairs
""")

ORACLES["conv_branch_survivors"] = _q(f"""
, {_BRANCH_AUG}
SELECT conv_id, turn_idx, role, text, tool, epoch_us(ts) AS ts_us
FROM aug
WHERE conv_id NOT IN (SELECT DISTINCT conv_short FROM ppairs)
""")

# day-2 branch dedup mirror: the full-batch true-prefix pairs over the
# same augmented fixture, restricted to pairs touching the new side of
# the md5-nibble split (history < '8' participates only as state in
# Spark; the restriction is the incremental contract: green means
# incremental-equals-batch on the touching subset)
ORACLES["incremental_conv_prefix_dups"] = _q(f"""
, {_BRANCH_AUG}
SELECT conv_short, conv_long, shared_turns, long_len FROM ppairs
WHERE substring(md5(conv_short), 1, 1) >= '4'
   OR substring(md5(conv_long), 1, 1) >= '4'
""")

# agent-telemetry rollups: tool latency (lead over the FULL turn
# stream, then tool turns filtered — the next turn is usually not a
# tool turn) and per-day stream health; all aggregates exact integer
# micro-units with // integer division (determinism rule: no float
# averaging)
ORACLES["tool_latency_stats"] = _q("""
, wl AS (
  SELECT tool,
         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - epoch_us(ts) AS lat
  FROM t
)
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(lat) AS BIGINT) AS n_timed,
       CAST(coalesce(sum(lat), 0) AS BIGINT) AS total_latency_us,
       CASE WHEN count(lat) > 0
            THEN CAST(coalesce(sum(lat), 0) // count(lat) AS BIGINT)
       END AS avg_latency_us,
       CAST(max(lat) AS BIGINT) AS max_latency_us
FROM wl WHERE tool IS NOT NULL GROUP BY tool
""")

ORACLES["daily_health_rollup"] = _q("""
, dh AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
         CAST(sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error_turns,
         CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_tool_turns
  FROM t GROUP BY 1
)
SELECT day_us, n_turns, n_convs, n_error_turns, n_tool_turns,
       CAST((n_error_turns * 1000000) // n_turns AS BIGINT) AS error_ppm,
       CAST((n_tool_turns * 1000000) // n_turns AS BIGINT) AS tool_ppm
FROM dh
""")

# day-2 telemetry mirror: the full-corpus rollup — the Spark side
# merges two per-(day, conv) count states split on the md5 nibble, so
# green == merge-equals-batch (the mergeable vocab-counts contract)
ORACLES["incremental_daily_health"] = ORACLES["daily_health_rollup"]

# exact per-tool latency percentiles: type-1 lower quantile at the
# (n*p + 99) // 100 rank — integer math on both engines, never float
# ceil; ties rank arbitrarily but the value at any tie rank is
# identical
ORACLES["tool_latency_percentiles"] = _q("""
, wl AS (
  SELECT tool,
         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - epoch_us(ts) AS lat
  FROM t
),
tl AS (
  SELECT tool, lat,
         row_number() OVER (PARTITION BY tool ORDER BY lat) AS r,
         count(*) OVER (PARTITION BY tool) AS n
  FROM wl WHERE tool IS NOT NULL AND lat IS NOT NULL
)
SELECT tool, q.q_pct, CAST(n AS BIGINT) AS n_timed,
       CAST(lat AS BIGINT) AS latency_us
FROM tl, (VALUES (50), (95)) q(q_pct)
WHERE r = (n * q.q_pct + 99) // 100
""")

# bounded-state latency percentiles: power-of-2 microsecond buckets via
# the integer-exact highest-set-bit (1 << (bits-1)) — never the float
# log2/pow/floor chain — cumulative counts resolved at the same
# (n*p + 99) // 100 rank as the exact path. The Spark side merges two
# md5-nibble split states before publishing, so green ==
# merge-equals-batch.
_LAT_HIST = """
wl AS (
  SELECT tool,
         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - epoch_us(ts) AS lat
  FROM t
),
hs AS (
  SELECT tool,
         CASE WHEN lat <= 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(1 AS BIGINT) << (length(bin(lat)) - 1) END
           AS bucket_lo,
         CAST(count(*) AS BIGINT) AS n
  FROM wl WHERE tool IS NOT NULL AND lat IS NOT NULL
  GROUP BY 1, 2
)
"""

ORACLES["tool_latency_histogram"] = _q(f"""
, {_LAT_HIST}
SELECT tool, bucket_lo, n FROM hs
""")

ORACLES["histogram_latency_percentiles"] = _q(f"""
, {_LAT_HIST},
cum AS (
  SELECT tool, bucket_lo, n,
         sum(n) OVER (PARTITION BY tool ORDER BY bucket_lo) AS c,
         sum(n) OVER (PARTITION BY tool) AS nt
  FROM hs
),
qx AS (
  SELECT cum.tool, cum.bucket_lo, q.q_pct,
         CAST(cum.nt AS BIGINT) AS n_timed,
         row_number() OVER (
           PARTITION BY cum.tool, q.q_pct ORDER BY cum.bucket_lo
         ) AS rn
  FROM cum, (VALUES (50), (95)) q(q_pct)
  WHERE cum.c >= (cum.nt * q.q_pct + 99) // 100
)
SELECT tool, q_pct, n_timed, bucket_lo FROM qx WHERE rn = 1
""")

# day-over-day health drift: lag over the per-day rollup (tiny frame),
# integer ppm arithmetic throughout, jump flag emitted as 0/1 BIGINT per
# the dialect rule (current*100 >= prev*150 AND current > prev at the
# default jump_pct=50; the strict clause keeps flat-zero days unflagged)
ORACLES["daily_health_drift"] = _q("""
, dh AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error_turns
  FROM t GROUP BY 1
),
r AS (
  SELECT day_us, n_turns,
         CAST((n_error_turns * 1000000) // n_turns AS BIGINT) AS error_ppm
  FROM dh
),
lg AS (
  SELECT day_us, n_turns, error_ppm,
         lag(error_ppm) OVER (ORDER BY day_us) AS prev_error_ppm
  FROM r
)
SELECT day_us, n_turns, error_ppm,
       CAST(prev_error_ppm AS BIGINT) AS prev_error_ppm,
       CAST(error_ppm - prev_error_ppm AS BIGINT) AS error_ppm_delta,
       CAST(COALESCE(error_ppm * 100 >= prev_error_ppm * 150
                     AND error_ppm > prev_error_ppm, FALSE) AS BIGINT)
         AS error_jump
FROM lg
""")

# per-tool percentile drift between the two md5-nibble split histogram
# states (the "yesterday vs today" day-2 shape): same power-of-2 bucket
# + (n*p + 99) // 100 rank machinery as the histogram oracles, published
# per split, then bit-length bucket_shift and the 0/1 drifted flag.
# Inner join: a tool must appear in both states.
ORACLES["latency_drift"] = _q("""
, wl AS (
  SELECT conv_id, tool,
         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - epoch_us(ts) AS lat
  FROM t
),
hx AS (
  SELECT substring(md5(conv_id), 1, 1) >= '8' AS is_b, tool,
         CASE WHEN lat <= 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(1 AS BIGINT) << (length(bin(lat)) - 1) END
           AS bucket_lo,
         CAST(count(*) AS BIGINT) AS n
  FROM wl WHERE tool IS NOT NULL AND lat IS NOT NULL
  GROUP BY 1, 2, 3
),
cum AS (
  SELECT is_b, tool, bucket_lo, n,
         sum(n) OVER (PARTITION BY is_b, tool ORDER BY bucket_lo) AS c,
         sum(n) OVER (PARTITION BY is_b, tool) AS nt
  FROM hx
),
qx AS (
  SELECT is_b, cum.tool, q.q_pct, cum.bucket_lo,
         row_number() OVER (
           PARTITION BY is_b, cum.tool, q.q_pct ORDER BY cum.bucket_lo
         ) AS rn
  FROM cum, (VALUES (50), (95)) q(q_pct)
  WHERE cum.c >= (cum.nt * q.q_pct + 99) // 100
),
pa AS (SELECT tool, q_pct, bucket_lo AS bucket_lo_a
       FROM qx WHERE NOT is_b AND rn = 1),
pb AS (SELECT tool, q_pct, bucket_lo AS bucket_lo_b
       FROM qx WHERE is_b AND rn = 1)
SELECT tool, q_pct,
       CAST(bucket_lo_a AS BIGINT) AS bucket_lo_a,
       CAST(bucket_lo_b AS BIGINT) AS bucket_lo_b,
       CAST((CASE WHEN bucket_lo_b <= 0 THEN 0
                  ELSE length(bin(bucket_lo_b)) END)
          - (CASE WHEN bucket_lo_a <= 0 THEN 0
                  ELSE length(bin(bucket_lo_a)) END) AS BIGINT)
         AS bucket_shift,
       CAST((CASE WHEN bucket_lo_b <= 0 THEN 0
                  ELSE length(bin(bucket_lo_b)) END)
         != (CASE WHEN bucket_lo_a <= 0 THEN 0
                  ELSE length(bin(bucket_lo_a)) END) AS BIGINT)
         AS drifted
FROM pa JOIN pb USING (tool, q_pct)
""")

# top-k slowest tool calls: total order (latency desc, conv_id,
# turn_idx) makes the k-set deterministic under ties on both engines
ORACLES["slowest_tool_calls"] = _q("""
, wl AS (
  SELECT conv_id, turn_idx, tool,
         lead(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           - epoch_us(ts) AS latency_us
  FROM t
)
SELECT conv_id, turn_idx, tool, CAST(latency_us AS BIGINT) AS latency_us
FROM wl WHERE tool IS NOT NULL AND latency_us IS NOT NULL
ORDER BY latency_us DESC, conv_id, turn_idx
LIMIT 20
""")

# time to first tool call per conversation (by event time; NULL when
# the conversation never calls a tool)
ORACLES["time_to_first_tool"] = _q("""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(min(CASE WHEN tool IS NOT NULL THEN epoch_us(ts) END)
            - min(epoch_us(ts)) AS BIGINT) AS us_to_first_tool
FROM t GROUP BY conv_id
""")

# tool handoff matrix: transitions in the TOOL SUBSEQUENCE (non-tool
# turns skipped before the window, matching the Spark filter-then-lead)
ORACLES["tool_transition_counts"] = _q("""
SELECT tool_a, tool_b, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT tool AS tool_a,
         lead(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_b
  FROM t WHERE tool IS NOT NULL
) WHERE tool_b IS NOT NULL
GROUP BY tool_a, tool_b
""")

# conversation ending flag: the single last turn per conv (turn_idx is
# unique within a conversation), 0/1 BIGINT error flag
ORACLES["conv_endings"] = _q("""
SELECT conv_id, CAST(turn_idx AS BIGINT) AS last_turn_idx,
       CAST(text LIKE 'error code %' AS BIGINT) AS ends_on_error
FROM (
  SELECT conv_id, turn_idx, text,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
         ) AS rn
  FROM t
) WHERE rn = 1
""")

# retry-storm detector: gaps-and-islands over the tool subsequence
# (lag marks run starts, running sum numbers islands), max run per
# (conv, tool), reported at min_run >= 2
ORACLES["tool_retry_runs"] = _q("""
, tl AS (
  SELECT conv_id, tool, turn_idx,
         CASE WHEN lag(tool) OVER w IS NULL
                OR tool <> lag(tool) OVER w THEN 1 ELSE 0 END AS new_run
  FROM t WHERE tool IS NOT NULL
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
isl AS (
  SELECT conv_id, tool,
         sum(new_run) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS grp
  FROM tl
),
runs AS (
  SELECT conv_id, tool, grp, count(*) AS run_len
  FROM isl GROUP BY conv_id, tool, grp
)
SELECT conv_id, tool, CAST(max(run_len) AS BIGINT) AS max_run
FROM runs GROUP BY conv_id, tool
HAVING max(run_len) >= 2
""")

# per-tool failure attribution: tool call immediately followed by an
# error turn in the same conversation; exact integer ppm
ORACLES["tool_error_attribution"] = _q("""
, wl AS (
  SELECT tool,
         lead(text LIKE 'error code %')
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nxt_err
  FROM t
),
ag AS (
  SELECT tool, CAST(count(*) AS BIGINT) AS n_calls,
         CAST(sum(CASE WHEN nxt_err THEN 1 ELSE 0 END) AS BIGINT)
           AS n_followed_by_error
  FROM wl WHERE tool IS NOT NULL GROUP BY tool
)
SELECT tool, n_calls, n_followed_by_error,
       CAST((n_followed_by_error * 1000000) // n_calls AS BIGINT)
         AS error_follow_ppm
FROM ag
""")

# per-day error-ending rate: conversations whose unique last turn lands
# on the day, and how many of those last turns are error turns
ORACLES["conv_ending_rollup"] = _q("""
, le AS (
  SELECT conv_id, text, ts,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
         ) AS rn
  FROM t
),
ag AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(count(*) AS BIGINT) AS n_convs_ended,
         CAST(sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error_ended
  FROM le WHERE rn = 1 GROUP BY 1
)
SELECT day_us, n_convs_ended, n_error_ended,
       CAST((n_error_ended * 1000000) // n_convs_ended AS BIGINT)
         AS error_end_ppm
FROM ag
""")


# day-2 triage mirror: the Spark side merges the two md5-nibble split
# top-k states; top-k under the total order is mergeable, so green ==
# merge-equals-batch against the full-corpus query
ORACLES["incremental_slowest_tool_calls"] = ORACLES["slowest_tool_calls"]

# drift of the abandoned-after-failure rate: lag over the per-day
# ending rollup, same integer jump rule as daily_health_drift
ORACLES["conv_ending_drift"] = _q("""
, le AS (
  SELECT conv_id, text, ts,
         row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
         ) AS rn
  FROM t
),
ag AS (
  SELECT epoch_us(date_trunc('day', ts)) AS day_us,
         CAST(count(*) AS BIGINT) AS n_convs_ended,
         CAST(sum(CASE WHEN text LIKE 'error code %' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_error_ended
  FROM le WHERE rn = 1 GROUP BY 1
),
r AS (
  SELECT day_us, n_convs_ended,
         CAST((n_error_ended * 1000000) // n_convs_ended AS BIGINT)
           AS error_end_ppm
  FROM ag
),
lg AS (
  SELECT day_us, n_convs_ended, error_end_ppm,
         lag(error_end_ppm) OVER (ORDER BY day_us) AS prev_error_end_ppm
  FROM r
)
SELECT day_us, n_convs_ended, error_end_ppm,
       CAST(prev_error_end_ppm AS BIGINT) AS prev_error_end_ppm,
       CAST(error_end_ppm - prev_error_end_ppm AS BIGINT)
         AS error_end_ppm_delta,
       CAST(COALESCE(error_end_ppm * 100 >= prev_error_end_ppm * 150
                     AND error_end_ppm > prev_error_end_ppm, FALSE)
            AS BIGINT) AS error_end_jump
FROM lg
""")
