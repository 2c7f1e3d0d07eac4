"""DuckDB oracle mirrors for the documents/embeddings queries.

Same portability rules as oracle/sql.py: md5-hex everywhere (no engine
hash), floats rounded at the output boundary, list functions mapped
Spark<->DuckDB:

  Spark slice(toks, i, 3)        <-> DuckDB list_slice(toks, i, i+2)
  Spark concat_ws(' ', arr)      <-> DuckDB array_to_string(arr, ' ')
  Spark array_min/transform      <-> DuckDB list_min/list_transform
  Spark F.filter(arr, pred)      <-> DuckDB list_filter
  Spark aggregate(zip_with(...)) <-> DuckDB list_dot_product(DOUBLE[])
"""

from __future__ import annotations

from ml4logs_spark.operators.similarity import _hyperplane
from ml4logs_spark.operators.textqa import (
    BPE_REGEX,
    LANG_MARKERS,
    MIX_WEIGHTS,
    PII_PATTERNS,
    STOPWORDS,
)

N_MINHASH = 8
LSH_BANDS = 4

_SHINGLES = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(str_split(text, ' ')) - 2, 1)), "
    "i -> array_to_string(list_slice(str_split(text, ' '), i, i + 2), ' ')))"
)

_MH_EXPRS = ",\n         ".join(
    f"list_min(list_transform(shingles, s -> md5('{i}:' || s))) AS mh{i}"
    for i in range(N_MINHASH)
)

def _bands_sql(sig_tbl: str) -> str:
    return "\nUNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(mh{2*b} || mh{2*b+1}) AS h FROM {sig_tbl}"
        for b in range(LSH_BANDS)
    )


_BANDS = _bands_sql("sig")

_DOCS_PROLOGUE = f"""
WITH sh AS (
  SELECT doc_id, {_SHINGLES} AS shingles FROM documents
),
sig AS (
  SELECT doc_id,
         {_MH_EXPRS}
  FROM sh
),
bands AS ({_BANDS}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (band, h)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
               / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
           AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)
"""


def _dq(body: str) -> str:
    return _DOCS_PROLOGUE + body


def _in_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


_STOP_HITS = (
    f"len(list_filter(str_split(text, ' '), t -> lower(t) IN ({_in_list(STOPWORDS)})))"
)

# 64-bit SimHash mirror: global bit i = bit (i%4) of md5 hex nibble
# (i//4); chunk b = sum of 2^j over set bits 16b+j. Each bit recomputes
# md5 per token — fine for the oracle, where clarity beats speed.
_TOKS_LOWER = "list_filter(str_split(lower(coalesce(text, '')), ' '), t -> t <> '')"


def _simhash_bit(i: int) -> str:
    d, j = divmod(i, 4)
    nib = f"(instr('0123456789abcdef', substring(md5(t), {d + 1}, 1)) - 1)"
    return (
        "list_sum(list_transform(list_distinct("
        "str_split(coalesce(text, ''), ' ')), "
        f"t -> CASE WHEN (({nib} >> {j}) & 1) = 1 THEN 1 ELSE -1 END)) >= 0"
    )


_SIMHASH_CHUNKS = {
    b: " + ".join(
        f"(CASE WHEN {_simhash_bit(16 * b + j)} THEN {2 ** j} ELSE 0 END)"
        for j in range(16)
    )
    for b in range(4)
}

_LANG_HITS = {
    lang: (
        f"len(list_filter(str_split(text, ' '), t -> lower(t) IN ({_in_list(ws)})))"
    )
    for lang, ws in LANG_MARKERS.items()
}
_BEST = "greatest(" + ", ".join(_LANG_HITS.values()) + ")"
_LANG_CASE = "CASE " + " ".join(
    f"WHEN {h} > 0 AND {h} = {_BEST} THEN '{lang}'" for lang, h in _LANG_HITS.items()
) + " ELSE 'unk' END"

_COS = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))"
)

# Banded-LSH ANN mirror: the hyperplanes are DETERMINISTIC constants
# (md5-nibble construction, similarity._hyperplane), so the whole
# bucketed candidate generation + exact re-rank reproduces in SQL with
# the weights embedded as double literals (repr round-trips exactly).
# This upgrades lsh_cosine_topk from a rows-only check to a full
# value-hash oracle. Defaults must match similarity.lsh_topk.
_ANN_PLANES, _ANN_BANDS, _ANN_DIM = 8, 4, 64
_ANN_R = _ANN_PLANES // _ANN_BANDS


def _ann_sig_expr(b: int) -> str:
    terms = []
    for j in range(_ANN_R):
        w = _hyperplane(b * _ANN_R + j, _ANN_DIM)
        lst = "[" + ", ".join(repr(x) for x in w) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {lst}) >= 0 "
            f"THEN {2 ** j} ELSE 0 END)"
        )
    return " + ".join(terms)


_ANN_BSIG = "\nUNION ALL ".join(
    f"SELECT vec_id, {b} AS band, {_ann_sig_expr(b)} AS sig FROM embeddings"
    for b in range(_ANN_BANDS)
)

# Trained-IVF mirror: fit_ivf_codebook is deterministic Lloyd k-means
# with every step SQL-expressible (mod-sample, TakeOrdered seed,
# argmax-cosine assignment, per-dim means rounded to 6dp), so the
# entire fit is replayed as chained CTEs — the oracle mirrors the
# ALGORITHM, not data-dependent literals. Constants must match
# similarity.fit_ivf_codebook defaults.
_IVF_SAMPLE_MOD, _IVF_K, _IVF_ITERS, _IVF_DIM = 5, 16, 2, 64

_CV_COS = (
    "round(list_dot_product(s.v, c.cv)"
    " / (sqrt(list_dot_product(s.v, s.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6)"
)


def _ivf_fit_ctes() -> str:
    ctes = [
        "samp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE vec_id % {_IVF_SAMPLE_MOD} = 0)",
        f"cb0 AS (SELECT vec_id AS cent_id, v AS cv FROM samp "
        f"ORDER BY vec_id LIMIT {_IVF_K})",
    ]
    for it in range(1, _IVF_ITERS + 1):
        ctes.append(
            f"s{it} AS (SELECT s.vec_id, s.v, c.cent_id, {_CV_COS} AS sim "
            f"FROM samp s CROSS JOIN cb{it - 1} c)"
        )
        ctes.append(
            f"a{it} AS (SELECT vec_id, v, cent_id AS cell FROM ("
            "SELECT vec_id, v, cent_id, row_number() OVER ("
            "PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn "
            f"FROM s{it}) r WHERE rn = 1)"
        )
        ctes.append(
            f"m{it} AS (SELECT cell, g.i AS pos, round(avg(v[g.i]), 6) AS m "
            f"FROM a{it} CROSS JOIN (SELECT range AS i "
            f"FROM range(1, {_IVF_DIM + 1})) g GROUP BY cell, g.i)"
        )
        ctes.append(
            f"cb{it} AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS cv "
            f"FROM m{it} GROUP BY cell)"
        )
    return ",\n        ".join(ctes)

# training-mixture weight dim as a VALUES list (mirrors the broadcast
# dim in textqa.source_mix_sample) and the repeated-phrasing ratio over
# a token-array alias `a` (mirrors textqa.dup_bigram_frac_expr) — both
# shared by the standalone queries and the in-plan curation stages
_MIX_VALUES = ", ".join(f"('{s}', '{r}')" for s, r in MIX_WEIGHTS.items())
_DUP_BG_FRAC = (
    "round(CASE WHEN len(a) > 1 THEN 1.0 - "
    "len(list_distinct(list_transform(generate_series(1, len(a) - 1), "
    "i -> a[i] || ' ' || a[i + 1]))) * 1.0 / (len(a) - 1) "
    "ELSE 0.0 END, 6)"
)


def _pii_chain(col: str = "text") -> str:
    """Nested regexp_replace chain mirroring textqa.mask_pii (same
    patterns, same order, 'g' flag for replace-all)."""
    out = "".join("regexp_replace(" for _ in PII_PATTERNS) + col
    out += "".join(f", '{pat}', '{repl}', 'g')" for pat, repl in PII_PATTERNS)
    return out


def _chunk_sql(src: str, chunk: int = 64, overlap: int = 8) -> str:
    """Token-window chunk expansion over ``src(doc_id, text)`` —
    mirrors textqa.chunk_documents. DuckDB's table-function
    generate_series rejects lateral column args, so use the
    list-returning form + unnest for the per-doc chunk index."""
    stride = chunk - overlap
    return f"""
        SELECT doc_id, CAST(i - 1 AS INT) AS chunk_idx,
               array_to_string(
                 list_slice(toks, (i - 1) * {stride} + 1,
                            (i - 1) * {stride} + {chunk}),
                 ' ') AS chunk_text,
               CAST(least(n - (i - 1) * {stride}, {chunk}) AS INT) AS n_tokens
        FROM (
          SELECT doc_id, toks, n,
                 unnest(generate_series(
                   1, greatest((n - {overlap} + {stride - 1}) // {stride}, 1)))
                   AS i
          FROM (
            SELECT doc_id, str_split(text, ' ') AS toks,
                   len(str_split(text, ' ')) AS n
            FROM {src}
          )
        )
    """


def _doc_stats_sql(src: str = "documents") -> str:
    return (
        _DOC_STATS_TEMPLATE
        .replace("{BPE_REGEX}", BPE_REGEX)
        .replace("{_STOP_HITS}", _STOP_HITS)
        .replace("{src}", src)
    )


_DOC_STATS_TEMPLATE = """
        SELECT doc_id,
               len(str_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '{BPE_REGEX}')) AS n_bpe_tokens,
               round(length(text) * 1.0 / greatest(len(str_split(text, ' ')), 1), 6)
                 AS chars_per_token,
               round({_STOP_HITS} * 1.0 / greatest(len(str_split(text, ' ')), 1), 6)
                 AS stopword_ratio,
               round(0.5 * least(length(text) / 400.0, 1.0)
                     + 0.5 * least({_STOP_HITS} * 4.0
                                   / greatest(len(str_split(text, ' ')), 1), 1.0), 6)
                 AS quality_score
        FROM {src}
    """

_DOC_STATS_SQL = _doc_stats_sql()


DOC_ORACLES: dict[str, str] = {
    "dedup_exact_groups": (
        "SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id "
        "FROM documents GROUP BY md5(text)"
    ),
    "dedup_exact_survivors": (
        "SELECT doc_id FROM documents WHERE doc_id IN "
        "(SELECT min(doc_id) FROM documents GROUP BY md5(text))"
    ),
    "minhash_signatures": _dq(
        "SELECT doc_id, " + ", ".join(f"mh{i}" for i in range(N_MINHASH)) + " FROM sig"
    ),
    "lsh_candidate_pairs": _dq("SELECT doc_a, doc_b FROM cand"),
    "lsh_jaccard_pairs": _dq("SELECT doc_a, doc_b, jaccard FROM jac"),
    "near_dups": _dq("SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.8"),
    "simhash64": "SELECT doc_id, " + ", ".join(
        f"CAST({_SIMHASH_CHUNKS[b]} AS INT) AS c{b}" for b in range(4)
    ) + " FROM documents",
    # pigeonhole chunk banding: hamming <= 3 over 4 x 16-bit bands
    # guarantees a shared band, so the equi-join candidate set is
    # complete (exact); 65,536 buckets per band keep it near-linear.
    "simhash_near_dups": "WITH sh AS (SELECT doc_id, " + ", ".join(
        f"CAST({_SIMHASH_CHUNKS[b]} AS INT) AS c{b}" for b in range(4)
    ) + """ FROM documents),
        bands AS (
          SELECT doc_id, c0, c1, c2, c3, g.b AS band,
                 CASE g.b WHEN 0 THEN c0 WHEN 1 THEN c1
                          WHEN 2 THEN c2 ELSE c3 END AS chunk
          FROM sh CROSS JOIN (SELECT range AS b FROM range(0, 4)) g
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                  + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                 AS INT) AS hamming
        FROM bands a JOIN bands b USING (band, chunk)
        WHERE a.doc_id < b.doc_id
        GROUP BY ALL
        HAVING hamming <= 3
    """,
    # incremental simhash: even ids = historical signature state, odd
    # ids = new batch; hist-vs-new + new-vs-new banded pairs, UNION
    # dedup, hamming <= 3 — mirrors dedup.incremental_simhash_near_dups
    "incremental_simhash_near_dups": "WITH sh_h AS (SELECT doc_id, " + ", ".join(
        f"CAST({_SIMHASH_CHUNKS[b]} AS INT) AS c{b}" for b in range(4)
    ) + " FROM documents WHERE doc_id % 2 = 0),\n sh_n AS (SELECT doc_id, "
    + ", ".join(
        f"CAST({_SIMHASH_CHUNKS[b]} AS INT) AS c{b}" for b in range(4)
    ) + """ FROM documents WHERE doc_id % 2 = 1),
        g AS (SELECT range AS b FROM range(0, 4)),
        bands_h AS (
          SELECT doc_id, c0, c1, c2, c3, g.b AS band,
                 CASE g.b WHEN 0 THEN c0 WHEN 1 THEN c1
                          WHEN 2 THEN c2 ELSE c3 END AS chunk
          FROM sh_h CROSS JOIN g
        ),
        bands_n AS (
          SELECT doc_id, c0, c1, c2, c3, g.b AS band,
                 CASE g.b WHEN 0 THEN c0 WHEN 1 THEN c1
                          WHEN 2 THEN c2 ELSE c3 END AS chunk
          FROM sh_n CROSS JOIN g
        ),
        pairs AS (
          SELECT least(a.doc_id, b.doc_id) AS doc_a,
                 greatest(a.doc_id, b.doc_id) AS doc_b,
                 CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                   AS INT) AS hamming
          FROM bands_n a JOIN bands_h b USING (band, chunk)
          WHERE a.doc_id <> b.doc_id
          UNION
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.c0, b.c0)) + bit_count(xor(a.c1, b.c1))
                    + bit_count(xor(a.c2, b.c2)) + bit_count(xor(a.c3, b.c3))
                   AS INT) AS hamming
          FROM bands_n a JOIN bands_n b USING (band, chunk)
          WHERE a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
    """,
    "doc_stats": _DOC_STATS_SQL,
    "lang_guess": f"SELECT doc_id, lang, {_LANG_CASE} AS lang_guess FROM documents",
    "doc_fingerprint": (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) "
        "AS fingerprint FROM documents"
    ),
    # rolling-hash winnowing fingerprint: token value = first 4 md5
    # nibbles (mirrors Spark's conv(substring(md5,1,4),16,10)); window
    # hash = polynomial base-31 mod 1000003; fingerprint = min window.
    "doc_rolling_fingerprint": (
        "SELECT doc_id, CAST(list_min(list_transform("
        "  generate_series(1, greatest(len(str_split(text, ' ')) - 2, 1)),"
        "  i -> (vals[i] * 961 + vals[i + 1] * 31 + vals[i + 2]) % 1000003"
        ")) AS BIGINT) AS roll_fp "
        "FROM (SELECT doc_id, text, list_concat(list_transform("
        "str_split(text, ' '), t -> CAST("
        + " + ".join(
            f"(instr('0123456789abcdef', substring(md5(t), {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
            for k in range(4)
        )
        + " AS BIGINT)), [CAST(0 AS BIGINT), CAST(0 AS BIGINT)]) AS vals "
        "FROM documents) s"
    ),
    "media_meta": (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, "
        "source AS container, 'text/plain' AS mime FROM documents"
    ),
    "conv_embedding_maxpool": (
        "SELECT label, g.i AS dim_idx, "
        "round(max(CAST(list_extract(embedding, g.i) AS DOUBLE)), 6) AS max_val "
        "FROM embeddings CROSS JOIN (SELECT range AS i FROM range(1, 65)) g "
        "GROUP BY label, g.i"
    ),
    "embedding_norms": (
        "SELECT vec_id, round(sqrt(list_dot_product("
        "CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm "
        "FROM embeddings"
    ),
    # rank over round(cos, 6) mirrors the Spark side: unrounded doubles
    # can differ ~1e-15 between engines and flip near-tied ranks.
    "ann_cosine_topk": f"""
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               CAST(row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round({_COS}, 6) DESC, c.vec_id) AS INT) AS rank,
               round({_COS}, 6) AS cosine
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
        QUALIFY rank <= 10
    """,
    "embedding_near_dups": f"""
        WITH bsig AS ({_ANN_BSIG}),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bsig a JOIN bsig b USING (band, sig)
          WHERE a.vec_id < b.vec_id
          GROUP BY a.vec_id, b.vec_id
        )
        SELECT p.vec_a, p.vec_b, round({_COS}, 6) AS cosine
        FROM pairs p
        JOIN embeddings q ON q.vec_id = p.vec_a
        JOIN embeddings c ON c.vec_id = p.vec_b
        WHERE round({_COS}, 6) >= 0.3
    """,
    # IVF mirror with the TRAINED codebook: the Lloyd fit CTEs replay
    # fit_ivf_codebook step by step; cell assignment ranks by
    # round(cos,6) DESC then cent_id — identical tie-break to Spark's
    # max_by struct key.
    "ivf_cosine_topk": f"""
        WITH {_ivf_fit_ctes()},
        allv AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        csim AS (
          SELECT s.vec_id, c.cent_id, {_CV_COS} AS sim
          FROM allv s CROSS JOIN cb{_IVF_ITERS} c
        ),
        cells AS (
          SELECT vec_id, cent_id AS cell FROM (
            SELECT vec_id, cent_id, row_number() OVER (
              PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
            FROM csim) r WHERE rn = 1
        ),
        probes AS (
          SELECT vec_id AS query_id, cent_id AS cell FROM (
            SELECT vec_id, cent_id, row_number() OVER (
              PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
            FROM csim WHERE vec_id < 5) r WHERE rn <= 4
        ),
        cand AS (
          SELECT p.query_id, cl.vec_id AS cand_id
          FROM probes p JOIN cells cl ON cl.cell = p.cell
          WHERE cl.vec_id <> p.query_id
          GROUP BY p.query_id, cl.vec_id
        )
        SELECT cand.query_id, cand.cand_id,
               CAST(row_number() OVER (
                 PARTITION BY cand.query_id
                 ORDER BY round({_COS}, 6) DESC, cand.cand_id) AS INT) AS rank,
               round({_COS}, 6) AS cosine
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.cand_id
        QUALIFY rank <= 10
    """,
    "lsh_cosine_topk": f"""
        WITH bsig AS ({_ANN_BSIG}),
        cand AS (
          SELECT qb.vec_id AS query_id, cb.vec_id AS cand_id
          FROM bsig qb JOIN bsig cb USING (band, sig)
          WHERE qb.vec_id < 5 AND cb.vec_id <> qb.vec_id
          GROUP BY qb.vec_id, cb.vec_id
        )
        SELECT cand.query_id, cand.cand_id,
               CAST(row_number() OVER (
                 PARTITION BY cand.query_id
                 ORDER BY round({_COS}, 6) DESC, cand.cand_id) AS INT) AS rank,
               round({_COS}, 6) AS cosine
        FROM cand
        JOIN embeddings q ON q.vec_id = cand.query_id
        JOIN embeddings c ON c.vec_id = cand.cand_id
        QUALIFY rank <= 10
    """,
    # trained codebook surfaced directly: replay the Lloyd fit CTEs and
    # unnest centroids to (cent_id, dim_idx, val) rows for hashing.
    "ivf_codebook": f"""
        WITH {_ivf_fit_ctes()}
        SELECT cent_id, CAST(g.i - 1 AS BIGINT) AS dim_idx,
               round(cv[g.i], 6) AS val
        FROM cb{_IVF_ITERS} CROSS JOIN (
          SELECT range AS i FROM range(1, {_IVF_DIM + 1})) g
    """,
    # PII scrub mirror: same pattern chain, same order, 'g' flag for
    # Spark's replace-all semantics (RE2 and Java agree on these
    # constructs — no lookaround).
    "pii_masked": (
        f"SELECT doc_id, {_pii_chain()} AS masked_text FROM documents"
    ),
    # token-window chunking mirror: list_slice windows over a per-doc
    # chunk index; floor-div + greatest(.,1) matches the Spark int-cast.
    # DuckDB's table-function generate_series rejects lateral column
    # args, so use the list-returning form + unnest.
    "doc_chunks": _chunk_sql("documents"),
    # quality gate: the doc_stats mirror with the filter's exact bounds
    "quality_filtered": f"""
        SELECT doc_id, n_tokens, quality_score FROM ({_DOC_STATS_SQL})
        WHERE quality_score >= 0.5 AND n_tokens BETWEEN 3 AND 10000
    """,
    # deterministic md5-prefix sampling: string comparison of the hex
    # prefix is engine-neutral (no hex->int conversion needed); 4-char
    # prefix = 1/65,536-step rates
    "docs_hash_sample": """
        SELECT doc_id, source FROM documents
        WHERE substring(md5(concat_ws(':', source, CAST(doc_id AS VARCHAR))), 1, 4)
              < '4000'
    """,
    # vocabulary dim with df thresholds; dense_rank over token text
    # mirrors the Spark bounded-dim ranking
    "vocab_dim": """
        WITH tok AS (
          SELECT doc_id, unnest(str_split(lower(text), ' ')) AS token
          FROM documents
        ), agg AS (
          SELECT token, count(DISTINCT doc_id) AS df, count(*) AS tf
          FROM tok WHERE token <> '' GROUP BY token
        ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        SELECT CAST(dense_rank() OVER (ORDER BY token) AS BIGINT) AS token_id,
               token, df, tf
        FROM agg, n
        WHERE df >= 2 AND df <= 0.8 * n_docs
    """,
    # benchmark decontamination: md5-nibble split of the corpus into
    # benchmark ('0') vs corpus, shingle equi-join, NOT IN survivors
    "decontaminated": f"""
        WITH bmark AS (
          SELECT text FROM documents WHERE substring(md5(text), 1, 1) = '0'
        ), corpus AS (
          SELECT doc_id, text FROM documents
          WHERE substring(md5(text), 1, 1) <> '0'
        ), bg AS (
          SELECT DISTINCT unnest({_SHINGLES}) AS gram FROM bmark
        ), dg AS (
          SELECT doc_id, unnest({_SHINGLES}) AS gram FROM corpus
        ), dirty AS (
          SELECT DISTINCT doc_id FROM dg JOIN bg USING (gram)
        )
        SELECT doc_id FROM corpus
        WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
    """,
    # the full curation pipeline as ONE query: md5-nibble benchmark
    # split -> source mixing (weight dim + md5-prefix draw) -> exact
    # dedup -> Gopher repetition gate (dup-bigram frac <= 0.1) ->
    # quality gate -> shingle decontamination -> PII mask ->
    # token-window chunking. Mirrors _q_curated_chunks.
    "curated_chunks": f"""
        WITH corpus AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN (VALUES {_MIX_VALUES}) m(source, rate) ON m.source = d.source
          WHERE substring(md5(d.text), 1, 1) <> '0'
            AND substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)),
                          1, 4) < m.rate
        ), bmark AS (
          SELECT text FROM documents WHERE substring(md5(text), 1, 1) = '0'
        ), surv0 AS (
          SELECT doc_id, text FROM corpus WHERE doc_id IN (
            SELECT min(doc_id) FROM corpus GROUP BY md5(text))
        ), surv AS (
          -- repetition gate, then the Gopher rule set at the driver
          -- query's thresholds (words 12..95, mean word len at the
          -- paper default 3..10, symbol ratio <=0.1, alpha-word frac
          -- >=0.8, >=1 stopword)
          SELECT doc_id, text FROM
            (SELECT doc_id, text, {_TOKS_LOWER} AS a FROM surv0)
          WHERE {_DUP_BG_FRAC} <= 0.1
            AND len(a) BETWEEN 12 AND 95
            AND round(coalesce(list_sum(list_transform(a, t -> len(t))), 0)
                      * 1.0 / greatest(len(a), 1), 6) BETWEEN 3.0 AND 10.0
            AND round(len(regexp_extract_all(coalesce(text, ''),
                                             '#|\\.\\.\\.|…'))
                      * 1.0 / greatest(len(a), 1), 6) <= 0.1
            AND round(len(list_filter(a, t -> regexp_matches(t, '[a-z]')))
                      * 1.0 / greatest(len(a), 1), 6) >= 0.8
            AND len(list_intersect(list_distinct(a),
                 ['the','be','to','of','and','that','have','with'])) >= 1
        ), stats AS ({_doc_stats_sql('surv')}
        ), good AS (
          SELECT s.doc_id, s.text FROM surv s
          JOIN stats t ON t.doc_id = s.doc_id
          WHERE t.quality_score >= 0.5 AND t.n_tokens BETWEEN 3 AND 10000
        ), bg AS (
          SELECT DISTINCT unnest({_SHINGLES}) AS gram FROM bmark
        ), dg AS (
          SELECT doc_id, unnest({_SHINGLES}) AS gram FROM good
        ), clean AS (
          SELECT doc_id, text FROM good WHERE doc_id NOT IN (
            SELECT DISTINCT doc_id FROM dg JOIN bg USING (gram))
        ), masked AS (
          SELECT doc_id, {_pii_chain()} AS text FROM clean
        )
        {_chunk_sql('masked')}
    """,
    # language-ID confusion rollup against the labeled lang column
    "lang_confusion": f"""
        SELECT lang, {_LANG_CASE} AS lang_guess, count(*) AS n
        FROM documents GROUP BY lang, 2
    """,
    # per-source curation stats
    "source_rollup": f"""
        SELECT d.source, count(*) AS n_docs,
               count(DISTINCT md5(d.text)) AS n_uniq_texts,
               round(avg(s.quality_score), 6) AS avg_quality
        FROM documents d JOIN ({_doc_stats_sql()}) s ON s.doc_id = d.doc_id
        GROUP BY d.source
    """,
}


# connected components over the near-dup pair graph as a recursive CTE:
# reach(node, r) = every id r reachable from node through symmetric
# pairs; min(r) per node == the min-label fixpoint the Spark operator
# converges to (the graph is symmetric, so min reachable = component
# minimum). Tractable for the oracle because only docs IN a pair enter.
_CLUSTER_CTES = """,
pairs AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= 0.8),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
reach(node, r) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM edges)
  UNION
  SELECT e.s, reach.r FROM edges e JOIN reach ON reach.node = e.d
),
clusters AS (
  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
)
"""


def _dq_rec(body: str) -> str:
    return (
        _DOCS_PROLOGUE.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1).rstrip()
        + _CLUSTER_CTES
        + body
    )


# shared lowered empty-filtered tokenizer (mirror of textqa._toks_lower)

# Gopher-style within-doc repetition signals; the mode count mirrors the
# Spark longest-run-in-sorted-array formulation (linear, not per-token)
DOC_ORACLES["repetition_stats"] = f"""
    SELECT doc_id,
           round(len(list_distinct(a)) * 1.0 / greatest(len(a), 1), 6)
             AS distinct_ratio,
           round(CASE WHEN len(a) <= 1 THEN len(a)
                 ELSE list_max(list_transform(
                        generate_series(1, len(bounds) - 1),
                        j -> bounds[j + 1] - bounds[j])) END * 1.0
                 / greatest(len(a), 1), 6)
             AS top_token_frac,
           round(CASE WHEN len(a) > 1
                 THEN 1.0 - len(list_distinct(bg)) * 1.0 / (len(a) - 1)
                 ELSE 0.0 END, 6)
             AS dup_bigram_frac
    FROM (
      SELECT doc_id, a, bg,
             list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               list_filter(generate_series(1, greatest(len(a) - 1, 0)),
                           i -> s[i] <> s[i + 1])),
               [CAST(len(a) AS BIGINT)]) AS bounds
      FROM (
        SELECT doc_id, a, list_sort(a) AS s,
               list_transform(generate_series(1, greatest(len(a) - 1, 0)),
                              i -> a[i] || ' ' || a[i + 1]) AS bg
        FROM (SELECT doc_id, {_TOKS_LOWER} AS a FROM documents)
      )
    )
"""

# BPE merge-pair statistic: adjacent lowercased token pairs, counted
DOC_ORACLES["bigram_counts"] = f"""
    WITH pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(a) - 1, 0)),
               i -> struct_pack(tok_a := a[i], tok_b := a[i + 1]))) AS p
      FROM (SELECT {_TOKS_LOWER} AS a FROM documents)
    )
    SELECT p.tok_a AS tok_a, p.tok_b AS tok_b, count(*) AS n
    FROM pairs
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


# Contamination-severity mirror: same md5-nibble benchmark/corpus
# split as `decontaminated`, reversed — per benchmark item, count the
# distinct corpus docs sharing any shingle, zeros via left join.
DOC_ORACLES["contamination_report"] = f"""
    WITH bmark AS (
      SELECT doc_id AS bench_id, text FROM documents
      WHERE substring(md5(text), 1, 1) = '0'
    ), corpus AS (
      SELECT doc_id, text FROM documents
      WHERE substring(md5(text), 1, 1) <> '0'
    ), bg AS (
      SELECT DISTINCT bench_id, unnest({_SHINGLES}) AS gram FROM bmark
    ), dg AS (
      SELECT doc_id, unnest({_SHINGLES}) AS gram FROM corpus
    ), hits AS (
      SELECT DISTINCT bg.bench_id, dg.doc_id FROM dg JOIN bg USING (gram)
    ), c AS (
      SELECT bench_id, count(*) AS n FROM hits GROUP BY 1
    )
    SELECT b.bench_id, CAST(coalesce(c.n, 0) AS BIGINT) AS n_contaminating_docs
    FROM bmark b LEFT JOIN c USING (bench_id)
"""

# Span-level dedup mirror (block-hash ExactSubstr approximation):
# non-overlapping 16-token blocks, canonical first occurrence per
# block hash (min doc_id, block_idx), ordered reassembly.
def _span_blocks_sql(src: str = "documents", span: int = 16) -> str:
    """Non-overlapping ``span``-token block expansion — the SQL mirror
    of dedup.span_blocks, shared by the span_dedup and
    boilerplate_filtered oracles (NULL text coalesces to '', repo
    NULL-text contract)."""
    return f"""
      SELECT doc_id, CAST(i - 1 AS INT) AS block_idx,
             array_to_string(
               list_slice(toks, (i - 1) * {span} + 1, (i - 1) * {span} + {span}),
               ' ') AS block_text
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest((n + {span - 1}) // {span}, 1)))
                 AS i
        FROM (
          SELECT doc_id, str_split(coalesce(text, ''), ' ') AS toks,
                 len(str_split(coalesce(text, ''), ' ')) AS n
          FROM {src}
        )
      )
    """


DOC_ORACLES["span_dedup"] = f"""
    WITH b AS ({_span_blocks_sql()}), ranked AS (
      SELECT doc_id, block_idx, block_text,
             row_number() OVER (PARTITION BY md5(block_text)
                                ORDER BY doc_id, block_idx) AS rn
      FROM b
    )
    SELECT doc_id, string_agg(block_text, ' ' ORDER BY block_idx) AS text
    FROM ranked WHERE rn = 1 GROUP BY doc_id
"""

# add-one-smoothed corpus unigram LM, per-doc mean log-probability —
# mirrors textqa.unigram_logprob (ln on both engines; DuckDB log() is
# log10, so spell ln() explicitly)
DOC_ORACLES["doc_unigram_logprob"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token FROM documents
    ), vocab AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), norm AS (
      SELECT (SELECT count(*) FROM tok) AS tot,
             (SELECT count(*) FROM vocab) AS vsz
    ), logp AS (
      SELECT token, ln((cnt + 1.0) / (tot + vsz)) AS lp FROM vocab, norm
    ), per AS (
      SELECT doc_id, round(avg(lp), 6) AS avg_logprob,
             count(*) AS n_tokens
      FROM tok JOIN logp USING (token) GROUP BY doc_id
    )
    SELECT d.doc_id, p.avg_logprob,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN per p USING (doc_id)
"""


# bigram-LM mirror: same add-one smoothing, pair support = the
# bigram_counts zip-with-tail shape, context counts = unigram counts
DOC_ORACLES["bigram_logprob"] = f"""
    WITH pr AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(a) - 1, 0)),
               i -> struct_pack(tok_a := a[i], tok_b := a[i + 1]))) AS p
      FROM (SELECT doc_id, {_TOKS_LOWER} AS a FROM documents)
    ), pc AS (
      SELECT p.tok_a AS tok_a, p.tok_b AS tok_b, count(*) AS pn
      FROM pr GROUP BY 1, 2
    ), ctx AS (
      SELECT token, count(*) AS cn FROM (
        SELECT unnest({_TOKS_LOWER}) AS token FROM documents
      ) GROUP BY token
    ), nrm AS (SELECT count(*) AS vsz FROM ctx),
    lp AS (
      SELECT pc.tok_a, pc.tok_b,
             ln((pn + 1.0) / (cn + vsz)) AS lp
      FROM pc JOIN ctx ON ctx.token = pc.tok_a CROSS JOIN nrm
    ), per AS (
      SELECT pr.doc_id, round(avg(lp.lp), 6) AS avg_bigram_logprob,
             count(*) AS n_bigrams
      FROM pr JOIN lp ON lp.tok_a = pr.p.tok_a AND lp.tok_b = pr.p.tok_b
      GROUP BY pr.doc_id
    )
    SELECT d.doc_id, per.avg_bigram_logprob,
           CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams
    FROM documents d LEFT JOIN per USING (doc_id)
"""
# CCNet-style per-source perplexity tiers: the unigram-LM score CTE
# above, then a plain per-source window (fine at oracle scale; the
# engine runs the distributed two-phase ranking) — ntile spelled as
# (rank-1)*n // count + 1 so both engines share ONE exact formula
DOC_ORACLES["perplexity_buckets"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token FROM documents
    ), vocab AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), norm AS (
      SELECT (SELECT count(*) FROM tok) AS tot,
             (SELECT count(*) FROM vocab) AS vsz
    ), logp AS (
      SELECT token, ln((cnt + 1.0) / (tot + vsz)) AS lp FROM vocab, norm
    ), per AS (
      SELECT doc_id, round(avg(lp), 6) AS avg_logprob
      FROM tok JOIN logp USING (token) GROUP BY doc_id
    ), scored AS (
      SELECT d.doc_id, d.source, p.avg_logprob
      FROM documents d LEFT JOIN per p USING (doc_id)
    ), r AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY source
               ORDER BY avg_logprob DESC NULLS LAST, doc_id
             ) AS ppl_rank,
             count(*) OVER (PARTITION BY source) AS c
      FROM scored
    )
    SELECT doc_id, source, avg_logprob,
           CAST(ppl_rank AS BIGINT) AS ppl_rank,
           CAST((ppl_rank - 1) * 3 // c + 1 AS INT) AS ppl_bucket
    FROM r
"""

# multinomial NB classifier, fit on even doc_ids / applied to odd —
# mirrors classify.nb_source_classify_split. Log-likelihoods fixed to
# integer micro-units at the model dim (the repo determinism idiom) so
# the per-doc sums are exact bigints on both engines; argmax via
# row_number (score DESC, label ASC) = Spark's min(struct(-score,label))
# day-2 LM scoring: unigram model frozen on the even half (the
# persisted vocab_counts state), odd half scored with OOV floor —
# the oracle fits batch-style, so green == state-equals-batch
DOC_ORACLES["lm_score_day2"] = f"""
    WITH hist AS (
      SELECT * FROM documents WHERE doc_id % 2 = 0
    ), cnts AS (
      SELECT token, count(*) AS tf FROM (
        SELECT unnest({_TOKS_LOWER}) AS token FROM hist
      ) GROUP BY token
    ), nrm AS (
      SELECT (SELECT coalesce(sum(tf), 0) FROM cnts) AS tot,
             (SELECT count(*) FROM cnts) AS vsz
    ), tok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token
      FROM documents WHERE doc_id % 2 = 1
    ), sc AS (
      SELECT t.doc_id,
             ln((coalesce(c.tf, 0) + 1.0) / (n.tot + n.vsz)) AS lp
      FROM tok t LEFT JOIN cnts c USING (token) CROSS JOIN nrm n
    ), per AS (
      SELECT doc_id, round(avg(lp), 6) AS avg_logprob,
             count(*) AS n_tokens
      FROM sc GROUP BY doc_id
    )
    SELECT d.doc_id, p.avg_logprob,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
    LEFT JOIN per p USING (doc_id)
"""

_NB_CTE = f"""
    WITH train AS (
      SELECT * FROM documents WHERE doc_id % 2 = 0
    ), tok AS (
      SELECT source AS label, unnest({_TOKS_LOWER}) AS token FROM train
    ), cnt AS (
      SELECT label, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), labels AS (
      SELECT source AS label, count(*) AS nd FROM train GROUP BY 1
    ), ntot AS (
      SELECT label, count(*) AS nk FROM tok GROUP BY 1
    ), vocab AS (
      SELECT DISTINCT token FROM tok
    ), vsz AS (SELECT count(*) AS v FROM vocab),
    ll AS (
      SELECT l.label, vb.token,
             CAST(round(ln((coalesce(c.c, 0) + 1.0)
                           / (coalesce(n.nk, 0) + vs.v)) * 1e6)
                  AS BIGINT) AS ll_micro
      FROM labels l
      CROSS JOIN vocab vb CROSS JOIN vsz vs
      LEFT JOIN ntot n USING (label)
      LEFT JOIN cnt c ON c.label = l.label AND c.token = vb.token
    ), priors AS (
      SELECT label,
             CAST(round(ln(nd * 1.0 / (SELECT sum(nd) FROM labels)) * 1e6)
                  AS BIGINT) AS prior_micro
      FROM labels
    ), test AS (
      SELECT doc_id FROM documents WHERE doc_id % 2 = 1
    ), ttok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token
      FROM documents WHERE doc_id % 2 = 1
    ), sums AS (
      SELECT t.doc_id, ll.label, sum(ll.ll_micro) AS s
      FROM ttok t JOIN ll USING (token) GROUP BY 1, 2
    ), scored AS (
      SELECT te.doc_id, p.label,
             p.prior_micro + coalesce(s.s, 0) AS logpost_micro
      FROM test te
      CROSS JOIN priors p
      LEFT JOIN sums s ON s.doc_id = te.doc_id AND s.label = p.label
    ), best AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY logpost_micro DESC, label ASC
      ) AS rn FROM scored
    )
"""

DOC_ORACLES["nb_source_classify"] = _NB_CTE + """
    SELECT doc_id, label AS pred_label,
           CAST(logpost_micro AS BIGINT) AS logpost_micro
    FROM best WHERE rn = 1
"""

# confusion rollup of the split classifier: true source (odd half) x
# predicted label counts
DOC_ORACLES["nb_confusion"] = _NB_CTE + """
    SELECT d.source, b.label AS pred_label,
           CAST(count(*) AS BIGINT) AS n
    FROM best b JOIN documents d USING (doc_id)
    WHERE b.rn = 1
    GROUP BY 1, 2
"""

# per-source unigram KL divergence vs the corpus marginal — terms
# rounded to NANO-units at the (source, token) grain then summed as
# exact bigints (fold-order independent); no smoothing needed (every
# source token exists in the corpus)
DOC_ORACLES["source_kl_divergence"] = f"""
    WITH tok AS (
      SELECT source, unnest({_TOKS_LOWER}) AS token FROM documents
    ), st AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2
    ), stot AS (
      SELECT source, sum(c) AS ns FROM st GROUP BY 1
    ), marg AS (
      SELECT token, sum(c) AS cg FROM st GROUP BY 1
    ), gtot AS (SELECT sum(c) AS ng FROM st),
    terms AS (
      SELECT st.source,
             CAST(round((st.c * 1.0 / stot.ns)
                        * ln((st.c * 1.0 / stot.ns)
                             / (marg.cg * 1.0 / gtot.ng)) * 1e9)
                  AS BIGINT) AS t
      FROM st
      JOIN marg USING (token)
      JOIN stot USING (source)
      CROSS JOIN gtot
    )
    SELECT terms.source,
           CAST(stot.ns AS BIGINT) AS n_tokens,
           CAST(sum(terms.t) AS BIGINT) AS kl_nano
    FROM terms JOIN stot USING (source)
    GROUP BY terms.source, stot.ns
"""

# per-doc bigram novelty: fraction of the doc's bigrams present in no
# other document (within-doc repeats still novel); <2-token docs keep
# a 0-bigram NULL-frac row
DOC_ORACLES["bigram_novelty"] = f"""
    WITH pr AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(a) - 1, 0)),
               i -> struct_pack(tok_a := a[i], tok_b := a[i + 1]))) AS p
      FROM (SELECT doc_id, {_TOKS_LOWER} AS a FROM documents)
    ), pd AS (
      SELECT p.tok_a AS tok_a, p.tok_b AS tok_b,
             count(DISTINCT doc_id) AS nd
      FROM pr GROUP BY 1, 2
    ), per AS (
      SELECT pr.doc_id, count(*) AS n_bigrams,
             sum(CASE WHEN pd.nd = 1 THEN 1 ELSE 0 END) AS nov
      FROM pr JOIN pd ON pd.tok_a = pr.p.tok_a AND pd.tok_b = pr.p.tok_b
      GROUP BY pr.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           round(per.nov * 1.0 / per.n_bigrams, 6) AS novel_frac
    FROM documents d LEFT JOIN per USING (doc_id)
"""

# power-of-2 token-length histogram (doc_stats' whitespace tokens)
DOC_ORACLES["doc_length_histogram"] = """
    SELECT CAST(CASE WHEN n <= 0 THEN 0
                ELSE power(2, floor(log2(n))) END AS BIGINT) AS bucket_lo,
           count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens_total
    FROM (SELECT len(str_split(coalesce(text, ''), ' ')) AS n FROM documents)
    GROUP BY 1
"""

# per-source frequent-bigram ranking; same tokenizer as bigram_counts
DOC_ORACLES["top_ngrams_per_source"] = f"""
    WITH pairs AS (
      SELECT source, unnest(list_transform(
               generate_series(1, greatest(len(a) - 1, 0)),
               i -> struct_pack(tok_a := a[i], tok_b := a[i + 1]))) AS p
      FROM (SELECT source, {_TOKS_LOWER} AS a FROM documents)
    ), agg AS (
      SELECT source, p.tok_a AS tok_a, p.tok_b AS tok_b, count(*) AS n
      FROM pairs GROUP BY 1, 2, 3 HAVING count(*) >= 2
    ), ranked AS (
      SELECT source, tok_a, tok_b, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, tok_a, tok_b) AS rank
      FROM agg
    )
    SELECT source, tok_a, tok_b, n, rank FROM ranked WHERE rank <= 5
"""

# Incremental near-dup verification mirror: even doc_ids play the
# historical corpus (present only as state: LSH bands + hashed-shingle
# store), odd doc_ids are the new batch. Candidates = new-vs-hist band
# collisions (canonical least/greatest) UNION new-vs-new pairs; verify
# = Jaccard over the md5-prefix hashed shingle sets from the store.
def _store_sig_sql() -> str:
    from ml4logs_spark.operators.dedup import STORE_HASH_CHARS

    return (
        "list_sort(list_distinct(list_transform(shingles, "
        f"s -> substring(md5(s), 1, {STORE_HASH_CHARS}))))"
    )


DOC_ORACLES["incremental_near_dup_verified"] = f"""
    WITH sh_h AS (
      SELECT doc_id, {_SHINGLES} AS shingles FROM documents WHERE doc_id % 2 = 0
    ), sh_n AS (
      SELECT doc_id, {_SHINGLES} AS shingles FROM documents WHERE doc_id % 2 = 1
    ), sig_h AS (
      SELECT doc_id, {_MH_EXPRS} FROM sh_h
    ), sig_n AS (
      SELECT doc_id, {_MH_EXPRS} FROM sh_n
    ), bands_h AS ({_bands_sql('sig_h')}
    ), bands_n AS ({_bands_sql('sig_n')}
    ), cand AS (
      SELECT least(a.doc_id, b.doc_id) AS doc_a,
             greatest(a.doc_id, b.doc_id) AS doc_b
      FROM bands_n a JOIN bands_h b USING (band, h)
      WHERE a.doc_id <> b.doc_id
      UNION
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_n a JOIN bands_n b USING (band, h)
      WHERE a.doc_id < b.doc_id
    ), store AS (
      SELECT doc_id, {_store_sig_sql()} AS sh_sig FROM sh_h
      UNION ALL
      SELECT doc_id, {_store_sig_sql()} AS sh_sig FROM sh_n
    )
    SELECT c.doc_a, c.doc_b,
           round(len(list_intersect(sa.sh_sig, sb.sh_sig)) * 1.0
                 / len(list_distinct(list_concat(sa.sh_sig, sb.sh_sig))), 6)
             AS jaccard
    FROM cand c
    JOIN store sa ON sa.doc_id = c.doc_a
    JOIN store sb ON sb.doc_id = c.doc_b
    WHERE round(len(list_intersect(sa.sh_sig, sb.sh_sig)) * 1.0
                / len(list_distinct(list_concat(sa.sh_sig, sb.sh_sig))), 6)
          >= 0.8
"""


def _mix_sql() -> str:
    return f"""
        SELECT d.doc_id, d.source
        FROM documents d
        JOIN (VALUES {_MIX_VALUES}) m(source, rate) ON m.source = d.source
        WHERE substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 4)
              < m.rate
    """


DOC_ORACLES["source_mix_sample"] = _mix_sql()

DOC_ORACLES["near_dup_clusters"] = _dq_rec(
    "SELECT doc_id, cluster_id FROM clusters"
)

# same reachability fixpoint over the embedding-cosine pair graph
DOC_ORACLES["embedding_near_dup_clusters"] = f"""
    WITH RECURSIVE bsig AS ({_ANN_BSIG}),
    cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bsig a JOIN bsig b USING (band, sig)
      WHERE a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    nd AS (
      SELECT p.vec_a, p.vec_b
      FROM cand p
      JOIN embeddings q ON q.vec_id = p.vec_a
      JOIN embeddings c ON c.vec_id = p.vec_b
      WHERE round({_COS}, 6) >= 0.4
    ),
    edges AS (
      SELECT vec_a AS s, vec_b AS d FROM nd
      UNION ALL
      SELECT vec_b AS s, vec_a AS d FROM nd
    ),
    reach(node, r) AS (
      SELECT s, s FROM (SELECT DISTINCT s FROM edges)
      UNION
      SELECT e.s, reach.r FROM edges e JOIN reach ON reach.node = e.d
    )
    SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node
"""
DOC_ORACLES["near_dup_survivors"] = _dq_rec(
    "SELECT doc_id FROM documents WHERE doc_id NOT IN "
    "(SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)"
)

# max_quality survivor policy: per cluster keep the highest
# doc_stats.quality_score (rounded 6dp on BOTH engines, so the rank is
# fold-order stable), ties -> lowest doc_id — mirrors
# dedup.near_dup_survivors(keep="max_quality")'s max_by struct
DOC_ORACLES["near_dup_survivors_quality"] = _dq_rec(f"""
    SELECT doc_id FROM documents WHERE doc_id NOT IN (
      SELECT doc_id FROM clusters WHERE doc_id NOT IN (
        SELECT doc_id FROM (
          SELECT c.doc_id,
                 row_number() OVER (PARTITION BY c.cluster_id
                   ORDER BY q.quality_score DESC, c.doc_id) AS rn
          FROM clusters c JOIN ({_doc_stats_sql()}) q ON q.doc_id = c.doc_id
        ) w WHERE rn = 1))
""")

# Stream packing mirror: global exclusive prefix sum over the chunk
# stream in (doc_id, chunk_idx) order, cut every 512 tokens —
# textqa.pack_sequences over the doc_chunks expansion. The oracle's
# single ORDER BY window is fine at oracle scale; the engine side uses
# the conv_offsets-style two-phase distributed prefix sum.
DOC_ORACLES["packed_sequences"] = f"""
    WITH ch AS ({_chunk_sql("documents")}),
    off AS (
      SELECT doc_id, chunk_idx, n_tokens,
             CAST(coalesce(SUM(n_tokens) OVER (
               ORDER BY doc_id, chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS token_offset
      FROM ch)
    SELECT doc_id, chunk_idx, n_tokens, token_offset,
           CAST(token_offset // 512 AS BIGINT) AS seq_id,
           CAST(token_offset % 512 AS BIGINT) AS seq_pos
    FROM off
"""

# Boilerplate-span removal mirror: drop all occurrences of any 16-token
# block seen in more than 2 distinct docs, reassemble the rest —
# dedup.boilerplate_span_filter(max_doc_freq=2).
DOC_ORACLES["boilerplate_filtered"] = f"""
    WITH b AS ({_span_blocks_sql()}), boiler AS (
      SELECT md5(block_text) AS bh
      FROM b GROUP BY 1 HAVING count(DISTINCT doc_id) > 2
    )
    SELECT doc_id, string_agg(block_text, ' ' ORDER BY block_idx) AS text
    FROM b WHERE md5(block_text) NOT IN (SELECT bh FROM boiler)
    GROUP BY doc_id
"""

# Deterministic train/val/test split mirror: same md5-prefix draw as
# docs_hash_sample; [0,'0800') test, ['0800','1000') val, else train.
DOC_ORACLES["dataset_split"] = """
    SELECT doc_id, source,
           CASE WHEN substring(md5(concat_ws(':', source,
                       CAST(doc_id AS VARCHAR))), 1, 4) < '0800' THEN 'test'
                WHEN substring(md5(concat_ws(':', source,
                       CAST(doc_id AS VARCHAR))), 1, 4) < '1000' THEN 'val'
                ELSE 'train' END AS split
    FROM documents
"""

# int8 scalar quantization mirrors. The per-dim (lo, hi) fit is
# min/max — fold-order independent, so exact on both engines; the code
# expression is the SAME IEEE double tree as the Spark side
# (floor(x + 0.5), never round(): half-up double rounding is
# engine-defined). Dims are 1-based here, emitted 0-based to match
# posexplode.
_QUANT_DIMS = f"""
    d AS (
      SELECT vec_id, i AS dim_idx, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(generate_series(1, {_ANN_DIM})) AS i)
    ), params AS (
      SELECT dim_idx, min(v) AS lo, max(v) AS hi FROM d GROUP BY dim_idx
    ), qcodes AS (
      SELECT d.vec_id, d.dim_idx, p.lo, p.hi,
             CAST(CASE WHEN p.hi = p.lo THEN 0
                  ELSE floor((d.v - p.lo) / (p.hi - p.lo) * 255 + 0.5) - 128
                  END AS INT) AS code
      FROM d JOIN params p USING (dim_idx)
    )
"""

DOC_ORACLES["embedding_quantized"] = f"""
    WITH {_QUANT_DIMS}
    SELECT vec_id, CAST(dim_idx - 1 AS INT) AS dim_idx, code
    FROM qcodes
"""

_DEQ_COS = (
    "list_dot_product(q.qvec, c.qvec)"
    " / (sqrt(list_dot_product(q.qvec, q.qvec))"
    " * sqrt(list_dot_product(c.qvec, c.qvec)))"
)

DOC_ORACLES["quantized_cosine_topk"] = f"""
    WITH {_QUANT_DIMS},
    deq AS (
      SELECT vec_id,
             list(lo + (CAST(code AS DOUBLE) + 128) / 255 * (hi - lo)
                  ORDER BY dim_idx) AS qvec
      FROM qcodes GROUP BY vec_id
    )
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round({_DEQ_COS}, 6) DESC, c.vec_id) AS INT) AS rank,
           round({_DEQ_COS}, 6) AS cosine
    FROM deq q JOIN deq c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 5
    QUALIFY rank <= 10
"""

# per-doc OOV rate vs the df-thresholded vocabulary (same thresholds
# as vocab_dim, same _TOKS_LOWER tokenizer); tokenless docs zero-fill
# through the docs-side left join, mirroring textqa.vocab_coverage
DOC_ORACLES["vocab_coverage"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token FROM documents
    ), agg AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    voc AS (SELECT token FROM agg, n WHERE df >= 2 AND df <= 0.8 * n_docs),
    per AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM tok t LEFT JOIN voc v ON v.token = t.token
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
           round(coalesce(p.n_oov * 1.0 / p.n_tokens, 0.0), 6) AS oov_frac
    FROM documents d LEFT JOIN per p USING (doc_id)
"""

# kNN label vote: seeds are the md5-prefix draw of vec_id (same draw
# family as docs_hash_sample); ranking on round(cos, 6) DESC, seed id
# ASC; vote ties toward the smallest label — mirrors the map-side
# array fold in similarity.knn_label_vote exactly (window/group form
# here, array form there: same semantics, engine-preferred plans).
DOC_ORACLES["knn_label_vote"] = """
    WITH seeds AS (
      SELECT vec_id AS sid, label AS slab, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) < '2000'
    ), rest AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
      WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 4) >= '2000'
    ), scored AS (
      SELECT r.vec_id, r.label, s.sid, s.slab,
             round(list_dot_product(r.v, s.v)
                   / (sqrt(list_dot_product(r.v, r.v))
                      * sqrt(list_dot_product(s.v, s.v))), 6) AS c
      FROM rest r CROSS JOIN seeds s
    ), topk AS (
      SELECT vec_id, label, slab,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY c DESC, sid) AS rk
      FROM scored QUALIFY rk <= 5
    ), votes AS (
      SELECT vec_id, any_value(label) AS label, slab, count(*) AS n
      FROM topk GROUP BY vec_id, slab
    )
    , winners AS (
      SELECT vec_id, slab AS pred_label, CAST(n AS INT) AS n_votes
      FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY n DESC, slab) AS vr
        FROM votes
      ) z
      WHERE vr = 1
    )
    -- LEFT JOIN from rest mirrors the Spark contract: with an EMPTY
    -- seed set every non-seed row still appears, with NULL pred/votes
    SELECT r.vec_id, r.label, w.pred_label, w.n_votes
    FROM rest r LEFT JOIN winners w USING (vec_id)
"""

# temperature-scaled mixing mirrors. alpha = 0.75 => exponent 1/4 as
# sqrt(sqrt(...)): correctly-rounded IEEE ops, bit-identical to the
# Spark side, and * 65536 is an exact power-of-2 scale — the floor to
# the 1/65,536 draw grid can never straddle an engine ulp.
_TEMP_RATES = """
    counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    mn AS (SELECT min(n_docs) AS n_min FROM counts),
    rates AS (
      SELECT source, n_docs,
             CAST(floor(sqrt(sqrt(CAST(n_min AS DOUBLE) / n_docs)) * 65536)
                  AS INT) AS rate_int
      FROM counts, mn
    )
"""

DOC_ORACLES["temperature_mix_rates"] = f"""
    WITH {_TEMP_RATES}
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, rate_int FROM rates
"""

DOC_ORACLES["temperature_mix_sample"] = f"""
    WITH {_TEMP_RATES}
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON r.source = d.source
    WHERE r.rate_int >= 65536
       OR substring(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', least(r.rate_int, 65535))
"""


def _ann_bsig_where(pred: str) -> str:
    """_ANN_BSIG with a WHERE predicate on each banded arm — the
    corpus/benchmark split variant for cross-set decontamination."""
    return "\nUNION ALL ".join(
        f"SELECT vec_id, {b} AS band, {_ann_sig_expr(b)} AS sig "
        f"FROM embeddings WHERE {pred}"
        for b in range(_ANN_BANDS)
    )


# embedding-space decontamination: md5-nibble split of vec_id into
# benchmark (~1/16) vs corpus, banded-LSH candidates across the split,
# exact-cosine verify at 0.4, anti-join of the dirty set. Mirrors
# similarity.embedding_decontaminate including the banding, so the
# approximation is IDENTICAL on both engines (same construction as
# embedding_near_dups).
_EMB_IS_BENCH = "substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'"

DOC_ORACLES["embedding_decontaminated"] = f"""
    WITH cb AS ({_ann_bsig_where("NOT (" + _EMB_IS_BENCH + ")")}),
    bb AS ({_ann_bsig_where(_EMB_IS_BENCH)}),
    cand AS (
      SELECT DISTINCT a.vec_id, b.vec_id AS bench_id
      FROM cb a JOIN bb b USING (band, sig)
    ),
    dirty AS (
      SELECT DISTINCT p.vec_id
      FROM cand p
      JOIN embeddings q ON q.vec_id = p.vec_id
      JOIN embeddings c ON c.vec_id = p.bench_id
      WHERE round({_COS}, 6) >= 0.4
    )
    SELECT e.vec_id FROM embeddings e
    WHERE NOT ({_EMB_IS_BENCH.replace("vec_id", "e.vec_id")})
      AND NOT EXISTS (SELECT 1 FROM dirty d WHERE d.vec_id = e.vec_id)
"""


# IVF cell summary: replay the Lloyd fit CTEs, assign every vector
# (round(cos,6) DESC, cent_id tie-break — identical to Spark's max_by
# struct key), then per-cell size / top-label purity / mean member
# cosine. purity uses * 1.0 to force fractional division (DuckDB
# bigint / bigint is integer division; Spark's / is always fractional).
DOC_ORACLES["ivf_cell_summary"] = f"""
    WITH {_ivf_fit_ctes()},
    allv AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    csim AS (
      SELECT s.vec_id, s.label, c.cent_id, {_CV_COS} AS sim
      FROM allv s CROSS JOIN cb{_IVF_ITERS} c
    ),
    asg AS (
      SELECT vec_id, label, cent_id AS cell, sim AS rcos FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
        FROM csim) r WHERE rn = 1
    ),
    lab AS (SELECT cell, label, count(*) AS n FROM asg GROUP BY 1, 2),
    top AS (
      SELECT cell, label AS top_label, n AS n_top FROM (
        SELECT *, row_number() OVER (
          PARTITION BY cell ORDER BY n DESC, label) AS rn
        FROM lab) r WHERE rn = 1
    ),
    tot AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
             -- exact micro-unit sum (rcos is 6dp): fold-order
             -- independent, unlike avg() of doubles at a boundary
             sum(CAST(round(rcos * 1000000) AS BIGINT)) AS sc
      FROM asg GROUP BY cell
    )
    SELECT t.cell, t.n_vecs, p.top_label, CAST(p.n_top AS BIGINT) AS n_top,
           round(p.n_top * 1.0 / t.n_vecs, 6) AS purity,
           round(sc / (1000000.0 * t.n_vecs), 6) AS mean_cos
    FROM tot t JOIN top p USING (cell)
"""


# Day-2 embedding near-dups over persisted state: even vec_ids are the
# historical corpus, present ONLY as the band table + int8 codes under
# the FROZEN history-fit quantizer; odd ids arrive as the new batch.
# Cross-boundary verify is new-exact vs history-DEQUANTIZED (the
# deterministic contract of the compact state); within-batch pairs
# verify exact-exact. Mirrors similarity.incremental_embedding_near_dups.
_EMB_HIST, _EMB_NEW = "vec_id % 2 = 0", "vec_id % 2 = 1"

DOC_ORACLES["incremental_embedding_near_dups"] = f"""
    WITH nb AS ({_ann_bsig_where(_EMB_NEW)}),
    hb AS ({_ann_bsig_where(_EMB_HIST)}),
    d AS (
      SELECT vec_id, i AS dim_idx, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(generate_series(1, {_ANN_DIM})) AS i)
      WHERE {_EMB_HIST}
    ), params AS (
      SELECT dim_idx, min(v) AS lo, max(v) AS hi FROM d GROUP BY dim_idx
    ), qcodes AS (
      SELECT d.vec_id, d.dim_idx, p.lo, p.hi,
             CAST(CASE WHEN p.hi = p.lo THEN 0
                  ELSE floor((d.v - p.lo) / (p.hi - p.lo) * 255 + 0.5) - 128
                  END AS INT) AS code
      FROM d JOIN params p USING (dim_idx)
    ), deq AS (
      SELECT vec_id,
             list(lo + (CAST(code AS DOUBLE) + 128) / 255 * (hi - lo)
                  ORDER BY dim_idx) AS hvec
      FROM qcodes GROUP BY vec_id
    ),
    cand AS (
      SELECT DISTINCT n.vec_id AS new_id, h.vec_id AS hist_id
      FROM nb n JOIN hb h USING (band, sig)
    ),
    cross_pairs AS (
      SELECT least(c.new_id, c.hist_id) AS vec_a,
             greatest(c.new_id, c.hist_id) AS vec_b,
             round(
               list_dot_product(CAST(e.embedding AS DOUBLE[]), d2.hvec)
               / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                        CAST(e.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(d2.hvec, d2.hvec))), 6) AS cosine
      FROM cand c
      JOIN embeddings e ON e.vec_id = c.new_id
      JOIN deq d2 ON d2.vec_id = c.hist_id
    ),
    nn_cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM nb a JOIN nb b USING (band, sig)
      WHERE a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    ),
    nn AS (
      SELECT p.vec_a, p.vec_b, round({_COS}, 6) AS cosine
      FROM nn_cand p
      JOIN embeddings q ON q.vec_id = p.vec_a
      JOIN embeddings c ON c.vec_id = p.vec_b
    )
    SELECT vec_a, vec_b, cosine FROM cross_pairs WHERE cosine >= 0.4
    UNION ALL
    SELECT vec_a, vec_b, cosine FROM nn WHERE cosine >= 0.4
"""


# Incremental vocabulary state: the Spark side MERGES day-1 counts
# (even doc_ids, state only) with the odd-id batch; the oracle counts
# the FULL corpus in one pass — equality proves incremental == batch
# (df adds across batches because doc_ids are disjoint).
DOC_ORACLES["incremental_vocab_counts"] = """
    WITH tok AS (
      SELECT doc_id, unnest(str_split(lower(text), ' ')) AS token
      FROM documents
    )
    SELECT token,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(count(*) AS BIGINT) AS tf
    FROM tok WHERE token <> '' GROUP BY token
"""


# SemDeDup mirror: replay the Lloyd fit + assignment (identical
# tie-break), then the greedy keep-lowest-id rule within each cell —
# a vector drops iff any lower-id cellmate's cosine >= 0.4.
DOC_ORACLES["semantic_dedup_survivors"] = f"""
    WITH {_ivf_fit_ctes()},
    allv AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    csim AS (
      SELECT s.vec_id, c.cent_id, {_CV_COS} AS sim
      FROM allv s CROSS JOIN cb{_IVF_ITERS} c
    ),
    cells AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cent_id) AS rn
        FROM csim) r WHERE rn = 1
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    ),
    losers AS (
      SELECT DISTINCT p.id_b
      FROM pairs p
      JOIN embeddings q ON q.vec_id = p.id_a
      JOIN embeddings c ON c.vec_id = p.id_b
      WHERE round({_COS}, 6) >= 0.4
    )
    SELECT e.vec_id FROM embeddings e
    WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.id_b = e.vec_id)
"""


# Product-quantization mirror: fit_pq_codebooks is per-subspace Lloyd
# with every step SQL-expressible (mod-sample, shared TakeOrdered seed
# ids sliced per subspace, argmin-L2 assignment on 6dp-rounded
# distances, per-dim means in exact micro-units), so fit + encode
# replay as chained CTEs — the oracle mirrors the ALGORITHM, not
# data-dependent literals. Constants must match the
# similarity.fit_pq_codebooks defaults.
_PQ_M, _PQ_KSUB, _PQ_ITERS, _PQ_SAMPLE_MOD, _PQ_DSUB = 4, 16, 2, 5, 16

_PQ_D2 = (
    "round(list_dot_product(t.sv, t.sv)"
    " - 2 * list_dot_product(t.sv, c.cv)"
    " + list_dot_product(c.cv, c.cv), 6)"
)

_PQ_SUBGRID = f"(SELECT range AS s FROM range(0, {_PQ_M})) g"


def _pq_fit_ctes() -> str:
    slice_expr = (
        f"list_slice(v, g.s * {_PQ_DSUB} + 1, (g.s + 1) * {_PQ_DSUB})"
    )
    ctes = [
        "psamp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE vec_id % {_PQ_SAMPLE_MOD} = 0)",
        f"pseeds AS (SELECT vec_id, v FROM psamp "
        f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_PQ_KSUB})",
        f"psubs AS (SELECT vec_id, g.s AS sub, {slice_expr} AS sv "
        f"FROM psamp CROSS JOIN {_PQ_SUBGRID})",
        f"pcb0 AS (SELECT g.s AS sub, vec_id AS cent_id, {slice_expr} AS cv "
        f"FROM pseeds CROSS JOIN {_PQ_SUBGRID})",
    ]
    for it in range(1, _PQ_ITERS + 1):
        ctes.append(
            f"ps{it} AS (SELECT t.vec_id, t.sub, t.sv, c.cent_id, "
            f"{_PQ_D2} AS d FROM psubs t JOIN pcb{it - 1} c ON t.sub = c.sub)"
        )
        ctes.append(
            f"pa{it} AS (SELECT vec_id, sub, sv, cent_id AS cell FROM ("
            "SELECT *, row_number() OVER (PARTITION BY vec_id, sub "
            f"ORDER BY d, cent_id) AS rn FROM ps{it}) r WHERE rn = 1)"
        )
        ctes.append(
            f"pm{it} AS (SELECT sub, cell, g.i AS pos, "
            "round(sum(CAST(floor(sv[g.i] * 1e6 + 0.5) AS BIGINT)) "
            "/ (count(*) * 1000000.0), 6) AS m "
            f"FROM pa{it} CROSS JOIN (SELECT range AS i "
            f"FROM range(1, {_PQ_DSUB + 1})) g GROUP BY sub, cell, g.i)"
        )
        ctes.append(
            f"pcb{it} AS (SELECT sub, cell AS cent_id, "
            f"list(m ORDER BY pos) AS cv FROM pm{it} GROUP BY sub, cell)"
        )
    ctes += [
        "pcorp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings)",
        f"pcsub AS (SELECT vec_id, g.s AS sub, {slice_expr} AS sv "
        f"FROM pcorp CROSS JOIN {_PQ_SUBGRID})",
        f"pcs AS (SELECT t.vec_id, t.sub, c.cent_id, {_PQ_D2} AS d "
        f"FROM pcsub t JOIN pcb{_PQ_ITERS} c ON t.sub = c.sub)",
        "pasg AS (SELECT vec_id, sub, cent_id AS code FROM ("
        "SELECT *, row_number() OVER (PARTITION BY vec_id, sub "
        "ORDER BY d, cent_id) AS rn FROM pcs) r WHERE rn = 1)",
    ]
    return ",\n    ".join(ctes)


DOC_ORACLES["pq_codes"] = f"""
    WITH {_pq_fit_ctes()}
    SELECT vec_id, CAST(sub AS INT) AS sub, CAST(code AS INT) AS code
    FROM pasg
"""

_PQ_COS = (
    "list_dot_product(q.pqvec, c.pqvec)"
    " / (sqrt(list_dot_product(q.pqvec, q.pqvec))"
    " * sqrt(list_dot_product(c.pqvec, c.pqvec)))"
)

DOC_ORACLES["pq_cosine_topk"] = f"""
    WITH {_pq_fit_ctes()},
    pdec AS (
      SELECT a.vec_id, flatten(list(c.cv ORDER BY a.sub)) AS pqvec
      FROM pasg a JOIN pcb{_PQ_ITERS} c
        ON c.sub = a.sub AND c.cent_id = a.code
      GROUP BY a.vec_id
    )
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round({_PQ_COS}, 6) DESC, c.vec_id) AS INT) AS rank,
           round({_PQ_COS}, 6) AS cosine
    FROM pdec q JOIN pdec c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < 5
    QUALIFY rank <= 10
"""


# Gopher rule-set mirror (textqa.gopher_quality_flags): fused
# word-count / mean-word-length / symbol-ratio / alpha-word /
# stopword-presence signals + per-rule booleans over _TOKS_LOWER
# tokens. Rule comparisons use the ROUNDED signals on both engines
# (same cross-engine-boundary discipline as the repetition gate).
# Driver-query thresholds: min_words=20, max_words=90,
# min_mean_word_len=4.0, min_stop_hits=1, rest at the paper defaults.
DOC_ORACLES["gopher_quality_flags"] = f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             round(coalesce(list_sum(list_transform(toks, t -> len(t))), 0)
                   * 1.0 / greatest(len(toks), 1), 6) AS mean_word_len,
             round(len(regexp_extract_all(txt, '#|\\.\\.\\.|…'))
                   * 1.0 / greatest(len(toks), 1), 6) AS symbol_ratio,
             round(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
                   * 1.0 / greatest(len(toks), 1), 6) AS alpha_word_frac,
             CAST(len(list_intersect(list_distinct(toks),
                  ['the','be','to','of','and','that','have','with']))
                  AS BIGINT) AS stop_hits
      FROM (
        SELECT doc_id, {_TOKS_LOWER} AS toks, coalesce(text, '') AS txt
        FROM documents
      )
    )
    SELECT *,
           (pass_word_count AND pass_mean_word_len AND pass_symbol_ratio
            AND pass_alpha_words AND pass_stopwords) AS passes
    FROM (
      SELECT *,
             (n_words >= 20 AND n_words <= 90) AS pass_word_count,
             (mean_word_len >= 4.0 AND mean_word_len <= 10.0)
               AS pass_mean_word_len,
             (symbol_ratio <= 0.1) AS pass_symbol_ratio,
             (alpha_word_frac >= 0.8) AS pass_alpha_words,
             (stop_hits >= 1) AS pass_stopwords
      FROM s
    )
"""


# Day-2 span dedup mirror (dedup.incremental_span_dedup): even
# doc_ids are history, present ONLY as the 16-hex block-hash store;
# odd ids are the new batch. A batch block survives iff its hash
# prefix is not in the store and it is the batch-canonical (min
# doc_id, block_idx) occurrence; survivors reassemble in order.
DOC_ORACLES["incremental_span_dedup"] = f"""
    WITH store AS (
      SELECT DISTINCT substring(md5(block_text), 1, 16) AS bh
      FROM ({_span_blocks_sql("(SELECT * FROM documents WHERE doc_id % 2 = 0)")})
    ), nb AS (
      SELECT doc_id, block_idx, block_text,
             substring(md5(block_text), 1, 16) AS bh
      FROM ({_span_blocks_sql("(SELECT * FROM documents WHERE doc_id % 2 = 1)")})
    ), fresh AS (
      SELECT * FROM nb WHERE bh NOT IN (SELECT bh FROM store)
    ), ranked AS (
      SELECT doc_id, block_idx, block_text,
             row_number() OVER (PARTITION BY bh
                                ORDER BY doc_id, block_idx) AS rn
      FROM fresh
    )
    SELECT doc_id, string_agg(block_text, ' ' ORDER BY block_idx) AS text
    FROM ranked WHERE rn = 1 GROUP BY doc_id
"""


# curation attrition mirror (curate.curate_attrition at the driver
# query's thresholds — MIX_WEIGHTS, repetition <=0.1, Gopher rules at
# words 12..95 / mean-word-len 3..10 / >=1 stopword, quality gate at
# the chain defaults): per-stage survivor counts computed as
# sequential CTEs (cumulative-filter semantics are identical).
DOC_ORACLES["curate_attrition"] = f"""
    WITH inp AS (
      SELECT doc_id, text, source FROM documents
      WHERE substring(md5(text), 1, 1) <> '0'
    ), bmark AS (
      SELECT text FROM documents WHERE substring(md5(text), 1, 1) = '0'
    ), mixed AS (
      SELECT i.doc_id, i.text FROM inp i
      JOIN (VALUES {_MIX_VALUES}) m(source, rate) ON m.source = i.source
      WHERE substring(md5(i.source || ':' || CAST(i.doc_id AS VARCHAR)),
                      1, 4) < m.rate
    ), dd AS (
      SELECT doc_id, text FROM mixed WHERE doc_id IN (
        SELECT min(doc_id) FROM mixed GROUP BY md5(text))
    ), rep AS (
      SELECT doc_id, text FROM
        (SELECT doc_id, text, {_TOKS_LOWER} AS a FROM dd)
      WHERE {_DUP_BG_FRAC} <= 0.1
    ), gop AS (
      SELECT doc_id, text FROM
        (SELECT doc_id, text, {_TOKS_LOWER} AS a FROM rep)
      WHERE len(a) BETWEEN 12 AND 95
        AND round(coalesce(list_sum(list_transform(a, t -> len(t))), 0)
                  * 1.0 / greatest(len(a), 1), 6) BETWEEN 3.0 AND 10.0
        AND round(len(regexp_extract_all(coalesce(text, ''),
                                         '#|\\.\\.\\.|…'))
                  * 1.0 / greatest(len(a), 1), 6) <= 0.1
        AND round(len(list_filter(a, t -> regexp_matches(t, '[a-z]')))
                  * 1.0 / greatest(len(a), 1), 6) >= 0.8
        AND len(list_intersect(list_distinct(a),
             ['the','be','to','of','and','that','have','with'])) >= 1
    ), stats AS ({_doc_stats_sql('gop')}
    ), good AS (
      SELECT g.doc_id, g.text FROM gop g
      JOIN stats t ON t.doc_id = g.doc_id
      WHERE t.quality_score >= 0.5 AND t.n_tokens BETWEEN 3 AND 10000
    ), bg AS (
      SELECT DISTINCT unnest({_SHINGLES}) AS gram FROM bmark
    ), dg AS (
      SELECT doc_id, unnest({_SHINGLES}) AS gram FROM good
    ), clean AS (
      SELECT doc_id FROM good WHERE doc_id NOT IN (
        SELECT DISTINCT doc_id FROM dg JOIN bg USING (gram))
    )
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM (
      SELECT 1 AS stage_idx, 'raw' AS stage,
             (SELECT count(*) FROM inp) AS n_docs
      UNION ALL SELECT 2, 'mixed', (SELECT count(*) FROM mixed)
      UNION ALL SELECT 3, 'exact_dedup', (SELECT count(*) FROM dd)
      UNION ALL SELECT 4, 'repetition_gate', (SELECT count(*) FROM rep)
      UNION ALL SELECT 5, 'gopher_rules', (SELECT count(*) FROM gop)
      UNION ALL SELECT 6, 'quality_gate', (SELECT count(*) FROM good)
      UNION ALL SELECT 7, 'decontaminated', (SELECT count(*) FROM clean)
    )
"""


# day-2 corpus-report mirror: the Spark side merges the even/odd doc-id
# split histogram states; the oracle is the full-corpus histogram, so
# green == merge-equals-batch (the mergeable-counts contract)
DOC_ORACLES["incremental_doc_length_histogram"] = (
    DOC_ORACLES["doc_length_histogram"]
)
