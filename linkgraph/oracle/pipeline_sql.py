"""DuckDB oracles for the pipeline queries (documents / embeddings).

Hash functions are arithmetic-portable: H(s) = first 8 hex chars of
md5 as integer — Spark ``conv(substring(md5(s),1,8),16,10)`` ≡ DuckDB
``('0x'||substr(md5(s),1,8))::BIGINT``. MinHash/SimHash/LSH constants
match linkgraph.pipeline.{dedup,similarity} exactly.
"""

from __future__ import annotations

from linkgraph.pipeline.text import LANG_MARKERS

TOKENS_CTE = """tok AS MATERIALIZED (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
tokens AS MATERIALIZED (
  SELECT doc_id, pos, t[pos] AS tok FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM tok
  )
)"""

SHINGLES_CTE = """sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS s,
           lead(tok, 2) OVER w AS last2
    FROM tokens WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE last2 IS NOT NULL
)"""

_HV = "(('0x' || substr(md5({col}), 1, 8))::BIGINT)"


def sql_token_counts() -> str:
    return r"""SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) AS BIGINT) AS n_chars_measured
FROM documents"""


def sql_quality() -> str:
    return f"""WITH {TOKENS_CTE}
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  round(avg(length(tok)), 6) AS mean_token_len,
  round(CAST(sum(CASE WHEN tok IN ('the','a','of','and') THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS stopword_ratio,
  (count(*) >= 10 AND avg(length(tok)) >= 2.0 AND avg(length(tok)) <= 12.0) AS quality_keep
FROM tokens GROUP BY doc_id"""


def sql_lang_id() -> str:
    branches = []
    for code, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        branches.append(
            f"SELECT doc_id, '{code}' AS code, "
            f"CAST(sum(CASE WHEN tok IN ({lst}) THEN 1 ELSE 0 END) AS BIGINT) AS hits "
            f"FROM tokens GROUP BY doc_id"
        )
    union = " UNION ALL ".join(branches)
    return f"""WITH {TOKENS_CTE}, scores AS MATERIALIZED ({union})
SELECT doc_id,
  CASE WHEN hits > 0 THEN code ELSE 'und' END AS lang_pred,
  hits AS marker_hits
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, code ASC) AS rn
  FROM scores
) WHERE rn = 1"""


def sql_fingerprints() -> str:
    return """SELECT doc_id,
  md5(lower(trim(text))) AS fingerprint,
  substr(md5(lower(trim(text))), 1, 16) AS fingerprint16
FROM documents"""


def sql_dedup_exact() -> str:
    return """SELECT CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
  CAST(count(*) AS BIGINT) AS n_copies,
  md5(text) AS content_md5
FROM documents GROUP BY md5(text)"""


def sql_ngram_jaccard(threshold: float = 0.1) -> str:
    return f"""WITH {TOKENS_CTE}, {SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {threshold}"""


_MINHASH_CTES = f"""hashes AS (
  SELECT i AS hash_id,
         (1103515245 * i) % 2147483647 + 12345 AS a,
         (69069 * i) % 2147483647 + 1 AS b
  FROM (SELECT unnest(generate_series(0, 15)) AS i)
),
shh AS MATERIALIZED (
  SELECT doc_id, {_HV.format(col='s')} % 2147483647 AS hv FROM sh
),
sig AS MATERIALIZED (
  SELECT doc_id, hash_id,
         CAST(min((a * hv + b) % 2147483647) AS BIGINT) AS minhash
  FROM shh CROSS JOIN hashes GROUP BY doc_id, hash_id
)"""


def sql_minhash_signatures() -> str:
    return f"""WITH {TOKENS_CTE}, {SHINGLES_CTE}, {_MINHASH_CTES}
SELECT doc_id, hash_id, minhash FROM sig"""


_BUCKETS_CTE = """buckets AS MATERIALIZED (
  SELECT doc_id, hash_id // 4 AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY hash_id)) AS bucket
  FROM sig GROUP BY doc_id, hash_id // 4
)"""


def sql_minhash_lsh_candidates() -> str:
    return f"""WITH {TOKENS_CTE}, {SHINGLES_CTE}, {_MINHASH_CTES}, {_BUCKETS_CTE}
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_bands
FROM buckets x JOIN buckets y
  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
GROUP BY 1, 2"""


def sql_simhash(bits: int = 16) -> str:
    return f"""WITH {TOKENS_CTE},
th AS MATERIALIZED (
  SELECT doc_id, {_HV.format(col='tok')} AS hv FROM tokens
),
bitsum AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (hv >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, {bits - 1})) AS bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
  CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum GROUP BY doc_id"""


_DIMS_CTE = """dims AS MATERIALIZED (
  SELECT vec_id, pos - 1 AS dim, CAST(embedding[pos] AS DOUBLE) AS x FROM (
    SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS pos
    FROM embeddings
  )
),
norms AS MATERIALIZED (
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM dims GROUP BY vec_id
)"""


def sql_knn(n_queries: int = 10, k: int = 5) -> str:
    return f"""WITH {_DIMS_CTE},
dots AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id, sum(q.x * d.x) AS dot
  FROM dims q JOIN dims d ON q.dim = d.dim
  WHERE q.vec_id < {n_queries} AND q.vec_id != d.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT query_id, neighbor_id,
         round(dot / (nq.nrm * nn.nrm), 4) AS cosine,
         CAST(row_number() OVER (
           PARTITION BY query_id
           ORDER BY round(dot / (nq.nrm * nn.nrm), 4) DESC, neighbor_id ASC
         ) AS BIGINT) AS rnk
  FROM dots
  JOIN norms nq ON query_id = nq.vec_id
  JOIN norms nn ON neighbor_id = nn.vec_id
) WHERE rnk <= {k}"""


def sql_embedding_dups(threshold: float = 0.5) -> str:
    return f"""WITH {_DIMS_CTE},
dots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dot
  FROM dims a JOIN dims b ON a.dim = b.dim AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_a, vec_b, round(dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots
JOIN norms na ON vec_a = na.vec_id
JOIN norms nb ON vec_b = nb.vec_id
WHERE dot / (na.nrm * nb.nrm) >= {threshold}"""


def sql_ann_buckets(num_planes: int = 8) -> str:
    return f"""WITH {_DIMS_CTE},
grid AS (
  SELECT plane, dim,
         CASE WHEN ((1664525 * (plane * 64 + dim) + 1013904223) % 2147483648) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS c
  FROM (SELECT unnest(generate_series(0, {num_planes - 1})) AS plane)
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim)
),
dots AS (
  SELECT vec_id, plane, sum(x * c) AS dot
  FROM dims JOIN grid USING (dim) GROUP BY 1, 2
)
SELECT vec_id,
  CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
FROM dots GROUP BY vec_id"""


def sql_media_stats() -> str:
    return """SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS media_md5,  -- md5 of the utf-8 bytes == md5 of the blob
  CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type,
  CAST((doc_id % 64 + 16) * (doc_id % 48 + 16) AS BIGINT) AS n_pixels
FROM documents"""


def sql_dedup_clusters(iters: int = 6) -> str:
    """Duplicate clusters: unrolled hash-min CC over the LSH
    candidate-pair graph (same CTEs as minhash_lsh_candidates), all
    documents labeled, singletons keeping their own id — matches
    linkgraph.pipeline.dedup.dedup_clusters at the same round count."""
    parts = [
        TOKENS_CTE,
        SHINGLES_CTE,
        _MINHASH_CTES,
        _BUCKETS_CTE,
        """pairs AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM buckets x JOIN buckets y
    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)""",
        "psym AS MATERIALIZED (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs)",
        "pverts AS MATERIALIZED (SELECT DISTINCT a AS vid FROM psym)",
        "c0 AS (SELECT vid, vid AS component FROM pverts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT vid, min(component) AS component FROM (
    SELECT s.b AS vid, c.component FROM psym s JOIN c{i - 1} c ON s.a = c.vid
    UNION ALL
    SELECT vid, component FROM c{i - 1}
  ) GROUP BY vid
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT d.doc_id, CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN c{iters} c ON d.doc_id = c.vid"""
    )


def sql_ann_ivf_cells(n_cells: int = 8) -> str:
    """IVF cell routing: max-cosine centroid per vector, centroids =
    the n_cells lowest vec_ids (matches
    linkgraph.pipeline.similarity.ivf_cells)."""
    return f"""WITH {_DIMS_CTE},
cents AS MATERIALIZED (
  SELECT vec_id AS cell FROM embeddings ORDER BY vec_id LIMIT {n_cells}
),
cdims AS MATERIALIZED (
  SELECT c.cell, d.dim, d.x FROM dims d JOIN cents c ON d.vec_id = c.cell
),
dots AS (
  SELECT a.vec_id AS vec_id, c.cell AS cell, sum(a.x * c.x) AS dot
  FROM dims a JOIN cdims c ON a.dim = c.dim
  GROUP BY 1, 2
),
scored AS (
  SELECT t.vec_id, t.cell, round(t.dot / (na.nrm * nc.nrm), 4) AS cosine
  FROM dots t
  JOIN norms na ON t.vec_id = na.vec_id
  JOIN norms nc ON t.cell = nc.vec_id
)
SELECT vec_id, cell, cosine FROM (
  SELECT vec_id, cell, cosine,
         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, cell ASC) AS rn
  FROM scored
) WHERE rn = 1"""


# --------------------------------------------- sampling / PII / packing

_H_SALTED = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), 1, 8))::BIGINT)"


def _rate_case(rates: dict[str, float], mod: int) -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {int(r * mod)}"
        for lang, r in sorted(rates.items())
    )
    return f"CASE lang {whens} ELSE 0 END"


def sql_stratified_sample() -> str:
    from linkgraph.pipeline.sampling import DEFAULT_RATES, SAMPLE_MOD

    h = _H_SALTED.format(salt="strat")
    return f"""SELECT doc_id, lang, source FROM documents
WHERE ({h} % {SAMPLE_MOD}) < {_rate_case(DEFAULT_RATES, SAMPLE_MOD)}"""


def sql_sample_rates() -> str:
    from linkgraph.pipeline.sampling import DEFAULT_RATES, SAMPLE_MOD

    h = _H_SALTED.format(salt="strat")
    return f"""WITH kept AS MATERIALIZED (
  SELECT lang, count(*) AS n_kept FROM documents
  WHERE ({h} % {SAMPLE_MOD}) < {_rate_case(DEFAULT_RATES, SAMPLE_MOD)}
  GROUP BY lang
), tot AS MATERIALIZED (
  SELECT lang, count(*) AS n_total FROM documents GROUP BY lang
)
SELECT t.lang, CAST(t.n_total AS BIGINT) AS n_total,
  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
  round(CAST(coalesce(k.n_kept, 0) AS DOUBLE) / t.n_total, 6) AS realized_rate
FROM tot t LEFT JOIN kept k ON t.lang = k.lang"""


def sql_pii_stats() -> str:
    from linkgraph.pipeline.text import PII_EMAIL, PII_PHONE, PII_URL

    return f"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PII_URL}')) AS BIGINT) AS n_urls,
  CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
     + len(regexp_extract_all(text, '{PII_URL}'))
     + len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS pii_total,
  (len(regexp_extract_all(text, '{PII_EMAIL}'))
 + len(regexp_extract_all(text, '{PII_URL}'))
 + len(regexp_extract_all(text, '{PII_PHONE}'))) = 0 AS clean
FROM documents"""


def sql_contamination() -> str:
    """Probe 3-grams computed in Python (the probe set is a fixed
    constant), matched against the same lead-window shingle CTE the
    dedup oracles use."""
    from linkgraph.pipeline.text import CONTAMINATION_PROBES

    grams = set()
    for p in CONTAMINATION_PROBES:
        t = p.split(" ")
        for i in range(len(t) - 2):
            grams.add(" ".join(t[i : i + 3]))
    vals = ", ".join("('" + g.replace("'", "''") + "')" for g in sorted(grams))
    return f"""WITH {TOKENS_CTE},
{SHINGLES_CTE},
probes(s) AS (VALUES {vals}),
hits AS MATERIALIZED (
  SELECT sh.doc_id, count(*) AS n_hits
  FROM sh JOIN probes ON sh.s = probes.s GROUP BY sh.doc_id
)
SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"""


def sql_pack_sequences(sf_dir: str | None = None) -> str:
    """Pure-Python replay of ``sampling.pack_sequences`` defaults over
    the same parquet the driver's views read, emitted as a VALUES
    literal (the greedy per-group packer is sequential state, like the
    streaming partitioners — same oracle pattern as
    linkgraph/oracle/literal.py)."""
    import hashlib

    import duckdb

    from linkgraph.oracle.literal import ORACLE_SF, _values_sql
    from linkgraph.pipeline.sampling import PACK_BUDGET, PACK_GROUPS

    sf = ORACLE_SF if sf_dir is None else sf_dir
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
        FROM read_parquet('{sf}/documents.parquet')"""
    ).fetchall()
    con.close()

    def h(doc_id: int, salt: str) -> int:
        return int(
            hashlib.md5(f"{doc_id}:{salt}".encode()).hexdigest()[:8], 16
        )

    from linkgraph.pipeline.sampling import greedy_bins

    groups: dict[int, list[tuple[int, int, int]]] = {}
    for doc_id, n in rows:
        g = h(doc_id, "grp") % PACK_GROUPS
        groups.setdefault(g, []).append((h(doc_id, "ord"), int(doc_id), int(n)))
    out = []
    for g, lst in groups.items():
        lst.sort()
        bins = greedy_bins([n for _, _, n in lst], PACK_BUDGET)
        for (_, doc_id, n), b in zip(lst, bins):
            out.append((doc_id, g, b, n))
    return _values_sql(
        sorted(out),
        [("doc_id", "BIGINT"), ("grp", "BIGINT"), ("bin", "BIGINT"),
         ("n_tokens", "BIGINT")],
    )


def sql_domain_cap(cap: int = 5) -> str:
    h = _H_SALTED.format(salt="cap")
    return f"""SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (PARTITION BY source ORDER BY {h}, doc_id) AS BIGINT) AS rk
  FROM documents
) WHERE rk <= {cap}"""


def sql_vocab_topk(k: int = 50) -> str:
    return f"""WITH {TOKENS_CTE}
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM tokens GROUP BY tok
ORDER BY n DESC, tok ASC LIMIT {k}"""


TRIGRAMS_CTE = """tri AS MATERIALIZED (
  SELECT doc_id, s FROM (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS s,
           lead(tok, 2) OVER w AS last2
    FROM tokens WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE last2 IS NOT NULL
)"""


def sql_repetition_ratio() -> str:
    return f"""WITH {TOKENS_CTE},
{TRIGRAMS_CTE},
per AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT s) AS BIGINT) AS n_distinct
  FROM tri GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
  round(1.0 - coalesce(CAST(p.n_distinct AS DOUBLE) / p.n_grams, 1.0), 6)
    AS repetition_ratio
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id"""


def sql_unigram_logprob() -> str:
    return f"""WITH {TOKENS_CTE},
tot AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM tokens),
vocab AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tokens GROUP BY tok
)
SELECT t.doc_id,
  round(avg(-ln(v.cnt / (SELECT n FROM tot))), 6) AS mean_nll,
  CAST(count(*) AS BIGINT) AS n_tokens
FROM tokens t JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id"""


def sql_tfidf_top_terms(k: int = 3) -> str:
    return f"""WITH {TOKENS_CTE},
nd AS MATERIALIZED (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
tf AS MATERIALIZED (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM tokens GROUP BY doc_id, tok
),
dfq AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
),
sc AS MATERIALIZED (
  SELECT tf.doc_id, tf.tok AS term,
         round(tf.tf * ln((SELECT n FROM nd) / dfq.df), 6) AS tfidf
  FROM tf JOIN dfq ON tf.tok = dfq.tok
)
SELECT doc_id, term, tfidf, rnk FROM (
  SELECT doc_id, term, tfidf,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
         ) AS BIGINT) AS rnk
  FROM sc
) WHERE rnk <= {k}"""


def sql_chunk_documents(max_len: int = 200, stride: int = 150) -> str:
    """Overlapping character-window chunking — matches
    linkgraph.pipeline.text.chunk_documents."""
    return f"""WITH ks AS MATERIALIZED (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(floor((length(text) - 1) / {stride}) AS BIGINT))) AS k
  FROM documents WHERE length(text) > 0
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
       substr(text, CAST(k * {stride} + 1 AS INTEGER), {max_len}) AS chunk,
       CAST(length(substr(text, CAST(k * {stride} + 1 AS INTEGER), {max_len}))
            AS BIGINT) AS chunk_len
FROM ks"""


def sql_mixture_weights() -> str:
    """Temperature-0.5 language mixture — matches
    linkgraph.pipeline.sampling.mixture_weights (sqrt not pow; window
    total in fixed lang order)."""
    return """WITH counts AS MATERIALIZED (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
)
SELECT lang, n_docs,
       round(sqrt(n_docs) /
             sum(sqrt(n_docs)) OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND UNBOUNDED FOLLOWING), 6)
         AS mix_weight
FROM counts"""


def sql_source_lang_entropy() -> str:
    """Per-source language-mix entropy — matches
    linkgraph.pipeline.sampling.source_lang_entropy (integer counts,
    H = ln t − Σ c·ln c / t)."""
    return """WITH per AS MATERIALIZED (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
)
SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_langs,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS lang_entropy
FROM per GROUP BY source"""


def sql_dup_rate_by_source() -> str:
    """Per-source exact-duplicate rate — matches
    linkgraph.pipeline.dedup.dup_rate_by_source."""
    return """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
       round(1.0 - count(DISTINCT md5(text)) * 1.0 / count(*), 6) AS dup_rate
FROM documents GROUP BY source"""


def sql_dup_ngram_coverage() -> str:
    """Cross-corpus shingle duplication coverage per doc — matches
    linkgraph.pipeline.dedup.dup_ngram_coverage (same shingle CTEs as
    MinHash)."""
    return f"""WITH {TOKENS_CTE},
{SHINGLES_CTE},
df AS MATERIALIZED (
  SELECT s, CAST(count(*) AS BIGINT) AS ndocs FROM sh GROUP BY s
),
per AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
  FROM sh JOIN df USING (s) GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(coalesce(per.n_shared, 0) AS BIGINT) AS n_shared,
  round(per.n_shared * 1.0 / per.n_shingles, 6) AS shared_ratio
FROM documents d LEFT JOIN per USING (doc_id)"""


def sql_dedup_canonical(iters: int = 6) -> str:
    """Survivor per duplicate cluster (max n_chars, ties min doc_id) —
    matches linkgraph.pipeline.dedup.dedup_canonical; the cluster
    labeling is the sql_dedup_clusters chain as a subquery."""
    clusters = sql_dedup_clusters(iters)
    return f"""SELECT cluster_id,
  CAST(doc_id AS BIGINT) AS survivor_doc_id,
  CAST(sz AS BIGINT) AS cluster_size,
  CAST(sz - 1 AS BIGINT) AS n_dropped
FROM (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.cluster_id) AS sz
  FROM ({clusters}) c JOIN documents d USING (doc_id)
) WHERE rn = 1"""


def sql_hll_distinct() -> str:
    """Per-source HyperLogLog distinct-text estimate + exact + rel_err
    — matches linkgraph.pipeline.sketches.hll_distinct register for
    register (m=64, alpha=0.709, rank via minimal-binary length)."""
    from linkgraph.pipeline.sketches import HLL_ALPHA, HLL_M

    m = HLL_M
    rest_bits = 32 - (m.bit_length() - 1)
    amm = f"{HLL_ALPHA} * {m} * {m}"
    h = _HV.format(col="text")
    return f"""WITH rows AS MATERIALIZED (
  SELECT source, h % {m} AS bucket, h // {m} AS rest FROM (
    SELECT source, {h} AS h FROM documents
  )
),
regs AS MATERIALIZED (
  SELECT source, bucket,
         max(CASE WHEN rest = 0 THEN {rest_bits + 1}
                  ELSE {rest_bits + 1} - length(bin(rest)) END) AS mj
  FROM rows GROUP BY source, bucket
),
folded AS MATERIALIZED (
  SELECT source, sum(pow(2.0, -mj)) AS z_present, count(*) AS k
  FROM regs GROUP BY source
),
est AS MATERIALIZED (
  SELECT source,
    CASE WHEN ({amm} / (z_present + ({m} - k))) <= {2.5 * m}
              AND ({m} - k) > 0
         THEN {m} * ln({m}.0 / ({m} - k))
         ELSE {amm} / (z_present + ({m} - k)) END AS e
  FROM folded
),
exact AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT text) AS BIGINT) AS exact_distinct
  FROM documents GROUP BY source
)
SELECT exact.source, n_docs, exact_distinct,
  round(e, 6) AS hll_estimate,
  round((e - exact_distinct) / exact_distinct, 6) AS rel_err
FROM est JOIN exact USING (source)"""


def sql_heavy_hitters() -> str:
    """Count-Min estimates for the true top tokens — matches
    linkgraph.pipeline.sketches.heavy_hitters_cms (D=3 rows, W=128,
    row hash = md5(i ':' tok) prefix)."""
    from linkgraph.pipeline.sketches import CMS_D, CMS_TOP, CMS_W

    ilist = ", ".join(str(i) for i in range(CMS_D))
    bucket = _HV.format(col="i::VARCHAR || ':' || tok") + f" % {CMS_W}"
    return f"""WITH {TOKENS_CTE},
tc AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt FROM tokens GROUP BY tok
),
rws AS MATERIALIZED (
  SELECT i, {bucket} AS bucket, tok, exact_cnt
  FROM tc, (SELECT unnest([{ilist}]) AS i)
),
cells AS MATERIALIZED (
  SELECT i, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell_sum
  FROM rws GROUP BY i, bucket
),
heads AS MATERIALIZED (
  SELECT tok, exact_cnt FROM tc
  ORDER BY exact_cnt DESC, tok ASC LIMIT {CMS_TOP}
)
SELECT h.tok, h.exact_cnt,
       CAST(min(cell_sum) AS BIGINT) AS cms_estimate,
       CAST(min(cell_sum) - h.exact_cnt AS BIGINT) AS overcount
FROM heads h
JOIN rws r ON r.tok = h.tok
JOIN cells c ON c.i = r.i AND c.bucket = r.bucket
GROUP BY h.tok, h.exact_cnt"""


def sql_bigram_logprob() -> str:
    """Per-doc mean bigram surprisal — matches
    linkgraph.pipeline.text.bigram_logprob."""
    return f"""WITH {TOKENS_CTE},
big AS MATERIALIZED (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM tokens
  ) WHERE w2 IS NOT NULL
),
c2 AS MATERIALIZED (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY w1, w2
),
c1 AS MATERIALIZED (
  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1
)
SELECT doc_id,
  round(avg(-ln(c2 * 1.0 / c1)), 6) AS mean_bigram_nll,
  CAST(count(*) AS BIGINT) AS n_bigrams
FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY doc_id"""


def sql_ivf_cell_stats(n_cells: int = 8) -> str:
    """Per-cell audit over the IVF routing — matches
    linkgraph.pipeline.similarity.ivf_cell_stats (the routing SQL is
    sql_ann_ivf_cells as a subquery)."""
    routing = sql_ann_ivf_cells(n_cells)
    return f"""SELECT cell,
  CAST(count(*) AS BIGINT) AS n_vectors,
  round(avg(cosine), 6) AS mean_cosine,
  round(min(cosine), 6) AS min_cosine
FROM ({routing}) GROUP BY cell"""


def sql_quality_by_source() -> str:
    """Per-source quality dashboard — matches
    linkgraph.pipeline.text.quality_by_source (same per-doc quality
    CTE as sql_quality)."""
    return f"""WITH {TOKENS_CTE},
q AS MATERIALIZED (
  SELECT doc_id,
    CAST(count(*) AS BIGINT) AS n_tokens,
    (count(*) >= 10 AND avg(length(tok)) >= 2.0 AND avg(length(tok)) <= 12.0)
      AS quality_keep
  FROM tokens GROUP BY doc_id
)
SELECT d.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN q.quality_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
  round(sum(CASE WHEN q.quality_keep THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    AS keep_rate,
  round(avg(q.n_tokens), 6) AS mean_tokens
FROM q JOIN documents d USING (doc_id)
GROUP BY d.source"""


def sql_doc_length_quantiles() -> str:
    """Nearest-rank token-count percentiles from the length histogram
    — matches linkgraph.pipeline.text.doc_length_quantiles."""
    from linkgraph.pipeline.text import LENGTH_QUANTILES

    qlist = ", ".join(str(q) for q in LENGTH_QUANTILES)
    return f"""WITH hist AS MATERIALIZED (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1
),
cum AS MATERIALIZED (
  SELECT n_tokens, sum(cnt) OVER (ORDER BY n_tokens) AS cum,
         (SELECT sum(cnt) FROM hist) AS n
  FROM hist
)
SELECT CAST(q AS BIGINT) AS q, CAST(min(n_tokens) AS BIGINT) AS n_tokens
FROM (SELECT unnest([{qlist}]) AS q), cum
WHERE cum >= (q * n + 99) // 100
GROUP BY q"""


def sql_bloom_membership() -> str:
    """Bloom-filter membership audit — matches
    linkgraph.pipeline.sketches.bloom_membership bit position for bit
    position (k unrolled md5-prefix hashes, m-bit space)."""
    from linkgraph.pipeline.sketches import (
        BLOOM_ABSENT_PROBES,
        BLOOM_K,
        BLOOM_M,
        BLOOM_PRESENT_PROBES,
    )

    def h(i: int, col: str) -> str:
        return (
            f"(('0x' || substr(md5('bloom{i}:' || {col}), 1, 8))::BIGINT)"
            f" % {BLOOM_M}"
        )

    bit_parts = "\n    UNION ALL\n    ".join(
        f"SELECT {h(i, 'text')} AS pos FROM documents" for i in range(BLOOM_K)
    )
    ppos_parts = "\n    UNION ALL\n    ".join(
        f"SELECT probe_id, {h(i, 'text')} AS pos FROM probes"
        for i in range(BLOOM_K)
    )
    absent_vals = ", ".join(
        f"({100000 + j}, 'absent probe {j} xyzzy')"
        for j in range(BLOOM_ABSENT_PROBES)
    )
    return f"""WITH bits AS MATERIALIZED (
  SELECT DISTINCT pos FROM (
    {bit_parts}
  )
),
probes AS MATERIALIZED (
  SELECT * FROM (
    SELECT CAST(doc_id AS BIGINT) AS probe_id, text FROM documents
    ORDER BY doc_id LIMIT {BLOOM_PRESENT_PROBES}
  )
  UNION ALL
  SELECT CAST(probe_id AS BIGINT), text
  FROM (VALUES {absent_vals}) AS t(probe_id, text)
),
ppos AS MATERIALIZED (
  SELECT probe_id, pos FROM (
    {ppos_parts}
  )
),
hits AS MATERIALIZED (
  SELECT p.probe_id,
         sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS nhit
  FROM ppos p LEFT JOIN bits b ON p.pos = b.pos
  GROUP BY p.probe_id
),
exact AS MATERIALIZED (
  SELECT probe_id,
         (text IN (SELECT text FROM documents)) AS present
  FROM probes
)
SELECT h.probe_id,
  (nhit = {BLOOM_K}) AS bloom_positive,
  e.present,
  ((nhit = {BLOOM_K}) AND NOT e.present) AS false_positive
FROM hits h JOIN exact e USING (probe_id)"""


def sql_verified_sim_pairs(
    threshold: float = 0.3,
    num_planes: int = 8,
    max_bucket_size: int = 10000,
) -> str:
    """LSH-verified similarity join — matches
    linkgraph.pipeline.similarity.verified_sim_pairs (same hyperplane
    grid as sql_ann_buckets, mega-bucket cap, exact cosine filter)."""
    return f"""WITH {_DIMS_CTE},
grid AS (
  SELECT plane, dim,
         CASE WHEN ((1664525 * (plane * 64 + dim) + 1013904223) % 2147483648) % 2 = 0
              THEN 1.0 ELSE -1.0 END AS c
  FROM (SELECT unnest(generate_series(0, {num_planes - 1})) AS plane)
  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim)
),
dots AS MATERIALIZED (
  SELECT vec_id, plane, sum(x * c) AS dot
  FROM dims JOIN grid USING (dim) GROUP BY 1, 2
),
b AS MATERIALIZED (
  SELECT vec_id,
    CAST(sum(CASE WHEN dot > 0 THEN (1::BIGINT << plane) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
),
ok AS MATERIALIZED (
  SELECT bucket FROM (SELECT bucket, count(*) AS c FROM b GROUP BY bucket)
  WHERE c <= {max_bucket_size}
),
bb AS MATERIALIZED (
  SELECT vec_id, bucket FROM b JOIN ok USING (bucket)
),
pairs AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b2
  FROM bb x JOIN bb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
),
pcos AS MATERIALIZED (
  SELECT p.a, p.b2,
         round(sum(da.x * db.x) / (any_value(na.nrm) * any_value(nb.nrm)), 4)
           AS cosine
  FROM pairs p
  JOIN dims da ON da.vec_id = p.a
  JOIN dims db ON db.vec_id = p.b2 AND da.dim = db.dim
  JOIN norms na ON na.vec_id = p.a
  JOIN norms nb ON nb.vec_id = p.b2
  GROUP BY p.a, p.b2
)
SELECT a AS vec_a, b2 AS vec_b, cosine FROM pcos
WHERE cosine >= {threshold}"""
