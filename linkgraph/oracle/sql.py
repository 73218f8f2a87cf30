"""DuckDB oracle SQL for every driver query in ``linkgraph.queries``.

Iterative algorithms are unrolled as CTE chains with the same fixed
iteration counts the Spark queries use; float outputs rounded to 6
decimals on both sides. The tables region/nation/.../lineitem are
pre-registered DuckDB views by the driver.
"""

from __future__ import annotations

from linkgraph.queries import CC_ITERS, K_DBH, K_GRID, K_HASH, LPA_ITERS, PR_ITERS

# shared CTE bodies -------------------------------------------------------

EDGES_CTE = """e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""

SYM_CTE = """sym AS MATERIALIZED (
  SELECT src, dst FROM e
  UNION ALL
  SELECT dst AS src, src AS dst FROM e
)"""

VERTS_CTE = "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM sym)"

DEG_CTE = """deg AS MATERIALIZED (
  SELECT vid, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT src AS vid FROM e UNION ALL SELECT dst AS vid FROM e
  ) GROUP BY vid
)"""


def sql_edges() -> str:
    return f"WITH {EDGES_CTE} SELECT src, dst FROM e"


def sql_degrees() -> str:
    return f"WITH {EDGES_CTE}, {DEG_CTE} SELECT vid, degree FROM deg"


_ASSIGN = {
    "hash": f"CAST((src * 131071 + dst) % {K_HASH} AS BIGINT)",
    "grid": f"CAST((src % {int(K_GRID ** 0.5)}) * {int(K_GRID ** 0.5)} "
    f"+ (dst % {int(K_GRID ** 0.5)}) AS BIGINT)",
}

_DBH_CTE = f"""pa_dbh AS MATERIALIZED (
  SELECT e.src, e.dst,
         CAST((CASE WHEN ds.degree <= dd.degree THEN e.src ELSE e.dst END) % {K_DBH} AS BIGINT) AS partition
  FROM e JOIN deg ds ON e.src = ds.vid JOIN deg dd ON e.dst = dd.vid
)"""


def sql_partition_hash() -> str:
    return (
        f"WITH {EDGES_CTE} SELECT src, dst, {_ASSIGN['hash']} AS partition FROM e"
    )


def sql_partition_dbh() -> str:
    return (
        f"WITH {EDGES_CTE}, {DEG_CTE}, {_DBH_CTE} "
        "SELECT src, dst, partition FROM pa_dbh"
    )


def sql_partition_grid() -> str:
    return (
        f"WITH {EDGES_CTE} SELECT src, dst, {_ASSIGN['grid']} AS partition FROM e"
    )


def _metrics_block(name: str, assign_cte: str, k: int) -> str:
    """One SELECT computing the edgePartitioner.cpp:30-46 metrics from a
    (src,dst,partition) CTE named ``assign_cte``."""
    return f"""SELECT '{name}' AS strategy,
  (SELECT CAST(sum(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM {assign_cte} GROUP BY partition)) AS m,
  (SELECT CAST(count(DISTINCT vid) AS BIGINT) FROM (
     SELECT src AS vid, partition FROM {assign_cte} UNION ALL SELECT dst, partition FROM {assign_cte})) AS n_vertices,
  (SELECT CAST(count(*) AS BIGINT) FROM (
     SELECT DISTINCT vid, partition FROM (
       SELECT src AS vid, partition FROM {assign_cte} UNION ALL SELECT dst, partition FROM {assign_cte}))) AS replicas,
  CAST(NULL AS DOUBLE) AS replication_factor,
  (SELECT CAST(max(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM {assign_cte} GROUP BY partition)) AS max_edge,
  (SELECT CAST(min(cnt) AS BIGINT) FROM (SELECT count(*) AS cnt FROM {assign_cte} GROUP BY partition)) AS min_edge,
  CAST(NULL AS DOUBLE) AS alpha"""


def sql_partition_metrics() -> str:
    hash_cte = f"pa_hash AS MATERIALIZED (SELECT src, dst, {_ASSIGN['hash']} AS partition FROM e)"
    grid_cte = f"pa_grid AS MATERIALIZED (SELECT src, dst, {_ASSIGN['grid']} AS partition FROM e)"
    blocks = " UNION ALL ".join(
        _metrics_block(n, f"pa_{n}", k)
        for n, k in [("hash", K_HASH), ("dbh", K_DBH), ("grid", K_GRID)]
    )
    kmap = f"CASE strategy WHEN 'hash' THEN {K_HASH} WHEN 'dbh' THEN {K_DBH} ELSE {K_GRID} END"
    return f"""WITH {EDGES_CTE}, {DEG_CTE}, {hash_cte}, {_DBH_CTE}, {grid_cte},
raw AS ({blocks})
SELECT strategy, m, n_vertices, replicas,
  round(CAST(replicas AS DOUBLE) / CAST(n_vertices AS DOUBLE), 6) AS replication_factor,
  max_edge, min_edge,
  round(CAST(max_edge AS DOUBLE) * ({kmap}) / CAST(m AS DOUBLE), 6) AS alpha
FROM raw"""


def sql_pagerank(iters: int = PR_ITERS, d: float = 0.85) -> str:
    parts = [
        EDGES_CTE,
        SYM_CTE,
        VERTS_CTE,
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "odeg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS outdeg FROM sym GROUP BY src)",
        "r0 AS (SELECT vid, 1.0 / (SELECT n FROM nn) AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT s.dst AS vid,
         (1.0 - {d}) / (SELECT n FROM nn) + {d} * sum(r.rank / o.outdeg) AS rank
  FROM sym s JOIN r{i - 1} r ON s.src = r.vid JOIN odeg o ON s.src = o.vid
  GROUP BY s.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(rank, 6) AS rank FROM r{iters}"
    )


def sql_components(iters: int = CC_ITERS) -> str:
    parts = [
        EDGES_CTE,
        SYM_CTE,
        VERTS_CTE,
        "l0 AS (SELECT vid, vid AS component FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT vid, min(component) AS component FROM (
    SELECT s.dst AS vid, l.component FROM sym s JOIN l{i - 1} l ON s.src = l.vid
    UNION ALL
    SELECT vid, component FROM l{i - 1}
  ) GROUP BY vid
)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT vid, component FROM l{iters}"
    )


def _lpa_parts(iters: int) -> list[str]:
    """Unrolled synchronous-LPA CTE chain p0..p{iters} (shared by the
    label_propagation and modularity oracles)."""
    parts = [
        EDGES_CTE,
        SYM_CTE,
        VERTS_CTE,
        "p0 AS (SELECT vid, vid AS label FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label,
           row_number() OVER (PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn
    FROM (
      SELECT s.dst AS vid, l.label, count(*) AS cnt
      FROM sym s JOIN p{i - 1} l ON s.src = l.vid
      GROUP BY s.dst, l.label
    )
  ) WHERE rn = 1
)"""
        )
    return parts


def sql_label_propagation(iters: int = LPA_ITERS) -> str:
    parts = _lpa_parts(iters)
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, label FROM p{iters}"


def sql_modularity(iters: int = LPA_ITERS) -> str:
    """Newman modularity of the LPA labeling — matches
    linkgraph.algos.projection.modularity over the LPA_ITERS-round
    labels (integer dart tallies, one final division)."""
    parts = _lpa_parts(iters)
    parts.append(
        f"""md AS MATERIALIZED (
  SELECT la.label AS lab, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT) AS si
  FROM sym s JOIN p{iters} la ON s.src = la.vid
             JOIN p{iters} lb ON s.dst = lb.vid
  GROUP BY la.label
)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + """
SELECT CAST(count(*) AS BIGINT) AS n_communities,
       CASE WHEN sum(c) = 0 THEN NULL
            ELSE round((sum(si) * sum(c) - sum(c * c)) * 1.0
                       / (sum(c) * sum(c)), 6) END AS modularity
FROM md"""
    )


def sql_component_sizes(iters: int = CC_ITERS) -> str:
    """Component-size histogram — matches queries.q_component_sizes
    (the CC chain grouped twice)."""
    cc = sql_components(iters)
    return f"""WITH cc AS MATERIALIZED ({cc}),
cs AS (SELECT component, CAST(count(*) AS BIGINT) AS size FROM cc GROUP BY component)
SELECT size, CAST(count(*) AS BIGINT) AS n_components FROM cs GROUP BY size"""


_TRI_CTE = """tri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1
  JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
)"""


def sql_triangles() -> str:
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {VERTS_CTE}, {_TRI_CTE},
members AS (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnts AS (SELECT vid, CAST(count(*) AS BIGINT) AS triangles FROM members GROUP BY vid)
SELECT v.vid, CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles
FROM verts v LEFT JOIN cnts c ON v.vid = c.vid"""


def sql_triangle_total() -> str:
    return f"WITH {EDGES_CTE}, {_TRI_CTE} SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri"


def sql_transitivity() -> str:
    """Global transitivity 3T/wedges — matches
    linkgraph.algos.triangles.transitivity (per-row integer division
    for the wedge tally, one final division)."""
    return f"""WITH {EDGES_CTE}, {DEG_CTE}, {_TRI_CTE},
tt AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri),
wd AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
SELECT n_triangles, n_wedges,
       CASE WHEN n_wedges = 0 THEN NULL
            ELSE round(3.0 * n_triangles / n_wedges, 6) END AS transitivity
FROM tt, wd"""


def sql_rich_club() -> str:
    """Rich-club curve — matches linkgraph.algos.projection.rich_club
    (suffix sums over the merged degree/min-endpoint histograms)."""
    return f"""WITH {EDGES_CTE}, {DEG_CTE},
dh AS (SELECT degree, CAST(count(*) AS BIGINT) AS n FROM deg GROUP BY degree),
eh AS (
  SELECT least(ds.degree, dd.degree) AS degree, CAST(count(*) AS BIGINT) AS m
  FROM e JOIN deg ds ON e.src = ds.vid JOIN deg dd ON e.dst = dd.vid
  GROUP BY 1
),
hist AS (
  SELECT dh.degree, dh.n, CAST(coalesce(eh.m, 0) AS BIGINT) AS m
  FROM dh LEFT JOIN eh ON dh.degree = eh.degree
),
cum AS (
  SELECT degree AS k,
         CAST(sum(n) OVER w - n AS BIGINT) AS n_rich,
         CAST(sum(m) OVER w - m AS BIGINT) AS e_rich
  FROM hist
  WINDOW w AS (ORDER BY degree DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT k, n_rich, e_rich,
       CASE WHEN n_rich < 2 THEN NULL
            ELSE round(2.0 * e_rich / (n_rich * (n_rich - 1)), 6) END AS rich_club
FROM cum"""


def sql_avg_neighbor_degree() -> str:
    """k_nn(k) degree-correlation curve — matches
    linkgraph.algos.projection.avg_neighbor_degree (dart-weighted,
    integer sums until one division)."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE}
SELECT ds.degree AS k,
       CAST(count(*) AS BIGINT) AS n_darts,
       round(sum(dd.degree) * 1.0 / count(*), 6) AS knn_mean
FROM sym s JOIN deg ds ON s.src = ds.vid JOIN deg dd ON s.dst = dd.vid
GROUP BY ds.degree"""


def sql_powerlaw_alpha() -> str:
    """Continuous power-law MLE exponent over the degree histogram —
    matches queries.q_powerlaw_alpha (α = 1 + n/Σ cnt·ln d)."""
    return f"""WITH {EDGES_CTE}, {DEG_CTE},
dh AS (SELECT degree, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY degree)
SELECT CAST(sum(cnt) AS BIGINT) AS n_vertices,
       CASE WHEN sum(cnt * ln(degree)) = 0 THEN NULL
            ELSE round(1.0 + sum(cnt) / sum(cnt * ln(degree)), 6) END AS alpha
FROM dh"""


def sql_degree_topk() -> str:
    return f"""WITH {EDGES_CTE}, {DEG_CTE},
ranked AS (
  SELECT vid, degree,
         CAST(row_number() OVER (ORDER BY degree DESC, vid ASC) AS BIGINT) AS rnk
  FROM deg
)
SELECT vid, degree, rnk FROM ranked WHERE rnk <= 20"""


def sql_events_windowed() -> str:
    return """SELECT date_trunc('hour', ts) AS hour, event_type,
  CAST(count(*) AS BIGINT) AS n,
  round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def sql_events_sessionize() -> str:
    return """WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN epoch(ts) - lag(epoch(ts), 1, 0) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events FROM sess GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(max(n_events) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id"""


EVENTS_EDGES_CTE = """ee AS MATERIALIZED (
  SELECT DISTINCT a.user_id AS src, b.user_id AS dst
  FROM (SELECT date_trunc('hour', ts) AS hour, event_type, user_id FROM events) a
  JOIN (SELECT date_trunc('hour', ts) AS hour, event_type, user_id FROM events) b
    ON a.hour = b.hour AND a.event_type = b.event_type AND a.user_id < b.user_id
)"""


def sql_edges_events() -> str:
    return f"WITH {EVENTS_EDGES_CTE} SELECT src, dst FROM ee"


def sql_events_graph_components(iters: int = 6) -> str:
    parts = [
        EVENTS_EDGES_CTE,
        "sym AS MATERIALIZED (SELECT src, dst FROM ee UNION ALL SELECT dst, src FROM ee)",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM sym)",
        "l0 AS (SELECT vid, vid AS component FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT vid, min(component) AS component FROM (
    SELECT s.dst AS vid, l.component FROM sym s JOIN l{i - 1} l ON s.src = l.vid
    UNION ALL
    SELECT vid, component FROM l{i - 1}
  ) GROUP BY vid
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, component FROM l{iters}"


def sql_vertex_masters() -> str:
    """Vertex-master election over the hash assignment: the partition
    holding most of each vertex's edges (ties → lowest id)."""
    return f"""WITH {EDGES_CTE},
pa AS MATERIALIZED (SELECT src, dst, {_ASSIGN['hash']} AS partition FROM e),
ends AS (
  SELECT src AS vid, partition FROM pa UNION ALL SELECT dst, partition FROM pa
),
per AS (SELECT vid, partition, count(*) AS c FROM ends GROUP BY 1, 2)
SELECT vid, partition AS master FROM (
  SELECT vid, partition,
         row_number() OVER (PARTITION BY vid ORDER BY c DESC, partition ASC) AS rn
  FROM per
) WHERE rn = 1"""


def sql_k_core(k: int = 65, iters: int = 8) -> str:
    """Unrolled degree-peel: a_i = vertices of a_{i-1} with induced
    degree >= k (matches linkgraph.algos.kcore.k_core at
    fixed_iterations=iters; converges well inside 8 rounds at both
    gate scales — measured peel depths 2-6)."""
    parts = [EDGES_CTE, SYM_CTE, VERTS_CTE,
             "a0 AS MATERIALIZED (SELECT vid FROM verts)"]
    for i in range(1, iters + 1):
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT s.src AS vid, CAST(count(*) AS BIGINT) AS cd
  FROM sym s JOIN a{i-1} x ON s.src = x.vid JOIN a{i-1} y ON s.dst = y.vid
  GROUP BY s.src
)"""
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vid, cd FROM d{i} WHERE cd >= {k})"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT vid, cd AS core_degree FROM a{iters}"
    )


def sql_adamic_adar(top: int = 20, cap: int = 10000) -> str:
    """Wedge enumeration + 1/ln(center degree) sum, existing edges
    anti-joined, ordered by (rounded score desc, u, w) — matches
    linkgraph.algos.linkpred.adamic_adar_topk."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE},
ctr AS MATERIALIZED (
  SELECT vid, degree FROM deg WHERE degree >= 2 AND degree <= {cap}
),
za AS MATERIALIZED (
  SELECT s.src AS z, s.dst AS u, c.degree AS dz
  FROM sym s JOIN ctr c ON s.src = c.vid
),
wedge AS MATERIALIZED (
  SELECT a.u AS u, b.u AS w, a.dz AS dz
  FROM za a JOIN za b ON a.z = b.z AND a.u < b.u
),
cand AS MATERIALIZED (
  SELECT wg.u, wg.w, wg.dz FROM wedge wg
  LEFT JOIN e ON wg.u = e.src AND wg.w = e.dst
  WHERE e.src IS NULL
),
sc AS (
  SELECT u, w, round(sum(1.0 / ln(dz)), 6) AS aa_score
  FROM cand GROUP BY u, w
)
SELECT u, w, aa_score FROM sc
ORDER BY aa_score DESC, u ASC, w ASC LIMIT {top}"""


def sql_degree_histogram() -> str:
    return f"""WITH {EDGES_CTE}, {DEG_CTE}
SELECT CAST(floor(log2(degree)) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_vertices
FROM deg GROUP BY 1"""


def sql_assortativity() -> str:
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE}
SELECT round(corr(a.degree, b.degree), 6) AS assortativity,
       CAST(count(*) AS BIGINT) AS n_darts
FROM sym s JOIN deg a ON s.src = a.vid JOIN deg b ON s.dst = b.vid"""


def sql_random_walks(walk_len: int = 4, seed: int = 985) -> str:
    """Unrolled walk steps; step hash = md5 portable form, argmin via
    row_number (ties by dst asc) — matches
    linkgraph.algos.walks.random_walks exactly."""
    parts = [EDGES_CTE, SYM_CTE, VERTS_CTE,
             "f0 AS MATERIALIZED (SELECT vid AS start_vid, vid FROM verts)"]
    sel = ["SELECT start_vid, CAST(0 AS BIGINT) AS step, vid FROM f0"]
    for s in range(1, walk_len + 1):
        h = (
            "(('0x' || substr(md5(CAST(s.src AS VARCHAR) || ':' || "
            f"CAST({s} AS VARCHAR) || ':' || CAST(s.dst AS VARCHAR) || "
            f"':' || CAST({seed} AS VARCHAR)), 1, 8))::BIGINT)"
        )
        parts.append(
            f"""f{s} AS MATERIALIZED (
  SELECT start_vid, dst AS vid FROM (
    SELECT f.start_vid, s.dst,
           row_number() OVER (
             PARTITION BY f.start_vid ORDER BY {h}, s.dst
           ) AS rn
    FROM f{s-1} f JOIN sym s ON f.vid = s.src
  ) WHERE rn = 1
)"""
        )
        sel.append(
            f"SELECT start_vid, CAST({s} AS BIGINT) AS step, vid FROM f{s}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def sql_bfs_distances(sources=(1, 2), iters: int = 8) -> str:
    """Unrolled multi-source BFS (integer min — exact); matches
    linkgraph.algos.bfs.bfs_distances at fixed_iterations=iters."""
    src_vals = ", ".join(f"({s}, 0)" for s in sources)
    parts = [EDGES_CTE, SYM_CTE,
             f"b0(vid, dist) AS MATERIALIZED (VALUES {src_vals})"]
    for i in range(1, iters + 1):
        parts.append(
            f"""b{i} AS MATERIALIZED (
  SELECT vid, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT s.dst AS vid, b.dist + 1 AS dist
    FROM b{i-1} b JOIN sym s ON b.vid = s.src
    UNION ALL
    SELECT vid, dist FROM b{i-1}
  ) GROUP BY vid
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, dist FROM b{iters}"


def sql_dense_vertex_ids() -> str:
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {VERTS_CTE}
SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS idx
FROM verts"""


def sql_negative_samples(n_neg: int = 3, n_prop: int = 8, seed: int = 985) -> str:
    """Mirror of linkgraph.algos.linkpred.negative_samples over the
    dense-rank definition (row_number − 1) + the portable md5 hash."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {VERTS_CTE},
d AS MATERIALIZED (
  SELECT vid, CAST(row_number() OVER (ORDER BY vid) - 1 AS BIGINT) AS idx
  FROM verts
),
n AS MATERIALIZED (SELECT count(*) AS n FROM verts),
props AS MATERIALIZED (
  SELECT d.vid AS u, i.i AS i,
         (('0x' || substr(md5(CAST(d.vid AS VARCHAR) || ':' ||
            CAST(i.i AS VARCHAR) || ':' || CAST({seed} AS VARCHAR)), 1, 8)
          )::BIGINT) % (SELECT n FROM n) AS idx
  FROM d, (SELECT unnest(generate_series(1, {n_prop})) AS i) i
),
cand AS MATERIALIZED (
  SELECT p.u, p.i, d.vid AS neg_vid
  FROM props p JOIN d ON p.idx = d.idx
  WHERE d.vid <> p.u
),
nonedge AS MATERIALIZED (
  SELECT c.u, c.i, c.neg_vid FROM cand c
  LEFT JOIN sym s ON c.u = s.src AND c.neg_vid = s.dst
  WHERE s.src IS NULL
)
SELECT u, neg_vid, rnk FROM (
  SELECT u, neg_vid,
         CAST(row_number() OVER (PARTITION BY u ORDER BY i) AS BIGINT) AS rnk
  FROM nonedge
) WHERE rnk <= {n_neg}"""


def sql_clustering() -> str:
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {VERTS_CTE}, {DEG_CTE}, {_TRI_CTE},
members AS (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
),
cnts AS (SELECT vid, CAST(count(*) AS BIGINT) AS triangles FROM members GROUP BY vid)
SELECT v.vid, CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles, d.degree,
       CASE WHEN d.degree < 2 THEN 0.0
            ELSE round(2.0 * coalesce(c.triangles, 0)
                       / (d.degree * (d.degree - 1.0)), 6) END AS lcc
FROM verts v LEFT JOIN cnts c ON v.vid = c.vid JOIN deg d ON v.vid = d.vid"""


EVENTS_WEDGES_CTE = """we AS MATERIALIZED (
  SELECT a.user_id AS src, b.user_id AS dst, CAST(count(*) AS BIGINT) AS weight
  FROM (SELECT date_trunc('hour', ts) AS hour, event_type, user_id FROM events) a
  JOIN (SELECT date_trunc('hour', ts) AS hour, event_type, user_id FROM events) b
    ON a.hour = b.hour AND a.event_type = b.event_type AND a.user_id < b.user_id
  GROUP BY a.user_id, b.user_id
)"""


def sql_edges_events_weighted() -> str:
    return f"WITH {EVENTS_WEDGES_CTE} SELECT src, dst, weight FROM we"


def sql_pagerank_weighted(iters: int = 5, d: float = 0.85) -> str:
    """Mirror of linkgraph.algos.pagerank.pagerank_weighted over the
    weighted events interaction graph."""
    parts = [
        EVENTS_WEDGES_CTE,
        "wsym AS MATERIALIZED (SELECT src, dst, weight FROM we UNION ALL SELECT dst, src, weight FROM we)",
        "wverts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM wsym)",
        "wn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM wverts)",
        "ow AS (SELECT src AS vid, sum(weight) AS outw FROM wsym GROUP BY src)",
        "wr0 AS (SELECT vid, 1.0 / (SELECT n FROM wn) AS rank FROM wverts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""wr{i} AS MATERIALIZED (
  SELECT s.dst AS vid,
         (1.0 - {d}) / (SELECT n FROM wn) + {d} * sum(r.rank * s.weight / o.outw) AS rank
  FROM wsym s JOIN wr{i - 1} r ON s.src = r.vid JOIN ow o ON s.src = o.vid
  GROUP BY s.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(rank, 6) AS rank FROM wr{iters}"
    )


_N2V_BIG = 1 << 33  # > any 32-bit md5-prefix ticket


def _n2v_hash(s: int, j: int, seed: int) -> str:
    return (
        "(('0x' || substr(md5(CAST(cur AS VARCHAR) || ':' || "
        f"CAST({s} AS VARCHAR) || ':' || CAST(dst AS VARCHAR) || ':' || "
        f"CAST({j} AS VARCHAR) || ':' || CAST({seed} AS VARCHAR)), 1, 8))::BIGINT)"
    )


def sql_node2vec(walk_len: int = 3, seed: int = 985) -> str:
    """Mirror of linkgraph.algos.walks.node2vec_walks: lottery-ticket
    weighted choice (weights 1/2/4 for return/common/far), argmin via
    row_number (ties by dst) — integer md5 arithmetic only."""
    parts = [
        EDGES_CTE, SYM_CTE, VERTS_CTE,
        "n0 AS MATERIALIZED (SELECT vid AS start_vid, vid AS prev, vid FROM verts)",
    ]
    sel = ["SELECT start_vid, CAST(0 AS BIGINT) AS step, vid FROM n0"]
    for s in range(1, walk_len + 1):
        if s == 1:
            key = _n2v_hash(1, 0, seed)
            inner = """
      SELECT f.start_vid, f.vid AS cur, s.dst, 1 AS w
      FROM n0 f JOIN sym s ON f.vid = s.src"""
        else:
            key = (
                f"least({_n2v_hash(s, 0, seed)}, "
                f"CASE WHEN w >= 2 THEN {_n2v_hash(s, 1, seed)} ELSE {_N2V_BIG} END, "
                f"CASE WHEN w >= 4 THEN {_n2v_hash(s, 2, seed)} ELSE {_N2V_BIG} END, "
                f"CASE WHEN w >= 4 THEN {_n2v_hash(s, 3, seed)} ELSE {_N2V_BIG} END)"
            )
            inner = f"""
      SELECT f.start_vid, f.vid AS cur, s.dst,
             CASE WHEN s.dst = f.prev THEN 1
                  WHEN c.src IS NOT NULL THEN 2 ELSE 4 END AS w
      FROM n{s - 1} f
      JOIN sym s ON f.vid = s.src
      LEFT JOIN sym c ON c.src = f.prev AND c.dst = s.dst"""
        parts.append(
            f"""n{s} AS MATERIALIZED (
  SELECT start_vid, prev, vid FROM (
    SELECT start_vid, cur AS prev, dst AS vid,
           row_number() OVER (PARTITION BY start_vid ORDER BY {key}, dst) AS rn
    FROM ({inner}
    )
  ) WHERE rn = 1
)"""
        )
        sel.append(
            f"SELECT start_vid, CAST({s} AS BIGINT) AS step, vid FROM n{s}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def sql_pagerank_personalized(
    seeds=(1, 2), iters: int = 5, d: float = 0.85
) -> str:
    """Mirror of linkgraph.algos.pagerank.pagerank_personalized."""
    seed_list = ", ".join(str(s) for s in sorted(set(seeds)))
    n_seeds = len(set(seeds))
    e_s = f"CASE WHEN vid IN ({seed_list}) THEN 1.0 / {n_seeds} ELSE 0.0 END"
    parts = [
        EDGES_CTE,
        SYM_CTE,
        VERTS_CTE,
        "odeg AS (SELECT src AS vid, CAST(count(*) AS DOUBLE) AS outdeg FROM sym GROUP BY src)",
        f"p0 AS (SELECT vid, {e_s} AS rank FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT v.vid,
         (1.0 - {d}) * ({e_s.replace('vid', 'v.vid')})
         + coalesce(f.flow, 0.0) AS rank
  FROM verts v LEFT JOIN (
    SELECT s.dst AS vid, {d} * sum(r.rank / o.outdeg) AS flow
    FROM sym s JOIN p{i - 1} r ON s.src = r.vid JOIN odeg o ON s.src = o.vid
    GROUP BY s.dst
  ) f ON v.vid = f.vid
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(rank, 6) AS rank FROM p{iters}"
    )


def sql_jaccard(top: int = 20, cap: int = 10000) -> str:
    """Mirror of linkgraph.algos.linkpred.jaccard_topk (same wedge
    machinery and hub-center cap as sql_adamic_adar)."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE},
ctr AS MATERIALIZED (
  SELECT vid FROM deg WHERE degree >= 2 AND degree <= {cap}
),
za AS MATERIALIZED (
  SELECT s.src AS z, s.dst AS u FROM sym s JOIN ctr c ON s.src = c.vid
),
wedge AS MATERIALIZED (
  SELECT a.u AS u, b.u AS w FROM za a JOIN za b ON a.z = b.z AND a.u < b.u
),
cand AS MATERIALIZED (
  SELECT wg.u, wg.w FROM wedge wg
  LEFT JOIN e ON wg.u = e.src AND wg.w = e.dst
  WHERE e.src IS NULL
),
cm AS (SELECT u, w, count(*) AS common FROM cand GROUP BY u, w)
SELECT cm.u, cm.w,
       round(CAST(cm.common AS DOUBLE) / (du.degree + dw.degree - cm.common), 6) AS jaccard
FROM cm JOIN deg du ON cm.u = du.vid JOIN deg dw ON cm.w = dw.vid
ORDER BY jaccard DESC, cm.u ASC, cm.w ASC LIMIT {top}"""


def sql_graph_summary() -> str:
    return f"""WITH {EDGES_CTE}, {DEG_CTE},
m AS (SELECT count(*) AS m_edges FROM e)
SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       CAST((SELECT m_edges FROM m) AS BIGINT) AS m_edges,
       CAST(max(degree) AS BIGINT) AS max_degree,
       CAST(min(degree) AS BIGINT) AS min_degree,
       round(avg(degree), 6) AS avg_degree
FROM deg"""


def sql_vertex_strength() -> str:
    return f"""WITH {EVENTS_WEDGES_CTE},
wsym AS (SELECT src, dst, weight FROM we UNION ALL SELECT dst, src, weight FROM we)
SELECT src AS vid, CAST(count(*) AS BIGINT) AS degree,
       CAST(sum(weight) AS BIGINT) AS strength
FROM wsym GROUP BY src"""


def sql_label_propagation_weighted(iters: int = 4) -> str:
    """Mirror of linkgraph.algos.lpa.label_propagation_weighted."""
    parts = [
        EVENTS_WEDGES_CTE,
        "wsym AS MATERIALIZED (SELECT src, dst, weight FROM we UNION ALL SELECT dst, src, weight FROM we)",
        "wverts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM wsym)",
        "wl0 AS (SELECT vid, vid AS label FROM wverts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""wl{i} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label,
           row_number() OVER (PARTITION BY vid ORDER BY wsum DESC, label ASC) AS rn
    FROM (
      SELECT s.dst AS vid, l.label, CAST(sum(s.weight) AS BIGINT) AS wsum
      FROM wsym s JOIN wl{i - 1} l ON s.src = l.vid
      GROUP BY s.dst, l.label
    )
  ) WHERE rn = 1
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, label FROM wl{iters}"


# directed order-sequence graph (mirror of
# linkgraph.graph.directed_edges_from_lineitem, back_mod=64) ------------

DIRECTED_CTE = """dn AS (
  SELECT pk, lead(pk) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, pk) AS nxt
  FROM (SELECT l_orderkey, l_linenumber, CAST(l_partkey AS BIGINT) AS pk FROM lineitem)
),
de AS MATERIALIZED (
  SELECT DISTINCT pk AS src, nxt AS dst FROM dn
  WHERE nxt IS NOT NULL AND nxt <> pk
    AND (pk < nxt
         OR (('0x' || substr(md5(CAST(pk AS VARCHAR) || ':' || CAST(nxt AS VARCHAR) || ':scc'), 1, 8))::BIGINT % 64) = 0)
)"""


def _landmark_bfs_parts(landmarks, iters: int) -> list:
    """Unrolled keyed landmark-BFS CTE chain (hd0..hd{iters}) shared
    by the harmonic-centrality and distance-histogram oracles."""
    lm_vals = ", ".join(f"({s}, {s}, 0)" for s in landmarks)
    parts = [EDGES_CTE, SYM_CTE,
             f"hd0(lm, vid, dist) AS MATERIALIZED (VALUES {lm_vals})"]
    for i in range(1, iters + 1):
        parts.append(
            f"""hd{i} AS MATERIALIZED (
  SELECT lm, vid, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT b.lm, s.dst AS vid, b.dist + 1 AS dist
    FROM hd{i-1} b JOIN sym s ON b.vid = s.src
    UNION ALL
    SELECT lm, vid, dist FROM hd{i-1}
  ) GROUP BY lm, vid
)"""
        )
    return parts


def sql_harmonic_centrality(landmarks=(1, 2, 3, 5), iters: int = 8) -> str:
    """Mirror of linkgraph.algos.bfs.harmonic_centrality: unrolled
    keyed landmark BFS (integer min — exact), then the 1/d sum rounded
    to 6 decimals on both sides."""
    parts = _landmark_bfs_parts(landmarks, iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT vid, round(sum(1.0 / dist), 6) AS harmonic
FROM hd{iters} WHERE dist > 0 GROUP BY vid"""
    )


def sql_distance_histogram(landmarks=(1, 2, 3, 5), iters: int = 8) -> str:
    """Mirror of linkgraph.algos.bfs.distance_histogram: the same
    landmark-BFS chain grouped into a (dist, n_pairs, cum_share)
    distribution; the window total runs in fixed dist order on both
    sides."""
    parts = _landmark_bfs_parts(landmarks, iters)
    return (
        "WITH " + ",\n".join(parts)
        + f""",
hist AS MATERIALIZED (
  SELECT dist, CAST(count(*) AS BIGINT) AS n_pairs
  FROM hd{iters} GROUP BY dist
)
SELECT dist, n_pairs,
       round(sum(n_pairs) OVER (ORDER BY dist) * 1.0 /
             sum(n_pairs) OVER (ORDER BY dist ROWS BETWEEN UNBOUNDED
                                PRECEDING AND UNBOUNDED FOLLOWING), 6)
         AS cum_share
FROM hist"""
    )


def sql_eccentricity_lb(landmarks=(1, 2, 3, 5), iters: int = 8) -> str:
    """Mirror of linkgraph.algos.bfs.eccentricity_lb: the shared
    landmark-BFS chain aggregated to a per-vertex integer max."""
    parts = _landmark_bfs_parts(landmarks, iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT vid, CAST(count(*) AS BIGINT) AS n_landmarks,
       CAST(max(dist) AS BIGINT) AS ecc_lb
FROM hd{iters} GROUP BY vid"""
    )


def sql_hits(iters: int = PR_ITERS) -> str:
    """Mirror of linkgraph.algos.hits.hits over the directed
    order-sequence graph: per half-step join + sum + L1
    normalization, zeros restored over the vertex set at the end."""
    parts = [
        DIRECTED_CTE,
        "hv AS MATERIALIZED (SELECT src AS vid FROM de UNION SELECT dst FROM de)",
        "hh0 AS (SELECT DISTINCT src AS vid, 1.0 AS hub FROM de)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""ha{i}r AS MATERIALIZED (
  SELECT d.dst AS vid, sum(h.hub) AS auth
  FROM de d JOIN hh{i-1} h ON d.src = h.vid GROUP BY d.dst
)"""
        )
        parts.append(
            f"ha{i} AS MATERIALIZED (SELECT vid, auth / (SELECT sum(auth) FROM ha{i}r) AS auth FROM ha{i}r)"
        )
        parts.append(
            f"""hh{i}r AS MATERIALIZED (
  SELECT d.src AS vid, sum(a.auth) AS hub
  FROM de d JOIN ha{i} a ON d.dst = a.vid GROUP BY d.src
)"""
        )
        parts.append(
            f"hh{i} AS MATERIALIZED (SELECT vid, hub / (SELECT sum(hub) FROM hh{i}r) AS hub FROM hh{i}r)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT v.vid, round(coalesce(a.auth, 0), 6) AS auth,
       round(coalesce(h.hub, 0), 6) AS hub
FROM hv v LEFT JOIN ha{iters} a ON v.vid = a.vid
LEFT JOIN hh{iters} h ON v.vid = h.vid"""
    )


def sql_k_truss(k: int = 10, rounds: int = 10) -> str:
    """Mirror of linkgraph.algos.truss.k_truss: per round enumerate
    triangles a<b<c over the surviving canonical edge set (identical
    to the degree-oriented Spark enumeration — same set, different
    order), count per-edge support, keep supp >= k-2."""
    parts = [EDGES_CTE, "ke0 AS MATERIALIZED (SELECT src, dst FROM e)"]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""kt{i} AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ke{p} e1 JOIN ke{p} e2 ON e1.dst = e2.src
  JOIN ke{p} e3 ON e3.src = e1.src AND e3.dst = e2.dst
)"""
        )
        parts.append(
            f"""ks{i} AS MATERIALIZED (
  SELECT src, dst, count(*) AS supp FROM (
    SELECT a AS src, b AS dst FROM kt{i}
    UNION ALL SELECT a AS src, c AS dst FROM kt{i}
    UNION ALL SELECT b AS src, c AS dst FROM kt{i}
  ) GROUP BY src, dst
)"""
        )
        parts.append(
            f"""ke{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM ke{p} e
  JOIN ks{i} s ON e.src = s.src AND e.dst = s.dst
  WHERE s.supp >= {k - 2}
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT src, dst FROM ke{rounds}"


def sql_betweenness(landmarks=(1, 2, 3, 5), depth: int = 5) -> str:
    """Mirror of linkgraph.algos.betweenness.betweenness_landmark:
    unrolled level-synchronous Brandes (forward sigma levels, backward
    dependency accumulation deepest-first)."""
    lm_vals = ", ".join(f"({s}, {s}, 0, 1.0)" for s in landmarks)
    parts = [
        EDGES_CTE,
        SYM_CTE,
        f"bl0(lm, vid, dist, sigma) AS MATERIALIZED (VALUES {lm_vals})",
        "bv0 AS (SELECT lm, vid, CAST(dist AS BIGINT) AS dist, CAST(sigma AS DOUBLE) AS sigma FROM bl0)",
    ]
    for i in range(1, depth + 1):
        parts.append(
            f"""bl{i} AS MATERIALIZED (
  SELECT t.lm, t.vid, CAST({i} AS BIGINT) AS dist, t.sigma FROM (
    SELECT b.lm, s.dst AS vid, sum(b.sigma) AS sigma
    FROM bl{i-1} b JOIN sym s ON b.vid = s.src
    GROUP BY b.lm, s.dst
  ) t LEFT JOIN bv{i-1} v ON v.lm = t.lm AND v.vid = t.vid
  WHERE v.vid IS NULL
)"""
        )
        parts.append(
            f"bv{i} AS MATERIALIZED (SELECT * FROM bv{i-1} UNION ALL SELECT * FROM bl{i})"
        )
    parts.append(
        f"bdel{depth + 1} AS (SELECT lm, vid, CAST(0 AS DOUBLE) AS delta FROM bv{depth})"
    )
    for d in range(depth, 0, -1):
        parts.append(
            f"""bctr{d} AS MATERIALIZED (
  SELECT w.lm, p.vid AS vid, sum((p.sigma / w.sigma) * (1 + dl.delta)) AS c
  FROM bv{depth} w
  JOIN bdel{d + 1} dl ON dl.lm = w.lm AND dl.vid = w.vid
  JOIN sym s ON w.vid = s.src
  JOIN bv{depth} p ON p.lm = w.lm AND p.vid = s.dst AND p.dist = w.dist - 1
  WHERE w.dist = {d}
  GROUP BY w.lm, p.vid
)"""
        )
        parts.append(
            f"""bdel{d} AS MATERIALIZED (
  SELECT dl.lm, dl.vid, dl.delta + coalesce(c.c, 0) AS delta
  FROM bdel{d + 1} dl LEFT JOIN bctr{d} c ON c.lm = dl.lm AND c.vid = dl.vid
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT d.vid, round(sum(d.delta), 6) AS betweenness
FROM bdel1 d JOIN bv{depth} v ON v.lm = d.lm AND v.vid = d.vid
WHERE v.dist > 0 GROUP BY d.vid"""
    )


def sql_sssp_weighted(sources=(0, 1), iters: int = 8) -> str:
    """Mirror of linkgraph.algos.sssp.sssp_weighted over the weighted
    interaction graph (integer min-plus — exact at fixed rounds)."""
    src_vals = ", ".join(f"({s}, 0)" for s in sources)
    parts = [
        EVENTS_WEDGES_CTE,
        "wsym2 AS MATERIALIZED (SELECT src, dst, weight FROM we UNION ALL SELECT dst, src, weight FROM we)",
        f"sp0(vid, cost) AS MATERIALIZED (VALUES {src_vals})",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""sp{i} AS MATERIALIZED (
  SELECT vid, CAST(min(cost) AS BIGINT) AS cost FROM (
    SELECT s.dst AS vid, b.cost + s.weight AS cost
    FROM sp{i-1} b JOIN wsym2 s ON b.vid = s.src
    UNION ALL
    SELECT vid, cost FROM sp{i-1}
  ) GROUP BY vid
)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, cost FROM sp{iters}"


def sql_common_neighbors(top: int = 20, cap: int = 10000) -> str:
    """Mirror of linkgraph.algos.linkpred.common_neighbor_scores —
    the adamic-adar wedge machinery with three scores in one pass:
    integer CN count, resource-allocation sum (1/deg, rounded 6dp
    after the full sum), preferential-attachment degree product."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE},
ctr AS MATERIALIZED (
  SELECT vid, degree FROM deg WHERE degree >= 2 AND degree <= {cap}
),
za AS MATERIALIZED (
  SELECT s.src AS z, s.dst AS u, c.degree AS dz
  FROM sym s JOIN ctr c ON s.src = c.vid
),
wedge AS MATERIALIZED (
  SELECT a.u AS u, b.u AS w, a.dz AS dz
  FROM za a JOIN za b ON a.z = b.z AND a.u < b.u
),
cand AS MATERIALIZED (
  SELECT wg.u, wg.w, wg.dz FROM wedge wg
  LEFT JOIN e ON wg.u = e.src AND wg.w = e.dst
  WHERE e.src IS NULL
),
sc AS (
  SELECT u, w, CAST(count(*) AS BIGINT) AS cn,
         round(sum(1.0 / dz), 6) AS ra_score
  FROM cand GROUP BY u, w
)
SELECT sc.u, sc.w, sc.cn, sc.ra_score,
       CAST(du.degree * dw.degree AS BIGINT) AS pa_score
FROM sc JOIN deg du ON sc.u = du.vid JOIN deg dw ON sc.w = dw.vid
ORDER BY sc.cn DESC, sc.u ASC, sc.w ASC LIMIT {top}"""


def _mis_priority(col: str, seed: int) -> str:
    """60-bit engine-portable priority — DuckDB twin of
    linkgraph.algos.mis._priority (15 hex digits of md5)."""
    return f"('0x' || substr(md5({col} || ':' || {seed}), 1, 15))::BIGINT"


def _mis_rounds(iters: int, seed: int, remove_neighbors: bool) -> list[str]:
    """Shared unrolled-CTE chain for MIS (winners + neighbors leave)
    and local-min coloring (only winners leave) — matches
    linkgraph.algos.mis round-for-round."""
    parts = [
        EDGES_CTE, SYM_CTE, VERTS_CTE,
        f"act0 AS MATERIALIZED (SELECT vid, {_mis_priority('vid', seed)} AS h "
        "FROM verts)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""nm{i} AS MATERIALIZED (
  SELECT s.dst AS vid, MIN(ah.h) AS nbr_h
  FROM sym s JOIN act{i-1} ah ON s.src = ah.vid
             JOIN act{i-1} ad ON s.dst = ad.vid
  GROUP BY s.dst
)"""
        )
        parts.append(
            f"""win{i} AS MATERIALIZED (
  SELECT a.vid FROM act{i-1} a LEFT JOIN nm{i} n ON a.vid = n.vid
  WHERE n.nbr_h IS NULL OR a.h < n.nbr_h
)"""
        )
        drop_nbrs = (
            f"  AND a.vid NOT IN (SELECT s.dst FROM sym s "
            f"JOIN win{i} w ON s.src = w.vid)"
            if remove_neighbors
            else ""
        )
        parts.append(
            f"""act{i} AS MATERIALIZED (
  SELECT a.vid, a.h FROM act{i-1} a
  WHERE a.vid NOT IN (SELECT vid FROM win{i}){drop_nbrs}
)"""
        )
    return parts


def sql_mis(iters: int = 16, seed: int = 985) -> str:
    """Greedy (static-priority) maximal independent set — matches
    linkgraph.algos.mis.maximal_independent_set at
    fixed_iterations=iters (measured convergence: 4 rounds at
    sf0.001, 8 at sf0.01; 16 gives headroom — converged rounds emit
    empty win CTEs on both sides)."""
    parts = _mis_rounds(iters, seed, remove_neighbors=True)
    union = "\nUNION ALL\n".join(
        f"SELECT vid, {i} AS mis_round FROM win{i}" for i in range(1, iters + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


def sql_coloring(iters: int = 12, seed: int = 985) -> str:
    """Local-min (Jones-Plassmann round-number) coloring, first
    `iters` rounds — matches linkgraph.algos.mis.greedy_coloring at
    fixed_iterations=iters, allow_partial=True (the co-occurrence
    graph is near-clique dense, so 12 rounds color a prefix; the
    check is an exact value-match of 12 kernel rounds)."""
    parts = _mis_rounds(iters, seed, remove_neighbors=False)
    union = "\nUNION ALL\n".join(
        f"SELECT vid, {i} AS color FROM win{i}" for i in range(1, iters + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + union


def sql_reciprocity() -> str:
    """Directed order-sequence graph census — matches
    linkgraph.algos.projection.reciprocity over
    graph.directed_edges_from_lineitem (shares DIRECTED_CTE with the
    hits/scc oracles — one SQL mirror of the directed derivation)."""
    return f"""WITH {DIRECTED_CTE},
flg AS MATERIALIZED (
  SELECT a.src, a.dst, CASE WHEN b.src IS NULL THEN 0 ELSE 1 END AS has_rev
  FROM de a LEFT JOIN de b ON a.src = b.dst AND a.dst = b.src
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(has_rev) AS BIGINT) AS n_mutual,
       round(sum(has_rev) * 1.0 / count(*), 6) AS reciprocity
FROM flg"""


def _co_purchase_parts(hub_cap: int) -> str:
    """Shared CTE chain: customer-part incidence → hub-cap filter →
    projected co-purchase edge list cpe(u, w, weight)."""
    return f"""inc AS MATERIALIZED (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS l,
                  CAST(li.l_partkey AS BIGINT) AS r
  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey
),
fan AS MATERIALIZED (SELECT r FROM inc GROUP BY r HAVING count(*) <= {hub_cap}),
kept AS MATERIALIZED (SELECT i.l, i.r FROM inc i JOIN fan f ON i.r = f.r),
cpe AS MATERIALIZED (
  SELECT a.l AS u, b.l AS w, CAST(count(*) AS BIGINT) AS weight
  FROM kept a JOIN kept b ON a.r = b.r AND a.l < b.l
  GROUP BY a.l, b.l
)"""


def sql_co_purchase(hub_cap: int = 40, top: int = 200) -> str:
    """Customer co-purchase bipartite projection (hub-capped), top
    pairs by weight — matches
    linkgraph.algos.projection.co_purchase_edges."""
    return (
        f"WITH {_co_purchase_parts(hub_cap)}\n"
        "SELECT u, w, weight FROM cpe\n"
        f"ORDER BY weight DESC, u ASC, w ASC LIMIT {top}"
    )


def sql_nation_assortativity(hub_cap: int = 40) -> str:
    """Categorical assortativity of the co-purchase graph by customer
    nation — matches linkgraph.algos.projection.attribute_assortativity
    (integer dart counts until the single final division)."""
    return f"""WITH {_co_purchase_parts(hub_cap)},
cpsym AS MATERIALIZED (
  SELECT u AS src, w AS dst FROM cpe
  UNION ALL
  SELECT w AS src, u AS dst FROM cpe
),
darts AS MATERIALIZED (
  SELECT ca.c_nationkey AS cls_src, cb.c_nationkey AS cls_dst
  FROM cpsym s JOIN customer ca ON s.src = ca.c_custkey
               JOIN customer cb ON s.dst = cb.c_custkey
),
tot AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS t,
         CAST(sum(CASE WHEN cls_src = cls_dst THEN 1 ELSE 0 END) AS BIGINT) AS s
  FROM darts
),
sq AS MATERIALIZED (
  SELECT CAST(sum(c * c) AS BIGINT) AS q FROM (
    SELECT CAST(count(*) AS BIGINT) AS c FROM darts GROUP BY cls_src
  )
)
SELECT CASE WHEN t * t - q = 0 THEN NULL
            ELSE round((s * t - q) * 1.0 / (t * t - q), 6) END
         AS assortativity
FROM tot, sq"""


def sql_subgraph_sample(m: int = 4, salt: str = "sub") -> str:
    """Deterministic induced-subgraph sample — matches
    linkgraph.algos.projection.induced_subgraph."""
    hs = f"('0x' || substr(md5(src || ':{salt}'), 1, 8))::BIGINT % {m}"
    hd = f"('0x' || substr(md5(dst || ':{salt}'), 1, 8))::BIGINT % {m}"
    return (
        f"WITH {EDGES_CTE}\n"
        f"SELECT src, dst FROM e WHERE {hs} = 0 AND {hd} = 0"
    )


def sql_two_hop_sizes(cap: int = 10000) -> str:
    """Exact 2-hop neighborhood sizes (capped wedge centers) — matches
    linkgraph.algos.projection.two_hop_sizes."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE}, {DEG_CTE},
ctr AS MATERIALIZED (
  SELECT vid AS z FROM deg WHERE degree >= 2 AND degree <= {cap}
),
za AS MATERIALIZED (
  SELECT s.src AS z, s.dst AS u FROM sym s JOIN ctr c ON s.src = c.z
),
pairs AS MATERIALIZED (
  SELECT DISTINCT a.u AS u, b.u AS w
  FROM za a JOIN za b ON a.z = b.z AND a.u != b.u
),
far AS MATERIALIZED (
  SELECT p.u, p.w FROM pairs p
  LEFT JOIN sym s ON p.u = s.src AND p.w = s.dst
  WHERE s.src IS NULL
)
SELECT u AS vid, CAST(count(*) AS BIGINT) AS n2 FROM far GROUP BY u"""


def sql_feature_propagation(quant: int = 1_000_000) -> str:
    """One GNN message-passing layer: per-vertex element-wise SUM of
    neighbors' quantized (×quant, rounded) embeddings + neighbor count
    — matches linkgraph.algos.features.feature_propagation (quantize
    first, integer-sum after: order-free, so value-hashable)."""
    return f"""WITH {EDGES_CTE}, {SYM_CTE},
qdims AS MATERIALIZED (
  SELECT CAST(vec_id AS BIGINT) AS fid, pos - 1 AS pos,
         CAST(round(CAST(embedding[pos] AS DOUBLE) * {quant}) AS BIGINT) AS v
  FROM (
    SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS pos
    FROM embeddings
  )
),
ds AS MATERIALIZED (
  SELECT s.dst AS vid, q.pos, sum(q.v) AS sv, count(*) AS n
  FROM sym s JOIN qdims q ON s.src = q.fid
  GROUP BY s.dst, q.pos
)
SELECT vid, CAST(max(n) AS BIGINT) AS n_nbrs,
       array_agg(sv ORDER BY pos) AS feat_sum
FROM ds GROUP BY vid"""


def sql_degree_quantiles() -> str:
    """Nearest-rank degree percentiles from the histogram cumsum —
    matches linkgraph.queries.q_degree_quantiles (integer rank
    arithmetic, (q*n+99)//100)."""
    from linkgraph.queries import DEGREE_QUANTILES

    qlist = ", ".join(str(q) for q in DEGREE_QUANTILES)
    return f"""WITH {EDGES_CTE}, {DEG_CTE},
hist AS MATERIALIZED (
  SELECT degree, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY degree
),
cum AS MATERIALIZED (
  SELECT degree, sum(cnt) OVER (ORDER BY degree) AS cum,
         (SELECT sum(cnt) FROM hist) AS n
  FROM hist
)
SELECT CAST(q AS BIGINT) AS q, CAST(min(degree) AS BIGINT) AS degree
FROM (SELECT unnest([{qlist}]) AS q), cum
WHERE cum >= (q * n + 99) // 100
GROUP BY q"""


def sql_butterflies(hub_cap: int = 40) -> str:
    """Bipartite butterfly census Σ C(weight,2) over the hub-capped
    co-purchase projection — matches
    linkgraph.algos.projection.butterflies."""
    return f"""WITH {_co_purchase_parts(hub_cap)}
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum((weight * (weight - 1)) // 2) AS BIGINT) AS n_butterflies
FROM cpe"""


def sql_topo_levels(depth: int | None = None) -> str:
    """Bounded longest-path layering on the canonical src<dst DAG,
    unrolled as a cumulative-max CTE chain — matches
    linkgraph.algos.dag.topo_levels (frontier-delta relaxation reaches
    the same ≤depth-edge longest-path fixpoint round by round)."""
    from linkgraph.queries import TOPO_DEPTH

    d = depth if depth is not None else TOPO_DEPTH
    parts = [
        EDGES_CTE,
        SYM_CTE,
        VERTS_CTE,
        "l0 AS (SELECT vid, CAST(0 AS BIGINT) AS level FROM verts)",
    ]
    for i in range(1, d + 1):
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT vid, max(level) AS level FROM (
    SELECT vid, level FROM l{i - 1}
    UNION ALL
    SELECT e.dst AS vid, p.level + 1 AS level
    FROM l{i - 1} p JOIN e ON e.src = p.vid
  ) GROUP BY vid
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, CAST(level AS BIGINT) AS level FROM l{d}"
    )


def sql_triangle_estimate() -> str:
    """Sampled triangle estimate (edge kept iff md5-prefix hash mod
    100 < pct; estimator ns·(100/pct)^3) next to the exact count —
    matches linkgraph.algos.triangles.triangle_estimate."""
    from linkgraph.algos.triangles import TRI_SAMPLE_PCT

    pct = TRI_SAMPLE_PCT
    factor = float((100 / pct) ** 3)
    h = ("(('0x' || substr(md5('tri:' || src::VARCHAR || ':' || dst::VARCHAR), "
         "1, 8))::BIGINT)")
    return f"""WITH {EDGES_CTE},
se AS MATERIALIZED (
  SELECT src, dst FROM e WHERE {h} % 100 < {pct}
),
{_TRI_CTE},
stri AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM se e1
  JOIN se e2 ON e1.dst = e2.src
  JOIN se e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tri),
st AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM stri)
SELECT n AS n_triangles, ns AS n_sampled,
  round(ns * CAST({factor} AS DOUBLE), 6) AS estimate,
  CASE WHEN n = 0 THEN NULL
       ELSE round((ns * CAST({factor} AS DOUBLE) - n) / n, 6) END AS rel_err
FROM tt, st"""
