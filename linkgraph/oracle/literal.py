"""Literal-VALUES DuckDB oracles for the sequential partitioners.

The sequential greedy state of HDRF / PowerGraph-greedy / LDG / Fennel
is not expressible in set-oriented SQL — but under the fixed stream
seed the assignment is fully deterministic. So the expected output is
generated AT ORACLE-BUILD TIME by the pure-Python oracles (the same
``hdrf_oracle`` / ``vertex_partition_oracle`` pytest pins the Spark
implementations to, bit-for-bit) over the same parquet tables the
driver's DuckDB views read, and emitted as a ``VALUES`` literal. DuckDB
then "computes" the oracle by scanning the literal — giving the driver
a full rows+schema+value-hash comparison instead of a rows-only check.

The stream order is the engine-portable md5 key
(``linkgraph.partition.hdrf.stream_ord_expr`` ≡ ``stream_ord_py``), so
no Spark session is needed here; the only inputs are the parquet files
(read via DuckDB) and the seeded Python oracles.

Build-time dataset: ``$SPARK_GRAFT_ORACLE_SF`` (default
/root/testdata/sf0.01 — the scale the driver's correctness gate runs
at). tests/test_literal_oracle.py proves the literal matches the Spark
queries end-to-end at sf0.001.
"""

from __future__ import annotations

import os
from functools import lru_cache

ORACLE_SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

K_HASH = 8  # = linkgraph.queries.K_HASH (kept literal: no Spark import)


@lru_cache(maxsize=4)
def _edges(sf_dir: str) -> tuple[tuple[int, int], ...]:
    """The deterministic co-occurrence edge list (same derivation as
    linkgraph.graph.edges_from_lineitem / oracle.sql.EDGES_CTE)."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM read_parquet('{sf_dir}/lineitem.parquet') a
        JOIN read_parquet('{sf_dir}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"""
    ).fetchall()
    con.close()
    return tuple((int(u), int(v)) for u, v in rows)


@lru_cache(maxsize=4)
def _stream(sf_dir: str) -> tuple[tuple[int, int], ...]:
    from linkgraph.partition.hdrf import stream_ord_py

    return tuple(
        sorted(_edges(sf_dir), key=lambda e: (stream_ord_py(e[0], e[1]), e[0], e[1]))
    )


@lru_cache(maxsize=8)
def _edge_assignment(sf_dir: str, mode: str) -> tuple[tuple[int, int, int], ...]:
    from linkgraph.partition.hdrf import hdrf_oracle

    stream = _stream(sf_dir)
    parts = hdrf_oracle(list(stream), K_HASH, mode=mode)
    return tuple((u, v, p) for (u, v), p in zip(stream, parts))


@lru_cache(maxsize=8)
def _vertex_assignment(sf_dir: str, mode: str) -> dict[int, int]:
    from linkgraph.partition.vertex import vertex_partition_oracle

    return vertex_partition_oracle(list(_edges(sf_dir)), K_HASH, mode=mode)


def _values_sql(rows: list[tuple], columns: list[tuple[str, str]]) -> str:
    """SELECT over a VALUES literal with explicit column types."""
    vals = ",".join("(" + ",".join(str(x) for x in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in columns)
    names = ", ".join(n for n, _ in columns)
    return f"SELECT {sel} FROM (VALUES {vals}) AS t({names})"


def sql_partition_hdrf(sf_dir: str = ORACLE_SF) -> str:
    return _values_sql(
        list(_edge_assignment(sf_dir, "hdrf")),
        [("src", "BIGINT"), ("dst", "BIGINT"), ("partition", "BIGINT")],
    )


def sql_partition_greedy(sf_dir: str = ORACLE_SF) -> str:
    return _values_sql(
        list(_edge_assignment(sf_dir, "greedy")),
        [("src", "BIGINT"), ("dst", "BIGINT"), ("partition", "BIGINT")],
    )


def sql_partition_ldg(sf_dir: str = ORACLE_SF) -> str:
    a = _vertex_assignment(sf_dir, "ldg")
    return _values_sql(
        sorted(a.items()), [("vid", "BIGINT"), ("partition", "BIGINT")]
    )


def sql_partition_fennel(sf_dir: str = ORACLE_SF) -> str:
    a = _vertex_assignment(sf_dir, "fennel")
    return _values_sql(
        sorted(a.items()), [("vid", "BIGINT"), ("partition", "BIGINT")]
    )


def sql_vertex_cut_metrics(sf_dir: str = ORACLE_SF) -> str:
    """Edge-cut rate + vertex balance per strategy, computed from the
    Python-oracle assignments with the reference formulas
    (vertexPartitioner.cpp:34-51), 6dp rounding matching
    linkgraph.partition.metrics.vertex_partition_metrics."""
    rows = []
    edges = _edges(sf_dir)
    m = len(edges)
    for mode in ("ldg", "fennel"):
        a = _vertex_assignment(sf_dir, mode)
        cut = sum(1 for u, v in edges if a[u] != a[v])
        n = len(a)
        sizes: dict[int, int] = {}
        for p in a.values():
            sizes[p] = sizes.get(p, 0) + 1
        max_vertex = max(sizes.values())
        rows.append(
            (
                f"'{mode}'",
                m,
                cut,
                round(cut / m, 6),
                n,
                max_vertex,
                round(max_vertex * K_HASH / n, 6),
            )
        )
    return _values_sql(
        rows,
        [
            ("strategy", "VARCHAR"),
            ("m", "BIGINT"),
            ("edge_cut", "BIGINT"),
            ("edge_cut_rate", "DOUBLE"),
            ("n", "BIGINT"),
            ("max_vertex", "BIGINT"),
            ("load_balance", "DOUBLE"),
        ],
    )
