#!/usr/bin/env python3
"""Calibrate the corpus-sized IVF operating point (round-9 item 1).

Round 8 measured that the shipped fixed operating point (effective cell
count = N/97 growing linearly, NPROBE = 4 fixed) decays: recall@5
0.82 -> 0.56 at 10x corpus.  The scalable design sizes BOTH knobs from
the corpus: K = clamp(ceil(c * sqrt(N)), 8, 65536) cells seeded by the
K rows with the smallest md5(vec_id) (a uniform deterministic subset of
any id set — stride rules under-seed sparse ids), and nprobe =
ceil(f * K) for a probe fraction f calibrated from the measured
frontier.  This script replays the full deterministic IVF
pipeline (2 Lloyd rounds, cosine cell ranking, recall@5 vs brute force)
in DuckDB for a grid of (c, f) at each SF, so the shipped (c, f) is
cited from measurements, not guessed.

Run: python scripts/calibrate_ivf.py [sf_dir ...]
"""
from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from automotive_big_data_analysis_spark.functions import exact as ex
from automotive_big_data_analysis_spark.functions import vectors as V
from automotive_big_data_analysis_spark.operators.similarity import (
    _km_assign_sql,
    _km_update_sql,
)

TOP_K = 5
N_QUERIES = 10


def ivf_frontier(sf_dir: str, k_factor: float, levels: list[int]) -> list:
    con = duckdb.connect()
    n = con.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    k = min(max(math.ceil(k_factor * math.sqrt(n)), 8), 65536)
    levels = sorted({min(lv, k) for lv in levels})
    lv_vals = ", ".join(f"({x})" for x in levels)
    _V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    # the shipped seed rule: the k rows with the smallest md5(vec_id)
    train = (
        f"""
        , c0 AS (
            SELECT cid, cv FROM (
                SELECT vec_id AS cid, v AS cv,
                       ROW_NUMBER() OVER (
                           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                       ) AS sr
                FROM e
            ) WHERE sr <= {k}
        )"""
        + _km_assign_sql("c0", "ta0")
        + _km_update_sql("ta0", "tc1")
        + _km_assign_sql("tc1", "ta1")
        + _km_update_sql("ta1", "tc2")
        + """
        , seeds AS (SELECT cid AS cell_id, cv FROM tc2)"""
    )
    sql = f"""
    WITH e AS (
        SELECT vec_id, {_V} AS v FROM '{sf_dir}/embeddings.parquet'
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
    ), bf AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY ROUND(list_dot_product(q.qv, e.v)
                             / (sqrt(list_dot_product(q.qv, q.qv))
                                * sqrt(list_dot_product(e.v, e.v))), 6)
                             DESC, e.vec_id
                   ) AS rk
            FROM e CROSS JOIN q WHERE e.vec_id != q.query_id
        ) WHERE rk <= {TOP_K}
    ){train}, cr AS (
        SELECT e.vec_id, e.v, s.cell_id,
               ROUND(list_dot_product(e.v, s.cv)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(s.cv, s.cv))), 6) AS cell_cos
        FROM e CROSS JOIN seeds s
    ), rc AS (
        SELECT vec_id, v, cell_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY cell_cos DESC, cell_id) AS r
        FROM cr
    ), assign AS (
        SELECT vec_id, v, cell_id FROM rc WHERE r = 1
    ), probes AS (
        SELECT vec_id AS query_id, cell_id, r AS pr FROM rc
        WHERE vec_id < {N_QUERIES} AND r <= {max(levels)}
    ), scored AS (
        SELECT p.query_id, a.vec_id, p.pr,
               ROUND(list_dot_product(q.qv, a.v)
                     / (sqrt(list_dot_product(q.qv, q.qv))
                        * sqrt(list_dot_product(a.v, a.v))), 6) AS cos
        FROM probes p
        JOIN assign a ON a.cell_id = p.cell_id AND a.vec_id != p.query_id
        JOIN q ON q.query_id = p.query_id
    ), lv AS (SELECT * FROM (VALUES {lv_vals}) AS l(probe)
    ), leveled AS (
        SELECT l.probe, s.* FROM scored s JOIN lv l ON s.pr <= l.probe
    ), topk AS (
        SELECT probe, query_id, vec_id FROM (
            SELECT probe, query_id, vec_id, ROW_NUMBER() OVER (
                PARTITION BY probe, query_id ORDER BY cos DESC, vec_id) AS rk
            FROM leveled
        ) WHERE rk <= {TOP_K}
    ), cand AS (
        SELECT probe, COUNT(*) AS cand_rows FROM leveled GROUP BY probe
    )
    SELECT t.probe,
           SUM(CASE WHEN bf.vec_id IS NOT NULL THEN 1 ELSE 0 END)
               / CAST({N_QUERIES * TOP_K} AS DOUBLE) AS recall_at_5,
           MIN(c.cand_rows) AS cand_rows
    FROM topk t
    LEFT JOIN bf ON bf.query_id = t.query_id AND bf.vec_id = t.vec_id
    LEFT JOIN cand c ON c.probe = t.probe
    GROUP BY t.probe ORDER BY t.probe
    """
    rows = con.sql(sql).fetchall()
    con.close()
    return n, k, rows


if __name__ == "__main__":
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    # probe fractions of K swept; report the knee per (sf, c)
    fracs = [1 / 16, 1 / 8, 3 / 16, 1 / 4, 5 / 16, 3 / 8, 1 / 2]
    for sf_dir in dirs:
        for c in (0.5, 1.0, 2.0):
            n_probe_levels = None
            # derive K first to turn fractions into integer levels
            n = duckdb.sql(
                f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
            ).fetchone()[0]
            k = min(max(math.ceil(c * math.sqrt(n)), 8), 65536)
            levels = sorted({max(1, math.ceil(f * k)) for f in fracs})
            n, k, rows = ivf_frontier(sf_dir, c, levels)
            print(f"== {sf_dir}  N={n}  c={c}  K={k}")
            for probe, recall, cand in rows:
                print(
                    f"   nprobe={probe:4d} ({probe / k:5.3f} K)"
                    f"  recall@5={recall:.2f}  cand_rows={cand}"
                )
