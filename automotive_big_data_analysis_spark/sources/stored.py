"""Store-through staged tables: the persisted-index lifecycle.

A training-data pipeline's expensive derived structures — near-dup pair
lists, shingle fingerprint tables, ANN codebooks/cells/codes — are built
ONCE per corpus snapshot and persisted; every consumer reads index
FILES. This helper gives that lifecycle to any builder:

* idempotent per (corpus basename, parameter tag): an existing table is
  reused, never rebuilt;
* the parameter tag is part of the path, so changing the semantics that
  shaped a structure (thresholds, K, band widths) builds a FRESH index
  instead of silently serving files computed under the old definition;
* bucketed+sorted by the consumer-side join key (``sources/bucketed.py``
  discipline) so fact-side joins against the index can co-locate;
* files that outlive the in-memory session catalog (a NEW session — the
  nightly-batch case) are re-attached via CLUSTERED BY DDL with no data
  movement.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automotive_big_data_analysis_spark.sources.bucketed import (
    _register_existing,
)

DEFAULT_BUCKETS = 8

# Registration memo (round-13 optimization): once a stored table has been
# verified registered in THIS application, later accesses skip the
# catalog round-trips (CREATE DATABASE IF NOT EXISTS + listTables — each
# a driver-side job; the ANN recall reports touch ~10 stored tables per
# query and the footprint audit ran ~100 such jobs per invocation).
# Staleness is unaffected: the key embeds the full generation path —
# corpus basename, parameter tag, bucket count, and the source-table
# content fingerprint — so a regenerated corpus or changed parameters
# produce a NEW key and take the slow verification path. External
# deletion (the bench wipes index dirs between runs, tests exercise
# rebuilds) is caught by re-checking the _SUCCESS marker on every hit —
# an os.stat, not a catalog call.
_REGISTERED: set[tuple[str, str, str]] = set()


def source_fingerprint(sf_dir: str, table: str) -> str:
    """Cheap content fingerprint of a source table: a hash of every file's
    (relative name, size, mtime). An index path carrying this can never
    serve structures built from a PREVIOUS corpus generation that reused
    the same directory names — the staleness the parameter tag alone
    cannot see. Metadata-only: no data is read."""
    import hashlib

    path = f"{sf_dir}/{table}.parquet"
    parts = []
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, fn))
            parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def scan_generations(location: str, corpus_prefix: str) -> list[dict]:
    """One dict per on-disk index GENERATION (database directory) under
    ``location`` belonging to ``corpus_prefix``: its base name, the
    table directories it contains, and the bytes it holds. Driver-side
    metadata walk (``os.stat`` only — the ``source_fingerprint``
    discipline); no data files are opened. This is the inventory half
    of the warehouse GC an index fleet runs per corpus snapshot: the
    parameter-tagged path scheme guarantees a SUPERSEDED tag is never
    read again, so every generation that is not the live base is pure
    disk leak (round-12 ADVICE observed exactly that class on a
    tag-format change)."""
    out: list[dict] = []
    if not os.path.isdir(location):
        return out
    for d in sorted(os.listdir(location)):
        base = os.path.join(location, d)
        if not d.startswith(corpus_prefix) or not os.path.isdir(base):
            continue
        tables = sorted(
            t
            for t in os.listdir(base)
            if os.path.isdir(os.path.join(base, t))
        )
        n_bytes = 0
        for root, _dirs, files in os.walk(base):
            for fn in files:
                n_bytes += os.stat(os.path.join(root, fn)).st_size
        out.append({"base": d, "tables": tables, "bytes": n_bytes})
    return out


def gc_stale_generations(
    location: str,
    corpus_prefix: str,
    keep_bases: set[str],
    remove: bool = False,
) -> list[dict]:
    """Classify every generation of ``corpus_prefix`` under ``location``
    as live (its base is in ``keep_bases``) or stale, and — with
    ``remove`` — reclaim the stale ones from disk. Returns the
    pre-removal inventory with ``live``/``removed`` flags. Only
    directories owned by this corpus prefix are ever touched; other
    corpora and unrelated locations are invisible to the walk. The
    complement of ``stored_table``'s build-time pruning (which only
    fires when a NEW generation is built): this is the standalone
    nightly sweep that reclaims generations orphaned by parameter-tag
    changes with no rebuild in between."""
    import shutil

    gens = scan_generations(location, corpus_prefix)
    for g in gens:
        g["live"] = g["base"] in keep_bases
        g["removed"] = False
        if remove and not g["live"]:
            shutil.rmtree(os.path.join(location, g["base"]), ignore_errors=True)
            g["removed"] = True
    return gens


def stored_table(
    spark: SparkSession,
    location: str,
    db_prefix: str,
    sf_dir: str,
    tag: str,
    name: str,
    bucket_col: str,
    build: Callable[[], DataFrame],
    n_buckets: int = DEFAULT_BUCKETS,
    src_table: str | None = None,
    supersede_prefix: str | None = None,
) -> DataFrame:
    """Return the stored table ``name`` for (corpus, tag), building it
    write-through from ``build()`` on first touch. Pass ``src_table``
    (the corpus table the structure derives from) to fold its content
    fingerprint into the path — regenerated source data then forces a
    fresh build instead of reading a stale index.

    ``supersede_prefix`` marks ``name`` as the SOLE live generation of a
    table family whose name embeds its own parameter tag (e.g.
    ``recall_frontier_<frontier-tag>``): on first build of a new tag,
    sibling tables in the same database that share the prefix but not
    the current name are dropped and their files removed — a tag-format
    change would otherwise orphan the old generation forever (round-12
    ADVICE: it is never read under the new tag and never cleaned)."""
    # the bucket count shapes the physical layout exactly like any
    # semantic parameter: folding it into the path means a changed
    # count builds a fresh layout instead of re-attaching old files
    # under a wrong CLUSTERED BY declaration (the filename check in
    # _register_existing only catches counts SMALLER than the layout)
    tag = f"{tag}nb{n_buckets}"
    stem = None
    if src_table:
        corpus = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
        stem = f"{corpus}_{tag}_"
        tag = f"{tag}_{source_fingerprint(sf_dir, src_table)}"
    base = f"{os.path.basename(sf_dir.rstrip('/')).replace('.', '_')}_{tag}"
    db = f"{db_prefix}_{base}"
    loc = f"{location}/{base}"
    path = f"{loc}/{name}"
    memo_key = (spark.sparkContext.applicationId, loc, name)
    if memo_key in _REGISTERED:
        if os.path.exists(f"{path}/_SUCCESS"):
            try:
                return spark.table(f"{db}.{name}")
            except Exception:
                # catalog forgot the entry while the memo stayed warm
                # (table dropped / fresh catalog) — re-attach below via
                # the full DDL path (lifecycle test pins this)
                pass
        _REGISTERED.discard(memo_key)  # wiped or detached — re-verify
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    existing = {t.name for t in spark.catalog.listTables(db)}
    if supersede_prefix and name not in existing:
        # GC superseded same-family generations: attached stale tables
        # are dropped from the catalog, and stale dirs (attached or
        # left by a previous session) are removed from disk. Only this
        # database's tables sharing the family prefix are touched.
        import shutil

        for t in sorted(existing):
            if t.startswith(supersede_prefix):
                spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
                existing.discard(t)
        if os.path.isdir(loc):
            for d in os.listdir(loc):
                stale = os.path.join(loc, d)
                if (
                    d.startswith(supersede_prefix)
                    and d != name
                    and os.path.isdir(stale)
                ):
                    shutil.rmtree(stale, ignore_errors=True)
    if name not in existing:
        if stem and not os.path.exists(f"{path}/_SUCCESS"):
            # first touch of a NEW corpus generation: prune this
            # (corpus, tag)'s index dirs for SUPERSEDED fingerprints —
            # each regeneration would otherwise leave a full orphan
            # index behind forever (``text_formats`` discipline). Only
            # sibling dirs sharing the exact parameter stem are
            # touched; other tags/corpora are untouched.
            import shutil

            if os.path.isdir(location):
                for d in os.listdir(location):
                    if d.startswith(stem) and d != base:
                        shutil.rmtree(
                            os.path.join(location, d), ignore_errors=True
                        )
        df = build()
        if os.path.exists(f"{path}/_SUCCESS"):
            _register_existing(
                spark, db, name, path, df, bucket_col, n_buckets=n_buckets
            )
        else:
            df.write.bucketBy(n_buckets, bucket_col).sortBy(bucket_col).option(
                "path", path
            ).mode("overwrite").saveAsTable(f"{db}.{name}")
    _REGISTERED.add(memo_key)
    return spark.table(f"{db}.{name}")
