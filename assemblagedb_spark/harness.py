"""Harness query catalog: every SURVEY §2 operator as a (Spark query, DuckDB
oracle SQL) pair over the driver's testdata tables.

Each Spark callable takes (spark, sf_dir) and returns a DataFrame; the oracle
is ANSI SQL DuckDB runs against the same parquet (views pre-registered by the
driver). Column names and types are aligned on both sides because the
driver's compare hashes values after sorting columns by name.

Determinism rules used throughout:
- no engine-specific hash functions in compared output — minhash/simhash use
  explicit universal-hash arithmetic (functions/core.py);
- floats in compared output only where both engines perform the identical
  sequence of IEEE ops (int/int division), otherwise rank/integer outputs;
- fixed literals (snapshot timestamps, search terms, thresholds) chosen to be
  valid at every SF.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession, functions as F

from assemblagedb_spark.functions.core import (
    gram_term_sql,
    index_text,
    trim_for_search,
)
from assemblagedb_spark.operators import mvcc
from assemblagedb_spark.operators.grams import block_grams, gram_counts
from assemblagedb_spark.operators.search import find, search
from assemblagedb_spark.operators.traversal import (
    ancestors,
    descendants,
    siblings_before_after,
)
from assemblagedb_spark.sources.tpch import (
    duckdb_graph_edges_cte,
    graph_edges,
    load_table,
)

SEARCH_TERM = "table value part hash"
# 2024-01-15 00:00:00 UTC in epoch nanoseconds (events ts is read as nanos).
SNAPSHOT_NS = 1705276800 * 1_000_000_000

# Shared DuckDB fragment: exploded grams of the documents table.
_DOC_GRAMS_CTE = (
    "doc_grams AS (SELECT node_id, gram, COUNT(*)::BIGINT AS occurrences FROM "
    "(SELECT doc_id AS node_id, "
    f"{gram_term_sql('text', 'i')} AS gram "
    "FROM (SELECT doc_id, text, unnest(range(-2, length(text) + 1)) AS i FROM documents)) "
    "GROUP BY node_id, gram)"
)


def _doc_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("node_id"), "text"
    )


def _doc_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return block_grams(_doc_blocks(spark, sf_dir))


# ---------------------------------------------------------------------------
# Gram index + search (SURVEY §2.4)
# ---------------------------------------------------------------------------


def q_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """index_text + block indexing: the inverted index itself."""
    return _doc_gram_index(spark, sf_dir).select(
        F.col("node_id").cast("long"),
        "gram",
        F.col("occurrences").cast("long"),
    )


O_GRAM_INDEX = f"WITH {_DOC_GRAMS_CTE} SELECT node_id, gram, occurrences FROM doc_grams"


def q_gram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block total gram count (slot 3 Count, index.rs:349-356)."""
    return gram_counts(_doc_gram_index(spark, sf_dir)).select(
        F.col("node_id").cast("long"), F.col("gram_count").cast("long")
    )


O_GRAM_COUNTS = (
    f"WITH {_DOC_GRAMS_CTE} "
    "SELECT node_id, SUM(occurrences)::BIGINT AS gram_count FROM doc_grams GROUP BY node_id"
)


def _search_oracle(term: str, *, trim: bool, min_score: float) -> str:
    grams = index_text(term)
    if trim:
        grams = trim_for_search(grams)
    n = len(grams)
    vals = ", ".join(f"({g}, {c})" for g, c in sorted(Counter(grams).items()))
    return f"""
WITH {_DOC_GRAMS_CTE},
q(gram, q_occ) AS (VALUES {vals}),
inter AS (
  SELECT node_id, SUM(LEAST(occurrences, q_occ))::BIGINT AS i_raw
  FROM doc_grams JOIN q USING (gram) GROUP BY node_id HAVING SUM(LEAST(occurrences, q_occ)) > 0
)
SELECT node_id,
       (255 * {n} // GREATEST({n}, {n}))::INT AS a,
       (255 * {n} // GREATEST({n}, {n}))::INT AS b,
       (255 * i_raw // {n})::INT AS intersection,
       ((255 * i_raw // {n})::INT / 255) AS score
FROM inter
WHERE ((255 * i_raw // {n})::INT / 255) >= {min_score}
"""


def q_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ad-hoc similarity search (index.rs:174-184): end-trim, asym, 0.3."""
    out = search(spark, _doc_gram_index(spark, sf_dir), SEARCH_TERM)
    return out.select(F.col("node_id").cast("long"), "a", "b", "intersection", "score")


O_SEARCH = _search_oracle(SEARCH_TERM, trim=True, min_score=0.3)


def q_find_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """find() in SymmetricOverlap mode with stored counts (index.rs:194-240)."""
    g = _doc_gram_index(spark, sf_dir)
    c = gram_counts(g)
    out = find(spark, g, index_text(SEARCH_TERM), counts=c, symmetric=True)
    return out.filter(F.col("score") >= 0.5).select(
        F.col("node_id").cast("long"), "a", "b", "intersection", "score"
    )


def _find_symmetric_oracle(term: str, min_score: float) -> str:
    grams = index_text(term)
    n = len(grams)
    vals = ", ".join(f"({g}, {c})" for g, c in sorted(Counter(grams).items()))
    return f"""
WITH {_DOC_GRAMS_CTE},
q(gram, q_occ) AS (VALUES {vals}),
counts AS (SELECT node_id, SUM(occurrences)::BIGINT AS match_count FROM doc_grams GROUP BY node_id),
inter AS (
  SELECT node_id, SUM(LEAST(occurrences, q_occ))::BIGINT AS i_raw
  FROM doc_grams JOIN q USING (gram) GROUP BY node_id HAVING SUM(LEAST(occurrences, q_occ)) > 0
),
scored AS (
  SELECT i.node_id,
         (255 * {n} // GREATEST({n}, c.match_count))::INT AS a,
         (255 * c.match_count // GREATEST({n}, c.match_count))::INT AS b,
         (255 * i_raw // GREATEST({n}, c.match_count))::INT AS intersection
  FROM inter i JOIN counts c USING (node_id)
)
SELECT node_id, a, b, intersection, (intersection / LEAST(a, b)) AS score
FROM scored WHERE (intersection / LEAST(a, b)) >= {min_score}
"""


O_FIND_SYMMETRIC = _find_symmetric_oracle(SEARCH_TERM, 0.5)


# ---------------------------------------------------------------------------
# MVCC / versioned reads (SURVEY §2.1) over the events stream
# ---------------------------------------------------------------------------
# Convention: key = user_id, version order = (ts, event_id), tombstone =
# event_type = 'error' (a deterministic stand-in for the reference's
# is_removed flag). ``ts`` is the raw nanosecond BIGINT (see load_events);
# oracles use epoch_ns(ts) for identical integer values.

_EV_COLS = ["user_id", "event_id", "event_type", "value"]


def _events_versioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "is_removed", F.col("event_type") == "error"
    )


def q_mvcc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest version per key incl. tombstones (get_unremoved path)."""
    ev = _events_versioned(spark, sf_dir)
    return mvcc.latest(ev, ["user_id"], ts="ts", tiebreak=["event_id"]).select(*_EV_COLS)


O_MVCC_LATEST = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_mvcc_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live current state: latest per key, tombstoned keys absent (get)."""
    ev = _events_versioned(spark, sf_dir)
    return mvcc.current(ev, ["user_id"], ts="ts", tiebreak=["event_id"]).select(*_EV_COLS)


O_MVCC_CURRENT = """
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_mvcc_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-isolation read as of a fixed timestamp (kv lib.rs:585-591)."""
    ev = _events_versioned(spark, sf_dir)
    return mvcc.as_of(
        ev, SNAPSHOT_NS, ["user_id"], ts="ts", tiebreak=["event_id"]
    ).select(*_EV_COLS)


O_MVCC_ASOF = f"""
SELECT user_id, event_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE epoch_ns(ts) <= {SNAPSHOT_NS}
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_mvcc_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full version history of one key (kv lib.rs:411-431)."""
    ev = _events_versioned(spark, sf_dir).filter(F.col("user_id") == 7)
    return mvcc.versions(ev, ["user_id"], ts="ts", tiebreak=["event_id"]).select(
        "user_id", "event_id", "ts", "event_type", "value", "is_removed"
    )


O_MVCC_VERSIONS = """
SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type, value,
       (event_type = 'error') AS is_removed
FROM events WHERE user_id = 7
"""


def q_mvcc_live_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys whose latest version is live (kv lib.rs:449-465)."""
    ev = _events_versioned(spark, sf_dir)
    return mvcc.live_keys(ev, ["user_id"], ts="ts", tiebreak=["event_id"])


O_MVCC_LIVE_KEYS = """
SELECT user_id FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_mvcc_last_updated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max commit timestamp (kv lib.rs:435-443)."""
    return mvcc.last_updated(load_table(spark, sf_dir, "events"), ts="ts")


O_MVCC_LAST_UPDATED = "SELECT MAX(epoch_ns(ts)) AS last_updated FROM events"


# ---------------------------------------------------------------------------
# Graph traversal (SURVEY §2.2/2.3) over the FK-hierarchy graph
# ---------------------------------------------------------------------------


def q_graph_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parents(id) back-edge lookup (core.rs:123-128) for all nation nodes."""
    e = graph_edges(spark, sf_dir, include_lineitem=False)
    return e.filter(F.col("child_id").startswith("N")).select(
        "child_id", "parent_id", "idx"
    )


O_GRAPH_PARENTS = (
    f"WITH edges AS ({duckdb_graph_edges_cte(False)}) "
    "SELECT child_id, parent_id, idx FROM edges WHERE child_id LIKE 'N%'"
)


def q_graph_descendants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """descendants(R0): BFS transitive closure with depth (lib.rs:695-797)."""
    e = graph_edges(spark, sf_dir, include_lineitem=False)
    roots = spark.createDataFrame([("R0",)], "node_id string")
    return descendants(e, roots).select("node_id", F.col("depth").cast("long"))


O_GRAPH_DESCENDANTS = f"""
WITH RECURSIVE edges AS ({duckdb_graph_edges_cte(False)}),
d(node_id, depth) AS (
  SELECT 'R0', 0
  UNION ALL
  SELECT e.child_id, d.depth + 1 FROM d JOIN edges e ON e.parent_id = d.node_id
)
SELECT node_id, MIN(depth)::BIGINT AS depth FROM d GROUP BY node_id
"""


def q_graph_ancestor_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ancestor_path for sampled lineitems: ordered lineage to the root
    (lib.rs:552-639; every node here has exactly one parent)."""
    e = graph_edges(spark, sf_dir, include_lineitem=True)
    starts = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select(
            F.concat(F.lit("L"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber")).alias("node_id")
        )
        .distinct()
    )
    return ancestors(e, starts).select("start_id", "ancestor_id", F.col("depth").cast("long"))


O_GRAPH_ANCESTOR_PATH = f"""
WITH RECURSIVE edges AS ({duckdb_graph_edges_cte(True)}),
starts(node_id) AS (
  SELECT DISTINCT 'L' || l_orderkey || '-' || l_linenumber FROM lineitem WHERE l_orderkey % 100 = 0
),
up(start_id, ancestor_id, depth) AS (
  SELECT s.node_id, e.parent_id, 1 FROM starts s JOIN edges e ON e.child_id = s.node_id
  UNION ALL
  SELECT u.start_id, e.parent_id, u.depth + 1 FROM up u JOIN edges e ON e.child_id = u.ancestor_id
)
SELECT start_id, ancestor_id, depth::BIGINT AS depth FROM up
"""


def q_siblings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """before/after sibling query over order lineitems; low-quantity lines are
    'blank' and skipped (core.rs:152-299 blank-skipping).

    lineitem has duplicate (orderkey, linenumber) rows, so siblings are the
    *distinct* line positions (a line is non-blank if any of its rows is).
    """
    li = load_table(spark, sf_dir, "lineitem")
    e = li.groupBy("l_orderkey", "l_linenumber").agg(
        (F.max("l_quantity") < 5).alias("is_blank")
    ).select(
        F.concat(F.lit("O"), F.col("l_orderkey")).alias("parent_id"),
        F.concat(F.lit("L"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber")).alias("child_id"),
        F.col("l_linenumber").cast("int").alias("idx"),
        "is_blank",
    )
    return siblings_before_after(e, blank=F.col("is_blank")).select(
        "parent_id", "child_id", "idx", "before_id", "after_id"
    )


O_SIBLINGS = """
WITH lines AS (
  SELECT l_orderkey, l_linenumber, (MAX(l_quantity) < 5) AS is_blank
  FROM lineitem GROUP BY l_orderkey, l_linenumber
)
SELECT 'O' || l_orderkey AS parent_id,
       'L' || l_orderkey || '-' || l_linenumber AS child_id,
       l_linenumber::INT AS idx,
       (MAX(CASE WHEN NOT is_blank THEN {'i': l_linenumber::INT, 'c': 'L' || l_orderkey || '-' || l_linenumber} END)
          OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)).c AS before_id,
       (MIN(CASE WHEN NOT is_blank THEN {'i': l_linenumber::INT, 'c': 'L' || l_orderkey || '-' || l_linenumber} END)
          OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)).c AS after_id
FROM lines
"""


SPARK_QUERIES = {
    "gram_index": q_gram_index,
    "gram_counts": q_gram_counts,
    "search": q_search,
    "find_symmetric": q_find_symmetric,
    "mvcc_latest": q_mvcc_latest,
    "mvcc_current": q_mvcc_current,
    "mvcc_asof": q_mvcc_asof,
    "mvcc_versions": q_mvcc_versions,
    "mvcc_live_keys": q_mvcc_live_keys,
    "mvcc_last_updated": q_mvcc_last_updated,
    "graph_parents": q_graph_parents,
    "graph_descendants": q_graph_descendants,
    "graph_ancestor_path": q_graph_ancestor_path,
    "siblings": q_siblings,
}

ORACLES = {
    "gram_index": O_GRAM_INDEX,
    "gram_counts": O_GRAM_COUNTS,
    "search": O_SEARCH,
    "find_symmetric": O_FIND_SYMMETRIC,
    "mvcc_latest": O_MVCC_LATEST,
    "mvcc_current": O_MVCC_CURRENT,
    "mvcc_asof": O_MVCC_ASOF,
    "mvcc_versions": O_MVCC_VERSIONS,
    "mvcc_live_keys": O_MVCC_LIVE_KEYS,
    "mvcc_last_updated": O_MVCC_LAST_UPDATED,
    "graph_parents": O_GRAPH_PARENTS,
    "graph_descendants": O_GRAPH_DESCENDANTS,
    "graph_ancestor_path": O_GRAPH_ANCESTOR_PATH,
    "siblings": O_SIBLINGS,
}
