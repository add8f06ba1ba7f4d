"""The upstream source-code table and its hypergraph derivation.

BASELINE.json input hint: an Iceberg table
``source_files(repo: string, path: string, commit: string, lang: string,
content: string)`` at 10^12-file scale.  Hyperedges are repo-groups and
commit-groups of files; vertices are distinct ``(repo, path)`` files.

This module provides:
- :func:`synth_source_files` — a deterministic synthetic table of
  exactly that shape (FIXTURES.md T1) for tests/benchmarks, generated
  partition-parallel with pure column expressions (no Python row loop);
- :func:`derive_hypergraph_frames` — the derivation, including the
  north-rule per-row provenance invariant: sha256(content) equality
  between the source table and the constructed hypergraph's provenance
  records;
- vertex/edge id densification via hash-then-rank, all shuffle-local.

Scale notes: vertex ids are dense ranks of the (repo, path) key, built
with the standard two-step distributed dense-rank (range partition ->
per-range row_number -> broadcast cumulative offsets), NOT a single
global window; the resulting ids equal ``ROW_NUMBER() OVER (ORDER BY
key)``, which makes the whole derivation DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LANGS = ["py", "cpp", "java", "rs", "go"]

SOURCE_FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def synth_source_files(
    spark: SparkSession,
    n_repos: int = 20,
    files_per_repo: int = 30,
    commits_per_repo: int = 5,
    monorepo_factor: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Deterministic source_files table (FIXTURES.md T1).

    repo 0 is a "monorepo" with ``monorepo_factor``x the files of any
    other repo — the skew case the engine must absorb.  One row per
    (repo, file, commit).  Pure column expressions; O(rows) generated
    distributed via spark.range.
    """
    mono_files = files_per_repo * monorepo_factor
    rows_per_repo_mono = mono_files * commits_per_repo
    rows_per_repo = files_per_repo * commits_per_repo
    total = rows_per_repo_mono + (n_repos - 1) * rows_per_repo

    df = spark.range(total).select(
        F.when(
            F.col("id") < rows_per_repo_mono, F.lit(0)
        ).otherwise(
            ((F.col("id") - rows_per_repo_mono) / rows_per_repo + 1).cast("long")
        ).alias("r"),
        F.when(
            F.col("id") < rows_per_repo_mono,
            (F.col("id") / commits_per_repo).cast("long"),
        ).otherwise(
            (((F.col("id") - rows_per_repo_mono) % rows_per_repo) / commits_per_repo).cast("long")
        ).alias("p"),
        F.when(
            F.col("id") < rows_per_repo_mono, F.col("id") % commits_per_repo
        ).otherwise(
            (F.col("id") - rows_per_repo_mono) % commits_per_repo
        ).alias("c"),
    )
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.col("p") % 5 + 1).cast("int"))
    repo = F.concat(F.lit("org"), (F.col("r") / 7).cast("long").cast("string"),
                    F.lit("/repo"), F.col("r").cast("string"))
    path = F.concat(F.lit("src/dir"), (F.col("p") % 13).cast("string"),
                    F.lit("/file"), F.col("p").cast("string"), F.lit("."), lang)
    # sha2-256 (not sha1): an opaque deterministic commit id that DuckDB
    # can reproduce (sha256), keeping the whole derivation oracle-checkable
    commit = F.sha2(F.concat(repo, F.lit(":"), F.col("c").cast("string")), 256)
    body = F.sha2(
        F.concat(F.lit(f"seed{seed}:"), repo, F.lit("/"), path, F.lit("@"),
                 F.col("c").cast("string")),
        256,
    )
    content = F.concat(F.lit("// "), repo, F.lit("/"), path, F.lit(" rev"),
                       F.col("c").cast("string"), F.lit("\n"), body)
    return df.select(
        repo.alias("repo"), path.alias("path"), commit.alias("commit"),
        lang.alias("lang"), content.alias("content"),
    )


def dense_rank_by(
    df: DataFrame, order_cols: list[str], out: str, buckets: int = 256
) -> DataFrame:
    """Dense 0..n-1 rank of ``df``'s rows by ``order_cols`` (which must
    be unique per row) — the two-step distributed dense-rank shared by
    every densification path in the engine (here and the rich-JSON
    loader's first-seen numbering):

    range-partition on the order key (ranges are key-ordered), per-range
    ``row_number``, plus a broadcast of cumulative range offsets —
    avoids the single-partition global window at scale.  Because the
    total order is by key alone, ranks are independent of partition
    count AND range boundaries, so an SQL engine reproduces them with
    ``ROW_NUMBER() OVER (ORDER BY key)``.
    """
    # r08: scale the range-bucket count with the session's parallelism
    # instead of always materializing `buckets` tasks — ranks are
    # independent of the bucket count (row_number within key-ordered
    # ranges + cumulative offsets), so this is plan-shape only; a
    # 256-task checkpoint on a hundreds-of-rows frame was pure
    # scheduling overhead, while a bigger cluster (more cores) still
    # gets more ranges automatically.
    buckets = max(8, min(buckets, 2 * df.sparkSession.sparkContext.defaultParallelism))
    part = df.repartitionByRange(buckets, *order_cols)
    w = Window.partitionBy("_b").orderBy(*order_cols)
    # MUST materialize: repartitionByRange SAMPLES its boundaries with a
    # per-execution seed, and `ranked` is referenced twice below (rows +
    # offsets).  Without pinning, the two subplan instantiations can
    # draw different boundaries when the exchange isn't reused, making
    # _rn and _off inconsistent (observed at 350k keys: rank drift vs
    # the global order, and count()/collect() disagreeing on one query).
    ranked = (
        part.withColumn("_b", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w) - 1)
        .localCheckpoint(eager=True)
    )
    counts = ranked.groupBy("_b").agg(F.count("*").alias("_n"))
    # cumulative offsets per range bucket WITHOUT a global window: a
    # non-equi self-join over the <= `buckets` (<= 256) count rows —
    # O(buckets^2) on a metadata-sized frame, planned as a broadcast
    # nested-loop join, so NO "WindowExec: No Partition Defined" stage
    # exists anywhere in a densification plan
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col("b._b") < F.col("a._b"), "left")
        .groupBy(F.col("a._b").alias("_b"))
        .agg(F.coalesce(F.sum("b._n"), F.lit(0)).alias("_off"))
    )
    return (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn(out, (F.col("_rn") + F.col("_off")).cast("long"))
        .drop("_b", "_rn", "_off")
    )


def dense_ids(df: DataFrame, cols: list[str], out: str, buckets: int = 256) -> DataFrame:
    """Assign dense ids 0..n-1 to distinct `cols` tuples, deterministically
    ordered by the tuple itself (== ``ROW_NUMBER() OVER (ORDER BY key)``,
    which is how the DuckDB oracle twin checks this path)."""
    return dense_rank_by(df.select(*cols).distinct(), cols, out, buckets)


def derive_hypergraph_frames(
    source_files: DataFrame,
    verify_sha256: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """source_files -> (incidence, vertex_map, provenance).

    - vertices: distinct (repo, path) files, densified to vertex_id;
    - hyperedges: repo groups (one edge per repo: all files ever in it)
      then commit groups (one edge per (repo, commit): files touched),
      densified to edge_id with repos first;
    - provenance: one row per source row carrying vertex_id and
      sha256(content); when ``verify_sha256`` the invariant
      "provenance sha256 == recomputed sha256(content) per row" is
      asserted distributed (count of violations must be 0).
    """
    vertex_map = dense_ids(source_files, ["repo", "path"], "vertex_id").persist()

    repo_edges = dense_ids(source_files, ["repo"], "repo_eid")
    commit_edges = dense_ids(source_files, ["repo", "commit"], "commit_eid")
    # r08: the repo-count offset rides as a broadcast one-row scalar
    # frame instead of a driver count() action (guide §5: no collect in
    # the query path) — same value, one less job per derivation
    n_repos_f = repo_edges.agg(F.count("*").alias("_nr"))

    with_v = source_files.join(vertex_map, ["repo", "path"])
    inc_repo = (
        with_v.join(F.broadcast(repo_edges), ["repo"])
        .select(F.col("repo_eid").alias("edge_id"), "vertex_id")
        .distinct()
    )
    inc_commit = (
        with_v.join(commit_edges, ["repo", "commit"])
        .crossJoin(F.broadcast(n_repos_f))
        .select((F.col("commit_eid") + F.col("_nr")).alias("edge_id"), "vertex_id")
        .distinct()
    )
    incidence = inc_repo.unionByName(inc_commit)

    provenance = with_v.select(
        "vertex_id", "repo", "path", "commit", F.sha2("content", 256).alias("content_sha256")
    )
    if verify_sha256:
        # north-rule invariant: per-row content sha256 equality between
        # the source table and the hypergraph's provenance records
        violations = (
            source_files.select("repo", "path", "commit", F.sha2("content", 256).alias("_s"))
            .join(provenance, ["repo", "path", "commit"])
            .filter(F.col("_s") != F.col("content_sha256"))
            .count()
        )
        if violations:
            raise ValueError(f"provenance sha256 mismatch on {violations} rows")
    return incidence, vertex_map, provenance
