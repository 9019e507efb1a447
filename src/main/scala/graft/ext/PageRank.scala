package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over the near-duplicate graph — ranking a
  * duplicate cluster's members by connectivity (the "which copy is the
  * hub" signal a dedup pipeline can use instead of min-doc_id survivor
  * selection, and the classic iterative-graph workload).
  *
  * ALL-INTEGER formulation: ranks are BIGINTs scaled by 1e9, each
  * iteration is `rank' = 0.15·S + 0.85·Σ_in floor(rank/deg)` with floor
  * division at both steps — no floating point anywhere, so the result
  * is bit-exact and the DuckDB oracle replays the iterations verbatim
  * (distributed float summation order can never perturb it; the same
  * trick as the q76 decimal moments, taken all the way to integers).
  * Headroom: a node's contribution sum is ≤ max-degree·1e9 and the
  * damping step computes `85 · s` BEFORE dividing, so signed-64 wraps
  * once max-degree exceeds ~1e8 in-neighbors (85 · 1e8 · 1e9 ≈ 2^63) —
  * generous for a near-dup graph (a 1e8-degree node means 1e8 copies of
  * one document), but a graph that hot needs the 1e9 scale lowered or
  * the damping sum lifted to DECIMAL(38,0); the bound is the ×85-aware
  * one, not the naive Σ≤deg·1e9 figure.
  *
  * Scale: per iteration one src-keyed join (ranks onto edges) and one
  * dst-keyed sum — the label-propagation shuffle shape (SCALE.md §dedup);
  * iteration count is FIXED (3), so the lazy plan stays bounded and no
  * convergence probe is needed. Every node of the symmetric pair graph
  * has degree ≥ 1 and receives ≥ 1 contribution, so no dangling-mass
  * term is needed. */
object PageRank {

  private val Scale = 1000000000L           // 1e9: rank fixed-point scale
  private val Base = 150000000L             // 0.15 · Scale

  /** Every persisted edge table handed to an iteration loop, so repeated
    * calls in one JVM (bench passes, correctness run) can't accumulate
    * dead cached blocks: the harness drains this between passes, same
    * contract as Dedup.clearMemos. */
  private val persistedEdges =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every edge table persisted by prior dupPagerank calls. */
  def clearMemos(): Unit = {
    var df = persistedEdges.poll()
    while (df != null) {
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
      df = persistedEdges.poll()
    }
  }

  /** Integer PageRank over an undirected (a_id, b_id) pair set. Output:
    * (doc_id, rank) for every doc appearing in a pair. */
  def dupPagerank(pairs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // every iteration's plan reads the degree-annotated edge table —
    // persist it once instead of re-deriving union+aggregate+join per
    // iteration (the materialize-the-shared-stage pattern; |edges| =
    // 2·|pairs|, far below corpus size)
    val edges = e.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persistedEdges.add(edges)
    var ranks = deg.select(col("src").as("id"), lit(Scale).as("rank"))
    for (_ <- 1 to iters) {
      ranks = edges.join(ranks, edges("src") === ranks("id"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("id"),
                (lit(Base) + expr("85 * s div 100")).as("rank"))
    }
    ranks.select(col("id").as("doc_id"), col("rank"))
  }

  /** Gate entry: PageRank over the exact jaccard pair set (shared,
    * persisted computation with q28/q39/q63). */
  def dupPagerank(spark: SparkSession, dir: String): DataFrame =
    dupPagerank(Dedup.jaccardPairsCached(spark, dir, 0.8))

  /** Triangle + wedge census of the dup graph — the structure audit
    * next to [[dupPagerank]]'s ranking: triangles count closed
    * 3-cliques, wedges count length-2 paths, and 3·tri/wedges is the
    * global clustering coefficient (near-dup components should be
    * near-cliques — a low coefficient flags chained false merges, the
    * classic LSH-transitivity failure). Output: one row of exact
    * integers.
    *
    * Scale: the standard ordered-adjacency formulation — triangles are
    * counted only as a < b < c, so each is found exactly once; two
    * joins over the (small) pair set, both keyed on doc ids; wedges are
    * one degree aggregate. Everything is bounded by the pair set, never
    * the corpus. */
  def dupTriangles(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a_id"), col("b_id"))
    val tri = p.as("e1")
      .join(p.as("e2"), col("e2.a_id") === col("e1.b_id"))
      .join(p.as("e3"),
        col("e3.a_id") === col("e1.a_id") &&
        col("e3.b_id") === col("e2.b_id"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = p.select(col("a_id").as("id"))
      .union(p.select(col("b_id").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    val wedges = deg.agg(
      sum(expr("d * (d - 1) div 2")).cast("long").as("n_wedges"))
    tri.crossJoin(wedges)
  }

  /** Gate entry: triangle census over the shared exact pair set. */
  def dupTriangles(spark: SparkSession, dir: String): DataFrame =
    dupTriangles(Dedup.jaccardPairsCached(spark, dir, 0.8))

  /** DuckDB oracle for [[dupTriangles]]: same pair CTE, ordered
    * triangle join, degree-choose-2 wedges. */
  def dupTrianglesOracleSql(threshold: Double = 0.8): String =
    s"""WITH d AS (SELECT doc_id, source,
       |  list_distinct(string_split(trim(regexp_replace(regexp_replace(
       |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
       |    AS ws
       | FROM documents),
       |p AS (SELECT a_id, b_id FROM (
       | SELECT l.doc_id AS a_id, r.doc_id AS b_id,
       |  CAST(len(list_intersect(l.ws, r.ws)) AS DOUBLE) /
       |   (len(l.ws) + len(r.ws) - len(list_intersect(l.ws, r.ws))) AS jac
       | FROM d l, d r
       | WHERE l.source = r.source AND l.doc_id < r.doc_id) q
       | WHERE jac >= $threshold),
       |tri AS (SELECT count(*) AS n_triangles
       |        FROM p e1
       |        JOIN p e2 ON e2.a_id = e1.b_id
       |        JOIN p e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id),
       |deg AS (SELECT id, count(*) AS d FROM (
       |          SELECT a_id AS id FROM p
       |          UNION ALL SELECT b_id FROM p) u GROUP BY id),
       |w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
       |      FROM deg)
       |SELECT CAST(tri.n_triangles AS BIGINT) AS n_triangles, w.n_wedges
       |FROM tri, w""".stripMargin

  /** DuckDB oracle: the q28/q39 exact-pair CTE, then the iterations
    * unrolled — same integer floor divisions, necessarily identical. */
  def dupPagerankOracleSql(iters: Int = 3): String = {
    val iterCtes = (1 to iters).map { i =>
      // CAST: DuckDB's sum(BIGINT) widens to HUGEINT, which pandas
      // materializes as float64 and the driver hash then differs from
      // Spark's int64 even though every value is equal — pin the dtype
      s"""r$i AS (
         |  SELECT e.dst AS id,
         |    CAST($Base + 85 * sum(r${i - 1}.rank // deg.deg) // 100
         |         AS BIGINT) AS rank
         |  FROM e JOIN r${i - 1} ON e.src = r${i - 1}.id
         |         JOIN deg ON deg.id = e.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id, source,
       |  list_distinct(string_split(trim(regexp_replace(regexp_replace(
       |    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
       |    AS ws
       | FROM documents),
       |p AS (SELECT a_id, b_id FROM (
       | SELECT l.doc_id AS a_id, r.doc_id AS b_id,
       |  CAST(len(list_intersect(l.ws, r.ws)) AS DOUBLE) /
       |   (len(l.ws) + len(r.ws) - len(list_intersect(l.ws, r.ws))) AS jac
       | FROM d l, d r
       | WHERE l.source = r.source AND l.doc_id < r.doc_id) q
       | WHERE jac >= 0.8),
       |e AS (SELECT a_id AS src, b_id AS dst FROM p
       |      UNION ALL SELECT b_id, a_id FROM p),
       |deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT id, CAST($Scale AS BIGINT) AS rank FROM deg),
       |$iterCtes
       |SELECT id AS doc_id, rank FROM r$iters""".stripMargin
  }
}
