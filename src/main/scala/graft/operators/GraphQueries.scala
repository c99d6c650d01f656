package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.ConnectedComponents

/** Graph operators: connected components as a first-class query,
  * hash-verified against a DuckDB recursive-CTE transitive closure.
  *
  * The dedup pipelines already USE ConnectedComponents for cluster
  * assembly, but their LSH candidate edges are probabilistic, so those
  * gates are rows-only. This gate runs the SAME labeling code over a
  * deterministic edge set — doubling edges (i → 2i) over the document
  * id space, which build binary-tree components of real depth (~log n,
  * deeper than any dup clique) — so the component assignment itself is
  * hash-checked cross-engine, closing the verification gap on the
  * weakest link of the dedup family.
  */
object GraphQueries {

  /** Deterministic doubling-edge set over the document ids: an edge
    * i → 2i for every id whose double IS ITSELF a document id (a
    * semi-join, not a max-bound check — a gapped id space must not
    * produce edges to phantom vertices); id 0 excluded (0 → 0 is a
    * self-loop). Components are the odd-rooted chains {o, 2o, 4o, ...}
    * restricted to present ids. */
  private def doublingEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = Tables.documents(spark, dir).select($"doc_id")
    ids.filter($"doc_id" >= 1)
      .select($"doc_id".as("src"), ($"doc_id" * 2).as("dst"))
      .join(ids.select($"doc_id".as("dst")), Seq("dst"), "left_semi")
      .select($"src", $"dst")
  }

  /** Connected components over the doubling graph: (id, component)
    * for every vertex incident to an edge, component = minimum
    * reachable id. Exact — the small edge list takes the driver
    * union-find path; the distributed label-propagation path is
    * pinned equal in GraphSpec. */
  def graphComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the doubling chains are log2(max doc_id) deep (~23 at a 5M-id
    // corpus) — far past the default maxIter=8 that fits dup cliques.
    // 64 covers any 64-bit id space; the loop exits on convergence, so
    // small corpora (and the driver union-find path) never pay for it.
    ConnectedComponents.label(doublingEdges(spark, dir), maxIter = 64)
      .select($"id", $"component")
      .orderBy($"id")
  }

  val PagerankIters = 5
  val PagerankTopN = 100

  /** PageRank over the customer–supplier interaction graph (who
    * bought from whom, via orders ⋈ lineitem), the standard importance
    * signal for entity-centric curation (which suppliers/domains
    * anchor the corpus). Undirected formulation: each trade edge
    * conducts rank both ways, so the bipartite graph has no dangling
    * nodes and no leaked rank mass.
    *
    * Exact-integer iteration so the cross-engine gate can hash it:
    * ranks live in micro-units (r₀ = 1 000 000), a node's per-edge
    * contribution is `r div outdeg` (integral division), and the
    * damped update is `150000 + (85 · Σ contrib) div 100` — every step
    * is the same integer arithmetic in Spark and DuckDB, so a fixed
    * `PagerankIters` rounds produce bit-identical ranks (the float
    * formulation would diverge in the summation order). Sums stay far
    * inside Long: total rank mass is ~n·10⁶ ≈ 1.6e13 at sf100.
    *
    * Plan at 100 TB: the canonical distributed PageRank — the edge
    * list (with outdeg pre-joined) is persisted ONCE and hash-shuffled
    * on src; each round is one co-partitioned join (ranks are keyed by
    * the same id) plus one partial-agg shuffle on dst, where map-side
    * combine absorbs hot-node skew (a popular supplier's incoming
    * contributions reduce inside each task before the exchange). Rank
    * frames are (id, long) scalars — edges never re-shuffle after the
    * initial layout. A fixed iteration count (not a convergence test)
    * keeps the job bounded at any scale; 5 rounds ranks hubs correctly
    * on this graph's ~2-hop diameter. The final top-N is
    * TakeOrderedAndProject (per-partition N, merge on the driver —
    * never a global sort). */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // disjoint node spaces: customers on even ids, suppliers on odd
    val e0 = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    // ONE persisted edge layout: (src, dst, outdeg), hash-partitioned
    // on src for every round's join. Both orientations EXPLODE from a
    // single pass over the deduped pairs (a union of e0 with its flip
    // would evaluate the distinct subtree twice); they land in disjoint
    // (even → odd / odd → even) key spaces, so no re-dedup is needed.
    // outdeg rides along from a count window over the same src
    // partitioning — no degree self-join, and the window's exchange IS
    // the layout every round's join reuses.
    val wDeg = org.apache.spark.sql.expressions.Window.partitionBy($"src")
    val edges = e0.select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("e"))
      .select($"e.src", $"e.dst")
      .withColumn("outdeg", count(lit(1)).over(wDeg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count() // materialize: every round (and r0) reads the cache

    // r0 over all nodes: distinct on the cache's own partitioning key —
    // no exchange (every node appears as a src in the undirected layout)
    var ranks = edges.select($"src".as("id")).distinct()
      .select($"id", lit(1000000L).as("r"))
    (1 to PagerankIters).foreach { _ =>
      // shuffle_hash on the node-sized side: the edge cache never
      // re-exchanges (its src layout satisfies the join), the rank
      // table shuffles — at any scale the corpus-sized side stays put
      // (a broadcast of ranks would be node-count-sized: not scale-safe)
      ranks = edges
        .join(ranks.withColumnRenamed("id", "src").hint("shuffle_hash"), "src")
        .groupBy($"dst".as("id"))
        .agg(sum(expr("r div outdeg")).as("s"))
        .select($"id", (lit(150000L) + expr("(85 * s) div 100")).as("r"))
    }
    // every node keeps outdeg >= 1 in the undirected graph, so each
    // round's inner join preserves the full vertex set
    val out = ranks.orderBy($"r".desc, $"id").limit(PagerankTopN)
      .select($"id", $"r".as("rank_u"))
    // the result is a bounded top-N: land it on the driver so the edge
    // cache can be released here instead of leaking a persisted frame
    // to the caller (the returned plan must not depend on the cache)
    val rows = out.collect()
    edges.unpersist()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      .orderBy($"rank_u".desc, $"id")
  }
}
