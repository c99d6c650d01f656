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
}
