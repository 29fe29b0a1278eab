package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Graph analytics over the events item graph (props.k = item id;
  * consecutive items per user form directed edges). The Spark side runs
  * the Pregel-style iterative loop in `ops.Graph`; the DuckDB oracle
  * UNROLLS the same fixed number of iterations as chained CTEs — both
  * engines execute the identical exact-Int64 recurrence, so ranks match
  * bit-for-bit.
  */
object GraphQueries {

  private val Iters = 10

  // one unrolled PageRank step: r{k} -> r{k+1}, all-integer arithmetic
  // (rank·w // ow per edge, 85% damping via (85·s) // 100, teleport
  // 150000 = 15% of the 1e6 scale). Ranks are nonnegative so DuckDB's
  // floor-// and Spark/Java's truncating div agree on every division.
  private def step(k: Int): String =
    s"""r${k + 1} AS (
       |  SELECT n.node, CAST(150000 + (85 * COALESCE(SUM((r.rank * e.w) // e.ow), 0)) // 100 AS BIGINT) AS rank
       |  FROM nodes n
       |  LEFT JOIN ew e ON e.dst = n.node
       |  LEFT JOIN r$k r ON r.node = e.src
       |  GROUP BY n.node)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Weighted PageRank over the item-transition graph — the
    // link-authority primitive a crawl pipeline uses to weight sources.
    // Spark: ops.Graph.pageRank (one edge-join + one dst-aggregate per
    // iteration, checkpoint-truncated lineage, nothing collected).
    QueryDef("gr1_pagerank",
      s"""WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         |        CAST(props->>'k' AS BIGINT) AS item FROM events),
         |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
         |       FROM it),
         |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
         |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
         |outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
         |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM edges e JOIN outw o USING (src)),
         |nodes AS (SELECT DISTINCT node FROM
         |          (SELECT src AS node FROM edges UNION SELECT dst FROM edges)),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         |${(0 until Iters).map(step).mkString(",\n")}
         |SELECT node AS item, rank FROM r$Iters ORDER BY item""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      graft.ops.Graph.pageRank(edges, "src", "dst", "w", iters = Iters)
        .select(col("node").as("item"), col("rank"))
        .orderBy("item")
    }
  )
}
