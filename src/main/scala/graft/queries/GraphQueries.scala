package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Graph analytics over the events item graph (props.k = item id;
  * consecutive items per user form directed edges). The Spark side runs
  * the Pregel-style iterative loop in `ops.Graph`; the DuckDB oracle
  * UNROLLS the same fixed number of iterations as chained CTEs — both
  * engines execute the identical exact-Int64 recurrence, so ranks match
  * bit-for-bit.
  */
object GraphQueries {

  private val Iters = 10
  // gr4: k-core threshold + synchronous peel rounds (fixpoint at sf0.01
  // is round 9 — every node peels; sf0.1's 11-core is non-empty)
  private val KcK = 11
  private val KcRounds = 12
  // gr7: unnormalized HITS rounds — growth ≈ (max deg)^(2·iters) must
  // stay inside Int64 (guarded in ops.Graph.hits)
  private val HitsIters = 3
  // gr9: synchronous LPA rounds (communities stabilize fast on the
  // dense item graph; fixed count keeps both engines bit-equal)
  private val LpaRounds = 4

  // gr10: personalized-PageRank seed items (a "user history" handful)
  private val PprSeeds = Seq(1L, 2L, 3L)

  // one unrolled PPR step — gr1's recurrence with teleport mass
  // restricted to the seed set
  private def pprStep(k: Int): String =
    s"""pr${k + 1} AS (
       |  SELECT n.node, CAST(CASE WHEN n.node IN (${PprSeeds.mkString(", ")}) THEN 150000 ELSE 0 END
       |    + (85 * COALESCE(SUM((r.rank * e.w) // e.ow), 0)) // 100 AS BIGINT) AS rank
       |  FROM nodes n
       |  LEFT JOIN ew e ON e.dst = n.node
       |  LEFT JOIN pr$k r ON r.node = e.src
       |  GROUP BY n.node)""".stripMargin

  // one unrolled LPA round for the gr9 oracle: neighbor-label weight
  // sums, then per-node argmax (ties → min label) via ROW_NUMBER
  private def lpaStep(r: Int): String =
    s"""l${r + 1} AS (
       |  SELECT node, lab FROM (
       |    SELECT s.node, s.lab,
       |      ROW_NUMBER() OVER (PARTITION BY s.node ORDER BY s.ws DESC, s.lab) AS rn
       |    FROM (SELECT a.node, l.lab, SUM(a.w) AS ws
       |          FROM adj a JOIN l$r l ON l.node = a.nb GROUP BY 1, 2) s)
       |  WHERE rn = 1)""".stripMargin

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
    },

    // Bounded-depth reachability with walk counting from item 0 over the
    // HEAVY transition edges (weight > 1.5× the mean, i.e. 2·w·count >
    // 3·total — integer-exact). The oracle is the natural recursive CTE;
    // the Spark side runs ops.Graph.reachability's frontier recurrence
    // over the once-materialized edge list (the raw WITH RECURSIVE plan
    // re-derives the edge subplan every UnionLoop iteration — measured
    // 32 s vs <1 s here; the SQL surface itself is exercised in
    // ContextSpec "recursive CTE").
    QueryDef("gr2_reachability",
      """WITH RECURSIVE
        |it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |       CAST(props->>'k' AS BIGINT) AS item FROM events),
        |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
        |       FROM it),
        |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
        |tot AS (SELECT SUM(w) AS s, COUNT(*) AS c FROM edges),
        |se AS (SELECT e.src, e.dst FROM edges e CROSS JOIN tot t WHERE 2 * e.w * t.c > 3 * t.s),
        |reach(node, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
        |  UNION ALL
        |  SELECT se.dst, r.depth + 1 FROM reach r JOIN se ON se.src = r.node WHERE r.depth < 6
        |)
        |SELECT node, CAST(MIN(depth) AS BIGINT) AS hops, CAST(COUNT(*) AS BIGINT) AS n_paths
        |FROM reach GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
        .localCheckpoint(false)
      val tot = edges.agg(sum("w").as("s"), count(lit(1)).as("c"))
      val se = edges.crossJoin(broadcast(tot))
        .where(lit(2) * col("w") * col("c") > lit(3) * col("s"))
        .select("src", "dst")
      graft.ops.Graph.reachability(se, "src", "dst", start = 0L, maxDepth = 6)
        .orderBy("node")
    },

    // Bounded-hop single-source shortest paths over the heavy transition
    // edges, min-plus semantics: edge cost = 1000000 div w (inverse
    // popularity — hot transitions are "close"), dist(v) = cheapest ≤6-hop
    // walk from item 0. The oracle is the natural recursive CTE with a
    // final MIN; Spark runs ops.Graph.shortestPaths' Bellman–Ford
    // relaxation over the once-materialized edge list (frontier = only
    // nodes that improved, early exit at the fixpoint) — identical
    // Int64 add/min math, so distances match exactly.
    QueryDef("gr5_sssp",
      """WITH RECURSIVE
        |it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |       CAST(props->>'k' AS BIGINT) AS item FROM events),
        |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
        |       FROM it),
        |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
        |tot AS (SELECT SUM(w) AS s, COUNT(*) AS c FROM edges),
        |se AS (SELECT e.src, e.dst, 1000000 // e.w AS cost
        |       FROM edges e CROSS JOIN tot t WHERE 2 * e.w * t.c > 3 * t.s),
        |walk(node, dist, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist, 0 AS depth
        |  UNION ALL
        |  SELECT se.dst, w.dist + se.cost, w.depth + 1
        |  FROM walk w JOIN se ON se.src = w.node WHERE w.depth < 6)
        |SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        |FROM walk GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
        .localCheckpoint(false)
      val tot = edges.agg(sum("w").as("s"), count(lit(1)).as("c"))
      val se = edges.crossJoin(broadcast(tot))
        .where(lit(2) * col("w") * col("c") > lit(3) * col("s"))
        .select(col("src"), col("dst"), expr("1000000L div w").as("cost"))
      graft.ops.Graph.shortestPaths(se, "src", "dst", "cost",
          start = 0L, maxDepth = 6)
        .orderBy("node")
    },

    // Per-node triangle counts over the undirected item graph — local
    // clustering density. Spark runs the degree-oriented wedge join
    // (ops.Graph.triangleCounts: every triangle generated once, from its
    // (deg,id)-smallest vertex, O(√m)-bounded fan-out on skewed graphs);
    // the oracle uses the id-ordered 3-way join (a<b<c once each) —
    // triangle sets are identical, so per-node counts match exactly.
    QueryDef("gr3_triangles",
      """WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |       CAST(props->>'k' AS BIGINT) AS item FROM events),
        |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
        |       FROM it),
        |edges AS (SELECT src, item AS dst FROM lg WHERE src IS NOT NULL AND src <> item),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM edges),
        |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
        |        FROM und e1 JOIN und e2 ON e2.a = e1.b
        |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
        |FROM (SELECT u AS node FROM tri
        |      UNION ALL SELECT v FROM tri
        |      UNION ALL SELECT w FROM tri)
        |GROUP BY node ORDER BY node""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
        .orderBy("node")
    },

    // k-core onion decomposition of the bipartite user–item view graph:
    // each round simultaneously peels every node with < k surviving
    // neighbors; output = the round each node fell in (0 = in the k-core
    // after `KcRounds` rounds — fixpoint at the gate SF is round 9, so 12
    // rounds IS the full decomposition there). Spark runs
    // ops.Graph.kCorePeel (per round: two semi-joins + one map-side-
    // combined degree aggregate over the shrinking subgraph, driver fast
    // path under the dd6/gr1 edge budget); the oracle unrolls the same
    // rounds as chained CTEs — the removal set is a pure function of the
    // surviving vertex SET, so both engines match exactly.
    QueryDef("gr4_kcore", {
      // MATERIALIZED: each v_r is referenced four times (twice by d_{r+1},
      // twice by its EXCEPT rows) — default CTE inlining would expand the
      // chain exponentially (2^rounds parquet scans)
      def round(r: Int): String =
        s"""d$r AS MATERIALIZED (SELECT e.a AS node, CAST(COUNT(*) AS BIGINT) AS d
           |  FROM ue e JOIN v${r - 1} x ON e.a = x.node JOIN v${r - 1} y ON e.b = y.node
           |  GROUP BY 1),
           |v$r AS MATERIALIZED (SELECT node FROM d$r WHERE d >= $KcK)""".stripMargin
      def removedAt(r: Int): String =
        s"""SELECT node, CAST($r AS BIGINT) AS peel_round
           |FROM (SELECT node FROM v${r - 1} EXCEPT SELECT node FROM v$r)""".stripMargin
      s"""WITH it AS MATERIALIZED (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS ua,
         |       'i:' || CAST(CAST(props->>'k' AS BIGINT) AS VARCHAR) AS ib
         |     FROM events WHERE event_type = 'view'),
         |ue AS MATERIALIZED (SELECT ua AS a, ib AS b FROM it UNION ALL SELECT ib, ua FROM it),
         |v0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM ue),
         |${(1 to KcRounds).map(round).mkString(",\n")}
         |SELECT node, peel_round FROM (
         |${(1 to KcRounds).map(removedAt).mkString("\nUNION ALL\n")}
         |UNION ALL SELECT node, CAST(0 AS BIGINT) AS peel_round FROM v$KcRounds)
         |ORDER BY peel_round, node""".stripMargin
    }) { (s, d) =>
      val bip = Tables.load(s, d, "events")
        .filter(col("event_type") === "view")
        .select(
          concat(lit("u:"), col("user_id").cast(StringType)).as("a"),
          concat(lit("i:"),
            graft.ops.EventProps.propsK(col("props")).cast(StringType)).as("b"))
      graft.ops.Graph.kCorePeel(bip, "a", "b", k = KcK, rounds = KcRounds)
        .orderBy("peel_round", "node")
    },

    // HITS hubs & authorities over the distinct item-transition edges —
    // 3 unnormalized mutual-reinforcement rounds in exact Int64 (the
    // per-round L2 normalization only rescales ranks, so dropping it
    // keeps every value an integer; growth stays far inside Int64 at 3
    // rounds on this graph). Spark runs ops.Graph.hits (pageRank's
    // shuffle layout, overflow-guarded); the oracle unrolls the same
    // sums as chained CTEs.
    QueryDef("gr7_hits", {
      def round(r: Int): String =
        s"""a$r AS (SELECT n.node, CAST(COALESCE(SUM(h${r - 1}.v), 0) AS BIGINT) AS v
           |  FROM nodes n LEFT JOIN de e ON e.dst = n.node
           |  LEFT JOIN h${r - 1} ON h${r - 1}.node = e.src GROUP BY 1),
           |h$r AS (SELECT n.node, CAST(COALESCE(SUM(a$r.v), 0) AS BIGINT) AS v
           |  FROM nodes n LEFT JOIN de e ON e.src = n.node
           |  LEFT JOIN a$r ON a$r.node = e.dst GROUP BY 1)""".stripMargin
      s"""WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         |       CAST(props->>'k' AS BIGINT) AS item FROM events),
         |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
         |       FROM it),
         |de AS (SELECT DISTINCT src, item AS dst FROM lg WHERE src IS NOT NULL AND src <> item),
         |nodes AS (SELECT DISTINCT node FROM
         |          (SELECT src AS node FROM de UNION SELECT dst FROM de)),
         |h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes),
         |${(1 to HitsIters).map(round).mkString(",\n")}
         |SELECT n.node, h$HitsIters.v AS hub, a$HitsIters.v AS auth
         |FROM nodes n JOIN h$HitsIters ON h$HitsIters.node = n.node
         |JOIN a$HitsIters ON a$HitsIters.node = n.node
         |ORDER BY n.node""".stripMargin
    }) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      graft.ops.Graph.hits(edges, "src", "dst", iters = HitsIters)
        .orderBy("node")
    },

    // Degree-distribution profile — the graph-shape summary read BEFORE
    // choosing algorithms (power-law tails decide salting, orientation
    // and cap strategies): per direction, log2-bucketed degree histogram
    // with per-bucket node counts and extremes. The bucket is
    // length(bin(deg)) − 1 = floor(log2) computed EXACTLY on the binary
    // string — no float log near bucket boundaries. Two map-side-
    // combined aggregates over the edge list, histogram rows bounded by
    // 2 × 63 buckets.
    QueryDef("gr8_degree_profile",
      """WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |       CAST(props->>'k' AS BIGINT) AS item FROM events),
        |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
        |       FROM it),
        |de AS (SELECT DISTINCT src, item AS dst FROM lg WHERE src IS NOT NULL AND src <> item),
        |deg AS (SELECT 'out' AS direction, src AS node, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM de GROUP BY 2
        |        UNION ALL
        |        SELECT 'in', dst, CAST(COUNT(*) AS BIGINT) FROM de GROUP BY 2)
        |SELECT direction, CAST(LENGTH(bin(d)) - 1 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |  CAST(MIN(d) AS BIGINT) AS min_deg, CAST(MAX(d) AS BIGINT) AS max_deg
        |FROM deg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val de = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
        .select("src", "dst").distinct()
      val deg = de.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
        .select(lit("out").as("direction"), col("d"))
        .unionByName(de.groupBy(col("dst").as("node")).agg(count(lit(1)).as("d"))
          .select(lit("in").as("direction"), col("d")))
      deg.groupBy(col("direction"),
          (length(bin(col("d"))) - 1).cast(LongType).as("bucket"))
        .agg(count(lit(1)).as("n_nodes"), min("d").as("min_deg"), max("d").as("max_deg"))
        .orderBy("direction", "bucket")
    },

    // Item-item co-view similarity — the bipartite projection behind
    // "users who viewed X also viewed Y" (collaborative filtering's
    // candidate generator). Baskets are CAPPED at 20 items per user
    // (lowest item ids — deterministic), so the per-user pair fan-out is
    // ≤ 190 regardless of power users: the pair explosion is basket-
    // bounded, never quadratic in the catalog or the user count. Support
    // floor 3, cosine normalization n_ab/√(n_a·n_b) — one correctly-
    // rounded double division per surviving pair, identical on both
    // engines; top-50 via TakeOrdered.
    QueryDef("gr6_coview",
      """WITH it AS (SELECT DISTINCT user_id, CAST(props->>'k' AS BIGINT) AS item
        |            FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, item,
        |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) AS rn FROM it),
        |b AS (SELECT user_id, item FROM r WHERE rn <= 20),
        |deg AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1),
        |pairs AS (SELECT a.item AS i1, b2.item AS i2, CAST(COUNT(*) AS BIGINT) AS n_ab
        |          FROM b a JOIN b b2 ON a.user_id = b2.user_id AND a.item < b2.item
        |          GROUP BY 1, 2)
        |SELECT i1, i2, n_ab,
        |  CAST(n_ab AS DOUBLE) / (sqrt(CAST(da.n AS DOUBLE)) * sqrt(CAST(db.n AS DOUBLE))) AS cos
        |FROM pairs JOIN deg da ON da.item = i1 JOIN deg db ON db.item = i2
        |WHERE n_ab >= 3
        |ORDER BY cos DESC, i1, i2 LIMIT 50""".stripMargin) { (s, d) =>
      val it = Tables.load(s, d, "events")
        .filter(col("event_type") === "view")
        .select(col("user_id"),
          graft.ops.EventProps.propsK(col("props")).as("item"))
        .distinct()
      val b = it
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("item")))
        .where(col("rn") <= 20)
        .select("user_id", "item")
        .localCheckpoint(false)
      val deg = b.groupBy("item").agg(count(lit(1)).as("n"))
      val pairs = b.as("a").join(b.as("b2"),
          col("a.user_id") === col("b2.user_id") && col("a.item") < col("b2.item"))
        .groupBy(col("a.item").as("i1"), col("b2.item").as("i2"))
        .agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 3)
      pairs
        .join(deg.select(col("item").as("i1"), col("n").as("na")), "i1")
        .join(deg.select(col("item").as("i2"), col("n").as("nb")), "i2")
        .select(col("i1"), col("i2"), col("n_ab"),
          (col("n_ab").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cos"))
        .orderBy(col("cos").desc, col("i1"), col("i2"))
        .limit(50)
    },

    // Personalized PageRank from a seed item set — "what's important
    // relative to THIS user's items", the recommendation-expansion /
    // related-content primitive (global gr1 answers "important
    // overall"). Same exact-Int64 recurrence and unrolled-CTE oracle as
    // gr1; only the teleport vector changes (mass re-injected at the
    // seeds each round). Nodes unreachable from the seeds stay at 0.
    QueryDef("gr10_personalized_pagerank",
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
         |pr0 AS (SELECT node, CAST(CASE WHEN node IN (${PprSeeds.mkString(", ")})
         |          THEN 1000000 ELSE 0 END AS BIGINT) AS rank FROM nodes),
         |${(0 until Iters).map(pprStep).mkString(",\n")}
         |SELECT node AS item, rank FROM pr$Iters ORDER BY item""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      graft.ops.Graph.personalizedPageRank(edges, "src", "dst", "w",
          seeds = PprSeeds.toSet, iters = Iters)
        .select(col("node").as("item"), col("rank"))
        .orderBy("item")
    },

    // Community-partition MODULARITY — the quality score of gr9's LPA
    // labels, closing the detect→evaluate loop: Q = Σ_c [in_c/m −
    // (tot_c/2m)²] over the undirected merged-weight graph, computed as
    // the exact wide-integer Σ(4·m·in_c − tot_c²) over 4m² (HUGEINT ↔
    // DECIMAL(38,0) — m² products overflow Int64 on heavy graphs) with
    // ONE double division at the end. Distribution: the in-community
    // weight is an edge-list join against the (tiny) label map, degrees
    // and totals are map-side-combined aggregates.
    QueryDef("gr12_modularity",
      s"""WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         |        CAST(props->>'k' AS BIGINT) AS item FROM events),
         |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
         |       FROM it),
         |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
         |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
         |ue AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
         |       FROM edges GROUP BY 1, 2),
         |adj AS (SELECT a AS node, b AS nb, w FROM ue
         |        UNION ALL SELECT b, a, w FROM ue),
         |l0 AS (SELECT DISTINCT node, node AS lab FROM adj),
         |${(0 until LpaRounds).map(lpaStep).mkString(",\n")},
         |lab AS (SELECT node, lab FROM l$LpaRounds),
         |mtot AS (SELECT CAST(SUM(w) AS HUGEINT) AS m FROM ue),
         |inc AS (SELECT la.lab AS c, CAST(SUM(u.w) AS HUGEINT) AS in_c
         |        FROM ue u JOIN lab la ON la.node = u.a
         |        JOIN lab lb ON lb.node = u.b AND lb.lab = la.lab
         |        GROUP BY 1),
         |deg AS (SELECT node, CAST(SUM(w) AS HUGEINT) AS dg FROM adj GROUP BY 1),
         |totc AS (SELECT la.lab AS c, SUM(d.dg) AS tot
         |         FROM deg d JOIN lab la ON la.node = d.node GROUP BY 1),
         |qn AS (SELECT t.c, 4 * m.m * COALESCE(i.in_c, 0) - t.tot * t.tot AS qi
         |       FROM totc t LEFT JOIN inc i ON i.c = t.c, mtot m)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
         |  CAST(SUM(qn.qi) AS DOUBLE) / CAST(4 * m.m * m.m AS DOUBLE) AS modularity
         |FROM qn, mtot m GROUP BY m.m""".stripMargin) { (s, d) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      val labels = graft.ops.Graph.lpaCommunities(edges, "src", "dst", "w",
        iters = LpaRounds)
      val ue = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"), col("w"))
        .groupBy("a", "b").agg(sum("w").as("w"))
      val lab = labels.select(col("node"), col("community").as("lab"))
      val mRow = ue.agg(sum("w").cast(d38).as("m"))
      val inc = ue
        .join(lab.select(col("node").as("a"), col("lab").as("la")), "a")
        .join(lab.select(col("node").as("b"), col("lab").as("lb")), "b")
        .where(col("la") === col("lb"))
        .groupBy(col("la").as("c")).agg(sum("w").cast(d38).as("in_c"))
      val deg = ue.select(col("a").as("node"), col("w"))
        .union(ue.select(col("b").as("node"), col("w")))
        .groupBy("node").agg(sum("w").cast(d38).as("dg"))
      val totc = deg.join(lab, "node").groupBy(col("lab").as("c"))
        .agg(sum("dg").as("tot"))
      val qn = totc.join(inc, Seq("c"), "left").crossJoin(broadcast(mRow))
        .select(col("c"),
          (lit(4) * col("m") * coalesce(col("in_c"), lit(0).cast(d38)) -
            col("tot") * col("tot")).as("qi"), col("m"))
      qn.groupBy("m")
        .agg(count(lit(1)).as("n_communities"), sum("qi").as("qs"))
        .select(col("n_communities"),
          (col("qs").cast("double") /
            (lit(4) * col("m") * col("m")).cast("double")).as("modularity"))
    },

    // Degree ASSORTATIVITY — the Pearson correlation of (source
    // out-degree, target in-degree) across edges: one number telling
    // whether hubs link to hubs (assortative > 0) or to the periphery
    // (< 0), which decides how partition/salting strategies behave on
    // the graph (WEIGHTED degrees — transition multiplicity — so the
    // statistic stays defined even when the unweighted graph is
    // complete; a zero variance yields NULL identically via NULLIF).
    // Exact DECIMAL(38,0)/HUGEINT moment sums (the q37
    // pattern — degree products overflow Int64 on hub-heavy graphs) with
    // one double ÷/√ at the end, bit-equal across engines. Two degree
    // aggregates + two broadcast-size joins + one moment aggregate.
    QueryDef("gr11_assortativity",
      """WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |        CAST(props->>'k' AS BIGINT) AS item FROM events),
        |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
        |       FROM it),
        |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
        |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
        |od AS (SELECT src, CAST(SUM(w) AS HUGEINT) AS xd FROM edges GROUP BY 1),
        |idg AS (SELECT dst, CAST(SUM(w) AS HUGEINT) AS yd FROM edges GROUP BY 1),
        |m AS (SELECT od.xd AS x, idg.yd AS y
        |      FROM edges e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst),
        |a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy FROM m)
        |SELECT CAST(n AS BIGINT) AS n_edges,
        |  CAST(n*sxy - sx*sy AS DOUBLE) /
        |    sqrt(NULLIF(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE), 0))
        |    AS assortativity
        |FROM a""".stripMargin) { (s, d) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      val od = edges.groupBy("src").agg(sum("w").cast(d38).as("xd"))
      val idg = edges.groupBy("dst").agg(sum("w").cast(d38).as("yd"))
      val m = edges.join(od, "src").join(idg, "dst")
        .select(col("xd").as("x"), col("yd").as("y"))
      val a = m.agg(count(lit(1)).cast(d38).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      a.select(col("n").cast(org.apache.spark.sql.types.LongType).as("n_edges"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(nullif(((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), lit(0.0))))
          .as("assortativity"))
    },

    // Community detection: synchronous weighted label propagation over
    // the UNDIRECTED item graph (parallel/either-direction transition
    // weights merged), fixed rounds, deterministic argmax-weight /
    // min-label tie-break — see ops.Graph.lpaCommunities for the update
    // rule and its two-hash-aggregations-per-round distributed shape.
    // Oracle: the same recurrence unrolled as chained CTEs; the window
    // rn=1 formulation is the declarative twin of the engine's
    // struct-MAX aggregate.
    QueryDef("gr9_lpa_communities",
      s"""WITH it AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
         |        CAST(props->>'k' AS BIGINT) AS item FROM events),
         |lg AS (SELECT item, LAG(item) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS src
         |       FROM it),
         |edges AS (SELECT src, item AS dst, CAST(COUNT(*) AS BIGINT) AS w
         |          FROM lg WHERE src IS NOT NULL AND src <> item GROUP BY 1, 2),
         |ue AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
         |       FROM edges GROUP BY 1, 2),
         |adj AS (SELECT a AS node, b AS nb, w FROM ue
         |        UNION ALL SELECT b, a, w FROM ue),
         |l0 AS (SELECT DISTINCT node, node AS lab FROM adj),
         |${(0 until LpaRounds).map(lpaStep).mkString(",\n")}
         |SELECT node AS item, lab AS community FROM l$LpaRounds
         |ORDER BY item""".stripMargin) { (s, d) =>
      val edges = graft.ops.Graph.itemTransitionEdges(Tables.load(s, d, "events"))
      graft.ops.Graph.lpaCommunities(edges, "src", "dst", "w", iters = LpaRounds)
        .select(col("node").as("item"), col("community"))
        .orderBy("item")
    }
  )
}
