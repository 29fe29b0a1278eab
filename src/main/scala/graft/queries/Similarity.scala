package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Embeddings
import org.apache.spark.sql.functions._

/** Embedding similarity queries over the `embeddings` table. Oracles use
  * the same integer micro-unit quantization as graft.ops.Embeddings, so
  * every dot product is exact Int64 arithmetic on both engines.
  */
object Similarity {

  // DuckDB CTE: quantized vectors + squared norms.
  private val quantCte =
    """q0 AS (SELECT vec_id, label,
      |         [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
      |       FROM embeddings),
      |q AS (SELECT vec_id, label, qe,
      |        CAST(list_sum([qe[i]*qe[i] FOR i IN range(1, len(qe)+1)]) AS BIGINT) AS n2
      |      FROM q0)""".stripMargin

  private val dotAb = "CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)"
  private def cosSql(dot: String, na: String, nb: String) =
    s"CAST($dot AS DOUBLE)/(sqrt(CAST($na AS DOUBLE))*sqrt(CAST($nb AS DOUBLE)))"

  private val PLANES = 6
  private val DIM = 64

  /** Per-band signature-array expression for the BANDED ANN oracle: band
    * b's bit string comes from its own slice of the shared md5-derived
    * plane set, prefixed with the band id so bands never collide. */
  private def bandedSigSql(prefix: String, planesPerBand: Int, bands: Int): String = {
    val signs = Embeddings.planeSigns(planesPerBand * bands, DIM)
    (0 until bands).map { b =>
      val sig = signs.slice(b * planesPerBand, (b + 1) * planesPerBand).map { s =>
        val terms = s.zipWithIndex
          .map { case (c, i) => if (c > 0) s"+$prefix.qe[${i + 1}]" else s"-$prefix.qe[${i + 1}]" }
          .mkString("")
        s"(CASE WHEN ($terms) > 0 THEN '1' ELSE '0' END)"
      }.mkString("||")
      s"'$b:'||$sig"
    }.mkString("[", ", ", "]")
  }

  // Signed projection expression per plane for the ANN oracle, using the
  // same md5-derived ±1 components baked into the Spark plan.
  private def sigSql(prefix: String): String = {
    val signs = Embeddings.planeSigns(PLANES, DIM)
    signs.map { s =>
      val terms = s.zipWithIndex
        .map { case (c, i) => if (c > 0) s"+$prefix.qe[${i + 1}]" else s"-$prefix.qe[${i + 1}]" }
        .mkString("")
      s"(CASE WHEN ($terms) > 0 THEN '1' ELSE '0' END)"
    }.mkString("||")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("em1_embed_blocked_pairs",
      s"""WITH $quantCte,
         |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
         |        $dotAb AS dot, a.n2 AS na, b.n2 AS nb
         |      FROM q a JOIN q b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id1, id2, ${cosSql("dot", "na", "nb")} AS cos
         |FROM p WHERE ${cosSql("dot", "na", "nb")} >= 0.4
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      Embeddings.blockedNearDupPairs(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", "label", 0.4)
        .orderBy("id1", "id2")
    },

    QueryDef("sim1_topk_bruteforce",
      s"""WITH $quantCte,
         |qs AS (SELECT vec_id AS query_id, qe, n2 FROM q WHERE vec_id < 10),
         |s AS (SELECT b.query_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM q a JOIN qs b ON a.vec_id <> b.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.topKBruteForce(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 5)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    QueryDef("sim2_ann_lsh",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${sigSql("a")} AS sig FROM q a),
         |qs AS (SELECT vec_id AS query_id, qe, n2, sig FROM sigs WHERE vec_id < 10),
         |s AS (SELECT b.query_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM sigs a JOIN qs b ON a.sig = b.sig AND a.vec_id <> b.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.annTopK(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3, planes = PLANES, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // IVF with trained centroids: 8 seed cells (lowest vec_ids), one
    // exact-integer Lloyd refinement (truncating // mean), probe the 2
    // nearest cells per query, exact cosine rank within them. The oracle
    // replays the identical training: every distance is
    // n2 - 2·dot + c_n2 in Int64, ties to the lowest cell.
    QueryDef("sim3_ann_ivf", {
      def dot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 65)]) AS BIGINT)"
      def n2(a: String) = dot(a, a)
      s"""WITH $quantCte,
         |seeds AS (SELECT vec_id AS cell, qe AS cent FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM seeds),
         |a0 AS (SELECT q.vec_id, q.qe, q.n2, sd.cell FROM q, sd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "sd.cent")} + sd.c_n2, sd.cell) = 1),
         |cm AS (SELECT cell, i, SUM(qe[i]) AS s, COUNT(*) AS c
         |       FROM a0, range(1, 65) t(i) GROUP BY cell, i),
         |cent AS (SELECT cell, list(s // c ORDER BY i) AS cent FROM cm GROUP BY cell),
         |cd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM cent),
         |a1 AS (SELECT q.vec_id, q.qe, q.n2, cd.cell FROM q, cd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "cd.cent")} + cd.c_n2, cd.cell) = 1),
         |qs AS (SELECT vec_id AS query_id, qe AS q_qe, n2 AS q_n2 FROM q WHERE vec_id < 10),
         |pr AS (SELECT query_id, q_qe, q_n2, cd.cell FROM qs, cd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |         ORDER BY q_n2 - 2*${dot("q_qe", "cd.cent")} + cd.c_n2, cd.cell) <= 2),
         |cand AS (SELECT pr.query_id, a1.vec_id AS neighbor_id,
         |           ${cosSql(dot("a1.qe", "pr.q_qe"), "a1.n2", "pr.q_n2")} AS cos
         |         FROM a1 JOIN pr ON a1.cell = pr.cell AND a1.vec_id <> pr.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM cand)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    }) { (s, d) =>
      Embeddings.ivfTopK(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3, numCells = 8, nprobe = 2)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // SemDeDup: same trained-centroid clustering as sim3, then inside
    // each cluster every vector with a lower-id cluster-mate at cosine
    // >= 0.4 is pruned (kept = 0). The oracle replays the identical
    // integer Lloyd training and pairwise check.
    QueryDef("dd8_dedup_semantic", {
      def dot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 65)]) AS BIGINT)"
      def n2(a: String) = dot(a, a)
      s"""WITH $quantCte,
         |seeds AS (SELECT vec_id AS cell, qe AS cent FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM seeds),
         |a0 AS (SELECT q.vec_id, q.qe, q.n2, sd.cell FROM q, sd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "sd.cent")} + sd.c_n2, sd.cell) = 1),
         |cm AS (SELECT cell, i, SUM(qe[i]) AS s, COUNT(*) AS c
         |       FROM a0, range(1, 65) t(i) GROUP BY cell, i),
         |cent AS (SELECT cell, list(s // c ORDER BY i) AS cent FROM cm GROUP BY cell),
         |cd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM cent),
         |a1 AS (SELECT q.vec_id, q.qe, q.n2, cd.cell FROM q, cd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "cd.cent")} + cd.c_n2, cd.cell) = 1),
         |pr AS (SELECT DISTINCT b.vec_id
         |       FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |       WHERE ${cosSql(dot("a.qe", "b.qe"), "a.n2", "b.n2")} >= 0.4)
         |SELECT a1.vec_id, CAST(a1.cell AS BIGINT) AS cell,
         |  CAST(CASE WHEN pr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM a1 LEFT JOIN pr ON a1.vec_id = pr.vec_id
         |ORDER BY a1.vec_id""".stripMargin
    }) { (s, d) =>
      Embeddings.semDedup(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", numCells = 8, threshold = 0.4)
        .orderBy("vec_id")
    },

    // Product-quantization ANN: 4 subspaces x 16 dims, 8-codeword
    // codebooks (seeds = lowest vec_ids, one exact-integer Lloyd
    // refinement per subspace), ADC candidate scoring against the
    // reconstruction, exact-cosine re-rank of the top 10 to the final 3.
    // The oracle replays the identical per-subspace training/encoding.
    QueryDef("sim4_ann_pq", {
      def sdot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 17)]) AS BIGINT)"
      def fdot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 65)]) AS BIGINT)"
      s"""WITH $quantCte,
         |sv AS (SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         list_slice(qe, s*16+1, s*16+16) AS sv
         |       FROM q, UNNEST(range(0, 4)) t(s)),
         |seedids AS (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT sv.sub, sv.vec_id AS cell, sv.sv AS cent,
         |         ${sdot("sv.sv", "sv.sv")} AS c_n2
         |       FROM sv JOIN seedids USING (vec_id)),
         |a0 AS (SELECT sv.vec_id, sv.sub, sv.sv, sd.cell
         |       FROM sv JOIN sd ON sv.sub = sd.sub
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |         ORDER BY sd.c_n2 - 2*${sdot("sv.sv", "sd.cent")}, sd.cell) = 1),
         |cm AS (SELECT sub, cell, i, SUM(sv[i]) AS s, COUNT(*) AS c
         |       FROM a0, UNNEST(range(1, 17)) t(i) GROUP BY sub, cell, i),
         |cent AS (SELECT sub, cell, list(s // c ORDER BY i) AS cent
         |         FROM cm GROUP BY sub, cell),
         |cd AS (SELECT sub, cell, cent, ${sdot("cent", "cent")} AS c_n2 FROM cent),
         |codes AS (SELECT sv.vec_id, sv.sub, cd.cell
         |          FROM sv JOIN cd ON sv.sub = cd.sub
         |          QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |            ORDER BY cd.c_n2 - 2*${sdot("sv.sv", "cd.cent")}, cd.cell) = 1),
         |rv AS (SELECT codes.vec_id, flatten(list(cd.cent ORDER BY codes.sub)) AS r
         |       FROM codes JOIN cd ON codes.sub = cd.sub AND codes.cell = cd.cell
         |       GROUP BY codes.vec_id),
         |qs AS (SELECT vec_id AS query_id, qe AS q_qe, n2 AS q_n2 FROM q WHERE vec_id < 10),
         |cand AS (SELECT qs.query_id, rv.vec_id AS neighbor_id
         |         FROM rv, qs WHERE rv.vec_id <> qs.query_id
         |         QUALIFY ROW_NUMBER() OVER (PARTITION BY qs.query_id
         |           ORDER BY ${fdot("qs.q_qe", "rv.r")} DESC, rv.vec_id) <= 10),
         |ex AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${cosSql(fdot("q.qe", "qs.q_qe"), "q.n2", "qs.q_n2")} AS cos
         |       FROM cand JOIN q ON q.vec_id = cand.neighbor_id
         |       JOIN qs ON qs.query_id = cand.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM ex)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    }) { (s, d) =>
      Embeddings.pqTopK(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3,
          numSub = 4, subDim = 16, codebookSize = 8, candK = 10)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // IVF cell-BALANCE QA — the coarse quantizer's population profile:
    // a hot cell bounds probe latency by ITSELF, not the average (the
    // reason index builders re-train or split skewed cells). The oracle
    // replays sim3's exact-integer Lloyd training and counts the same
    // final assignment.
    QueryDef("sim12_ivf_balance", {
      def dot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 65)]) AS BIGINT)"
      def n2(a: String) = dot(a, a)
      s"""WITH $quantCte,
         |seeds AS (SELECT vec_id AS cell, qe AS cent FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM seeds),
         |a0 AS (SELECT q.vec_id, q.qe, sd.cell FROM q, sd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "sd.cent")} + sd.c_n2, sd.cell) = 1),
         |cm AS (SELECT cell, i, SUM(qe[i]) AS s, COUNT(*) AS c
         |       FROM a0, range(1, 65) t(i) GROUP BY cell, i),
         |cent AS (SELECT cell, list(s // c ORDER BY i) AS cent FROM cm GROUP BY cell),
         |cd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM cent),
         |a1 AS (SELECT q.vec_id, cd.cell FROM q, cd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "cd.cent")} + cd.c_n2, cd.cell) = 1),
         |sz AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS sz FROM a1 GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, CAST(SUM(sz) AS BIGINT) AS n_vecs,
         |  CAST(MIN(sz) AS BIGINT) AS min_sz, CAST(MAX(sz) AS BIGINT) AS max_sz,
         |  CAST(1000000 * MAX(sz) * COUNT(*) // SUM(sz) AS BIGINT) AS balance_ppm
         |FROM sz""".stripMargin
    }) { (s, d) =>
      Embeddings.ivfCellProfile(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", numCells = 8, lloydIters = 1)
    },

    // PQ quantization DISTORTION — per-subspace Σ‖subvector − assigned
    // codeword‖² over the corpus (exact micro-unit² Int64), the QA
    // number that sizes codebookSize/subDim before an index build. The
    // oracle replays sim4's training verbatim and measures the same
    // reconstruction error.
    QueryDef("sim11_pq_distortion", {
      def sdot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 17)]) AS BIGINT)"
      s"""WITH $quantCte,
         |sv AS (SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         list_slice(qe, s*16+1, s*16+16) AS sv
         |       FROM q, UNNEST(range(0, 4)) t(s)),
         |seedids AS (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT sv.sub, sv.vec_id AS cell, sv.sv AS cent,
         |         ${sdot("sv.sv", "sv.sv")} AS c_n2
         |       FROM sv JOIN seedids USING (vec_id)),
         |a0 AS (SELECT sv.vec_id, sv.sub, sv.sv, sd.cell
         |       FROM sv JOIN sd ON sv.sub = sd.sub
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |         ORDER BY sd.c_n2 - 2*${sdot("sv.sv", "sd.cent")}, sd.cell) = 1),
         |cm AS (SELECT sub, cell, i, SUM(sv[i]) AS s, COUNT(*) AS c
         |       FROM a0, UNNEST(range(1, 17)) t(i) GROUP BY sub, cell, i),
         |cent AS (SELECT sub, cell, list(s // c ORDER BY i) AS cent
         |         FROM cm GROUP BY sub, cell),
         |cd AS (SELECT sub, cell, cent, ${sdot("cent", "cent")} AS c_n2 FROM cent),
         |codes AS (SELECT sv.vec_id, sv.sub, sv.sv, cd.cell, cd.cent
         |          FROM sv JOIN cd ON sv.sub = cd.sub
         |          QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |            ORDER BY cd.c_n2 - 2*${sdot("sv.sv", "cd.cent")}, cd.cell) = 1),
         |err AS (SELECT sub, vec_id,
         |          CAST(list_sum([(sv[i]-cent[i])*(sv[i]-cent[i])
         |                         FOR i IN range(1, 17)]) AS BIGINT) AS e
         |        FROM codes)
         |SELECT sub, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(SUM(e) AS BIGINT) AS total_err,
         |  CAST(SUM(e) // COUNT(*) AS BIGINT) AS avg_err
         |FROM err GROUP BY sub ORDER BY sub""".stripMargin
    }) { (s, d) =>
      Embeddings.pqDistortion(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", numSub = 4, subDim = 16, codebookSize = 8)
        .orderBy("sub")
    },

    // IVF-PQ: the production ANN composition — sim3's trained coarse
    // cells bound the candidate set (2 probed cells per query), sim4's
    // PQ codes bound the scan bytes (ADC against reconstructions inside
    // the probed cells), exact re-rank of the top 10 to the final 3.
    // The oracle chains both trainings verbatim.
    QueryDef("sim5_ann_ivfpq", {
      def sdot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 17)]) AS BIGINT)"
      def fdot(a: String, b: String) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, 65)]) AS BIGINT)"
      s"""WITH $quantCte,
         |seeds AS (SELECT vec_id AS cell, qe AS cent FROM q ORDER BY vec_id LIMIT 8),
         |isd AS (SELECT cell, cent, ${fdot("cent", "cent")} AS c_n2 FROM seeds),
         |ia0 AS (SELECT q.vec_id, q.qe, q.n2, isd.cell FROM q, isd
         |        QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |          ORDER BY q.n2 - 2*${fdot("q.qe", "isd.cent")} + isd.c_n2, isd.cell) = 1),
         |icm AS (SELECT cell, i, SUM(qe[i]) AS s, COUNT(*) AS c
         |        FROM ia0, range(1, 65) t(i) GROUP BY cell, i),
         |icent AS (SELECT cell, list(s // c ORDER BY i) AS cent FROM icm GROUP BY cell),
         |icd AS (SELECT cell, cent, ${fdot("cent", "cent")} AS c_n2 FROM icent),
         |ia1 AS (SELECT q.vec_id, q.qe, q.n2, icd.cell FROM q, icd
         |        QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |          ORDER BY q.n2 - 2*${fdot("q.qe", "icd.cent")} + icd.c_n2, icd.cell) = 1),
         |sv AS (SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         list_slice(qe, s*16+1, s*16+16) AS sv
         |       FROM q, UNNEST(range(0, 4)) t(s)),
         |sd AS (SELECT sv.sub, sv.vec_id AS cell, sv.sv AS cent,
         |         ${sdot("sv.sv", "sv.sv")} AS c_n2
         |       FROM sv JOIN (SELECT vec_id FROM q ORDER BY vec_id LIMIT 8) si USING (vec_id)),
         |a0 AS (SELECT sv.vec_id, sv.sub, sv.sv, sd.cell
         |       FROM sv JOIN sd ON sv.sub = sd.sub
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |         ORDER BY sd.c_n2 - 2*${sdot("sv.sv", "sd.cent")}, sd.cell) = 1),
         |cm AS (SELECT sub, cell, i, SUM(sv[i]) AS s, COUNT(*) AS c
         |       FROM a0, UNNEST(range(1, 17)) t(i) GROUP BY sub, cell, i),
         |cent AS (SELECT sub, cell, list(s // c ORDER BY i) AS cent
         |         FROM cm GROUP BY sub, cell),
         |cd AS (SELECT sub, cell, cent, ${sdot("cent", "cent")} AS c_n2 FROM cent),
         |codes AS (SELECT sv.vec_id, sv.sub, cd.cell
         |          FROM sv JOIN cd ON sv.sub = cd.sub
         |          QUALIFY ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
         |            ORDER BY cd.c_n2 - 2*${sdot("sv.sv", "cd.cent")}, cd.cell) = 1),
         |rv AS (SELECT codes.vec_id, flatten(list(cd.cent ORDER BY codes.sub)) AS r
         |       FROM codes JOIN cd ON codes.sub = cd.sub AND codes.cell = cd.cell
         |       GROUP BY codes.vec_id),
         |qs AS (SELECT vec_id AS query_id, qe AS q_qe, n2 AS q_n2 FROM q WHERE vec_id < 10),
         |pr AS (SELECT query_id, q_qe, q_n2, icd.cell FROM qs, icd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |         ORDER BY q_n2 - 2*${fdot("q_qe", "icd.cent")} + icd.c_n2, icd.cell) <= 2),
         |cand AS (SELECT pr.query_id, ia1.vec_id AS neighbor_id
         |         FROM ia1 JOIN pr ON ia1.cell = pr.cell AND ia1.vec_id <> pr.query_id
         |         JOIN rv ON rv.vec_id = ia1.vec_id
         |         QUALIFY ROW_NUMBER() OVER (PARTITION BY pr.query_id
         |           ORDER BY ${fdot("pr.q_qe", "rv.r")} DESC, ia1.vec_id) <= 10),
         |ex AS (SELECT cand.query_id, cand.neighbor_id,
         |         ${cosSql(fdot("q.qe", "qs.q_qe"), "q.n2", "qs.q_n2")} AS cos
         |       FROM cand JOIN q ON q.vec_id = cand.neighbor_id
         |       JOIN qs ON qs.query_id = cand.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY cos DESC, neighbor_id) AS rnk FROM ex)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    }) { (s, d) =>
      Embeddings.ivfPqTopK(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3,
          numCells = 8, nprobe = 2, numSub = 4, subDim = 16,
          codebookSize = 8, candK = 10)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // The distributed half of PCA: the one-pass Gram/moment aggregate
    // ([n, Σv, Σvvᵀ upper triangle] in exact Int64 on scale-reduced
    // components — functions.GramAggregate, fixed ~17 KB state per
    // partial regardless of corpus size). The oracle recomputes every
    // slot with plain SQL sums; divisions truncate toward zero on both
    // engines (components are signed, so the oracle spells the
    // truncation out instead of using floor-//). The driver-side
    // eigensolve + projection that CONSUME this buffer are spec-tested
    // (OpsSpec planted low-rank recovery) and served by em3.
    QueryDef("em2_pca_gram", {
      val dim = DIM
      // buffer slot of gram (i, j), 1-based i <= j:
      // 1 + dim + pairs-before-row-i + (j - i), pairs-before = (i-1)(2dim-i+2)/2
      s"""WITH q0 AS (SELECT [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
         |           FROM embeddings),
         |v AS (SELECT [CASE WHEN e >= 0 THEN e // 1000 ELSE -((-e) // 1000) END FOR e IN qe] AS r
         |      FROM q0),
         |cnt AS (SELECT CAST(0 AS BIGINT) AS idx, CAST(COUNT(*) AS BIGINT) AS val FROM v),
         |dims AS (SELECT CAST(i AS BIGINT) AS i FROM range(1, ${dim + 1}) t(i)),
         |sums AS (SELECT i AS idx, CAST(SUM(r[i]) AS BIGINT) AS val FROM v, dims GROUP BY i),
         |pairs AS (SELECT a.i, b.i AS j FROM dims a, dims b WHERE b.i >= a.i),
         |gram AS (SELECT CAST(${dim + 1} + ((i-1)*(${2 * dim + 2}-i))//2 + (j-i) AS BIGINT) AS idx,
         |                CAST(SUM(r[i]*r[j]) AS BIGINT) AS val
         |         FROM v, pairs GROUP BY i, j)
         |SELECT idx, val FROM (SELECT * FROM cnt UNION ALL SELECT * FROM sums
         |                      UNION ALL SELECT * FROM gram) ORDER BY idx""".stripMargin
    }) { (s, d) =>
      Embeddings.prepared(Tables.load(s, d, "embeddings"), "vec_id", "embedding")
        .agg(graft.functions.GramAggregate.gram_acc(col("qe"), DIM, 1000L).as("g"))
        .select(posexplode(col("g")).as(Seq("idx", "val")))
        .select(col("idx").cast("long").as("idx"), col("val"))
        .orderBy("idx")
    },

    // The serving half of PCA, verified by INVARIANT: the eigensolve is
    // driver-side Jacobi (not SQL-expressible), but what it guarantees
    // IS — so the Spark side measures, distributed over every projected
    // row, the properties the eigenbasis must have (diagonal projection
    // covariance, per-component energy = eigenvalue, preserved trace,
    // centering, PSD spectrum) while the oracle pins each expected value,
    // recomputing the count and the exact-Int64 covariance trace from
    // the raw table as the non-circular data anchor (same SQL-sums
    // identity em2 already proves for the full Gram buffer). The
    // projection values themselves are value-checked by OpsSpec
    // (planted low-rank recovery + repartition determinism).
    QueryDef("em3_pca_project", {
      val dim = DIM
      val outDim = 4
      s"""WITH q0 AS (SELECT [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
         |            FROM embeddings),
         |v AS (SELECT [CASE WHEN e >= 0 THEN e // 1000 ELSE -((-e) // 1000) END FOR e IN qe] AS r
         |      FROM q0),
         |dims AS (SELECT CAST(i AS BIGINT) AS i FROM range(1, ${dim + 1}) t(i)),
         |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
         |mom AS (SELECT i, CAST(SUM(r[i]) AS BIGINT) AS s, CAST(SUM(r[i]*r[i]) AS BIGINT) AS g
         |        FROM v, dims GROUP BY i),
         |tr AS (SELECT CAST(SUM(cnt.n * mom.g - mom.s * mom.s) AS BIGINT) AS t FROM mom, cnt),
         |comps AS (SELECT CAST(i AS BIGINT) AS i FROM range(0, $outDim) t(i)),
         |pairs AS (SELECT a.i AS i, b.i AS j FROM comps a, comps b WHERE b.i > a.i)
         |SELECT * FROM (
         |  SELECT 'count' AS chk, CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j, n AS v FROM cnt
         |  UNION ALL SELECT 'trace_exact', -1, -1, t FROM tr
         |  UNION ALL SELECT 'eig_trace_ppm', -1, -1, 1000000
         |  UNION ALL SELECT 'psd_ok', -1, -1, 1
         |  UNION ALL SELECT 'energy_ppm', i, i, 1000000 FROM comps
         |  UNION ALL SELECT 'orth_ppm', i, j, 0 FROM pairs
         |  UNION ALL SELECT 'mean_ppm', i, -1, 0 FROM comps
         |) ORDER BY chk, i, j""".stripMargin
    }) { (s, d) =>
      Embeddings.pcaInvariantAudit(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", dim = DIM, outDim = 4)
    },

    // Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    // fuse the BM25 top-20 (tx23's all-integer rank math) with the dense
    // cosine top-20 for one query vector. Each list contributes
    // floor(1e12/(60+rank)) micro-points — integer-exact on both engines,
    // docs absent from a list contribute 0 (the standard RRF treatment).
    // At scale both branches END in bounded top-k relations, so the
    // fusion join is over two ≤k-row frames (broadcast, corpus-size
    // independent) — the corpus is only touched by the already-audited
    // tx23/sim1 plans.
    QueryDef("p2_hybrid_rrf",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS a FROM d),
         |tf AS (SELECT doc_id, len, w, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM (SELECT doc_id, len, u.w AS w FROM d, UNNEST(toks) AS u(w))
         |       WHERE w IN ('hash', 'join', 'filter') GROUP BY 1, 2, 3),
         |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |bsc AS (SELECT tf.doc_id,
         |          CAST(FLOOR(ln((t.n - dfq.df + 0.5)/(dfq.df + 0.5) + 1.0)*1000000.0 + 0.5) AS BIGINT)
         |            * ((22 * t.a * tf.tf * 1000000) // (10 * t.a * tf.tf + 3 * t.a + 9 * tf.len * t.n)) AS part
         |        FROM tf JOIN dfq USING (w), tot t),
         |bs AS (SELECT doc_id, CAST(SUM(part) AS BIGINT) AS score FROM bsc GROUP BY 1),
         |sp AS (SELECT doc_id, rnk FROM (SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
         |       FROM bs) WHERE rnk <= 20),
         |$quantCte,
         |qv AS (SELECT qe AS q_qe, n2 AS q_n2 FROM q WHERE vec_id = 0),
         |ds AS (SELECT a.vec_id AS doc_id,
         |         ${cosSql("CAST(list_sum([a.qe[i]*qv.q_qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "qv.q_n2")} AS cos
         |       FROM q a, qv WHERE a.vec_id <> 0),
         |dt AS (SELECT doc_id, rnk FROM (SELECT doc_id,
         |         CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS BIGINT) AS rnk
         |       FROM ds) WHERE rnk <= 20),
         |f AS (SELECT COALESCE(sp.doc_id, dt.doc_id) AS doc_id,
         |        COALESCE(1000000000000 // (60 + sp.rnk), 0)
         |          + COALESCE(1000000000000 // (60 + dt.rnk), 0) AS rrf,
         |        CASE WHEN sp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_sparse,
         |        CASE WHEN dt.doc_id IS NOT NULL THEN 1 ELSE 0 END AS in_dense
         |      FROM sp FULL JOIN dt ON sp.doc_id = dt.doc_id)
         |SELECT doc_id, CAST(rrf AS BIGINT) AS rrf,
         |  CAST(in_sparse AS BIGINT) AS in_sparse, CAST(in_dense AS BIGINT) AS in_dense
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.LongType
      val sparse = graft.ops.TextAnalysis.bm25Search(
          Tables.load(s, d, "documents"), "doc_id", "text",
          Seq("hash", "join", "filter"), k = 20)
        .select(col("doc_id"), col("rnk").cast(LongType).as("srnk"))
      val dense = Embeddings.topKBruteForce(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") === 0, k = 20)
        .select(col("neighbor_id").cast(LongType).as("doc_id"),
          col("rnk").cast(LongType).as("drnk"))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(expr("1000000000000 div (60 + srnk)"), lit(0L)) +
            coalesce(expr("1000000000000 div (60 + drnk)"), lit(0L))).as("rrf"),
          when(col("srnk").isNotNull, 1L).otherwise(0L).as("in_sparse"),
          when(col("drnk").isNotNull, 1L).otherwise(0L).as("in_dense"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },

    // MMR diversified top-k (Carbonell & Goldstein 1998): balance query
    // relevance against redundancy with already-selected results — the
    // diversity re-rank of a RAG/search pipeline. Spark: distributed
    // candidate generation + bounded driver greedy (ops.Embeddings
    // .mmrTopK). Oracle: the SAME greedy unrolled as k chained CTE steps
    // (the gr1 pattern) — each step scores remaining candidates
    // 0.7·rel − 0.3·max-sim-to-selected and picks the (score, id) max.
    QueryDef("sim6_mmr_diverse", mmrOracleSql(queryId = 0, candK = 16, k = 5)) { (s, d) =>
      Embeddings.mmrTopK(Tables.load(s, d, "embeddings"), "vec_id", "embedding",
        queryId = 0L, candK = 16, k = 5)
        .orderBy("rnk")
    },

    // Attribute-filtered ANN — "top-3 similar WHERE label = 2": the
    // candidate predicate applies BEFORE the bucket join and the
    // distance math (post-filtering a plain top-k under-fills k — the
    // classic filtered-ANN bug). Same LSH blocking/recall trade as sim2.
    QueryDef("sim7_ann_filtered",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.label, a.qe, a.n2, ${sigSql("a")} AS sig FROM q a),
         |qs AS (SELECT vec_id AS query_id, qe, n2, sig FROM sigs WHERE vec_id < 10),
         |s AS (SELECT b.query_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM sigs a JOIN qs b ON a.sig = b.sig AND a.vec_id <> b.query_id
         |      WHERE a.label = 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.annTopKFiltered(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, col("label") === 2,
          k = 3, planes = PLANES, dim = DIM, extraCols = Seq("label"))
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // k-NN GRAPH build — every vector's 3 nearest LSH-bucket-mates (the
    // base-layer construction of graph-ANN indexes and the edge list
    // graph-based dedup/community pipelines start from). Spark:
    // ops.Embeddings.knnGraph — signature SELF-join (shuffle on the
    // signature key, both sides corpus-sized, never a broadcast or
    // all-pairs) + the bounded TopKScoredAggregate per node. The oracle
    // is sim2's formulation with EVERY node as a query.
    QueryDef("sim9_knn_graph",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${sigSql("a")} AS sig FROM q a),
         |s AS (SELECT b.vec_id AS node_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT node_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY node_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.knnGraph(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", k = 3, planes = PLANES, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("node_id", "rnk")
    },

    // BANDED k-NN graph — sim9's structural scale answer: `bands`
    // INDEPENDENT narrow signatures instead of one wide one, the (B, R)
    // recall-vs-candidates dial of production LSH (dd3's minhash banding
    // applied to hyperplane signatures). Pairs surfaced by several bands
    // rank ONCE (exact-cosine dedupe before the bounded top-k); the
    // oracle unnests the same band array and DISTINCTs identically.
    QueryDef("sim13_knn_graph_banded",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS (SELECT vec_id, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |s AS (SELECT DISTINCT b.vec_id AS node_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT node_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY node_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.knnGraphBanded(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", k = 3, planesPerBand = 6, bands = 3, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("node_id", "rnk")
    },

    // INCREMENTAL kNN-graph maintenance — the daily index refresh: 90%
    // of the corpus has an existing sim13 graph, the other 10% arrives
    // as a batch; Spark computes only batch-touching candidates and
    // re-ranks them with the stored edges (Embeddings.knnGraphIncrement).
    // The oracle is deliberately the FULL REBUILD over everything —
    // hash-equality IS the proof that incremental maintenance loses
    // nothing (top-k(all) = top-k(top-k(old) ∪ touching-batch); see the
    // operator's scaladoc for why candidates only accumulate).
    QueryDef("sim16_knn_increment",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS MATERIALIZED (SELECT vec_id, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |s AS (SELECT DISTINCT b.vec_id AS node_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_dot_product(a.qe, b.qe) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT node_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY node_id, rnk""".stripMargin) { (s, d) =>
      val emb = Tables.load(s, d, "embeddings")
      val corpus = emb.filter(col("vec_id") % 10 =!= 0)
      val batch = emb.filter(col("vec_id") % 10 === 0)
      val edges = Embeddings.knnGraphBanded(corpus, "vec_id", "embedding",
        k = 3, planesPerBand = 6, bands = 3, dim = DIM)
      Embeddings.knnGraphIncrement(edges, corpus, batch, "vec_id", "embedding",
          k = 3, planesPerBand = 6, bands = 3, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("node_id", "rnk")
    },

    // kNN-graph DELETION — the tombstone half of index maintenance
    // (sim16 is the insert half): every 7th vector is forgotten; Spark
    // repairs ONLY the affected nodes (stored lists referencing a
    // tombstone) from their band signatures against the survivors.
    // Deletion is non-monotone (backfill comes from candidates the
    // k-bounded build discarded), so hash-equality against this oracle —
    // the FULL REBUILD over the survivors — is the strongest possible
    // check of the repair logic.
    QueryDef("sim17_knn_delete",
      s"""WITH q0 AS (SELECT vec_id, label,
         |         [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
         |       FROM embeddings WHERE vec_id % 7 <> 0),
         |q AS (SELECT vec_id, label, qe,
         |        CAST(list_sum([qe[i]*qe[i] FOR i IN range(1, len(qe)+1)]) AS BIGINT) AS n2
         |      FROM q0),
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS MATERIALIZED (SELECT vec_id, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |s AS (SELECT DISTINCT b.vec_id AS node_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_dot_product(a.qe, b.qe) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT node_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY node_id, rnk""".stripMargin) { (s, d) =>
      val emb = Tables.load(s, d, "embeddings")
      val edges = Embeddings.knnGraphBanded(emb, "vec_id", "embedding",
        k = 3, planesPerBand = 6, bands = 3, dim = DIM)
      val deleted = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
      Embeddings.knnGraphDelete(edges, emb, deleted, "vec_id", "embedding",
          k = 3, planesPerBand = 6, bands = 3, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("node_id", "rnk")
    },

    // BANDED query-time ANN — sim2's query shape on sim13's (B, R)
    // dial: the query subset broadcasts, each of its R narrow band
    // signatures joins the corpus's matching band, and a pair surfaced
    // by several bands ranks once (exact-cosine DISTINCT before the
    // bounded top-k — identical on both engines).
    QueryDef("sim14_ann_banded",
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS (SELECT vec_id, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |qs AS (SELECT vec_id AS query_id, qe, n2, sig FROM e WHERE vec_id < 10),
         |s AS (SELECT DISTINCT b.query_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN qs b ON a.sig = b.sig AND a.vec_id <> b.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s)
         |SELECT query_id, neighbor_id, cos, CAST(rnk AS BIGINT) AS rnk
         |FROM r WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
      Embeddings.annTopKBanded(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", col("vec_id") < 10, k = 3,
          planesPerBand = 6, bands = 3, dim = DIM)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("query_id", "rnk")
    },

    // SEMI-SUPERVISED LABEL SPREAD pipeline — pseudo-label the corpus by
    // propagating a 20% seeded label sample over the banded kNN graph
    // (sim13's index feeding Graph.labelSpread's clamped synchronous
    // majority-vote LPA, Zhu & Ghahramani 2002), then score every node
    // against its held-back true label. The production shape for
    // classifier-bootstrap labeling: label a sample, spread over
    // similarity structure, measure before trusting. The oracle replays
    // the sim13 CTE chain and three propagation rounds.
    QueryDef("p5_label_spread", {
      // l{i-1} feeds BOTH v_i and l_i, and adj feeds every round — without
      // AS MATERIALIZED DuckDB re-inlines the whole upstream banded
      // self-join per reference (2^rounds expansions; 19 s → 0.2 s at
      // sf0.01). See the verify skill's chained-CTE rule.
      def step(i: Int): String =
        s"""v$i AS (SELECT adj.node, l.lab AS nblab, COUNT(*) AS c
           |       FROM adj JOIN l${i - 1} l ON l.node = adj.nb
           |       WHERE l.lab IS NOT NULL GROUP BY 1, 2),
           |b$i AS (SELECT node, nblab AS vlab FROM (
           |         SELECT *, ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, nblab) AS rn
           |         FROM v$i) WHERE rn = 1),
           |l$i AS MATERIALIZED (SELECT l.node, l.slab, COALESCE(l.slab, COALESCE(b.vlab, l.lab)) AS lab
           |       FROM l${i - 1} l LEFT JOIN b$i b USING(node))""".stripMargin
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS MATERIALIZED (SELECT vec_id, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |s AS (SELECT DISTINCT b.vec_id AS node_id, a.vec_id AS neighbor_id,
         |        ${cosSql("CAST(list_dot_product(a.qe, b.qe) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s),
         |knn AS (SELECT node_id, neighbor_id FROM r WHERE rnk <= 3),
         |und AS (SELECT DISTINCT LEAST(node_id, neighbor_id) AS a,
         |               GREATEST(node_id, neighbor_id) AS b FROM knn),
         |adj AS MATERIALIZED (SELECT a AS node, b AS nb FROM und UNION ALL SELECT b, a FROM und),
         |seeds AS MATERIALIZED (SELECT vec_id AS node, CAST(label AS BIGINT) AS slab
         |          FROM embeddings WHERE vec_id % 5 = 0),
         |l0 AS MATERIALIZED (SELECT n.node, s.slab, s.slab AS lab
         |       FROM (SELECT DISTINCT node FROM adj) n LEFT JOIN seeds s USING(node)),
         |${(1 to 3).map(step).mkString(",\n")}
         |SELECT em.vec_id, em.vec_id % 5 = 0 AS is_seed,
         |  CAST(em.label AS BIGINT) AS actual_label,
         |  COALESCE(l3.lab, -1) AS predicted_label,
         |  COALESCE(l3.lab, -1) = CAST(em.label AS BIGINT) AS correct
         |FROM embeddings em LEFT JOIN l3 ON l3.node = em.vec_id
         |ORDER BY em.vec_id""".stripMargin
    }) { (s, d) =>
      val emb = Tables.load(s, d, "embeddings")
      val edges = Embeddings.knnGraphBanded(emb, "vec_id", "embedding",
        k = 3, planesPerBand = 6, bands = 3, dim = DIM)
      val seeds = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("label"))
      val spread = graft.ops.Graph.labelSpread(edges, "node_id", "neighbor_id",
        seeds, "vec_id", "label", iters = 3)
      emb.join(spread, emb("vec_id") === spread("node"), "left")
        .select(emb("vec_id"),
          (emb("vec_id") % 5 === 0).as("is_seed"),
          emb("label").cast("long").as("actual_label"),
          coalesce(col("lab"), lit(-1L)).as("predicted_label"),
          (coalesce(col("lab"), lit(-1L)) === emb("label").cast("long")).as("correct"))
        .orderBy("vec_id")
    },

    // IR RANKING METRICS of the banded ANN path (sim14's index) against
    // label-proxy relevance — MRR, recall@k and binary nDCG@k per query,
    // the offline eval every retrieval deployment runs on a query sample
    // before shipping an index rebuild. All metric floats are single
    // divisions of identical Int64 operands; the DCG discount table is
    // round(1e6/log2(r+1)) ppm integers baked as THE SAME literals into
    // both plans (Embeddings.dcgWeightsPpm), so nDCG needs no cross-engine
    // float summation. Oracle = sim14's CTE chain + the metric layer.
    QueryDef("sim15_ir_metrics", {
      val k = 10
      val w = Embeddings.dcgWeightsPpm(k)
      val idcg = w.scanLeft(0L)(_ + _).tail
      val wCase = "CASE rnk " +
        (1 to k).map(r => s"WHEN $r THEN ${w(r - 1)}").mkString(" ") + " END"
      val idcgCase = "CASE LEAST(10, lc.c - 1) " +
        (1 to k).map(m => s"WHEN $m THEN ${idcg(m - 1)}").mkString(" ") + " END"
      s"""WITH $quantCte,
         |sigs AS (SELECT a.vec_id, a.label, a.qe, a.n2, ${bandedSigSql("a", 6, 3)} AS bsigs FROM q a),
         |e AS (SELECT vec_id, label, qe, n2, UNNEST(bsigs) AS sig FROM sigs),
         |qs AS (SELECT vec_id AS query_id, label AS q_label, qe, n2, sig FROM e WHERE vec_id < 10),
         |s AS (SELECT DISTINCT b.query_id, b.q_label, a.vec_id AS neighbor_id,
         |        a.label AS nb_label,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos
         |      FROM e a JOIN qs b ON a.sig = b.sig AND a.vec_id <> b.query_id),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s),
         |t AS (SELECT * FROM r WHERE rnk <= $k),
         |lc AS (SELECT label, COUNT(*) AS c FROM q GROUP BY 1),
         |m AS (SELECT query_id, q_label,
         |        CAST(SUM(CASE WHEN nb_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
         |        CAST(COALESCE(MIN(CASE WHEN nb_label = q_label THEN rnk END), 0) AS BIGINT) AS first_rel_rank,
         |        CAST(SUM(CASE WHEN nb_label = q_label THEN $wCase ELSE 0 END) AS BIGINT) AS dcg_ppm
         |      FROM t GROUP BY 1, 2)
         |SELECT m.query_id, CAST(m.q_label AS BIGINT) AS q_label,
         |  CAST(lc.c - 1 AS BIGINT) AS n_rel_corpus, n_rel_topk, first_rel_rank, dcg_ppm,
         |  CASE WHEN first_rel_rank > 0 THEN CAST(1 AS DOUBLE)/first_rel_rank ELSE 0.0 END AS rr,
         |  CASE WHEN lc.c - 1 > 0 THEN CAST(n_rel_topk AS DOUBLE)/LEAST(10, lc.c - 1) ELSE 0.0 END AS recall_at_10,
         |  CASE WHEN lc.c - 1 > 0 THEN CAST(dcg_ppm AS DOUBLE)/($idcgCase) ELSE 0.0 END AS ndcg_at_10
         |FROM m JOIN lc ON lc.label = m.q_label
         |ORDER BY m.query_id""".stripMargin
    }) { (s, d) =>
      Embeddings.irMetricsBanded(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", "label", col("vec_id") < 10, k = 10,
          planesPerBand = 6, bands = 3, dim = DIM)
        .orderBy("query_id")
    },

    // Embedding-TRUNCATION recall eval (the Matryoshka/MRL question):
    // how much of exact full-dim top-5 survives when search uses only
    // the first 16 of 64 dims — the measurement that decides whether a
    // deployment can run its ANN index at a quarter of the vector bytes.
    // Both rankings are exact quantized brute force (sim1 semantics) so
    // the recall numbers are bit-portable; at 100 TB the same harness
    // swaps in the ANN path as the candidate generator.
    QueryDef("sim10_dim_truncation_recall", {
      def dotN(a: String, b: String, n: Int) =
        s"CAST(list_sum([$a[i]*$b[i] FOR i IN range(1, ${n + 1})]) AS BIGINT)"
      def rank(dims: Int, name: String) =
        s"""${name}_s AS (SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
           |        ${cosSql(dotN("a.qe", "b.qe", dims), dotN("a.qe", "a.qe", dims), dotN("b.qe", "b.qe", dims))} AS cos
           |      FROM q a JOIN q b ON b.vec_id < 10 AND a.vec_id <> b.vec_id),
           |$name AS (SELECT query_id, neighbor_id FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |  FROM ${name}_s) WHERE rnk <= 5)""".stripMargin
      s"""WITH $quantCte,
         |${rank(64, "fullr")},
         |${rank(16, "truncr")}
         |SELECT f.query_id,
         |  CAST(COUNT(t.neighbor_id) AS BIGINT) AS n_overlap,
         |  CAST(COUNT(t.neighbor_id) AS DOUBLE) / 5 AS recall
         |FROM fullr f LEFT JOIN truncr t
         |  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
         |GROUP BY f.query_id ORDER BY f.query_id""".stripMargin
    }) { (s, d) =>
      val e = Tables.load(s, d, "embeddings")
      def top(df: org.apache.spark.sql.DataFrame) =
        Embeddings.topKBruteForce(df, "vec_id", "embedding", col("vec_id") < 10, k = 5)
          .select(col("query_id"), col("neighbor_id"))
      val full = top(e)
      val trunc = top(e.withColumn("embedding", slice(col("embedding"), 1, 16)))
        .withColumnRenamed("neighbor_id", "t_neighbor")
      full.join(trunc,
          full("query_id") === trunc("query_id") && col("neighbor_id") === col("t_neighbor"),
          "left")
        .groupBy(full("query_id").as("query_id"))
        .agg(count(col("t_neighbor")).as("n_overlap"))
        .select(col("query_id"), col("n_overlap"),
          (col("n_overlap").cast("double") / 5).as("recall"))
        .orderBy("query_id")
    },

    // Embedding-norm QA screen — ingest-time vector sanity per label:
    // norm² extremes plus the count of z-outliers (|n·x − m| beyond 3
    // standard deviations of the label's norm² distribution), the check
    // that catches unnormalized/degenerate/wrong-scale vectors BEFORE
    // they poison an index build. The z² inequality runs in exact wide
    // integers (ev13's trick at DECIMAL(38,0)/HUGEINT width — norm²
    // products overflow Int64), so flags are bit-portable.
    QueryDef("em4_norm_screen",
      """WITH q0 AS (SELECT vec_id, label,
        |              [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
        |            FROM embeddings),
        |q AS (SELECT vec_id, label,
        |        CAST(list_sum([qe[i]*qe[i] FOR i IN range(1, len(qe)+1)]) AS BIGINT) AS n2
        |      FROM q0),
        |m AS (SELECT label, CAST(COUNT(*) AS HUGEINT) AS n,
        |        CAST(SUM(CAST(n2 AS HUGEINT)) AS HUGEINT) AS s,
        |        CAST(SUM(CAST(n2 AS HUGEINT) * CAST(n2 AS HUGEINT)) AS HUGEINT) AS s2
        |      FROM q GROUP BY 1)
        |SELECT q.label, CAST(m.n AS BIGINT) AS n,
        |  CAST(MIN(q.n2) AS BIGINT) AS min_n2, CAST(MAX(q.n2) AS BIGINT) AS max_n2,
        |  CAST(COUNT(*) FILTER (WHERE
        |    (m.n * q.n2 - m.s) * (m.n * q.n2 - m.s) > 9 * (m.n * m.s2 - m.s * m.s)
        |  ) AS BIGINT) AS n_outliers
        |FROM q JOIN m ON m.label = q.label
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val d38 = DecimalType(38, 0)
      val q = Embeddings.prepared(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", Seq("label"))
        .select(col("label"), col("n2"))
      val m = q.groupBy("label")
        .agg(count(lit(1)).cast(d38).as("n"),
          sum(col("n2").cast(d38)).as("s"),
          sum(col("n2").cast(d38) * col("n2").cast(d38)).as("s2"))
      val dev = col("n") * col("n2").cast(d38) - col("s")
      q.join(broadcast(m), "label")
        .groupBy("label")
        .agg(first(col("n")).cast("long").as("n"),
          min("n2").as("min_n2"), max("n2").as("max_n2"),
          sum(when(dev * dev > lit(9) * (col("n") * col("s2") - col("s") * col("s")), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("label"), col("n"), col("min_n2"), col("max_n2"), col("n_outliers"))
        .orderBy("label")
    },

    // k-NN label prediction — the standard embedding-quality eval: hold
    // out the first 20 vectors, predict each one's label by majority
    // vote of its 5 nearest train vectors (exact quantized cosine;
    // ties → most votes, then smallest label — fully deterministic),
    // report prediction vs truth. Brute force is the eval-sized
    // baseline (queries broadcast, corpus streamed — sim1's shape); the
    // ANN variants swap in for production-sized evals.
    QueryDef("sim8_knn_classify",
      s"""WITH $quantCte,
         |qs AS (SELECT vec_id AS query_id, label AS actual, qe, n2 FROM q WHERE vec_id < 20),
         |tr AS (SELECT vec_id, label, qe, n2 FROM q WHERE vec_id >= 20),
         |s AS (SELECT b.query_id, b.actual, a.label AS n_label,
         |        ${cosSql("CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)", "a.n2", "b.n2")} AS cos,
         |        a.vec_id AS neighbor_id
         |      FROM tr a CROSS JOIN qs b),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk FROM s),
         |v AS (SELECT query_id, actual, n_label, CAST(COUNT(*) AS BIGINT) AS votes
         |      FROM r WHERE rnk <= 5 GROUP BY 1, 2, 3),
         |w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, n_label) AS vr FROM v)
         |SELECT query_id, CAST(actual AS BIGINT) AS actual,
         |  CAST(n_label AS BIGINT) AS predicted, n_label = actual AS correct
         |FROM w WHERE vr = 1 ORDER BY query_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val p = Embeddings.prepared(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", Seq("label"))
      val qs = p.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("label").as("actual"),
          col("qe").as("q_qe"), col("n2").as("q_n2"))
      val tr = p.filter(col("vec_id") >= 20)
      val scored = tr.crossJoin(broadcast(qs))
        .select(col("query_id"), col("actual"), col("label").as("n_label"),
          Embeddings.cosine(Embeddings.dotQ(col("qe"), col("q_qe")),
            col("n2"), col("q_n2")).as("cos"),
          col("vec_id").as("neighbor_id"))
      val top = scored.withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
        .where(col("rnk") <= 5)
      top.groupBy("query_id", "actual", "n_label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("vr", row_number().over(
          Window.partitionBy("query_id").orderBy(col("votes").desc, col("n_label"))))
        .where(col("vr") === 1)
        .select(col("query_id"), col("actual").cast("long").as("actual"),
          col("n_label").cast("long").as("predicted"),
          (col("n_label") === col("actual")).as("correct"))
        .orderBy("query_id")
    },

    // Semantic eval-contamination screen (paraphrase leakage): the
    // embedding twin of tx8 — a deterministic 10% md5-hash eval split,
    // LSH-signature-blocked candidate join against the train remainder
    // (eval side broadcast), exact quantized cosine >= 0.2 flags the
    // pair. Composes the tx7 split + sim2 blocking + em1 threshold
    // primitives; the oracle replays the identical md5 split, plane
    // signs and Int64 cosine.
    QueryDef("p3_semantic_contamination", {
      val th = graft.ops.TextAnalysis.hexThreshold(0.1)
      s"""WITH $quantCte,
         |s AS (SELECT vec_id, qe, n2, ${sigSql("q")} AS sig,
         |        substr(md5('ctm:' || CAST(vec_id AS VARCHAR)), 1, 16) < '$th' AS is_eval
         |      FROM q),
         |hits AS (SELECT e.vec_id AS eval_id, t.vec_id AS train_id,
         |    CAST(list_sum([t.qe[i]*e.qe[i] FOR i IN range(1, len(t.qe)+1)]) AS BIGINT) AS dot,
         |    t.n2 AS tn, e.n2 AS en
         |  FROM s t JOIN s e ON t.sig = e.sig AND NOT t.is_eval AND e.is_eval)
         |SELECT eval_id, train_id,
         |  ${cosSql("dot", "tn", "en")} AS cos
         |FROM hits WHERE ${cosSql("dot", "tn", "en")} >= 0.2
         |ORDER BY eval_id, cos DESC, train_id""".stripMargin
    }) { (s, d) =>
      val isEval = substring(md5(concat(lit("ctm:"), col("vec_id").cast("string"))), 1, 16) <
        lit(graft.ops.TextAnalysis.hexThreshold(0.1))
      Embeddings.semanticContamination(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", isEval, minCos = 0.2, planes = PLANES, dim = DIM)
        .orderBy(col("eval_id"), col("cos").desc, col("train_id"))
    }
  )

  /** DuckDB MMR oracle: top-candK candidates by exact quantized cosine,
    * then k greedy steps — sel_i = sel_{i-1} + argmax of
    * 0.7·rel − 0.3·COALESCE(max cos to sel_{i-1}, 0) (score DESC, id). */
  private def mmrOracleSql(queryId: Long, candK: Int, k: Int): String = {
    val candCos = cosSql(
      "CAST(list_sum([a.qe[i]*b.qe[i] FOR i IN range(1, len(a.qe)+1)]) AS BIGINT)",
      "a.n2", "b.n2")
    val pairCos = cosSql(
      "CAST(list_sum([c.qe[j]*s.qe[j] FOR j IN range(1, len(c.qe)+1)]) AS BIGINT)",
      "c.n2", "s.n2")
    def step(i: Int): String =
      s"""scored_$i AS (
         |  SELECT c.id, c.qe, c.n2, c.rel,
         |    0.7*c.rel - 0.3*COALESCE(MAX($pairCos), 0.0) AS score
         |  FROM cand c LEFT JOIN sel_${i - 1} s ON true
         |  WHERE c.id NOT IN (SELECT id FROM sel_${i - 1})
         |  GROUP BY c.id, c.qe, c.n2, c.rel),
         |pick_$i AS (SELECT id, qe, n2, rel, score, CAST($i AS BIGINT) AS rnk
         |            FROM scored_$i ORDER BY score DESC, id LIMIT 1),
         |sel_$i AS (SELECT * FROM sel_${i - 1} UNION ALL SELECT * FROM pick_$i)""".stripMargin
    s"""WITH $quantCte,
       |qv AS (SELECT qe, n2 FROM q WHERE vec_id = $queryId),
       |cand AS (SELECT a.vec_id AS id, a.qe, a.n2, $candCos AS rel
       |         FROM q a, qv b WHERE a.vec_id <> $queryId
       |         ORDER BY rel DESC, id LIMIT $candK),
       |sel_0 AS (SELECT id, qe, n2, rel, CAST(0 AS DOUBLE) AS score,
       |                 CAST(0 AS BIGINT) AS rnk
       |          FROM cand WHERE false),
       |${(1 to k).map(step).mkString(",\n")}
       |SELECT rnk, id AS neighbor_id, rel, score FROM sel_$k ORDER BY rnk""".stripMargin
  }
}
