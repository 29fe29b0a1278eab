package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{TextAnalysis, TextDedup}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` table
  * (deduplication family). Oracles replicate the portable md5 hashing
  * spec of graft.ops.TextDedup in DuckDB SQL, so results are bit-exact.
  */
object PipelinesDedup {

  // Shared DuckDB CTE: distinct (doc_id, 5-gram shingle) pairs.
  // AS MATERIALIZED: `sh` is referenced 3-4x downstream (sig, sizes, both
  // sides of the intersection join); DuckDB 1.0's default inlining
  // re-expands the shingle explode per reference, and in the chained
  // oracles (dd15's closure, dd18's 3-method agreement) the re-expansion
  // compounds into sf10 DNFs (>900 s) — materialization is the documented
  // cure and a semantic no-op (sf0.01 hashes unchanged).
  private val shingleCte =
    """words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
      |       FROM words, UNNEST(range(1, len(w)-3)) AS t(i))""".stripMargin

  private val K = 16
  private val BANDS = 8

  // MIN(substr(md5('<j>:'||shingle),1,16)) AS h<j> for j in 0..15
  private val sigSelect = (0 until K)
    .map(j => s"MIN(substr(md5('$j:'||shingle), 1, 16)) AS h$j").mkString(",\n    ")
  // 8 bands of 2 rows: bucket = '<b>:' || h_{2b} || h_{2b+1}
  private val bandUnion = (0 until BANDS)
    .map(b => s"SELECT doc_id, '$b:'||h${2 * b}||h${2 * b + 1} AS bucket FROM sig")
    .mkString("\n  UNION ALL ")

  // Parameterized twins of the fragments above for oracles that run the
  // pipeline over a named sub-relation instead of the whole table
  // (dd19's corpus-vs-increment split).
  private def shingleCteFor(rel: String, words: String, out: String) =
    s"""$words AS (SELECT doc_id, string_split(text, ' ') AS w FROM $rel),
       |$out AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
       |       FROM $words, UNNEST(range(1, len(w)-3)) AS t(i))""".stripMargin
  private def bandUnionFor(sig: String) = (0 until BANDS)
    .map(b => s"SELECT doc_id, '$b:'||h${2 * b}||h${2 * b + 1} AS bucket FROM $sig")
    .mkString("\n  UNION ALL ")

  // full minhash-LSH pipeline as a CTE chain ending in `pairs` (shared by
  // dd3 and the dd6 grouping closure)
  // sig/buckets/pairs MATERIALIZED for the same reason as `sh` above:
  // buckets self-joins (2 refs), pairs feeds both directions of dd6/dd15's
  // edge closure (2 refs) — inlined, each reference re-runs the whole
  // upstream minhash pipeline
  private lazy val minhashPairCtes =
    s"""$shingleCte,
       |sig AS MATERIALIZED (SELECT doc_id,
       |    $sigSelect
       |  FROM sh GROUP BY doc_id),
       |buckets AS MATERIALIZED (
       |  $bandUnion),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |         FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (SELECT id1, id2, COUNT(*) AS i
       |          FROM cand JOIN sh sa ON sa.doc_id = id1
       |          JOIN sh sb ON sb.doc_id = id2 AND sb.shingle = sa.shingle
       |          GROUP BY 1, 2),
       |pairs AS MATERIALIZED (SELECT id1, id2, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) AS jaccard
       |          FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
       |          WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8)""".stripMargin

  // 64 signed bit-sums for the simhash oracle
  private val simhashSums = (0 until 64).map { b =>
    val digit = b / 4 + 1; val shift = 3 - b % 4
    s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(wh, $digit, 1)) - 1) >> $shift) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
  }.mkString(",\n    ")
  // tf-weighted variant: each word votes ±tf per bit
  private val simhashWeightedSums = (0 until 64).map { b =>
    val digit = b / 4 + 1; val shift = 3 - b % 4
    s"SUM(tf * (CASE WHEN ((instr('0123456789abcdef', substr(wh, $digit, 1)) - 1) >> $shift) & 1 = 1 THEN 1 ELSE -1 END)) AS s$b"
  }.mkString(",\n    ")
  private val simhashNibbles = (0 until 16).map { j =>
    val v = (0 until 4).map(r => s"CASE WHEN s${j * 4 + r} > 0 THEN ${8 >> r} ELSE 0 END").mkString(" + ")
    s"substr('0123456789abcdef', ($v) + 1, 1)"
  }.mkString("||")

  val defs: Seq[QueryDef] = Seq(

    QueryDef("dd1_dedup_exact",
      """SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS doc_id
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      TextDedup.exactDedup(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("text_hash")
    },

    QueryDef("dd2_dedup_ngram_jaccard",
      s"""WITH $shingleCte,
         |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
         |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
         |          FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id1, id2, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) AS jaccard
         |FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
         |WHERE CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) >= 0.8
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      TextDedup.jaccardPairs(Tables.load(s, d, "documents"), "doc_id", "text",
          n = 5, threshold = 0.8, maxShingleDf = 100)
        .orderBy("id1", "id2")
    },

    QueryDef("dd3_dedup_minhash_lsh",
      s"""WITH $minhashPairCtes
         |SELECT id1, id2, jaccard FROM pairs
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      TextDedup.minhashDedupPairs(Tables.load(s, d, "documents"), "doc_id", "text",
          n = 5, k = K, bands = BANDS, threshold = 0.8)
        .orderBy("id1", "id2")
    },

    // Connected components over the verified near-dup pair graph: every
    // member of a transitive duplicate cluster gets the cluster's MIN doc
    // id. The oracle computes the closure with a recursive CTE; Spark
    // runs the distributed min-label-propagation loop.
    // Near-dup suppression survivors: every doc emits its LSH band
    // buckets, a bucket is owned by its MIN doc id, survivors own all
    // their buckets — the batch twin of the streaming
    // nearDupDedupStream operator (same band keys, same ownership rule).
    QueryDef("dd7_neardup_survivors",
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM sh GROUP BY doc_id),
         |buckets AS (
         |  $bandUnion),
         |owners AS (SELECT bucket, MIN(doc_id) AS owner FROM buckets GROUP BY bucket),
         |flags AS (SELECT b.doc_id,
         |            MIN(CASE WHEN o.owner = b.doc_id THEN 1 ELSE 0 END) AS all_own
         |          FROM buckets b JOIN owners o ON o.bucket = b.bucket
         |          GROUP BY b.doc_id)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id
         |FROM flags WHERE all_own = 1 ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextDedup.nearDupSurvivors(Tables.load(s, d, "documents"), "doc_id", "text",
          n = 5, k = K, bands = BANDS)
        .orderBy("doc_id")
    },

    QueryDef("dd6_dedup_groups",
      s"""WITH RECURSIVE $minhashPairCtes,
         |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
         |          UNION SELECT id2, id1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
         |SELECT id AS doc_id, CAST(MIN(r) AS BIGINT) AS group_id
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextDedup.duplicateGroups(
          TextDedup.minhashDedupPairs(Tables.load(s, d, "documents"), "doc_id", "text",
            n = 5, k = K, bands = BANDS, threshold = 0.8))
        .orderBy("doc_id")
    },

    QueryDef("dd4_dedup_simhash",
      s"""WITH w AS (SELECT DISTINCT doc_id, word
         |           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)),
         |wh AS (SELECT doc_id, substr(md5(word), 1, 16) AS wh FROM w),
         |bits AS (SELECT doc_id,
         |    $simhashSums
         |  FROM wh GROUP BY doc_id)
         |SELECT doc_id, $simhashNibbles AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextDedup.simhash(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    QueryDef("dd5_dedup_simhash_weighted",
      s"""WITH w AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
         |           FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
         |           GROUP BY doc_id, word),
         |wh AS (SELECT doc_id, tf, substr(md5(word), 1, 16) AS wh FROM w),
         |bits AS (SELECT doc_id,
         |    $simhashWeightedSums
         |  FROM wh GROUP BY doc_id)
         |SELECT doc_id, $simhashNibbles AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextDedup.simhashWeighted(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Cross-document repeated n-gram spans (Lee et al. 2022 exact
    // substring dedup): positions whose 8-gram window occurs >= 2 times
    // anywhere in the corpus, merged into maximal spans per document via
    // gaps-and-islands. 16-hex md5 prefixes == the engine's big-endian
    // first-8-digest-bytes longs, so both engines form identical groups.
    QueryDef("dd9_repeated_spans",
      """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |g AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |        substr(md5(array_to_string(w[i:i+7], ' ')), 1, 16) AS h
        |      FROM wd, UNNEST(range(1, n - 8 + 2)) AS t(i)),
        |hot AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
        |r AS (SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM hot)),
        |s AS (SELECT doc_id, pos,
        |        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |      FROM r)
        |SELECT doc_id, MIN(pos) AS span_lo, MAX(pos) + 7 AS span_hi,
        |  COUNT(*) AS n_windows
        |FROM s GROUP BY doc_id, isl ORDER BY doc_id, span_lo""".stripMargin) { (s, d) =>
      TextAnalysis.repeatedSpans(Tables.load(s, d, "documents"), "doc_id", "text", n = 8)
        .orderBy("doc_id", "span_lo")
    },

    // Overlap-coefficient (containment) near-dup pairs: inter/min(szs)
    // catches a short doc embedded inside a long one, which symmetric
    // Jaccard dilutes below any usable threshold.
    QueryDef("dd11_containment",
      s"""WITH $shingleCte,
         |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100),
         |shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS i
         |          FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id1, id2, CAST(i AS DOUBLE)/LEAST(sa.sz, sb.sz) AS containment
         |FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2
         |WHERE CAST(i AS DOUBLE)/LEAST(sa.sz, sb.sz) >= 0.8
         |ORDER BY id1, id2""".stripMargin) { (s, d) =>
      TextDedup.containmentPairs(Tables.load(s, d, "documents"), "doc_id", "text",
          n = 5, threshold = 0.8, maxShingleDf = 100)
        .orderBy("id1", "id2")
    },

    // C4-style duplicate-span removal: 10-word chunks, one global
    // occurrence of each chunk content survives (first by (doc_id, idx)),
    // docs rebuilt from surviving chunks. The oracle's per-hash window is
    // the single-node formulation of the engine's min-struct groupBy.
    QueryDef("dd10_chunk_dedup",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
        |         array_to_string(ws[i*10+1:i*10+10], ' ') AS chunk
        |       FROM w, UNNEST(range(0, (len(ws)+9)//10)) t(i)),
        |keep AS (SELECT doc_id, idx, chunk,
        |           ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, idx) AS rn
        |         FROM ch),
        |rb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |         string_agg(chunk, ' ' ORDER BY idx) AS clean_text
        |       FROM keep WHERE rn = 1 GROUP BY doc_id)
        |SELECT w.doc_id, CAST((len(ws)+9)//10 AS BIGINT) AS n_chunks,
        |  COALESCE(rb.n_kept, 0) AS n_kept,
        |  COALESCE(rb.clean_text, '') AS clean_text
        |FROM w LEFT JOIN rb ON w.doc_id = rb.doc_id
        |ORDER BY w.doc_id""".stripMargin) { (s, d) =>
      TextDedup.chunkDedup(Tables.load(s, d, "documents"), "doc_id", "text",
          chunkWords = 10)
        .orderBy("doc_id")
    },

    // Blocked fuzzy record linkage over the part-name dictionary: the
    // entity-resolution step a catalog pipeline runs BEFORE exact-key
    // dedup. The quadratic never touches fact rows (distinct names
    // first), blocking on the head noun bounds it per block, and the
    // Spark side's threshold levenshtein early-exits per pair — the
    // oracle computes the full distance and filters, identical results.
    QueryDef("dd12_fuzzy_linkage",
      """WITH names AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n,
        |                 split_part(p_name, ' ', 2) AS block
        |               FROM part GROUP BY 1)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
        |  a.n AS n_a, b.n AS n_b
        |FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2
        |ORDER BY name_a, name_b""".stripMargin) { (s, d) =>
      graft.ops.Linkage.fuzzyNamePairs(Tables.load(s, d, "part"), "p_name",
          blockKey = substring_index(col("name"), " ", -1), maxDist = 2)
        .orderBy("name_a", "name_b")
    },

    // Cross-SOURCE MinHash similarity matrix — corpus governance: which
    // ingestion sources feed near-identical content (mirror detection,
    // crawl-overlap budgeting) BEFORE any doc-level dedup runs. Each
    // source's shingle SET gets one K-seed minhash signature — minhash's
    // min is duplicate-idempotent, so no distinct pre-pass, and the
    // signature is ONE map-side-combined aggregate with K hex mins of
    // state per source (a 100 TB corpus shuffles only sources×K mins).
    // The pairwise matrix then joins #sources² signature ROWS (tiny,
    // broadcast) — never corpus×corpus; Jaccard estimate = matching
    // component fraction. Same seeded-md5 minhash as dd3, so the oracle
    // replays it exactly.
    QueryDef("dd13_source_similarity", {
      val sigSel = (0 until K)
        .map(j => s"MIN(substr(md5('$j:'||shingle), 1, 16)) AS h$j").mkString(",\n    ")
      val matchSum = (0 until K)
        .map(j => s"(CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH words AS (SELECT source, string_split(text, ' ') AS w FROM documents),
         |sh AS (SELECT source, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
         |       FROM words, UNNEST(range(1, len(w)-3)) AS t(i)),
         |sig AS (SELECT source,
         |    $sigSel
         |  FROM sh GROUP BY source)
         |SELECT a.source AS src1, b.source AS src2,
         |  CAST($matchSum AS BIGINT) AS matches,
         |  CAST($matchSum AS DOUBLE) / $K AS jaccard_est
         |FROM sig a JOIN sig b ON a.source < b.source
         |ORDER BY src1, src2""".stripMargin
    }) { (s, d) =>
      // per-DOC signatures in-row (no corpus-sized shingle explode), then
      // elementwise mins per source: min of mins == min over the union of
      // the shingle sets, so this equals the oracle's flat per-source MIN
      // repartition first: the small documents file is ONE split, and the
      // k×md5 signature projection must run above the exchange (dd3's
      // spreadSmallInput reasoning), not single-threaded inside the scan
      val docs = Tables.load(s, d, "documents")
      val spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      // posexplode_OUTER + post-explode null filter: a pre-explode
      // IsNotNull(mh) predicate would be pushed below the repartition
      // exchange and evaluate the whole k×md5 signature single-threaded
      // inside the scan (the dd3 InferFiltersFromGenerate trap)
      val sigRows = spread
        .select(col("source"),
          graft.functions.TextExprs.minhash_sig_hex(col("text"), 5, K).as("mh"))
        .select(col("source"), posexplode_outer(col("mh")).as(Seq("j", "h")))
        .filter(col("h").isNotNull)
      // sources×1 rows; checkpoint so the pairwise self-join below reads
      // the tiny signature table twice instead of re-deriving the whole
      // corpus pipeline per side
      val sig = sigRows.groupBy("source", "j").agg(min("h").as("h"))
        .groupBy("source")
        .agg(expr("transform(array_sort(collect_list(struct(j, h))), x -> x.h)").as("sig"))
        .localCheckpoint(false)
      val a = sig.select(col("source").as("src1"), col("sig").as("s1"))
      val b = sig.select(col("source").as("src2"), col("sig").as("s2"))
      a.join(b, col("src1") < col("src2"))
        .select(col("src1"), col("src2"),
          expr("CAST(size(filter(zip_with(s1, s2, (x, y) -> x = y), v -> v)) AS BIGINT)").as("matches"))
        .withColumn("jaccard_est", col("matches").cast("double") / K)
        .orderBy("src1", "src2")
    },

    // Per-source dedup governance report — WHERE do the duplicates come
    // from: for every ingestion source, its doc count, how many of its
    // docs are exact-duplicate LOSERS (another doc with identical text
    // owns the MIN doc_id — dd1's survivor rule), and the loser rate in
    // ppm. The attribution view a curation team reads before cutting a
    // source's crawl budget. Shuffles: one text-hash aggregate (the
    // owner table, map-side combined), one hash join back, one
    // source-keyed aggregate — corpus moves twice, exact-integer rates.
    QueryDef("dd14_source_dup_report",
      """WITH h AS (SELECT doc_id, source, md5(text) AS th FROM documents),
        |own AS (SELECT th, MIN(doc_id) AS owner FROM h GROUP BY 1),
        |f AS (SELECT h.source, CASE WHEN h.doc_id <> o.owner THEN 1 ELSE 0 END AS loser
        |      FROM h JOIN own o ON o.th = h.th)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(loser) AS BIGINT) AS n_dup_losers,
        |  CAST(1000000 * SUM(loser) // COUNT(*) AS BIGINT) AS dup_ppm
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val h = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"), md5(col("text")).as("th"))
      val own = h.groupBy("th").agg(min("doc_id").as("owner"))
      h.join(own, "th")
        .select(col("source"),
          when(col("doc_id") =!= col("owner"), 1L).otherwise(0L).as("loser"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("loser").as("n_dup_losers"))
        .select(col("source"), col("n_docs"), col("n_dup_losers"),
          expr("1000000L * n_dup_losers div n_docs").as("dup_ppm"))
        .orderBy("source")
    },

    // METHOD AGREEMENT — do lexical (MinHash/Jaccard ≥ 0.8) and semantic
    // (SemDeDup cosine-prune) dedup flag the SAME documents? The
    // triangulation a curation team runs before trusting either alone:
    // per doc (universe = docs WITH an embedding — the testdata
    // convention vec k embeds doc k, the same identity p3/sim8 ride),
    // lexical verdict = "has a near-dup pair" (dd3), semantic
    // verdict = "pruned in its cluster" (dd8's kept = 0); output the
    // 2×2 contingency counts. Docs flagged by exactly one method are the
    // interesting reviews (paraphrases only semantics sees; boilerplate
    // edits only shingles see).
    QueryDef("dd18_method_agreement", {
      // native vector product (6.7x the list-comprehension lambda in
      // DuckDB 1.0; exact — products <= 64e12 < 2^53); the oracle's cost
      // is 1.6M+ pairwise dots, where lambda overhead was the sf10 DNF
      def dot(a: String, b: String) =
        s"CAST(list_dot_product($a, $b) AS BIGINT)"
      def n2(a: String) = dot(a, a)
      def cos(d: String, na: String, nb: String) =
        s"CAST($d AS DOUBLE)/(sqrt(CAST($na AS DOUBLE))*sqrt(CAST($nb AS DOUBLE)))"
      s"""WITH $minhashPairCtes,
         |lex AS (SELECT id1 AS doc_id FROM pairs UNION SELECT id2 FROM pairs),
         |q0 AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
         |         [CAST(ROUND(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS qe
         |       FROM embeddings),
         |q AS MATERIALIZED (SELECT vec_id, qe, ${n2("qe")} AS n2 FROM q0),
         |seeds AS (SELECT vec_id AS cell, qe AS cent FROM q ORDER BY vec_id LIMIT 8),
         |sd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM seeds),
         |a0 AS (SELECT q.vec_id, q.qe, q.n2, sd.cell FROM q, sd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "sd.cent")} + sd.c_n2, sd.cell) = 1),
         |cm AS (SELECT cell, i, SUM(qe[i]) AS s, COUNT(*) AS c
         |       FROM a0, range(1, 65) t(i) GROUP BY cell, i),
         |cent AS (SELECT cell, list(s // c ORDER BY i) AS cent FROM cm GROUP BY cell),
         |cd AS (SELECT cell, cent, ${n2("cent")} AS c_n2 FROM cent),
         |a1 AS MATERIALIZED (SELECT q.vec_id, q.qe, q.n2, cd.cell FROM q, cd
         |       QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |         ORDER BY q.n2 - 2*${dot("q.qe", "cd.cent")} + cd.c_n2, cd.cell) = 1),
         |pr AS (SELECT DISTINCT a.vec_id FROM a1 a JOIN a1 b
         |        ON b.cell = a.cell AND b.vec_id < a.vec_id
         |        WHERE ${cos(dot("a.qe", "b.qe"), "a.n2", "b.n2")} >= 0.4),
         |sem AS (SELECT vec_id AS doc_id FROM pr),
         |d AS (SELECT dd.doc_id,
         |        CASE WHEN dd.doc_id IN (SELECT doc_id FROM lex) THEN 1 ELSE 0 END AS lexf,
         |        CASE WHEN dd.doc_id IN (SELECT doc_id FROM sem) THEN 1 ELSE 0 END AS semf
         |      FROM documents dd JOIN embeddings e ON e.vec_id = dd.doc_id)
         |SELECT CAST(lexf AS BIGINT) AS lexical, CAST(semf AS BIGINT) AS semantic,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val lex = TextDedup.minhashDedupPairs(docs, "doc_id", "text",
          n = 5, k = K, bands = BANDS, threshold = 0.8)
      val lexDocs = lex.select(col("id1").as("doc_id"))
        .union(lex.select(col("id2").as("doc_id"))).distinct()
        .withColumn("lexf", lit(1L))
      val semDocs = graft.ops.Embeddings.semDedup(
          Tables.load(s, d, "embeddings"), "vec_id", "embedding",
          numCells = 8, threshold = 0.4)
        .where(col("kept") === 0)
        .select(col("vec_id").as("doc_id"))
        .withColumn("semf", lit(1L))
      docs.select("doc_id")
        .join(Tables.load(s, d, "embeddings").select(col("vec_id").as("doc_id")), "doc_id")
        .join(lexDocs, Seq("doc_id"), "left")
        .join(semDocs, Seq("doc_id"), "left")
        .groupBy(coalesce(col("lexf"), lit(0L)).as("lexical"),
          coalesce(col("semf"), lit(0L)).as("semantic"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lexical", "semantic")
    },

    // MinHash CALIBRATION — does the signature agree with the truth it
    // estimates? For every LSH candidate pair: the 16-component
    // signature-match count (the estimator: matches/16 ≈ Jaccard)
    // bucketed against the EXACT Jaccard (integer ppm), averaged per
    // bucket. A well-behaved sketch shows avg_exact_ppm rising ~linearly
    // with n_match — the sanity plot run before trusting banding
    // thresholds at scale. Signatures come from the same in-row
    // MinHashSigHex spec the oracle replays with MIN(md5) aggregates.
    QueryDef("dd17_minhash_calibration", {
      val sigPairMatch = (0 until K)
        .map(j => s"CASE WHEN sga.h$j = sgb.h$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM sh GROUP BY doc_id),
         |buckets AS (
         |  $bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT id1, id2, COUNT(*) AS i
         |          FROM cand JOIN sh sa ON sa.doc_id = id1
         |          JOIN sh sb ON sb.doc_id = id2 AND sb.shingle = sa.shingle
         |          GROUP BY 1, 2),
         |jx AS (SELECT c.id1, c.id2,
         |         CAST(1000000 * COALESCE(i.i, 0) //
         |              (sa.sz + sb.sz - COALESCE(i.i, 0)) AS BIGINT) AS jac_ppm,
         |         CAST($sigPairMatch AS BIGINT) AS n_match
         |       FROM cand c
         |       LEFT JOIN inter i ON i.id1 = c.id1 AND i.id2 = c.id2
         |       JOIN sizes sa ON sa.doc_id = c.id1 JOIN sizes sb ON sb.doc_id = c.id2
         |       JOIN sig sga ON sga.doc_id = c.id1 JOIN sig sgb ON sgb.doc_id = c.id2)
         |SELECT n_match, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(jac_ppm) // COUNT(*) AS BIGINT) AS avg_exact_ppm
         |FROM jx GROUP BY 1 ORDER BY 1""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextExprs
      val docs = Tables.load(s, d, "documents")
      // NOTE (measured, round 19): the three branches (cand / a / b)
      // prune to different columns, so each recomputes its sketch
      // expressions over the corpus — but those recomputes run in
      // PARALLEL broadcast futures (wall ≈ max, not sum), and both
      // materialization barriers lose to them: persist 1.88 s /
      // localCheckpoint 1.65 s vs repartition 1.25 s same-session
      // (the shingle-set arrays are expensive to store). Keep the
      // repartition barrier.
      val withSets = docs.filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"),
          TextExprs.minhash_band_keys(col("text"), 5, K, BANDS).as("bks"),
          TextExprs.shingle_hash_set(col("text"), 5).as("shs"),
          TextExprs.minhash_sig_hex(col("text"), 5, K).as("sig"))
        .repartition(col("doc_id"))
      val cand = withSets
        .select(col("doc_id"), explode_outer(col("bks")).as("bucket"))
        .filter(col("bucket").isNotNull)
        .groupBy("bucket").agg(collect_set(col("doc_id")).as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(col("ids"), explode(col("ids")).as("id1"))
        .select(col("id1"), explode(col("ids")).as("id2"))
        .filter(col("id1") < col("id2"))
        .select("id1", "id2").distinct()
      val a = withSets.select(col("doc_id").as("id1"), col("shs").as("shs1"), col("sig").as("sig1"))
      val b = withSets.select(col("doc_id").as("id2"), col("shs").as("shs2"), col("sig").as("sig2"))
      cand.join(a, "id1").join(b, "id2")
        .select(
          expr("cast(1000000L * size(array_intersect(shs1, shs2)) div " +
            "(size(shs1) + size(shs2) - size(array_intersect(shs1, shs2))) as bigint)")
            .as("jac_ppm"),
          expr("cast(size(filter(zip_with(sig1, sig2, (x, y) -> x = y), b -> b)) as bigint)")
            .as("n_match"))
        .groupBy("n_match")
        .agg(count(lit(1)).as("n_pairs"),
          expr("cast(sum(jac_ppm) div count(1) as bigint)").as("avg_exact_ppm"))
        .orderBy("n_match")
    },

    // Dedup OPERATING CURVE — the threshold-tuning sweep every dedup
    // deployment runs before committing: pair counts and affected-doc
    // counts at Jaccard ≥ 0.7 / 0.8 / 0.9, all from ONE candidate pass
    // (the LSH/shingle pipeline runs once; thresholds are conditional
    // aggregates over its verified-jaccard output — a parameter sweep
    // must never mean re-scanning a 100 TB corpus per setting).
    QueryDef("dd16_threshold_sweep",
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM sh GROUP BY doc_id),
         |buckets AS (
         |  $bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |         FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (SELECT id1, id2, COUNT(*) AS i
         |          FROM cand JOIN sh sa ON sa.doc_id = id1
         |          JOIN sh sb ON sb.doc_id = id2 AND sb.shingle = sa.shingle
         |          GROUP BY 1, 2),
         |j AS (SELECT id1, id2, CAST(i AS DOUBLE)/(sa.sz + sb.sz - i) AS jac
         |      FROM inter JOIN sizes sa ON sa.doc_id = id1 JOIN sizes sb ON sb.doc_id = id2),
         |d2 AS (SELECT id1 AS d, jac FROM j UNION ALL SELECT id2, jac FROM j)
         |SELECT CAST(t AS DOUBLE) AS threshold,
         |  CAST((SELECT COUNT(*) FROM j WHERE jac >= t) AS BIGINT) AS n_pairs,
         |  CAST((SELECT COUNT(DISTINCT d) FROM d2 WHERE jac >= t) AS BIGINT) AS n_docs
         |FROM (VALUES (0.7), (0.8), (0.9)) th(t) ORDER BY 1""".stripMargin) { (s, d) =>
      val th = Seq(0.7, 0.8, 0.9)
      def tag(t: Double) = (t * 10).toInt
      val j = TextDedup.minhashDedupPairs(Tables.load(s, d, "documents"),
        "doc_id", "text", n = 5, k = K, bands = BANDS, threshold = 0.0)
      val d2 = j.select(col("id1").as("d"), col("jaccard"))
        .union(j.select(col("id2").as("d"), col("jaccard")))
      val pairsAgg = j.agg(
        sum(when(col("jaccard") >= th.head, 1L).otherwise(0L)).as(s"p${tag(th.head)}"),
        th.tail.map(t => sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"p${tag(t)}")): _*)
      val docsAgg = d2.agg(
        countDistinct(when(col("jaccard") >= th.head, col("d"))).as(s"d${tag(th.head)}"),
        th.tail.map(t => countDistinct(when(col("jaccard") >= t, col("d"))).as(s"d${tag(t)}")): _*)
      val rows = th.map(t =>
        s"struct(cast($t as double) as threshold, p${tag(t)} as n_pairs, d${tag(t)} as n_docs)")
      pairsAgg.crossJoin(docsAgg)
        .select(explode(expr(s"array(${rows.mkString(", ")})")).as("s"))
        .select(col("s.threshold"), col("s.n_pairs"), col("s.n_docs"))
        .orderBy("threshold")
    },

    // CAPSTONE composition — the pretraining-blend assembly line in ONE
    // verified plan: near-dup suppression (dd7's bucket-ownership rule;
    // shingle-less docs pass), a quality gate (≥20 tokens), then tx26's
    // token-budget mixing (per-source budget floor(20000·w/Σw), docs in
    // deterministic md5 order), and 512-token packing accounting. Every
    // stage is the already-verified operator — what this query verifies
    // is their COMPOSITION through doc-keyed joins, per source:
    // docs → after-dedup → after-quality → selected → tokens → sequences.
    QueryDef("p4_pretrain_blend",
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM sh GROUP BY doc_id),
         |buckets AS MATERIALIZED (
         |  $bandUnion),
         |owners AS (SELECT bucket, MIN(doc_id) AS owner FROM buckets GROUP BY bucket),
         |flags AS (SELECT b.doc_id,
         |            MIN(CASE WHEN o.owner = b.doc_id THEN 1 ELSE 0 END) AS all_own
         |          FROM buckets b JOIN owners o ON o.bucket = b.bucket
         |          GROUP BY b.doc_id),
         |dd AS (SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok,
         |         CAST(substr(d.source, 4) AS BIGINT) % 3 + 1 AS w,
         |         md5('mix:' || CAST(d.doc_id AS VARCHAR)) AS h
         |       FROM documents d),
         |q AS (SELECT dd.*,
         |        CASE WHEN f.doc_id IS NULL OR f.all_own = 1 THEN 1 ELSE 0 END AS keep
         |      FROM dd LEFT JOIN flags f ON f.doc_id = dd.doc_id),
         |q2 AS MATERIALIZED (SELECT *, CASE WHEN keep = 1 AND tok >= 20 THEN 1 ELSE 0 END AS qual FROM q),
         |ws AS (SELECT source, MIN(w) AS w FROM q2 GROUP BY 1),
         |tot AS (SELECT SUM(w) AS sw FROM ws),
         |b AS (SELECT source, w, 20000 * w // sw AS budget FROM ws, tot),
         |c AS (SELECT source, doc_id, tok,
         |        SUM(tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum
         |      FROM q2 WHERE qual = 1),
         |kept AS (SELECT c.source, c.doc_id, c.tok
         |         FROM c JOIN b ON b.source = c.source WHERE c.cum <= b.budget),
         |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |          CAST(SUM(keep) AS BIGINT) AS n_dedup,
         |          CAST(SUM(qual) AS BIGINT) AS n_quality
         |        FROM q2 GROUP BY 1),
         |sel AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
         |          CAST(SUM(tok) AS BIGINT) AS tokens_selected
         |        FROM kept GROUP BY 1)
         |SELECT a.source, a.n_docs, a.n_dedup, a.n_quality,
         |  COALESCE(s.n_selected, 0) AS n_selected,
         |  COALESCE(s.tokens_selected, 0) AS tokens_selected,
         |  CAST(CEIL(COALESCE(s.tokens_selected, 0) / 512.0) AS BIGINT) AS n_sequences
         |FROM agg a LEFT JOIN sel s ON s.source = a.source
         |ORDER BY a.source""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      val surv = TextDedup.nearDupSurvivors(docs, "doc_id", "text",
          n = 5, k = K, bands = BANDS)
        .withColumn("sv", lit(1))
      val base = docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          (expr("cast(substring(source, 4) as bigint)") % 3 + 1).as("w"),
          md5(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
        .join(surv, Seq("doc_id"), "left")
        // docs too short to shingle never enter the band buckets: they
        // trivially survive dedup (nothing to collide with)
        .withColumn("keep",
          when(col("tok") < 5 || col("sv").isNotNull, 1L).otherwise(0L))
        .withColumn("qual",
          when(col("keep") === 1 && col("tok") >= 20, 1L).otherwise(0L))
      val ws = base.groupBy("source").agg(min("w").as("w"))
      val b = ws.crossJoin(broadcast(ws.agg(sum("w").as("sw"))))
        .select(col("source"), expr("20000L * w div sw").as("budget"))
      val kept = base.where(col("qual") === 1)
        .withColumn("cum",
          sum("tok").over(Window.partitionBy("source").orderBy("h", "doc_id")))
        .join(broadcast(b), "source")
        .where(col("cum") <= col("budget"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_selected"), sum("tok").as("tk"))
      base.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_dedup"),
          sum("qual").as("n_quality"))
        .join(kept, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_dedup"), col("n_quality"),
          coalesce(col("n_selected"), lit(0L)).as("n_selected"),
          coalesce(col("tk"), lit(0L)).cast("long").as("tokens_selected"),
          expr("cast(ceil(coalesce(tk, 0L) / 512.0) as bigint)").as("n_sequences"))
        .orderBy("source")
    },

    // Policy-aware canonical selection: near-dup clusters (dd6's MinHash
    // pairs → connected components) keep the BEST-provenance member, not
    // the arbitrary min-id one — the rule real curation uses when the
    // same page arrives from several crawls ("prefer the higher-priority
    // source; tie → lowest id"). Priority here = the source's numeric
    // suffix. Per multi-doc cluster: its size, the chosen canonical +
    // its source, and the chars the dedup saves. The pick is ONE
    // struct-MAX hash aggregation over the labeled docs (no per-group
    // sort, ≤1-row map-side partials); the oracle's ROW_NUMBER window is
    // the declarative twin.
    QueryDef("dd15_canonical_pick",
      s"""WITH RECURSIVE $minhashPairCtes,
         |cedges AS (SELECT id1 AS a, id2 AS b FROM pairs
         |           UNION SELECT id2, id1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT a, a FROM cedges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN cedges e ON e.a = reach.id),
         |grp AS (SELECT id AS doc_id, MIN(r) AS group_id FROM reach GROUP BY id),
         |m AS (SELECT g.group_id, g.doc_id, d.source, d.n_chars,
         |        CAST(substr(d.source, 4) AS BIGINT) AS prio
         |      FROM grp g JOIN documents d ON d.doc_id = g.doc_id),
         |best AS (SELECT group_id, doc_id, source, n_chars,
         |           ROW_NUMBER() OVER (PARTITION BY group_id
         |                              ORDER BY prio DESC, doc_id) AS rn
         |         FROM m),
         |agg AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |          SUM(n_chars) AS tot
         |        FROM m GROUP BY group_id)
         |SELECT a.group_id, a.n_docs, b.doc_id AS canonical_doc,
         |  b.source AS canonical_source,
         |  CAST(a.tot - b.n_chars AS BIGINT) AS chars_saved
         |FROM agg a JOIN best b ON b.group_id = a.group_id AND b.rn = 1
         |WHERE a.n_docs > 1 ORDER BY a.group_id""".stripMargin) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val grp = TextDedup.duplicateGroups(
        TextDedup.minhashDedupPairs(docs, "doc_id", "text",
          n = 5, k = K, bands = BANDS, threshold = 0.8))
      grp.join(docs.select(col("doc_id"), col("source"), col("n_chars")), "doc_id")
        .withColumn("prio", expr("cast(substring(source, 4) as bigint)"))
        .groupBy("group_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("tot"),
          max(struct(col("prio"), (-col("doc_id")).as("ni"),
            col("doc_id"), col("source"), col("n_chars"))).as("best"))
        .where(col("n_docs") > 1)
        .select(col("group_id"), col("n_docs"),
          col("best.doc_id").as("canonical_doc"),
          col("best.source").as("canonical_source"),
          (col("tot") - col("best.n_chars")).cast("long").as("chars_saved"))
        .orderBy("group_id")
    },

    // Incremental-ingest dedup: the src0 batch arrives against the
    // already-ingested rest of the corpus. Verdict per new doc: exact
    // (digest match), near (LSH bucket collision + verified Jaccard),
    // or new. See TextDedup.incrementalDedup for the scale shape.
    QueryDef("dd19_incremental_dedup", {
      s"""WITH inc AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
         |corp AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
         |ch AS (SELECT md5(text) AS h, MIN(doc_id) AS exact_match FROM corp GROUP BY 1),
         |ex AS (SELECT i.doc_id, i.text, ch.exact_match
         |       FROM inc i LEFT JOIN ch ON md5(i.text) = ch.h),
         |inc2 AS (SELECT doc_id, text FROM ex WHERE exact_match IS NULL),
         |${shingleCteFor("inc2", "iwords", "ish")},
         |${shingleCteFor("corp", "cwords", "csh")},
         |isig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM ish GROUP BY doc_id),
         |csig AS (SELECT doc_id,
         |    $sigSelect
         |  FROM csh GROUP BY doc_id),
         |ibkt AS (
         |  ${bandUnionFor("isig")}),
         |cbkt AS (
         |  ${bandUnionFor("csig")}),
         |cand AS (SELECT DISTINCT i.doc_id, c.doc_id AS cid
         |         FROM ibkt i JOIN cbkt c ON i.bucket = c.bucket),
         |isz AS (SELECT doc_id, COUNT(*) AS sz FROM ish GROUP BY 1),
         |csz AS (SELECT doc_id, COUNT(*) AS sz FROM csh GROUP BY 1),
         |inter AS (SELECT cand.doc_id, cand.cid, COUNT(*) AS ic
         |          FROM cand JOIN ish a ON a.doc_id = cand.doc_id
         |          JOIN csh b ON b.doc_id = cand.cid AND b.shingle = a.shingle
         |          GROUP BY 1, 2),
         |near AS (SELECT inter.doc_id, MIN(cid) AS near_match
         |         FROM inter JOIN isz ON isz.doc_id = inter.doc_id
         |         JOIN csz ON csz.doc_id = cid
         |         WHERE CAST(ic AS DOUBLE)/(isz.sz + csz.sz - ic) >= 0.8
         |         GROUP BY 1)
         |SELECT ex.doc_id,
         |  CASE WHEN exact_match IS NOT NULL THEN 'exact'
         |       WHEN near_match IS NOT NULL THEN 'near' ELSE 'new' END AS verdict,
         |  COALESCE(exact_match, near_match) AS match_id
         |FROM ex LEFT JOIN near ON near.doc_id = ex.doc_id
         |ORDER BY ex.doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      TextDedup.incrementalDedup(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 5, k = K, bands = BANDS, threshold = 0.8)
        .orderBy("doc_id")
    }
  )
}
