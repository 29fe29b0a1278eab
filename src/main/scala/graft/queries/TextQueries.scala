package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Text-analysis + multimodal-plumbing queries over `documents`. */
object TextQueries {

  private def sqlList(xs: Seq[String]) = xs.map(w => s"'$w'").mkString("(", ", ", ")")
  private val allStops = sqlList(TextAnalysis.markers.flatMap(_._2))

  val defs: Seq[QueryDef] = Seq(

    QueryDef("tx1_langid", {
      val scoreCols = TextAnalysis.markers.map { case (lang, words) =>
        s"CAST(len(list_filter(toks, x -> x IN ${sqlList(words)})) AS DOUBLE)/n_tok AS score_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.markers.map(m => s"score_${m._1}").mkString(", ")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
         |             len(string_split(text, ' ')) AS n_tok FROM documents),
         |s AS (SELECT doc_id, text,
         |  $scoreCols
         |  FROM t)
         |SELECT doc_id, $langs,
         |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |       WHEN greatest($langs) = 0 THEN 'und'
         |       WHEN score_fr = greatest($langs) THEN 'fr'
         |       WHEN score_es = greatest($langs) THEN 'es'
         |       WHEN score_en = greatest($langs) THEN 'en'
         |       ELSE 'de' END AS pred_lang
         |FROM s ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      TextAnalysis.languageId(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    QueryDef("tx2_quality",
      s"""WITH t AS (SELECT doc_id, text,
         |             CAST(length(text) AS BIGINT) AS n_chars,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |             CAST(len(list_filter(string_split(text, ' '), x -> x IN $allStops)) AS BIGINT) AS stops,
         |             CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS punct
         |           FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |  CAST(n_chars - (n_tokens - 1) AS DOUBLE)/n_tokens AS avg_tok_len,
         |  CAST(stops AS DOUBLE)/n_tokens AS stop_ratio,
         |  CAST(punct AS DOUBLE)/n_chars AS punct_ratio,
         |  CAST((CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 1 ELSE 0 END) +
         |       (CASE WHEN stops > 0 THEN 1 ELSE 0 END) +
         |       (CASE WHEN punct * 10 < n_chars THEN 1 ELSE 0 END) AS BIGINT) AS quality
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.qualityScore(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    QueryDef("tx3_token_counts",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.tokenCounts(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    QueryDef("tx4_fingerprint",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |       FROM words, UNNEST(range(1, len(w)-3)) AS t(i)),
        |h AS (SELECT doc_id, md5(shingle) AS h FROM sh)
        |SELECT doc_id, array_to_string(list_sort(list(h))[1:3], '') AS fingerprint
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.fingerprint(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Robust winnowing (k=4-gram hashes, w=8 windows, rightmost-min):
    // both engines compute the tie-broken window argmin as a string MIN
    // of h || zero-padded position complement.
    QueryDef("tx5_winnow",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |kg AS (SELECT doc_id, i, substr(md5(wd[i]||' '||wd[i+1]||' '||wd[i+2]||' '||wd[i+3]), 1, 16) AS h
        |       FROM words, UNNEST(range(1, len(wd)-2)) AS t(i)),
        |keyed AS (SELECT doc_id, i, h || lpad(CAST(99999999 - i AS VARCHAR), 8, '0') AS key FROM kg),
        |sel AS (SELECT doc_id, i,
        |          MIN(key) OVER (PARTITION BY doc_id ORDER BY i
        |                         ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS s
        |        FROM keyed)
        |SELECT DISTINCT doc_id,
        |  CAST(99999999 - CAST(substr(s, 17, 8) AS BIGINT) AS BIGINT) AS pos,
        |  substr(s, 1, 16) AS fp
        |FROM sel WHERE i >= 8
        |ORDER BY doc_id, pos, fp""".stripMargin) { (s, d) =>
      TextAnalysis.winnowFingerprints(Tables.load(s, d, "documents"), "doc_id", "text",
          k = 4, w = 8)
        .orderBy("doc_id", "pos", "fp")
    },

    QueryDef("mm1_multimodal_features",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  CAST(ascii(substr(text, 1, 1)) + ascii(substr(text, 2, 1)) +
        |       ascii(substr(text, 3, 1)) + ascii(substr(text, 4, 1)) AS BIGINT) AS checksum4,
        |  md5(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.extractFeatures(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"))
        .orderBy("doc_id")
    },

    // Corpus-level bigram frequencies, top 50 (boilerplate detection).
    QueryDef("tx6_ngram_topk",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS wd FROM documents),
        |ng AS (SELECT wd[i]||' '||wd[i+1] AS ngram
        |       FROM words, UNNEST(range(1, len(wd))) AS t(i)),
        |c AS (SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n FROM ng GROUP BY ngram)
        |SELECT ngram, n FROM c ORDER BY n DESC, ngram LIMIT 50""".stripMargin) { (s, d) =>
      TextAnalysis.topNgrams(Tables.load(s, d, "documents"), "text", n = 2, k = 50)
    },

    // Deterministic hash split: md5-hex draws against precomputed hex
    // thresholds (0.8 → 0xcccc…, 0.9 → 0xe666…) — stable membership,
    // identical expression in both engines.
    QueryDef("tx7_train_split", {
      def th(f: Double) = TextAnalysis.hexThreshold(f)
      s"""WITH s AS (SELECT doc_id,
         |  CASE WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.8)}' THEN 'train'
         |       WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin
    }) { (s, d) =>
      TextAnalysis.trainSplit(Tables.load(s, d, "documents"), "doc_id", "graft")
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).cast("long").as("min_id"),
          max(col("doc_id")).cast("long").as("max_id"))
        .orderBy("split")
    },

    // Eval-contamination screen: per test-split doc, the fraction of its
    // distinct 5-gram shingles that occur anywhere in the train split.
    QueryDef("tx8_contamination", {
      def th(f: Double) = TextAnalysis.hexThreshold(f)
      s"""WITH s AS (SELECT doc_id, text,
         |  CASE WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.8)}' THEN 'train'
         |       WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents),
         |words AS (SELECT doc_id, split, string_split(text, ' ') AS w FROM s),
         |sh AS (SELECT DISTINCT doc_id, split, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
         |       FROM words, UNNEST(range(1, len(w)-3)) AS t(i)),
         |tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
         |te AS (SELECT sh.doc_id, CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit
         |       FROM sh LEFT JOIN tr ON sh.shingle = tr.shingle WHERE sh.split = 'test')
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh, CAST(SUM(hit) AS BIGINT) AS n_overlap,
         |  CAST(SUM(hit) AS DOUBLE)/COUNT(*) AS overlap_frac,
         |  CAST(SUM(hit) AS DOUBLE)/COUNT(*) >= 0.5 AS contaminated
         |FROM te GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      TextAnalysis.contaminationCheck(
          TextAnalysis.trainSplit(Tables.load(s, d, "documents"), "doc_id", "graft"),
          "doc_id", "text", "split", n = 5, threshold = 0.5)
        .orderBy("doc_id")
    },

    // Repetition screening: duplicate word-5-gram fraction per document
    // (the Gopher-style boilerplate/looping filter) — a zero-shuffle
    // projection off the in-row distinct shingle set.
    QueryDef("tx9_repetition",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, w, CAST(len(w) - 4 AS BIGINT) AS n_windows
        |      FROM words WHERE len(w) >= 5),
        |sh AS (SELECT doc_id, w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |       FROM t, UNNEST(range(1, len(w)-3)) AS u(i)),
        |d AS (SELECT doc_id, CAST(COUNT(DISTINCT shingle) AS BIGINT) AS dis
        |      FROM sh GROUP BY doc_id)
        |SELECT t.doc_id, n_windows, n_windows - dis AS n_dup,
        |  CAST(n_windows - dis AS DOUBLE) / n_windows AS dup_frac,
        |  CAST(n_windows - dis AS DOUBLE) / n_windows >= 0.3 AS repetitive
        |FROM t JOIN d ON d.doc_id = t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.repetitionScores(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling: per-source keep fractions via
    // the md5 hex draw of (salt, id) — membership is a pure function of
    // the id (stable under repartitioning/retries), unlike seeded-RNG
    // sampleBy. Unlisted strata drop to 0.
    QueryDef("tx12_stratified_sample", {
      def th(f: Double) = TextAnalysis.hexThreshold(f)
      s"""SELECT doc_id, source
         |FROM documents
         |WHERE substr(md5('mix:'||CAST(doc_id AS VARCHAR)), 1, 16) <
         |  CASE source WHEN 'src0' THEN '${th(1.0)}'
         |              WHEN 'src1' THEN '${th(0.5)}'
         |              WHEN 'src2' THEN '${th(0.25)}'
         |              ELSE '${th(0.1)}' END
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      TextAnalysis.sampleStratified(docs, "doc_id", "source", "mix",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), defaultFraction = 0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // Fixed-size chunking with overlap (size 40 words, overlap 8):
    // chunk c = words[c*32+1 .. c*32+40], last chunk short, <=40-word
    // docs are one chunk.
    QueryDef("tx10_chunking",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, w, n,
        |        CASE WHEN n <= 40 THEN 1
        |             ELSE CAST(CEIL((n - 40) / 32.0) AS BIGINT) + 1 END AS nc
        |      FROM w),
        |e AS (SELECT doc_id, w, n, CAST(i AS BIGINT) AS chunk_no
        |      FROM c, UNNEST(range(0, nc)) AS t(i))
        |SELECT doc_id, chunk_no,
        |  array_to_string(w[(chunk_no*32 + 1):(chunk_no*32 + 40)], ' ') AS chunk_text,
        |  LEAST(40, n - chunk_no*32) AS n_tokens
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin) { (s, d) =>
      TextAnalysis.chunk(Tables.load(s, d, "documents"), "doc_id", "text",
          size = 40, overlap = 8)
        .orderBy("doc_id", "chunk_no")
    },

    // Heuristic PII redaction (emails → long BARE digit runs (ids) →
    // phone-shaped runs, fixed order so counts never double-report; ids
    // before phones because the phone pattern also matches 9+-digit
    // runs) with per-doc audit counts.
    QueryDef("tx11_pii_redaction",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{9,}', '<ID>', 'g'),
        |    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{9,}')) AS BIGINT) AS n_ids,
        |  CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{9,}', '<ID>', 'g'),
        |    '\+?[0-9][0-9()\- ]{7,}[0-9]')) AS BIGINT) AS n_phones
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.redactPii(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Resize/resample over binary payloads: every 4th byte survives,
    // fingerprinted as md5(lowercase hex of the resampled bytes) — the
    // stub for an image-thumbnail/audio-downsample stage with the real
    // batch shape and digest verification.
    QueryDef("mm3_resample",
      """WITH b AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
        |             octet_length(CAST(text AS BLOB)) AS len FROM documents
        |           WHERE octet_length(CAST(text AS BLOB)) > 0),
        |r AS (SELECT doc_id, len,
        |        string_agg(substr(hx, CAST(j*8 + 1 AS BIGINT), 2), '' ORDER BY j) AS rhx,
        |        CAST(COUNT(*) AS BIGINT) AS new_len
        |      FROM b, UNNEST(range(0, CAST(ceil(len / 4.0) AS BIGINT))) AS t(j)
        |      GROUP BY doc_id, len)
        |SELECT doc_id, CAST(len AS BIGINT) AS orig_len, new_len, md5(rhx) AS res_digest
        |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      Multimodal.resample(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"),
          stride = 4)
        .orderBy("doc_id")
    },

    // Windowed byte-energy over binary payloads (audio silence-detection
    // plumbing): 32-byte windows reduced to unsigned-byte sums; the
    // oracle parses the same windows from lowercase hex.
    QueryDef("mm4_window_energy",
      """WITH b AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
        |             octet_length(CAST(text AS BLOB)) AS len FROM documents
        |           WHERE octet_length(CAST(text AS BLOB)) > 0),
        |w AS (SELECT doc_id, CAST(j AS BIGINT) AS win,
        |        substr(hx, CAST(j*64 + 1 AS BIGINT), 64) AS whx
        |      FROM b, UNNEST(range(0, (len+31)//32)) AS t(j))
        |SELECT doc_id, win, CAST(len(whx)//2 AS BIGINT) AS n_bytes,
        |  CAST(list_sum([(instr('0123456789abcdef', substr(whx, 2*i-1, 1)) - 1)*16
        |                 + instr('0123456789abcdef', substr(whx, 2*i, 1)) - 1
        |                 FOR i IN range(1, len(whx)//2 + 1)]) AS BIGINT) AS energy
        |FROM w ORDER BY doc_id, win""".stripMargin) { (s, d) =>
      Multimodal.windowEnergy(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"),
          window = 32)
        .orderBy("doc_id", "win")
    },

    // Byte-distribution uniformity screen over binary payloads — the
    // ingest-time corruption/encoding check run BEFORE decode. Exact
    // Int64: chi2 = Σ(16·c − n)² over the 16 nibble counts (the Pearson
    // χ² numerator scaled — no division, no transcendental),
    // concentration = 1e6·max(c) div n. The oracle counts nibble chars
    // in the lowercase hex directly (each hex char IS a nibble).
    QueryDef("mm5_byte_stats", {
      val nibbles = "0123456789abcdef".map(c => s"'$c'").mkString(", ")
      s"""WITH b AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx FROM documents
         |           WHERE octet_length(CAST(text AS BLOB)) > 0),
         |c AS (SELECT doc_id, CAST(LENGTH(hx) AS BIGINT) AS n,
         |        [CAST(LENGTH(hx) - LENGTH(REPLACE(hx, x, '')) AS BIGINT)
         |         FOR x IN [$nibbles]] AS cnt
         |      FROM b)
         |SELECT doc_id, n AS n_nibbles,
         |  CAST(list_sum([CASE WHEN c > 0 THEN 1 ELSE 0 END FOR c IN cnt]) AS BIGINT) AS distinct_nibbles,
         |  CAST(list_sum([(16*c - n)*(16*c - n) FOR c IN cnt]) AS BIGINT) AS chi2,
         |  CAST(1000000 * list_max(cnt) // n AS BIGINT) AS concentration_ppm
         |FROM c ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      Multimodal.byteStats(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"))
        .orderBy("doc_id")
    },

    // Frame sampling over binary payloads: every 64-byte stride yields a
    // 16-byte frame, fingerprinted as md5(lowercase hex) — the hex hop
    // keeps the spec portable (DuckDB has no blob substring).
    QueryDef("mm2_frame_sampling",
      """WITH b AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
        |             octet_length(CAST(text AS BLOB)) AS len FROM documents),
        |f AS (SELECT doc_id, CAST(j AS BIGINT) AS frame_no,
        |        md5(substr(hx, j*128 + 1, 32)) AS frame_hash
        |      FROM b, UNNEST(range(0, CAST(ceil(len / 64.0) AS BIGINT))) AS t(j))
        |SELECT doc_id, frame_no, frame_hash FROM f
        |ORDER BY doc_id, frame_no""".stripMargin) { (s, d) =>
      Multimodal.sampleFrames(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"))
        .orderBy("doc_id", "frame_no")
    },

    // Shared-frame linkage — payload pairs containing the SAME sampled
    // frames (the copied-segment detector: a reused clip shares frame
    // fingerprints across different containers). Fingerprint document
    // frequency is capped in [2, 20] BEFORE the pair join — boilerplate
    // frames (silence/black) are evidence of nothing and would otherwise
    // blow the join up df²-per-fingerprint (the dd2 df-cap rule).
    QueryDef("mm7_shared_frames",
      """WITH b AS (SELECT doc_id, lower(hex(CAST(text AS BLOB))) AS hx,
        |             octet_length(CAST(text AS BLOB)) AS len FROM documents),
        |f AS (SELECT doc_id, md5(substr(hx, j*128 + 1, 32)) AS fh
        |      FROM b, UNNEST(range(0, CAST(ceil(len / 64.0) AS BIGINT))) AS t(j)),
        |d AS (SELECT DISTINCT doc_id, fh FROM f),
        |dfc AS (SELECT fh, COUNT(*) AS c FROM d GROUP BY 1),
        |keep AS (SELECT d.doc_id, d.fh FROM d JOIN dfc ON dfc.fh = d.fh
        |         WHERE dfc.c BETWEEN 2 AND 20),
        |p AS (SELECT a.doc_id AS id1, b2.doc_id AS id2, COUNT(*) AS n_shared
        |      FROM keep a JOIN keep b2 ON a.fh = b2.fh AND a.doc_id < b2.doc_id
        |      GROUP BY 1, 2)
        |SELECT id1, id2, CAST(n_shared AS BIGINT) AS n_shared FROM p
        |WHERE n_shared >= 2 ORDER BY n_shared DESC, id1, id2 LIMIT 100""".stripMargin) { (s, d) =>
      Multimodal.sharedFramePairs(s,
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"))
        .orderBy(col("n_shared").desc, col("id1"), col("id2"))
        .limit(100)
    },

    // Perceptual-hash near-duplicate candidates over binary payloads:
    // 64-bit dHash (REAL javax.imageio luma for image payloads, byte-stub
    // grid for text — see ops.Multimodal.phash64) → 4×16-bit LSH bands →
    // bucket join → exact hamming verify. The image-dedup twin of
    // MinHash-LSH text dedup: candidate generation is bucket-bounded
    // (n²·4/2¹⁶ expected collisions), NEVER all-pairs, so the join
    // survives a 100 TB media corpus. These payloads are UTF-8 text, so
    // the oracle replays the byte-stub grid exactly; the real-decode leg
    // is pinned by OpsSpec (two JPEG qualities → one band bucket).
    // The query reports the 50 closest candidate pairs by hamming;
    // production callers use phashNearDupPairs' maxHamming filter.
    QueryDef("mm6_phash_neardup",
      """WITH b AS (SELECT doc_id, md5(lower(hex(CAST(text AS BLOB)))) AS b64 FROM documents),
        |cells AS (SELECT doc_id, i, md5(b64 || ':' || CAST(i AS VARCHAR)) AS h
        |          FROM b, range(0, 72) t(i)),
        |bits AS (SELECT c.doc_id, (c.i // 9) * 8 + (c.i % 9) AS pos,
        |           CASE WHEN c.h > r.h THEN '1' ELSE '0' END AS bit
        |         FROM cells c JOIN cells r ON r.doc_id = c.doc_id AND r.i = c.i + 1
        |         WHERE c.i % 9 < 8),
        |ph AS (SELECT doc_id, string_agg(bit, '' ORDER BY pos) AS phash FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, phash, bi, substr(phash, CAST(bi * 16 + 1 AS INTEGER), 16) AS bk
        |          FROM ph, range(0, 4) t(bi)),
        |cand AS (SELECT DISTINCT x.doc_id AS id1, y.doc_id AS id2,
        |                x.phash AS p1, y.phash AS p2
        |         FROM bands x JOIN bands y
        |           ON x.bi = y.bi AND x.bk = y.bk AND x.doc_id < y.doc_id),
        |hd AS (SELECT id1, id2,
        |         CAST((SELECT COUNT(*) FROM range(1, 65) t(i)
        |               WHERE substr(p1, CAST(i AS INTEGER), 1) <> substr(p2, CAST(i AS INTEGER), 1))
        |              AS BIGINT) AS hamming
        |       FROM cand)
        |SELECT id1, id2, hamming FROM hd
        |ORDER BY hamming, id1, id2 LIMIT 50""".stripMargin) { (s, d) =>
      Multimodal.phashNearDupPairs(
          Multimodal.asBinaryTable(Tables.load(s, d, "documents"), "doc_id", "text"),
          maxHamming = 64)
        .orderBy("hamming", "id1", "id2")
        .limit(50)
    },

    // Training-sequence packing: documents laid end-to-end in doc-id
    // order, cut every 512 tokens; each row is the span of one sequence a
    // document fills. The oracle's single global window cumsum is the
    // single-node formulation of the engine's distributed prefix sum.
    QueryDef("tx13_seq_packing",
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n,
        |        CAST(SUM(n) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n AS s
        |      FROM t),
        |e AS (SELECT doc_id, n, s, CAST(q AS BIGINT) AS seq_id
        |      FROM c, UNNEST(range(s // 512, (s + n - 1) // 512 + 1)) AS u(q))
        |SELECT doc_id, seq_id,
        |  GREATEST(s, seq_id*512) - seq_id*512 AS tok_lo,
        |  LEAST(s + n, (seq_id+1)*512) - GREATEST(s, seq_id*512) AS n_toks
        |FROM e ORDER BY doc_id, seq_id""".stripMargin) { (s, d) =>
      TextAnalysis.packSequences(Tables.load(s, d, "documents"), "doc_id", "text",
          seqLen = 512)
        .orderBy("doc_id", "seq_id")
    },

    // DSIR-style importance weights: hashed-unigram (256 md5 buckets)
    // log-likelihood ratio of the lang='en' target slice vs the raw
    // corpus, in exact integer micro-nats per document.
    QueryDef("tx14_importance_weights",
      """WITH tok AS (SELECT doc_id, lang, substr(md5(u.w), 1, 2) AS b
        |             FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |cnt AS (SELECT b, COUNT(*) AS raw,
        |          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tgt
        |        FROM tok GROUP BY b),
        |tot AS (SELECT CAST(SUM(raw) AS BIGINT) AS tr, CAST(SUM(tgt) AS BIGINT) AS tt
        |        FROM cnt),
        |w AS (SELECT b, CAST(FLOOR(1000000.0 * ln(((tgt + 1.0) * (tr + 256.0)) /
        |         ((raw + 1.0) * (tt + 256.0))) + 0.5) AS BIGINT) AS wt
        |      FROM cnt, tot),
        |sc AS (SELECT t.doc_id, COUNT(*) AS n_tokens, CAST(SUM(w.wt) AS BIGINT) AS score
        |       FROM tok t JOIN w ON t.b = w.b GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens, score,
        |  CAST(score AS DOUBLE) / 1000000.0 / n_tokens AS avg_logratio
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.importanceWeights(Tables.load(s, d, "documents"), "doc_id", "text",
          col("lang") === "en")
        .orderBy("doc_id")
    },

    // Hashed-bigram LM quality scoring (CCNet-style perplexity filter):
    // 4096-bucket bigram/unigram models trained on the corpus, every doc
    // scored by exact micro-nat log-likelihood sums.
    QueryDef("tx15_lm_quality",
      """WITH wd AS (SELECT doc_id, string_split(text, ' ') AS w,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |uni AS (SELECT doc_id, substr(md5(u.x), 1, 3) AS b
        |        FROM documents, UNNEST(string_split(text, ' ')) u(x)),
        |big AS (SELECT doc_id, substr(md5(w[i] || ' ' || w[i+1]), 1, 3) AS b
        |        FROM wd, UNNEST(range(1, n)) t(i) WHERE n >= 2),
        |cu AS (SELECT b, COUNT(*) AS c FROM uni GROUP BY b),
        |cb AS (SELECT b, COUNT(*) AS c FROM big GROUP BY b),
        |tu AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cu),
        |tb AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM cb),
        |wu AS (SELECT b, CAST(FLOOR(1000000.0 * ln((c + 1.0) / (t + 4096.0)) + 0.5) AS BIGINT) AS wt
        |       FROM cu, tu),
        |wb AS (SELECT b, CAST(FLOOR(1000000.0 * ln((c + 1.0) / (t + 4096.0)) + 0.5) AS BIGINT) AS wt
        |       FROM cb, tb),
        |su AS (SELECT u.doc_id, CAST(SUM(wu.wt) AS BIGINT) AS s
        |       FROM uni u JOIN wu ON u.b = wu.b GROUP BY u.doc_id),
        |sb AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(wb.wt) AS BIGINT) AS s
        |       FROM big g JOIN wb ON g.b = wb.b GROUP BY g.doc_id)
        |SELECT wd.doc_id, COALESCE(sb.nb, 0) AS n_bigrams,
        |  CAST(COALESCE(sb.s, 0) - su.s AS BIGINT) AS score,
        |  CAST(COALESCE(sb.s, 0) - su.s AS DOUBLE) / 1000000.0 /
        |    GREATEST(COALESCE(sb.nb, 0), 1) AS avg_logprob
        |FROM wd JOIN su ON wd.doc_id = su.doc_id
        |LEFT JOIN sb ON wd.doc_id = sb.doc_id
        |ORDER BY wd.doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.lmQualityScore(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Per-source drift: KL divergence of each source's hashed-unigram
    // distribution from the corpus blend, exact integer micro-nats
    // (tx14's quantize-then-aggregate rule).
    QueryDef("tx17_corpus_drift",
      """WITH tok AS (SELECT source, substr(md5(u.w), 1, 2) AS b
        |             FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |csb AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c_sb FROM tok GROUP BY 1, 2),
        |cb AS (SELECT b, CAST(SUM(c_sb) AS BIGINT) AS c_b FROM csb GROUP BY b),
        |ns AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s FROM csb GROUP BY source),
        |tot AS (SELECT CAST(SUM(c_sb) AS BIGINT) AS n_tot FROM csb),
        |t AS (SELECT csb.source, csb.c_sb, ns.n_s,
        |        CAST(FLOOR(1000000.0 * ln(
        |          (CAST(csb.c_sb AS DOUBLE) / CAST(ns.n_s AS DOUBLE)) /
        |          (CAST(cb.c_b AS DOUBLE) / CAST(n_tot AS DOUBLE))) + 0.5) AS BIGINT) AS w
        |      FROM csb JOIN cb USING (b) JOIN ns USING (source), tot)
        |SELECT source, MIN(n_s) AS n_tokens,
        |  CAST(SUM(c_sb * w) AS BIGINT) AS kl_micro,
        |  CAST(SUM(c_sb * w) AS DOUBLE) / 1000000.0 / MIN(n_s) AS kl_nats
        |FROM t GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      TextAnalysis.corpusDrift(Tables.load(s, d, "documents"), "source", "text")
        .orderBy("source")
    },

    // Deterministic global shuffle + shard assignment: shard = first hex
    // nibble of md5('shuf_' || id), pos = rank of the digest within the
    // shard — reproducible placement (pure function of the id), unlike an
    // orderBy(rand()) re-deal.
    QueryDef("tx16_shard_shuffle",
      """WITH k AS (SELECT doc_id, md5('shuf_' || CAST(doc_id AS VARCHAR)) AS k
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(instr('0123456789abcdef', substr(k, 1, 1)) - 1 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY substr(k, 1, 1)
        |    ORDER BY k, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.shardShuffle(Tables.load(s, d, "documents"), "doc_id", salt = "shuf")
        .orderBy("doc_id")
    },

    // Top-k TF-IDF terms per document. IDF quantized to integer
    // micro-nats (the tx14/tx15/tx17 convention) so scores are exact
    // BIGINT arithmetic in both engines; ties broken on the word.
    QueryDef("tx18_tfidf_topk",
      """WITH w AS (SELECT doc_id, u.w AS word
        |           FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM w GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |s AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |        CAST(tf.tf * CAST(FLOOR(1000000.0 * ln((n.n_docs + 1.0) /
        |          (CAST(df.df AS DOUBLE) + 1.0)) + 0.5) AS BIGINT) AS BIGINT) AS score_micro
        |      FROM tf JOIN df USING (word), n)
        |SELECT doc_id, word, tf, df, score_micro,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, word) AS BIGINT) AS rnk
        |FROM s QUALIFY rnk <= 5 ORDER BY doc_id, rnk""".stripMargin) { (s, d) =>
      TextAnalysis.tfIdfTopK(Tables.load(s, d, "documents"), "doc_id", "text", k = 5)
        .orderBy("doc_id", "rnk")
    },

    // BPE merge-candidate counting: char-pair frequencies weighted by
    // word frequency, the pair explosion over the DISTINCT vocab only.
    QueryDef("tx19_bpe_pairs",
      """WITH w AS (SELECT u.w AS word
        |           FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
        |           WHERE length(u.w) >= 2),
        |v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc FROM w GROUP BY 1),
        |p AS (SELECT substr(word, CAST(g.i AS INT), 2) AS pair, wc
        |      FROM v, UNNEST(generate_series(1, length(word) - 1)) AS g(i))
        |SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 50""".stripMargin) { (s, d) =>
      TextAnalysis.bpePairCounts(Tables.load(s, d, "documents"), "text", k = 50)
    },

    // Deterministic per-source quota sampling: at most 10 docs per
    // source, priority = 48-bit md5 prefix of the id (reproducible under
    // retry/rerun). The oracle ranks by the same 12-hex-char prefix.
    QueryDef("tx20_domain_quota",
      """WITH h AS (SELECT source, doc_id,
        |             substr(md5('quota_' || CAST(doc_id AS VARCHAR)), 1, 12) AS h12
        |           FROM documents),
        |r AS (SELECT source AS key, doc_id,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY source
        |          ORDER BY h12, doc_id) AS BIGINT) AS pos
        |      FROM h)
        |SELECT key, doc_id, pos FROM r WHERE pos <= 10
        |ORDER BY key, pos""".stripMargin) { (s, d) =>
      TextAnalysis.domainQuotaSample(Tables.load(s, d, "documents"),
          "doc_id", "source", quota = 10)
        .orderBy("key", "pos")
    },

    // Heavy hitters: Misra-Gries sketch (bounded state, one pass)
    // cross-checked against the exact top-20. The oracle asserts the
    // sketch's guarantees as literal TRUE — the q26 pattern: each engine
    // verifies its own sketch against the exact answer's error bound.
    QueryDef("tx21_heavy_hitters",
      """WITH w AS (SELECT u.w AS word
        |           FROM documents, UNNEST(string_split(text, ' ')) AS u(w)),
        |c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1)
        |SELECT word, n, TRUE AS found_ok, TRUE AS bound_ok
        |FROM c ORDER BY n DESC, word LIMIT 20""".stripMargin) { (s, d) =>
      TextAnalysis.heavyHitters(Tables.load(s, d, "documents"), "text",
        capacity = 512, k = 20)
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // top-k by ln(u)/w priority, u an md5-derived uniform, w = n_chars.
    // The single float op (ln) quantizes to integer micro-nats before
    // the weight division, which then runs in exact positive integer
    // arithmetic — rank order is engine-independent.
    QueryDef("tx22_weighted_sample",
      """WITH v AS (SELECT doc_id, n_chars,
        |             substr(md5('samp:'||CAST(doc_id AS VARCHAR)), 1, 13) AS h
        |           FROM documents),
        |k AS (SELECT doc_id, n_chars AS w,
        |        CAST(FLOOR(ln((CAST(list_sum(
        |            [(instr('0123456789abcdef', h[i]) - 1) * 16.0 ** (13 - i) FOR i IN range(1, 14)]
        |          ) AS DOUBLE) + 0.5) / 4503599627370496.0) * 1000000.0 + 0.5) AS BIGINT) AS m
        |      FROM v WHERE n_chars > 0)
        |SELECT doc_id, w AS weight, CAST(-((-m * 1000000) // w) AS BIGINT) AS key
        |FROM k ORDER BY key DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      TextAnalysis.weightedSample(Tables.load(s, d, "documents"),
        "doc_id", "n_chars", k = 100, salt = "samp")
    },

    // BM25 keyword retrieval: top-20 documents for a fixed term bag.
    // idf in micro-nats, tf saturation multiplied through into all-
    // integer ppm form — identical rank math on both engines.
    QueryDef("tx23_bm25_search",
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(len) AS BIGINT) AS a FROM d),
        |tf AS (SELECT doc_id, len, w, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id, len, u.w AS w FROM d, UNNEST(toks) AS u(w))
        |       WHERE w IN ('hash', 'join', 'filter') GROUP BY 1, 2, 3),
        |dfq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         CAST(FLOOR(ln((t.n - dfq.df + 0.5)/(dfq.df + 0.5) + 1.0)*1000000.0 + 0.5) AS BIGINT)
        |           * ((22 * t.a * tf.tf * 1000000) // (10 * t.a * tf.tf + 3 * t.a + 9 * tf.len * t.n)) AS part
        |       FROM tf JOIN dfq USING (w), tot t),
        |s AS (SELECT doc_id, CAST(SUM(part) AS BIGINT) AS score FROM sc GROUP BY 1)
        |SELECT doc_id, score,
        |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
        |FROM s ORDER BY score DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      TextAnalysis.bm25Search(Tables.load(s, d, "documents"),
        "doc_id", "text", Seq("hash", "join", "filter"), k = 20)
    },

    // End-to-end curation pipeline — the composed shape a training-data
    // run actually executes: language ID + quality gate + exact dedup
    // survivors + deterministic split, reported as per-(lang, split)
    // document/token counts. Every stage is an already-verified operator;
    // this query verifies their COMPOSITION (joins keyed on doc_id).
    QueryDef("p1_curation_pipeline", {
      val scoreCols = TextAnalysis.markers.map { case (lang, words) =>
        s"CAST(len(list_filter(toks, x -> x IN ${sqlList(words)})) AS DOUBLE)/n_tok AS score_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.markers.map(m => s"score_${m._1}").mkString(", ")
      def th(f: Double) = TextAnalysis.hexThreshold(f)
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks,
         |             len(string_split(text, ' ')) AS n_tok FROM documents),
         |sc AS (SELECT doc_id, text, $scoreCols FROM t),
         |lang AS (SELECT doc_id,
         |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |       WHEN greatest($langs) = 0 THEN 'und'
         |       WHEN score_fr = greatest($langs) THEN 'fr'
         |       WHEN score_es = greatest($langs) THEN 'es'
         |       WHEN score_en = greatest($langs) THEN 'en'
         |       ELSE 'de' END AS pred_lang
         |  FROM sc),
         |q AS (SELECT doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |        CAST((CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 10000 THEN 1 ELSE 0 END) +
         |             (CASE WHEN len(list_filter(string_split(text, ' '), x -> x IN $allStops)) > 0 THEN 1 ELSE 0 END) +
         |             (CASE WHEN (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 10 < length(text) THEN 1 ELSE 0 END)
         |          AS BIGINT) AS quality
         |      FROM documents),
         |surv AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY md5(text)),
         |f AS (SELECT l.doc_id, l.pred_lang, q.n_tokens
         |      FROM lang l JOIN q USING (doc_id) JOIN surv USING (doc_id)
         |      WHERE q.quality = 3 AND l.pred_lang <> 'und'),
         |sp AS (SELECT pred_lang, n_tokens,
         |  CASE WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.8)}' THEN 'train'
         |       WHEN substr(md5('graft:'||CAST(doc_id AS VARCHAR)), 1, 16) < '${th(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM f)
         |SELECT pred_lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val lang = TextAnalysis.languageId(docs, "doc_id", "text")
        .select("doc_id", "pred_lang")
      val qual = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality"), col("n_tokens"))
      val survivors = graft.ops.TextDedup.exactDedup(docs, "doc_id", "text")
        .select("doc_id")
      val filtered = lang.join(qual, "doc_id").join(survivors, "doc_id")
        .where(col("quality") === 3 && col("pred_lang") =!= "und")
      TextAnalysis.trainSplit(filtered, "doc_id", "graft")
        .groupBy("pred_lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").cast(org.apache.spark.sql.types.LongType).as("total_tokens"))
        .orderBy("pred_lang", "split")
    },

    // Corpus novelty scoring — per doc, the ppm fraction of its distinct
    // 5-gram shingles with corpus df = 1 (content existing nowhere
    // else): the up-sampling counterpart of tx8's contamination screen.
    // Spark runs ops.TextAnalysis.noveltyScores (in-row shingle sets,
    // one df aggregate, one join back); the oracle counts textual
    // distinct shingles — identical up to the dedup family's 2^-64
    // hash-collision trade.
    QueryDef("tx24_novelty",
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, w FROM words WHERE len(w) >= 5),
        |sh AS (SELECT DISTINCT doc_id,
        |         w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS shingle
        |       FROM t, UNNEST(range(1, len(w)-3)) AS u(i)),
        |dfc AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(COUNT(*) FILTER (WHERE df = 1) AS BIGINT) AS n_unique,
        |  CAST(1000000 * COUNT(*) FILTER (WHERE df = 1) // COUNT(*) AS BIGINT) AS novelty_ppm
        |FROM sh JOIN dfc USING (shingle) GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.noveltyScores(Tables.load(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Zipf FIT — the log-log rank-frequency slope of the corpus
    // vocabulary (natural text ≈ −1; far-off slopes flag synthetic/
    // templated corpora — a distribution-level quality screen). ln()
    // values quantize to BIGINT micro-nats FIRST (floor(1e6·ln+0.5),
    // the tx14/tx15 rule) so the regression moments are exact wide
    // integers; one double division at the end. The rank window runs
    // over the VOCABULARY-sized frequency table, not the corpus — the
    // only corpus-sized stage is the word-count aggregate.
    QueryDef("tx29_zipf_slope",
      """WITH w AS (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents),
        |f AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM w GROUP BY 1),
        |r AS (SELECT word, freq, ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rnk FROM f),
        |q AS (SELECT CAST(FLOOR(1000000 * ln(CAST(rnk AS DOUBLE)) + 0.5) AS HUGEINT) AS x,
        |        CAST(FLOOR(1000000 * ln(CAST(freq AS DOUBLE)) + 0.5) AS HUGEINT) AS y
        |      FROM r),
        |a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx FROM q)
        |SELECT CAST(n AS BIGINT) AS n_words,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
        |FROM a""".stripMargin) { (s, d) =>
      val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val f = Tables.load(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
      // vocabulary-sized frame, but vocabulary still grows with the
      // corpus — rank via DistributedRank, never a global window sort
      val r = graft.ops.DistributedRank.rowNumberByKey(
        f, Seq(), Seq(("freq", false), ("word", true)), out = "rnk")
      val q = r.select(
        expr("cast(floor(1000000 * ln(cast(rnk as double)) + 0.5) as decimal(38,0))").as("x"),
        expr("cast(floor(1000000 * ln(cast(freq as double)) + 0.5) as decimal(38,0))").as("y"))
      q.agg(count(lit(1)).cast(d38).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("n").cast("long").as("n_words"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("zipf_slope"))
    },

    // Lang-ID EVALUATION — the classifier-QA step: tx1's predictions
    // scored against the table's labeled `lang` column as a confusion
    // matrix (actual, predicted, n) plus per-actual hit counts. A model
    // eval is just a groupBy over a join of predictions and labels —
    // the harness shape every quality-classifier iteration loop needs.
    QueryDef("tx27_langid_eval", {
      val scoreCols = TextAnalysis.markers.map { case (lang, words) =>
        s"CAST(len(list_filter(toks, x -> x IN ${sqlList(words)})) AS DOUBLE)/n_tok AS score_$lang"
      }.mkString(",\n  ")
      val langs = TextAnalysis.markers.map(m => s"score_${m._1}").mkString(", ")
      s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks,
         |             len(string_split(text, ' ')) AS n_tok FROM documents),
         |s AS (SELECT doc_id, lang, text,
         |  $scoreCols
         |  FROM t),
         |p AS (SELECT doc_id, lang,
         |  CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
         |       WHEN greatest($langs) = 0 THEN 'und'
         |       WHEN score_fr = greatest($langs) THEN 'fr'
         |       WHEN score_es = greatest($langs) THEN 'es'
         |       WHEN score_en = greatest($langs) THEN 'en'
         |       ELSE 'de' END AS pred_lang
         |FROM s)
         |SELECT lang AS actual, pred_lang AS predicted,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    }) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      TextAnalysis.languageId(docs, "doc_id", "text")
        .select(col("doc_id"), col("pred_lang"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang").as("actual"), col("pred_lang").as("predicted"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L)).as("n_hit"))
        .orderBy("actual", "predicted")
    },

    // Dataset MIXING to a token budget — the Pile/DoReMi-style step that
    // assembles a training blend: each source gets budget
    // floor(T·w/Σw) tokens (weights here derived from the source id),
    // and docs fill it in deterministic md5 order until the cumulative
    // token count would exceed it. Per-source take-while = one keyed
    // window cumsum + one broadcast budget join — the distributed shape;
    // doc order inside a source is hash-shuffled (tx16's rule), so the
    // blend is unbiased AND reproducible. tx20's sibling with the budget
    // in TOKENS, not doc counts — what LM training actually allocates.
    QueryDef("tx26_token_budget_mix",
      """WITH t AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
        |             CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS w,
        |             md5('mix:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |ws AS (SELECT source, MIN(w) AS w FROM t GROUP BY 1),
        |tot AS (SELECT SUM(w) AS sw FROM ws),
        |b AS (SELECT source, w, 20000 * w // sw AS budget FROM ws, tot),
        |c AS (SELECT source, doc_id, tok,
        |        SUM(tok) OVER (PARTITION BY source ORDER BY h, doc_id) AS cum FROM t),
        |kept AS (SELECT c.source, c.doc_id, c.tok
        |         FROM c JOIN b ON b.source = c.source WHERE c.cum <= b.budget)
        |SELECT b.source, CAST(b.w AS BIGINT) AS weight, CAST(b.budget AS BIGINT) AS budget,
        |  CAST(COUNT(kept.doc_id) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(kept.tok), 0) AS BIGINT) AS tokens_kept
        |FROM b LEFT JOIN kept ON kept.source = b.source
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.load(s, d, "documents").select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tok"),
        (expr("cast(substring(source, 4) as bigint)") % 3 + 1).as("w"),
        md5(concat(lit("mix:"), col("doc_id").cast("string"))).as("h"))
      val ws = t.groupBy("source").agg(min("w").as("w"))
      val b = ws.crossJoin(broadcast(ws.agg(sum("w").as("sw"))))
        .select(col("source"), col("w"), expr("20000L * w div sw").as("budget"))
      val c = t.withColumn("cum",
        sum("tok").over(Window.partitionBy("source").orderBy("h", "doc_id")))
      val kept = c.join(broadcast(b.select(col("source"), col("budget"))), "source")
        .where(col("cum") <= col("budget"))
        .groupBy("source").agg(count(lit(1)).as("n_docs"), sum("tok").as("tk"))
      b.join(kept, Seq("source"), "left")
        .select(col("source"), col("w").cast("long").as("weight"), col("budget"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("tk"), lit(0L)).cast("long").as("tokens_kept"))
        .orderBy("source")
    },

    // BPE tokenizer training: learn the first 8 merges. The oracle
    // replays the trainer exactly — an unrolled CTE chain where round i
    // recomputes pair counts over the (i-1)-times-merged vocab, takes
    // the (freq DESC, lhs, rhs) argmax, and applies the space-delimited
    // literal replace. See graft.ops.Bpe for the replace-semantics and
    // early-exhaustion contract that makes this bit-exact cross-engine.
    QueryDef("tx30_bpe_train", bpeOracle(8)) { (s, d) =>
      graft.ops.Bpe.train(Tables.load(s, d, "documents"), "text", merges = 8)
        .orderBy("merge_rank")
    },

    // BPE ENCODE: train 8 merges, then tokenize every document by
    // replaying the merge schedule per word (the model is collected and
    // baked as plan literals — a zero-shuffle projection over the
    // corpus). The oracle re-derives the same 8 merges via the unrolled
    // trainer CTEs, then applies the identical 8-deep replace chain
    // inside a per-word lambda.
    QueryDef("tx31_bpe_encode", bpeEncodeOracle(8)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      val m = graft.ops.Bpe.train(docs, "text", merges = 8)
      graft.ops.Bpe.encode(docs, "text", "doc_id", m).orderBy("doc_id")
    },

    // Tokenizer VOCABULARY: base characters + merge symbols with dense
    // deterministic ids (single-char tier first, UTF-8 byte order within
    // tiers — the one string order Spark and DuckDB agree on).
    QueryDef("tx32_bpe_vocab", bpeVocabOracle(8)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      // vocabOf reads base symbols off the trainer's own checkpointed v0
      // — the old spelling re-scanned and re-exploded the corpus per char
      val (m, v0) = graft.ops.Bpe.trainState(docs, "text", merges = 8)
      graft.ops.Bpe.vocabOf(v0, m).orderBy("id")
    },

    // Token-ID encoding fingerprints: per document, the token count plus
    // order-sensitive integer checksums of the id sequence (id_dot pins
    // POSITIONS — a permuted token order cannot hash-match).
    QueryDef("tx33_bpe_token_ids", bpeTokenIdsOracle(8)) { (s, d) =>
      val docs = Tables.load(s, d, "documents")
      // the vocabulary comes from the trainer's v0 state — one corpus
      // scan fewer than the old train + vocab(docs) + encode chain
      val (m, v0) = graft.ops.Bpe.trainState(docs, "text", merges = 8)
      graft.ops.Bpe.encodeIdsWith(docs, "text", "doc_id", m,
        graft.ops.Bpe.vocabOf(v0, m)).orderBy("doc_id")
    }
  )

  /** The shared trainer-replay CTE chain: v0 (initial vocab) plus, per
    * round i, pair counts p$i, the argmax merge m$i, and the once-merged
    * vocab v$i. */
  private def bpeCtes(merges: Int): String = {
    val rounds = (1 to merges).map { i =>
      // m$i / v$i MATERIALIZED: round i references v_{i-1} TWICE (pair
      // count + replace), and the encode oracles cross-join EVERY m$i —
      // DuckDB 1.0's default inlining re-expands each reference's whole
      // upstream chain (2^rounds), the exact shape behind tx33's sf10
      // DNF. Semantic no-op; sf0.01 hashes unchanged (tx30-tx33 share
      // this trainer).
      s"""p$i AS (SELECT s[j] AS lhs, s[j+1] AS rhs, CAST(SUM(wc) AS BIGINT) AS freq
         |        FROM (SELECT string_split(trim(seq), ' ') AS s, wc FROM v${i - 1}),
         |             UNNEST(range(1, len(s))) AS t(j)
         |        GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT lhs, rhs, freq FROM p$i ORDER BY freq DESC, lhs, rhs LIMIT 1),
         |v$i AS MATERIALIZED (SELECT replace(seq, ' '||lhs||' '||rhs||' ', ' '||lhs||rhs||' ') AS seq, wc
         |        FROM v${i - 1}, m$i)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (
       |  SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq,
       |         CAST(COUNT(*) AS BIGINT) AS wc
       |  FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY 1),
       |$rounds""".stripMargin
  }

  /** Unrolled DuckDB twin of Bpe.train for `merges` rounds. */
  private def bpeOracle(merges: Int): String = {
    val union = (1 to merges)
      .map(i => s"SELECT CAST($i AS INTEGER) AS merge_rank, lhs, rhs, freq FROM m$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeCtes(merges)}
       |SELECT * FROM (
       |  $union)
       |ORDER BY merge_rank""".stripMargin
  }

  /** Vocab CTEs shared by tx32/tx33: base symbols from v0, merge
    * symbols from m1..mN, deduped, dense ids by (multi-char tier,
    * binary token order) — DuckDB's default collation is binary, which
    * matches the byte order the Spark side bakes. */
  private def bpeVocabCtes(merges: Int): String = {
    val mt = (1 to merges).map(i => s"SELECT lhs||rhs AS token FROM m$i").mkString(" UNION ")
    s"""base AS (SELECT DISTINCT UNNEST(string_split(trim(seq), ' ')) AS token FROM v0),
       |alltok AS (SELECT token FROM base UNION $mt),
       |vocab AS (SELECT token, CAST(ROW_NUMBER() OVER
       |  (ORDER BY (length(token) > 1), token) - 1 AS BIGINT) AS id FROM alltok)""".stripMargin
  }

  /** DuckDB twin of Bpe.vocab. */
  private def bpeVocabOracle(merges: Int): String =
    s"""WITH ${bpeCtes(merges)},
       |${bpeVocabCtes(merges)}
       |SELECT token, id FROM vocab""".stripMargin

  /** DuckDB twin of Bpe.encodeIds: encode (as tx31), position-explode
    * the token string, join the vocab, reduce to per-doc fingerprints. */
  private def bpeTokenIdsOracle(merges: Int): String = {
    val repl = (1 to merges).foldLeft("' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") {
      (acc, i) =>
        s"replace($acc, ' '||m$i.lhs||' '||m$i.rhs||' ', ' '||m$i.lhs||m$i.rhs||' ')"
    }
    val froms = (1 to merges).map(i => s"m$i").mkString(", ")
    s"""WITH ${bpeCtes(merges)},
       |${bpeVocabCtes(merges)},
       |enc AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(
       |      list_filter(string_split(text, ' '), w -> length(w) > 0),
       |      w -> trim($repl)), ' ') AS tokens
       |  FROM documents, $froms),
       |tok AS (
       |  SELECT doc_id, s[j] AS token, j
       |  FROM (SELECT doc_id, string_split(tokens, ' ') AS s FROM enc WHERE tokens <> ''),
       |       UNNEST(range(1, len(s) + 1)) AS t(j))
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(v.id) AS BIGINT) AS id_sum,
       |  CAST(SUM(v.id * j) AS BIGINT) AS id_dot
       |FROM tok JOIN vocab v USING (token) GROUP BY 1""".stripMargin
  }

  /** DuckDB twin of Bpe.encode: re-derive the merge table via the
    * trainer CTEs, then replay the identical per-word replace chain
    * (each single-row m$i cross-joined in, its lhs/rhs captured by the
    * per-word lambda). */
  private def bpeEncodeOracle(merges: Int): String = {
    val repl = (1 to merges).foldLeft("' ' || regexp_replace(w, '(.)', '\\1 ', 'g')") {
      (acc, i) =>
        s"replace($acc, ' '||m$i.lhs||' '||m$i.rhs||' ', ' '||m$i.lhs||m$i.rhs||' ')"
    }
    val froms = (1 to merges).map(i => s"m$i").mkString(", ")
    s"""WITH ${bpeCtes(merges)},
       |enc AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(
       |      list_filter(string_split(text, ' '), w -> length(w) > 0),
       |      w -> trim($repl)), ' ') AS tokens
       |  FROM documents, $froms)
       |SELECT doc_id, tokens,
       |  CAST(CASE WHEN tokens = '' THEN 0
       |            ELSE len(string_split(tokens, ' ')) END AS BIGINT) AS n_tokens
       |FROM enc""".stripMargin
  }
}
