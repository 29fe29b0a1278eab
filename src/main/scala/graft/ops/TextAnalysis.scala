package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data curation: marker-word
  * language ID, heuristic quality scoring, token counting (whitespace and
  * regex "BPE-ish" segmentation), and min-hash document fingerprinting.
  * All pure column expressions (codegen'd) — one pass over the corpus,
  * no shuffles except the fingerprint groupBy.
  */
object TextAnalysis {

  /** Marker-word sets per language. Deliberately small and fixed: the
    * operator contract is a deterministic heuristic, mirrored by the
    * DuckDB oracle. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans"))

  /** Per-language marker ratio columns `score_<lang>` + argmax
    * `pred_lang` ('zh' if any CJK character is present, 'und' when no
    * marker hits). */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // marker hits for all languages come from ONE tokenization pass
    // (native MarkerCounts) instead of one interpreted filter() lambda
    // per language per token
    val withTok = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("mc",
        graft.functions.TextExprs.marker_counts(col("text"), markers.map(_._2)))
      .withColumn("n_tok", element_at(col("mc"), markers.size + 2))
    val scored = markers.zipWithIndex.foldLeft(withTok) { case (df, ((lang, _), i)) =>
      df.withColumn(s"score_$lang",
        element_at(col("mc"), i + 1).cast(DoubleType) / col("n_tok"))
    }
    // Argmax with a fixed tie-break priority (fr > es > en > de), mirrored
    // verbatim by the oracle: first language whose score equals the max.
    val hasCjk = col("text").rlike("[\\u4e00-\\u9fff]")
    val best = greatest(markers.map { case (l, _) => col(s"score_$l") }: _*)
    val priority = Seq("fr", "es", "en", "de")
    val argmax = priority.tail.foldLeft(
      when(col(s"score_${priority.head}") === best, lit(priority.head))) { (acc, l) =>
      acc.when(col(s"score_$l") === best, lit(l))
    }
    scored
      .withColumn("pred_lang",
        when(hasCjk, lit("zh"))
          .when(best > 0, argmax)
          .otherwise(lit("und")))
      .select(Seq(col("doc_id")) ++ markers.map { case (l, _) => col(s"score_$l") } :+ col("pred_lang"): _*)
  }

  /** Heuristic quality features + composite score. Single-division doubles
    * only (deterministic). */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token and stopword counts from the same single-pass MarkerCounts
    // expression languageId uses (any-marker count = stopword count)
    val mc = graft.functions.TextExprs.marker_counts(col(textCol), markers.map(_._2))
    val nTok = element_at(mc, markers.size + 2)
    val nChars = length(col(textCol)).cast(LongType)
    val stops = element_at(mc, markers.size + 1)
    val punct = (nChars - length(regexp_replace(col(textCol), "[.,!?;:]", ""))).cast(LongType)
    docs.select(
      col(idCol).as("doc_id"),
      nChars.as("n_chars"),
      nTok.as("n_tokens"),
      ((nChars - (nTok - 1)).cast(DoubleType) / nTok).as("avg_tok_len"),
      (stops.cast(DoubleType) / nTok).as("stop_ratio"),
      (punct.cast(DoubleType) / nChars).as("punct_ratio"),
      (when(nTok.between(20, 10000), 1).otherwise(0) +
        when(stops > 0, 1).otherwise(0) +
        when(punct * 10 < nChars, 1).otherwise(0)).cast(LongType).as("quality"))
  }

  /** Whitespace and regex token counts. The regex segmentation
    * (letter-runs | digit-runs | single other non-space) approximates a
    * byte-pair-style pre-tokenizer; both counts come from ONE byte scan
    * (native TokenCounts — no token materialization, no regex engine). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = graft.functions.TextExprs.token_counts(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      element_at(tc, 1).as("ws_tokens"),
      element_at(tc, 2).as("re_tokens"))
  }

  /** Document fingerprint: concatenation of the 3 lexicographically
    * smallest DISTINCT md5(5-gram shingle) digests — a compact content
    * signature robust to local edits (winnowing-style min-selection).
    *
    * The min-3 selection runs entirely inside the row (native
    * MinKFingerprint expression: shingle windows hashed in place over
    * the text bytes, bounded ≤3-digest buffer), so the fingerprint pass
    * is a pure projection — NO shuffle, no shingle explosion. The
    * aggregate form (MinKMd5Aggregate) remains for grouped callers. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // the no-shingle docs are dropped by the CHEAP word-count predicate
    // (a filter on the fingerprint itself would push below the scan
    // projection and evaluate the md5 loop twice per row)
    docs
      .filter(size(split(col(textCol), " ")) >= 5)
      .select(col(idCol).as("doc_id"),
        graft.functions.TextExprs.min_k_fingerprint(col(textCol), 5, 3).as("fingerprint"))

  /** Repetition screening (the Gopher-style duplicate-n-gram filter):
    * the fraction of a document's word n-gram windows that repeat an
    * earlier window — high values flag boilerplate, looping generations,
    * and template spam. Distinct windows come from the native
    * ShingleHashSet (the 2^-64 per-pair hash-collision trade shared by
    * the whole dedup family); totals are plain word counts — a pure
    * zero-shuffle projection. */
  def repetitionScores(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 5, threshold: Double = 0.3): DataFrame = {
    val total = (size(split(col(textCol), " ")) - (n - 1)).cast(LongType)
    val distinctSh =
      size(graft.functions.TextExprs.shingle_hash_set(col(textCol), n)).cast(LongType)
    docs
      .filter(size(split(col(textCol), " ")) >= n)
      .select(col(idCol).as("doc_id"),
        total.as("n_windows"),
        (total - distinctSh).as("n_dup"),
        ((total - distinctSh).cast(DoubleType) / total).as("dup_frac"))
      .withColumn("repetitive", col("dup_frac") >= threshold)
  }

  /** Corpus novelty scoring — per doc, how much of its content exists
    * NOWHERE else: the fraction (ppm) of its distinct word n-gram
    * shingles with corpus document frequency 1. The inverse of tx8's
    * contamination overlap — high novelty marks original content worth
    * up-sampling, low novelty marks mirrors/boilerplate. Shuffle shape:
    * the in-row ShingleHashSet explode (the dd2 index layout: sz carried
    * beside the explode so the set is computed ONCE), one map-side-
    * combined df aggregate keyed on the shingle hash, one hash join back
    * (reusing the df aggregate's partitioning), one doc-keyed aggregate.
    * The ppm is an exact integer division; df equality is up to the
    * family's 2^-64 per-pair hash-collision trade. */
  def noveltyScores(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 5): DataFrame = {
    val spread = graft.ops.TextDedup.spreadSmallInput(
      docs.filter(size(split(col(textCol), " ")) >= n))
    val sh = spread
      .select(graft.ops.TextDedup.longId(docs, idCol, "noveltyScores").as("doc_id"),
        graft.functions.TextExprs.shingle_hash_set(col(textCol), n).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast(LongType).as("sz"),
        explode_outer(col("shs")).as("sh64"))
      .filter(col("sh64").isNotNull)
    val dfc = sh.groupBy("sh64").agg(count(lit(1)).as("df"))
    sh.join(dfc, "sh64")
      .groupBy("doc_id")
      .agg(first("sz").as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("1000000L * n_unique div n_shingles").as("novelty_ppm"))
  }

  /** Fixed-size document chunking with overlap — the tokenize-and-window
    * step every LLM training/RAG pipeline runs before embedding or
    * packing. Chunk c covers words [c·stride+1, c·stride+size] (stride =
    * size − overlap); the last chunk may be shorter, and a document with
    * ≤ size words is one chunk. Pure per-row explode over a computed
    * chunk count: no shuffle, chunk boundaries are a function of the row
    * alone (stable under repartitioning — the property a resumable
    * 100 TB chunking job needs). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, overlap: Int): DataFrame = {
    require(size >= 1 && overlap >= 0 && overlap < size,
      s"need 1 <= size ($size) and 0 <= overlap ($overlap) < size")
    val stride = size - overlap
    val w = split(col(textCol), " ")
    val nW = org.apache.spark.sql.functions.size(w).cast(LongType)
    val nChunks = when(nW <= size, lit(1L))
      .otherwise(ceil((nW - size).cast(DoubleType) / stride).cast(LongType) + 1L)
    docs
      .select(col(idCol).as("doc_id"), w.as("__w"), nW.as("__n"), nChunks.as("__nc"))
      .select(col("doc_id"), col("__w"), col("__n"),
        explode(sequence(lit(0L), col("__nc") - 1L)).as("chunk_no"))
      .select(col("doc_id"), col("chunk_no"),
        concat_ws(" ", slice(col("__w"), (col("chunk_no") * stride + 1L).cast("int"),
          lit(size))).as("chunk_text"),
        least(lit(size.toLong), col("__n") - col("chunk_no") * stride).as("n_tokens"))
  }

  /** Heuristic PII redaction: emails, phone-number-shaped digit runs, and
    * long bare digit runs are replaced with typed placeholders, with
    * per-document match counts for audit dashboards. The regexes are
    * deliberately RE2-safe (no backrefs/lookaround) so the same patterns
    * run in any engine; replacement order is fixed (emails first, so
    * their digits are never double-counted as phones). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // one matcher pass per pattern computes the count AND the replacement
    // (native PiiRedact) — half the regex traversals of the declarative
    // regexp_replace + regexp_extract_all formulation, same semantics.
    // Order matters and is fixed: emails, then long BARE digit runs
    // (ids), then phone-shaped runs — ids must run before phones, whose
    // pattern would otherwise swallow every 9+-digit run and make the
    // <ID> stage unreachable
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextExprs.pii_redact(col(textCol)).as("__r"))
      .select(col("doc_id"), col("__r.redacted").as("redacted"),
        col("__r.n_emails").as("n_emails"), col("__r.n_ids").as("n_ids"),
        col("__r.n_phones").as("n_phones"))

  /** Deterministic train/val/test assignment: the first 16 hex chars of
    * md5(salt || ':' || id) are a uniform 64-bit draw, and comparing the
    * HEX STRING against precomputed hex thresholds (0.8→'cccc…',
    * 0.9→'e666…') assigns fractions without any integer parsing — the
    * same expression runs unchanged in any md5-capable engine. Stable
    * under reshuffling/re-partitioning (pure function of the id), which
    * is the property a 100 TB split must have: membership never depends
    * on row order, task count, or retries.
    */
  def trainSplit(docs: DataFrame, idCol: String, salt: String,
                 trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val h = substring(md5(concat(lit(salt + ":"), col(idCol).cast(StringType))), 1, 16)
    docs.withColumn("split",
      when(h < lit(hexThreshold(trainFrac)), "train")
        .when(h < lit(hexThreshold(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Deterministic stratified sampling — the data-mixing primitive: keep
    * each stratum (source, language, ...) at its own fraction, decided by
    * comparing the md5 hex draw of (salt, id) against the stratum's
    * precomputed hex threshold. Unlike Spark's sampleBy (seeded RNG over
    * row order), membership is a pure function of the id: stable under
    * repartitioning, retries, AND incremental reruns over a growing
    * corpus — rows never flip in or out when data around them changes.
    * Strata missing from `fractions` default to 0.0 (dropped). */
  def sampleStratified(docs: DataFrame, idCol: String, strataCol: String,
                       salt: String, fractions: Map[String, Double],
                       defaultFraction: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val h = substring(md5(concat(lit(salt + ":"), col(idCol).cast(StringType))), 1, 16)
    val threshold = fractions.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(f))).otherwise(acc)
    }
    docs.filter(h < threshold)
  }

  /** Deterministic global shuffle + shard assignment — the training-data
    * export primitive: every document gets a pseudorandom but fully
    * reproducible (shard, pos). shard = first hex nibble of
    * md5(salt || id) (16 shards); pos = rank of the full digest within
    * the shard (ties broken by id). Like trainSplit/sampleStratified the
    * placement is a pure function of the id — stable under
    * repartitioning, retries, and incremental reruns — where an
    * orderBy(rand()) would re-deal the corpus every run.
    *
    * Scale shape: ONE shuffle (hash on shard), each task ranking 1/16 of
    * the corpus; the writer side repartitions on (shard, pos) and emits
    * one file sequence per shard. No global sort — the global order is
    * only ever needed per shard, which is the point of sharding.
    */
  def shardShuffle(docs: DataFrame, idCol: String, salt: String): DataFrame = {
    val key = md5(concat(lit(salt + "_"), col(idCol).cast(StringType)))
    docs
      .select(col(idCol).as("doc_id"), key.as("k"))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', substring(k, 1, 1))") - 1).cast(LongType))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))).cast(LongType))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): the global top-`k` documents by the priority key
    * ln(u)/w, where u is a uniform draw derived from md5(salt:id) and w
    * the document's weight — heavier documents draw systematically
    * higher priorities, and the selection is exactly a weighted sample
    * without replacement. Like every sampling primitive here the draw is
    * a pure function of the id (stable under repartition/retry/rerun);
    * the FLOAT part is confined to one ln() quantized to integer
    * micro-nats (floor(1e6·ln(u)+0.5), the tx14/tx15-established
    * cross-engine-safe form), after which the division by the weight is
    * EXACT positive integer arithmetic — so rank order is bit-identical
    * on any engine. Scale shape: zero shuffles to score (pure
    * projection), one TakeOrdered top-k — never a global sort.
    *
    * Output: (doc_id, weight, key) for the k sampled documents,
    * key = −((−m·10⁶) div w) in nano-nat-per-weight units (≤ 0; closer
    * to zero = higher priority).
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // 52-bit uniform: first 13 md5 hex chars; +0.5 keeps u in (0,1)
    val v = conv(substring(md5(concat(lit(salt + ":"), col(idCol).cast(StringType))), 1, 13),
      16, 10).cast(LongType)
    val u = (v.cast(DoubleType) + lit(0.5)) / lit(4503599627370496.0) // 2^52
    docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        col(weightCol).cast(LongType).as("w"),
        floor(log(u) * lit(1000000.0) + lit(0.5)).cast(LongType).as("m"))
      .filter(col("w") > 0)
      // −m ≥ 0 and w > 0: truncating and flooring division coincide, so
      // Spark's `div` and DuckDB's `//` agree bit-for-bit
      .withColumn("key", expr("-((-m * 1000000L) div w)"))
      .select(col("doc_id"), col("w").as("weight"), col("key"))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
  }

  /** BM25 keyword retrieval (Robertson–Spärck Jones, k1=1.2 b=0.75):
    * top-`k` documents for a bag of query terms. All scoring is EXACT
    * integer arithmetic: idf quantizes to micro-nats (the established
    * floor(1e6·ln+0.5) form) and the tf-saturation fraction
    * 2.2·tf / (tf + 0.3 + 0.9·L·N/A) is multiplied through by 10·A into
    * the all-integer ppm form (22·A·tf·10⁶) div (10·A·tf + 3·A + 9·L·N)
    * — positive operands, so every engine's integer division agrees.
    *
    * Scale shape: the explode is pre-filtered to the query terms INSIDE
    * the projection (matching tokens only — corpus-sized scan, term-
    * bounded shuffle), tf/df derive from one (doc, term) aggregation
    * (df via a broadcast-sized |terms| join, the tx18 derive-df-from-tf
    * rule), corpus totals are one 1-row aggregate baked as literals
    * (the collect-then-bake rule: bounded by constants, never data),
    * and the final top-k is TakeOrdered — no global sort.
    *
    * Output: (doc_id, score, rnk), score in micro-nat·ppm units.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && k >= 1, "need at least one term and k >= 1")
    val d0 = docs.select(col(idCol).cast(LongType).as("doc_id"),
      split(col(textCol), " ").as("toks"))
      .withColumn("len", size(col("toks")).cast(LongType))
    val totals = d0.agg(count(lit(1)).as("n"), sum("len").as("a"),
      max("len").as("maxLen")).head()
    val n = totals.getLong(0)
    if (n == 0L) { // empty corpus: empty result, not an unboxing NPE
      val spark = docs.sparkSession
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "score", "rnk")
    }
    val a = totals.getLong(1)
    val maxLen = totals.getLong(2)
    // the integer numerator 22·A·tf·10⁶ must fit Int64 (tf ≤ maxLen):
    // Spark's non-ANSI Long would WRAP silently where the oracle errors,
    // so fail loudly at the documented boundary instead
    require(maxLen <= Long.MaxValue / 22L / math.max(a, 1L) / 1000000L,
      s"bm25Search integer scale overflow: total tokens $a × max doc length $maxLen " +
        "exceeds the 10^6-ppm Int64 budget — shard the corpus or reduce the ppm scale")
    val tf = d0
      .select(col("doc_id"), col("len"), explode(col("toks")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy("doc_id", "len", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "w")
      .withColumn("idf", floor(log(
        (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
        * lit(1000000.0) + lit(0.5)).cast(LongType))
      .withColumn("part",
        expr(s"idf * ((22L * ${a}L * tf * 1000000L) div (10L * ${a}L * tf + 3L * ${a}L + 9L * len * ${n}L))"))
      .groupBy("doc_id").agg(sum("part").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))).cast(LongType))
  }

  /** Hex keep-threshold for a fraction: the first 16 md5 hex chars are a
    * uniform 64-bit draw, kept iff below this string. f >= 1.0 returns
    * "g" (lexicographically above every hex string) because
    * (1.0·2^63).toLong saturates and would otherwise silently drop the
    * two highest draws from a keep-everything stratum. ONE shared
    * definition: trainSplit, sampleStratified, and their oracles must
    * stay bit-identical. */
  def hexThreshold(f: Double): String =
    if (f >= 1.0) "g" else f"${(f * math.pow(2, 63)).toLong * 2}%016x"

  /** Eval-contamination check between a train and a test split: for every
    * test document, the fraction of its distinct word n-grams that also
    * appear anywhere in the train split. High overlap means the test doc
    * (or its source) leaked into training data — the standard benchmark-
    * decontamination screen. One shuffle keyed on the shingle (test
    * shingles left-semi-counted against the distinct train shingle set);
    * no pairwise doc×doc work, so cost is corpus-shingle-sized regardless
    * of split sizes.
    */
  def contaminationCheck(docs: DataFrame, idCol: String, textCol: String,
                         splitCol: String, n: Int,
                         threshold: Double,
                         bloomPrefilter: Boolean = false,
                         bloomItems: Long = 1L << 22): DataFrame = {
    // Shingles are keyed by their 64-bit xxhash, not the raw n-gram string:
    // every exchange then moves 8-byte longs instead of ~6-word strings,
    // and distinctness/overlap are computed on the hash (a cross-shingle
    // collision — 2^-64 per pair — is the standard dedup-pipeline trade).
    // 'val'-split docs can't contribute to either side, so they're dropped
    // before the (expensive) shingle explosion.
    val shAll = TextDedup.spreadSmallInput(
        docs.filter(col(splitCol).isin("train", "test")))
      .select(col(idCol).as("doc_id"), col(splitCol).as("__split"),
        explode_outer(graft.functions.TextExprs
          .shingle_hash_set(col(textCol), n)).as("sh64"))
      .filter(col("sh64").isNotNull)
    // Scale path: the corpus (train) side dwarfs the eval (test) side,
    // and almost none of its shingles match any eval shingle — so build a
    // bloom sketch over the TEST hashes (one small aggregate; the sketch,
    // never data, comes back), bake it into the plan, and drop train rows
    // in-row BEFORE they reach the exchange. False positives pass through
    // to the exact hash groupBy below, so results are bit-identical; the
    // big shuffle shrinks from corpus-shingle-sized to ~eval-sized.
    val sh = if (!bloomPrefilter) shAll else {
      // the eval-side shingle explosion runs twice (once for the sketch
      // aggregate, once in the union) — deliberately NOT persisted:
      // the eval set is the small side by construction, and a cached DF
      // with no safe unpersist point would outlive the call in a
      // long-lived serving session (the returned frame is lazy)
      val test = shAll.filter(col("__split") === "test")
      val bfBytes = test
        .agg(graft.functions.BloomFunctions.bloom_filter_agg(col("sh64"), bloomItems).as("bf"))
        .head.getAs[Array[Byte]]("bf")
      val train = shAll.filter(col("__split") === "train")
      val trainF =
        if (bfBytes == null) train.limit(0) // no eval docs at all
        else train.filter(graft.functions.BloomFunctions.might_contain(
          lit(bfBytes), col("sh64")))
      test.unionByName(trainF)
    }
    // ONE shuffle keyed on the shingle hash resolves train-membership and
    // the distinct test-doc set per shingle together (collect_set dedupes
    // repeat occurrences; its per-key state is bounded by the shingle's
    // TEST-split document frequency — the eval set, tiny next to the
    // corpus, so no unbounded hot-key state at scale); then one small
    // shuffle on doc_id aggregates the per-doc overlap.
    sh.groupBy("sh64")
      .agg(max(when(col("__split") === "train", 1).otherwise(0)).as("in_train"),
        collect_set(when(col("__split") === "test", col("doc_id"))).as("test_ids"))
      .select(col("in_train"), explode(col("test_ids")).as("doc_id"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"), sum(col("in_train")).cast(LongType).as("n_overlap"))
      .withColumn("overlap_frac", col("n_overlap").cast(DoubleType) / col("n_sh"))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }

  /** Per-source corpus drift: KL divergence of each source's hashed-
    * unigram distribution (256 md5 buckets, the tx14 hashing) from the
    * corpus-wide distribution, in exact integer micro-nats — the
    * data-mixing monitor that flags a source whose token distribution
    * wanders from the blend. KL_s = Σ_b c_sb·w(s,b) with
    * w = ⌊1e6·ln((c_sb·N)/(N_s·c_b)) + 0.5⌋; absent buckets contribute 0
    * (c_sb = 0), so no smoothing is needed. Same determinism rules as
    * tx14: the weights quantize to BIGINT micro-nats FIRST, the
    * aggregation is exact integer.
    *
    * Scale shape: ONE corpus-sized shuffle — the (source, bucket) count,
    * partial-aggregated map-side so the exchange carries ≤ sources×256
    * rows per task. Everything downstream (bucket totals, source totals,
    * the weight join) operates on the ≤ sources×256 count table via
    * broadcasts. Output: (source, n_tokens, kl_micro, kl_nats).
    */
  def corpusDrift(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val csb = TextDedup.spreadSmallInput(docs)
      .select(col(srcCol).as("source"), explode(split(col(textCol), " ")).as("w"))
      .select(col("source"), substring(md5(col("w")), 1, 2).as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("c_sb"))
    val cb = csb.groupBy("b").agg(sum("c_sb").as("c_b"))
    val ns = csb.groupBy("source").agg(sum("c_sb").as("n_s"))
    val tot = csb.agg(sum("c_sb").as("n_tot"))
    csb.join(broadcast(cb), Seq("b")).join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(tot))
      // ratio-of-quotients, NOT cross-products: c_sb*n_tot overflows
      // Int64 around 1e10 corpus tokens; each division is exact IEEE
      // (deterministic), and the oracle divides identically
      .withColumn("w", floor(
        lit(1e6) * log(
          (col("c_sb").cast(DoubleType) / col("n_s").cast(DoubleType)) /
            (col("c_b").cast(DoubleType) / col("n_tot").cast(DoubleType))) + 0.5)
        .cast(LongType))
      .groupBy("source")
      .agg(first(col("n_s")).as("n_tokens"),
        sum(col("c_sb") * col("w")).as("kl_micro"))
      .select(col("source"), col("n_tokens"), col("kl_micro"),
        (col("kl_micro").cast(DoubleType) / 1000000.0 / col("n_tokens")).as("kl_nats"))
  }

  /** Corpus-level n-gram frequency: top-k word n-grams across ALL
    * documents (boilerplate detection, contamination screening, corpus
    * drift dashboards). One map-side-combined groupBy on the n-gram, then
    * a TakeOrdered top-k — no full sort, no per-document state, so the
    * plan is the same at 100 TB: the only large exchange carries partial
    * counts, sized by distinct n-grams, not corpus tokens. */
  def topNgrams(docs: DataFrame, textCol: String,
                n: Int, k: Int): DataFrame =
    docs
      .select(split(col(textCol), " ").as("wd"))
      .filter(size(col("wd")) >= n)
      .select(col("wd"), explode(sequence(lit(1), size(col("wd")) - (n - 1))).as("i"))
      .select(concat_ws(" ",
        (0 until n).map(j => element_at(col("wd"), col("i") + j)): _*).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram"))
      .limit(k)

  /** Top-k TF-IDF terms per document — the classic keyword-extraction /
    * corpus-indexing primitive. Two hash aggregates (term frequency per
    * (doc, word); document frequency per word), one equi-join on the
    * word, one per-doc top-k. At scale: both aggregates are map-side
    * combinable (the tf exchange is sized by distinct (doc, word) pairs,
    * the df exchange by vocabulary), the join key is the word (vocab-
    * sized build side — AQE broadcasts it when it fits), and the top-k
    * window sorts only each doc's own terms.
    *
    * IDF is quantized to integer micro-nats (floor(1e6*ln((N+1)/(df+1))
    * + 0.5)) so the score is exact BIGINT arithmetic — engine-portable
    * despite ln()'s last-ulp libm differences (same convention as
    * importanceWeights/lmQualityScore). */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    // df derives from tf (tf has one row per (doc, word)), so the corpus
    // is exploded and shuffled ONCE; the df pass re-aggregates the much
    // smaller (doc, word) frame instead of re-scanning the corpus, and
    // countDistinct's Expand never appears
    val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast(DoubleType).as("n_docs"))
    val scored = tf.join(df, "word").crossJoin(n)
      .withColumn("idf_micro",
        floor(lit(1e6) * log((col("n_docs") + 1.0) / (col("df").cast(DoubleType) + 1.0)) + 0.5)
          .cast(LongType))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("word"))
    scored
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("score_micro"), col("rnk"))
  }

  /** BPE merge-candidate counting — the inner loop of byte-pair-encoding
    * vocabulary induction: character-pair frequencies weighted by word
    * frequency. The standard scaling trick applies: the corpus-sized
    * shuffle happens ONCE (word counts, map-side combinable down to the
    * vocabulary), and the pair explosion runs over the DISTINCT
    * vocabulary only — at 100 TB the vocab is millions of rows where the
    * corpus is trillions, so the quadratic-ish explode is off the big
    * table. Single-char words carry no pairs and are filtered before the
    * explode (Spark's sequence(1, 0) would descend, not return empty). */
  def bpePairCounts(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("wc"))
    vocab
      .select(col("word"), col("wc"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("word").substr(col("i"), lit(2)).as("pair"), col("wc"))
      .groupBy("pair").agg(sum("wc").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Deterministic per-key quota sampling — "keep at most `quota` docs
    * per domain/source", the standard web-corpus balancing op. Selection
    * priority is a pure function of the id (first 48 bits of
    * md5("quota_" || id), negated into a DESC score), so the sample is
    * reproducible under repartition/retry and stable as the corpus
    * grows. Ranking runs in the bounded TopKScoredAggregate — map-side
    * partials carry at most `quota` entries per key, nothing sorts more
    * than the insertion buffer — where a row_number window would shuffle
    * and fully sort every key's docs. 48 bits (not 64) so the priority
    * is exact in the aggregate's Double score lane. */
  def domainQuotaSample(docs: DataFrame, idCol: String, keyCol: String,
                        quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val hash48 = conv(substring(
      md5(concat(lit("quota_"), col(idCol).cast(StringType))), 1, 12), 16, 10)
      .cast(LongType)
    docs
      .select(col(keyCol).as("key"), col(idCol).cast(LongType).as("id"),
        (-hash48).cast(DoubleType).as("pri"))
      .groupBy("key")
      .agg(graft.functions.TopKScoredAggregate
        .top_k_scored(col("id"), col("pri"), quota).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("key"), col("s.id").as("doc_id"),
        (col("i") + 1).cast(LongType).as("pos"))
  }

  /** Corpus heavy hitters via a Misra–Gries sketch, cross-checked
    * against exact counts. The exact groupBy shuffles the full distinct
    * vocabulary; the sketch pass carries AT MOST `capacity` counters per
    * partial/shuffle-row/final buffer regardless of corpus size or skew —
    * the 100 TB shape for "what are the frequent tokens". Sketch
    * estimates are merge-order-dependent (true of any MG), so the output
    * compares them to the exact top-k through the sketch's guarantee
    * booleans instead of emitting raw estimates: `found_ok` (an item
    * with exact count > N/(capacity+1) must be in the summary) and
    * `bound_ok` (estimates never exceed the exact count and undercount
    * by at most N/(capacity+1)) — both provably true for a correct
    * implementation under ANY merge order. */
  def heavyHitters(docs: DataFrame, textCol: String, capacity: Int,
                   k: Int): DataFrame = {
    require(capacity >= 1 && k >= 1,
      s"capacity ($capacity) and k ($k) must be >= 1")
    val words = docs.select(explode(split(col(textCol), " ")).as("word"))
    val topk = words.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(k)
    val sk = words
      .agg(graft.functions.MisraGriesAggregate.misra_gries(col("word"), capacity).as("mg"))
      .select(explode(col("mg")).as("e"))
      .select(col("e.item").as("word"), col("e.est").as("est"))
    val tot = words.agg(count(lit(1)).as("n_tot"))
    topk.join(sk, Seq("word"), "left").crossJoin(tot)
      .select(col("word"), col("n"),
        (col("est").isNotNull || col("n") <= col("n_tot") / (capacity + 1)).as("found_ok"),
        (col("est").isNull ||
          (col("est") <= col("n") &&
            col("n") - col("est") <= col("n_tot") / (capacity + 1))).as("bound_ok"))
      .orderBy(col("n").desc, col("word"))
  }

  /** Training-sequence packing (the concat-and-chunk layout GPT-style
    * pipelines run before batching): documents are laid end-to-end in
    * doc-id order on one global token axis, which is cut every `seqLen`
    * tokens into training sequences; each output row says which span of
    * which sequence a document fills (docs longer than a sequence span
    * several; sequence boundaries ignore document boundaries, exactly
    * like the standard packed-LM data layout).
    *
    * The global token offset is a distributed prefix sum — NOT a global
    * single-task window: doc ids are coarsely bucketed (`id DIV
    * bucketSize`), the cumsum runs per bucket (bounded window state, one
    * data shuffle on the bucket key), and bucket base offsets come from a
    * bucket-totals side table that is corpus/bucketSize rows — tiny — so
    * its own running total is a one-partition window over counters, never
    * over data. Offsets join back by bucket as a broadcast. Every number
    * is a pure function of (id, token count): stable under
    * repartitioning, retries, and task count, which is what makes the
    * layout reproducible at 100 TB.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, bucketSize: Long = 65536L): DataFrame = {
    require(seqLen >= 1 && bucketSize >= 1, "need seqLen >= 1 and bucketSize >= 1")
    val L = lit(seqLen.toLong)
    val d = docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast(LongType).as("__n"))
      .withColumn("__bkt", expr(s"doc_id DIV $bucketSize"))
    // per-bucket running totals (bounded by bucketSize rows of state)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__bkt").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = d.withColumn("__cum", sum(col("__n")).over(w))
    // bucket base offsets: totals per bucket, then a running total over
    // the (tiny, one-row-per-bucket) totals table — single-partition
    // window over counters by construction, never over corpus rows
    val wb = org.apache.spark.sql.expressions.Window.orderBy("__bkt")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = d.groupBy("__bkt").agg(sum("__n").as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wb), lit(0L)))
      .select(col("__bkt"), col("__off"))
    cum.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__start", col("__off") + col("__cum") - col("__n"))
      .withColumn("seq_id", explode(sequence(
        expr(s"__start DIV $seqLen"), expr(s"(__start + __n - 1) DIV $seqLen"))))
      .select(col("doc_id"), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * L) - col("seq_id") * L).as("tok_lo"),
        (least(col("__start") + col("__n"), (col("seq_id") + 1L) * L) -
          greatest(col("__start"), col("seq_id") * L)).as("n_toks"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its tokens are under a hashed
    * unigram model of a TARGET subset (e.g. a trusted/high-quality slice)
    * than under the raw-corpus model. Tokens hash into 256 buckets (first
    * two md5 hex chars — portable to any md5-capable engine); each
    * bucket's weight is the add-one-smoothed log probability ratio,
    * quantized to integer micro-nats so the per-document sum is exact
    * Int64 — order-independent across engines, like the embedding ops'
    * micro-unit quantization.
    *
    * Scale shape: bucket counts are ONE map-side-combined groupBy on a
    * 256-value key; the 256 weights collect to the driver and bake into
    * the plan as a literal map, so scoring is a zero-shuffle projection
    * (per-token md5 + map lookup + exact sum, all inside the row). At
    * 100 TB nothing data-sized moves except the one bounded-key count
    * exchange.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column): DataFrame = {
    val B = 256 // 2 hex chars
    val toks = docs.select(targetPred.as("__t"),
        explode(split(col(textCol), " ")).as("__w"))
      .select(col("__t"), substring(md5(col("__w")), 1, 2).as("__b"))
    val counts = toks.groupBy("__b")
      .agg(count(lit(1)).as("raw"), sum(when(col("__t"), 1L).otherwise(0L)).as("tgt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totRaw = counts.map(_._2).sum
    val totTgt = counts.map(_._3).sum
    // micro-nat weight per bucket; the double expression is kept
    // OPERATION-FOR-OPERATION identical to the oracle SQL so IEEE
    // rounding agrees: ((tgt+1)*(totRaw+B)) / ((raw+1)*(totTgt+B)), ln,
    // floor(x+0.5) — products/quotient are correctly-rounded doubles,
    // exact integers up to 2^53; floor(x+0.5) (NOT round()) because
    // round-half semantics differ across engines on negative values
    // weights indexed by the digest's leading byte (== the 2-hex-char
    // bucket); buckets absent from the corpus counts are unreachable by
    // construction (same corpus scores itself) and stay 0
    val wArr = new Array[Long](B)
    counts.foreach { case (b, raw, tgt) =>
      wArr(Integer.parseInt(b, 16)) = math.floor(1000000.0 * math.log(
        ((tgt + 1.0) * (totRaw + B.toDouble)) / ((raw + 1.0) * (totTgt + B.toDouble)))
        + 0.5).toLong
    }
    // scoring is one native byte-scan per row (md5 + array index per
    // token) — no token array materialization, no interpreted lambda
    val bs = graft.functions.TextExprs.bucket_weight_sum(
      col(textCol), wArr.toIndexedSeq)
    docs.select(col(idCol).as("doc_id"), bs.as("__s"))
      .select(col("doc_id"), col("__s.n_tokens").as("n_tokens"),
        col("__s.score").as("score"))
      .withColumn("avg_logratio",
        col("score").cast(DoubleType) / 1000000.0 / col("n_tokens"))
  }

  /** Hashed-bigram LM quality scoring (the CCNet/Wenzek et al. 2020
    * perplexity-filter shape): a bigram language model with 4096-bucket
    * hashing is trained on the corpus itself in one pass, and every
    * document is scored by its average bigram log-likelihood minus the
    * unigram baseline — low `ppl_proxy` ≈ fluent in-domain text, high ≈
    * gibberish/boilerplate that a perplexity filter would cut. All
    * likelihoods are exact integer micro-nats (the tx14 quantization),
    * so cross-engine sums agree bit-for-bit.
    *
    * Scale shape: two map-side-combined groupBys on 4096-value keys
    * train the model; both weight tables collect to the driver (4096
    * longs each) and bake into ONE zero-shuffle scoring projection (two
    * native n-gram byte scans per row).
    */
  def lmQualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val B = 4096 // 3 hex chars
    val toks = split(col(textCol), " ")
    // BOTH model's bucket counts in ONE job: tagged union of the unigram
    // and bigram bucket streams through a single (tag, bucket)-keyed
    // map-side-combined aggregation, one driver collect (≤2·4096 rows)
    val uniBuckets = docs.select(explode(toks).as("__w"))
      .select(lit("u").as("__t"), substring(md5(col("__w")), 1, 3).as("__b"))
    val bigBuckets = docs.select(toks.as("__wd"), size(toks).as("__n"))
      .filter(col("__n") >= 2)
      .select(explode(sequence(lit(1), col("__n") - 1)).as("__i"), col("__wd"))
      .select(lit("g").as("__t"),
        substring(md5(concat(element_at(col("__wd"), col("__i")), lit(" "),
          element_at(col("__wd"), col("__i") + 1))), 1, 3).as("__b"))
    val counts = uniBuckets.unionAll(bigBuckets)
      .groupBy("__t", "__b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val uni = counts.collect { case ("u", b, c) => (b, c) }
    val big = counts.collect { case ("g", b, c) => (b, c) }
    val tu = uni.map(_._2).sum
    val tb = big.map(_._2).sum
    // add-one-smoothed log probabilities in micro-nats; same
    // floor(x+0.5) rounding and operation order as the oracle. Buckets
    // with no corpus hits are unreachable when the corpus scores itself
    // (they still get the smoothed c=0 weight for definedness).
    def bake(counts: Seq[(String, Long)], tot: Long): IndexedSeq[Long] = {
      val w = Array.fill(B)(
        math.floor(1000000.0 * math.log(1.0 / (tot + B.toDouble)) + 0.5).toLong)
      counts.foreach { case (k, c) =>
        w(Integer.parseInt(k, 16)) = math.floor(1000000.0 * math.log(
          (c + 1.0) / (tot + B.toDouble)) + 0.5).toLong
      }
      w.toIndexedSeq
    }
    val us = graft.functions.TextExprs.ngram_bucket_weight_sum(col(textCol), 1, bake(uni, tu))
    val bs = graft.functions.TextExprs.ngram_bucket_weight_sum(col(textCol), 2, bake(big, tb))
    docs.select(col(idCol).as("doc_id"), us.as("__u"), bs.as("__g"))
      .select(col("doc_id"), col("__g.n_windows").as("n_bigrams"),
        (col("__g.score") - col("__u.score")).as("score"))
      // avg log-likelihood, NOT exp(-x) perplexity: divisions are
      // correctly-rounded IEEE (cross-engine exact) where exp differs in
      // the last ulp between libm implementations; the ranking (what a
      // filter thresholds on) is identical since exp is monotone
      .withColumn("avg_logprob", col("score").cast(DoubleType) / 1000000.0 /
        greatest(col("n_bigrams"), lit(1L)))
  }

  /** Cross-document repeated n-gram spans (the exact-substring-dedup
    * primitive of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): every word position whose n-gram window
    * occurs >= 2 times ANYWHERE in the corpus (other documents or
    * elsewhere in the same one) is "repeated"; adjacent repeated
    * positions merge into maximal spans — the ranges an exact-substring
    * dedup pass would cut out of the training set.
    *
    * Scale shape: positional window hashes come from ONE native byte
    * scan per row (no n-gram string materialization); corpus frequencies
    * are a map-side-combined groupBy on the 64-bit hash (one long of
    * state per distinct window — never a position list, so hot
    * boilerplate n-grams cannot blow up aggregation state); occurrences
    * keep only >=2-frequency hashes via a semi join on the same key; and
    * the gaps-and-islands merge is one window keyed on doc_id. Two
    * hash-keyed exchanges + one doc-keyed window, all on fixed-width
    * longs — corpus-token-sized but never quadratic.
    */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    val ph = docs
      .select(col(idCol).as("doc_id"),
        posexplode_outer(graft.functions.TextExprs.window_hashes(col(textCol), n))
          .as(Seq("__p0", "h")))
      .filter(col("h").isNotNull)
      .select(col("doc_id"), (col("__p0") + 1L).as("pos"), col("h"))
    val hot = ph.groupBy("h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    ph.join(hot, Seq("h"), "left_semi")
      .withColumn("__isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min("pos").as("span_lo"),
        (max("pos") + (n - 1).toLong).as("span_hi"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_lo", "span_hi", "n_windows")
  }

  /** Robust winnowing (Schleimer et al., SIGMOD'03): positional word
    * k-gram hashes (16-hex md5 prefix); every window of `w` consecutive
    * hashes selects its minimum, rightmost position on ties; the document
    * fingerprint is the distinct selected (position, hash) set —
    * guaranteed to share a selection with any copy of length ≥ w+k-1.
    *
    * Portable tie-broken argmin: MIN over the window of the string
    * h || lpad(10^8-1-pos) — smallest hash wins, and among equal hashes
    * the largest position (smallest complement) wins, in one windowed
    * string MIN that Spark and DuckDB evaluate identically. One window
    * shuffle on doc_id; selection density is 2/(w+1).
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 4, w: Int = 8): DataFrame =
    // the selection runs per row in O(positions) with a monotonic deque
    // (native WinnowSelect expression) — same distinct (pos, fp) set as
    // the windowed string-MIN formulation, with NO doc-keyed window
    // sort/exchange and no O(n·w) re-scans; explode drops the empty
    // selections of documents without a complete window
    // explode_OUTER so InferFiltersFromGenerate cannot push an inferred
    // size(winnow_select(text)) > 0 predicate into the single-partition
    // scan (which would run the whole selection once more, single-threaded)
    docs
      .select(col(idCol).as("doc_id"),
        explode_outer(graft.functions.TextExprs.winnow_select(col(textCol), k, w)).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
}
