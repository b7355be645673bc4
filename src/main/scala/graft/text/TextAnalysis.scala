package graft.text

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.4 text analysis over `documents` — the LLM-pipeline text ops:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All scalar work uses codegen'd native functions / higher-order
  * array functions (no UDFs), so each op is a single narrow-scan
  * projection: embarrassingly parallel, no shuffle except final
  * presentation sort — the shape that survives 100 TB.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private def r4(c: Column) = round(c * 10000) / 10000

  /** Word tokens: lowercase, split on non-word runs, drop empties.
    * Identical semantics in the DuckDB oracle via
    * list_filter(string_split_regex(...)).
    */
  val toksExpr = "filter(split(lower(text), '\\\\W+'), x -> x != '')"

  // --- tx01: token counting ---
  val tx01_tokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_uniq"))
      .orderBy("doc_id")

  // --- tx02: quality scoring (length / punctuation / stopword ratios) ---
  val tx02_quality: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("t")).cast("long").as("n_tokens"),
        r4(length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
          nullif(length(col("text")), lit(0))).as("punct_ratio"),
        r4(expr("size(filter(t, x -> x IN ('the','a','an','of','and','to','in','is')))").cast("double") /
          nullif(size(col("t")), lit(0))).as("stop_ratio"),
        r4(expr("aggregate(t, 0L, (acc, x) -> acc + length(x))").cast("double") /
          nullif(size(col("t")), lit(0))).as("avg_word_len"))
      .orderBy("doc_id")

  // --- tx03: marker-word language ID (n-gram heuristic) ---
  private val markers = Map(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  val tx03_langid: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
    val scored = markers.foldLeft(base) { case (df, (lang, ws)) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      df.withColumn(s"s_$lang",
        expr(s"size(filter(t, x -> x IN ($inList)))").cast("long"))
    }
    scored.select(col("doc_id"),
      when(col("s_en") > 0 && col("s_en") >= col("s_de") &&
           col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
        .when(col("s_de") > 0 && col("s_de") >= col("s_fr") &&
              col("s_de") >= col("s_es"), "de")
        .when(col("s_fr") > 0 && col("s_fr") >= col("s_es"), "fr")
        .when(col("s_es") > 0, "es")
        .otherwise("und").as("pred_lang"),
      col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
      .orderBy("doc_id")
  }

  /** Whitespace-normalized text for fingerprinting: lowercase, collapse
    * whitespace runs, trim.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  // --- tx04: document fingerprint (md5 of normalized text) ---
  val tx04_fingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("fp"))
      .orderBy("doc_id")

  // --- tx05: 64-bit rolling-hash shingle fingerprints ---
  // Rows-only (hash seeds aren't SQL-portable): per doc, hash every
  // 5-token window with a chained xxhash64 fold, keep the
  // min/max/count as the doc's locality fingerprint.
  val tx05_rolling_fp: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.rollingHashes("t", 5).as("whs"))
      .filter(size(col("whs")) > 0)
      .select(col("doc_id"),
        array_min(col("whs")).as("fp_min"),
        array_max(col("whs")).as("fp_max"),
        size(col("whs")).cast("long").as("n_windows"))
      .orderBy("doc_id")

  // --- tx06: TF-IDF top terms per document ---
  // One scan → explode; df and N computed declaratively (no driver
  // collect); rank on the ROUNDED score so cross-engine libm-ulp
  // noise in ln() can't flip orderings.
  val tx06_tfidf: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val terms = docs
      .select(col("doc_id"), explode(expr(toksExpr)).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = terms.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        r4(col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tfidf")
      .orderBy("doc_id", "rank")
  }

  // --- tx00: text normalization (the canonicalization every dedup /
  // fingerprint op builds on, exposed as its own operator) ---
  val tx00_normalize: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        normText(col("text")).as("norm"),
        length(normText(col("text"))).cast("long").as("norm_len"),
        (length(col("text")) - length(normText(col("text")))).cast("long").as("squeezed"))
      .orderBy("doc_id")

  // --- tx07: PII redaction (training-data scrubbing pass) ---
  // Masks emails, dotted IPv4s, and long digit runs — run over
  // `customer` because its names carry real digit runs (every row
  // redacts), so the oracle exercises actual substitutions, not a
  // no-op. Single narrow projection, no shuffle.
  val tx07_redact: Q = (s, d) => {
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val ipRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val numRe = "\\d{4,}"
    Tables.customer(s, d)
      .select(col("c_custkey"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col("c_name"), emailRe, "<EMAIL>"),
            ipRe, "<IP>"),
          numRe, "<NUM>").as("redacted"),
        expr(s"size(regexp_extract_all(c_name, '\\\\d{4,}', 0))")
          .cast("long").as("n_digit_runs"))
      .orderBy("c_custkey")
  }

  // --- tx08: repetition signals (Gopher-style quality rules) ---
  // Duplicate-token ratio, duplicate-2gram ratio, and top-term share
  // per document — the "is this doc mostly one phrase repeated"
  // filters every corpus-cleaning pipeline applies. Per-row array
  // ops only: one scan, no shuffle.
  // The four counts come from the native one-pass
  // [[graft.functions.TokenStats]] expression (integers — exact
  // oracle parity by construction); only the ratio arithmetic stays
  // declarative. The previous three-lambda HOF formulation evaluated
  // interpreted and measured 2.0 s at sf0.1 (CharStats' rationale).
  val tx08_repetition: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"), graft.functions.GraftFunctions.tokenStats("t").as("ts"))
      .select(col("doc_id"),
        col("ts.n_tokens").as("n_tokens"),
        r4(lit(1.0) - col("ts.n_uniq").cast("double") /
          nullif(col("ts.n_tokens"), lit(0L))).as("dup_token_ratio"),
        r4(when(col("ts.n_tokens") >= 2,
            lit(1.0) - col("ts.n_big_uniq").cast("double") /
              (col("ts.n_tokens") - 1).cast("double"))
          .otherwise(lit(null).cast("double"))).as("dup_2gram_ratio"),
        r4(when(col("ts.n_tokens") > 0, col("ts.top_count").cast("double"))
          .otherwise(lit(null).cast("double")) /
          nullif(col("ts.n_tokens"), lit(0L))).as("top_share"))
      .orderBy("doc_id")

  // --- tx09: corpus-level stats (the one-row telemetry every ingest
  // job logs: doc count, token volume, vocabulary size, length
  // distribution). Token percentile via exact `percentile` (matches
  // DuckDB quantile_cont, same as q23); vocab via a distinct over the
  // exploded terms — one shuffle, mergeable at any scale (q34's
  // approx_count_distinct is the 100 TB substitute when exactness
  // isn't required).
  val tx09_corpus_stats: Q = (s, d) => {
    val toks = Tables.documents(s, d).select(expr(toksExpr).as("t"))
    val per = toks.select(size(col("t")).as("n"))
    val vocab = toks.select(explode(col("t")).as("term"))
      .agg(countDistinct("term").as("vocab"))
    per.agg(
      count(lit(1)).as("n_docs"),
      sum("n").cast("long").as("total_tokens"),
      r4(avg("n")).as("avg_tokens"),
      r4(expr("percentile(n, 0.5)")).as("p50_tokens"),
      max("n").cast("long").as("max_tokens"))
      .crossJoin(broadcast(vocab))
  }

  // --- tx10: corpus n-gram statistics — the top bigrams across the
  // corpus, the telemetry a data pipeline uses to spot boilerplate
  // and template contamination. One explode + one partial-aggregated
  // count shuffle + a global top-50 (TakeOrdered, never a full sort);
  // ordering is total (count desc, bigram asc) so the cut is
  // deterministic on both engines.
  val tx10_ngram_stats: Q = (s, d) =>
    Tables.documents(s, d)
      .select(expr(toksExpr).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(50)

  // --- tx11: boilerplate scoring — what share of each document is
  // made of the corpus's most common bigrams. The per-doc counterpart
  // of tx10: tx10 names the boilerplate, tx11 scores every document
  // against it (the CCNet/RefinedWeb-style "templated page" signal a
  // filtering pass thresholds on). Scale shape: the top-K table is
  // tiny by construction (K rows via TakeOrdered, never a full vocab
  // sort) and BROADCAST into the per-doc join, so the whole pass is
  // the bigram explode + one partial-aggregated groupBy(doc_id) —
  // no vocab-sized shuffle touches the corpus twice. Counts are
  // integers (occurrences, not distinct), so the oracle is exact;
  // the share uses the r4 idiom.
  val tx11_boilerplate: Q = (s, d) => {
    val topK = 200
    val bigramsExpr =
      "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(bigramsExpr)).as("g"))
    val top = bg.groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("g")).limit(topK)
      .select(col("g"), lit(1).as("hit"))
    bg.join(broadcast(top), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), count(col("hit")).as("n_boiler"))
      .withColumn("boiler_share", r4(col("n_boiler") / col("n_bigrams")))
      .orderBy("doc_id")
  }

  // --- tx12: character-entropy quality signal. Shannon entropy of
  // the per-doc character distribution — the Gopher-style "too
  // low-entropy to be prose" gate (gibberish and template pages sit
  // at the tails). Frequency counting is the native codegen'd
  // [[graft.functions.CharStats]] expression (one JVM pass per doc):
  // the declarative formulations all route per-char work through
  // higher-order array lambdas, which evaluate interpreted — the
  // count-per-distinct-char version measured 6.1 s at sf0.1 and the
  // array_sort + run-boundary rewrite still ~3 s (interpreted sort
  // comparator) — so this is exactly the "custom native Expression
  // beats HOF folds" case dd03 established. Single narrow scan, no
  // shuffle but the presentation sort; the ~40-term double sum rounds
  // stably to 4 decimals in both engines.
  val tx12_entropy: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.charStats("text").as("cs"))
      .filter(col("cs.n_chars") > 0)
      .select(col("doc_id"), col("cs.n_chars").as("n_chars"),
        col("cs.n_alphabet").as("n_alphabet"),
        r4(col("cs.entropy")).as("char_entropy"))
      .orderBy("doc_id")

  // --- tx13: deflate compression-ratio quality signal — the
  // Gopher-style "compresses too well ⇒ repetitive/templated" gate
  // (tx08 measures token repetition; this catches sub-token and
  // long-range redundancy those ratios miss). zlib-deflate is not
  // expressible in SQL on either engine → rows-only, spec-verified by
  // an exact driver-side recompute. Physical shape is the mm02
  // discipline: mapPartitions with per-partition init — ONE Deflater
  // + one output buffer per task, reset per row, so the inner loop
  // allocates nothing — a narrow scan in, scalar columns out, no
  // shuffle but the presentation sort.
  val tx13_compress: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        // Deflater holds native (off-heap) memory; releasing it on
        // task completion keeps a long-lived executor's footprint flat
        // instead of waiting on GC cleaners
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          (id, in.length.toLong, out)
        }
      }
      .toDF("doc_id", "n_bytes", "n_deflate")
      .filter(col("n_bytes") > 0)
      .withColumn("deflate_ratio", r4(col("n_deflate") / col("n_bytes")))
      .orderBy("doc_id")
  }

  // --- tx14: unigram log-probability quality score — the CCNet-style
  // LM quality filter with the corpus itself as the language model.
  // Per doc: mean token surprisal −log2 p(tok) under corpus unigram
  // frequencies, with the vocabulary CAPPED at the top-K terms
  // (TakeOrdered, tx10's discipline — at web scale the full unigram
  // table is itself corpus-sized, a capped one is broadcastable by
  // construction) and out-of-vocabulary tokens floored at 1/total.
  // High surprisal ⇒ gibberish/rare-token soup; low ⇒ boilerplate.
  // Scale shape: one wordcount shuffle for the vocab, then explode +
  // BROADCAST vocab join + partial-agg per-doc mean — two corpus
  // scans, no vocab-sized shuffle against the corpus. K is a dial;
  // 1000 here so the OOV path is exercised at test scale.
  // --- tx17: bigram-LM surprisal — tx14's CCNet-style LM filter
  // upgraded from unigram to conditional bigram probabilities
  // (P(w|prev) from the corpus itself), which separates "rare words"
  // from "implausible word SEQUENCES" — the signal that catches
  // shuffled/templated text whose unigram profile looks normal.
  // Scale shape: ONE bigram explode feeds everything; the model is
  // the top-K bigrams (TakeOrdered — broadcastable by construction)
  // carrying exact conditional probabilities cnt(prev,w)/cnt(prev,*)
  // — the prefix-total table is a vocab-sized INTERMEDIATE aggregate
  // but only its K-row join survives into the broadcast; OOV bigrams
  // floor at 1/total like tx14. One bigram shuffle + broadcast join +
  // partial-agg mean: no vocab-sized shuffle against the corpus.
  val tx17_bigram_lp: Q = (s, d) => {
    val topK = 2000
    val bigramsExpr =
      "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
    val bg = Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(bigramsExpr)).as("g"))
    val bgc = bg.groupBy("g").agg(count(lit(1)).as("cnt"))
    val prefixTot = bgc
      .groupBy(expr("split(g, ' ')[0]").as("prev")).agg(sum("cnt").as("pcnt"))
    val top = bgc.orderBy(col("cnt").desc, col("g")).limit(topK)
      .withColumn("prev", expr("split(g, ' ')[0]"))
    val model = prefixTot.join(broadcast(top), Seq("prev"))
      .select(col("g"),
        (col("cnt").cast("double") / col("pcnt").cast("double")).as("cp"))
    val tot = bgc.agg(sum("cnt").cast("double").as("tot"))
    bg.join(broadcast(model), Seq("g"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        (-log2(coalesce(col("cp"), lit(1.0) / col("tot")))).as("sp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), r4(avg("sp")).as("mean_bigram_surprisal"))
      .orderBy("doc_id")
  }

  val tx14_unigram_lp: Q = (s, d) => {
    val topK = 1000
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(expr(toksExpr)).as("term"))
    // vocab and total both derive from ONE wordcount — sharing the
    // term exchange (ReuseExchange) instead of tokenizing the corpus
    // once per branch; total = sum of counts ≡ token count exactly
    val wc = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
    val vocab = wc.orderBy(col("cnt").desc, col("term")).limit(topK)
    val total = wc.agg(sum("cnt").cast("double").as("tot"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log2(coalesce(col("cnt").cast("double"), lit(1.0)) / col("tot"))).as("sp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), r4(avg("sp")).as("mean_surprisal"))
      .orderBy("doc_id")
  }

  /** GPT-2-style pre-tokenizer pattern (the published regex shape:
    * contractions, space-prefixed letter/number runs, punctuation
    * runs, trailing-whitespace handling). Java-regex semantics on
    * both the executor and the spec's driver-side recompute.
    */
  val bpePattern =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  // --- tx15: BPE-ish token counting — token statistics under a
  // GPT-2-style PRE-TOKENIZER instead of tx01's \W+ word split. This
  // is the count that actually predicts training cost (whitespace
  // and punctuation become tokens; "don't" is 2-3 tokens, not 1), so
  // a pipeline budgets sequences on it, not on word counts.
  // chars_per_token is the standard fertility/compression proxy.
  // The pattern needs lookahead, which DuckDB's RE2 engine lacks →
  // rows-only; the spec recomputes with the same Java regex, so the
  // check is exact. Scale shape: one regexp_extract_all projection +
  // the native TokenStats pass — narrow scan, no shuffle but the
  // presentation sort.
  val tx15_bpe_tokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        regexp_extract_all(col("text"), lit(bpePattern), lit(0)).as("bt"))
      .select(col("doc_id"), col("n_chars"),
        graft.functions.GraftFunctions.tokenStats("bt").as("ts"))
      .filter(col("ts.n_tokens") > 0)
      .select(col("doc_id"),
        col("ts.n_tokens").as("n_bpe_tokens"),
        col("ts.n_uniq").as("n_uniq"),
        r4(col("n_chars").cast("double") / col("ts.n_tokens")).as("chars_per_token"))
      .orderBy("doc_id")

  // --- tx16: composite quality gate — the Gopher/C4-style rule stack
  // a corpus-cleaning pipeline actually ends with: every document is
  // scored against a FIXED, NAMED rule set and carries the list of
  // rules it failed (the audit/ablation telemetry that lets you answer
  // "why did we drop 12% of this crawl"), not just a keep bit.
  // Thresholds are tuned so the gate discriminates on this synthetic
  // corpus (~40% drop) — real pipelines tune per corpus; what the
  // oracle locks is the mechanism: integer-exact signals, IEEE-
  // identical ratio arithmetic on both engines, fixed rule order in
  // the reasons string. Scale shape: ONE narrow scan (native
  // TokenStats + two HOF folds), rules are scalar projections — no
  // shuffle but the presentation sort.
  val tx16_quality_gate: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), expr(toksExpr).as("t"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.tokenStats("t").as("ts"),
        expr("size(filter(t, x -> x IN ('the','a','an','of','and','to','in','is')))")
          .as("n_stop"),
        expr("aggregate(t, 0L, (acc, x) -> acc + length(x))").as("sum_len"))
      .select(col("doc_id"),
        col("ts.n_tokens").as("n_tokens"),
        (col("n_stop").cast("double") / nullif(col("ts.n_tokens"), lit(0L)))
          .as("stop_ratio"),
        (col("sum_len").cast("double") / nullif(col("ts.n_tokens"), lit(0L)))
          .as("avg_word_len"),
        (lit(1.0) - col("ts.n_uniq").cast("double") /
          nullif(col("ts.n_tokens"), lit(0L))).as("dup_token_ratio"),
        when(col("ts.n_tokens") >= 2,
          lit(1.0) - col("ts.n_big_uniq").cast("double") /
            (col("ts.n_tokens") - 1).cast("double"))
          .otherwise(lit(null).cast("double")).as("dup_2gram_ratio"))
      .select(col("doc_id"), col("n_tokens"),
        concat_ws(",",
          when(col("n_tokens") < 20, lit("len_short")),
          when(col("n_tokens") > 90, lit("len_long")),
          when(coalesce(col("stop_ratio"), lit(0.0)) < 0.02, lit("low_stopword")),
          when(coalesce(col("dup_token_ratio"), lit(0.0)) > 0.65,
            lit("repetitive_tokens")),
          when(coalesce(col("dup_2gram_ratio"), lit(0.0)) > 0.07,
            lit("repetitive_bigrams")),
          when(coalesce(col("avg_word_len"), lit(0.0)) < 2 ||
            coalesce(col("avg_word_len"), lit(0.0)) > 12, lit("word_len_anomaly")))
          .as("reasons"))
      .select(col("doc_id"), col("n_tokens"),
        (col("reasons") === lit("")).as("keep"), col("reasons"))
      .orderBy("doc_id")

  val registry: Map[String, Q] = Map(
    "tx16_quality_gate" -> tx16_quality_gate,
    "tx15_bpe_tokens" -> tx15_bpe_tokens,
    "tx14_unigram_lp" -> tx14_unigram_lp,
    "tx17_bigram_lp" -> tx17_bigram_lp,
    "tx13_compress" -> tx13_compress,
    "tx12_entropy" -> tx12_entropy,
    "tx11_boilerplate" -> tx11_boilerplate,
    "tx00_normalize" -> tx00_normalize,
    "tx10_ngram_stats" -> tx10_ngram_stats,
    "tx06_tfidf" -> tx06_tfidf,
    "tx07_redact" -> tx07_redact,
    "tx08_repetition" -> tx08_repetition,
    "tx09_corpus_stats" -> tx09_corpus_stats,
    "tx01_tokens" -> tx01_tokens,
    "tx02_quality" -> tx02_quality,
    "tx03_langid" -> tx03_langid,
    "tx04_fingerprint" -> tx04_fingerprint,
    "tx05_rolling_fp" -> tx05_rolling_fp)

  private val sqlToks =
    "list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "tx16_quality_gate" ->
      s"""WITH x AS (SELECT doc_id, text, $sqlToks AS t FROM documents),
         |sig AS (SELECT doc_id, len(t) AS n_tokens,
         |  CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
         |    / nullif(len(t), 0) AS stop_ratio,
         |  CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
         |    / nullif(len(t), 0) AS avg_word_len,
         |  1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / nullif(len(t), 0) AS dup_token_ratio,
         |  CASE WHEN len(t) >= 2 THEN
         |    1.0 - CAST(len(list_distinct(list_transform(generate_series(1, len(t) - 1),
         |          i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE) / (len(t) - 1)
         |    ELSE NULL END AS dup_2gram_ratio
         | FROM x),
         |r AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, concat_ws(',',
         |  CASE WHEN n_tokens < 20 THEN 'len_short' END,
         |  CASE WHEN n_tokens > 90 THEN 'len_long' END,
         |  CASE WHEN coalesce(stop_ratio, 0) < 0.02 THEN 'low_stopword' END,
         |  CASE WHEN coalesce(dup_token_ratio, 0) > 0.65 THEN 'repetitive_tokens' END,
         |  CASE WHEN coalesce(dup_2gram_ratio, 0) > 0.07 THEN 'repetitive_bigrams' END,
         |  CASE WHEN coalesce(avg_word_len, 0) < 2 OR coalesce(avg_word_len, 0) > 12
         |    THEN 'word_len_anomaly' END) AS reasons FROM sig)
         |SELECT doc_id, n_tokens, (reasons = '') AS keep, reasons
         |FROM r ORDER BY doc_id""".stripMargin,
    "tx17_bigram_lp" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM t WHERE len(t) >= 2) x),
         |bgc AS (SELECT g, count(*) AS cnt FROM bg GROUP BY g),
         |pt AS (SELECT string_split(g, ' ')[1] AS prev, sum(cnt) AS pcnt
         |       FROM bgc GROUP BY 1),
         |m AS (SELECT g, CAST(cnt AS DOUBLE) / CAST(pcnt AS DOUBLE) AS cp
         |      FROM (SELECT g, cnt, string_split(g, ' ')[1] AS prev FROM bgc
         |            ORDER BY cnt DESC, g LIMIT 2000) z
         |      JOIN pt USING (prev)),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM bgc)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(avg(-log2(coalesce(cp, 1.0 / tot))) * 10000) / 10000
         |    AS mean_bigram_surprisal
         |FROM bg LEFT JOIN m USING (g) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tx14_unigram_lp" ->
      s"""WITH t AS (SELECT doc_id, unnest(t) AS term
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) x),
         |v AS (SELECT term, cnt FROM (
         |    SELECT term, count(*) AS cnt FROM t GROUP BY term
         |    ORDER BY cnt DESC, term LIMIT 1000) z),
         |tot AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  round(avg(-log2(coalesce(CAST(cnt AS DOUBLE), 1.0) / tot)) * 10000) / 10000
         |    AS mean_surprisal
         |FROM t LEFT JOIN v USING (term) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tx12_entropy" ->
      """WITH c AS (SELECT doc_id,
        |    list_filter(string_split(text, ''), x -> x <> '') AS cs
        |  FROM documents),
        |d AS (SELECT doc_id, cs, len(cs) AS n, list_distinct(cs) AS ds
        |  FROM c WHERE len(cs) > 0)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  CAST(len(ds) AS BIGINT) AS n_alphabet,
        |  round((-1) * list_sum(list_transform(ds, ch ->
        |    (CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / n) *
        |    log2(CAST(len(list_filter(cs, x -> x = ch)) AS DOUBLE) / n))) * 10000) / 10000
        |    AS char_entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "tx11_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |b AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
         |      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM t) x),
         |tk AS (SELECT g, 1 AS hit FROM (
         |       SELECT g, count(*) AS cnt FROM b GROUP BY g
         |       ORDER BY cnt DESC, g LIMIT 200) z)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(count(hit) AS BIGINT) AS n_boiler,
         |  round((CAST(count(hit) AS DOUBLE) / count(*)) * 10000) / 10000 AS boiler_share
         |FROM b LEFT JOIN tk USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "tx10_ngram_stats" ->
      s"""WITH t AS (SELECT $sqlToks AS t FROM documents),
         |b AS (SELECT t[i] || ' ' || t[i+1] AS bigram
         |      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i FROM t) x)
         |SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
         |FROM b GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin,
    "tx00_normalize" ->
      """SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS norm_len,
        |  CAST(length(text) - length(norm) AS BIGINT) AS squeezed
        |FROM (SELECT doc_id, text,
        |        trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "tx06_tfidf" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(t) AS term
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) x),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms) y GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |    round((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 10000) / 10000 AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, rank, term, tfidf FROM (
         |  SELECT doc_id, term, tfidf,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
         |  FROM scored) z
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "tx01_tokens" ->
      s"""SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_uniq
         |FROM (SELECT doc_id, $sqlToks AS t FROM documents) x ORDER BY doc_id""".stripMargin,
    "tx02_quality" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, len(t) AS n_tokens,
         |  round((CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |         / nullif(length(text), 0)) * 10000) / 10000 AS punct_ratio,
         |  round((CAST(len(list_filter(t, x -> x IN ('the','a','an','of','and','to','in','is'))) AS DOUBLE)
         |         / nullif(len(t), 0)) * 10000) / 10000 AS stop_ratio,
         |  round((CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
         |         / nullif(len(t), 0)) * 10000) / 10000 AS avg_word_len
         |FROM (SELECT doc_id, text, $sqlToks AS t FROM documents) x ORDER BY doc_id""".stripMargin,
    "tx03_langid" ->
      s"""WITH sc AS (
         |  SELECT doc_id,
         |    len(list_filter(t, x -> x IN ('the','a','and','of','is'))) AS s_en,
         |    len(list_filter(t, x -> x IN ('der','die','das','und','ist'))) AS s_de,
         |    len(list_filter(t, x -> x IN ('le','la','les','et','est'))) AS s_fr,
         |    len(list_filter(t, x -> x IN ('el','los','las','y','es'))) AS s_es
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents) x)
         |SELECT doc_id,
         |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
         |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
         |       WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
         |       WHEN s_es > 0 THEN 'es'
         |       ELSE 'und' END AS pred_lang,
         |  s_en, s_de, s_fr, s_es
         |FROM sc ORDER BY doc_id""".stripMargin,
    "tx04_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx07_redact" ->
      """SELECT c_custkey,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(c_name, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |      '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g'),
        |    '\d{4,}', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(c_name, '\d{4,}')) AS BIGINT) AS n_digit_runs
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "tx08_repetition" ->
      s"""SELECT doc_id, len(t) AS n_tokens,
         |  round((1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / nullif(len(t), 0)) * 10000) / 10000 AS dup_token_ratio,
         |  round((CASE WHEN len(t) >= 2 THEN
         |    1.0 - CAST(len(list_distinct(list_transform(generate_series(1, len(t) - 1),
         |          i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE) / (len(t) - 1)
         |    ELSE NULL END) * 10000) / 10000 AS dup_2gram_ratio,
         |  round((CAST(list_max(list_transform(list_distinct(t), x -> len(list_filter(t, y -> y = x)))) AS DOUBLE)
         |         / nullif(len(t), 0)) * 10000) / 10000 AS top_share
         |FROM (SELECT doc_id, $sqlToks AS t FROM documents) x ORDER BY doc_id""".stripMargin,
    "tx09_corpus_stats" ->
      s"""WITH t AS (SELECT $sqlToks AS t FROM documents),
         |per AS (SELECT len(t) AS n FROM t),
         |v AS (SELECT count(DISTINCT term) AS vocab
         |      FROM (SELECT unnest(t) AS term FROM t) u)
         |SELECT count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS total_tokens,
         |  round(avg(n) * 10000) / 10000 AS avg_tokens,
         |  round(quantile_cont(n, 0.5) * 10000) / 10000 AS p50_tokens,
         |  CAST(max(n) AS BIGINT) AS max_tokens, vocab
         |FROM per, v GROUP BY vocab""".stripMargin)
}
