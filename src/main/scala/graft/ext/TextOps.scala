package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines: language ID (n-gram /
  * stopword heuristic), quality scoring, token counting, document
  * fingerprinting. Everything is per-row codegen'd expressions — no UDFs,
  * no shuffles; these run at scan speed over 100 TB. */
object TextOps {

  /** Tiny per-language stopword lists for the overlap heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una"))

  private def stopArray(lang: String): Column =
    array(stopwords(lang).map(lit): _*)

  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** Distinct-token overlap with each language's stopword list, plus the
    * argmax guess (ties break by the en→de→fr→es order of the CASE). */
  def langScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val hits = Seq("en", "de", "fr", "es").map(l =>
      size(array_intersect(toks, stopArray(l))).as(s"${l}_hits"))
    val guess = when(col("en_hits") >= greatest(col("de_hits"), col("fr_hits"), col("es_hits")), "en")
      .when(col("de_hits") >= greatest(col("fr_hits"), col("es_hits")), "de")
      .when(col("fr_hits") >= col("es_hits"), "fr")
      .otherwise("es")
    df.select(col("doc_id") +: hits: _*).withColumn("guessed_lang", guess)
  }

  /** Length / token / punctuation / stopword-ratio quality features and a
    * bounded composite score — the classic cheap pre-filter before
    * expensive model-based scoring. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(toks).as("n_tokens"),
      regexp_count(col(textCol), lit("[.!?,;:]")).as("n_punct"),
      size(filter(toks, t => array_contains(stopArray("en"), t))).as("n_stop"))
      .withColumn("raw_ratio",
        col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1)))
      // FLOOR(x*1e4+0.5)/1e4 rather than round(): identical IEEE half-up on
      // every engine, immune to the Spark-vs-DuckDB midpoint divergence.
      .withColumn("stop_ratio", floor(col("raw_ratio") * 10000 + 0.5) / 10000)
      .withColumn("quality",
        floor(least(col("n_tokens").cast("double") / 50.0d, lit(1.0d)) *
          (lit(0.5d) + col("raw_ratio") / 2.0d) * 10000 + 0.5) / 10000)
      .drop("raw_ratio")
  }

  /** Gopher-style rule-bundle curation filter (Rae et al. 2021, appendix
    * A1.1), restricted to the rules expressible without line structure:
    * word-count bounds, mean-word-length in [3, 10], symbol-to-word ratio
    * (`#` and `...`) below 0.1, ≥80% of words containing a letter, and ≥2
    * distinct English stopwords present. Every threshold is a CROSS-
    * MULTIPLIED INTEGER comparison (3·n ≤ Σlen, 10·n_sym < n, 5·n_alpha ≥
    * 4·n) — no float ratio to disagree over, so the flags hash-compare
    * against any engine. One pure projection: filtering 100 TB is a scan.
    * Output: per-doc feature counts, one 0/1 flag per rule, and the ANDed
    * `keep` flag. */
  def gopherFlags(df: DataFrame, textCol: String = "text",
      minTokens: Int = 20, maxTokens: Int = 100000): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val toks = tokens(txt)
    df.select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        // Σ token lengths = chars of the de-spaced lowered text (tokens()
        // drops empty splits, so runs of spaces contribute nothing).
        length(regexp_replace(lower(txt), " ", "")).as("sum_len"),
        (regexp_count(txt, lit("#")) + regexp_count(txt, lit("\\.\\.\\.")))
          .as("n_sym"),
        size(filter(toks, t => t.rlike("[a-z]"))).as("n_alpha"),
        size(array_intersect(toks, stopArray("en"))).as("n_stop"))
      .withColumn("r_wc",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
          .cast("int"))
      .withColumn("r_mwl",
        (col("sum_len") >= col("n_tokens") * 3 &&
          col("sum_len") <= col("n_tokens") * 10).cast("int"))
      .withColumn("r_sym", (col("n_sym") * 10 < col("n_tokens")).cast("int"))
      .withColumn("r_alpha",
        (col("n_alpha") * 5 >= col("n_tokens") * 4).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= 2).cast("int"))
      .withColumn("keep",
        (col("r_wc") === 1 && col("r_mwl") === 1 && col("r_sym") === 1 &&
          col("r_alpha") === 1 && col("r_stop") === 1).cast("int"))
  }

  /** Whitespace vs BPE-ish token counts. The BPE-ish regex is the standard
    * letters-run | digits-run | single-symbol split — a cheap, deterministic
    * proxy for subword token counts. */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(
      col("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(tokens(col(textCol))).as("ws_tokens"),
      regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))
        .as("bpe_tokens"))

  /** Split documents into token-bounded chunks with overlap — the standard
    * pre-tokenization step of a pretraining pipeline (long docs → windows a
    * model context can hold; overlap preserves cross-boundary context).
    * Pure HOF projection + one `posexplode`: chunking 100 TB is a scan, not
    * a shuffle. Output: (doc_id, chunk_id, n_chunk_tokens, chunk) with
    * chunk_id 0-based; a doc shorter than `maxTokens` yields one chunk. */
  def chunk(df: DataFrame, maxTokens: Int, overlap: Int = 0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap max=$maxTokens")
    val stride = maxTokens - overlap
    val toks = tokens(col(textCol))
    df.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        // _outer: at least one chunk always exists, and non-outer explode
        // gets an inferred `size>0 AND isnotnull` pre-filter that inlines
        // the whole chunking transform (with __toks substituted back to
        // the tokenizer — the quadratic form) twice more per row.
        posexplode_outer(
          transform(
            // chunk starts: 0, stride, 2*stride, … (at least one chunk)
            sequence(lit(0),
              greatest(ceil((size(col("__toks")) - overlap).cast("double") / stride)
                .cast("int") - 1, lit(0))),
            i => slice(col("__toks"), i * stride + 1, lit(maxTokens))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk"))
  }

  /** PII patterns in the Java-regex ∩ RE2 common subset (character
    * classes, bounded repetition, `\b` — no lookaround), so the SAME
    * pattern string runs on Spark (java.util.regex) and DuckDB (RE2). */
  val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val phoneRe = """\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"""
  val ipv4Re = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Masks emails → `<EMAIL>`, then phones → `<PHONE>`, then IPv4s →
    * `<IP>` (email first: its char class would otherwise eat into
    * adjacent tokens once placeholders are present). Pure codegen'd
    * `regexp_replace` chain — scan-speed at 100 TB, no UDF. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Whitespace/control normalization — the first pass of every text
    * curation pipeline: C0 control chars (tab, CR, NUL, …) become spaces,
    * space runs collapse to one, ends are trimmed. Pure codegen'd regex
    * chain (Java∩RE2 subset), scan-speed. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "[\\x00-\\x1f]", " "), " +", " "))

  /** HTML/markup boilerplate removal — strip `<…>` tags, then decode the
    * four entities that dominate web-scraped corpora (`&lt; &gt; &nbsp;
    * &amp;` — amp LAST so `&amp;lt;` decodes to the literal `&lt;`, the
    * standard single-pass order), then collapse the whitespace the removed
    * tags leave behind. Pure codegen'd regex/replace chain (Java∩RE2
    * subset), scan-speed — the cheap first pass before a real DOM
    * extractor for the rows that still look like markup afterwards. */
  def stripMarkup(text: Column): Column = {
    val untagged = regexp_replace(text, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      untagged, "&lt;", "<"), "&gt;", ">"), "&nbsp;", " "), "&amp;", "&")
    trim(regexp_replace(decoded, " +", " "))
  }

  /** Hashing-trick linear text scorer — the fastText-style shape of a
    * quality classifier (bag of hashed tokens × weight vector) with a
    * deterministic weight function standing in for trained weights, so the
    * ARCHITECTURE (hash → bucket → weight-sum → sign) is real and
    * engine-exact while no model file is needed. Per token: base-31
    * polynomial hash mod 1e9+7 (the [[rollingFingerprint]] arithmetic),
    * bucket = hash mod `buckets`, weight = a Knuth-LCG of the bucket
    * recentered to [-2^30, 2^30). Integer end to end → exact oracle.
    * Swapping in trained weights = replacing the LCG with a broadcast
    * `buckets`-sized lookup array; the plan shape does not change.
    * All in-projection HOFs: no explode, no shuffle, scan-speed. */
  def hashClassifierScore(text: Column, buckets: Int = 1024): Column = {
    val tokHash = (t: Column) => aggregate(
      transform(split(t, ""), c => ascii(c).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L)
    val weight = (h: Column) =>
      (h % buckets) * 2654435761L % 2147483648L - 1073741824L
    aggregate(tokens(text), lit(0L), (acc, t) => acc + weight(tokHash(t)))
  }

  /** All `http(s)://…` URLs in a text (space-delimited, like the PII
    * patterns a Java∩RE2 common-subset regex — same string runs on Spark
    * and DuckDB). */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^ ]+"), lit(0))

  /** Normalized registrable-host of one URL: authority component (up to
    * the first `/`, `?` or `#`), lowercased, leading `www.` stripped.
    * Pure codegen'd regex projection — scan-speed URL analytics. */
  def urlDomain(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^https?://([^/?#]+)", 1)),
      "^www\\.", "")

  /** Per-document character-unigram Shannon entropy (nats, 4dp) — the
    * cheap gibberish/encoding-noise detector: natural text sits near
    * ~3 nats, base64/hex blobs and single-char spam fall far outside.
    * Output: (idCol, n_chars, n_distinct_chars, entropy_nats).
    *
    * Determinism across engines: H = ln(n) − Σ c·ln(c) / n, with the sum
    * accumulated over per-char counts in CHARACTER-SORTED order — both
    * engines add the same doubles in the same order, so the 4dp digest is
    * stable (a plain SUM() over groups has engine-dependent accumulation
    * order).
    *
    * Scale shape: one explode + two hash aggregations — and that is the
    * RIGHT 100 TB shape, not a compromise: the per-(doc, char) partial
    * aggregate runs map-side BEFORE the exchange, so only ~alphabet rows
    * per document ever shuffle (the exploded chars never leave their scan
    * partition). The tempting "pure projection" alternative — per-row
    * sorted-char run-length fold — shuffles nothing extra but pays an
    * interpreted HOF pass over EVERY character and measured 4× slower at
    * sf0.1; the count array here is bounded by the alphabet, never by
    * document length. */
  def charEntropy(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000
    val chars = df.select(col(idCol),
        explode_outer(split(col(textCol), "")).as("ch"))
      .where(col("ch").isNotNull && col("ch") =!= "")
    val counts = chars.groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_distinct_chars"),
        sort_array(collect_list(struct(col("ch"), col("c")))).as("__cs"))
      .select(col(idCol),
        col("n").as("n_chars"),
        col("n_distinct_chars"),
        r4(log(col("n").cast("double")) -
          aggregate(col("__cs"), lit(0.0d),
            (acc, x) => acc + x.getField("c").cast("double") *
              log(x.getField("c").cast("double"))) /
          col("n").cast("double")).as("entropy_nats"))
      .orderBy(col(idCol))
  }

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the character
    * codepoints — a deterministic document fingerprint computable
    * identically in any engine (the cross-engine-stable alternative to
    * xxhash64-based fingerprints). */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Gopher-style repetition quality signals, per document:
    * `top_tok_ratio` (most frequent token's share of all tokens — high on
    * degenerate "the the the" text) and `dup_bigram_ratio` (1 − distinct
    * bigrams / bigrams — high on looping generations). Both in [0,1],
    * half-up rounded to 4 decimals; 0 for empty/1-token docs.
    *
    * All in-projection HOFs — no explode, no shuffle. The top-token count
    * sorts the tokens ONCE into a materialized column and takes the longest
    * equal-run — O(n log n) per ROW. Two traps this avoids: the naive
    * distinct×filter scan is O(d·n) (quadratic on repetitive docs, exactly
    * the input this metric exists to flag), and embedding `array_sort`
    * inside the aggregate lambda re-sorts per ITERATION (HOF lambda bodies
    * are interpreted with no subexpression elimination → O(n² log n); this
    * cost r5's bench 31 s on sf0.1). */
  def repetitionScores(df: DataFrame, textCol: String = "text"): DataFrame = {
    def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000
    // Longest run of equal adjacent elements in the SORTED token array =
    // max token frequency. Accumulator: (current run, best run). `__sorted`
    // MUST be a plain attribute here, not an expression — see scaladoc.
    val s = col("__sorted")
    val maxFreq = when(size(col("__toks")) === 0, lit(0))
      .when(size(col("__toks")) === 1, lit(1))
      .otherwise(aggregate(
        sequence(lit(1), size(col("__toks")) - 1),
        struct(lit(1).as("cur"), lit(1).as("best")),
        (acc, i) => {
          val cur2 = when(element_at(s, i + 1) === element_at(s, i),
            acc.getField("cur") + 1).otherwise(lit(1))
          struct(cur2.as("cur"),
            greatest(acc.getField("best"), cur2).as("best"))
        },
        acc => acc.getField("best")))
    df.select(col("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        array_sort(col("__toks")).as("__sorted"))
      .select(col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(0), size(col("__toks")) - 2),
            i => concat(element_at(col("__toks"), i + 1), lit(" "),
              element_at(col("__toks"), i + 2))))
          .otherwise(array().cast("array<string>")).as("__bg"),
        maxFreq.as("__maxf"))
      .select(col("doc_id"), col("n_tokens"),
        r4(col("__maxf").cast("double") /
          greatest(col("n_tokens"), lit(1))).as("top_tok_ratio"),
        r4(when(size(col("__bg")) > 0,
          lit(1.0) - size(array_distinct(col("__bg"))).cast("double") /
            size(col("__bg"))).otherwise(lit(0.0))).as("dup_bigram_ratio"))
  }

  /** Compression-ratio quality signal: `deflate(text).length / raw.length`
    * — the classic cheap junk detector (boilerplate and repetition
    * compress far below natural prose; random noise compresses above it).
    * One `Deflater` per PARTITION, reset per row — the mapPartitions
    * per-partition-init harness, because zlib is a JVM library, not a
    * Catalyst expression. Deterministic for a fixed JDK; no cross-engine
    * oracle by design (spec pins the repetitive ≪ prose < noise ordering
    * instead). Ratio is 4dp-rounded; empty docs score 0. */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val in = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("string").as("text"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("n_compressed", IntegerType, nullable = false),
      StructField("ratio", DoubleType, nullable = false)))
    in.mapPartitions { rows =>
      val deflater = new java.util.zip.Deflater(6)
      // zlib state is native memory — release it when the task ends
      // rather than waiting on finalization (long-lived executors run
      // many tasks).
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => deflater.end()))
      val buf = new Array[Byte](8192)
      rows.map { r =>
        val raw =
          if (r.isNullAt(1)) Array.empty[Byte]
          else r.getString(1).getBytes("UTF-8")
        var compressed = 0
        if (raw.nonEmpty) {
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          while (!deflater.finished())
            compressed += deflater.deflate(buf)
        }
        val ratio =
          if (raw.isEmpty) 0.0
          else math.floor(compressed.toDouble / raw.length * 10000 + 0.5) / 10000
        Row(r.getLong(0), raw.length, compressed, ratio)
      }
    }(Encoders.row(outSchema))
  }

}
