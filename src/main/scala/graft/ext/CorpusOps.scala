package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level (cross-document) text operators for LLM-training-data
  * pipelines: global vocabulary statistics, TF-IDF term weighting, and
  * train/test n-gram contamination checks.
  *
  * Reference evidence: exasol/etl-utils `query_wrapper.sql:40` forwards
  * arbitrary SQL to the host engine; these are the corpus analytics an ETL
  * pipeline built on that wrapper would push through it, re-expressed as
  * declarative Spark plans.
  *
  * Scale shapes (the 1000-executor case):
  *   - every aggregation is a plain hash `groupBy` → map-side partial
  *     aggregation before the one shuffle each needs;
  *   - global top-k is `orderBy().limit(k)` → Spark plans
  *     `TakeOrderedAndProject` (per-partition heaps + driver merge of k
  *     rows), never a full sort;
  *   - TF-IDF joins term frequencies to document frequencies on the term
  *     key — an equi-shuffle join whose both sides are already term-keyed
  *     aggregates, so AQE can pick broadcast when the vocabulary is small;
  *   - contamination joins test-side n-grams to the distinct train-side
  *     gram set on the gram key. Exactness is the point (decontamination
  *     must not miss), so no sketch shortcut: one shuffle per side, skew
  *     bounded because grams are near-unique by construction.
  */
object CorpusOps {

  private def r4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000

  /** Global token frequency top-k: (tok, cnt), count-desc then token-asc.
    * One explode + one hash aggregate + TakeOrderedAndProject. */
  def vocabTopK(df: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    // explode_outer + null filter ≡ explode, but without the inferred
    // pre-Generate filter that would re-evaluate the tokenizer twice more
    // per row (InferFiltersFromGenerate fires only on non-outer explodes).
    df.select(explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok").isNotNull)
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(k)

  /** Top-`perDoc` terms per document by TF-IDF
    * (`tf · ln((N+1)/(df+1))`, 4dp half-up): (doc_id, rk, tok, tfidf).
    *
    * N rides along as a broadcast scalar subquery — no driver-side
    * `count()`, the whole thing is one plan. Ordering (and therefore rank)
    * uses the ROUNDED score so the tie-break is engine-stable. */
  def tfIdfTop(df: DataFrame, perDoc: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol),
        explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok").isNotNull)
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        r4(col("tf") * log((col("n") + lit(1.0d)) / (col("df") + lit(1.0d)))))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("tok").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perDoc)
      .select(col(idCol), col("rk"), col("tok"), col("tfidf"))
      .orderBy(col(idCol), col("rk"))
  }

  /** Per-document token-rarity features from global document frequencies —
    * the integer-exact quality filter for surfacing gibberish/OCR noise
    * (many corpus-rare tokens) without a language model:
    * (doc_id, n_distinct_toks, n_rare, sum_df, rare_ratio·4dp) where
    * `df(tok)` = #documents containing the token and `n_rare` counts
    * distinct tokens with `df ≤ maxDf`.
    *
    * All aggregates are integers until the one final ratio, so the digest
    * is engine-exact (no float summation order anywhere). The token⋈df
    * join is term-keyed like [[tfIdfTop]]'s — both sides are already
    * aggregates, AQE broadcasts small vocabularies. */
  def tokenRarity(df: DataFrame, maxDf: Long, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol),
        explode_outer(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .where(col("tok").isNotNull)
    // Tokens are distinct WITHIN a doc, so count = document frequency.
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_distinct_toks"),
        count(when(col("df") <= maxDf, 1)).as("n_rare"),
        sum(col("df")).as("sum_df"))
      .withColumn("rare_ratio",
        r4(col("n_rare").cast("double") / greatest(col("n_distinct_toks"), lit(1L))))
      .orderBy(col(idCol))
  }

  /** Train/test n-gram contamination: for every TEST-split document
    * ([[SplitOps.assignSplit]] on the id), how many of its distinct
    * word `n`-grams also occur in any TRAIN-split document —
    * (doc_id, n_grams, n_hits, hit_ratio·4dp).
    *
    * The decontamination primitive: a test doc with a high hit ratio has
    * leaked into (or from) the training corpus. Exact by design. */
  def contamination(df: DataFrame, n: Int, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val grams = gramsBySplit(df, n, textCol, idCol)
    val trainGrams = grams.filter(col("split") === "train")
      .select(col("g")).distinct().withColumn("__hit", lit(1))
    grams.filter(col("split") === "test")
      .join(trainGrams, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hits"))
      .withColumn("hit_ratio",
        r4(col("n_hits").cast("double") / greatest(col("n_grams"), lit(1L))))
      .orderBy(col(idCol))
  }

  /** Line-level boilerplate removal (the CCNet/RefinedWeb curation
    * primitive): drop every line that occurs in ≥ `minDocs` DISTINCT
    * documents (headers, footers, nav chrome), and rebuild each document
    * from its surviving lines in original order. "Lines" are
    * [[TextOps.chunk]] windows of `lineTokens` tokens, so the operator is
    * corpus-agnostic about newline conventions. Output:
    * (idCol, n_kept, cleaned) — every input doc appears, an
    * all-boilerplate doc with n_kept=0 and cleaned=''.
    *
    * Scale shape: the line-frequency aggregate has map-side partials; the
    * boilerplate set is by construction the corpus's highest-frequency
    * lines — a tiny relation that AQE broadcasts into the keep-join. The
    * per-doc rebuild sorts a bounded in-memory array (lines of ONE doc),
    * not a shuffle sort. */
  def lineDedup(df: DataFrame, lineTokens: Int, minDocs: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val lines = TextOps.chunk(df, lineTokens, 0, idCol, textCol)
      .select(col(idCol), col("chunk_id").as("line_id"),
        col("chunk").as("line"))
    val boiler = lines.groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("line")).withColumn("__b", lit(1))
    val rebuilt = lines.join(boiler, Seq("line"), "left")
      .filter(col("__b").isNull)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("line_id"), col("line")))),
          x => x.getField("line")), "\n").as("cleaned"))
    df.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
      .orderBy(col(idCol))
  }

  /** (idCol, split, g): one row per distinct word `n`-gram per document,
    * tagged with the document's deterministic train/val/test split. */
  private def gramsBySplit(df: DataFrame, n: Int, textCol: String,
      idCol: String): DataFrame = {
    // Tokens MUST be a materialized column before shingling: the shingle
    // lambda slices the token array per element, and HOF lambda bodies
    // re-evaluate embedded expressions per iteration — passing the
    // tokenize expression directly re-splits the whole document per gram.
    val split = SplitOps.assignSplit(df, idCol)
      .select(col(idCol), col("split"),
        TextOps.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("split"),
        DedupOps.shingles(col("__toks"), n).as("__g"))
    split.select(col(idCol), col("split"), explode_outer(col("__g")).as("g"))
  }

  /** Bloom-filter contamination screen — the 100 TB path to
    * [[contamination]]. Same output shape (doc_id, n_grams, n_hits,
    * hit_ratio·4dp), but `n_hits` counts BLOOM hits: a superset of the
    * exact hits (Bloom filters have no false negatives, so no leaked test
    * doc is ever missed) with false-positive rate ≤ `fpp`.
    *
    * Scale shape vs the exact join: the exact path shuffles BOTH gram
    * sides (train distinct + test⋈train). Here the train side never
    * shuffles at all — `stat.bloomFilter` is a tree-aggregated sketch
    * build over the scan partitions (duplicate insertions are harmless, so
    * no `distinct` either), and the test side probes a broadcast bitmap
    * and goes straight to its per-doc aggregation. At trillion-gram train
    * corpora a single filter outgrows a broadcast (~1.2 GB per 10⁹ grams
    * at 1% fpp); the documented extension is k hash-sharded filters
    * (gram-hash prefix selects the shard) probed the same way — the
    * test-side plan shape is unchanged.
    *
    * The probe is a Scala UDF (Spark exposes no public might-contain
    * expression); it breaks the codegen span only around the boolean
    * probe itself, after the train side has already collapsed to a
    * broadcast value. Deterministic: the sketch's Murmur3 hashes are
    * fixed-seed and insertion order cannot change a Bloom bitmap. */
  def contaminationBloom(df: DataFrame, n: Int, fpp: Double = 0.01,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = gramsBySplit(df, n, textCol, idCol)
    val train = grams.filter(col("split") === "train").select(col("g"))
    // Sizing: Bloom sizing only needs an UPPER bound on the distinct gram
    // count, and a doc has at most as many n-grams as tokens — so size
    // from the train-side token total. That sizing pass is a trivial
    // text-column projection + count (no shingling, no explode), an order
    // cheaper than the gram pipeline it sizes.
    val expected = math.max(
      SplitOps.assignSplit(df, idCol).filter(col("split") === "train")
        .agg(sum(greatest(size(TextOps.tokens(col(textCol))), lit(1))))
        .head().getLong(0),
      1L)
    val bf = train.stat.bloomFilter("g", expected, fpp)
    val bfBc = df.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((s: String) => s != null && bfBc.value.mightContainString(s))
    grams.filter(col("split") === "test")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(when(probe(col("g")), 1)).as("n_hits"))
      .withColumn("hit_ratio",
        r4(col("n_hits").cast("double") / greatest(col("n_grams"), lit(1L))))
      .orderBy(col(idCol))
  }

  /** Unigram-LM log-probability quality score — the CCNet-style
    * perplexity proxy: a Laplace-smoothed unigram model fit on the
    * deterministic train split ([[SplitOps.assignSplit]]) scores every
    * test document. `p(tok) = (df + 1) / (N + V)`.
    *
    * Determinism: each token's log-prob is floored to integer MICRO-nats
    * BEFORE aggregation, so the per-doc score is an order-independent
    * integer SUM — no cross-partition float reduction (the q75 digest
    * trick applied to log space). Shapes: one token-keyed join of the
    * test explode against the train counts (both map-side combined);
    * `N + V` is a 1-row aggregate read once at plan-build. Docs with no
    * tokens produce no output row. */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = SplitOps.assignSplit(docs, idCol)
      .select(col(idCol), col("split"),
        explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
    // Checkpointed because it is consumed twice (the N+V aggregate below
    // and the per-token join) — vocabulary-bounded, never corpus-sized.
    val counts = toks.filter(col("split") === "train")
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    // sum() over zero rows is NULL — coalesce, then fail an un-fittable
    // (token-free) train split with a clear error instead of an NPE.
    val t = counts.agg(coalesce(sum(col("df")), lit(0L)).as("n"),
      count(lit(1)).as("v")).head()
    val (n, v) = (t.getLong(0), t.getLong(1))
    require(v > 0,
      "unigramLogProb: the train split has no tokens — cannot fit a model")
    val denom = (n + v).toDouble
    toks.filter(col("split") === "test")
      .join(counts, Seq("tok"), "left")
      .withColumn("unats", floor(
        log((coalesce(col("df"), lit(0L)) + 1).cast("double") / denom)
          * 1000000).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("unats")).as("sum_unats"))
      .orderBy(col(idCol))
  }

  /** Bigram-LM log-prob quality score — [[unigramLogProb]] one model order
    * up: Laplace-smoothed `P(w | prev) = (c(prev,w) + 1) / (c(prev) + V)`
    * fit on the train split, scoring every test document's bigrams with
    * the same engine-exact digest (per-bigram log-prob floored to integer
    * MICRO-nats before an order-independent sum).
    *
    * Shapes: THREE corpus passes total — train bigram counts (one hash
    * aggregate, checkpointed; the context counts `c(prev)` derive from it
    * by a second vocabulary-bounded aggregate, not another corpus pass),
    * the train vocabulary size (1-row aggregate), and the test-side
    * bigram explode joined against the counts on (prev, tok) and (prev).
    * Docs with fewer than 2 test tokens produce no row. */
  def bigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = SplitOps.assignSplit(docs, idCol)
      .select(col(idCol), col("split"), TextOps.tokens(col(textCol)).as("toks"))
    def bigrams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(element_at(col("toks"), i).as("prev"),
          element_at(col("toks"), i + 1).as("tok")))).as("bg"))
      .select(col(idCol), col("bg.prev").as("prev"), col("bg.tok").as("tok"))
    val bc = bigrams(base.filter(col("split") === "train"))
      .groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("cb"))
      .localCheckpoint() // consumed twice: the (prev,tok) join and cu below
    val cu = bc.groupBy(col("prev")).agg(sum(col("cb")).as("cu"))
    val vRow = base.filter(col("split") === "train")
      .select(explode_outer(col("toks")).as("tok"))
      .filter(col("tok").isNotNull)
      .agg(count_distinct(col("tok"))).head()
    val v = vRow.getLong(0)
    require(v > 0,
      "bigramLogProb: the train split has no tokens — cannot fit a model")
    bigrams(base.filter(col("split") === "test"))
      .join(bc, Seq("prev", "tok"), "left")
      .join(cu, Seq("prev"), "left")
      .withColumn("unats", floor(log(
        (coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + v)) * 1000000).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("unats")).as("sum_unats"))
      .orderBy(col(idCol))
  }

  /** BM25 lexical retrieval (Robertson–Spärck Jones; the Okapi weighting):
    * top-`topK` documents per query for a SMALL literal query set — the
    * "find the docs most relevant to these terms" primitive behind
    * retrieval-based curation (e.g. pulling seed-topic documents out of a
    * crawl).
    *
    * Shape at 100 TB (the inverted-index shape without materializing an
    * index):
    *   - ONE corpus tokenize pass and ONE doc-keyed hash aggregate yield
    *     BOTH the document length (count of all tokens) and the per-term
    *     tf (one conditional count per query term — the term set is a
    *     small literal, so the aggregate is 1 + |terms| longs per doc).
    *     Until r13 dl, Σdl and tf were three separate aggregates, each
    *     re-tokenizing the corpus (guide §1.2: the tokenize HOF chain was
    *     the dominant per-task cost, paid 3×);
    *   - Σdl re-aggregates the per-doc dl (never a second corpus pass);
    *     N and Σdl ride along as 1-row broadcast aggregates — no
    *     driver-side count();
    *   - the tf unpivot keeps only tf > 0 rows, so everything downstream
    *     is sized by candidate docs, not the corpus; df comes from that
    *     already-filtered frame (df of a term only depends on docs
    *     containing it) — no full-vocabulary aggregate exists anywhere;
    *   - query terms and df broadcast into the scoring join; the only
    *     corpus-sized shuffle is the single per-doc aggregate;
    *   - per-query top-k is a window over candidate docs only.
    *
    * Determinism: each per-term contribution is floored to integer
    * MICRO-NATS before the sum (order-independent digest, the q90 rule),
    * and the ranking orders by (floored score DESC, doc id ASC). The
    * arithmetic is written with the same association as the DuckDB oracle
    * so both engines run identical IEEE op sequences.
    *
    * Output: (query_id, rk, `idCol`, score_un) ordered by (query_id, rk). */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, Seq[String])],
      topK: Int = 5, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty))
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = broadcast(
      queries.flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
        .toDF("query_id", "tok"))
    val termSet = queries.flatMap(_._2).distinct
    val toks = docs.select(col(idCol),
        explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .where(col("tok").isNotNull)
    // ONE pass over the token stream: dl = count of ALL tokens, tf_i =
    // conditional count of query term i — same integers as the separate
    // dl / filtered-tf aggregates this replaces (see scaladoc).
    val termTfs = termSet.zipWithIndex.map { case (t, i) =>
      count(when(col("tok") === t, 1)).as(s"__tf$i")
    }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("dl"), termTfs: _*)
      // Consumed by Σdl AND the tf unpivot; one row per doc, never
      // token-stream-sized.
      .localCheckpoint()
    val stats = docs.agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(perDoc.agg(sum(col("dl")).as("sumdl"))))
    // Unpivot to (doc, dl, tok, tf) candidate postings: lit(term) structs
    // (not a stack() SQL string, so terms never need escaping); tf = 0
    // rows are exactly the postings the old filtered aggregate never saw.
    val tfArr = array(termSet.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("tok"), col(s"__tf$i").as("tf"))
    }: _*)
    val tf = perDoc.select(col(idCol), col("dl"), explode(tfArr).as("e"))
      .select(col(idCol), col("dl"), col("e.tok").as("tok"),
        col("e.tf").as("tf"))
      .where(col("tf") > 0)
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // Mirrors the oracle exactly:
    //   LN(1 + (nd - df + 0.5) / (df + 0.5))
    //   * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / (sumdl / nd)))
    val idf = log(lit(1.0) +
      (col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val avgdl = col("sumdl").cast("double") / col("nd")
    val norm = lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl
    val contrib = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * norm)
    val scored = tf // dl rides the posting row — no per-doc join needed
      .join(qterms, "tok")
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("un", floor(contrib * 1000000).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("un")).as("score_un"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_un").desc, col(idCol).asc)
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col(idCol), col("score_un"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** EXACT heavy hitters — every token whose global count·k > N (the
    * frequency-share-above-1/k set) — in two corpus passes with NO
    * full-vocabulary shuffle, the shape that survives a 100 TB corpus whose
    * distinct-token set itself is shuffle-hostile:
    *
    *   pass 1: one `mapPartitions` runs a Misra–Gries(k) summary per
    *     partition (≤ k−1 counters with the streaming decrement-all
    *     eviction — no Catalyst aggregate expresses that eviction, hence
    *     the harness) and emits the partition's surviving candidate tokens
    *     plus one null-token sentinel row carrying the partition's token
    *     total. By the mergeable-summaries bound (Agarwal et al. 2012,
    *     "Mergeable summaries"), a token with global count > N/k must
    *     exceed N_p/k in at least one partition, so the UNION of
    *     per-partition candidates is a provable superset of every true
    *     heavy hitter. The summary is ≤ nPartitions·(k−1) rows —
    *     localCheckpointed, never corpus-sized.
    *   pass 2: exact counts of the candidate tokens only — the broadcast
    *     candidate semi-join prunes the count shuffle to the candidate set
    *     regardless of vocabulary size — then the exact filter cnt·k > N.
    *
    * Because the FINAL filter uses exact counts, the result is
    * deterministic and partitioning-independent; the MG stage only decides
    * the superset. Output: (tok, cnt) with exact counts, token-ordered. */
  def heavyHitters(docs: DataFrame, k: Int,
      textCol: String = "text"): DataFrame = {
    require(k >= 2, s"heavy-hitter k must be >= 2, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      explode(TextOps.tokens(coalesce(col(textCol), lit("")))).as("tok"))
    val summary = toks.as[String].mapPartitions { it =>
      // LinkedHashMap: deterministic iteration order for the decrement
      // sweep (the superset is allowed to vary, but determinism per
      // partitioning keeps reruns bit-identical).
      val counters = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var total = 0L
      while (it.hasNext) {
        val t = it.next(); total += 1
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k - 1 => counters.update(t, 1L)
          case None =>
            for (key <- counters.keys.toArray) {
              val c = counters(key)
              if (c == 1) counters.remove(key) else counters.update(key, c - 1)
            }
        }
      }
      Iterator.single((null: String, total)) ++
        counters.iterator.map { case (t, c) => (t, c) }
    }.toDF("tok", "cnt").localCheckpoint() // bounded: nPartitions·k rows
    val totalN = summary.filter(col("tok").isNull)
      .agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0) // 1-row collect
    val cands = summary.filter(col("tok").isNotNull).select("tok").distinct()
    toks.join(broadcast(cands), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * lit(k) > lit(totalN))
      .orderBy(col("tok"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): fit the
    * train-split Laplace unigram LM (same model as [[unigramLogProb]]),
    * score EVERY document in integer micro-nats, then cut each language
    * into `nBuckets` equal-frequency buckets by per-token mean log-prob —
    * bucket 0 = head (highest mean log-prob = lowest perplexity), the
    * slice CCNet keeps outright.
    *
    * Engine-exactness: per-token log-probs floor to integer micro-nats
    * before the order-independent sum; the per-doc mean is ONE IEEE
    * double division of two exactly-representable integers, floored —
    * identical on every engine; bucket = (rank−1)·nBuckets div n, all
    * integral. Ties order by doc id.
    *
    * Scale shapes: the per-language rank is the bounded-memory two-phase
    * group-rank construction (range shuffle + broadcast carry-ins), never
    * a one-reducer-per-language window; language counts ride back as a
    * broadcast. Token-free docs carry no LM evidence and get no row. */
  def perplexityBuckets(docs: DataFrame, nBuckets: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang"): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val toks = SplitOps.assignSplit(docs, idCol)
      .select(col(idCol), col(langCol), col("split"),
        explode_outer(TextOps.tokens(col(textCol))).as("tok"))
      .filter(col("tok").isNotNull)
    val counts = toks.filter(col("split") === "train")
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .localCheckpoint() // vocabulary-bounded, consumed twice
    val t = counts.agg(coalesce(sum(col("df")), lit(0L)).as("n"),
      count(lit(1)).as("v")).head()
    require(t.getLong(1) > 0,
      "perplexityBuckets: the train split has no tokens — cannot fit a model")
    val denom = (t.getLong(0) + t.getLong(1)).toDouble
    val scored = toks
      .join(counts, Seq("tok"), "left")
      .withColumn("unats", floor(
        log((coalesce(col("df"), lit(0L)) + 1).cast("double") / denom)
          * 1000000).cast("long"))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).as("n_toks"), sum(col("unats")).as("sum_unats"))
      .withColumn("mean_unats",
        floor(col("sum_unats").cast("double") / col("n_toks")).cast("long"))
    val nPerLang = scored.groupBy(col(langCol).as("__gc"))
      .agg(count(lit(1)).as("__n"))
    ShardOps.withGroupRank(scored, langCol,
        Seq(col("mean_unats").desc, col(idCol).asc))
      .join(broadcast(nPerLang), col(langCol) <=> col("__gc"))
      // `div`, not `/`: the bucket boundary must stay integral.
      .withColumn("bucket",
        expr(s"cast((__grn - 1) * $nBuckets div __n as int)"))
      .drop("__grn", "__gc", "__n")
      .orderBy(col(idCol))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document of
    * the raw corpus by how target-like its hashed-bigram feature
    * distribution is — `w(doc) = Σ_f log(p_target(f) / p_raw(f))` over the
    * doc's feature OCCURRENCES, features = bigrams hashed into `nBuckets`
    * via md5 nibbles (derived IDENTICALLY in the DuckDB oracle — the
    * q100/q112 discipline, so the whole path hash-compares cross-engine).
    *
    * Model: Laplace-smoothed bucket distributions with B = nBuckets,
    * `p(f) = (c(f)+1) / (N+B)`; target = rows matching `targetPred` (they
    * are raw-corpus members too and get scored like everyone else). Each
    * per-feature log-ratio floors to integer MICRO-nats BEFORE the
    * order-independent per-doc sum. Docs with < 2 tokens carry no bigram
    * and get no row.
    *
    * Scale shapes: the bucket-count aggregates key on ≤ nBuckets values
    * (map-side partials collapse the corpus explode to nBuckets rows per
    * task); the log-ratio table is nBuckets rows and BROADCASTS into the
    * scoring join; the only corpus-sized work is the two bigram explodes
    * (count pass, scoring pass). No full-vocabulary state anywhere — the
    * hash bound is the point of DSIR at 100 TB. */
  def dsirWeights(docs: DataFrame, targetPred: Column, nBuckets: Int = 4096,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 65536,
      s"nBuckets must be in [2, 65536], got $nBuckets")
    val spark = docs.sparkSession
    def feats(df: DataFrame): DataFrame = df
      .select(col(idCol), col("__t"), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col(idCol), col("__t"), explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ",
          element_at(col("toks"), i), element_at(col("toks"), i + 1))))
        .as("g"))
      // first 4 md5 nibbles = 16 bits, folded into the bucket range
      .withColumn("bucket",
        (conv(substring(md5(col("g")), 1, 4), 16, 10).cast("long")
          % nBuckets).cast("int"))
    val tagged = docs.withColumn("__t", targetPred)
    val f = feats(tagged)
    // ONE corpus counts pass: raw and target bucket counts from the same
    // aggregate (map-side partials collapse to ≤ nBuckets rows per task);
    // checkpointed because the bounded table is consumed twice.
    val counts = f.groupBy(col("bucket")).agg(
      count(lit(1)).as("cr"),
      count(when(col("__t"), lit(1))).as("ct"))
      .localCheckpoint()
    val totals = counts.agg(
      coalesce(sum(col("cr")), lit(0L)),
      coalesce(sum(col("ct")), lit(0L))).head()
    val (nr, nt) = (totals.getLong(0), totals.getLong(1))
    require(nt > 0, "dsirWeights: the target slice has no bigrams")
    require(nr > 0, "dsirWeights: the corpus has no bigrams")
    val ratio = spark.range(nBuckets).select(col("id").cast("int").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .withColumn("unats", floor((
        log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
          / lit((nt + nBuckets).toDouble)) -
        log((coalesce(col("cr"), lit(0L)) + 1).cast("double")
          / lit((nr + nBuckets).toDouble))) * 1000000).cast("long"))
      .select(col("bucket"), col("unats"))
    f.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("unats")).as("weight_unats"))
      .orderBy(col(idCol))
  }
}
