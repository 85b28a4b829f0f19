package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM-training-data pipelines: MinHash+LSH
  * (shingle → minhash → band → bucket-join) and SimHash.
  *
  * Scale contract: candidate generation NEVER goes all-pairs — pairs are
  * produced only inside LSH buckets (shuffle keyed on band hash), and the
  * exact-Jaccard verification joins shingle sets back by doc id rather than
  * dragging them through the band explode. Exact dedup (hash-groupBy) lives
  * in the query inventory (q25): one shuffle on the content digest.
  */
object DedupOps {

  /** Lowercased whitespace word tokens, empties dropped. */
  def wordTokens(c: Column): Column =
    filter(split(lower(c), " "), t => length(t) > 0)

  /** [[wordTokens]] with NULL text reading as ZERO tokens — for operators
    * whose outputs (counts, rebuilt text) must stay well-defined on NULL
    * rows instead of inheriting size(NULL) = -1. */
  private def nullSafeTokens(c: Column): Column =
    coalesce(wordTokens(c), expr("CAST(array() AS ARRAY<STRING>)"))

  /** Distinct word n-shingles. n=1 → the distinct token set (bag-of-words
    * Jaccard, the right granularity for small-vocab corpora); n≥2 → sliding
    * windows joined with a space. */
  def shingles(tokens: Column, n: Int): Column =
    if (n <= 1) array_distinct(tokens)
    else when(size(tokens) >= n,
      array_distinct(transform(
        sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", tokens)))

  /** k-permutation MinHash signature: element j is the minimum of
    * `xxhash64(j, shingle)` over the shingle set. One projection, no
    * shuffle, codegen'd HOFs throughout.
    *
    * Each shingle STRING is hashed once ([[hashShingles]]); the k
    * permutations re-hash only the resulting long — string hashing is the
    * dominant cost and this cuts it k-fold. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    minhashFromHashes(hashShingles(shingleSet), numHashes)

  /** One xxhash64 per shingle string. */
  def hashShingles(shingleSet: Column): Column =
    transform(shingleSet, s => xxhash64(s))

  /** Signature from pre-hashed shingles (array<long>) — native codegen'd
    * expression ([[graft.functions.MinHashSignature]]); the equivalent HOF
    * composition evaluated its lambdas interpreted and was the profiled
    * bottleneck of near-dup at sf0.1. */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    graft.functions.HashFunctions.minhashSignature(hashes, numHashes)

  /** LSH band keys: the signature cut into `bands` rows-per-band slices,
    * each hashed to one long. Two docs collide in a band iff that slice
    * matches exactly. */
  def bandKeys(signature: Column, numHashes: Int, bands: Int): Column = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — truncated " +
        "rows-per-band would silently drop trailing signature positions")
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * lit(r) + lit(1), lit(r))))
  }

  /** Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** MinHash-LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Plan shape (the 1000-executor-safe one):
    *  1. per-doc signature — narrow projection;
    *  2. explode band keys, ONE shuffle grouping ids per (band, bandHash)
    *     bucket, pairs generated inside each bucket array — candidates only
    *     ever meet inside a bucket, never via an all-pairs join;
    *  3. degenerate buckets larger than `maxBucket` are skipped entirely —
    *     the standard guard against near-identical-corpus blowup, where a
    *     hot bucket would otherwise go quadratic (a 5k-doc same-vocabulary
    *     corpus produced 10^7 candidate pairs without it);
    *  4. join hashed shingle sets back by id (two hash joins) and verify
    *     exact Jaccard on the longs.
    *
    * Returns (id1, id2, jaccard·4dp) with jaccard ≥ `minJaccard`, ordered. */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      // r = numHashes/bands rows per band sets the LSH threshold
      // j* ≈ (1/bands)^(1/r): 8 bands of 8 rows → j* ≈ 0.77, tuned for
      // near-DUPLICATES — a lower threshold (more bands) floods
      // verification with moderately-similar candidates.
      bands: Int = 8,
      shingleSize: Int = 1,
      minJaccard: Double = 0.0,
      maxBucket: Int = 64): DataFrame = {
    // Hash shingle strings once (one xxhash64 per shingle); every later
    // stage — the k permutations AND the exact-Jaccard verification —
    // works on the longs. Long-array intersection is far cheaper than
    // string-array intersection, and |hashed ∩| = |string ∩| up to 64-bit
    // collisions (≪ 1e-15 per pair; this is a sketch pipeline throughout).
    // Tokens are materialized as a column BEFORE shingling: for
    // shingleSize ≥ 2 the shingle lambda slices the token array per
    // element, and a lambda-embedded tokenize expression would re-split
    // the whole document per shingle (interpreted lambda bodies have no
    // subexpression elimination).
    val hashed = docs
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("__toks"))
      .select(col("id"),
        hashShingles(shingles(col("__toks"), shingleSize)).as("hs"))

    // *_outer generates throughout this file: InferFiltersFromGenerate
    // synthesizes `size(e) > 0 AND isnotnull(e)` for NON-outer explodes,
    // duplicating the whole generator expression (here: the full
    // shingle→hash→minhash→band chain) two more times per row. The arrays
    // are non-empty by construction, so outer semantics are identical.
    val banded = hashed
      .select(col("id"),
        posexplode_outer(bandKeys(minhashFromHashes(col("hs"), numHashes),
          numHashes, bands)).as(Seq("band", "band_hash")))

    val candidates = banded
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode_outer(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(least(x, y) AS id1, greatest(x, y) AS id2))))"""
          .stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()

    candidates
      .join(hashed.select(col("id").as("id1"), col("hs").as("s1")), "id1")
      .join(hashed.select(col("id").as("id2"), col("hs").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        round(jaccard(col("s1"), col("s2")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
  }

  /** Drop near-duplicates: keep every document except the HIGHER-id member
    * of each confirmed near-dup pair ([[nearDupPairs]] emits id1 < id2, so
    * the smallest id of any duplicate cluster always survives). The curated
    * complement — what a training-data pipeline actually feeds downstream. */
  def dropNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 64,
      bands: Int = 8,
      shingleSize: Int = 1,
      minJaccard: Double = 0.8,
      maxBucket: Int = 64): DataFrame = {
    val losers = nearDupPairs(docs, idCol, textCol, numHashes, bands,
      shingleSize, minJaccard, maxBucket)
      .select(col("id2").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------- portable MinHash lane
  // The cross-engine DETERMINISTIC twin of the xxhash64 engine lane above
  // (extracted from q30, r11-late, so q30 and the q173 funnel share ONE
  // spelling): every hash is md5-60 (`CAST('0x' || SUBSTR(MD5(x),1,15) AS
  // BIGINT)` in SQL), the k permutations are XOR against the md5-60 family
  // constants `mhperm_j`, and band keys are raw signature slices — a SQL
  // engine rebuilds the whole candidate pipeline verbatim, which is what
  // backs the q30/q173 DuckDB oracle rows. The xxhash64 lane stays the
  // throughput engine (one fused codegen'd signature expression); this lane
  // trades ~2× hash cost for reproducibility-outside-the-JVM.

  /** (id, hs) with `hs` = distinct md5-60 token hashes; zero-token rows
    * dropped via the lambda-free `translate` guard (an inferred
    * `size(tokens) > 0` prefilter would re-evaluate the tokenizer below
    * later Generates — the shape the structural plan spec bans). */
  def portableHashedTokens(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.HashFunctions.md5Hash60
    docs
      .filter(length(translate(col(textCol), " ", "")) > 0)
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("__toks"))
      .select(col("id"),
        array_distinct(transform(col("__toks"), t => md5Hash60(t))).as("hs"))
  }

  /** Normalized (id1 < id2) candidate pairs from XOR-permutation MinHash
    * band buckets over [[portableHashedTokens]] output — same band/bucket
    * discipline as [[nearDupPairs]] (bucket size capped, pairs only inside
    * buckets, never all-pairs). */
  def portableCandidatePairs(hashed: DataFrame, numHashes: Int = 64,
      bands: Int = 8, maxBucket: Int = 64): DataFrame = {
    import graft.functions.HashFunctions.{md5Hash60Local, minhashXorSignature}
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — truncated " +
        "rows-per-band would silently drop trailing signature positions")
    val r = numHashes / bands
    val perm: Seq[Long] =
      (0 until numHashes).map(j => md5Hash60Local(s"mhperm_$j"))
    val banded = hashed
      .select(col("id"), minhashXorSignature(col("hs"), perm).as("sig"))
      .select(col("id"), explode_outer(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          slice(col("sig"), b * r + 1, r).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded
      .groupBy(col("band"), col("key"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode_outer(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(least(x, y) AS id1, greatest(x, y) AS id2))))"""
          .stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()
  }

  /** Near-dup drop on the portable lane: candidates verified by exact
    * hashed-token-set Jaccard ≥ 4/5, spelled as the integer
    * cross-multiplication `5·|∩| ≥ 4·|∪|` — no float anywhere, so the
    * verification is engine-exact too. Drops the GREATER id of each
    * verified pair (the [[dropNearDups]] keep-first rule). */
  def dropNearDupsPortable(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val hashed = portableHashedTokens(docs, idCol, textCol)
    val losers = portableCandidatePairs(hashed)
      .join(hashed.select(col("id").as("id1"), col("hs").as("s1")), "id1")
      .join(hashed.select(col("id").as("id2"), col("hs").as("s2")), "id2")
      .filter(size(array_intersect(col("s1"), col("s2"))) * 5
        >= size(array_union(col("s1"), col("s2"))) * 4)
      .select(col("id2").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash over the column named `hashesCol` (array<long> of
    * per-token hashes, see [[hashShingles]]): each hash bit votes ±1,
    * fingerprint = sign bits packed into a long. Native codegen'd
    * expression ([[graft.functions.SimHash64]]) — single primitive-loop
    * pass, replacing the interpreted HOF fold. */
  def simhashExpr(hashesCol: String): Column =
    graft.functions.HashFunctions.simhash64(col(hashesCol))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicates: random-hyperplane LSH buckets
    * ([[SimilarityOps.lshBucket]]) generate candidates — same
    * bucket-array pair pattern as the text paths, degenerate-bucket
    * guard included — verified by exact cosine ≥ `minCosine`.
    * Returns (id1, id2, cosine·4dp). `portable = true` buckets with the
    * md5-derived [[SimilarityOps.lshBucketPortable]] planes instead of
    * xxhash64 — same pipeline, SQL-reproducible end to end (the q42
    * DuckDB oracle; the [[dropNearDupsPortable]] precedent). */
  def embeddingNearDups(
      emb: DataFrame,
      minCosine: Double = 0.95,
      planes: Int = 12,
      maxBucket: Int = 64,
      portable: Boolean = false,
      inDim: Int = 64): DataFrame = {
    // The portable plane matrix is a static inDim-wide literal — check the
    // corpus dimension up front (a mismatch would null every dot, put all
    // rows in bucket 0, and the maxBucket guard would then silently emit
    // ZERO pairs on any corpus over maxBucket rows).
    if (portable) SimilarityOps.requireDim(emb, inDim, "embeddingNearDups")
    val bucketed = emb.select(
      col("vec_id").as("id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("vec"),
      (if (portable)
         SimilarityOps.lshBucketPortable(col("embedding"), planes, 0, inDim)
       else SimilarityOps.lshBucket(col("embedding"), planes)).as("bucket"))
    bucketed
      .groupBy(col("bucket"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("items"))
      .filter(size(col("items")).between(2, maxBucket))
      .select(explode_outer(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |    y -> struct(least(x.id, y.id) AS id1, greatest(x.id, y.id) AS id2,
          |                x.vec AS v1, y.vec AS v2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"),
        round(SimilarityOps.cosine(col("p.v1"), col("p.v2")), 4).as("cosine"))
      .distinct()
      .filter(col("cosine") >= minCosine)
      .orderBy(col("cosine").desc, col("id1"), col("id2"))
  }

  /** SimHash near-duplicate pairs: fingerprints banded into four 16-bit
    * keys (two fingerprints within Hamming ≤3 of each other agree on at
    * least one whole 16-bit band — pigeonhole), candidates joined per band,
    * verified by exact Hamming distance. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    val fp = docs
      .select(col(idCol).as("id"),
        hashShingles(wordTokens(col(textCol))).as("hs"))
      .select(col("id"), simhashExpr("hs").as("fp"))
    fingerprintPairs(fp, maxHamming, maxBucket)
  }

  /** Banded Hamming-distance pairs over ANY 64-bit fingerprint frame
    * (`id: long, fp: long`) — the bucketed engine behind
    * [[simhashPairs]], reused by perceptual-hash image dedup
    * ([[MultimodalOps.dHash]]): four 16-bit bands, pairs generated only
    * inside ≤`maxBucket` buckets, never all-pairs. By the pigeonhole
    * principle any pair within Hamming ≤ 3 shares at least one band. */
  def fingerprintPairs(
      fp: DataFrame,
      maxHamming: Int = 3,
      maxBucket: Int = 64): DataFrame = {
    // 4 bands of 16 bits guarantee recall only up to Hamming 3 (4 diff
    // bits can straddle all 4 bands); a larger maxHamming would silently
    // drop pairs, so refuse it loudly (r9 ADVICE).
    require(maxHamming >= 0 && maxHamming <= 3,
      s"fingerprintPairs: the 4x16-bit band scheme guarantees recall only " +
        s"for maxHamming <= 3, got $maxHamming")
    val banded = fp.select(col("id"), col("fp"),
      posexplode_outer(expr(
        "transform(sequence(0, 3), b -> (shiftright(fp, CAST(b * 16 AS INT))) & 65535)"))
        .as(Seq("band", "band_key")))
    banded
      .groupBy(col("band"), col("band_key"))
      .agg(collect_list(struct(col("id"), col("fp"))).as("items"))
      .filter(size(col("items")).between(2, maxBucket)) // degenerate-bucket guard
      .select(explode_outer(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items)),
          |    y -> struct(least(x.id, y.id) AS id1, greatest(x.id, y.id) AS id2,
          |                bit_count(x.fp ^ y.fp) AS hamming))))""".stripMargin))
        .as("p"))
      .select(col("p.id1"), col("p.id2"), col("p.hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("hamming"), col("id1"), col("id2"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every word k-gram, slide a window of `w`
    * consecutive k-gram hashes, keep each window's MINIMUM. Guarantee
    * MinHash doesn't give: any shared token run of ≥ k+w-1 tokens leaves
    * at least one identical fingerprint in both documents, while keeping
    * only ~2/(w+1) of the gram hashes. Both hash levels are the base-31
    * polynomial mod 1e9+7 — engine-exact, reproducible anywhere.
    *
    * All in-projection HOFs over materialized columns (`th`, `kh` are
    * bound once per row — not recomputed per lambda iteration, the r6
    * lesson). Docs shorter than k+w-1 tokens have no window → dropped.
    * Output: (id, fps: array<long>, distinct). */
  def winnowFingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1)
    val M = 1000000007L
    val tokHash = (t: Column) => aggregate(
      transform(split(t, ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31 + c) % M)
    docs
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k + w - 1)
      .withColumn("th", transform(col("toks"), tokHash))
      .withColumn("kh", transform(
        sequence(lit(1), size(col("th")) - (k - 1)),
        i => aggregate(slice(col("th"), i, lit(k)), lit(0L),
          (a, x) => (a * 31 + x) % M)))
      .select(col("id"), array_distinct(transform(
        sequence(lit(1), size(col("kh")) - (w - 1)),
        i => array_min(slice(col("kh"), i, lit(w))))).as("fps"))
  }

  /** Shared-winnowed-fingerprint candidate pairs — exact-substring-overlap
    * detection (the Lee et al. 2022 dedup family, at fingerprint rather
    * than suffix-array cost): explode fingerprints, build per-fingerprint
    * buckets, pair WITHIN buckets only, count shared fingerprints per
    * pair. Fingerprints held by more than `maxDf` docs are corpus
    * boilerplate — they'd pair everything with everything, so they're
    * dropped (the same quadratic-guard role as the LSH degenerate-bucket
    * cap; at 100 TB this cap is what bounds the bucket join). One corpus
    * pass: pairs come from `collect_list` buckets (bounded by `maxDf`),
    * not a bucket self-join re-deriving the scan. */
  def winnowPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 4, w: Int = 4,
      maxDf: Int = 50, minShared: Long = 2L): DataFrame =
    winnowFingerprints(docs, idCol, textCol, k, w)
      .select(col("id"), explode_outer(col("fps")).as("fp"))
      .groupBy(col("fp"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxDf))
      .select(explode_outer(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |    y -> struct(least(x, y) AS id1, greatest(x, y) AS id2))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("id1"), col("id2"))

  /** Duplicated-span EXCISION — the Lee et al. 2022 exact-substring-dedup
    * output shape: any run of ≥ `minLen` tokens that occurs more than once
    * in the corpus (across documents or repeated within one) is removed
    * from every document holding it, and the document is emitted with the
    * remaining tokens stitched back together. This is the operator for
    * pipelines that KEEP documents but cut boilerplate passages, where
    * [[winnowPairs]] only flags the document pairs.
    *
    * Determinism: all copies of a duplicated span are removed (Lee et
    * al.'s keep-one-copy needs an occurrence order, which a distributed
    * corpus doesn't have) — the decision depends only on corpus content.
    *
    * Scale shape: token windows are emitted per document (a `posexplode`
    * projection) and each occurrence learns its gram's corpus frequency
    * from a COUNT window over the gram key — ONE exchange, no second
    * corpus pass and no join back (the naive groupBy+join spelling
    * re-derives the whole explode). Per-doc window starts then collapse in
    * a doc-keyed aggregate whose `collect_list` is bounded by the
    * document's own token count. Nothing is quadratic; no suffix array is
    * materialized. A corpus-boilerplate gram makes one fat (spillable)
    * window partition — the same skew any occurrence-exact plan carries.
    *
    * `hashedGrams = false` (default) shuffles exact gram strings —
    * oracle-exact semantics. `hashedGrams = true` is the 100 TB shuffle
    * shape: each occurrence ships only a PAIR of independent 64-bit gram
    * hashes (16 bytes, vs minLen tokens of text), and duplication is
    * decided on the tandem key. A false excision needs two distinct grams
    * to collide on BOTH hashes simultaneously — ~G²/2^129 over G distinct
    * grams, never expected at any real corpus size (the spec asserts the
    * two modes decide identically on its corpora).
    *
    * Output: (idCol, n_toks, n_removed, clean), one row per input doc. */
  def exciseDuplicateSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minLen: Int = 5,
      hashedGrams: Boolean = false): DataFrame = {
    require(minLen >= 1)
    val base = docs.select(col(idCol).as("__id"),
      nullSafeTokens(col(textCol)).as("__toks"))
    val keyedOcc = gramKeys(gramOccurrences(base, minLen), hashedGrams)
    val starts = keyedOcc
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(gramKeyCols(hashedGrams): _*)))
      .filter(col("__n") > 1)
      .select(col("__id"), (col("__pos0") + 1).as("__start")) // 1-based
    exciseByStarts(base, starts, idCol, minLen)
  }

  /** One row per `minLen`-token window: (__id, __pos0 0-based, __gram). */
  private def gramOccurrences(base: DataFrame, minLen: Int): DataFrame =
    base.filter(size(col("__toks")) >= minLen)
      .select(col("__id"), posexplode(transform(
        sequence(lit(1), size(col("__toks")) - (minLen - 1)),
        i => concat_ws(" ", slice(col("__toks"), i, lit(minLen))))))
      .toDF("__id", "__pos0", "__gram")

  /** Swap the gram text for its tandem 64-bit hash pair when `hashed` —
    * the occurrence rows then carry 16 bytes of key instead of the gram. */
  private def gramKeys(occ: DataFrame, hashed: Boolean): DataFrame =
    if (!hashed) occ
    else occ
      .withColumn("__h1", xxhash64(col("__gram")))
      .withColumn("__h2", xxhash64(lit(42L), col("__gram")))
      .drop("__gram")

  private def gramKeyNames(hashed: Boolean): Seq[String] =
    if (hashed) Seq("__h1", "__h2") else Seq("__gram")

  private def gramKeyCols(hashed: Boolean): Seq[Column] =
    gramKeyNames(hashed).map(col)

  /** Shared rebuild: drop every token covered by a flagged window start
    * and stitch the rest back. `starts` carries (__id, __start 1-based). */
  private def exciseByStarts(base: DataFrame, starts: DataFrame,
      idCol: String, minLen: Int): DataFrame = {
    val flagged = starts.groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__start"))).as("__starts"))
    base.join(flagged, Seq("__id"), "left")
      // Token at 1-based position p is excised iff some flagged window
      // [s, s+minLen) covers it. Expanding the starts into covered
      // positions and hash-diffing (`array_except`) is O(toks + starts)
      // per doc, vs the O(toks × starts) of an exists() probe per token.
      // Windows never overrun the doc (s + minLen - 1 <= n_toks by
      // construction), so no clamp is needed.
      .withColumn("__kept",
        when(col("__starts").isNull, col("__toks"))
          .otherwise(transform(
            array_except(
              sequence(lit(1), size(col("__toks"))),
              flatten(transform(col("__starts"),
                s => sequence(s, s + lit(minLen - 1))))),
            p => element_at(col("__toks"), p))))
      .select(col("__id").as(idCol),
        size(col("__toks")).as("n_toks"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean"))
  }

  /** Span-level DECONTAMINATION — [[exciseDuplicateSpans]]' cross-corpus
    * sibling: every run of ≥ `minLen` tokens that appears ANYWHERE in
    * `reference` (a benchmark / eval set) is cut out of every corpus
    * document, and the document survives with the remaining tokens — the
    * curation move when dropping whole contaminated documents
    * (q66's contamination screen) would cost too much good data.
    *
    * Scale shape: the reference side collapses to DISTINCT grams
    * (benchmark-sized, orders of magnitude under the corpus) before a
    * gram-keyed join against the corpus windows — Catalyst broadcasts it
    * when small; nothing is ever quadratic. The corpus is scanned twice
    * (windows + rebuild), like the contamination screens. `hashedGrams`
    * joins on the tandem 64-bit hash pair instead of gram text — the
    * same 100 TB shuffle/broadcast-width trade as
    * [[exciseDuplicateSpans]], with the same vanishing collision odds.
    *
    * Output: (idCol, n_toks, n_removed, clean), one row per corpus doc. */
  def exciseContaminatedSpans(docs: DataFrame, reference: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      refTextCol: String = "text", minLen: Int = 5,
      hashedGrams: Boolean = false): DataFrame = {
    require(minLen >= 1)
    val base = docs.select(col(idCol).as("__id"),
      nullSafeTokens(col(textCol)).as("__toks"))
    val refBase = reference.select(lit(0L).as("__id"),
      nullSafeTokens(col(refTextCol)).as("__toks"))
    val refGrams = gramKeys(gramOccurrences(refBase, minLen), hashedGrams)
      .select(gramKeyCols(hashedGrams): _*).distinct()
    val starts = gramKeys(gramOccurrences(base, minLen), hashedGrams)
      .join(refGrams, gramKeyNames(hashedGrams))
      .select(col("__id"), (col("__pos0") + 1).as("__start"))
    exciseByStarts(base, starts, idCol, minLen)
  }

  /** CROSS-corpus MinHash near-dup pairs — dedup one dataset AGAINST
    * another (the "is my training set contaminated with this benchmark /
    * that other crawl" shape, at document rather than n-gram
    * granularity): same signature → band → bucket machinery as
    * [[nearDupPairs]], but candidates only ever pair a LEFT doc with a
    * RIGHT doc — the within-corpus quadratic never happens. Each side's
    * bucket membership list is capped at `maxBucket` before the bucket
    * join (the same degenerate-bucket guard), so a hot bucket costs at
    * most `maxBucket²` pairs. Verification is exact Jaccard on the
    * hashed shingle sets joined back by id. Returns
    * (left_id, right_id, jaccard·4dp) ≥ `minJaccard`, ordered. */
  def crossNearDupPairs(left: DataFrame, right: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      numHashes: Int = 64, bands: Int = 8, shingleSize: Int = 1,
      minJaccard: Double = 0.0, maxBucket: Int = 64): DataFrame = {
    def hashedOf(df: DataFrame) = df
      .select(col(idCol).as("id"), wordTokens(col(textCol)).as("__toks"))
      .select(col("id"), hashShingles(shingles(col("__toks"), shingleSize)).as("hs"))
    def bucketsOf(h: DataFrame, idsAs: String) = h
      .select(col("id"),
        posexplode_outer(bandKeys(minhashFromHashes(col("hs"), numHashes),
          numHashes, bands)).as(Seq("band", "band_hash")))
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("id")).as(idsAs))
      .filter(size(col(idsAs)).between(1, maxBucket))
    val lh = hashedOf(left)
    val rh = hashedOf(right)
    val candidates = bucketsOf(lh, "lids")
      .join(bucketsOf(rh, "rids"), Seq("band", "band_hash"))
      .select(explode_outer(expr(
        """flatten(transform(lids, x ->
          |  transform(rids, y -> struct(x AS id1, y AS id2))))""".stripMargin))
        .as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()
    candidates
      .join(lh.select(col("id").as("id1"), col("hs").as("s1")), "id1")
      .join(rh.select(col("id").as("id2"), col("hs").as("s2")), "id2")
      .select(col("id1"), col("id2"),
        round(jaccard(col("s1"), col("s2")), 4).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .orderBy(col("jaccard").desc, col("id1"), col("id2"))
  }

  /** Incremental exact dedup — the nightly-append case: drop `batch` rows
    * whose content already exists in `corpus`, where the corpus is orders
    * of magnitude larger than the batch. The corpus is NEVER shuffled:
    *
    *  1. one corpus pass builds a tree-aggregated Bloom sketch of content
    *     hashes (`stat.bloomFilter` — partial sketches merge at the
    *     driver, no exchange);
    *  2. batch rows failing the broadcast Bloom probe are DEFINITELY new
    *     (Bloom has no false negatives) and ship without any join;
    *  3. the few Bloom-positive rows verify against a second corpus scan
    *     that is filtered to the (broadcast) candidate hash set and
    *     anti-joined back — both join sides are batch-sized, so at fpp
    *     0.01 the verify tier touches ~1% of an already-small batch.
    *
    * Two corpus scans, zero corpus shuffles, no state kept between runs.
    * A deployment that persists the corpus hash column (or the sketch
    * itself) drops to one/zero corpus scans; the shape here assumes
    * nothing beyond the raw corpus. Exactness: the final decision is the
    * anti-join on the 64-bit content hash — a Bloom false positive costs
    * a verify-join row, never a wrongly-dropped one (dedup at the
    * xxhash64-collision level, like every hash-dedup tier here). */
  def dedupIncrement(batch: DataFrame, corpus: DataFrame,
      textCol: String = "text", fpp: Double = 0.01,
      expectedCorpus: Long = -1L,
      corpusHashCol: Option[String] = None): DataFrame = {
    val h = xxhash64(col(textCol))
    // NULL text never equals anything under the oracle's `c.text = b.text`
    // semantics — such batch rows pass through unconditionally, and corpus
    // NULLs stay out of the sketch (xxhash64(NULL) is the seed constant,
    // which would otherwise alias every NULL row to one value and drop the
    // batch's NULL rows against any NULL in the corpus).
    val nullRows = batch.filter(col(textCol).isNull)
    val liveBatch = batch.filter(col(textCol).isNotNull)
    // A deployment that persists xxhash64(text) alongside the corpus skips
    // re-hashing (and re-reading the text bytes) here entirely.
    val corpusH = corpusHashCol match {
      case Some(c) => corpus.filter(col(c).isNotNull).select(col(c).as("__h"))
      case None => corpus.filter(col(textCol).isNotNull).select(h.as("__h"))
    }
    // stat.bloomFilter NPEs on an empty input (null aggregation buffer) —
    // and with no corpus everything is new anyway.
    if (corpusH.isEmpty) return liveBatch.unionByName(nullRows)
    val expected = math.max(bloomCapacity(corpus, expectedCorpus), 1L)
    val bf = corpusH.stat.bloomFilter("__h", expected, fpp)
    val bfBc = batch.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((x: Long) => bfBc.value.mightContainLong(x))
    val hashed = liveBatch.withColumn("__h", h)
    val definitelyNew = hashed.filter(!probe(col("__h")))
    val candidates = hashed.filter(probe(col("__h")))
    val candHashes = candidates.select(col("__h")).distinct()
    val confirmed = corpusH.join(broadcast(candHashes), Seq("__h"))
      .select(col("__h")).distinct()
    val verifiedNew =
      candidates.join(broadcast(confirmed), Seq("__h"), "left_anti")
    definitelyNew.unionByName(verifiedNew).drop("__h").unionByName(nullRows)
  }

  /** Bloom capacity without a dedicated count pass where one can be
    * avoided: an explicit caller value wins; otherwise the optimizer's
    * row-count statistic (free when the source carries it); a plain
    * `count()` only as the last resort. Oversizing a Bloom only LOWERS
    * its fpp, so a generous caller estimate is always safe. */
  private def bloomCapacity(corpus: DataFrame, explicit: Long): Long =
    if (explicit > 0) explicit
    else corpus.queryExecution.optimizedPlan.stats.rowCount
      .map(_.toLong).getOrElse(corpus.count())
}
