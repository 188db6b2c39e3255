package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.index.IvfFlat

/** Deduplication + pairwise-similarity operators over `documents` and
  * `embeddings` — the LLM-training-pipeline surface (SURVEY.md §7.4).
  *
  * Scale notes (the part the small-SF oracle can't see):
  *  - Exact dedup is a hash groupBy — one shuffle on the fingerprint.
  *  - The n-gram Jaccard join is an inverted-index similarity join
  *    (explode shingles, self-join on shingle, count intersections):
  *    exact for any threshold > 0 because similar pairs share >= 1
  *    shingle. Hot shingles are the skew risk at 100TB — AQE skew-join
  *    handles moderate skew; PPJoin-style prefix filtering is the
  *    aggressive fix when posting lists explode.
  *  - MinHash/SimHash signatures are ONE narrow codegen'd pass over
  *    each row's token/shingle array ([[org.apache.spark.sql.graft
  *    .SimHash64]] / [[org.apache.spark.sql.graft.MinHashBands]]) — no
  *    explode, no shuffle, nothing interpreted. (Round 2 computed them
  *    by exploding postings into a 64-aggregate-column hash-aggregate:
  *    correct, but it shuffled |docs|x|tokens| rows per signature
  *    pass — the wrong plan at 100x.)
  *  - Band/segment self-joins route HOT buckets through a salted
  *    two-sided join ([[bucketPairs]]): an adversarial bucket (all
  *    identical boilerplate docs) stays exact but its quadratic work is
  *    spread across `salts` reducers instead of one.
  *  - MinHash-LSH: candidates = pairs agreeing on >= 1 of 16 bands of 4
  *    hashes, then exact-verified. Deterministic (xxhash64, fixed
  *    seeds): P[candidate | j=0.8] = 1-(1-0.8^4)^16 ~ 0.9998 — at
  *    sf0.01 it finds every pair >= 0.8 (checked against the exact
  *    join), hence it shares q45's oracle.
  *  - SimHash blocking is EXACT by pigeonhole: 4 segments of 16 bits;
  *    hamming <= 3 implies some segment matches exactly.
  *
  * Cache contract: queries that return a LAZY DataFrame built on a
  * cached intermediate (q49's normalized vectors, q72's quality scores)
  * leave that cache alive — it is still needed when the caller runs its
  * action. Callers own releasing it (`spark.catalog.clearCache()` after
  * consuming, as Verify/Bench do per query); intermediates consumed
  * WITHIN a query are released eagerly here (unpersist/localCheckpoint).
  */
object DedupOps {

  type Q = (SparkSession, String) => DataFrame

  /** The raw (doc_id, g) 3-gram OCCURRENCE stream (posexplode + window
    * leads) — q71's repetition signal needs every occurrence, not the
    * set; everything set-shaped goes through [[docShingles]]'s narrow
    * codegen pass instead. */
  private def gramStream(s: SparkSession, d: String): DataFrame =
    // r13: narrow array construction instead of posexplode + doc_id
    // window leads (guide §2.4 — the window shuffled and sorted the
    // whole token stream); spreadInput decouples the kernel from the
    // single-split scan (§2.5). Same (doc_id, g) occurrence rows.
    graft.Util.spreadInput(
        Tables.load(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 3), i -> " +
          "concat_ws(' ', ts[i], ts[i+1], ts[i+2]))")).as("g"))

  /** Distinct 3-gram shingle set per doc — ONE narrow codegen'd pass
    * ([[org.apache.spark.sql.graft.DistinctShingles]]), zero shuffles.
    * (The previous posexplode + window-lead + collect_set shape
    * shuffled |docs|×|tokens| gram rows per construction — the wrong
    * plan at 100×; gramStream remains for q71, which needs the raw
    * OCCURRENCE stream, not the set.) Docs with < 3 tokens produce an
    * empty set and are filtered, matching the old window-lead
    * semantics where they simply emitted no gram rows. */
  private[graft] def docShingles(s: SparkSession, d: String): DataFrame = {
    val base = Tables.load(s, d, "documents").select("doc_id", "text")
    // Parallelism decoupling: a single-row-group parquet arrives as ONE
    // split, which would run the whole narrow shingle pipeline on one
    // core (Spark can't subdivide a row group). At production scale the
    // source has thousands of splits and this branch never fires; the
    // conditional keeps "zero shuffles" true exactly where it matters.
    val spread =
      if (base.rdd.getNumPartitions < s.sparkContext.defaultParallelism)
        base.repartition(s.sparkContext.defaultParallelism)
      else base
    spread
      .select(col("doc_id"),
        org.apache.spark.sql.graft.DistinctShingles.column(
          TextOps.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** Exploded (doc_id, shingle) postings with per-doc set size. */
  private[graft] def postings(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("shingle"))

  /** Exact pairwise Jaccard >= `thr` via inverted-index self-join. */
  private def jaccardPairs(sh: DataFrame, thr: Double): DataFrame = {
    val inv = postings(sh).cache() // both self-join branches read it
    val a = inv.as("a"); val b = inv.as("b")
    a.join(b, col("a.shingle") === col("b.shingle")
        && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= thr)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  private val JaccardThr = 0.8
  private val ContainThr = 0.9

  /** Size of the deterministic (md5-ordered) sample the q47/q133
    * brute-force VERIFICATION sides run on. The blocked/clustered
    * operator paths always process the full table; only the
    * O(sample²) equivalence check is bounded, so the gate cost is
    * fixed at any corpus size. Covers the whole table at sf<=0.01
    * (500 rows), where the gate is exhaustive. */
  private val BruteGateN = 1000

  /** Deterministic md5-ordered BruteGateN-row sample, spread across
    * cores (TakeOrdered materializes into ONE partition — without the
    * repartition the O(sample²) brute join would serialize on a single
    * task). Caller caches/unpersists. */
  private def md5Sample(df: DataFrame, keyCol: String): DataFrame =
    df.orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .limit(BruteGateN)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Restrict (a_id, b_id) pairs to those with BOTH endpoints in the
    * single-column `ids` frame — two broadcast semi-joins. The
    * using-join moves its key FIRST, so the final select re-fixes the
    * column order for position-based consumers (unionAll). */
  private def restrictPairs(pairs: DataFrame, ids: DataFrame): DataFrame =
    pairs
      .join(broadcast(ids.toDF("a_id")), Seq("a_id"), "left_semi")
      .join(broadcast(ids.toDF("b_id")), Seq("b_id"), "left_semi")
      .select("a_id", "b_id")

  /** ONE-job comparison of two (a_id, b_id) pair sets via the tag-sum
    * union (rows only in `a` sum to 1, only in `b` to 2, agreement to
    * 3): returns (onlyA, onlyB, both). Job-count overhead, not row
    * volume, dominates gates this size. */
  private def pairSetStats(a: DataFrame, b: DataFrame): (Long, Long, Long) = {
    val r = a.withColumn("__w", lit(1L))
      .unionAll(b.withColumn("__w", lit(2L)))
      .groupBy("a_id", "b_id").agg(sum("__w").as("w"))
      .agg(
        sum(when(col("w") === 1L, 1L).otherwise(0L)).as("only_a"),
        sum(when(col("w") === 2L, 1L).otherwise(0L)).as("only_b"),
        sum(when(col("w") === 3L, 1L).otherwise(0L)).as("both"))
      .first()
    def at(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
    (at(0), at(1), at(2))
  }

  /** PPJoin/Vernica-style candidate pairs: order each doc's shingles
    * by global frequency (rarest first), index only the PREFIX of
    * length n - ceil(t*n) + 1 — any pair with J >= t must share a
    * prefix token — and self-join the prefix postings with the size
    * filter t*|A| <= |B| <= |A|/t.
    *
    * Shape for scale: the frequency table is a vocabulary (tiny vs
    * the corpus) so it is BROADCAST into the postings instead of
    * shuffling the postings against it; the frequency-order window
    * is the one per-doc exchange this pipeline pays. At sf0.1
    * this prunes the inverted index's 1.27M posting pairs / 1.13M
    * candidate pairs down to 46k / 43.5k (~27x) — the gap widens with
    * corpus size because hot shingles are pushed out of prefixes
    * (DedupSpec pins the reduction factor). */
  private[graft] def prefixCandidates(sh: DataFrame): DataFrame = {
    val post = postings(sh)
    val freq = post.groupBy("shingle").agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("freq").asc, col("shingle").asc)
    val prefix = post.join(broadcast(freq), "shingle")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("n") - ceil(col("n") * JaccardThr) + 1)
      .select(col("doc_id"), col("n"), col("shingle"))
      .cache() // both self-join branches read it
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.shingle") === col("y.shingle")
          && col("x.doc_id") < col("y.doc_id")
          // size filter: J >= t forces t*|A| <= |B| <= |A|/t
          && col("y.n") >= ceil(col("x.n") * JaccardThr)
          && col("y.n") * JaccardThr <= col("x.n"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      // materialize, then release the prefix cache — candidates are
      // re-read by the verification joins, the prefix table never is
      .localCheckpoint()
    prefix.unpersist()
    cand
  }

  /** HashMin connected-components labels over the exact near-dup pair
    * graph: every round each node takes the min label among itself
    * and its neighbors; rounds = component diameter (near-dup
    * clusters are tiny cliques, so 2-3). Each round is one shuffle
    * keyed on doc id — the standard large-scale CC shape; no
    * driver-side graph ever exists. Returns (id, lbl) for every doc
    * that has at least one near-duplicate. */
  private def dupLabels(s: SparkSession, d: String): DataFrame = {
    val pairs = jaccardPairs(docShingles(s, d), JaccardThr)
      .select(col("a_id"), col("b_id")).cache()
    val out = ccLabels(pairs)
    pairs.unpersist()
    out
  }

  /** The HashMin fixpoint itself over an (a_id, b_id) undirected pair
    * frame — split from [[dupLabels]] so the multi-round convergence
    * path (component diameter > 1, e.g. CHAINS of near-dups, which
    * real boilerplate drift produces) is directly testable; the
    * table-bound clusters in the corpus are cliques and converge at
    * init. */
  private[graft] def ccLabels(pairs: DataFrame): DataFrame = {
    val edges = pairs.unionAll(
        pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .toDF("src", "dst").cache()
    // round-0 fused into the init: lbl = least(id, min neighbor id) on
    // the SAME groupBy-src shuffle that plain node-distinct would pay.
    // Near-dup clusters are mostly cliques, and a clique converges AT
    // init under this seeding — the loop then runs exactly one
    // verification round instead of propagate + verify.
    var cached = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("src")), min(col("dst"))).as("lbl"))
      .cache() // handle we unpersist
    var labels = cached
    var converged = false
    while (!converged) {
      val prop = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min("lbl").as("nbr_lbl"))
      // convergence is decided INSIDE the propagation join (one join
      // per round, not two), and the count fully materializes `next`
      // into its cache before the old round's cache is released —
      // a short-circuiting check could leave cold partitions whose
      // lineage chains through every unpersisted prior round
      val next = labels.join(prop, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl")))
            .as("lbl"),
          (col("nbr_lbl").isNotNull && col("nbr_lbl") < col("lbl"))
            .as("__changed"))
        .cache()
      converged = next.filter(col("__changed")).count() == 0
      cached.unpersist()
      cached = next
      labels = next.drop("__changed")
    }
    // hand back a localCheckpoint so every per-round cache (including
    // the final round's) is released — library callers keep no hidden
    // cache entries alive, only the checkpointed labels themselves
    val out = labels.localCheckpoint()
    cached.unpersist()
    edges.unpersist()
    out
  }

  /** Per-cluster canonical election — THE tie-breaking rule, shared
    * by q66 and the q72 capstone so they cannot disagree: highest
    * quality wins, ties to the lowest doc id. Returns one row per
    * cluster: (lbl, id, quality). */
  private def electKeepers(labels: DataFrame, qual: DataFrame)
      : DataFrame =
    // top-1 as an ARGMAX AGGREGATE, not a rank window: lexicographic
    // max of struct(quality, -id) picks highest quality with ties to
    // the lowest id, and an aggregate combines map-side BEFORE the
    // shuffle and never sorts a cluster — a window must shuffle every
    // member row, then sort each cluster, to keep one row
    labels.join(qual, col("id") === col("doc_id"))
      .groupBy("lbl")
      .agg(max(struct(col("quality"), (-col("id")).as("nid"))).as("top"))
      .select(col("lbl"), (-col("top.nid")).as("id"),
        col("top.quality").as("quality"))

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs
    * against the full shingle sets. The candidate id set is the PRUNED
    * side — orders of magnitude smaller than the corpus — so it is
    * broadcast into the first lookup; the second join streams the
    * shingle table (only the candidate-sized left side shuffles). The
    * intermediate is deliberately NOT re-broadcast: it carries a full
    * shingle array per row, and a size-blind broadcast hint there
    * risks OOM where a shuffle degrades gracefully. */
  private def verifyPairs(cand: DataFrame, sh: DataFrame): DataFrame =
    broadcast(cand)
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sha")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= JaccardThr)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))

  /** All (a_id, b_id), a < b, of rows sharing the `keyCols` bucket —
    * the LSH band / SimHash segment candidate join — with skew
    * protection: buckets above `hotThreshold` rows run through a
    * SALTED two-sided self-join (left side salted by id hash, right
    * side replicated `salts` ways, join key extended with the salt),
    * so one adversarially hot bucket (all-identical boilerplate docs)
    * spreads its quadratic pair work across `salts` reducers instead
    * of sitting on one. Exact: every qualifying pair survives exactly
    * once on exactly one path (a bucket is wholly hot or wholly not;
    * within a hot bucket, pair (a,b) matches only where a's salt meets
    * b's replica of that salt). The hot set is by definition tiny, so
    * its detection broadcast is bounded. Fully LAZY — one composed
    * plan, no caches or checkpoints (`rows` is read by several
    * branches, so callers should hand in a cached or cheap-to-
    * recompute frame; Spark reuses the hot-set broadcast across the
    * branches via ReusedExchange). */
  private[graft] def bucketPairs(df: DataFrame, keyCols: Seq[String],
      hotThreshold: Int = 1024, salts: Int = 16,
      pairCond: Column = lit(true),
      outCols: Seq[Column] = Seq(col("x.doc_id").as("a_id"),
        col("y.doc_id").as("b_id"))): DataFrame = {
    val rows = df
    val keys = keyCols.map(col)
    val hot = rows.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold).select(keys: _*)
    def keyEq = keyCols.map(k => col(s"x.$k") === col(s"y.$k"))
      .reduce(_ && _)
    // `pairCond` (e.g. the hamming bound) rides INSIDE the join
    // condition — qualifying pairs are the only join output, so the
    // downstream distinct never sees the quadratic candidate stream
    val cold = rows.join(broadcast(hot), keyCols, "left_anti")
    val coldPairs = cold.as("x").join(cold.as("y"),
        keyEq && col("x.doc_id") < col("y.doc_id") && pairCond)
      .select(outCols: _*)
    val hotRows = rows.join(broadcast(hot), keyCols, "left_semi")
    val saltedX = hotRows.withColumn("__salt",
      pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
    val replicatedY = hotRows.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val hotPairs = saltedX.as("x").join(replicatedY.as("y"),
        keyEq && col("x.__salt") === col("y.__salt")
          && col("x.doc_id") < col("y.doc_id") && pairCond)
      .select(outCols: _*)
    coldPairs.unionAll(hotPairs).distinct()
  }

  /** Incremental dedup of a (small) new batch against the existing
    * corpus: per new doc, `exact_dup` (same content fingerprint as a
    * corpus doc), `near_dup` (3-gram Jaccard >= [[JaccardThr]] with a
    * corpus doc), or `kept`. Both inputs are (doc_id, text).
    *
    * The asymmetry is the design: the corpus is the 100TB side and is
    * only ever STREAMED map-side — its fingerprints semi-join against
    * the broadcast batch-fp set, its postings hash-join against the
    * broadcast batch postings — so the only rows that ever shuffle are
    * candidate pairs sharing a shingle with the (tiny) batch. */
  private[graft] def incrementalDedup(newDocs: DataFrame,
      corpusDocs: DataFrame): DataFrame = {
    def prep(df: DataFrame): DataFrame = df
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"),
        org.apache.spark.sql.graft.DistinctShingles.column(
          TextOps.tokens(col("text")), 3).as("sh"))
    // localCheckpoint, not cache: eagerly materialized (the batch is
    // small by contract) and released with the DataFrame — no cache
    // entry outlives the query
    val newB = prep(newDocs).localCheckpoint()
    val corpus = prep(corpusDocs)
    // exact: corpus streams past the broadcast batch-fp set; the
    // surviving (matched) fps are tiny and broadcast back
    val matchedFp = corpus.select("fp")
      .join(broadcast(newB.select("fp").distinct()), Seq("fp"), "left_semi")
      .distinct()
    val exactIds = newB
      .join(broadcast(matchedFp), Seq("fp"), "left_semi")
      .select(col("doc_id")).withColumn("is_exact", lit(true))
    // near: inverted index with the BATCH side broadcast — corpus
    // postings never shuffle; only shingle-sharing pairs leave the map
    val nPost = newB.select(col("doc_id").as("n_id"),
      size(col("sh")).as("nn"), explode(col("sh")).as("shingle"))
    val cPost = corpus.select(col("doc_id").as("c_id"),
      size(col("sh")).as("cn"), explode(col("sh")).as("shingle"))
    val nearIds = cPost.join(broadcast(nPost), "shingle")
      .groupBy("n_id", "c_id", "nn", "cn")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter").cast("double")
        / (col("nn") + col("cn") - col("inter")).cast("double")
        >= JaccardThr)
      .select(col("n_id").as("doc_id")).distinct()
      .withColumn("is_near", lit(true))
    newB.select("doc_id")
      .join(exactIds, Seq("doc_id"), "left")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("is_exact"), "exact_dup")
          .when(col("is_near"), "near_dup")
          .otherwise("kept").as("status"))
  }

  /** PERSISTED MinHash-LSH band index + shuffle-free probe — the
    * dedup-serving layout for a long-lived corpus: the corpus's
    * (doc_id, band, bkey) rows are written ONCE as a table BUCKETED by
    * the band key; each day's batch computes its own band rows (tiny)
    * and joins them against the bucketed scan. EnsureRequirements
    * shuffles only the batch side into the index's bucketing — the
    * persisted corpus index is read co-partitioned, never exchanged
    * (asserted in DedupSpec). Candidates are then exact-verified
    * against shingle sets recomputed narrowly (zero-shuffle
    * [[DistinctShingles]]), so the corpus never shuffles anywhere in
    * the whole probe. Returns exact near-dup pairs (n_id, c_id,
    * jaccard >= [[JaccardThr]]).
    *
    * Same per-batch verdict as [[incrementalDedup]]'s near path — the
    * difference is WHO pays per batch: incrementalDedup re-streams the
    * corpus every batch (fine for one-off), this index pays one write,
    * then every batch probe is proportional to the BATCH. */
  private[graft] def lshIndexProbe(s: SparkSession,
      corpusDocs: DataFrame, batchDocs: DataFrame,
      tableName: String, path: String): DataFrame = {
    def bandRows(df: DataFrame, idCol: String): DataFrame = df
      .select(col("doc_id").as(idCol),
        org.apache.spark.sql.graft.DistinctShingles.column(
          TextOps.tokens(col("text")), 3).as("sh"))
      // empty shingle sets MUST be dropped before banding: MinHash of
      // an empty array is a CONSTANT signature, so every sub-3-token
      // doc would land in the same 16 buckets and cross-join
      .filter(size(col("sh")) > 0)
      .select(col(idCol), posexplode(
        org.apache.spark.sql.graft.MinHashBands.column(
          col("sh"), numHashes = 64, bands = 16)).as(Seq("band", "bkey")))
    if (!s.catalog.tableExists(tableName)) // build once, probe many
      bandRows(corpusDocs, "c_id")
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "bkey").sortBy("bkey")
        .option("path", path).saveAsTable(tableName)
    val cand = s.table(tableName)
      .join(bandRows(batchDocs, "n_id"), Seq("band", "bkey"))
      .select("n_id", "c_id").distinct()
    def sh(df: DataFrame, idCol: String, shCol: String): DataFrame = df
      .select(col("doc_id").as(idCol),
        org.apache.spark.sql.graft.DistinctShingles.column(
          TextOps.tokens(col("text")), 3).as(shCol))
    broadcast(cand)
      .join(sh(batchDocs, "n_id", "sha"), "n_id")
      .join(sh(corpusDocs, "c_id", "shb"), "c_id")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("inter").cast("double")
        / (size(col("sha")) + size(col("shb")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= JaccardThr)
      .select(col("n_id"), col("c_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Packed 64-bit SimHash per doc — one codegen'd pass over the
    * distinct-token array, no explode/shuffle. */
  private[graft] def simhashes(s: SparkSession, d: String): DataFrame =
    // spreadInput: the 64-lane SimHash kernel is the query's heaviest
    // narrow stage and otherwise runs on the single-split scan (§2.5)
    graft.Util.spreadInput(
        Tables.load(s, d, "documents").select("doc_id", "text"))
      .select(col("doc_id"),
        org.apache.spark.sql.graft.SimHash64.column(
          array_distinct(TextOps.tokens(col("text")))).as("sim"))

  /** SimHash near-dup pairs, hamming <= 3, EXACT via 4x16-bit segment
    * blocking (pigeonhole: <= 3 differing bits cannot touch all 4
    * segments, so some segment matches exactly). 16-bit segments are
    * deliberate: real corpora concentrate on few distinct 8-bit
    * segment values (similar docs share whole segments — at sf0.1 one
    * 8-bit bucket held ~half the corpus), while 16-bit keys keep
    * buckets selective. The signature rides along and the hamming
    * bound is evaluated INSIDE the (salted) bucket join — the blocked
    * path emits only true near-dup pairs, never the quadratic
    * candidate stream. Shared by q47's equivalence gate and
    * DedupSpec. */
  private[graft] def simhashPairs(sim: DataFrame): DataFrame = {
    val seg = sim.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map(g =>
        shiftright(col("sim"), g * 16).bitwiseAND(65535)): _*))
        .as(Seq("g", "gkey")))
    bucketPairs(seg, Seq("g", "gkey"),
      pairCond = expr("bit_count(x.sim ^ y.sim)") <= 3,
      outCols = Seq(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        expr("bit_count(x.sim ^ y.sim)").as("hamming")))
  }

  /** q303's record linkage over a customer frame: a deterministic
    * DIRTY COPY (every 7th row absent; rows with key%10<3 get their
    * name's last two digits swapped; every 5th row's balance drifts
    * one cent), blocked candidate generation, and integer
    * Fellegi–Sunter-style agreement scoring.
    *
    * The design teaches the two load-bearing linkage lessons at
    * once: (1) the BLOCKING KEY (nation, name[1..16]) is chosen so
    * the planted perturbation can never escape its block — the
    * digit swap lives entirely in chars 17..18, strictly outside the
    * 16-char prefix — so candidate recall is 1.0 BY CONSTRUCTION and
    * the measured misses are purely the classifier's; (2) the
    * classifier's errors are closed-form: a swapped name (-1) with
    * intact cents (+2) scores 1 < 2, so the FALSE-NEGATIVE set is
    * exactly the swapped keys whose last two digits differ, and the
    * residual FALSE POSITIVES are the coincidence set where a
    * swapped bname collides with a same-block sibling's real name
    * (name +3, cents −1 → 2 ≥ threshold) — the classical
    * blocking-recall vs classifier-precision trade, measured, not
    * hidden. Shape: one equi-join on the block key (block size
    * bounded by the shared 7-digit prefix group), never |A|·|B|. */
  private[graft] def recordLinkage(customer: DataFrame): DataFrame = {
    val a = customer.select(col("c_custkey").as("k"),
      col("c_name").as("name"), col("c_nationkey").as("nat"),
      round(col("c_acctbal") * 100).cast("long").as("cents"))
      .localCheckpoint(true)
    val b = a.filter(col("k") % 7 =!= 0)
      .select(col("k").as("bk"),
        when(col("k") % 10 < 3, concat(substring(col("name"), 1, 16),
          substring(col("name"), 18, 1), substring(col("name"), 17, 1)))
          .otherwise(col("name")).as("bname"),
        col("nat").as("bnat"),
        when(col("k") % 5 === 0, col("cents") + 1)
          .otherwise(col("cents")).as("bcents"))
    val cand = a.join(b,
      col("nat") === col("bnat") &&
        substring(col("name"), 1, 16) === substring(col("bname"), 1, 16))
    val scored = cand.select(col("k"), col("bk"),
      (when(col("name") === col("bname"), 3).otherwise(-1) +
        when(col("cents") === col("bcents"), 2).otherwise(-1))
        .as("score"))
    scored.agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("k") === col("bk"), 1L).otherwise(0L))
        .as("true_pairs"),
      sum(when(col("score") >= 2, 1L).otherwise(0L)).as("n_matched"),
      sum(when(col("score") >= 2 && col("k") === col("bk"), 1L)
        .otherwise(0L)).as("matched_true"))
      .select(col("n_candidates"), col("true_pairs"), col("n_matched"),
        col("matched_true"),
        (col("true_pairs") - col("matched_true")).as("false_negatives"),
        round(col("matched_true").cast("double") / col("n_matched"), 6)
          .as("precision"),
        round(col("matched_true").cast("double") / col("true_pairs"), 6)
          .as("recall"))
  }

  val queries: Map[String, Q] = Map(
    // RECORD LINKAGE — entity resolution between a table and its
    // deterministically-dirtied copy: perturbation-surviving
    // blocking, integer agreement weights, closed-form false
    // negatives; the matching family BEYOND near-dup text.
    "q303_record_linkage" -> ((s, d) =>
      recordLinkage(Tables.load(s, d, "customer"))),

    // Exact dedup: hash-groupBy on the normalized-text fingerprint,
    // canonical = min doc_id (one shuffle; at scale this is THE dedup
    // primitive).
    "q44_dedup_exact" -> ((s, d) => {
      Tables.load(s, d, "documents")
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("canonical_id"), count(lit(1)).as("copies"))
        .groupBy("copies")
        .agg(count(lit(1)).as("groups"), min("canonical_id").as("first_canonical"))
    }),

    // Exact n-gram (3-shingle) Jaccard near-dup pairs.
    "q45_ngram_jaccard" -> ((s, d) =>
      jaccardPairs(docShingles(s, d), JaccardThr)),

    // TRAIN/TEST LEAKAGE audit — the q45 near-dup pair set classified
    // by the q105 split rule: a pair straddling train and test is a
    // leak (the model "memorizes" a test doc through its twin), and
    // this census is THE reason dedup must run BEFORE splitting, not
    // after. Shapes: pairs are dup-rate-sized and join twice against
    // the doc→split map on plain id equi-joins (at 100 TB the pair
    // side broadcasts); the cell table is ≤ 6 rows. Both engines
    // derive the split from the shared md5 fingerprint, so the cells
    // are exact.
    "q275_split_leakage" -> ((s, d) => {
      val pairs = jaccardPairs(docShingles(s, d), JaccardThr)
        .select("a_id", "b_id")
      val u = conv(substring(TextOps.fingerprint(col("text")), 1, 8),
        16, 10).cast("double") / lit(4294967296.0)
      val splits = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          when(u < 0.8, "train").when(u < 0.9, "val")
            .otherwise("test").as("split"))
      pairs
        .join(splits.select(col("doc_id").as("a_id"),
          col("split").as("sa")), "a_id")
        .join(splits.select(col("doc_id").as("b_id"),
          col("split").as("sb")), "b_id")
        .select(least(col("sa"), col("sb")).as("split_lo"),
          greatest(col("sa"), col("sb")).as("split_hi"))
        .groupBy("split_lo", "split_hi")
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("leaky", col("split_lo") =!= col("split_hi"))
        .orderBy("split_lo", "split_hi")
    }),

    // EDIT-DISTANCE dedup — the character-level verify the token-set
    // passes (q45/q46) can't do: Jaccard is blind to within-token
    // edits and token order, Levenshtein is the ground-truth string
    // metric. All-pairs Levenshtein is O(n²·len²) and unshippable, so
    // candidates come from the q184 gram-block: pairs sharing a
    // non-boilerplate 4-gram (df <= 50), then ONE levenshtein call per
    // candidate inside the join. Both engines run the identical
    // candidate rule + the identical published metric (unit-cost
    // ins/del/sub), so the pair set matches exactly.
    "q254_edit_distance_dedup" -> ((s, d) =>
      editDistanceDedup(Tables.load(s, d, "documents"), maxDist = 30)),

    // EXACT-SUBSTRING span dedup — the SPAN-level variant of document
    // dedup (the "exact substring" pass of Lee et al. 2022, which
    // removes repeated spans rather than whole near-dup docs; document-
    // level MinHash is q46, containment is q127). Maximal shared token
    // spans between doc pairs fall out of 4-gram matches merged along
    // (pair, diagonal) islands: a run of r consecutive matching grams
    // on one diagonal is a shared span of r+3 tokens; gaps break the
    // run exactly as the suffix-array method would. Hot grams
    // (df > 50 occurrences) are dropped BEFORE pairing, like LSH band
    // caps — boilerplate grams pair quadratically and carry no
    // pairwise signal. Shape: one doc_id exchange builds the gram
    // stream (posexplode + window leads, codegen); the df cap and the
    // occurrence self-join are both keyed on the gram (shared
    // partitioning); the island merge is one pair-diagonal window;
    // candidates are bounded by Σ df² ≤ cap·|grams| — never |docs|².
    // The report keeps pairs whose longest shared span ≥ 8 tokens —
    // the per-pair removal list a span-dedup pass consumes.
    "q184_substring_dedup" -> ((s, d) =>
      substringSpans(Tables.load(s, d, "documents"), cap = 50)
        .groupBy("a_id", "b_id").agg(
          max("span_len").as("max_span"),
          count(lit(1)).as("n_spans"),
          sum(when(col("span_len") >= 8, 1L).otherwise(0L))
            .as("spans_ge8"))
        .filter(col("max_span") >= 8)),

    // SPAN-REMOVAL accounting — the planning report a span-dedup pass
    // produces before rewriting anything: per doc, the UNION of all
    // token intervals covered by a shared span ≥ 8 tokens (both sides
    // of every q184 pair), unioned by the classic sweep (sort by
    // start; an interval whose start exceeds the running max end
    // opens a new island; union length = Σ per-island max(end) −
    // min(start) — overlaps counted once, exactly), then rolled up
    // per source: affected docs, their token mass, duplicated tokens,
    // duplicated fraction. All integer sums until the one final
    // rounded division; the sweep is a per-doc window (doc-keyed
    // exchange), never a global sort. 0/1-based position bases cancel
    // in every emitted quantity.
    "q185_span_removal" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      docs.select(col("doc_id"), col("source"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long")
            .as("n_tokens"))
        .join(dupTokensPerDoc(docs, cap = 50, minSpan = 8), "doc_id")
        .groupBy("source").agg(
          count(lit(1)).as("docs_affected"),
          sum("n_tokens").as("total_tokens"),
          sum("dup_tokens").as("dup_tokens"),
          round(sum("dup_tokens").cast("double") / sum("n_tokens"), 6)
            .as("dup_frac"))
    }),

    // Blocked FUZZY (edit-distance) entity matching — the record-
    // linkage primitive dedup-by-fingerprint can't express.
    // CANONICALIZE FIRST: rows collapse to distinct (name, count)
    // entities before any pairing — real corpora repeat surface forms
    // massively (20k part rows here carry 64 distinct names; the
    // row-level variant of this join measured 104 s at sf0.1, this one
    // milliseconds — and at 100TB row-level token blocking is
    // quadratic death while the distinct-entity table is bounded by
    // the vocabulary, not the corpus). Distinct names are then
    // token-blocked (inverted index — an EQUI-join, never all-pairs)
    // and verified by codegen levenshtein <= 4; the match profile
    // reports, per distance, distinct NAME pairs and the implied
    // row-level pair count expanded from the multiplicities
    // (cnt_a x cnt_b across names, C(cnt,2) within an exactly-
    // duplicated name at d=0). The shared-token condition is part of
    // the declared match rule, so the blocked plan computes exactly
    // what the oracle recomputes all-pairs-free in DuckDB.
    "q142_fuzzy_join" -> ((s, d) => {
      val names = Tables.load(s, d, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("cnt"))
      val toks = names.withColumn("tok", explode(split(col("name"), " ")))
      val cross = toks.as("a").join(toks.as("b"),
          col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
        .select(col("a.name").as("a_name"), col("b.name").as("b_name"),
          col("a.cnt").as("a_cnt"), col("b.cnt").as("b_cnt"))
        .distinct() // a pair may share several tokens
        .withColumn("d", levenshtein(col("a_name"), col("b_name")))
        .filter(col("d") <= 4)
        .select(col("d"), (col("a_cnt") * col("b_cnt")).as("id_pairs"))
      // exact duplicates: the d=0 self-match of a repeated name
      val self = names.filter(col("cnt") >= 2)
        .select(lit(0).as("d"),
          ((col("cnt") * (col("cnt") - 1)) / 2).cast("long").as("id_pairs"))
      cross.unionAll(self)
        .groupBy("d")
        .agg(count(lit(1)).as("n_name_pairs"),
          sum("id_pairs").as("n_id_pairs"))
    }),

    // Asymmetric CONTAINMENT join — C(A→B) = |S(A)∩S(B)| / |S(A)| —
    // catches "A is a near-subset of B" (excerpts, quote farms,
    // boilerplate-wrapped copies), which symmetric Jaccard structurally
    // misses once |B| >> |A|. Same inverted-index shape as q45 (one
    // exchange on the shingle key, per-pair agg), but one-sided: pairs
    // are ORDERED and each direction qualifies independently.
    "q127_containment" -> ((s, d) => {
      val inv = postings(docShingles(s, d)).cache()
      val a = inv.as("a"); val b = inv.as("b")
      a.join(b, col("a.shingle") === col("b.shingle")
          && col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
          col("a.n").as("na"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("containment",
          col("inter").cast("double") / col("na").cast("double"))
        .filter(col("containment") >= ContainThr)
        .select(col("a_id"), col("b_id"),
          round(col("containment"), 6).as("containment"))
    }),

    // Cross-SOURCE shingle-overlap matrix — "how much of source A
    // recurs in source B", the provenance-level dedup report run
    // before deciding which crawl snapshots/feeds to keep. The key
    // scale property: after the (source, shingle) DISTINCT, the
    // per-shingle self-join fan-out is bounded by |sources|² — NOT by
    // doc pairs — so the quadratic blow-up document-level joins risk
    // is structurally capped; per-source set sizes are a
    // |sources|-row broadcast.
    "q131_source_overlap" -> ((s, d) => {
      val ss = Tables.load(s, d, "documents")
        .select(col("source"),
          explode(org.apache.spark.sql.graft.DistinctShingles.column(
            TextOps.tokens(col("text")), 3)).as("shingle"))
        .distinct()
        .cache() // three readers: sizes + both join sides
      val sz = ss.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = ss.toDF("sa", "shingle")
        .join(ss.toDF("sb", "shingle"), "shingle")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("inter"))
      inter
        .join(broadcast(sz.toDF("sa", "na")), "sa")
        .join(broadcast(sz.toDF("sb", "nb")), "sb")
        .select(col("sa"), col("sb"), col("inter"),
          round(col("inter").cast("double")
            / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
    }),

    // Near-dup CLUSTERS: the step after pair-finding in a real dedup
    // pipeline — connected components over the similarity graph, each
    // cluster keyed by its canonical (min) doc id.
    "q65_dup_clusters" -> ((s, d) =>
      dupLabels(s, d).groupBy(col("lbl").as("cluster_id"))
        .agg(count(lit(1)).as("size"), max("id").as("max_member"))),

    // Canonical selection: which duplicate SURVIVES — the highest-
    // quality member of each near-dup cluster (ties to the lowest
    // doc id). Composes the similarity graph with the q41 quality
    // score; one row per cluster, all distributed (labels x quality
    // join + per-cluster top-1 window over cluster-sized groups).
    "q66_dedup_keep_best" -> ((s, d) =>
      electKeepers(dupLabels(s, d),
          TextOps.queries("q41_quality_score")(s, d)
            .select(col("doc_id"), col("quality")))
        .select(col("lbl").as("cluster_id"), col("id").as("keeper_id"),
          col("quality").as("keeper_quality"))),

    // CROSS-SOURCE DUPLICATION MATRIX — "which source is copying
    // which": every exact near-dup pair classified by its (source,
    // source) cell, the dashboard that turns pair-level dedup into a
    // crawl-policy decision (a hot cross-source cell = a mirror or a
    // scraper; a hot diagonal = a template farm). Pairs are the q45
    // exact join (dup-rate-sized), broadcast onto the 2-column doc→
    // source map — the corpus never shuffles.
    "q239_dup_source_matrix" -> ((s, d) => {
      val pairs = queries("q45_ngram_jaccard")(s, d)
        .select("a_id", "b_id")
      val src = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"))
      broadcast(broadcast(pairs)
          .join(src.select(col("doc_id").as("a_id"),
            col("source").as("sa")), "a_id"))
        .join(src.select(col("doc_id").as("b_id"),
          col("source").as("sb")), "b_id")
        .groupBy(least(col("sa"), col("sb")).as("src_lo"),
          greatest(col("sa"), col("sb")).as("src_hi"),
          (col("sa") =!= col("sb")).as("cross_source"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("src_lo", "src_hi")
    }),

    // DEDUP YIELD FORECAST — "how much does dedup buy", the decision
    // artifact that justifies (or kills) a dedup pass before anyone
    // runs it on 100 TB: connected near-dup clusters keep their
    // canonical (min-id) member; everything else is forecast removed,
    // and the row reports the doc and TOKEN mass that disappears.
    // Cluster labels are the q65 HashMin components; the removed-id
    // set (dup-rate-sized) broadcasts onto the token counts.
    "q240_dedup_yield" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("nt"))
      val lbl = dupLabels(s, d)
      val tot = toks.agg(count(lit(1)).as("n"), sum("nt").as("t"))
        .head()
      val (nDocs, nToks) = (tot.getLong(0), tot.getLong(1))
      val removed = lbl.filter(col("id") =!= col("lbl"))
        .select(col("id").as("doc_id"))
      val rem = broadcast(removed).join(toks, "doc_id")
        .agg(count(lit(1)).as("n"),
          coalesce(sum("nt"), lit(0L)).as("t")).head()
      val (nRem, tRem) = (rem.getLong(0), rem.getLong(1))
      val nClusters = lbl.select("lbl").distinct().count()
      def r6(v: Double) = BigDecimal(v)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq((nDocs, nToks, nClusters, nRem, tRem,
          r6(nRem.toDouble / nDocs.toDouble),
          r6(tRem.toDouble / nToks.toDouble)))
        .toDF("n_docs", "tokens_total", "n_dup_clusters",
          "docs_removed", "tokens_saved", "pct_docs_removed",
          "pct_tokens_saved")
    }),

    // Prefix-filtered exact similarity join (see prefixCandidates):
    // exact for the threshold, ~27x fewer candidate pairs than q45's
    // full inverted index at sf0.1. Shares q45's oracle.
    "q56_jaccard_ppjoin" -> ((s, d) => {
      val sh = docShingles(s, d).cache()
      verifyPairs(prefixCandidates(sh), sh)
    }),

    // MinHash(64) + LSH(16 bands x 4) candidates, exact-verified.
    // Signature + band keys = one narrow codegen'd pass per doc
    // (MinHashBands); candidates = the salted bucket self-join.
    // Deterministic; at sf0.01 output == q45 (same oracle).
    "q46_minhash_lsh" -> ((s, d) => {
      val sh = docShingles(s, d).cache()
      // bands cached too: bucketPairs reads its input from FOUR
      // branches (hot detection, cold self-join x/y, salted hot x/y)
      // and the 64-hash signature pass is the most CPU-expensive
      // narrow stage in the query — compute it once
      val bands = sh.select(col("doc_id"),
        posexplode(org.apache.spark.sql.graft.MinHashBands.column(
          col("sh"), numHashes = 64, bands = 16)).as(Seq("band", "bkey")))
        .cache()
      verifyPairs(bucketPairs(bands, Seq("band", "bkey")), sh)
    }),

    // SimHash(64) blocking, reshaped into a DRIVER-CHECKABLE gate:
    // xxhash64 signatures can never value-match another engine, but
    // the 4x16-bit segment blocking is provably EXACT for hamming <= 3
    // (pigeonhole), so the query emits the blocked-vs-brute
    // equivalence itself — (missed, extra) MUST be 0 and n_docs is a
    // genuine DuckDB-checkable count. DedupSpec additionally pins the
    // pair-level equality; this row makes the driver's CORRECTNESS
    // gate see the same assertion.
    "q47_simhash" -> ((s, d) => {
      import s.implicits._
      val sim = simhashes(s, d).cache()
      val blocked = simhashPairs(sim).select(col("a_id"), col("b_id"))
      // brute force runs on a DETERMINISTIC md5-ordered sample of
      // BruteGateN docs (the whole corpus at small sf), and blocked
      // pairs are restricted to the same id set — the gate property
      // (blocked == brute, pigeonhole exactness) is checked at FIXED
      // quadratic cost no matter the corpus size; only the blocked
      // (linear, bucketed) path ever sees every doc
      val sample = md5Sample(sim, "doc_id").cache()
      val brute = sample.as("a").join(broadcast(sample.as("b")),
          col("a.doc_id") < col("b.doc_id")
            && expr("bit_count(a.sim ^ b.sim)") <= 3)
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      val blockedS = restrictPairs(blocked, sample.select("doc_id"))
      val (extra, missed, _) = pairSetStats(blockedS, brute)
      val nDocs = sim.count()
      sample.unpersist(); sim.unpersist()
      Seq((missed == 0L && extra == 0L, missed, extra, nDocs))
        .toDF("blocked_eq_brute", "missed", "extra", "n_docs")
    }),

    // INCREMENTAL corpus dedup — the production shape: a small new
    // batch (doc_id % 10 == 0 stands in for today's crawl) deduped
    // against the EXISTING corpus (the other 90%), per-doc verdict
    // exact_dup / near_dup / kept. The asymmetry is the whole design:
    // the corpus is the 100TB side and is only ever STREAMED map-side —
    // its fingerprints semi-join against the broadcast new-batch
    // fingerprint set, its postings hash-join against the broadcast
    // new-batch postings — so the only rows that ever shuffle are
    // candidate pairs that share a shingle with the (tiny) batch.
    // Batch-internal dedup is the q44/q65 machinery, run separately.
    "q88_incremental_dedup" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val isNew = col("doc_id") % 10 === 0
      incrementalDedup(docs.filter(isNew), docs.filter(!isNew))
    }),

    // Persisted LSH band index probe: same batch/corpus split as q88;
    // the corpus's band index is a bucketed table built once, the
    // batch probes it with only the batch side shuffling. Exact
    // near-dup pairs out (LSH recall at J >= 0.8 is ~0.9998/pair with
    // these parameters — same guarantee q46 stakes its oracle on).
    "q89_lsh_index_probe" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val isNew = col("doc_id") % 10 === 0
      val t = s"graft_lsh_${Tables.dirKey(d)}"
      lshIndexProbe(s, docs.filter(!isNew), docs.filter(isNew),
        t, s"${Tables.scratchDir(d)}/$t")
    }),

    // Vocabulary induction: top-100 shingles by document frequency,
    // deterministic tie-break — the corpus-level hot-vocabulary pass
    // (the same table q56's prefix filter builds internally, exposed
    // as a product). Partial+final hash agg then TakeOrderedAndProject:
    // the full gram space is never globally sorted.
    "q79_vocab_topk" -> ((s, d) =>
      postings(docShingles(s, d))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle").asc)
        .limit(100)),

    // Repetition signal (Gopher-style quality filter): the fraction
    // of a doc's 3-gram occurrences that are repeats of an earlier
    // 3-gram. Narrow per-doc work sharing the shingle machinery —
    // no shuffle beyond the doc_id grouping it already has.
    "q71_repetition" -> ((s, d) => {
      gramStream(s, d)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("total_3grams"),
          countDistinct(col("g")).as("distinct_3grams"))
        .withColumn("dup_ratio", round(lit(1.0)
          - col("distinct_3grams").cast("double")
            / col("total_3grams").cast("double"), 6))
    }),

    // Exact-substring dedup signal (the Lee-et-al "deduplicating
    // training data" recipe at gram granularity): per doc, the
    // fraction of its 5-gram OCCURRENCES whose gram also appears in
    // some OTHER document — the cross-doc duplicated-span ratio that
    // substring dedup thresholds on. Scale shape: the shared-gram set
    // is corpus-sized, so it is NOT broadcast — both sides shuffle on
    // the gram key (the honest suffix-array replacement), then one
    // per-doc agg on the doc_id partitioning the gram window already
    // established.
    "q107_dup_spans" -> ((s, d) => {
      val grams = TextOps.gram5Stream(s, d)
      val shared = grams.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("g")
      val perDoc = grams.groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"))
      val dup = grams.join(shared, Seq("g"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("dup_positions"))
      perDoc.join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("dup_positions"), lit(0L)).as("dup_positions"),
          round(coalesce(col("dup_positions"), lit(0L)).cast("double")
            / col("n_grams"), 6).as("dup_ratio"))
    }),

    // CAPSTONE: assemble the training set. A document survives iff it
    // is not a dropped duplicate (non-dup, or its cluster's
    // highest-quality keeper) AND clears the quality bar. Reported
    // per predicted language with average quality — the end-to-end
    // composition of the dedup graph, canonical selection, quality
    // scoring and language-ID, all distributed.
    "q72_training_set" -> ((s, d) => {
      val labels = dupLabels(s, d)
      // quality is consumed twice (keeper election + the final bar) —
      // its stopword scoring runs interpreted HOFs, compute it once
      val qual = TextOps.queries("q41_quality_score")(s, d)
        .select(col("doc_id"), col("quality")).cache()
      val keepers = electKeepers(labels, qual)
        .select(col("id").as("keep_id"))
      val dropped = labels
        .join(keepers, col("id") === col("keep_id"), "left_anti")
        .select(col("id").as("drop_id"))
      qual
        .join(TextOps.queries("q42_lang_id")(s, d)
          .select(col("doc_id").as("lid"), col("lang_pred")),
          col("doc_id") === col("lid"))
        .join(dropped, col("doc_id") === col("drop_id"), "left_anti")
        .filter(col("quality") >= 0.5)
        .groupBy("lang_pred")
        .agg(count(lit(1)).as("kept"),
          // decimal-exact sum then one double division: float summation
          // ORDER differs between engines, exact decimal doesn't
          round(sum(col("quality").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_quality"),
          min("doc_id").as("first_doc"))
    }),

    // Embedding-cosine near-dup pairs, exact (broadcast nested-loop;
    // the LSH-bucketed scale path is q37_ann_lsh).
    "q48_embed_cosine_dup" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cos = graft.functions.VectorFunctions
        .cosineSimilarity(col("a.v"), col("b.v"))
      e.as("a").join(broadcast(e.as("b")),
          col("a.vec_id") < col("b.vec_id") && cos >= 0.45)
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          round(cos, 6).as("cos"))
    }),

    // The SCALE path for the same answer: unit-normalize (cosine order
    // == L2 order on the unit sphere), IVFFlat batch KNN join with
    // every vector as a query, exact cosine verify on the k candidate
    // neighbors. Cost: probed buckets per query instead of n² pairs.
    // probe=lists + k large enough for the densest neighborhood makes
    // it EXACT -> shares q48's oracle; at 100TB you trade probes/k for
    // recall.
    "q49_embed_dup_ivf" -> ((s, d) => {
      val norm = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nv",
          org.apache.spark.sql.graft.UnitNormalize.column(col("v")))
        .cache() // read by train + assign + join: compute once, not per job
      // sample-train + full-scan assign (the documented 100TB recipe;
      // IndexSpec pins that sampled centroids keep exact scans):
      // clustering quality only shapes bucket balance here — with
      // probe=lists the join is exact regardless, so don't pay 50
      // full-data Lloyd iterations for it
      val model = IvfFlat.build(norm, Seq("vec_id"), "nv",
        lists = 8, probeLists = 8, iterations = 10, sampleFraction = 0.25)
      // both directions + canonicalize (a<b) + distinct: a pair only
      // needs to survive the k cap in ONE of its endpoints' neighbor
      // lists, doubling effective recall at no extra scan cost.
      // cos >= 0.45 on the unit sphere ⇔ ||a-b|| <= sqrt(2*(1-0.45)):
      // the range bound prunes candidates before the top-k shuffle
      val nn = model.knnJoin(norm, "vec_id", "nv", k = 24,
          maxDist = Some(math.sqrt(2.0 * (1.0 - 0.45))),
          // 8 buckets would cap the shuffle join at 8 reducers; the
          // bucket table here is ~5MB -> broadcast, map-side distances
          broadcastBuckets = true)
        .filter(col("q_id") =!= col("vec_id"))
        .select(least(col("q_id"), col("vec_id")).as("a_id"),
          greatest(col("q_id"), col("vec_id")).as("b_id"))
        .distinct()
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cos = graft.functions.VectorFunctions
        .cosineSimilarity(col("va"), col("vb"))
      nn.join(e.select(col("vec_id").as("a_id"), col("v").as("va")), "a_id")
        .join(e.select(col("vec_id").as("b_id"), col("v").as("vb")), "b_id")
        .filter(cos >= 0.45)
        .select(col("a_id"), col("b_id"), round(cos, 6).as("cos"))
    }),

    // SemDeDup (cluster-then-dedup): k-means coarse clusters, then
    // exact pairwise cosine ONLY within each cluster — the n²/k cut
    // that makes embedding dedup tractable when n² pairs don't fit a
    // broadcast (q48) and even the per-query KNN join (q49) is too
    // much. Drop rule is the greedy keep-first: a vector is dropped
    // iff a smaller-id near-duplicate shares its cluster. The
    // clustering is engine-internal, so the driver-checkable surface
    // is the q102 idiom: every emitted value is either brute-SQL
    // (n_vectors, exact pair count) or an invariant the construction
    // must satisfy, re-verified through the independent exact path —
    // within-cluster pairs are a SUBSET of the exact pair set
    // (anti-join count 0) with recall >= 0.5, and every drop is
    // justified by a real pair. Scale: the within join shuffles on
    // cluster id (quadratic only inside a cluster — the salted
    // bucketPairs path applies if one cluster goes hot); the exact
    // side exists only for the gate and is q48's broadcast NL join.
    "q133_semdedup" -> ((s, d) => {
      import s.implicits._
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nv",
          org.apache.spark.sql.graft.UnitNormalize.column(col("v")))
        .cache() // read by train + assign + exact gate
      // cluster ON THE UNIT SPHERE (cosine order == L2 order there —
      // the q49 idiom); raw-space centroids would split cosine
      // neighborhoods that differ only in norm
      val model = IvfFlat.build(e, Seq("vec_id"), "nv",
        lists = 8, probeLists = 8)
      // probe-2 assignment: each vector lands in its two nearest
      // centroids' clusters, and a pair is caught iff the probe sets
      // intersect — the standard boundary-pair fix (a pair sitting on
      // a Voronoi edge is exactly the case one-probe SemDeDup misses).
      // Still narrow: distances to the k centroid literals are
      // codegen'd; candidate multiplicity is bounded by p²=4 replicas.
      val dists = array(model.centroids.map(c =>
        graft.functions.VectorFunctions.l2Dist(
          col("nv"), graft.functions.VectorFunctions.vecLit(c.toSeq))): _*)
      val c1 = array_position(col("ds"), array_min(col("ds"))) - 1
      val masked = transform(col("ds"),
        (x, i) => when(i === col("c1"), lit(Double.MaxValue)).otherwise(x))
      val assigned = e.withColumn("ds", dists)
        .withColumn("c1", c1)
        .withColumn("c2", array_position(masked, array_min(masked)) - 1)
        .select(col("vec_id"), col("v"),
          explode(array(col("c1"), col("c2"))).as("c"))
      // Candidate pairs are co-membership ONLY — no cosine predicate.
      // That keeps the subset gate below non-tautological (ADVICE r4):
      // `within` is candidates filtered by cosine, so if the
      // assignment join attached the wrong vector to an id, the
      // filter passes id pairs the independent exact path rejects and
      // the anti-join count goes nonzero. With the filter inside the
      // join (the old shape) the anti-join was 0 by construction.
      // cosine is computed IN the join projection (still from the
      // joined vectors — a mis-attached vector still yields a wrong
      // cos, keeping the subset gate non-tautological per ADVICE r4),
      // so the dropDuplicates exchange moves (id, id, cos) rows, not
      // pairs of dim-wide arrays — the narrow-shuffle shape that
      // survives 100TB
      val cosCand = graft.functions.VectorFunctions
        .cosineSimilarity(col("a.v"), col("b.v"))
      val candidates = assigned.as("a").join(assigned.as("b"),
          col("a.c") === col("b.c") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          cosCand.as("cos"))
        .dropDuplicates("a_id", "b_id") // a pair may share both probes
      val within = candidates.filter(col("cos") >= 0.45)
        .select(col("a_id"), col("b_id"))
        .cache() // read 4x: count, sample-restrict, anti-join, drops
      // the exact O(n²) verification side runs on a DETERMINISTIC
      // md5-ordered sample of BruteGateN vectors (whole table at small
      // sf) and `within` is restricted to the same ids — the
      // subset/recall invariants are checked at fixed cost while the
      // clustered operator path above always covers every vector. The
      // oracle SQL mirrors the identical md5-ordered LIMIT.
      // slim to the two columns the exact gate uses — `e` also carries
      // the unit-normalized copy, which would double the cached and
      // broadcast vector bytes for nothing
      val sample = md5Sample(e.select("vec_id", "v"), "vec_id").cache()
      val cos = graft.functions.VectorFunctions
        .cosineSimilarity(col("a.v"), col("b.v"))
      val exact = sample.as("a").join(broadcast(sample.as("b")),
          col("a.vec_id") < col("b.vec_id") && cos >= 0.45)
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      val withinS = restrictPairs(within, sample.select("vec_id"))
      // one job for all three pair-set measures, one for within totals
      // — job-count overhead dominates at this size
      val (nOutside, exactOnly, agree) = pairSetStats(withinS, exact)
      val nWithinS = nOutside + agree; val nExact = exactOnly + agree
      val wrow = within.agg(count(lit(1)).as("n"),
        countDistinct(col("b_id")).as("dropped")).first()
      val nWithin = wrow.getLong(0); val nDropped = wrow.getLong(1)
      val nVec = e.count()
      within.unpersist(); sample.unpersist(); e.unpersist()
      // recall over an empty exact set is vacuously OK (0/0), not a
      // failure — the old 0/1 >= 0.5 read false on pair-free data
      graft.GateMetrics.putRecall("q133_semdedup",
        if (nExact == 0L) 1.0 else nWithinS.toDouble / nExact)
      Seq((nVec, nExact, nOutside == 0L,
          nExact == 0L || nWithinS.toDouble / nExact >= 0.5,
          nDropped <= nWithin))
        .toDF("n_vectors", "n_exact_pairs", "pairs_subset", "recall_ok",
          "drop_valid")
    })
  )

  private val pairOracle =
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |    for i in range(1, len(toks)-1)]) AS sh
      |  FROM t WHERE len(toks) >= 3
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThr""".stripMargin

  /** q184's span extraction over any (doc_id, text) frame — split out
    * so DedupSpec pins the island semantics (one maximal span per
    * matching run, gaps break runs, within-doc repeats live on
    * separate diagonals) on crafted documents. Returns one row per
    * MAXIMAL shared span: (a_id, b_id, diag, isl, span_len, a_start) —
    * the span covers tokens [a_start, a_start+span_len) in doc a and
    * [a_start+diag, +span_len) in doc b (q185 turns these into
    * per-doc interval unions; positions are engine-local 0/1-based
    * but every emitted quantity is shift-invariant). */
  /** q254's verified pair table over a (doc_id, text) frame:
    * candidates = pairs sharing at least one 4-gram whose DOCUMENT
    * frequency is <= 50 (boilerplate grams pair everything with
    * everything and carry no signal), verdict = one Levenshtein call
    * per candidate, kept when <= maxDist. The gram inventory is
    * per-doc DISTINCT, so candidate volume is bounded by Σ df² over
    * kept grams — never |docs|². Split out so DedupSpec pins the
    * metric (a one-token substitution scores the token's edit cost,
    * a reorder scores both) and the blocking guarantee on planted
    * pairs. */
  private[graft] def editDistanceDedup(docs0: DataFrame, maxDist: Int)
      : DataFrame = {
    // spreadInput: the 4-gram zip/explode kernel and the inventory
    // checkpoint otherwise run on the single-split scan's one core
    val docs = graft.Util.spreadInput(docs0)
    val toks = split(lower(trim(col("text"))), "\\s+")
    val parts = (0 until 4).map(i =>
      slice(toks, lit(i + 1), size(toks) - 3))
    val zipped = parts.reduceLeft((a, b) =>
      zip_with(a, b, (x, y) => concat_ws(" ", x, y)))
    // localCheckpoint: the inventory feeds the df cap AND both join
    // sides (the q184 lesson — lazy, Spark re-derives it per consumer)
    val g4 = docs.filter(size(toks) >= 4)
      .select(col("doc_id"), explode(array_distinct(zipped)).as("g"))
      .localCheckpoint(true)
    val kept = g4.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50).select("g")
    val gk = g4.join(kept, "g")
    val cand = bucketPairs(gk, Seq("g")).distinct()
    val t = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))
    cand
      .join(t.select(col("doc_id").as("a_id"), col("text").as("ta"),
        col("len").as("la")), "a_id")
      .join(t.select(col("doc_id").as("b_id"), col("text").as("tb"),
        col("len").as("lb")), "b_id")
      // two result-preserving prunes on the O(len²) kernel:
      // (1) edit distance ≥ |len(a) − len(b)|, so a length gap past
      //     the threshold disqualifies BEFORE any DP runs — on the
      //     small-vocab corpus this cuts candidates ~10× (spurious
      //     4-gram collisions pair docs of arbitrary length);
      // (2) the banded DP (threshold arg): O(maxDist·len) per
      //     surviving pair instead of O(len²), −1 past the band —
      //     exact for every pair the filter keeps.
      .filter(abs(col("la") - col("lb")) <= maxDist)
      .select(col("a_id"), col("b_id"),
        levenshtein(col("ta"), col("tb"), maxDist).as("edit_dist"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .orderBy("a_id", "b_id")
  }

  private[graft] def substringSpans(docs: DataFrame, cap: Int)
      : DataFrame = {
    // r13: the 4-gram stream is built NARROW from the token array
    // (transform + posexplode) instead of posexplode + a doc_id
    // window with three leads — the window shuffled AND sorted the
    // full |docs|x|tokens| token stream just to look 3 rows ahead,
    // and at the 1M-doc harness point that exchange+sort was the
    // dominant cost (guide §2.4 "remove shuffles outright"). Rows
    // (doc_id, pos, g) are identical: posexplode over the gram array
    // yields the same 0-based start position the old filter kept.
    // spreadInput: the single-row-group scan otherwise runs the whole
    // tokenize+gram kernel on one core (§2.5).
    // localCheckpoint is load-bearing: the gram stream feeds the df
    // cap AND both self-join sides — left lazy, Spark re-derives it
    // once per consumer, and the executed q184 plan read the
    // documents parquet FOUR times. One materialization, every
    // consumer reads the cached partitions.
    val grams = graft.Util.spreadInput(
        docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 4)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(ts) - 4), i -> " +
          "concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3]))"))
        .as(Seq("pos", "g")))
      .localCheckpoint(true)
    val kept = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap).select("g")
    val gk = grams.join(kept, "g")
    val m = gk.select(col("g"), col("doc_id").as("a_id"),
        col("pos").as("ap"))
      .join(gk.select(col("g"), col("doc_id").as("b_id"),
        col("pos").as("bp")), Seq("g"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("diag", col("bp") - col("ap"))
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id", "b_id", "diag")
      .orderBy(col("ap").asc)
    m.withColumn("isl", col("ap") - row_number().over(iw))
      .groupBy("a_id", "b_id", "diag", "isl")
      .agg((count(lit(1)) + 3).as("span_len"),
        min(col("ap")).as("a_start"))
  }

  /** q185's per-doc duplicated-token mass: every qualifying shared
    * span contributes its interval on BOTH pair sides, intervals are
    * deduped (identical ones are redundant for a union — and the
    * dedup makes (st, en) a total per-doc order, keeping the sweep's
    * two window passes tie-order free), then unioned by the classic
    * sweep: sorted by start, an interval whose start exceeds the
    * running max end opens a new island; union length = Σ per-island
    * max(end) − min(start) — overlaps counted ONCE. Split out so
    * DedupSpec pins the overlap semantics on crafted docs. */
  private[graft] def dupTokensPerDoc(docs: DataFrame, cap: Int,
      minSpan: Int): DataFrame = {
    // the span table is pair-count-sized (tiny next to the gram
    // stream) and feeds BOTH interval sides — checkpoint it so the
    // whole gram join doesn't run twice
    val s8 = substringSpans(docs, cap).filter(col("span_len") >= minSpan)
      .localCheckpoint(true)
    val iv = s8.select(col("a_id").as("doc_id"),
        col("a_start").as("st"),
        (col("a_start") + col("span_len")).as("en"))
      .unionByName(s8.select(col("b_id").as("doc_id"),
        (col("a_start") + col("diag")).as("st"),
        (col("a_start") + col("diag") + col("span_len")).as("en")))
      .distinct()
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("doc_id").orderBy(col("st").asc, col("en").asc)
    iv
      .withColumn("runmax",
        max("en").over(w.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("new_isl",
        when(col("runmax").isNull || col("st") > col("runmax"), 1L)
          .otherwise(0L))
      .withColumn("isl", sum("new_isl")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy("doc_id", "isl")
      .agg((max("en") - min("st")).as("cov"))
      .groupBy("doc_id").agg(sum("cov").as("dup_tokens"))
  }

  val oracles: Map[String, String] = Map(
    // q303: the dirty copy, the block join and the weights replay
    // verbatim; cents ride round(bal·100) exactly like the Spark side
    "q303_record_linkage" ->
      """WITH a AS (
        |  SELECT c_custkey AS k, c_name AS name, c_nationkey AS nat,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer
        |), b AS (
        |  SELECT k AS bk,
        |    CASE WHEN k % 10 < 3
        |      THEN name[1:16] || name[18:18] || name[17:17]
        |      ELSE name END AS bname,
        |    nat AS bnat,
        |    CASE WHEN k % 5 = 0 THEN cents + 1 ELSE cents END AS bcents
        |  FROM a WHERE k % 7 <> 0
        |), cand AS (
        |  SELECT a.k, b.bk,
        |    (CASE WHEN a.name = b.bname THEN 3 ELSE -1 END
        |     + CASE WHEN a.cents = b.bcents THEN 2 ELSE -1 END)
        |      AS score
        |  FROM a JOIN b ON a.nat = b.bnat
        |    AND a.name[1:16] = b.bname[1:16]
        |), agg AS (
        |  SELECT count(*)::BIGINT AS n_candidates,
        |    CAST(sum(CASE WHEN k = bk THEN 1 ELSE 0 END) AS BIGINT)
        |      AS true_pairs,
        |    CAST(sum(CASE WHEN score >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_matched,
        |    CAST(sum(CASE WHEN score >= 2 AND k = bk THEN 1 ELSE 0 END)
        |      AS BIGINT) AS matched_true
        |  FROM cand
        |)
        |SELECT n_candidates, true_pairs, n_matched, matched_true,
        |  true_pairs - matched_true AS false_negatives,
        |  round(matched_true::DOUBLE / n_matched, 6) AS precision,
        |  round(matched_true::DOUBLE / true_pairs, 6) AS recall
        |FROM agg""".stripMargin,

    "q44_dedup_exact" ->
      """WITH g AS (
        |  SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS canonical_id,
        |    count(*) AS copies
        |  FROM documents GROUP BY 1
        |)
        |SELECT copies, count(*) AS groups, min(canonical_id) AS first_canonical
        |FROM g GROUP BY copies""".stripMargin,
    "q45_ngram_jaccard" -> pairOracle,
    // q275: the q45 pair set × the q105 split rule, cells canonicalized
    // by (least, greatest) so orientation can't split a cell
    "q275_split_leakage" ->
      s"""WITH pr AS ($pairOracle),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN u < 0.8 THEN 'train'
        |         WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |  FROM (
        |    SELECT doc_id,
        |      ('0x' || md5(lower(trim(text)))[1:8])::BIGINT
        |        / 4294967296.0 AS u
        |    FROM documents)
        |)
        |SELECT least(sa.split, sb.split) AS split_lo,
        |  greatest(sa.split, sb.split) AS split_hi,
        |  count(*)::BIGINT AS n_pairs,
        |  least(sa.split, sb.split) <> greatest(sa.split, sb.split)
        |    AS leaky
        |FROM pr
        |JOIN sp sa ON sa.doc_id = pr.a_id
        |JOIN sp sb ON sb.doc_id = pr.b_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // q254: identical candidate rule (per-doc-distinct 4-grams,
    // document frequency <= 50) + the same published unit-cost metric
    "q254_edit_distance_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
        |  FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
        |), kept AS (
        |  SELECT g FROM (SELECT g, count(*) AS df FROM g GROUP BY 1)
        |  WHERE df <= 50
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM g a JOIN g b USING (g) JOIN kept USING (g)
        |  WHERE a.doc_id < b.doc_id
        |)
        |SELECT a_id, b_id, edit_dist FROM (
        |  SELECT a_id, b_id,
        |    levenshtein(ta.text, tb.text)::INT AS edit_dist
        |  FROM cand
        |  JOIN documents ta ON ta.doc_id = cand.a_id
        |  JOIN documents tb ON tb.doc_id = cand.b_id
        |) WHERE edit_dist <= 30
        |ORDER BY a_id, b_id""".stripMargin,
    // positions are 1-based here and 0-based in Spark, but diagonals
    // (bp-ap) and island keys (ap - row_number) are shift-invariant
    // and no position reaches the output — only span lengths do
    "q184_substring_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i AS pos,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
        |  FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
        |), kept AS (
        |  SELECT g FROM (SELECT g, count(*) AS df FROM g GROUP BY 1)
        |  WHERE df <= 50
        |), m AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS ap,
        |    b.pos AS bp
        |  FROM g a JOIN g b USING (g) JOIN kept USING (g)
        |  WHERE a.doc_id < b.doc_id
        |), isl AS (
        |  SELECT a_id, b_id, bp - ap AS diag, ap,
        |    ap - row_number()
        |      OVER (PARTITION BY a_id, b_id, bp - ap ORDER BY ap) AS isl
        |  FROM m
        |), s AS (
        |  SELECT a_id, b_id, count(*) + 3 AS span_len
        |  FROM isl GROUP BY a_id, b_id, diag, isl
        |)
        |SELECT a_id, b_id, max(span_len) AS max_span,
        |  count(*) AS n_spans,
        |  CAST(sum(CASE WHEN span_len >= 8 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS spans_ge8
        |FROM s GROUP BY a_id, b_id HAVING max(span_len) >= 8""".stripMargin,
    "q185_span_removal" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i AS pos,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS g
        |  FROM toks, unnest(range(1, len(t) - 2)) AS u(i)
        |), kept AS (
        |  SELECT g FROM (SELECT g, count(*) AS df FROM g GROUP BY 1)
        |  WHERE df <= 50
        |), m AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS ap,
        |    b.pos AS bp
        |  FROM g a JOIN g b USING (g) JOIN kept USING (g)
        |  WHERE a.doc_id < b.doc_id
        |), mi AS (
        |  SELECT a_id, b_id, bp - ap AS diag, ap,
        |    ap - row_number()
        |      OVER (PARTITION BY a_id, b_id, bp - ap ORDER BY ap) AS isl
        |  FROM m
        |), s AS (
        |  SELECT a_id, b_id, diag, min(ap) AS a_start,
        |    count(*) + 3 AS span_len
        |  FROM mi GROUP BY a_id, b_id, diag, isl
        |), s8 AS (SELECT * FROM s WHERE span_len >= 8
        |), iv AS (
        |  -- UNION (not ALL): duplicate intervals would make the
        |  -- sweep's ORDER BY (st, en) non-total and its two window
        |  -- passes tie-order sensitive
        |  SELECT a_id AS doc_id, a_start AS st,
        |    a_start + span_len AS en FROM s8
        |  UNION
        |  SELECT b_id, a_start + diag, a_start + diag + span_len FROM s8
        |), marked AS (
        |  SELECT doc_id, st, en,
        |    max(en) OVER (PARTITION BY doc_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |  FROM iv
        |), isl2 AS (
        |  SELECT doc_id, st, en,
        |    sum(CASE WHEN runmax IS NULL OR st > runmax THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        |  FROM marked
        |), u AS (
        |  SELECT doc_id, isl, max(en) - min(st) AS cov
        |  FROM isl2 GROUP BY 1, 2
        |), per_doc AS (
        |  SELECT doc_id, CAST(sum(cov) AS BIGINT) AS dup_tokens
        |  FROM u GROUP BY 1
        |), tk AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens
        |  FROM documents
        |)
        |SELECT source, count(*) AS docs_affected,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens,
        |  round(sum(dup_tokens)::DOUBLE / sum(n_tokens), 6) AS dup_frac
        |FROM tk JOIN per_doc USING (doc_id) GROUP BY source""".stripMargin,
    "q142_fuzzy_join" ->
      """WITH names AS (
        |  SELECT p_name AS name, count(*) AS cnt FROM part GROUP BY 1
        |), t AS (
        |  SELECT name, cnt, unnest(string_split(name, ' ')) AS tok
        |  FROM names
        |), cross_pairs AS (
        |  SELECT DISTINCT a.name AS a_name, b.name AS b_name,
        |    a.cnt AS a_cnt, b.cnt AS b_cnt
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.name < b.name
        |), v AS (
        |  SELECT levenshtein(a_name, b_name) AS d,
        |    a_cnt * b_cnt AS id_pairs
        |  FROM cross_pairs WHERE levenshtein(a_name, b_name) <= 4
        |  UNION ALL
        |  SELECT 0 AS d, cnt * (cnt - 1) // 2 AS id_pairs
        |  FROM names WHERE cnt >= 2
        |)
        |SELECT d, count(*) AS n_name_pairs,
        |  sum(id_pairs)::BIGINT AS n_id_pairs
        |FROM v GROUP BY d""".stripMargin,
    "q127_containment" ->
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    for i in range(1, len(toks)-1)]) AS sh
        |  FROM t WHERE len(toks) >= 3
        |)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh), 6)
        |    AS containment
        |FROM s a JOIN s b ON a.doc_id <> b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh)
        |  >= $ContainThr""".stripMargin,
    "q131_source_overlap" ->
      """WITH t AS (
        |  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT source,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      for i in range(1, len(toks)-1)]) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sz AS (
        |  SELECT source, count(*) AS n FROM sh GROUP BY 1
        |), iv AS (
        |  SELECT a.source AS sa, b.source AS sb, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT sa, sb, inter,
        |  round(inter::DOUBLE / (za.n + zb.n - inter), 6) AS jaccard
        |FROM iv JOIN sz za ON za.source = iv.sa
        |        JOIN sz zb ON zb.source = iv.sb""".stripMargin,
    "q46_minhash_lsh" -> pairOracle,
    // the equivalence gate: missed/extra MUST be zero (pigeonhole
    // exactness), n_docs is the genuine cross-engine count
    "q47_simhash" ->
      """SELECT true AS blocked_eq_brute, CAST(0 AS BIGINT) AS missed,
        |  CAST(0 AS BIGINT) AS extra, count(*) AS n_docs
        |FROM documents""".stripMargin,
    "q56_jaccard_ppjoin" -> pairOracle,
    // transitive closure over the near-dup pairs: min reachable id per
    // node == the HashMin fixpoint label
    "q65_dup_clusters" ->
      s"""WITH RECURSIVE p AS ($pairOracle),
        |edges AS (SELECT a_id AS s, b_id AS t FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |reach(s, t) AS (SELECT s, t FROM edges
        |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        |lbl AS (SELECT s AS id, least(s, min(t)) AS cluster_id
        |        FROM reach GROUP BY s)
        |SELECT cluster_id, count(*) AS size, max(id) AS max_member
        |FROM lbl GROUP BY cluster_id""".stripMargin,
    // q239: the same exact pair join, classified by source cell
    "q239_dup_source_matrix" ->
      s"""WITH p AS ($pairOracle),
        |m AS (SELECT doc_id, source FROM documents)
        |SELECT least(sa.source, sb.source) AS src_lo,
        |  greatest(sa.source, sb.source) AS src_hi,
        |  (sa.source <> sb.source) AS cross_source,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM p JOIN m sa ON p.a_id = sa.doc_id
        |  JOIN m sb ON p.b_id = sb.doc_id
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,

    // q240: q65's recursive components + the token-mass algebra
    "q240_dedup_yield" ->
      s"""WITH RECURSIVE p AS ($pairOracle),
        |edges AS (SELECT a_id AS s, b_id AS t FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |reach(s, t) AS (SELECT s, t FROM edges
        |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        |lbl AS (SELECT s AS id, least(s, min(t)) AS cluster_id
        |        FROM reach GROUP BY s),
        |tk AS (SELECT doc_id, CAST(len(string_split_regex(
        |    lower(trim(text)), '\\s+')) AS BIGINT) AS nt
        |  FROM documents),
        |tot AS (SELECT count(*)::BIGINT AS n,
        |  CAST(sum(nt) AS BIGINT) AS t FROM tk),
        |rem AS (
        |  SELECT count(*)::BIGINT AS n,
        |    CAST(coalesce(sum(nt), 0) AS BIGINT) AS t
        |  FROM lbl JOIN tk ON lbl.id = tk.doc_id
        |  WHERE id <> cluster_id
        |), cl AS (
        |  SELECT count(DISTINCT cluster_id)::BIGINT AS c FROM lbl)
        |SELECT tot.n AS n_docs, tot.t AS tokens_total,
        |  cl.c AS n_dup_clusters, rem.n AS docs_removed,
        |  rem.t AS tokens_saved,
        |  round(rem.n::DOUBLE / tot.n, 6) AS pct_docs_removed,
        |  round(rem.t::DOUBLE / tot.t, 6) AS pct_tokens_saved
        |FROM tot, rem, cl""".stripMargin,

    "q88_incremental_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS fp,
        |    string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, fp,
        |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      for i in range(1, len(toks)-1)]) AS sh
        |  FROM t
        |), newb AS (SELECT * FROM sh WHERE doc_id % 10 = 0),
        |corpus AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
        |ex AS (SELECT DISTINCT n.doc_id FROM newb n JOIN corpus c
        |       ON n.fp = c.fp),
        |nr AS (SELECT DISTINCT n.doc_id FROM newb n JOIN corpus c
        |  -- the len>0 guards mirror Spark's NULL-on-0/0 divide (DuckDB
        |  -- yields NaN and NaN >= x is TRUE): empty-shingle docs are
        |  -- never near-dups
        |  ON len(n.sh) > 0 AND len(c.sh) > 0
        |  AND len(list_intersect(n.sh, c.sh))::DOUBLE
        |     / (len(n.sh) + len(c.sh) - len(list_intersect(n.sh, c.sh)))
        |     >= 0.8)
        |SELECT n.doc_id,
        |  CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
        |       WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
        |       ELSE 'kept' END AS status
        |FROM newb n
        |LEFT JOIN ex ON n.doc_id = ex.doc_id
        |LEFT JOIN nr ON n.doc_id = nr.doc_id""".stripMargin,
    "q89_lsh_index_probe" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      for i in range(1, len(toks)-1)]) AS sh
        |  FROM t
        |)
        |SELECT n.doc_id AS n_id, c.doc_id AS c_id,
        |  round(len(list_intersect(n.sh, c.sh))::DOUBLE
        |    / (len(n.sh) + len(c.sh) - len(list_intersect(n.sh, c.sh))), 6)
        |    AS jaccard
        |FROM sh n JOIN sh c
        |  ON n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        |  -- len>0 guards mirror Spark's NULL-on-0/0 divide (DuckDB NaN
        |  -- would compare >= threshold as TRUE)
        |  AND len(n.sh) > 0 AND len(c.sh) > 0
        |  AND len(list_intersect(n.sh, c.sh))::DOUBLE
        |    / (len(n.sh) + len(c.sh) - len(list_intersect(n.sh, c.sh))) >= 0.8""".stripMargin,
    "q79_vocab_topk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      for i in range(1, len(toks)-1)]) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |)
        |SELECT shingle, count(*) AS df FROM g GROUP BY shingle
        |ORDER BY df DESC, shingle LIMIT 100""".stripMargin,
    "q71_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    for i in range(1, len(toks)-1)]) AS g
        |  FROM t WHERE len(toks) >= 3
        |)
        |SELECT doc_id, count(*) AS total_3grams,
        |  count(DISTINCT g) AS distinct_3grams,
        |  round(1.0 - count(DISTINCT g)::DOUBLE / count(*), 6) AS dup_ratio
        |FROM g GROUP BY doc_id""".stripMargin,
    "q107_dup_spans" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |      || ' ' || toks[i+3] || ' ' || toks[i+4]
        |    for i in range(1, len(toks)-3)]) AS g
        |  FROM t WHERE len(toks) >= 5
        |), sh AS (
        |  SELECT g FROM (
        |    SELECT g, count(DISTINCT doc_id) AS nd FROM gr GROUP BY g)
        |  WHERE nd >= 2
        |), pd AS (
        |  SELECT doc_id, count(*) AS n_grams FROM gr GROUP BY doc_id
        |), dp AS (
        |  SELECT doc_id, count(*) AS dup_positions
        |  FROM gr JOIN sh USING (g) GROUP BY doc_id
        |)
        |SELECT doc_id, n_grams,
        |  COALESCE(dup_positions, 0) AS dup_positions,
        |  round(COALESCE(dup_positions, 0)::DOUBLE / n_grams, 6) AS dup_ratio
        |FROM pd LEFT JOIN dp USING (doc_id)""".stripMargin,
    "q72_training_set" ->
      s"""WITH RECURSIVE p AS ($pairOracle),
        |edges AS (SELECT a_id AS s, b_id AS t FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |reach(s, t) AS (SELECT s, t FROM edges
        |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        |lbl AS (SELECT s AS id, least(s, min(t)) AS cluster_id
        |        FROM reach GROUP BY s),
        |qual AS (${TextOps.oracles("q41_quality_score")}),
        |lang AS (${TextOps.oracles("q42_lang_id")}),
        |k AS (SELECT lbl.id, row_number() OVER (PARTITION BY lbl.cluster_id
        |    ORDER BY qual.quality DESC, lbl.id ASC) AS rk
        |  FROM lbl JOIN qual ON lbl.id = qual.doc_id),
        |dropped AS (SELECT id FROM k WHERE rk > 1)
        |SELECT lang.lang_pred, count(*) AS kept,
        |  round(CAST(sum(CAST(qual.quality AS DECIMAL(18,6))) AS DOUBLE)
        |    / count(*), 6) AS avg_quality,
        |  min(qual.doc_id) AS first_doc
        |FROM qual JOIN lang ON qual.doc_id = lang.doc_id
        |WHERE qual.quality >= 0.5
        |  AND qual.doc_id NOT IN (SELECT id FROM dropped)
        |GROUP BY lang.lang_pred""".stripMargin,
    "q66_dedup_keep_best" ->
      s"""WITH RECURSIVE p AS ($pairOracle),
        |edges AS (SELECT a_id AS s, b_id AS t FROM p
        |          UNION ALL SELECT b_id, a_id FROM p),
        |reach(s, t) AS (SELECT s, t FROM edges
        |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        |lbl AS (SELECT s AS id, least(s, min(t)) AS cluster_id
        |        FROM reach GROUP BY s),
        |qual AS (${TextOps.oracles("q41_quality_score")}),
        |ranked AS (SELECT lbl.cluster_id, lbl.id, qual.quality,
        |  row_number() OVER (PARTITION BY lbl.cluster_id
        |    ORDER BY qual.quality DESC, lbl.id ASC) AS rk
        |  FROM lbl JOIN qual ON lbl.id = qual.doc_id)
        |SELECT cluster_id, id AS keeper_id, quality AS keeper_quality
        |FROM ranked WHERE rk = 1""".stripMargin,
    "q49_embed_dup_ivf" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin,
    "q48_embed_cosine_dup" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin,
    // n_vectors and the exact pair count are brute-recomputed; the
    // clustering-dependent values surface only as invariants that are
    // true for ANY valid clustering (subset/recall/drop-validity).
    // The exact side runs on the SAME deterministic md5-ordered
    // BruteGateN-vector sample as the Spark gate (whole table at
    // sf<=0.01) so the quadratic check stays fixed-cost at any corpus
    // size — the LIMIT interpolates the shared constant so the two
    // sample sets can never silently desynchronize.
    "q133_semdedup" ->
      s"""WITH s AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $BruteGateN
        |)
        |SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
        |  count(*) AS n_exact_pairs, true AS pairs_subset,
        |  true AS recall_ok, true AS drop_valid
        |FROM s a JOIN s b
        |  ON a.vec_id < b.vec_id
        | AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |     CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin
  )
}
