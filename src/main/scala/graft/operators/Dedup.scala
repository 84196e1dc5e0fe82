package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Corpus-deduplication operators for training-data pipelines, from exact
  * to fuzzy:
  *
  *   - exact: content-fingerprint groupBy (one shuffle on the hash key);
  *   - n-gram Jaccard: exact set similarity via a shingle inverted index —
  *     the posting-list self-join only compares documents that share a
  *     shingle, so cost is Σ_shingle |postings|² instead of |docs|²;
  *   - MinHash + LSH: sketch each doc to k minhashes, band them, and only
  *     compare within buckets — the 100 TB path (sketches are ~k·8 bytes
  *     per doc regardless of doc size, and the band join shuffles sketches,
  *     not text);
  *   - SimHash: 64-bit near-dup signature, hamming-bucket candidates;
  *   - embedding near-dup: cosine threshold over vector pairs.
  *
  * All hashing is xxhash64 (Spark-native, codegen'd, deterministic across
  * executors) except where the DuckDB oracle needs to reproduce it (md5).
  */
object Dedup {

  /** Measurement-only (r22): dump a driver-loop ROUND's physical plan when
    * `SPARK_GRAFT_ROUND_PLAN_DIR` is set. The per-round shape of the
    * iterative operators is otherwise invisible to plan tooling (each
    * round's lineage is truncated by `localCheckpoint`, and the returned
    * plan is just the final labels read) — this is the committed-evidence
    * hook for the `plans/rNN` optimization deliverables, mirroring Bench's
    * `SPARK_GRAFT_EXPLAIN_DIR`. Zero cost when the variable is unset. */
  private[operators] def dumpRoundPlan(tag: String, df: DataFrame): Unit =
    sys.env.get("SPARK_GRAFT_ROUND_PLAN_DIR").foreach { d =>
      try {
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(d, tag + ".txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Exact dedup: first-wins by (fingerprint, orderCol) — the scalable
    * version of the reference's `seen`-set (src/etl/load.py:107-114).
    * Returns the surviving rows only. */
  def exactDedup(docs: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    docs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Distributed connected components over an undirected candidate-pair
    * edge list — the CLUSTERING step a production dedup pipeline runs
    * after MinHash/Jaccard pair generation: near-dup similarity is not
    * transitive, so keep-one-per-PAIR semantics would drop too much or too
    * little; the standard policy is one representative per connected
    * component of the similarity graph.
    *
    * Algorithm: iterative min-label propagation. Every node starts
    * labelled with itself; each round every node takes the minimum of its
    * own label and its neighbors' labels, until a fixpoint. Rounds =
    * component diameter; near-dup clusters are dense (diameter ~2-3), so
    * a handful of rounds suffice even at 100 TB. Each round is one
    * shuffle join (edges ⋈ labels on the neighbor id) + one min-combine
    * aggregation (map-side combinable); the driver's only action per
    * round is a `limit(1).count` convergence probe. Each round's labels
    * are `localCheckpoint`ed — iteration under a driver loop MUST
    * truncate lineage, or the logical plan nests one level per round and
    * planning (AQE's plan re-explain in particular) blows up
    * exponentially long before the data does. On a cluster where
    * executor loss matters, swap in reliable `checkpoint` with a
    * checkpoint dir — same plan shape. For adversarial long-chain graphs
    * the O(log²n)-round large-star/small-star variant (Kiveris et al.,
    * SoCC'14) drops in behind the same signature.
    *
    * Output: (node, cluster_id) for every NON-NULL node that appears in
    * an edge (a half-null edge never propagates labels but its real
    * endpoint survives as a singleton; self-loops yield singletons too —
    * connectedComponentsStars shares this exact contract), cluster_id =
    * the minimum node id of its component. All-integer arithmetic —
    * bit-exact on any engine (oracle: q36's recursive CTE).
    */
  def connectedComponents(
      edges: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 50): DataFrame = {
    // shared edge contract with connectedComponentsStars: a NULL endpoint
    // never propagates labels (the half-null edge is broken), but its
    // non-null partner still EXISTS — it surfaces as a singleton;
    // self-loops likewise contribute their node as a singleton component.
    // The input is checkpointed ONCE so the (often expensive) upstream
    // pair generation is not re-evaluated for the node census.
    val base = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val sym = base
      .union(base.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    // r21: the node census and the FIRST propagation round are one
    // aggregation — labels₀(v) = min(v, Γ(v)) instead of v. Min-label
    // propagation is monotone and converges to the component minimum from
    // any node-dominated start (labels₀ ≤ v and ≥ the component min), so
    // the fixpoint — and the "one full no-change round" convergence
    // criterion — is unchanged while every multi-round graph saves one
    // whole iteration (join over sym + agg + checkpoint + probe). Nodes
    // appearing only in half-null edges are absent from `sym` but present
    // in the census branches, so they still surface as singletons.
    var labels = base.select(col("src").as("node"))
      .union(base.select(col("dst").as("node")))
      .filter(col("node").isNotNull)
      .select(col("node"), col("node").as("cluster_id"))
      .union(sym.select(col("src").as("node"), col("dst").as("cluster_id")))
      .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
      .localCheckpoint(true)
    base.unpersist() // sym and the initial labels are both materialized
    // convergence probe: the node set is FIXED across rounds (every round
    // unions the previous labels back in and groupBys per node), so
    // "no label changed" ⇔ the (order-independent) Σ xxhash64(node, label)
    // signature is unchanged — ONE tiny aggregate over the just-
    // materialized checkpoint instead of the previous join + limit +
    // count probe job per round (same deterministic-signature contract,
    // including the ≪2⁻⁶⁰ false-stop bound, as connectedComponentsStars;
    // labels also only ever DECREASE, so a changed round can only hash
    // equal through a collision).
    def labelSig(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(
        sum(xxhash64(col("node"), col("cluster_id")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var sig = labelSig(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborLabels = sym
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("cluster_id"))
      val round = labels.unionByName(neighborLabels)
        .groupBy(col("node")).agg(min(col("cluster_id")).as("cluster_id"))
      if (i == 0) dumpRoundPlan("cc_round1", round)
      val updated = round.localCheckpoint(true)
      val nextSig = labelSig(updated)
      labels.unpersist()
      labels = updated
      converged = nextSig == sig
      sig = nextSig
      i += 1
    }
    sym.unpersist()
    // unconverged labels are NOT component ids — downstream representatives
    // would silently mis-dedup, so exhausting maxIter is an error
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: not converged after $maxIter rounds " +
        "(component diameter exceeds maxIter — raise it, or use " +
        "connectedComponentsStars for long-chain graphs)")
    labels
  }

  /** Connected components via alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the drop-in for `connectedComponents` when the similarity
    * graph can be adversarial: a path/chain component of length D costs
    * min-label propagation D rounds (label moves one hop per join), but
    * star contraction squares progress each round and converges in
    * O(log D) rounds. Same contract: (node, cluster_id = component min).
    *
    * Per round, each node u with neighborhood Γ(u) and m = min(Γ(u)∪{u}):
    *  - large-star rewires every neighbor LARGER than u to m,
    *  - small-star rewires every neighbor ≤ u (and u itself) to m.
    * Both emit strictly larger→smaller edges, so the edge set is a forest
    * of partial stars that monotonically contracts; at the fixpoint every
    * node points directly at its component minimum. Each half-round is one
    * window-min over the src-partitioned edge frame (one exchange — the
    * r21 groupBy(min)+equi-join spelling paid an extra aggregate, a join,
    * and a duplicate subtree evaluation for the same result; see the
    * half-round comments) and every round `localCheckpoint`s (same lineage
    * trap as `connectedComponents`). The fixpoint probe compares the
    * (count, Σ xxhash64) signature of consecutive edge sets: all-integer
    * and deterministic, with a vanishing (≪2⁻⁶⁰ per round) false-stop
    * probability; the paired spec cross-checks labels against the
    * min-label implementation exactly. */
  def connectedComponentsStars(
      edges: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIter: Int = 50): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    // r22 (guide §2.4): both half-rounds compute "min(dst) over each src's
    // neighborhood" and attach it back to every neighborhood row. The r21
    // spelling was groupBy(min) + equi-join — per half-round that is one
    // aggregate, one broadcast/shuffle JOIN (a separate broadcast-build job
    // per round at bench scale, an extra shuffle at cluster scale), and two
    // evaluations of the input subtree. A window min over the SAME
    // partitioning key is one pass: the exchange on src is established
    // once, the min rides the window buffer, and no join or second subtree
    // evaluation exists. (A sort-merge join at scale would have sorted the
    // frame by src anyway, so the window's sort is not new work — the
    // aggregate, the join, and the duplicate leg are what disappear.)
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      // NOTE (r21, still true in the window spelling): the distinct()
      // collapses the per-edge output (heavy same-(dst, min) duplication
      // in dense components) back to a near-node-sized set BEFORE the
      // next half-round re-consumes it; an r21 probe of the no-distinct
      // variant measured no improvement and lost the shared Exchange.
      // r22: the distinct is fed through ONE exchange keyed on the NEW
      // src — HashPartitioning(src) satisfies the distinct's
      // ClusteredDistribution(src, dst) (same-key rows stay co-located
      // under the coarser key) AND small-star's window partitioning, so
      // the half-round boundary costs one shuffle instead of two
      // (hash(src,dst) for the distinct + hash(src) for the window).
      s.withColumn("mn", min(col("dst")).over(Window.partitionBy(col("src"))))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), least(col("mn"), col("src")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .repartition(col("src"))
        .distinct()
    }
    // r22: smallStar is only ever applied to largeStar's output, whose
    // rows are ALL strictly larger→smaller oriented (largeStar emits
    // (dst, least(mn, src)) with dst > src ≥ least(mn, src) and filters
    // src =!= dst). On such input the general small-star's
    // sym(d).filter(dst < src) is the IDENTITY: every original row keeps
    // dst < src, every flipped row has dst > src and is dropped. The
    // general spelling therefore evaluated the whole largeStar subtree
    // TWICE per round (union branches share exchanges but re-run the
    // final distinct aggregate) and pushed 2|E| rows through the filter
    // to keep |E| — this specialization consumes the input once, as-is.
    // The (src → mn) self-edges the old `.union(mins…)` branch emitted
    // once per distinct src are emitted here once per EDGE via the
    // explode; the trailing distinct() collapses them identically (its
    // partial aggregate removes the duplicates map-side).
    def smallStarOriented(d: DataFrame): DataFrame =
      d.withColumn("mn", min(col("dst")).over(Window.partitionBy(col("src"))))
        .select(explode(array(col("dst"), col("src"))).as("src"), col("mn").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal sum: overflow-free under ANSI mode, order-independent
      val r = e.agg(
        count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("h"))
        .head()
      (r.getLong(0), r.getDecimal(1))
    }
    // same edge contract as connectedComponents: half-null edges never
    // contract but their real endpoint survives as a singleton, and
    // self-loop-only nodes surface as singleton components. The input is
    // checkpointed ONCE so the node census does not re-evaluate the
    // (often expensive) upstream pair generation; the tiny node list is
    // itself checkpointed because it rides into the RETURNED plan.
    val base = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val allNodes = base.select(col("src").as("node"))
      .unionByName(base.select(col("dst").as("node")))
      .filter(col("node").isNotNull).distinct()
      .localCheckpoint(true)
    var cur = base
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .localCheckpoint(true)
    base.unpersist() // allNodes and the round-0 edges are materialized
    var sig = signature(cur)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val round = smallStarOriented(largeStar(cur))
      if (i == 0) dumpRoundPlan("stars_round1", round)
      val next = round.localCheckpoint(true)
      val nextSig = signature(next)
      cur.unpersist()
      cur = next
      converged = nextSig == sig
      sig = nextSig
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStars: not converged after $maxIter rounds; " +
        "raise maxIter (star contraction needs O(log diameter) rounds)")
    val roots = cur.select(col("dst")).distinct()
      .join(cur.select(col("src").as("dst")).distinct(), Seq("dst"), "left_anti")
    val labeled = cur.select(col("src").as("node"), col("dst").as("cluster_id"))
      .unionByName(roots.select(col("dst").as("node"), col("dst").as("cluster_id")))
      .distinct()
    // nodes that appeared ONLY in self-loops have no contracted edge —
    // they are their own singleton components, exactly as in the
    // min-label implementation
    labeled.unionByName(
      allNodes.join(labeled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("cluster_id")))
  }

  /** Keep one representative document per near-dup cluster: the row whose
    * id equals its component's cluster_id (= the component's minimum id),
    * plus every document that appears in no candidate pair. This is the
    * final SELECT of the dedup pipeline — pairs → components →
    * representatives — and is a broadcast-friendly anti-join at scale: the
    * dropped-id set is one row per NON-representative clustered doc,
    * tiny relative to the corpus. */
  def representatives(
      docs: DataFrame,
      components: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val dropped = components.filter(col("node") =!= col("cluster_id"))
      .select(col("node").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** Exact pairwise word-n-gram Jaccard over an inverted shingle index.
    * Output: (a, b, n_common, jaccard) for pairs with jaccard >= minJaccard,
    * a < b. Deterministic integer-ratio doubles.
    *
    * Plan shape: one shuffle builds sorted posting lists per shingle;
    * candidate pairs are generated from each posting with array
    * combinatorics, and the per-doc set sizes fall out of the same posting
    * frame (exchange reuse ⇒ the shingle construction runs once, vs four
    * Generate subtrees in the naive two-sided self-join). Cost is
    * Σ_shingle |posting|² — the inverted-index bound — with no broadcast
    * of the exploded shingle table. */
  /** Null-id note: documents with a NULL `idCol` are EXCLUDED from pair
    * generation (`collect_list` skips nulls when building postings), so
    * they never appear as either side of an output pair — exact near-dup
    * of an unidentified document has no well-defined (a, b) spelling.
    * Callers needing them covered assign surrogate ids first.
    *
    * `prefixFilter` selects the plan: `Some(true)` forces the AllPairs
    * prefix-filtered variant, `Some(false)` the inverted-index all-pairs
    * variant, `None` (default) measures the corpus and decides. Measured
    * on the 5k-doc / max-25-posting benchmark corpus the prefix machinery
    * (doc-frequency join + two windows over the shingle rows) costs MORE
    * than it saves (27 s vs 11 s); on heavy-tailed posting lists
    * (boilerplate-laden web text) candidate volume — Σ|posting|² — is the
    * dominant term and prefix filtering wins. All variants produce
    * identical output. */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      minJaccard: Double = 0.5,
      prefixFilter: Option[Boolean] = None,
      corpusHint: Option[CorpusHint] = None): DataFrame = {
    // fully-auto path: derive the corpus stats ONCE and share them with
    // both planning decisions — prefixWorthIt needs docCount for its
    // scale extrapolation and the all-pairs variant needs the id range
    // for packability, so deriving them separately would cost two full
    // planning scans where one suffices
    val hint = corpusHint.orElse(
      if (prefixFilter.isEmpty) Some(measureCorpus(docs, idCol)) else None)
    val usePrefix = prefixFilter.getOrElse(
      prefixWorthIt(docs, idCol, textCol, n, corpusSize = hint.map(_.docCount)))
    if (usePrefix) ngramJaccardPrefix(docs, idCol, textCol, n, minJaccard)
    else ngramJaccardAllPairs(docs, idCol, textCol, n, minJaccard, hint)
  }

  /** Caller-supplied corpus statistics: doc count plus the id range. When
    * provided, the all-pairs plan is chosen from these numbers and NO
    * construction-time stats scan runs — DataFrame construction stays fully
    * lazy (the auto path's scan is a deliberate, documented planning
    * action, like `prefixWorthIt`'s sample). The caller owns correctness:
    * an understated `maxId` ≥ 2³¹ would corrupt the packed pairs. */
  final case class CorpusHint(docCount: Long, minId: Long, maxId: Long)

  /** The one way corpus stats are derived — the staged-stats convention
    * (compute once per corpus, pass everywhere) and the auto path's
    * planning scan MUST agree on the packability contract (the null-id
    * sentinel in particular: an understated maxId ≥ 2³¹ would corrupt
    * the packed pairs), so both call this. One narrow agg scan. */
  def measureCorpus(docs: DataFrame, idCol: String = "doc_id"): CorpusHint = {
    // the id range only matters for PACKABILITY, which requires LongType
    // anyway — for any other id type skip the min/max entirely: under
    // ANSI mode a cast of a non-numeric string id would THROW mid-scan
    // instead of nulling, killing the operator on exactly the string-id
    // corpora it supports
    val isLong = docs.schema.fields.find(_.name.equalsIgnoreCase(idCol))
      .exists(_.dataType == org.apache.spark.sql.types.LongType)
    if (!isLong) {
      CorpusHint(docs.count(), -1L, Long.MaxValue)
    } else {
      val r = docs.agg(
        count(lit(1)).as("n"),
        min(col(idCol)).as("mn"),
        max(col(idCol)).as("mx")).head()
      // all-null ids leave min/max null: unpackable rather than NPE
      if (r.isNullAt(1) || r.isNullAt(2)) CorpusHint(r.getLong(0), -1L, Long.MaxValue)
      else CorpusHint(r.getLong(0), r.getLong(1), r.getLong(2))
    }
  }

  /** Plan selection from the MEASURED posting-length distribution, not a
    * caller guess — and SCALE-AWARE (r13): the sampled stats are
    * extrapolated to the full corpus before comparing costs, because the
    * two plans scale differently. With r = corpus docs / sampled docs:
    * a shingle repeated within the sample (df ≥ 2 — boilerplate, shared
    * templates) appears ∝ r more often corpus-wide, so its all-pairs
    * candidate mass df² grows r²; shingles unique in the sample stay
    * ~unique. Prefix-filter overhead (doc-frequency join + two windows)
    * grows with the shingle rows, i.e. linearly in r. Dividing both
    * sides by one factor of r: prefix ⇔ Σ_{df≥2}df²·r + m1 > 64·m,
    * where m = sampled shingle rows and m1 = sampled singleton count.
    * At r = 1 this is exactly the pre-r13 rule (Σdf² > 64·m); on a
    * boilerplate-skewed corpus it FLIPS to prefix as the corpus grows —
    * the sample-size-invariant old rule could not, and all-pairs
    * candidate volume at 100× is r² ≈ 10⁴-fold, the difference between
    * finishing and not. Runs as a small driver-side planning action over
    * ≤ `sampleDocs` documents (plus one count scan when `corpusSize` is
    * not supplied). Public as a planning probe so scale harnesses can
    * report the choice without re-deriving it. */
  def prefixWorthIt(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      sampleDocs: Int = 2048,
      corpusSize: Option[Long] = None): Boolean = {
    val nDocs = corpusSize.getOrElse(docs.count())
    if (nDocs <= 0) return false
    // sample DOCS (not shingle rows): the extrapolation ratio needs a doc
    // basis. Each sampled doc's text is capped (~8 KB ≈ 1.3k words) so
    // book-length documents cannot turn the planning scan into a corpus-
    // sized explode; the distribution of a doc's leading shingles stands
    // in for the whole doc, a deliberate planning approximation.
    // persisted before its two actions: an un-ordered limit is NOT
    // stable across executions on a multi-partition input, so the
    // shingle aggregation and the nSampled count below could otherwise
    // observe DIFFERENT row subsets — nSampled would still be exact, but
    // r's numerator-denominator pairing would mix two samples, skewing
    // the ratio near the decision threshold. Bounded at sampleDocs rows
    // × 8 KB text, so pinning it is a few MB at most.
    val sampled = docs
      .select(substring(col(textCol), 1, 8192).as(textCol))
      .limit(sampleDocs)
      .persist()
    try {
    val row = sampled
      .select(explode(TextOps.shingles(docs.sparkSession, col(textCol), n)).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(
        coalesce(sum(col("df")), lit(0L)).as("m"),
        coalesce(sum(when(col("df") === 1, lit(1L))), lit(0L)).as("m1"),
        coalesce(sum(when(col("df") >= 2, col("df") * col("df"))), lit(0L)).as("s2rep"))
      .first()
    val (m, m1, s2rep) = (row.getLong(0), row.getLong(1), row.getLong(2))
    if (m == 0L) return false
    // r must divide by the docs ACTUALLY sampled: when the df holds fewer
    // rows than sampleDocs but corpusSize says more (a caller-staged
    // count, a pre-filtered frame), min(sampleDocs, corpusSize) would
    // understate r — exactly halving the extrapolated candidate mass in
    // the spec's 1000-rows/corpusSize=100k shape. Counting the ≤2048-row
    // sample is a trivially bounded second planning action (served from
    // the persisted sample, so it is the SAME rows the stats came from).
    val nSampled = sampled.count()
    if (nSampled <= 0L) return false
    val r = math.max(1.0, nDocs.toDouble / nSampled.toDouble)
    s2rep * r + m1 > 64.0 * m
    } finally sampled.unpersist()
  }

  /** Brute inverted-index variant: every co-occurring pair is counted.
    * Plan shape: one shuffle builds sorted posting lists per shingle;
    * candidate pairs are generated from each posting with array
    * combinatorics, and the per-doc set sizes fall out of the same posting
    * frame (exchange reuse ⇒ the shingle construction runs once, vs four
    * Generate subtrees in a naive two-sided self-join). Cost is
    * Σ_shingle |posting|²; per-row MEMORY is bounded by `pairBlock` (see
    * [[explodedPairs]]), not by the hottest posting's square. */
  private[operators] def ngramJaccardAllPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      corpusHint: Option[CorpusHint] = None,
      pairBlock: Int = PairBlockSize): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      explode(TextOps.shingles(docs.sparkSession, col(textCol), n)).as("shingle"))
    val postings = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
    val sizes = postings
      .select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // `sizes` is one narrow (id, long) row per document — broadcast both
    // lookups so the pair frame is never re-shuffled by `a` then `b`
    // (sort-merge here costs two extra exchanges + sorts of the largest
    // frame in the plan). The hint is GATED on the measured doc count:
    // ~1e7 (id, long) rows ≈ 160 MB is the sane broadcast ceiling; above
    // it the hint is dropped and AQE picks the strategy. The same narrow
    // pass also measures the id range: bigint ids inside [0, 2³¹) take the
    // packed-pair path (one long per candidate pair instead of a struct
    // row — ~30% off the pair-generation + count stage, identical output).
    // measured planning action (one narrow agg scan) — callers that need
    // construction to stay lazy pass a CorpusHint instead
    val stats = corpusHint.getOrElse(measureCorpus(docs, idCol))
    val canBroadcastSizes = stats.docCount <= 10000000L
    // field resolved like the analyzer (case-insensitive by default) —
    // col(idCol) everywhere else accepts a case-mismatched name, so the
    // packability type test must not throw on one
    val packable = docs.schema.fields.find(_.name.equalsIgnoreCase(idCol))
      .exists(_.dataType == org.apache.spark.sql.types.LongType) &&
      stats.docCount > 0 && stats.minId >= 0L && stats.maxId < (1L << 31)
    def szLookup(side: String): DataFrame = {
      val renamed = sizes.withColumnRenamed("doc_id", side).withColumnRenamed("sz", s"sz_$side")
      if (canBroadcastSizes) broadcast(renamed) else renamed
    }
    val bigPostings = postings.filter(size(col("docs")) > 1)
    val pairCounts =
      if (packable)
        explodedPairs(bigPostings, packed = true, pairBlock)
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("n_common"))
          .select(
            shiftrightunsigned(col("pk"), 32).as("a"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"),
            col("n_common"))
      else
        explodedPairs(bigPostings, packed = false, pairBlock)
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("n_common"))
    pairCounts
      .join(szLookup("a"), Seq("a"))
      .join(szLookup("b"), Seq("b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
  }

  /** AllPairs prefix filtering (Bayardo et al., WWW'07): order shingles
    * globally by (document frequency, shingle) and index only each doc's
    * first |d| − ⌈t·|d|⌉ + 1 rarest shingles. Any pair with Jaccard ≥ t
    * must share a prefix shingle, so the candidate join runs over the
    * rare-shingle postings only; candidates are then verified exactly on
    * the full shingle sets. Output is IDENTICAL to the all-pairs variant
    * for the given threshold — the DuckDB oracle for q18 stays brute
    * force. */
  private[operators] def ngramJaccardPrefix(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      pairBlock: Int = PairBlockSize): DataFrame = {
    val shingleSets = docs.select(
      col(idCol).as("doc_id"), TextOps.shingles(docs.sparkSession, col(textCol), n).as("sh"))
    val sh = shingleSets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val docFreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
    val prefixes = sh
      .join(docFreq, Seq("shingle"))
      .withColumn("rk", row_number().over(byRarity))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // epsilon inside the ceil: when t·sz is mathematically integral the
      // IEEE product can land a hair ABOVE it (0.55·100 = 55.000…01), and
      // an unguarded ceil would shorten the prefix by one — silently
      // missing qualifying pairs and breaking the ≡-all-pairs contract
      .filter(col("rk") <= col("sz") - ceil(lit(minJaccard) * col("sz") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("shingle"))
    val cands = explodedPairs(
      prefixes.groupBy(col("shingle"))
        .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
        .filter(size(col("docs")) > 1),
      packed = false, blockSize = pairBlock)
      .distinct()
    cands
      .join(shingleSets.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(shingleSets.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_common"), col("jaccard"))
  }

  /** Tile width for blocked candidate generation: per-row pair buffers are
    * capped at B² packed longs regardless of posting length, so a
    * boilerplate-heavy posting can never allocate its |posting|²/2 pairs
    * in one buffer — the measured OOM of the forced all-pairs plan at the
    * 100× bench decade (df ≈ 12.5k ⇒ ~0.6 GB per evaluation × concurrent
    * tasks). B = 256 (512 KB of packed longs per tile, ~1 MB with the
    * UnsafeArrayData copy) rather than something roomier like 1024: at
    * 1024 each tile is an 8 MB array — a HUMONGOUS allocation for G1 at
    * typical executor heaps (region size 4 MB at 8 GiB), and 32 tasks
    * churning two humongous objects per tile fragments the old gen until
    * the same workload OOMs with most of the heap technically free (the
    * 100× re-run failed exactly this way before the width was dropped).
    * Sub-region tiles stay young-gen-sized and the inner loop still
    * amortizes over 65 K pairs. */
  private[operators] val PairBlockSize = 256

  /** Candidate-pair explosion over sorted posting lists with BOUNDED
    * per-row memory: every posting explodes its (bi ≤ bj) tile indices,
    * then each tile emits its ≤ blockSize² pairs through the block
    * expression. For a posting of ≤ blockSize docs nb = 1, so the single
    * (0,0) diagonal tile IS the classic single-shot pair set — the two
    * index explodes degenerate to one-iteration loops — and for longer
    * postings the union over tiles reproduces it exactly (the
    * tile-partition contract on [[graft.functions.OrderedPairsPackedBlock]]).
    * Output columns: `pk` when packed, else `a`/`b`.
    *
    * Deliberately ONE plan leg, not a size-dispatched union of a
    * single-shot leg and a tiled leg. A Union is a whole-stage-codegen
    * boundary, and a codegen'd Generate that TERMINATES a codegen stage
    * appends every row generated from one input posting to the stage's
    * output buffer (`BufferedRowIterator.currentRows`, an unbounded
    * LinkedList of UnsafeRows — generate loops carry no resume state, so
    * they cannot honor shouldStop mid-posting): a hot posting's |p|²/2
    * pairs land on the heap as ~50-byte row objects before the first one
    * is consumed, re-creating exactly the OOM the tiles bound — measured
    * as ~59 M buffered UnsafeRows (≈ 5.7 GB) at the 100× decade. With a
    * single leg the Generates and the partial aggregate fuse into one
    * codegen stage, so pairs stream straight into the (spillable) agg
    * hash map and peak unmanaged memory stays O(blockSize²) per task. */
  private def explodedPairs(postings: DataFrame, packed: Boolean, blockSize: Int): DataFrame = {
    require(blockSize > 0, s"pair blockSize must be positive, got $blockSize")
    val tiled = postings
      .withColumn("nb", ceil(size(col("docs")).cast("double") / blockSize).cast("int"))
      .select(col("docs"), explode(sequence(lit(0), col("nb") - 1)).as("bi"), col("nb"))
      .select(col("docs"), col("bi"), explode(sequence(col("bi"), col("nb") - 1)).as("bj"))
    if (packed)
      tiled.select(explode(pairsBlock(packed = true,
        col("docs"), col("bi"), col("bj"), blockSize)).as("pk"))
    else
      tiled.select(explode(pairsBlock(packed = false,
        col("docs"), col("bi"), col("bj"), blockSize)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
  }

  private def pairsBlock(
      packed: Boolean,
      docs: org.apache.spark.sql.Column,
      bi: org.apache.spark.sql.Column,
      bj: org.apache.spark.sql.Column,
      blockSize: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftPlanBridge.{column => toCol, expression => toExpr}
    val (d, i, j, b) = (toExpr(docs), toExpr(bi), toExpr(bj), toExpr(lit(blockSize)))
    if (packed) toCol(graft.functions.OrderedPairsPackedBlock(d, i, j, b))
    else toCol(graft.functions.OrderedPairsBlock(d, i, j, b))
  }

  /** Portable 60-bit hash both engines can compute: the first 15 hex chars
    * of md5, parsed base-16. Spark: `conv(substring(md5(x),1,15),16,10)`;
    * DuckDB: positional strpos/shift arithmetic over the same substring.
    * Used by the `portable = true` sketch variants so the whole
    * MinHash/SimHash pipeline is reproducible by the SQL oracle; the
    * default sketches keep xxhash64 (codegen'd, no md5 cost). */
  private[operators] def hex64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 31-bit modulus for the portable seeded hash family (2^31 − 1, prime):
    * h_i(x) = (a_i·(hex64(x) mod P) + i) mod P with a_i = (i·2654435761)
    * mod P + 1 — one md5 per value, k cheap affine mixes, no 64-bit
    * overflow on either engine. */
  private[operators] val PortableP = 2147483647L
  private[operators] def portableSeedMul(i: Int): Long = (i * 2654435761L) % PortableP + 1

  /** MinHash signatures: minhash_i = min over shingles of hash_i(s) for k
    * independent hash functions.
    *
    * Shape: explode shingles once, hash each shingle once, and reduce with
    * k partial-aggregable MINs. The tempting one-liner —
    * k × `array_min(transform(shingles, …))` — re-inlines the whole
    * shingle-construction expression k times after Catalyst's
    * CollapseProject (measured 215 s vs ~10 s at 5k docs). The groupBy
    * form is also the 100 TB shape: map-side combine means only one
    * k-long row per doc ever shuffles.
    *
    * `portable = false` (default): hash_i = xxhash64(i, s).
    * `portable = true`: the md5-derived seeded family above, bit-identical
    * to the DuckDB oracle (q19). */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 32,
      n: Int = 3,
      portable: Boolean = false): DataFrame = {
    val sh = docs.select(
      col(idCol).as("doc_id"),
      explode(TextOps.shingles(docs.sparkSession, col(textCol), n)).as("shingle"))
    val hashed =
      if (portable) sh.withColumn("h0", hex64(col("shingle")) % PortableP) else sh
    val mins = (0 until k).map { i =>
      val h =
        if (portable) (lit(portableSeedMul(i)) * col("h0") + lit(i.toLong)) % PortableP
        else xxhash64(lit(i), col("shingle"))
      min(h).as(s"mh_$i")
    }
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"mh_$i")): _*).as("signature"))
  }

  /** LSH candidate pairs: band the k-minhash signature into `bands` groups
    * of k/bands rows, bucket by (band index, band hash), and emit distinct
    * doc pairs sharing any bucket. Probability a pair with Jaccard j is
    * emitted: 1 - (1 - j^r)^b — with k=32, b=8, r=4 a 0.9-Jaccard pair is
    * caught w.p. ~0.9998 while a 0.2 pair is ~0.013. */
  def minhashLshCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 32,
      bands: Int = 8,
      n: Int = 3,
      portable: Boolean = false): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    val sigs = minhashSignatures(docs, idCol, textCol, k, n, portable)
    def bucketOf(bnd: Int): org.apache.spark.sql.Column = {
      val elems = (0 until r).map(i => element_at(col("signature"), bnd * r + i + 1))
      if (portable)
        // polynomial fold mod P — same fold the oracle's list_reduce runs
        elems.foldLeft(lit(bnd.toLong)) { (acc, m) => (acc * lit(1000003L) + m) % PortableP }
      else xxhash64(lit(bnd) +: elems: _*)
    }
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map(bucketOf): _*))
        .as(Seq("band", "bucket")))
    val x = banded.as("x"); val y = banded.as("y")
    x.join(y,
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** MinHash-LSH dedup end to end: LSH candidates verified with exact
    * Jaccard computed ONLY for the candidate pairs — each candidate joins
    * the two (small, distinct) shingle arrays and intersects them, so the
    * exact step costs O(|candidates| · shingles), never O(|docs|²). */
  def minhashLshDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 32,
      bands: Int = 8,
      n: Int = 3,
      minJaccard: Double = 0.8,
      portable: Boolean = false): DataFrame = {
    val cands = minhashLshCandidates(docs, idCol, textCol, k, bands, n, portable)
    val shingleSets = docs.select(
      col(idCol).as("doc_id"), TextOps.shingles(docs.sparkSession, col(textCol), n).as("sh"))
    cands
      .join(shingleSets.select(col("doc_id").as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(shingleSets.select(col("doc_id").as("b"), col("sh").as("sh_b")), Seq("b"))
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash over word features: bit b of the signature is the sign
    * of Σ_words (2·bit_b(xxhash64(word)) − 1). Near-dup docs differ in few
    * bits; bucketing by 16-bit quadrants finds all pairs within hamming
    * distance 3 (pigeonhole: ≤3 differing bits leave ≥1 identical quadrant). */
  def simhash(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      portable: Boolean = false): DataFrame = {
    // Explode words once, hash once, then `bits` partial-aggregable SUM
    // votes — same re-inlining / shuffle-shape rationale as
    // minhashSignatures. portable = md5-derived 60-bit hash (oracle-
    // reproducible, q20); default = xxhash64 over the full 64 bits.
    val bits = if (portable) 60 else 64
    val words = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("w"))
      .select(col("doc_id"),
        (if (portable) hex64(col("w")) else xxhash64(col("w"))).as("h"))
    val votes = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"v_$b"))
    val sig = (0 until bits)
      .map(b => when(col(s"v_$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    words.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (≤ 3 guaranteed complete
    * via quadrant bucketing — pigeonhole over 4 quadrants of 16 (or 15,
    * portable) bits; higher distances may miss pairs). */
  def simhashNearDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxHamming: Int = 3,
      portable: Boolean = false): DataFrame = {
    val quadBits = if (portable) 15 else 16
    val quadMask = (1L << quadBits) - 1
    val sigs = simhash(docs, idCol, textCol, portable)
    val quads = sigs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("simhash"), q * quadBits).bitwiseAND(quadMask)): _*))
        .as(Seq("quad", "quad_val")))
    val x = quads.as("x"); val y = quads.as("y")
    x.join(y,
        col("x.quad") === col("y.quad") && col("x.quad_val") === col("y.quad_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** EXACT embedding-cosine near-dup pairs above `minCosine` — every
    * qualifying pair is returned (no LSH recall loss; the approximate
    * bucketed path is `Similarity.srpBuckets`/`lshAnnTopK`).
    *
    * Exact all-pairs in high-dimensional dense space is inherently O(n²)
    * comparisons, but the PLAN must not be a broadcast nested loop (the
    * broadcast side would have to hold the whole corpus). Instead this is
    * the distributed "triangle" block join: rows are hashed into `blocks`
    * groups, each row is replicated to the block-pairs it participates in,
    * and the self-join is an EQUI-join on the (block, block) key — shuffle
    * volume O(blocks·n), every reducer holds 2·n/blocks vectors, compute
    * spreads over blocks·(blocks+1)/2 independent tasks. The block count
    * is derived from the input size by default (see the `blocks` note
    * below) so a partition fits in executor memory at any scale; nothing
    * is broadcast and no task exceeds (n/blocks)² work.
    *
    * A 1-D projection bound prunes before the dot product: for unit-scaled
    * vectors cos(x,y) ≥ t ⟹ ‖x̂−ŷ‖ ≤ √(2−2t), and the first normalized
    * coordinate is a 1-Lipschitz projection of that distance — pairs whose
    * first coordinates differ by more are rejected without touching the
    * remaining dimensions. The bound is slack (never drops a qualifying
    * pair), so output is identical to brute force and oracle parity holds:
    * norms are precomputed per row and `dot/(norm_a·norm_b)` is
    * arithmetically identical to inline norms.
    *
    * `blocks` ≤ 0 (the default) derives the block count from the input's
    * OPTIMIZER SIZE ESTIMATE (r22, closing the r21 "constant where a
    * formula belongs" verdict item): each (bi, bj) task holds two blocks
    * resident, so blocks = ceil(inputBytes / 64 MB) bounds the per-task
    * footprint at ~128 MB at any input volume — a driver-side stats read,
    * no planning job. The block count never changes WHICH pairs are
    * produced (every unordered pair meets exactly once at
    * (min blk, max blk) for any count ≥ 1), only the replication factor
    * (shuffle volume ∝ blocks·n — the inherent exact-all-pairs trade
    * between shuffle and per-task memory/compute). The floor 16 is the
    * measured bench optimum; an explicit positive `blocks` overrides. */
  def embeddingNearDups(
      embeddings: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minCosine: Double = 0.4,
      blocks: Int = 0): DataFrame = {
    val nBlocks =
      if (blocks > 0) blocks
      else {
        // analyzed-plan stats: already materialized at Dataset creation,
        // no second optimizer pass for a threshold decision
        val bytes = embeddings.queryExecution.analyzed.stats.sizeInBytes
        val target = BigInt(64L << 20)
        ((bytes + target - 1) / target).max(16).min(1 << 20).toInt
      }
    val base = embeddings.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.norm(col(vecCol)).as("nrm"),
      pmod(xxhash64(col(idCol)), lit(nBlocks.toLong)).cast("int").as("blk"))
      // guarded first coordinate: element_at(v, 1) on an EMPTY embedding
      // throws INVALID_ARRAY_INDEX under ANSI mode — a null p1 makes the
      // prune comparison null and the degenerate row drops out of the
      // candidates (its cosine would be NaN and filtered anyway)
      .withColumn("p1",
        when(size(col("v")) >= 1,
          element_at(col("v"), 1).cast("double") / col("nrm")))
    // left side covers block pairs (blk, j≥blk); right side (i≤blk, blk) —
    // every unordered row pair meets exactly once at (min blk, max blk).
    val lhs = base.select(
      col("id").as("lid"), col("v").as("lv"), col("nrm").as("ln_"),
      col("p1").as("lp"), col("blk").as("bi"),
      explode(sequence(col("blk"), lit(nBlocks - 1))).as("bj"))
    val rhs = base.select(
      col("id").as("rid"), col("v").as("rv"), col("nrm").as("rn_"),
      col("p1").as("rp"), col("blk").as("bj"),
      explode(sequence(lit(0), col("blk"))).as("bi"))
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * (minCosine - 1e-9)))
    lhs.join(rhs, Seq("bi", "bj"))
      .filter((col("bi") =!= col("bj")) || (col("lid") < col("rid")))
      .filter(abs(col("lp") - col("rp")) <= maxDist)
      .withColumn("cosine",
        round(VectorFunctions.dot(col("lv"), col("rv")) / (col("ln_") * col("rn_")), 9))
      .filter(col("cosine") >= minCosine)
      .select(
        least(col("lid"), col("rid")).as("a"),
        greatest(col("lid"), col("rid")).as("b"),
        col("cosine"))
  }

  /** Shared fingerprint stage of the substring-dedup family: sampled
    * k-gram fingerprint occurrences, each flagged `is_dup` — false for
    * the corpus-wide canonical (smallest (doc_id, pos)) occurrence of its
    * hash, true for every later one.
    *
    * The canonical occurrence is derived with `min(struct(doc_id, pos))`
    * per hash rather than a `row_number` window: min is partial-aggregable
    * (map-side combine), so a degenerate corpus where one hash owns a huge
    * share of sampled windows (long repeated-character runs, common
    * boilerplate) collapses to one row per hash BEFORE the exchange
    * instead of sorting the hot hash inside a single window partition —
    * and the join back on `h` is an ordinary equi-join AQE can skew-split.
    * Struct min orders lexicographically by field, so it selects exactly
    * the row_number(orderBy doc_id, pos) = 1 occurrence.
    *
    * Deliberate trade: the occurrence subtree feeds BOTH the aggregate
    * and the join probe, so the O(n) hash kernel scans the corpus twice
    * (Catalyst does not reuse an exchange across the two shapes). The
    * alternatives are worse at scale: checkpointing the occurrence table
    * materializes ~24 bytes per sampled window (more than the corpus
    * itself at modSelect=16), and the single-scan window variant sorts
    * the hot hash in one task. A second sort-free projection pass over
    * the scan is the cheapest of the three. */
  private def substringFps(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      modSelect: Int): DataFrame = {
    require(modSelect >= 1, s"modSelect must be >= 1, got $modSelect")
    val fn = graft.functions.KgramHashes.registered(docs.sparkSession, k)
    val base = docs.select(
      col(idCol).as("doc_id"),
      call_function(fn, col(textCol)).as("hs"))
    // The canonical occurrence is the lexicographic (doc_id, pos) minimum
    // per hash — but `min(struct(...))` has a struct aggregation buffer,
    // which Spark cannot hash-aggregate: the r20 q98/q102 digests show the
    // fallback SortAggregate pair with a FULL SORT of the fingerprint
    // table on both sides of the exchange (the widest frame in the plan).
    // Pack the pair into ONE decimal instead: v = doc_id·10¹⁹ + pos is
    // order-isomorphic to the struct ordering (0 ≤ pos < 10¹⁹, so the
    // multiplier dominates across doc ids for the FULL long range, and
    // |v| ≤ 9.3·10³⁷ fits DECIMAL(38,0) exactly), and `min(decimal)` is
    // hash-aggregable with map-side combine — no sorts (guide §2.4). A
    // null doc_id maps to the sentinel −9.3·10¹⁸ (below Long.MinValue, so
    // no real id collides), reproducing the struct-min's nulls-first
    // canonical choice; `is_dup` is then a plain (non-null) v ≠ min(v)
    // comparison — the null-safety the struct spelling needed explicitly
    // falls out of the encoding.
    val NullDocSentinel = new java.math.BigDecimal("-9300000000000000000")
    val PosRadix = new java.math.BigDecimal("10000000000000000000") // 10^19
    val occ = base
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("idx", "h")))
      .filter(pmod(col("h"), lit(modSelect.toLong)) === 0)
      .select(col("doc_id"), (col("idx") + 1).cast("long").as("pos"), col("h"))
      .withColumn("__v",
        coalesce(col("doc_id").cast(org.apache.spark.sql.types.DecimalType(38, 0)),
          lit(NullDocSentinel)) * lit(PosRadix) + col("pos"))
    val canon = occ.groupBy(col("h")).agg(min(col("__v")).as("__vmin"))
    occ.join(canon, Seq("h"))
      .select(col("doc_id"), col("pos"), col("h"),
        (col("__v") =!= col("__vmin")).as("is_dup"))
  }

  /** Substring-level exact dedup — span-level duplicate detection à la
    * "Deduplicating Training Data Makes Language Models Better" (exact
    * substring matching), re-expressed for Spark: every k-byte window of
    * every document is rolling-hashed in one O(n) codegen pass
    * ([[graft.functions.KgramHashes]]), a deterministic 1/`modSelect`
    * fingerprint sample (h mod p = 0 — the winnowing-family "mod p"
    * selector) keeps the candidate volume bounded, and a fingerprint
    * occurrence is a DUPLICATE SPAN iff the same hash appears at an
    * earlier (doc, pos) anywhere in the corpus — including earlier in the
    * same document, so internally-repeated boilerplate is flagged too.
    *
    * Output: one row per document — `n_grams` (k-windows scanned), `n_fp`
    * (fingerprints sampled), `n_dup` (non-canonical fingerprint
    * occurrences), `dup_ratio` (= n_dup/n_fp, the fraction of sampled
    * spans that duplicate corpus content; 0.0 when no fingerprints).
    *
    * Scale shape: the hash pass is a projection (no shuffle, no UDF
    * fence); the only exchanges are the hash-partition on the 8-byte
    * fingerprint (partial-agg'd min-struct canonical + an AQE-skew-
    * splittable self-join — no global per-hash sort) and the per-doc
    * rollup. Fingerprint rows are ~1/p of corpus BYTES regardless of doc
    * count, and only (doc_id, pos, hash) triples shuffle — never text.
    * Windows are UTF-8 BYTE offsets (exact for any input; positions
    * count bytes, which coincide with characters on ASCII corpora). */
  def substringDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 20,
      modSelect: Int = 16): DataFrame = {
    // n_grams is pure length arithmetic — deriving it from `hs` would run
    // the k-gram hash kernel a second full corpus pass just to size it
    val sizes = docs.select(
      col(idCol).as("doc_id"),
      greatest(octet_length(col(textCol)).cast("long") - (k - 1), lit(0L)).as("n_grams"))
    val ranked = substringFps(docs, idCol, textCol, k, modSelect)
    val perDoc = ranked.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_fp"),
      sum(col("is_dup").cast("long")).as("n_dup"))
    // null-SAFE join: a null doc_id groups as its own key above, and its
    // counts must land back on the null-id sizes row instead of silently
    // zeroing through a null-unsafe equi-join (same advice item as the
    // is_dup null-safety in substringFps)
    sizes.join(perDoc.withColumnRenamed("doc_id", "__pd_id"),
        col("doc_id") <=> col("__pd_id"), "left")
      .drop("__pd_id")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_fp"), lit(0L)).as("n_fp"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(coalesce(col("n_fp"), lit(0L)) > 0,
          coalesce(col("n_dup"), lit(0L)).cast("double") / col("n_fp").cast("double"))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }

  /** The REMOVAL half of substring-level exact dedup — the step the Lee
    * et al. pipeline actually applies: every non-canonical fingerprint
    * window becomes a cut span [pos, pos+k−1], overlapping/adjacent
    * spans are interval-merged per document, and the kept text is the
    * concatenation of the complement segments. The canonical (first)
    * occurrence of every span survives somewhere in the corpus, so no
    * content is lost — only repeats.
    *
    * Output: one row per document — `n_cut_spans` (merged intervals),
    * `removed_chars`, `kept_chars` (both UTF-8 BYTE counts — the space
    * the spans were measured in; the surgery slices the text as BINARY
    * so multi-byte characters can't shift the cut), and `clean_md5`
    * (md5 of the cleaned bytes — the strongest engine-replayable
    * witness of the surgery).
    *
    * Scale shape: the span set is tiny relative to the corpus (only
    * duplicated fingerprint windows), so after the q98-shaped
    * fingerprint exchange everything downstream shuffles (doc_id, span)
    * pairs — the text itself is touched once more only to slice kept
    * segments, a co-partitioned join on doc_id. */
  def substringRemoveDups(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 20,
      modSelect: Int = 16): DataFrame = {
    val spans = substringFps(docs, idCol, textCol, k, modSelect)
      .filter(col("is_dup"))
      .select(col("doc_id"), col("pos").as("start"), (col("pos") + (k - 1)).as("end"))
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    // interval merge: a span starts a new island unless it overlaps or
    // touches (start ≤ prev running max end + 1) what came before
    // merged is TINY (one row per cut island) but fans out to four
    // consumers (gaps/tails/stats/stitch) — without lineage truncation
    // each would re-run the full fingerprint scan (same discipline as
    // the IVF centroids; the PlanAudit digest showed the duplicated
    // Generate→Window chains before this checkpoint)
    val merged = spans
      .withColumn("mpe",
        max(col("end")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("mpe").isNull || col("start") > col("mpe") + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(wOrd))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"))
      .localCheckpoint(true)
    // ONE projection of the corpus serves length, slicing, and the
    // no-span fallback; slicing runs on BINARY so span offsets (UTF-8
    // BYTE positions from KgramHashes) index the same space they were
    // measured in — character-based substring would mis-cut any
    // multi-byte document
    val base = docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("__bytes"),
      octet_length(col(textCol)).cast("long").as("n"))
    // complement segments: the gap before each merged span + the tail
    val gaps = merged
      .withColumn("prev_end", lag(col("end"), 1, 0L).over(wOrd))
      .select(col("doc_id"),
        (col("prev_end") + 1).as("seg_start"), (col("start") - 1).as("seg_end"))
    // the doc_id joins below are null-SAFE: a null-id document's spans
    // must find their way back to its bytes/stats rows — a plain
    // equi-join would silently skip the surgery for it (same advice
    // item as substringDedup's rollup)
    val tails = merged.groupBy(col("doc_id")).agg(max(col("end")).as("last_end"))
      .join(base.select(col("doc_id").as("__b_id"), col("n")),
        col("doc_id") <=> col("__b_id")).drop("__b_id")
      .select(col("doc_id"), (col("last_end") + 1).as("seg_start"), col("n").as("seg_end"))
    val segs = gaps.unionByName(tails).filter(col("seg_end") >= col("seg_start"))
    val stitched = segs
      .join(base.select(col("doc_id").as("__b_id"), col("__bytes")),
        col("doc_id") <=> col("__b_id")).drop("__b_id")
      .select(col("doc_id"), col("seg_start"),
        expr("substring(__bytes, cast(seg_start as int), cast(seg_end - seg_start + 1 as int))")
          .as("seg"))
      .groupBy(col("doc_id"))
      .agg(expr(
        "aggregate(transform(array_sort(collect_list(struct(seg_start, seg))), s -> s.seg), " +
          "cast('' as binary), (acc, x) -> concat(acc, x))").as("clean_bytes"))
    val stats = merged.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_cut_spans"),
      sum(col("end") - col("start") + 1).as("removed_chars"))
    base
      .join(stats.withColumnRenamed("doc_id", "__st_id"),
        col("doc_id") <=> col("__st_id"), "left").drop("__st_id")
      .join(stitched.withColumnRenamed("doc_id", "__sti_id"),
        col("doc_id") <=> col("__sti_id"), "left").drop("__sti_id")
      .select(
        col("doc_id"),
        coalesce(col("n_cut_spans"), lit(0L)).as("n_cut_spans"),
        coalesce(col("removed_chars"), lit(0L)).as("removed_chars"),
        (col("n") - coalesce(col("removed_chars"), lit(0L))).as("kept_chars"),
        // no spans → original bytes; spans covering EVERYTHING → empty
        // bytes (stitched has no row for that doc, not a null clean)
        md5(when(coalesce(col("n_cut_spans"), lit(0L)) > 0,
          coalesce(col("clean_bytes"), lit("").cast("binary")))
          .otherwise(col("__bytes"))).as("clean_md5"))
  }
}
