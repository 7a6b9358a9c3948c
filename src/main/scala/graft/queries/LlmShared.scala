package graft.queries

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the LLM pipeline modules: child-session view
  * builders, native-function registration, and the MinHash parameter /
  * skew-cap constants every family references.
  */
private[queries] trait LlmShared {

  /** Registers the native text/vector functions used by the SQL below
    * (also used by specs that run the query shapes on synthetic views).
    *
    * Also excludes `InferFiltersFromGenerate`: that rule adds
    * `size(arr) > 0 AND isnotnull(arr)` under every explode and pushes
    * them through the defining projection, substituting the expression —
    * so an expensive generator child like `word_shingle_hashes(text, 3)`
    * is computed 3× per row (filter ×2 + project). Every explode in this
    * workload is over a COMPUTED array (shingles, bands, sequences), so
    * the rule only costs here (measured 23% on q24 at sf0.1); its benefit
    * case — pruning stored array columns before a generate — does not
    * occur in this engine. The exclusion applies to the session PASSED
    * IN; the top-level `queries` pass a child session (see [[docs]]) so
    * it never affects the caller's other workloads. */
  private[graft] def registerFunctions(s: SparkSession): Unit = {
    GraftFunctions.register(s)
    GraftFunctions.registerMinhash(s, MinhashParams, MinhashP)
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    // Keep Spark's parallelism-first AQE coalescing for THIS module
    // (opting out of the size-first engine default Tables.apply sets,
    // round 21): these queries' post-shuffle stages are byte-small but
    // CPU-superlinear (posting-list pair explodes, per-token kernels),
    // so coalescing them to advisory SIZE serializes the hottest loops
    // — measured: q24 2.15→3.23 s, q164 2.47→3.29 s, q53 1.95→2.78 s
    // under size-first. Bytes do not predict CPU here; the default's
    // parallelism floor does the right thing. This also keeps the
    // float-state loops' partitioning (q111/q144/q64/q65) byte-
    // identical to prior rounds. The marker conf is read by
    // Tables.apply, which runs AFTER this in the view builders.
    s.conf.set("spark.graft.aqe.keepParallelismFirst", "true")
  }

  /** LLM queries run in a CHILD session (`newSession`: same
    * SparkContext and shared catalog, but separate conf / temp views /
    * function registry), so the [[registerFunctions]] rule exclusion is
    * scoped to this module's plans and never leaks into the caller's
    * session — a mixed workload keeps `InferFiltersFromGenerate` for its
    * stored-array explodes (VERDICT r4). The returned DataFrames carry
    * the child session, so their execution (whenever the caller acts on
    * them) sees the exclusion without any save/restore races. */
  private[queries] def docs(s: SparkSession, dir: String): SparkSession = {
    val s2 = s.newSession()
    registerFunctions(s2)
    Tables.documents(s2, dir).createOrReplaceTempView("documents")
    s2
  }
  /** [[docs]] plus a `documents_rp` view repartitioned to the default
    * parallelism — for queries whose cost is a per-document KERNEL
    * (minhash/shingle/tokenize) rather than the scan: the driver
    * testdata is one single-row-group file, so a kernel directly over
    * the scan runs in ONE task; at cluster scale the table arrives in
    * many splits and the repartition is a cheap narrow-ish shuffle of
    * raw text that keeps the kernel map-parallel either way. */
  private[queries] def docsRp(s: SparkSession, dir: String): SparkSession = {
    val s2 = docs(s, dir)
    val docsDf = s2.table("documents")
    // SIZE-GATED (round 19, the InterpretedLoop.isSmall pattern): the
    // eager repartition+localCheckpoint exists for BENCH-SHAPED inputs —
    // a single-row-group parquet file scans as ONE task, so a
    // per-document kernel (minhash/shingle/tokenize) over the bare scan
    // runs serially, and the view is referenced by several CTEs of one
    // query which would otherwise re-run the scan per reference. Both
    // motivations vanish at scale: a 100 TB corpus already arrives in
    // thousands of splits (kernels map-parallel over the scan) and an
    // unconditional up-front full-corpus shuffle + checkpoint write
    // would dominate the query. Small (≤ InterpretedLoop.SmallLoopBytes
    // by Catalyst's estimate, which errs LARGE on unknown stats) →
    // eager checkpoint, one up-front job leaving a LogicalRDD every CTE
    // branch reads; large → the bare scan, filters/pruning push down
    // untouched. Test hook graft.docsrp.large=1 forces the large path.
    val view =
      if (graft.ops.InterpretedLoop.isSmall(docsDf) &&
          !sys.props.get("graft.docsrp.large").contains("1"))
        docsDf.repartition(s2.sparkContext.defaultParallelism).localCheckpoint()
      else docsDf
    view.createOrReplaceTempView("documents_rp")
    s2
  }
  private[queries] def embs(s: SparkSession, dir: String): SparkSession = {
    val s2 = s.newSession()
    registerFunctions(s2)
    Tables.embeddings(s2, dir).createOrReplaceTempView("embeddings")
    s2
  }
  private[queries] def evts(s: SparkSession, dir: String): SparkSession = {
    val s2 = s.newSession()
    registerFunctions(s2)
    Tables.events(s2, dir).createOrReplaceTempView("events")
    s2
  }


  /** MinHash signature (K=12, universal hashing h_k(x) = (a_k·x + b_k)
    * mod p over a 60-bit md5-derived base hash) + banded LSH (4 bands ×
    * 3 rows): candidate pairs meet only inside a band bucket, so the
    * join is |bucket|² per bucket, never all-pairs. The band-bucket join
    * is the standard near-dup plan at 100 TB (each band hash is a
    * shuffle key; skew only if thousands of docs share a band hash,
    * which means they ARE near-duplicates).
    *
    * Physical shape: ONE md5 per shingle (not one per seed), reduced to
    * x ∈ [0, p) with p = 2^31−1; the 12 signature lanes are then cheap
    * integer `min((a_k·x + b_k) % p)` aggregates in a single codegen'd
    * hash aggregation with map-side combine. All arithmetic stays below
    * 2^62 so Spark and DuckDB (both 64-bit signed) agree bit-for-bit. */
  private[graft] val MinhashP = 2147483647L // 2^31 - 1
  private[graft] val MinhashParams: Seq[(Long, Long)] = (0 until 12).map { k =>
    ((1103515245L * (k + 7) + 11) % MinhashP, (12345L + 987654321L * k) % MinhashP)
  }

  /** Fan-out caps — the difference between "bucketed" and "quadratic on a
    * degenerate key". A band bucket of size s yields s² candidate pairs;
    * at 100 TB one popular signature (boilerplate docs) would otherwise
    * put millions of rows behind one shuffle key and sink the stage. A
    * bucket larger than BandCap is a dense near-dup cluster; production
    * handles those with a connected-components pass, not pairwise
    * scoring, so dropping them from PAIR generation is the standard
    * guard (same reasoning for shingle document frequency: a shingle in
    * >DocFreqCap docs is a stop phrase and cannot push any single pair's
    * Jaccard high by itself). Both caps are applied IDENTICALLY in the
    * DuckDB oracle, so correctness comparison is exact. */
  private[graft] val BandCap = 200
  private[graft] val DocFreqCap = 1000
  private[graft] val CellCap = 200
}
