package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means clustering over embedding columns — the semantic-clustering
  * primitive behind corpus curation (topic balancing, diversity sampling,
  * cluster-level dedup) and the coarse quantizer shape IVF indexes use.
  *
  * Determinism is engineered in, not hoped for:
  *   - Vectors are QUANTIZED to integers (`round(x * scale)`) before any
  *     cross-row arithmetic, so centroid accumulation is exact integer
  *     addition — independent of partition order. At 1000 executors a
  *     float sum would differ run-to-run in the last ulp and make results
  *     unreproducible; integer accumulators are the standard fix, and they
  *     also make the whole operator oracle-checkable.
  *   - Centroid components are `sum / count` in ONE double division, and
  *     point-to-centroid distances fold components in index order, so
  *     every float value has exactly one computation path.
  *   - Argmin ties break on the centroid index via lexicographic
  *     (distance, index) struct-min on both engines.
  *
  * Scale shape (100 TB): each Lloyd round is one broadcast of k centroids
  * against a narrow scan (assignment — no shuffle of the corpus), plus one
  * (cluster, component)-keyed partial-aggregate shuffle whose volume is
  * rows × dim longs, map-side combined down to k × dim. Initial centroids
  * are the k smallest ids (at real scale: a seeded reservoir sample —
  * same broadcast shape). Empty clusters drop out of the update (standard
  * Lloyd behavior; both engines agree).
  */
object Clustering {

  /** Squared L2 distance between the quantized vector `q` (array<long>)
    * and a centroid vector `c` (array<double>), folded in index order.
    */
  private def sqDist(q: Column, c: Column): Column =
    // fused kernel, IEEE-identical to the zip_with/aggregate fold it
    // replaces (fenced in SimilaritySuite)
    graft.functions.VecOps.sqDistLongDouble(q, c)

  /** The HOF formulation, kept as the equivalence-fence reference. */
  private[graft] def sqDistHof(q: Column, c: Column): Column =
    aggregate(
      zip_with(q, c, (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (acc, x) => acc + x)

  /** One assignment pass: nearest centroid per vector, ties to the lowest
    * centroid index. The centroid table (k rows — bounded by construction:
    * flat k or the coarse kSuper ≈ √k) is collected once per round and
    * folded into a fused argmin PROJECTION
    * (functions.VecOps.argminSqDist): the corpus is never cross-joined,
    * grouped or sorted — assignment is a map over the scan. The joined
    * formulation this replaces (r13, kept below as the fence reference)
    * paid crossJoin × k plus a struct-min aggregation that falls to
    * SortAggregate and drags every quantized vector through an exchange
    * and two sorts. Distance fold and tie/null semantics are
    * IEEE-identical (argminSqFold scaladoc; fenced in
    * RelevanceClusteringSuite); the coalesce preserves the joined path's
    * null-q behavior (all distances null → lowest cidx wins struct-min).
    * Requires unique vec_id, which the q builder guarantees.
    */
  private[graft] def assign(q: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col("cidx"), col("cvec")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    // empty centroid table: the joined formulation returned an empty frame
    // (crossJoin with nothing); `cents.head` below would throw instead —
    // bounded today (k >= 1 by construction) but guarded all the same
    if (cents.isEmpty)
      return q.filter(lit(false))
        .select(col("vec_id"), col("q"), lit(null).cast("int").as("cluster"))
    q.select(col("vec_id"), col("q"),
      coalesce(
        graft.functions.VecOps.argminSqDist(col("q"),
          cents.map(_._1).toSeq, cents.map(_._2).toSeq),
        lit(cents.head._1)).as("cluster"))
  }

  /** The crossJoin + struct-min formulation [[assign]] replaced —
    * the equivalence-fence reference (RelevanceClusteringSuite).
    */
  private[graft] def assignJoined(q: DataFrame, centroids: DataFrame): DataFrame =
    q.crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("q"), col("cvec")))
      .groupBy("vec_id")
      // q is functionally determined by vec_id, so first() is deterministic
      .agg(first("q").as("q"), min(struct(col("__d"), col("cidx"))).as("__m"))
      .select(col("vec_id"), col("q"), col("__m.cidx").as("cluster"))

  /** Centroid update: per-(cluster, component) exact integer sums, one
    * map-side-combined shuffle, rebuilt into ordered double arrays.
    */
  private def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy("cluster", "pos")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("n")))).as("__c"))
      .select(col("cluster").as("cidx"),
        transform(col("__c"), x =>
          x.getField("s").cast("double") / x.getField("n").cast("double")).as("cvec"))

  /** Lloyd k-means: `iters` update rounds, then a final assignment.
    * Returns (vec_id, cluster). `scale` controls quantization resolution
    * (1000 keeps 3 decimal digits; unit-norm embeddings lose < 0.1%).
    */
  def kmeans(embeddings: DataFrame, k: Int = 8, iters: Int = 1, scale: Int = 1000,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0 && iters >= 0, "kmeans: k and iters must be positive")
    val q = embeddings.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("q"))
    var centroids = q.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    var it = 0
    while (it < iters) {
      // each round's centroid frame is tiny (k x dim): materialize it so
      // the lineage does not nest one broadcast-join plan per round
      centroids = update(assign(q, centroids)).localCheckpoint(eager = true)
      it += 1
    }
    assign(q, centroids)
      .select(col("vec_id"), col("cluster").cast("int").as("cluster"))
  }

  /** Two-level Lloyd k-means for LARGE k (the SemDeDup k ∝ corpus-size
    * recipe at 100 TB implies k in the millions, where the flat algorithm's
    * k-row centroid broadcast per Lloyd round stops being "small"):
    *
    *   - level 1 clusters the corpus into `kSuper` coarse cells exactly
    *     like [[kmeans]] — the per-round broadcast is kSuper rows, small by
    *     construction (choose kSuper ≈ √k);
    *   - level 2 runs kInner-means INSIDE each cell, with the
    *     (kSuper × kInner)-row centroid table JOINED on the cell id
    *     (shuffle-hash, co-partitioned) instead of broadcast — the step
    *     that removes the broadcast ceiling. Each row only ever meets its
    *     own cell's kInner centroids.
    *
    * Same quantized-integer discipline as [[kmeans]] (exact integer
    * accumulation, single-division centroids, (distance, index) argmin
    * ties), so results are deterministic at any parallelism. Returns
    * (vec_id, cluster) with cluster = super * kInner + inner; empty inner
    * cells drop out as in standard Lloyd.
    *
    * With `softCandidates = true` the output gains a `cluster2` column:
    * the vector's best cluster within its SECOND-nearest coarse cell (null
    * when kSuper = 1 or that cell attracted no members). This is the
    * standard hierarchical-quantizer recall mitigation — a duplicate group
    * split across a coarse boundary is reunited in the candidate phase by
    * letting each vector shop in two cells. `cluster` (the primary) is
    * bit-identical to the softCandidates = false output.
    */
  def kmeansTwoLevel(embeddings: DataFrame, kSuper: Int, kInner: Int,
                     iters: Int = 1, scale: Int = 1000,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     softCandidates: Boolean = false): DataFrame = {
    require(kSuper > 0 && kInner > 0 && iters >= 0,
      "kmeansTwoLevel: kSuper, kInner must be positive and iters >= 0")
    // cluster ids are INT to match the flat path (r9 ADVICE: a LONG here
    // made semanticDedup's output schema flip when kEff crossed
    // twoLevelFromK); the id space is kSuper * kInner, which therefore
    // must fit an INT — ~2^31 clusters, far past the k ∝ n recipe at 100 TB
    require(kSuper.toLong * kInner <= Int.MaxValue,
      "kmeansTwoLevel: kSuper * kInner must fit in an INT cluster id")
    import org.apache.spark.sql.expressions.Window
    val q = embeddings.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("q"))
    var coarse = q.filter(col("vec_id") < kSuper)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    var it = 0
    while (it < iters) {
      coarse = update(assign(q, coarse)).localCheckpoint(eager = true)
      it += 1
    }
    // cells reused by every inner round: cache the slim (id, q, super) frame
    val cells = assign(q, coarse).withColumnRenamed("cluster", "super").persist()
    // inner init: the kInner smallest ids per cell (same convention as the
    // flat initializer, scoped per cell)
    var inner = cells
      .withColumn("__rn", row_number().over(Window.partitionBy("super").orderBy("vec_id")))
      .filter(col("__rn") <= kInner)
      .select(col("super"), (col("__rn") - 1).cast("int").as("iidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    // Inner assignment dispatch (r14): the centroid table is bounded by
    // kSuper * kInner BY CONSTRUCTION, so when that bound fits the
    // broadcast budget (`graft.kmeans.innerBroadcastMaxRows`, default 1M
    // rows — rows, not bytes: lower it for high-dim embeddings) the
    // assignment runs as ONE fused argmin projection probing a broadcast
    // super→centroids table (functions.ArgminSqDistGroupedExpr) — no
    // shuffle-hash join, no struct-min SortAggregate, no exchange + two
    // sorts per inner Lloyd round. Past the budget (k in the millions at
    // high dim) the joined formulation below remains the path — that is
    // the two-level design's whole point, so the gate is static and free.
    // Fenced cell-identical in RelevanceClusteringSuite (ties, null q,
    // empty cells).
    val innerBroadcastMax = embeddings.sparkSession.conf
      .getOption("graft.kmeans.innerBroadcastMaxRows")
      .map(_.toLong).getOrElse(1000000L)
    val innerFused = kSuper.toLong * kInner <= innerBroadcastMax
    // fused probe over any (vec_id, super, q) frame; rows whose cell has
    // no centroids drop, matching the joined path's inner join
    def assignCellFused(points: DataFrame, cent: DataFrame): DataFrame = {
      val rows = cent.select(col("super"), col("iidx"), col("cvec")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val groups = embeddings.sparkSession.sparkContext
        .broadcast(graft.functions.GroupedCentroids(rows))
      points.select(col("vec_id"), col("super"), col("q"),
          graft.functions.VecOps.argminSqDistGrouped(col("super"), col("q"),
            groups).as("iidx"))
        .filter(col("iidx").isNotNull)
    }
    // the joined formulation — the over-budget path and the equivalence-
    // fence reference (RelevanceClusteringSuite)
    def assignInnerJoined(points: DataFrame, cent: DataFrame): DataFrame =
      points.join(cent.hint("shuffle_hash"), Seq("super"))
        .withColumn("__d", sqDist(col("q"), col("cvec")))
        .groupBy("vec_id")
        .agg(first("super").as("super"), first("q").as("q"),
          min(struct(col("__d"), col("iidx"))).as("__m"))
        .select(col("vec_id"), col("super"), col("q"), col("__m.iidx").as("iidx"))
    def assignInner(cent: DataFrame): DataFrame =
      if (innerFused) assignCellFused(cells, cent)
      else assignInnerJoined(cells, cent)
    def updateInner(assigned: DataFrame): DataFrame =
      assigned.select(col("super"), col("iidx"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("super", "iidx", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .groupBy("super", "iidx")
        .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("n")))).as("__c"))
        .select(col("super"), col("iidx"),
          transform(col("__c"), x =>
            x.getField("s").cast("double") / x.getField("n").cast("double")).as("cvec"))
    var it2 = 0
    while (it2 < iters) {
      inner = updateInner(assignInner(inner)).localCheckpoint(eager = true)
      it2 += 1
    }
    val primary = assignInner(inner)
      .select(col("vec_id"),
        (col("super").cast("long") * kInner + col("iidx")).cast("int").as("cluster"))
    val out = (if (!softCandidates) primary else {
      // candidate-phase soft assignment: per vector, the 2nd-nearest coarse
      // cell (the sorted (distance, index) list is kSuper ≈ √k structs per
      // vector — bounded), then the nearest inner centroid WITHIN that
      // cell. Ties break identically to the primary path; a missing 2nd
      // cell (kSuper = 1) or an empty one (no inner centroids) yields null.
      val second = q.crossJoin(broadcast(coarse))
        .withColumn("__d", sqDist(col("q"), col("cvec")))
        .groupBy("vec_id")
        .agg(first("q").as("q"),
          // try_element_at: 1-based, null past the end (ANSI-safe at
          // kSuper = 1, where the sorted list has a single element)
          min(struct(col("__d"), col("cidx"))).as("__m1"),
          try_element_at(sort_array(collect_list(struct(col("__d"), col("cidx")))),
            lit(2)).as("__m2"))
        // margin gate: only BOUNDARY vectors shop in the second cell. A
        // duplicate group is split by a coarse boundary only when its
        // members sit nearly equidistant from two centroids (that is what
        // straddling means), so d2 <= 1.05 * d1 (on squared distances — the
        // tightest margin in the ProbeSoftMargin sweep that still recovered
        // flat recall, PERF.md) captures the straddlers while keeping the
        // soft membership — and with it the quadratic in-cluster verify
        // cost — proportional to the boundary population, not the corpus
        // (measured in PERF.md: ungated soft was ~4x the hard wall time)
        .filter(col("__m2").isNotNull &&
          col("__m2.__d") <= lit(1.05) * col("__m1.__d"))
        .select(col("vec_id"), col("q"), col("__m2.cidx").as("super"))
      // same dispatch as the primary inner assignment: fused argmin under
      // the broadcast budget, shuffle-hash join + struct-min past it
      val secondary = (if (innerFused)
          assignCellFused(second, inner)
        else
          assignInnerJoined(second, inner))
        .select(col("vec_id"),
          (col("super").cast("long") * kInner + col("iidx")).cast("int").as("cluster2"))
      primary.join(secondary, Seq("vec_id"), "left")
    }).localCheckpoint(eager = true)
    cells.unpersist()
    out
  }

  /** Dev-only plan probe: the first inner-round assignment frame of
    * [[kmeansTwoLevel]], un-checkpointed, so its physical plan (fused
    * argmin projection vs shuffle-hash join + struct-min, per the
    * `graft.kmeans.innerBroadcastMaxRows` dispatch) can be dumped as
    * committed evidence — the entry-level plan only shows the final
    * localCheckpoint leaf.
    */
  private[graft] def kmeansTwoLevelInnerPlanProbe(embeddings: DataFrame,
      kSuper: Int, kInner: Int, scale: Int = 1000,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = embeddings.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("q"))
    val coarse = q.filter(col("vec_id") < kSuper)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    val cells = assign(q, coarse).withColumnRenamed("cluster", "super")
    val inner = cells
      .withColumn("__rn", row_number().over(Window.partitionBy("super").orderBy("vec_id")))
      .filter(col("__rn") <= kInner)
      .select(col("super"), (col("__rn") - 1).cast("int").as("iidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
      .localCheckpoint(eager = true)
    val innerBroadcastMax = embeddings.sparkSession.conf
      .getOption("graft.kmeans.innerBroadcastMaxRows")
      .map(_.toLong).getOrElse(1000000L)
    if (kSuper.toLong * kInner <= innerBroadcastMax) {
      val rows = inner.select(col("super"), col("iidx"), col("cvec")).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      val groups = embeddings.sparkSession.sparkContext
        .broadcast(graft.functions.GroupedCentroids(rows))
      cells.select(col("vec_id"), col("super"), col("q"),
          graft.functions.VecOps.argminSqDistGrouped(col("super"), col("q"),
            groups).as("iidx"))
        .filter(col("iidx").isNotNull)
    } else
      cells.join(inner.hint("shuffle_hash"), Seq("super"))
        .withColumn("__d", sqDist(col("q"), col("cvec")))
        .groupBy("vec_id")
        .agg(first("super").as("super"), first("q").as("q"),
          min(struct(col("__d"), col("iidx"))).as("__m"))
        .select(col("vec_id"), col("super"), col("q"), col("__m.iidx").as("iidx"))
  }

  /** Per-cluster inertia (sum of squared distances to the assigned
    * centroid) and sizes — the convergence/quality diagnostic.
    */
  def inertia(embeddings: DataFrame, k: Int = 8, iters: Int = 1, scale: Int = 1000,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = embeddings.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => round(x.cast("double") * scale).cast("long")).as("q"))
    var centroids = q.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cidx"),
        transform(col("q"), x => x.cast("double")).as("cvec"))
    var it = 0
    while (it < iters) {
      centroids = update(assign(q, centroids)).localCheckpoint(eager = true)
      it += 1
    }
    q.crossJoin(broadcast(centroids))
      .withColumn("__d", sqDist(col("q"), col("cvec")))
      .groupBy("vec_id")
      .agg(min(struct(col("__d"), col("cidx"))).as("__m"))
      .groupBy(col("__m.cidx").as("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("__m.__d")).as("inertia"))
  }
}
