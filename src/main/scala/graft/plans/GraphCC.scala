package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list.
  *
  * Min-label propagation with pointer doubling: each round every node
  * takes the min of its own component id, its neighbors' ids, and its
  * id's id (comp ∘ comp). Converges in O(log diameter) rounds; each
  * round is two shuffle joins on node ids, lineage-truncated by a
  * checkpoint. The same idiom labels tensor components
  * (`graft.tensor.Measure.label` step 3) and collapses document
  * near-duplicate clusters (`TextOps.cc_dedup_groups`).
  *
  * Scale posture: state is one (node, comp) row per edge endpoint —
  * nodes untouched by any edge never enter the computation, so a 100 TB
  * corpus with a few million duplicate pairs propagates over millions of
  * rows, not the corpus. At extreme edge counts the large-star/small-star
  * variant drops in here unchanged.
  *
  * Checkpointing follows the session posture (same contract as
  * `Measure.label`): reliable `checkpoint()` when
  * `graft.checkpoint.reliable=true` and a checkpoint dir is set
  * (cluster — survives executor loss), else `localCheckpoint`
  * (single-machine speed).
  */
object GraphCC {

  /** Components of the undirected graph given by a 2-column edge list
    * (direction ignored; self-loops harmless). Returns (node, comp) with
    * one row per distinct endpoint; comp = min node id in the component.
    */
  def components(pairs: DataFrame, maxRounds: Int = 60): DataFrame = {
    val spark = pairs.sparkSession
    val reliable = spark.conf.getOption("graft.checkpoint.reliable").contains("true")
    if (reliable) require(spark.sparkContext.getCheckpointDir.isDefined,
      "graft.checkpoint.reliable=true requires SparkContext.setCheckpointDir")
    def cp(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)

    val cols = pairs.columns
    require(cols.length == 2, s"edge list must have exactly 2 columns, got: ${cols.mkString(",")}")
    val e = pairs.select(col(cols(0)).as("a"), col(cols(1)).as("b"))
    val und = cp(e.union(e.select(col("b").as("a"), col("a").as("b"))))
    var comp = cp(und.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node")))
    var converged = comp.isEmpty
    var iter = 0
    while (!converged && iter < maxRounds) {
      val viaNbr = und.join(comp, und("b") === comp("node"))
        .groupBy(col("a")).agg(min(col("comp")).as("nbr_min"))
      val stepped = comp.as("c")
        .join(viaNbr, col("c.node") === col("a"), "left")
        .select(col("c.node").as("node"),
          least(col("c.comp"), coalesce(col("nbr_min"), col("c.comp"))).as("comp"))
      // pointer doubling: comp(node) ← comp(comp(node))
      val doubled = cp(stepped.as("s")
        .join(comp.as("t"), col("s.comp") === col("t.node"), "left")
        .select(col("s.node").as("node"),
          least(col("s.comp"), coalesce(col("t.comp"), col("s.comp"))).as("comp")))
      val changed = doubled.as("x").join(comp.as("y"), col("x.node") === col("y.node"))
        .filter(col("x.comp") =!= col("y.comp")).limit(1).count()
      comp = doubled
      converged = changed == 0
      iter += 1
    }
    // Non-convergence would leave comp non-idempotent (duplicate keys for
    // downstream relabel maps) — fail loudly; pointer doubling covers
    // component diameters up to ~2^maxRounds, so this guards regressions,
    // not real inputs.
    require(converged, s"connected-components propagation did not converge in $iter rounds")
    comp
  }
}
