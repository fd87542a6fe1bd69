package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the family the
  * connected-components resolvers (d07 min-label propagation, d19
  * large-star/small-star) belong to, generalized to value propagation.
  *
  * Everything here is expressed as joins + aggregates per iteration, so
  * each round is one shuffle on the edge partitioning and the lineage is
  * truncated with periodic `localCheckpoint` (the d07 discipline — 20
  * logical plans deep is where Catalyst analysis time, not data, becomes
  * the bottleneck). */
object Graph {

  /** Power-iteration PageRank over a weighted edge list `(src, dst, w)`
    * where `w` is the src-normalized transition probability (rows sum to
    * 1 per src). Fixed iteration count — the deterministic form an
    * oracle can replay step for step; convergence-threshold stopping is
    * a caller loop around the same body.
    *
    * Per-node inflow contributions are cast to DECIMAL(38,18) before the
    * SUM, so each iteration's ranks are ORDER-INVARIANT across
    * partitionings and bit-identical between engines (the dsum
    * discipline applied to an iterated fixpoint — double partial sums
    * would drift a few ulps per round and compound across iterations).
    *
    * Dangling nodes (rank mass with no out-edges) would silently leak
    * mass from the system. `dangling` picks the policy — every one
    * explicit, never a hidden correction:
    *  - `"refuse"` (default): REFUSE loudly and tell the caller to
    *    pre-normalize — the `dedupClusters` round-budget precedent:
    *    never silently wrong. The right default for transition graphs
    *    whose rows are SUPPOSED to sum to 1 (a sink there is a data bug).
    *  - `"selfloop"`: add `(id, id, 1.0)` for every sink before
    *    iterating — sinks hold their mass. Deterministic edge rewrite,
    *    so an unrolled SQL oracle mirrors it exactly (q57 uses this).
    *  - `"uniform"`: the classical correction — each iteration the
    *    total sink mass is redistributed uniformly over all nodes
    *    (Page et al. 1999 §2.7's dangling handling). The sink-mass
    *    scalar is a DECIMAL(38,18) sum like the inflows, so iterations
    *    stay order-invariant.
    *
    * Scale shape: one `edges ⋈ rank` shuffle + one `groupBy(dst)` per
    * iteration; rank rows are `(id, double)` — 16 bytes of state per
    * node, never adjacency. The node count is a 1-row aggregate
    * (bounded metadata, the d07 pattern); the uniform-mode sink mass is
    * a 1-row broadcast per iteration, never a driver collect. */
  def pageRank(edges: DataFrame, damping: Double = 0.85,
      iters: Int = 20, checkpointEvery: Int = 5,
      dangling: String = "refuse"): DataFrame = {
    require(Set("refuse", "selfloop", "uniform")(dangling),
      s"unknown dangling policy '$dangling' (refuse | selfloop | uniform)")
    // the edge list feeds EVERY one of the `iters` contribution joins
    // AND the nodes/sinks derivations — left lazy, its derivation
    // (often a windowed transition extraction or an ANN kNN list, far
    // more expensive than an iteration itself) re-executes once per
    // iteration between rank checkpoints plus twice at setup
    // (optimization round 14: q57's events window ran 20×). Materialize
    // it ONCE, first; every PageRank implementation holds the edge list
    // resident across iterations — this is that, with disk spill.
    val e0 = edges.localCheckpoint()
    val nodes = e0.select(col("src").as("id"))
      .unionByName(e0.select(col("dst").as("id")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val sinks = nodes.join(e0.select("src").distinct(),
      col("id") === col("src"), "left_anti").localCheckpoint()
    val nSinks = sinks.count()
    if (dangling == "refuse") require(nSinks == 0,
      s"$nSinks dangling node(s) would leak rank mass each iteration; " +
        "pre-normalize the edge list, or pick dangling = \"selfloop\" " +
        "(sinks hold their mass) or \"uniform\" (sink mass redistributed " +
        "over all nodes each iteration)")
    val e = if (dangling == "selfloop" && nSinks > 0)
      e0.unionByName(sinks.select(col("id").as("src"),
        col("id").as("dst"), lit(1.0d).as("w"))).localCheckpoint()
    else e0
    val redistribute = dangling == "uniform" && nSinks > 0
    val teleport = (1 - damping) / n
    var rank = nodes.withColumn("r", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contrib = e
        .join(rank.withColumnRenamed("id", "src0"), col("src") === col("src0"))
        .groupBy(col("dst"))
        .agg(sum((col("r") * col("w")).cast("decimal(38,18)"))
          .cast("double").as("inflow"))
      val base = nodes.join(contrib, col("id") === col("dst"), "left")
      rank =
        if (redistribute) {
          val dm = rank.join(sinks, Seq("id"), "left_semi")
            .agg(coalesce(sum(col("r").cast("decimal(38,18)")),
              lit(0).cast("decimal(38,18)")).cast("double").as("__dm"))
          base.crossJoin(broadcast(dm))
            .select(col("id"),
              (lit(teleport) + lit(damping) *
                (coalesce(col("inflow"), lit(0.0d)) + col("__dm") / n))
                .as("r"))
        } else
          base.select(col("id"),
            (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0d)))
              .as("r"))
      if (i % checkpointEvery == 0) rank = rank.localCheckpoint()
    }
    rank
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002, the
    * hard-label variant): seed nodes are clamped to their labels; every
    * other node takes the MAJORITY label among its labeled neighbours
    * each round (ties to the smallest label id; nodes with no labeled
    * neighbour keep their current state). The weak-supervision operator
    * that turns a small labeled pool into corpus-wide training labels —
    * at scale the `edges` list comes from the ANN index (s03/s04/s07),
    * not exact kNN, and this operator is agnostic to which.
    *
    * `edges` is directed `(src, dst)` — src reads its neighbours dst;
    * `seeds` is `(id, label)`. Fixed `iters` rounds make the fixpoint
    * oracle-replayable (the q57 discipline). Per round: one edges⋈labels
    * join + a two-level majority aggregate — label state is one int per
    * node, the same 16-byte discipline as [[pageRank]]. The majority
    * argmax is a struct-MAX aggregate (partial-aggregates map-side),
    * never a window over the vote stream. */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
      iters: Int, checkpointEvery: Int = 3): DataFrame = {
    // same ruling as [[pageRank]]'s edge pin (optimization round 14):
    // the lazy edge list re-derives once per round plus once for the
    // node set — for s14 that was the full brute-force kNN six times
    // over. Materialize it once, first.
    val e = edges.localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .unionByName(seeds.select(col("id")))
      .distinct().localCheckpoint()
    var lab = nodes
      .join(seeds.select(col("id"), col("label").as("seed_label")),
        Seq("id"), "left")
      .select(col("id"), col("seed_label"),
        col("seed_label").as("label"))
    for (i <- 1 to iters) {
      val votes = e
        .join(lab.select(col("id").as("dst0"), col("label").as("nbr_label")),
          col("dst") === col("dst0"))
        .filter(col("nbr_label").isNotNull)
        .groupBy(col("src"), col("nbr_label"))
        .agg(count(lit(1)).as("v"))
      val winner = votes.groupBy("src")
        .agg(max(struct(col("v"), (-col("nbr_label")).as("neg"),
          col("nbr_label").as("lab")))("lab").as("maj"))
      lab = lab.join(winner, col("id") === col("src"), "left")
        .select(col("id"), col("seed_label"),
          coalesce(col("seed_label"), col("maj"), col("label")).as("label"))
      if (i % checkpointEvery == 0) lab = lab.localCheckpoint()
    }
    lab.select(col("id"), col("label"),
      col("seed_label").isNotNull.as("is_seed"))
  }
}
