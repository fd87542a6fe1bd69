package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sport inference from asset-ID prefix — the reference's signature
  * transform (`loadAnalyticsDB.PractII.VarmaA.R:272-285`), as a native
  * when/rlike cascade (codegen'd; no UDF).
  *
  * The anchored `prefix-` alternations are non-overlapping by construction:
  * `ICEHL-` does not match the ice-hockey pattern (which requires a literal
  * `-` right after `ICE`) and correctly falls through to inline hockey.
  * Unknown prefixes (e.g. OXXX-, MSL-) yield NULL and are dropped by the
  * quality gate, mirroring README.md:191-198.
  */
object SportInference {
  val IceHockeyPattern = "^(DEL|AHL|AIH|IHB|SIH|NLN|NLA|ICE|NXXX|SLXXX)-"
  val InlineHockeyPattern = "^(IHL|ICEHL)-"
  val SkiJumpingPattern = "^(SKJ|SKA|FIS)-"

  def inferSport(assetId: Column): Column =
    when(assetId.rlike(IceHockeyPattern), "Ice Hockey")
      .when(assetId.rlike(InlineHockeyPattern), "Inline Hockey")
      .when(assetId.rlike(SkiJumpingPattern), "Ski Jumping")
      .otherwise(lit(null).cast("string"))
}
