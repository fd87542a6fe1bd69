package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** F4 cascade coverage: every prefix from the reference
  * (`loadAnalyticsDB.PractII.VarmaA.R:275-283`), the OXXX-/MSL- negatives
  * (README.md:191-198), and the ICEHL- near-collision (FIXTURES.md). */
class SportInferenceSpec extends SparkTestBase {
  import spark.implicits._

  private def infer(ids: String*): Map[String, String] =
    ids.toDF("asset_id")
      .select(col("asset_id"), SportInference.inferSport(col("asset_id")).as("sport"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("all ice-hockey prefixes classify") {
    val ids = Seq("DEL", "AHL", "AIH", "IHB", "SIH", "NLN", "NLA", "ICE",
      "NXXX", "SLXXX").map(_ + "-123")
    assert(infer(ids: _*).values.toSet == Set("Ice Hockey"))
  }

  test("inline-hockey prefixes classify, including the ICEHL near-collision") {
    assert(infer("IHL-1", "ICEHL-1").values.toSet == Set("Inline Hockey"))
  }

  test("ski-jumping prefixes classify") {
    assert(infer("SKJ-1", "SKA-1", "FIS-1").values.toSet == Set("Ski Jumping"))
  }

  test("unknown prefixes and prefix-free ids yield NULL (to be dropped)") {
    val m = infer("OXXX-1", "MSL-9", "random", "DEL9", "ICEX-1")
    assert(m.values.forall(_ == null))
  }

  test("prefix must be followed by a literal dash") {
    val m = infer("DELTA-1", "FISH-2")
    assert(m.values.forall(_ == null))
  }
}
