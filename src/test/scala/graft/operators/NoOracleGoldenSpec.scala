package graft.operators

import graft.{Goldens, SparkTestBase}

/** Pins the 7 raw probabilistic bench-only queries (LSH/ANN candidate
  * sets the driver can't SQL-diff; their CONTRACT keys carry
  * oracle-checkable verdict forms) to committed golden hashes at sf0.01
  * and sf0.1 —
  * see [[graft.Goldens]] for why each golden is keyed to an input-table
  * fingerprint. A fingerprint mismatch means the driver regenerated the
  * testdata, NOT an engine bug: the test CANCELS with the refresh command
  * instead of failing, so a regeneration can't masquerade as a regression
  * (the d06a lesson), while any behavior change on UNCHANGED data — a
  * seed, a band constant, a quantizer default — fails the hash. */
class NoOracleGoldenSpec extends SparkTestBase {

  private lazy val goldens: Map[String, (String, String)] = {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(Goldens.goldensPath))
    // flat {"key": {"input": "...", "hash": "..."}} — parsed by regex to
    // avoid a JSON dependency in main code
    val entry =
      """"([^"]+)":\s*\{"input":\s*"([^"]+)",\s*"hash":\s*"([^"]+)"\}""".r
    entry.findAllMatchIn(txt).map(m => m.group(1) -> (m.group(2), m.group(3))).toMap
  }

  // one fingerprint computation per (sf, table), shared across the suite
  private val fpCache = scala.collection.mutable.Map[(String, String), String]()
  private def fingerprint(sfName: String, table: String): String =
    fpCache.getOrElseUpdate((sfName, table),
      Goldens.tableFingerprint(spark, sf(sfName), table))

  for (sfName <- Seq("sf0.01", "sf0.1"); q <- Goldens.queries) {
    test(s"golden: $q @ $sfName matches committed hash") {
      val key = s"$sfName/$q"
      val (wantInput, wantHash) = goldens.getOrElse(key,
        fail(s"no golden for $key — run: sbt \"runMain graft.Goldens\""))
      val table = Goldens.inputTable(q)
      val gotInput = fingerprint(sfName, table)
      assume(gotInput == wantInput,
        s"$sfName/$table regenerated since goldens were recorded " +
          s"(recorded $wantInput, found $gotInput) — refresh with: " +
          "sbt \"runMain graft.Goldens\"")
      val gotHash = Goldens.resultHash(
        Goldens.allQueries(q)(spark, sf(sfName)))
      assert(gotHash == wantHash,
        s"$key output changed on UNCHANGED input data — a probabilistic-" +
          s"path behavior change (seed/banding/quantizer), not a corpus " +
          s"change. recorded=$wantHash got=$gotHash")
    }
  }
}
