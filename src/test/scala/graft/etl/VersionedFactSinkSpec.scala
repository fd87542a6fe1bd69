package graft.etl

import java.nio.file.{Files, Paths}

import graft.SparkTestBase

class VersionedFactSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Int)] =
    df.collect().map(r => (r.getAs[Int]("date_id"), r.getAs[Int]("year"),
      r.getAs[Int]("v"))).toSet

  test("commit protocol: write, copy-on-write merge, time travel, idempotent replay") {
    val dir = Files.createTempDirectory("graft_txn_sink").toString
    val sink = new VersionedFactSink(dir)
    assert(sink.currentVersion == -1)

    sink.writeFull(Seq((20211231, 2021, 1), (20220101, 2022, 1))
      .toDF("date_id", "year", "v"))
    assert(sink.currentVersion == 0)
    assert(rows(sink.read(spark)) ==
      Set((20211231, 2021, 1), (20220101, 2022, 1)))

    // merge rewrites ONLY 2022; 2021 keeps its original data dir
    val slice = Seq((20220101, 2022, 2), (20220102, 2022, 2))
      .toDF("date_id", "year", "v")
    sink.mergePartitions(slice)
    assert(sink.currentVersion == 1)
    assert(rows(sink.read(spark)) ==
      Set((20211231, 2021, 1), (20220101, 2022, 2), (20220102, 2022, 2)))

    // time travel: version 0 is still the pre-merge table
    assert(rows(sink.readVersion(spark, 0)) ==
      Set((20211231, 2021, 1), (20220101, 2022, 1)))

    // replaying the same slice converges to the same content
    sink.mergePartitions(slice)
    assert(sink.currentVersion == 2)
    assert(rows(sink.read(spark)) ==
      Set((20211231, 2021, 1), (20220101, 2022, 2), (20220102, 2022, 2)))
  }

  test("readers never see uncommitted data; vacuum reclaims it and old versions") {
    val dir = Files.createTempDirectory("graft_txn_vac").toString
    val sink = new VersionedFactSink(dir)
    sink.writeFull(Seq((20210101, 2021, 1)).toDF("date_id", "year", "v"))
    sink.mergePartitions(Seq((20220101, 2022, 1)).toDF("date_id", "year", "v"))

    // simulate a crashed writer: data landed, pointer swap never happened
    val orphan = Paths.get(dir, "data", "crashed-writer", "y2030")
    Files.createDirectories(orphan)
    Seq((20300101, 2030, 9)).toDF("date_id", "year", "v")
      .write.mode("overwrite").parquet(orphan.toString)
    assert(!rows(sink.read(spark)).exists(_._2 == 2030), "orphan visible!")

    val deleted = sink.vacuum(keepVersions = 1)
    assert(deleted.exists(_.contains("crashed-writer")), s"orphan kept: $deleted")
    // current version survives vacuum intact...
    assert(rows(sink.read(spark)) ==
      Set((20210101, 2021, 1), (20220101, 2022, 1)))
    // ...while the pre-merge manifest is gone
    intercept[IllegalArgumentException](sink.readVersion(spark, 0))
  }

  test("vacuum with a wider horizon than an earlier vacuum still works") {
    val dir = Files.createTempDirectory("graft_txn_vac2").toString
    val sink = new VersionedFactSink(dir)
    (1 to 6).foreach(i =>
      sink.mergePartitions(Seq((20200000 + i, 2020, i)).toDF("date_id", "year", "v")))
    sink.vacuum(keepVersions = 1) // deletes manifests v0..v4
    sink.mergePartitions(Seq((20210101, 2021, 7)).toDF("date_id", "year", "v"))
    // horizon now spans versions already deleted by the earlier vacuum —
    // must walk the manifests that EXIST, not assume a dense range
    val deleted = sink.vacuum(keepVersions = 5)
    assert(rows(sink.read(spark)).map(_._3).max == 7)
    assert(deleted.isEmpty || deleted.forall(!_.contains("y2021")))
  }

  test("vacuum on a non-normalized dir spelling never deletes live data") {
    val real = Files.createTempDirectory("graft_txn_norm").toString
    // trailing slash + redundant "./" segment: raw string comparison of
    // manifest paths vs Files.list results would retain NOTHING and vacuum
    // would delete the current version's data
    val sink = new VersionedFactSink(real + "/./")
    sink.writeFull(Seq((20210101, 2021, 1)).toDF("date_id", "year", "v"))
    sink.mergePartitions(Seq((20220101, 2022, 2)).toDF("date_id", "year", "v"))
    val deleted = sink.vacuum(keepVersions = 1)
    assert(deleted.forall(p => !p.contains("y2021") && !p.contains("y2022")),
      s"vacuum deleted live data: $deleted")
    assert(rows(sink.read(spark)) ==
      Set((20210101, 2021, 1), (20220101, 2022, 2)))
    // and a differently-spelled handle to the same store reads the same
    assert(rows(new VersionedFactSink(real).read(spark)) ==
      Set((20210101, 2021, 1), (20220101, 2022, 2)))
  }

  test("an empty truncate leaves a readable empty table, not a bricked one") {
    val dir = Files.createTempDirectory("graft_txn_empty").toString
    val sink = new VersionedFactSink(dir)
    sink.writeFull(Seq((20210101, 2021, 1)).toDF("date_id", "year", "v"))
    sink.writeFull(Seq.empty[(Int, Int, Int)].toDF("date_id", "year", "v"))
    val empty = sink.read(spark)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("date_id", "year", "v"))
    // and time travel to the non-empty version still works
    assert(rows(sink.readVersion(spark, 0)) == Set((20210101, 2021, 1)))
  }

  test("streaming fact merger composes with the transactional sink") {
    val dir = Files.createTempDirectory("graft_txn_merge").toString
    val sink = new VersionedFactSink(dir)
    val stage = Files.createTempDirectory("graft_txn_stage").toString
    val merger = new graft.streaming.StreamingIngest.FactMerger(spark, stage,
      Transform.userCountry(
        Seq(("u1", "P1")).toDF("user_id", "postal_code"),
        Seq(("P1", 10)).toDF("postal_code", "city_id"),
        Seq((10, 1)).toDF("city_id", "country_id")),
      Transform.assetSport(Seq(("DEL-001", "Ice Hockey")).toDF("asset_id", "sport")),
      sink)
    val txns = Seq((1L, "u1", "DEL-001", "2022-01-01", 30, 1))
      .toDF("transaction_id", "user_id", "asset_id", "streaming_date",
        "minutes_streamed", "completed")
    merger.mergeBatch(txns, 0L)
    assert(sink.currentVersion == 0)
    val fact = sink.read(spark).collect()
    assert(fact.length == 1)
    assert(fact.head.getAs[Long]("total_minutes_streamed") == 30L)
  }

  test("concurrent writers: exactly one claims a version, the loser fails loudly") {
    // r7/r8 verdict #7: two writers interleaving _latest renames could
    // silently drop a version. The commit now CAS-claims its manifest
    // file (CREATE_NEW) before any data lands. Deterministic interleave:
    // writer A's claim is placed exactly where the real commit puts it
    // (an empty v00001.json — what a mid-commit writer's directory looks
    // like), then writer B — a separate sink instance, as from another
    // process — commits against the same table.
    val dir = Files.createTempDirectory("graft_txn_race").toString
    val a = new VersionedFactSink(dir)
    a.writeFull(Seq((20210101, 2021, 1)).toDF("date_id", "year", "v"))
    assert(a.currentVersion == 0)
    // writer A mid-commit: has claimed v1, data not yet written
    Files.write(Paths.get(dir, "_versions", "v00001.json"),
      Array.emptyByteArray,
      java.nio.file.StandardOpenOption.CREATE_NEW)
    // writer B loses the race for v1 — loudly, before writing any data
    val b = new VersionedFactSink(dir)
    val e1 = intercept[IllegalStateException](
      b.mergePartitions(Seq((20220102, 2022, 2)).toDF("date_id", "year", "v")))
    assert(e1.getMessage.contains("claimed"), e1.getMessage)
    val e2 = intercept[IllegalStateException](
      b.writeFull(Seq((20220103, 2022, 3)).toDF("date_id", "year", "v")))
    assert(e2.getMessage.contains("claimed"), e2.getMessage)
    // the loser changed NOTHING: table still serves version 0 intact,
    // and no orphan data dirs were written for the failed commits
    assert(b.currentVersion == 0)
    assert(rows(b.read(spark)) == Set((20210101, 2021, 1)))
    val dataDirs = Files.list(Paths.get(dir, "data")).count()
    assert(dataDirs == 1, s"loser strands data dirs: $dataDirs")
    // releasing the crashed claim (the documented repair) unblocks
    Files.delete(Paths.get(dir, "_versions", "v00001.json"))
    b.mergePartitions(Seq((20220102, 2022, 2)).toDF("date_id", "year", "v"))
    assert(b.currentVersion == 1)
    assert(rows(b.read(spark)) == Set((20210101, 2021, 1), (20220102, 2022, 2)))
  }
}
