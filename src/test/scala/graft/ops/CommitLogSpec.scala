package graft.ops

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concurrent-writer semantics of the versioned-table commit log: the
  * isolation guarantee a real table format makes — of two writers racing
  * to publish the same version, exactly one wins; the loser must rebase
  * and its data is never visible to readers. */
class CommitLogSpec extends SparkSpec {

  private def freshTable(tag: String): String =
    Files.createTempDirectory(s"graft_commitlog_$tag").toString

  test("two racing writers: exactly one commits, the other conflicts") {
    val table = freshTable("race")
    val pool = Executors.newFixedThreadPool(2)
    try {
      // both writers snapshot the same base version (empty table, V=0) and
      // race the v1 slot across many rounds to actually exercise the race
      for (round <- 1 to 20) {
        val base = CommitLog.latest(table).map(_.version).getOrElse(0L)
        val barrier = new CyclicBarrier(2)
        val results = (0 until 2).map { w =>
          pool.submit { () =>
            barrier.await(5, TimeUnit.SECONDS)
            try Right(CommitLog.commit(table, base, s"$table/data_r${round}_w$w"))
            catch { case e: CommitLog.CommitConflictException => Left(e) }
          }
        }.map(_.get(10, TimeUnit.SECONDS))
        assert(results.count(_.isRight) == 1,
          s"round $round: expected exactly one winner, got $results")
        assert(results.count(_.isLeft) == 1,
          s"round $round: expected exactly one conflict, got $results")
        // the log advanced by exactly one version, pointing at the winner
        val latest = CommitLog.latest(table).get
        assert(latest.version == base + 1)
        val winnerDir = results.collectFirst { case Right(c) => c.dataDir }.get
        assert(latest.dataDir == winnerDir,
          "reader must resolve to the winning writer's data")
      }
    } finally pool.shutdownNow()
  }

  test("loser rebases onto the winner's version and then succeeds") {
    val table = freshTable("rebase")
    CommitLog.commit(table, 0, s"$table/data_a")
    // a second writer that snapshotted V=0 is now stale
    intercept[CommitLog.CommitConflictException] {
      CommitLog.commit(table, 0, s"$table/data_b_stale")
    }
    // rebase: re-read latest, re-apply on top, commit the next slot
    val rebasedBase = CommitLog.latest(table).get.version
    val c = CommitLog.commit(table, rebasedBase, s"$table/data_b_rebased")
    assert(c.version == 2)
    assert(CommitLog.entries(table).map(_.dataDir) ==
      Seq(s"$table/data_a", s"$table/data_b_rebased"),
      "the stale attempt's data dir must never enter the log")
  }

  test("committed versions stay byte-stable while latest advances") {
    val table = freshTable("isolation")
    val v1 = spark.range(5).select(col("id"))
    v1.write.parquet(s"$table/data_v1")
    CommitLog.commit(table, 0, s"$table/data_v1")
    val before = CommitLog.read(spark, table, 1).collect().map(_.getLong(0)).sorted
    // a new version lands and publishes; the pinned v1 read is unchanged
    spark.range(100).select(col("id")).write.parquet(s"$table/data_v2")
    CommitLog.commit(table, 1, s"$table/data_v2")
    val after = CommitLog.read(spark, table, 1).collect().map(_.getLong(0)).sorted
    assert(before.sameElements(after), "pinned version drifted")
    assert(CommitLog.read(spark, table, 2).count() == 100)
    assert(CommitLog.latest(table).get.version == 2)
  }

  test("vacuum bounds history: old versions drop, survivors stay readable") {
    val table = freshTable("vacuum")
    for (v <- 1 to 4) {
      spark.range(v * 10).write.parquet(s"$table/data_v$v")
      CommitLog.commit(table, v - 1, s"$table/data_v$v")
    }
    val dropped = CommitLog.vacuum(table, keep = 2)
    assert(dropped.map(_.version) == Seq(1L, 2L))
    assert(CommitLog.entries(table).map(_.version) == Seq(3L, 4L))
    assert(!Files.exists(java.nio.file.Paths.get(s"$table/data_v1")))
    intercept[IllegalArgumentException] { CommitLog.read(spark, table, 2) }
    assert(CommitLog.read(spark, table, 3).count() == 30)
    assert(CommitLog.read(spark, table, 4).count() == 40)
  }

  test("orphan sweep removes only unreferenced data dirs") {
    val table = freshTable("orphans")
    spark.range(5).write.parquet(s"$table/data_live")
    CommitLog.commit(table, 0, s"$table/data_live")
    spark.range(7).write.parquet(s"$table/data_conflict_loser")
    val swept = CommitLog.sweepOrphans(table)
    assert(swept.map(p => p.substring(p.lastIndexOf('/') + 1)) ==
      Seq("data_conflict_loser"))
    assert(Files.exists(java.nio.file.Paths.get(s"$table/data_live")))
    assert(Files.isDirectory(java.nio.file.Paths.get(s"$table/_commits")))
    assert(CommitLog.read(spark, table, 1).count() == 5)
  }

  test("uncommitted data is invisible: no log entry, no read") {
    val table = freshTable("invisible")
    spark.range(3).write.parquet(s"$table/data_orphan")
    assert(CommitLog.latest(table).isEmpty)
    intercept[IllegalArgumentException] {
      CommitLog.read(spark, table, 1)
    }
  }

  test("multi-table transaction: racing writers publish all-or-nothing") {
    val txn = freshTable("txn")
    // seed v1 so both racers rebase from a real snapshot
    spark.range(10).write.parquet(s"$txn/facts_v1")
    spark.range(1).write.parquet(s"$txn/summary_v1")
    CommitLog.commitTables(txn, 0,
      Seq("facts" -> s"$txn/facts_v1", "summary" -> s"$txn/summary_v1"))
    val pool = Executors.newFixedThreadPool(2)
    try {
      val barrier = new CyclicBarrier(2)
      val results = (0 until 2).map { w =>
        spark.range(20 + w).write.parquet(s"$txn/facts_w$w")
        spark.range(1).write.parquet(s"$txn/summary_w$w")
        pool.submit { () =>
          barrier.await(5, TimeUnit.SECONDS)
          try Right(CommitLog.commitTables(txn, 1,
            Seq("facts" -> s"$txn/facts_w$w", "summary" -> s"$txn/summary_w$w")))
          catch { case e: CommitLog.CommitConflictException => Left(e) }
        }
      }.map(_.get(10, TimeUnit.SECONDS))
      assert(results.count(_.isRight) == 1 && results.count(_.isLeft) == 1,
        s"expected exactly one winner: $results")
      // the manifest of v2 names BOTH of the winner's dirs — never a mix
      val dirs = CommitLog.tableDirs(txn, 2)
      val winner = results.collectFirst { case Right(c) => c }.get
      val w = if (winner.dataDir.contains("facts_w0")) 0 else 1
      assert(dirs == Map(
        "facts" -> s"$txn/facts_w$w", "summary" -> s"$txn/summary_w$w"))
      // pinned v1 still resolves the ORIGINAL consistent pair
      assert(CommitLog.tableDirs(txn, 1) == Map(
        "facts" -> s"$txn/facts_v1", "summary" -> s"$txn/summary_v1"))
      assert(CommitLog.readTable(spark, txn, 2, "facts").count() == 20 + w)
      // the loser's never-published dirs are sweepable orphans
      val orphans = CommitLog.sweepOrphans(txn)
      assert(orphans.exists(_.contains(s"facts_w${1 - w}")) &&
        orphans.exists(_.contains(s"summary_w${1 - w}")))
    } finally pool.shutdownNow()
  }
}
