package graft.ops

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimistic-concurrency commit log for the versioned-table queries
  * (src_time_travel / src_gdpr_delete) — the isolation contract a real
  * table format (Delta/Iceberg) gives its writers, reduced to its core:
  * an append-only log of numbered commit entries, advanced by atomic
  * put-if-absent.
  *
  * Protocol (one round of Delta's OCC loop):
  *   1. writer snapshots `latest` (version V it will build on);
  *   2. writer lands its data files in a UNIQUELY-NAMED directory —
  *      never referenced until committed, so concurrent readers cannot
  *      see a partial write;
  *   3. writer publishes by creating log entry V+1 with put-if-absent.
  *      Exactly one of N racing writers wins; the losers get
  *      [[CommitConflictException]] and must REBASE (re-read latest,
  *      re-validate/re-apply their change, try V+2) — their orphaned data
  *      dir is garbage-collected by retention, never read.
  *
  * The put-if-absent primitive is `Files.createLink` (POSIX link(2)):
  * atomic, exclusive, and the entry appears with its content fully
  * written — no reader-visible window where the pointer file exists but
  * is empty (a plain create-then-write would have one; a check-then-move
  * is racy because Java emulates NOFOLLOW rename exclusivity with a
  * non-atomic existence check). On an object store the same slot is a
  * conditional PUT (if-none-match) on the log key.
  *
  * Readers resolve a version to its data directory through the log only,
  * so any committed version stays byte-stable (time travel) and `latest`
  * moves atomically from one complete version to the next.
  */
object CommitLog {

  final case class Commit(version: Long, dataDir: String)

  final class CommitConflictException(tablePath: String, version: Long,
      cause: Throwable) extends RuntimeException(
    s"commit v$version of $tablePath lost the race: another writer published it first",
    cause)

  private def logDir(tablePath: String): Path = Paths.get(tablePath, "_commits")
  private def entryName(v: Long): String = f"$v%020d.commit"
  private def checkpointName(v: Long): String = f"$v%020d.checkpoint"
  private def hintFile(tablePath: String): Path =
    logDir(tablePath).resolve("_last_checkpoint")

  /** Every `checkpointInterval`-th commit also writes a rolled-up
    * checkpoint (the full resolved entry list at that version) plus a
    * `_last_checkpoint` hint, so readers resolve the log from ONE
    * checkpoint read + the ≤ interval-sized tail of `.commit` files —
    * never O(n_versions) reads. Same shape as Delta's `.checkpoint.parquet`
    * + `_last_checkpoint`, reduced to its core. */
  val checkpointInterval: Int = 10

  /** Driver-side log-file reads (commit/checkpoint/hint contents) —
    * instrumentation for the spec that pins the checkpointed read path to
    * O(tail), not O(versions). */
  private val reads = new java.util.concurrent.atomic.AtomicLong
  def fileReadCount: Long = reads.get
  private def readLogFile(p: Path): String = {
    reads.incrementAndGet()
    Files.readString(p)
  }

  // Checkpoint wire format: one line per commit, "<version> <base64(payload)>".
  // Payloads are base64'd because a multi-table manifest payload is itself
  // multi-line (see commitTables).
  private def renderCheckpoint(es: Seq[Commit]): String =
    es.map { c =>
      val b64 = java.util.Base64.getEncoder
        .encodeToString(c.dataDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      s"${c.version} $b64"
    }.mkString("\n")

  private def parseCheckpoint(text: String): Seq[Commit] =
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf(' ')
      require(i > 0, s"malformed checkpoint line: $line")
      Commit(line.substring(0, i).toLong,
        new String(java.util.Base64.getDecoder.decode(line.substring(i + 1)),
          java.nio.charset.StandardCharsets.UTF_8))
    }.toSeq.sortBy(_.version)

  private def readHint(tablePath: String): Option[Long] = {
    val h = hintFile(tablePath)
    if (!Files.exists(h)) None
    else try Some(readLogFile(h).trim.toLong)
    catch { case _: NumberFormatException => None }
  }

  /** Publish a checkpoint of `es` at version `v` and advance the hint.
    * The checkpoint file is put-if-absent (only version v's winner writes
    * it, but a vacuum may legitimately have replaced it — hence tolerate
    * existing); the hint is an atomic-rename overwrite and purely a
    * performance hint — a stale or missing hint only means readers fall
    * back to the full listing, never a wrong answer. */
  private def writeCheckpoint(tablePath: String, v: Long, es: Seq[Commit]): Unit = {
    val d = logDir(tablePath)
    val target = d.resolve(checkpointName(v))
    val tmp = Files.createTempFile(d, ".ckpt_", ".tmp")
    try {
      Files.writeString(tmp, renderCheckpoint(es))
      try Files.createLink(target, tmp)
      catch { case _: FileAlreadyExistsException => () }
    } finally Files.deleteIfExists(tmp)
    val hintTmp = Files.createTempFile(d, ".hint_", ".tmp")
    try {
      Files.writeString(hintTmp, v.toString)
      Files.move(hintTmp, hintFile(tablePath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(hintTmp)
  }

  /** Remove every log entry (fixture-table reset between query runs; a
    * production table never does this — retention trims old versions
    * instead). */
  def reset(tablePath: String): Unit = {
    val d = logDir(tablePath)
    if (Files.isDirectory(d)) {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq.foreach(Files.deleteIfExists)
      finally s.close()
    }
  }

  /** All committed versions in order. Pending temp files are invisible —
    * only `.commit` entries are part of the table.
    *
    * Read path: resolve the `_last_checkpoint` hint → read ONE checkpoint
    * file → probe the contiguous `.commit` tail past it (versions are
    * gapless by construction: each commit CASes expectedVersion+1). Total
    * driver-side reads = 1 hint + 1 checkpoint + tail (< interval), no
    * matter how many thousands of versions the table has accumulated —
    * the difference between a log that survives a week of per-micro-batch
    * streaming commits and one that re-reads its whole history per query.
    * A missing/stale/damaged checkpoint falls back to the full listing
    * (correct, just O(n)). */
  def entries(tablePath: String): Seq[Commit] = {
    val d = logDir(tablePath)
    if (!Files.isDirectory(d)) Seq.empty
    else readHint(tablePath) match {
      case Some(cv) if Files.exists(d.resolve(checkpointName(cv))) =>
        val base = parseCheckpoint(readLogFile(d.resolve(checkpointName(cv))))
        base ++ tailFrom(tablePath, cv + 1)
      case _ => listAll(tablePath)
    }
  }

  /** Contiguous `.commit` entries from version `from` upward (existence
    * probes are cheap stats; only present entries are read). */
  private def tailFrom(tablePath: String, from: Long): Seq[Commit] = {
    val d = logDir(tablePath)
    val out = Seq.newBuilder[Commit]
    var v = from
    while (Files.exists(d.resolve(entryName(v)))) {
      out += Commit(v, readLogFile(d.resolve(entryName(v))).trim)
      v += 1
    }
    out.result()
  }

  /** Checkpoint-free fallback: list and read every `.commit` file. */
  private def listAll(tablePath: String): Seq[Commit] = {
    val d = logDir(tablePath)
    val s = Files.list(d)
    try s.iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".commit"))
      .map { p =>
        Commit(p.getFileName.toString.stripSuffix(".commit").toLong,
          readLogFile(p).trim)
      }.sortBy(_.version)
    finally s.close()
  }

  def latest(tablePath: String): Option[Commit] = entries(tablePath).lastOption

  /** CAS pointer advance: publish `dataDir` as version `expectedVersion+1`.
    * Throws [[CommitConflictException]] iff another writer committed that
    * version first — the caller's snapshot is stale and it must rebase. */
  def commit(tablePath: String, expectedVersion: Long, dataDir: String): Commit = {
    Files.createDirectories(logDir(tablePath))
    val next = expectedVersion + 1
    val target = logDir(tablePath).resolve(entryName(next))
    val tmp = Files.createTempFile(logDir(tablePath), ".pending_", ".tmp")
    try {
      Files.writeString(tmp, dataDir)
      Files.createLink(target, tmp)
      // only the winner of version `next` reaches here, so at most one
      // writer checkpoints any given version — no checkpoint race
      if (next % checkpointInterval == 0)
        writeCheckpoint(tablePath, next,
          entries(tablePath).filter(_.version <= next))
      Commit(next, dataDir)
    } catch {
      case e: FileAlreadyExistsException =>
        throw new CommitConflictException(tablePath, next, e)
    } finally Files.deleteIfExists(tmp)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.iterator().asScala.toSeq.foreach(deleteRecursively)
        finally s.close()
      }
      Files.deleteIfExists(p)
    }

  /** The data directories a commit's payload references. A plain commit's
    * payload IS a directory; a [[commitTables]] payload is a multi-line
    * `name=dir` manifest — every dir of the manifest is live. GC
    * (vacuum/sweepOrphans) must see through both, or a multi-table log
    * would treat the whole manifest string as one (nonexistent) path and
    * delete every live committed dir as "unreferenced". A manifest line is
    * recognized by a '='-separated name containing no path separator, so a
    * plain directory payload is never mis-split. */
  private[graft] def payloadDirs(payload: String): Seq[String] =
    payload.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      if (i > 0 && !line.substring(0, i).contains('/')) line.substring(i + 1)
      else line
    }.toSeq

  /** Retention: drop every version except the newest `keep`, deleting both
    * the log entries and their data directories (ALL dirs of a multi-table
    * manifest). Time travel to a dropped version then fails loudly (the
    * Delta/Iceberg VACUUM contract: history is bounded by retention, never
    * silently wrong). Deletion order is data first, log entry last, so a
    * reader racing the vacuum either resolves a vanished file (loud error)
    * or misses the entry entirely — it can never read a partial row set
    * presented as complete. Checkpoints covering dropped versions are
    * replaced by a fresh checkpoint of the survivors (the hint is removed
    * first so a racing reader falls back to the listing, never resolves a
    * dropped version through a stale checkpoint). */
  def vacuum(tablePath: String, keep: Int): Seq[Commit] = {
    require(keep >= 1, "vacuum must keep at least the latest version")
    val all = entries(tablePath)
    val drop = all.dropRight(keep)
    Files.deleteIfExists(hintFile(tablePath))
    val d = logDir(tablePath)
    if (Files.isDirectory(d)) {
      val s = Files.list(d)
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".checkpoint"))
        .foreach(Files.deleteIfExists)
      finally s.close()
    }
    drop.foreach { c =>
      payloadDirs(c.dataDir).foreach(dir => deleteRecursively(Paths.get(dir)))
      Files.deleteIfExists(logDir(tablePath).resolve(entryName(c.version)))
    }
    val survivors = all.drop(drop.length)
    survivors.lastOption.foreach(last =>
      writeCheckpoint(tablePath, last.version, survivors))
    drop
  }

  /** Remove data directories never referenced by any committed version —
    * the debris of conflict losers (their uniquely-named dirs were written
    * before the CAS they lost) and of crashed writers. Only immediate
    * subdirectories of the table path are candidates; the log dir and
    * every committed dir (including every dir of a multi-table manifest)
    * are kept. */
  def sweepOrphans(tablePath: String): Seq[String] = {
    val referenced = entries(tablePath)
      .flatMap(c => payloadDirs(c.dataDir))
      .map(dir => Paths.get(dir).toAbsolutePath.normalize).toSet
    val root = Paths.get(tablePath)
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      val orphans =
        try s.iterator().asScala.toSeq.filter { p =>
          Files.isDirectory(p) && p.getFileName.toString != "_commits" &&
            !referenced.contains(p.toAbsolutePath.normalize)
        }
        finally s.close()
      orphans.foreach(deleteRecursively)
      orphans.map(_.toString)
    }
  }

  /** Resolve and read a pinned version (time travel) through the log. */
  def read(s: SparkSession, tablePath: String, version: Long): DataFrame = {
    val c = entries(tablePath).find(_.version == version).getOrElse(
      throw new IllegalArgumentException(
        s"$tablePath has no committed version $version"))
    s.read.parquet(c.dataDir)
  }

  // ---- Multi-table transactions -------------------------------------------
  //
  // The entry payload is opaque to the CAS, so one atomic link(2) can
  // publish a MANIFEST of tables ("name=dir" lines) instead of a single
  // directory: either every table of the transaction becomes visible at
  // version V+1 or none does, and a reader resolving version V always
  // gets a mutually-consistent set of directories — the cross-table
  // atomicity Delta-style single-table logs cannot give (their multi-table
  // "transactions" are N independent commits with a visible window).

  /** Atomically publish a consistent snapshot of several named tables as
    * one transaction version. Same OCC contract as [[commit]]. */
  def commitTables(txnPath: String, expectedVersion: Long,
      tables: Seq[(String, String)]): Commit =
    commit(txnPath, expectedVersion,
      tables.sortBy(_._1).map { case (n, d) => s"$n=$d" }.mkString("\n"))

  /** The table-name → data-dir manifest of a pinned transaction version. */
  def tableDirs(txnPath: String, version: Long): Map[String, String] = {
    val c = entries(txnPath).find(_.version == version).getOrElse(
      throw new IllegalArgumentException(
        s"$txnPath has no committed version $version"))
    c.dataDir.split("\n").iterator.map(_.trim).filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i > 0, s"malformed manifest line: $line")
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
  }

  /** Read one named table of a pinned transaction version. */
  def readTable(s: SparkSession, txnPath: String, version: Long,
      name: String): DataFrame = {
    val dirs = tableDirs(txnPath, version)
    s.read.parquet(dirs.getOrElse(name,
      throw new IllegalArgumentException(
        s"transaction v$version of $txnPath has no table '$name'")))
  }
}
