package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transactional MERGE INTO through the commit log — the single most
  * common lakehouse write pattern (Delta/Iceberg `MERGE INTO target USING
  * changes`), composed from the two pieces the library already proves
  * separately: the full-outer merge shape (`rel_upsert`) and OCC isolation
  * (`CommitLog`). One merge = snapshot latest → apply clause-aware merge →
  * land survivors in a uniquely-named dir → publish via put-if-absent CAS;
  * a lost CAS REBASES (re-reads the winner's result, re-applies the same
  * change batch, tries the next version) so concurrent mergers serialize
  * and both change batches land — nothing is silently dropped.
  *
  * Merge semantics are CLAUSE-AWARE, not blind upsert:
  *   - op 'U' = WHEN MATCHED UPDATE (a U against a missing key is a no-op,
  *     NOT an insert — so a concurrent delete of the same key commutes);
  *   - op 'D' = WHEN MATCHED DELETE;
  *   - op 'I' = WHEN NOT MATCHED INSERT (an I against an existing key
  *     keeps the existing row).
  * This is exactly ANSI/Delta MERGE clause dispatch, and it is what makes
  * rebase sound: reapplying a batch on top of a foreign winner reaches the
  * same state as any serial order of commuting batches.
  *
  * Scale posture: the merge itself is ONE full-outer shuffle join keyed on
  * the merge key (broadcast when the change batch is small — Catalyst
  * picks it up from the batch's size), and the rewrite is copy-on-write at
  * table granularity here because the fixture table is one file group; a
  * production merge prunes the rewrite to the files whose key ranges the
  * change batch touches (the `src_manifest_pruned` machinery), making the
  * write cost ∝ touched files, not table size. Rebase re-runs only the
  * join, never re-reads the change batch's source.
  */
object MergeOps {

  /** Clause-aware MERGE of `changes` (`o_orderkey`, `op` ∈ U/D/I,
    * `new_price`) into `table` (`o_orderkey`, `o_orderstatus`,
    * `o_totalprice`). Returns the post-merge row set. */
  def applyMerge(table: DataFrame, changes: DataFrame): DataFrame = {
    val joined = table.as("b").join(changes.as("c"), Seq("o_orderkey"), "full_outer")
    // base-side presence probe: o_orderstatus is non-null on every base row
    val matched = col("b.o_orderstatus").isNotNull
    joined
      .filter((matched && coalesce(col("c.op"), lit("")) =!= "D") ||
        (!matched && col("c.op") === "I"))
      .select(col("o_orderkey"),
        when(matched, col("b.o_orderstatus")).otherwise(lit("NEW"))
          .as("o_orderstatus"),
        when(matched,
          when(col("c.op") === "U", col("c.new_price"))
            .otherwise(col("b.o_totalprice")))
          .otherwise(col("c.new_price")).as("o_totalprice"))
  }

  /** One MERGE INTO round with rebase-on-conflict: the OCC loop of
    * CommitLog's scaladoc, step 2-3, retried until the CAS wins. Each
    * attempt lands in its own dir (`merge_<tag>_a<attempt>`) — losers'
    * dirs are unreferenced orphans, swept by `CommitLog.sweepOrphans`. */
  def mergeInto(s: SparkSession, tablePath: String, changes: DataFrame,
      tag: String, maxAttempts: Int = 10): CommitLog.Commit = {
    var attempt = 0
    while (true) {
      val base = CommitLog.latest(tablePath).getOrElse(
        throw new IllegalStateException(
          s"merge target $tablePath has no committed version"))
      val dir = s"$tablePath/merge_${tag}_a$attempt"
      applyMerge(s.read.parquet(base.dataDir), changes)
        .write.mode("overwrite").parquet(dir)
      try return CommitLog.commit(tablePath, base.version, dir)
      catch {
        case e: CommitLog.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1 // rebase: loop re-reads the new latest
      }
    }
    sys.error("unreachable")
  }
}
