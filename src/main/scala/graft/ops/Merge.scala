package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change classification + SCD Type-2 merge, re-expressing the reference's
  * incremental load (`load_cleaned_dataframe`, etl2.py:298-412) as pure,
  * set-based DataFrame transforms.
  *
  * The reference classifies row-at-a-time (iterrows + per-row UPDATE,
  * etl2.py:347,386); here classification is three joins — anti (inserts,
  * etl2.py:329-331), inner + null-safe any-column-differs (updates,
  * etl2.py:270-296), reverse anti (deletes, etl2.py:383) — all of which
  * shuffle once on the primary key and scale linearly. Small `existing`
  * sides broadcast automatically under AQE.
  *
  * Null-safe `<=>` mirrors pandas `.compare`'s NaN==NaN handling
  * (SURVEY.md §7.4): without it a null column would churn spurious updates
  * into history on every batch.
  */
object Merge {

  /** Classified changes between an incoming batch and existing state.
    * `updates` carries the new image, `updatesOld` the superseded one
    * (same key set).
    */
  final case class Changes(
      inserts: DataFrame,
      updates: DataFrame,
      updatesOld: DataFrame,
      deletes: DataFrame
  )

  private def pkCond(l: DataFrame, r: DataFrame, pk: Seq[String]): Column =
    pk.map(k => l(k) === r(k)).reduce(_ && _)

  /** Compare columns = shared non-PK columns (etl2.py:284,289 intersects
    * column sets before `.compare`).
    */
  private def compareCols(incoming: DataFrame, existing: DataFrame,
                          pk: Seq[String]): Seq[String] =
    incoming.columns.toSeq.intersect(existing.columns.toSeq)
      .filterNot(pk.contains)

  /** Classify an incoming snapshot against existing state on `pk`.
    *
    * - inserts: in incoming, key absent from existing (J1)
    * - updates: key in both, any shared non-PK column differs under
    *   null-safe equality (J4)
    * - deletes: in existing, key absent from incoming (J6)
    */
  def classify(incoming: DataFrame, existing: DataFrame,
               pk: Seq[String]): Changes = {
    val inserts = incoming.join(existing.select(pk.map(col): _*), pk, "left_anti")
    val deletes = existing.join(incoming.select(pk.map(col): _*), pk, "left_anti")

    val cmp = compareCols(incoming, existing, pk)
    val n = incoming.alias("n")
    val d = existing.alias("d")
    val changed =
      if (cmp.isEmpty) lit(false)
      else cmp.map(c => !(col(s"n.$c") <=> col(s"d.$c"))).reduce(_ || _)
    val joined = n.join(d, pk.map(k => col(s"n.$k") === col(s"d.$k")).reduce(_ && _))
      .filter(changed)
    val updates = joined.select(incoming.columns.map(c => col(s"n.$c")): _*)
    val updatesOld = joined.select(existing.columns.map(c => col(s"d.$c")): _*)
    Changes(inserts, updates, updatesOld, deletes)
  }

  /** Post-merge state — the functional equivalent of the reference's
    * insert/UPDATE/tombstone sequence (T2-T4, etl2.py:329-412) computed as
    * one relation instead of per-row JDBC statements:
    *
    * - new keys appended with `is_deleted=false`, `updated_at=now`
    * - changed keys take the incoming payload, keep existing `is_deleted`
    *   (etl2.py:376-378), `updated_at=now`
    * - keys missing from incoming are tombstoned `is_deleted=true`,
    *   `updated_at=now` — but only when not already deleted, so the merge
    *   is a true no-op on re-apply (the reference re-runs its whole load
    *   twice, etl2.py:440-458, relying on this idempotence)
    * - unchanged keys pass through untouched
    *
    * `now` is injectable for deterministic tests/oracles (SURVEY.md §7.4).
    */
  def postState(incoming: DataFrame, existing: DataFrame, pk: Seq[String],
                now: Column = current_timestamp()): DataFrame = {
    val payload = incoming.columns.toSeq
    require(existing.columns.contains("is_deleted") &&
              existing.columns.contains("updated_at"),
            "existing state must carry is_deleted/updated_at bookkeeping")

    val ch = classify(incoming, existing, pk)

    val inserted = ch.inserts
      .withColumn("updated_at", now)
      .withColumn("is_deleted", lit(false))

    // updates: incoming payload + preserved is_deleted from the old image
    val updKeys = ch.updates.select(pk.map(col): _*)
    val oldFlags = ch.updatesOld.select((pk.map(col) :+ col("is_deleted")): _*)
    val updated = ch.updates
      .join(oldFlags, pk)
      .withColumn("updated_at", now)

    val delKeys = ch.deletes.filter(!col("is_deleted"))
      .select(pk.map(col): _*)
    val tombstoned = existing.join(delKeys, pk, "left_semi")
      .withColumn("is_deleted", lit(true))
      .withColumn("updated_at", now)

    // untouched = existing minus (updated ∪ tombstoned) keys
    val touchedKeys = updKeys.union(delKeys)
    val untouched = existing.join(touchedKeys, pk, "left_anti")

    val outCols = (payload ++ Seq("updated_at", "is_deleted")).distinct
    Seq(inserted, updated, tombstoned, untouched)
      .map(df => df.select(outCols.map(col): _*))
      .reduce(_ unionByName _)
  }

  /** SCD2 history rows for one merge: superseded images of updated rows
    * plus final images of deleted rows, each with a validity interval
    * `[valid_from = old.updated_at, valid_to = now)` (T3/T4,
    * etl2.py:354-368, 387-401). Appending is made idempotent with a
    * left-anti join against already-recorded history keys — replacing the
    * reference's caught-IntegrityError duplicate suppression
    * (etl2.py:364-368) with a set-based equivalent.
    */
  def scd2History(incoming: DataFrame, existing: DataFrame, pk: Seq[String],
                  existingHistory: Option[DataFrame] = None,
                  now: Column = current_timestamp()): DataFrame = {
    val ch = classify(incoming, existing, pk)
    val superseded = ch.updatesOld
    val deleted = ch.deletes.filter(!col("is_deleted"))
      .withColumn("is_deleted", lit(true))
    val rows = superseded.unionByName(deleted)
      .withColumn("valid_from", col("updated_at"))
      .withColumn("valid_to", now)
      .drop("updated_at")
    existingHistory match {
      case Some(h) => rows.join(h.select((pk :+ "valid_from").map(col): _*),
                                pk :+ "valid_from", "left_anti")
      case None => rows
    }
  }
}
