package graft.streaming

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame

/** Idempotent JDBC key-upsert sink for `foreachBatch`
  * (reference: spark_processor/processor.py:116-172).
  *
  * Semantics match the reference's staging-table + `ON CONFLICT DO UPDATE`
  * merge: each micro-batch is staged via Spark's parallel JDBC writer, then
  * one driver-side transaction deletes target rows whose keys appear in
  * staging and inserts the staged rows. Delete+insert inside a transaction
  * is the portable ANSI form of a key upsert — it runs on any JDBC database
  * (tests use embedded Derby; production Postgres could swap in
  * `INSERT ... ON CONFLICT` without changing semantics).
  *
  * Exactly-once-ish delivery = streaming checkpoint (offsets + state) plus
  * this idempotence: replaying a batch after recovery converges to the same
  * final table, which the spec verifies by applying a batch twice.
  *
  * The reference's `df.isEmpty()` + `df.count()` sink guards recompute the
  * micro-batch twice before writing (processor.py:117-121) — here the only
  * action is the staged write itself.
  */
object JdbcUpsertSink {

  /** Returns a `foreachBatch`-shaped sink upserting into `table` on `keys`.
    * Columns of the batch DataFrame define the staged schema; `table` must
    * exist with a compatible schema.
    */
  def upsert(url: String, table: String, keys: Seq[String])
      : (DataFrame, Long) => Unit = { (df, epochId) =>
    val staging = s"${table}_staging_$epochId"
    // Stage string columns as VARCHAR: some dialects (Derby) default
    // StringType to CLOB/TEXT types that can't appear in key comparisons.
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(255)")
    // parallel executor-side write; overwrite makes batch replay idempotent
    val w = df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", staging)
      .mode("overwrite")
    (if (stringCols.nonEmpty)
       w.option("createTableColumnTypes", stringCols.mkString(", "))
     else w).save()
    // Spark's JDBC writer passes `dbtable` through unquoted but quotes
    // COLUMN identifiers it creates, so the merge SQL does the same; the
    // target table must be created with case-matching (quoted/lowercase)
    // column names.
    def q(id: String) = "\"" + id + "\""
    val cols = df.columns.map(q)
    val keyPred = keys
      .map(k => s"t.${q(k)} = s.${q(k)}")
      .mkString(" AND ")
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        st.executeUpdate(
          s"DELETE FROM $table t WHERE EXISTS (SELECT 1 FROM $staging s WHERE $keyPred)")
        st.executeUpdate(
          s"INSERT INTO $table (${cols.mkString(", ")}) SELECT ${cols.mkString(", ")} FROM $staging")
        st.executeUpdate(s"DROP TABLE $staging")
        conn.commit()
      } catch {
        case e: Throwable =>
          conn.rollback()
          throw e // fail the streaming query like the reference (processor.py:170-172)
      } finally st.close()
    } finally conn.close()
  }
}
