package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.Row

import graft.streaming.SkewAdvisorStream

/** Streaming skew/salt advisory vs its batch twins: feeding the real
  * sf0.001 events through MemoryStream (two micro-batches, split by
  * event_id) and upserting every foreachBatch refresh into an advisory
  * map must converge to EXACTLY the batch `salt_plan` table (same
  * shared arithmetic, single-sourced), with the intermediate state
  * refined — not final — after batch 1. The join-size leg pins the
  * streamed sampled-count estimate against the batch
  * `join_size_estimate` arithmetic on the same orders⋈lineitem keys,
  * and the second drain resumes from the first's checkpoint so count
  * state recovery is on the correctness path.
  */
class SkewAdvisorStreamSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  case class Ev(event_id: Long, event_type: String)
  case class K(k: Long)

  test("advisory upserts converge to the batch salt_plan; refinement across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type").collect()
      .map(r => Ev(r.getLong(0), r.getString(1)))
      .sortBy(_.event_id)
    val mid = evs(evs.length / 2).event_id

    val input = MemoryStream[Ev]
    val counts = SkewAdvisorStream.keyCounts(input.toDF())
    val ck = java.nio.file.Files.createTempDirectory("skewadv_ckpt").toString
    // the advisory table: latest row per key wins (upsert semantics)
    val table = mutable.Map[String, (Long, Long, Long)]()
    var refreshes = 0L
    // drives the PRODUCTION entry point itself (advisories), not an
    // inline re-implementation of its body
    def drain(): Unit = {
      val q = SkewAdvisorStream.advisories(counts, ck) { (rows, _) =>
        rows.foreach { r =>
          table(r.getAs[String]("key")) = (r.getAs[Long]("cnt"),
            r.getAs[Long]("n_salts"), r.getAs[Long]("post_rows_max"))
        }
        refreshes += 1
      }
      q.awaitTermination()
    }

    input.addData(evs.filter(_.event_id < mid).toSeq)
    drain()
    val after1 = table.toMap
    assert(after1.nonEmpty, "no advisory rows after batch 1")

    input.addData(evs.filter(_.event_id >= mid).toSeq)
    drain() // resumes from checkpoint: running counts must be intact

    val batchPlan = SparkEntry.queries("salt_plan")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> (r.getAs[Long]("cnt"),
        r.getAs[Long]("n_salts"), r.getAs[Long]("post_rows_max"))).toMap
    assert(table.toMap == batchPlan,
      s"final advisory != batch salt_plan\nstream=$table\nbatch=$batchPlan")
    // refinement actually happened: batch-1 counts were partial
    assert(after1 != batchPlan, "split degenerate — batch 1 already final")
    assert(after1.values.map(_._1).sum < batchPlan.values.map(_._1).sum)
    assert(refreshes >= 2)
  }

  test("streaming KMV distinct advisory converges to the batch kmv_distinct estimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "event_type", "CAST(user_id AS STRING) AS user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val mid = evs(evs.length / 2)._1

    val input = MemoryStream[(Long, String, String)]
    val counts = graft.streaming.SkewAdvisorStream.distinctCounts(
      input.toDF().toDF("event_id", "event_type", "user_id"))
    val ck = java.nio.file.Files.createTempDirectory("kmvstream_ckpt").toString
    val table = mutable.Map[String, (Long, Double)]()
    def drain(): Unit = {
      val q = counts.writeStream
        .outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach { r =>
            table(r.getAs[String]("key")) =
              (r.getAs[Long]("cnt"), r.getAs[Double]("n_distinct_est"))
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    input.addData(evs.filter(_._1 < mid).toSeq)
    drain()
    val after1 = table.toMap
    input.addData(evs.filter(_._1 >= mid).toSeq)
    drain() // resumes from checkpoint: sketch state must merge, not reset

    // batch twin on the same corpus: (event_type, n_events, n_users_est)
    val batch = SparkEntry.queries("kmv_distinct")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("n_users_est")))).toMap
    assert(table.toMap == batch,
      s"converged stream != batch kmv_distinct\nstream=$table\nbatch=$batch")
    assert(after1 != batch, "split degenerate — batch 1 already converged")
  }

  test("streamed join-size advisory equals the batch sampled estimate arithmetic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val pct = graft.ops.RelationalOps.JoinSamplePct
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .selectExpr("o_orderkey AS k")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .selectExpr("l_orderkey AS k").collect().map(r => K(r.getLong(0)))

    // static dim-side sampled counts (batch frame through the SAME path)
    val dimSample = SkewAdvisorStream.sampledKeyCounts(orders, "k").cache()

    val input = MemoryStream[K]
    val streamSample = SkewAdvisorStream.sampledKeyCounts(input.toDF(), "k")
    val ck = java.nio.file.Files.createTempDirectory("jsadv_ckpt").toString
    // keep the latest full sampled-count state per key, then estimate
    val state = mutable.Map[Long, Long]()
    def drain(): Unit = {
      val q = streamSample.writeStream
        .outputMode("update")
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => state(r.getAs[Long]("key")) = r.getAs[Long]("cnt"))
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val mid = li.map(_.k).sorted.apply(li.length / 2)
    input.addData(li.filter(_.k < mid).toSeq)
    drain()
    input.addData(li.filter(_.k >= mid).toSeq)
    drain()

    // advisory over the final streamed state == the batch estimate:
    // join_size_estimate's sampled leg computes COUNT of sampled key
    // pairs = sum over sampled keys of cnt_o * cnt_l, then scales 100/pct
    val streamed = SkewAdvisorStream.joinSizeAdvisory(
      state.toSeq.toDF("key", "cnt"), dimSample).collect()(0)
    val batch = SparkEntry.queries("join_size_estimate")(spark, sf).collect()(0)
    assert(streamed.getAs[Long]("sample_rows") == batch.getAs[Long]("sample_rows"),
      s"sampled pair count: stream=$streamed batch=$batch")
    assert(streamed.getAs[Long]("est_rows") == batch.getAs[Long]("est_rows"))
    assert(streamed.getAs[Long]("sample_rows") > 0, "sample empty — spec vacuous")
    // scale-up is the public constant, not a re-derived literal
    assert(streamed.getAs[Long]("est_rows") ==
      streamed.getAs[Long]("sample_rows") * (100L / pct))
  }
}
