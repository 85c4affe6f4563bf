package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Event, StreamOps}

/** §2.9 streaming-only semantics, verified with MemoryStream micro-batches
  * (SURVEY.md §5.3): windows, watermark late-drop, session gaps, in-stream
  * dedup, stateful running counts, stream-static join, checkpoint resume. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = org.apache.spark.sql.SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("graft-streaming-test")
    .getOrCreate()

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  private def ev(id: Long, min: Int, uid: Long = 1,
      typ: String = "click", v: Double = 1.0): Event =
    Event(id, ts(min), uid, typ, v, "{}")

  private var sinkId = 0
  private def nextSink(): String = { sinkId += 1; s"sink_$sinkId" }

  test("tumbling window streaming agg equals its batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(ev(0, 10), ev(1, 20), ev(2, 70), ev(3, 80, typ = "view"))
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.tumbling(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName(sink).start()
    in.addData(data: _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(sink).orderBy("ws", "event_type").collect()
    val batch = StreamOps.tumbling(data.toDF()).orderBy("ws", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("watermark drops events later than the 10-minute horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.tumblingWithWatermark(in.toDF())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    // Batch 1: events in hour 0, then advance event-time far past hour 0.
    in.addData(ev(0, 10), ev(1, 20))
    q.processAllAvailable()
    in.addData(ev(2, 200)) // watermark → 190 min; hour-0 window finalizes
    q.processAllAvailable()
    // Batch 3: a LATE event back in hour 0 — beyond watermark, must drop.
    in.addData(ev(3, 15))
    q.processAllAvailable()
    in.addData(ev(4, 400)) // push watermark so hour-3 window also emits
    q.processAllAvailable(); q.stop()
    val hour0 = spark.table(sink)
      .where(col("ws") === ts(0)).agg(sum("n")).head().getLong(0)
    assert(hour0 == 2, "late event must not be counted in the closed window")
  }

  test("session_window streaming matches the batch gaps-and-islands twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at 0,10,20 (one session), then 60 (new session: gap 40m)
    val data = Seq(ev(0, 0), ev(1, 10), ev(2, 20), ev(3, 60), ev(4, 65),
      ev(5, 0, uid = 2), ev(6, 45, uid = 2))
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.sessions(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName(sink).start()
    in.addData(data: _*)
    q.processAllAvailable(); q.stop()
    val got = spark.table(sink).select("user_id", "n")
      .orderBy("user_id", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // user 1: sessions of 3 and 2 events; user 2: two 1-event sessions.
    assert(got == Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.dedupWithinWatermark(in.toDF())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    in.addData(ev(0, 10), ev(1, 11))
    q.processAllAvailable()
    in.addData(ev(0, 10), ev(2, 12)) // event 0 re-delivered
    q.processAllAvailable(); q.stop()
    val ids = spark.table(sink).select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L))
  }

  test("stateful running count per user accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.runningPerUser(in.toDS())
      .writeStream.outputMode("update").format("memory").queryName(sink).start()
    in.addData(ev(0, 1, uid = 7, v = 2.0), ev(1, 2, uid = 7, v = 3.0))
    q.processAllAvailable()
    in.addData(ev(2, 3, uid = 7, v = 5.0), ev(3, 3, uid = 8, v = 1.0))
    q.processAllAvailable(); q.stop()
    val last = spark.table(sink).where(col("user_id") === 7)
      .orderBy(col("n_events").desc).head()
    assert(last.getAs[Long]("n_events") == 3)
    assert(math.abs(last.getAs[Double]("total_value") - 10.0) < 1e-9)
  }

  test("stream-stream join pairs purchases with preceding same-user clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.purchaseClickJoin(in.toDF())
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    in.addData(
      ev(0, 10, uid = 1, typ = "click"),
      ev(1, 30, uid = 2, typ = "click"),
      ev(3, 59, uid = 1, typ = "click"))
    q.processAllAvailable()
    in.addData(ev(2, 60, uid = 1, typ = "purchase"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table(sink).orderBy("c_id").collect()
    // user 1's purchase at min 60 matches that user's clicks at 10 and 59;
    // user 2's click never joins.
    assert(rows.map(_.getAs[Long]("c_id")).toSeq == Seq(0L, 3L))
    assert(rows.forall(_.getAs[Long]("p_id") == 2L))
  }

  test("Trigger.AvailableNow drains everything queued, then stops itself") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sink = nextSink()
    in.addData(ev(0, 1), ev(1, 90), ev(2, 200))
    val q = StreamOps.tumbling(in.toDF())
      .writeStream.outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName(sink).start()
    assert(q.awaitTermination(60000), "AvailableNow query must self-stop")
    // 3 events in 3 distinct hours → 3 windows, one event each.
    val rows = spark.table(sink).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("n")).sum == 3)
  }

  test("session windows reject update mode (merge semantics need append)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    // Pinning Spark's documented contract: session_window aggregations
    // cannot update-emit (a later event can MERGE two already-emitted
    // sessions); only append-after-watermark is sound, which the
    // gaps-and-islands twin and the append-mode session test rely on.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      StreamOps.sessions(in.toDF())
        .writeStream.outputMode("update")
        .format("memory").queryName(nextSink()).start()
    }
    assert(e.getCondition != null
      && e.getCondition.startsWith("STREAMING_OUTPUT_MODE"))
  }

  test("parquet file sink appends each micro-batch durably (with checkpoint)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val in = MemoryStream[Event]
    val q = in.toDF()
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/chk")
      .start()
    in.addData(ev(0, 1), ev(1, 2))
    q.processAllAvailable()
    in.addData(ev(2, 3))
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 3)
    assert(back.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(0L, 1L, 2L))
  }

  test("foreachBatch sink sees each micro-batch exactly once with its id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-feb").toString
    val in = MemoryStream[Event]
    val q = in.toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(s"$dir/data")
      }
      .option("checkpointLocation", s"$dir/chk")
      .start()
    in.addData(ev(0, 1), ev(1, 2))
    q.processAllAvailable()
    in.addData(ev(2, 3))
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(s"$dir/data")
    assert(back.count() == 3)
    assert(back.select("batch_id").distinct().count() == 2)
  }

  test("stream-static join enriches events with the customer dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val customers = Tables.customer(spark, "/root/testdata/sf0.001")
    val in = MemoryStream[Event]
    val sink = nextSink()
    val q = StreamOps.enrich(in.toDF(), customers)
      .writeStream.outputMode("append").format("memory").queryName(sink).start()
    in.addData(ev(0, 1, uid = 3), ev(1, 2, uid = 5))
    q.processAllAvailable(); q.stop()
    val rows = spark.table(sink).orderBy("event_id").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[String]("c_name") != null))
  }

  test("transformWithState: per-user running max across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Event]
      val sink = nextSink()
      val q = StreamOps.runningMax(in.toDS()).toDF("user_id", "vmax")
        .writeStream.outputMode("update").format("memory").queryName(sink).start()
      in.addData(ev(0, 1, uid = 4, v = 5.0), ev(1, 2, uid = 4, v = 9.0))
      q.processAllAvailable()
      in.addData(ev(2, 3, uid = 4, v = 7.0)) // lower value: max must hold
      q.processAllAvailable(); q.stop()
      val last = spark.table(sink).where(col("user_id") === 4)
        .orderBy(col("vmax").desc).head()
      assert(last.getDouble(1) == 9.0)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("checkpoint resume: offsets continue without loss or duplication") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString
    val in = MemoryStream[Event]
    def start() = in.toDF()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", dir).start()
    val q1 = start()
    in.addData(ev(0, 1), ev(1, 2))
    q1.processAllAvailable(); q1.stop()
    // Restart from the same checkpoint; only new data may be written.
    val q2 = start()
    in.addData(ev(2, 3))
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(0L, 1L, 2L), "exactly-once across restart")
  }
}
