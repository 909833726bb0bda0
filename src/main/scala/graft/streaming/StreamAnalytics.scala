package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming analytics over continuous document / vector sources — the
  * Spark-first §2.9 extension beside [[StreamIngest]]: the reference has no
  * streaming surface at all, but a training-data pipeline ingesting
  * continuously needs windowed corpus statistics and incrementally
  * maintained cluster state, which Structured Streaming expresses natively
  * (event-time windows + watermarks; `mapGroupsWithState` for custom
  * state). Both operators here are declarative micro-batch plans: state
  * lives in Spark's state store (HDFS-backed at cluster scale, versioned
  * per micro-batch), so a 1000-executor deployment gets fault-tolerant
  * state and late-data handling without any engine code.
  */
object StreamAnalytics {

  /** Event-time windowed per-language document counts + mean token count,
    * with a watermark bounding state and dropping data later than
    * `watermarkDelay` (append mode emits a window only once its watermark
    * passes — the standard Structured Streaming contract).
    *
    * Input: streaming (ts: timestamp, lang: string, text: string).
    * Output: (window_start, window_end, lang, n_docs, avg_tokens).
    */
  def windowedLangStats(
      docs: DataFrame,
      windowDur: String = "10 minutes",
      watermarkDelay: String = "5 minutes",
      tsCol: String = "ts",
      langCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require(docs.isStreaming, "windowedLangStats needs a streaming DataFrame")
    docs
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        avg(size(split(col(textCol), " "))).as("avg_tokens"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("lang"), col("n_docs"), col("avg_tokens"))
  }

  /** Per-cluster running centroid state. `sum` is the running component
    * sum (double — float accumulation across unbounded streams drifts). */
  case class CentroidState(count: Long, sum: Array[Double])

  /** Incrementally maintained per-cluster centroids over a stream of
    * assigned vectors — the streaming analog of the k-means centroid
    * update (SURVEY §2 A1): each micro-batch folds its rows into the
    * cluster's running (count, sum) state and emits the updated mean.
    * `KeyValueGroupedDataset.mapGroupsWithState` keeps the state in the
    * engine's state store; use update output mode (each batch emits only
    * the clusters it touched).
    *
    * Input: streaming Dataset of (cluster, vec). Output per touched
    * cluster: (cluster, count, centroid).
    */
  def runningCentroids(
      assigned: Dataset[(Int, Array[Float])])
    : Dataset[(Int, Long, Array[Float])] = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned
      .groupByKey(_._1)
      .mapGroupsWithState[CentroidState, (Int, Long, Array[Float])](
        GroupStateTimeout.NoTimeout) {
        (cluster: Int, rows: Iterator[(Int, Array[Float])],
         state: GroupState[CentroidState]) =>
          var count = state.getOption.map(_.count).getOrElse(0L)
          var sum = state.getOption.map(_.sum).orNull
          rows.foreach { case (_, v) =>
            if (sum == null) sum = new Array[Double](v.length)
            var i = 0
            while (i < v.length) { sum(i) += v(i); i += 1 }
            count += 1
          }
          state.update(CentroidState(count, sum))
          val centroid = sum.map(s => (s / count).toFloat)
          (cluster, count, centroid)
      }
  }
}
