package graft.streaming

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** R14 parity: the flat counter snapshot the /metrics endpoint serves
  * (reference mounts its operational surface on the same mux as ingest,
  * server.go:60-64; profiling itself is the Spark UI's job here).
  *
  * One row per active streaming query from its LAST progress event —
  * batch id, input rows, plus every numeric field of every
  * `observe(...)` metric group (e.g. `route_publish.unroutable_404`,
  * the count the reference exposes as its HTTP 404 path,
  * publisher.go:161-165). Driver-side only, O(|queries|) — safe to poll
  * from a probe loop at any corpus scale.
  */
object StreamMetrics {
  def snapshot(spark: SparkSession): Map[String, Long] =
    spark.streams.active.iterator.flatMap { q =>
      val name = Option(q.name).getOrElse(q.id.toString)
      Option(q.lastProgress).iterator.flatMap { p =>
        Iterator(s"$name.batch_id" -> p.batchId,
          s"$name.input_rows" -> p.numInputRows) ++
          p.observedMetrics.asScala.iterator.flatMap { case (group, row) =>
            row.schema.fieldNames.iterator.flatMap { f =>
              row.getAs[Any](f) match {
                case n: java.lang.Number =>
                  Some(s"$name.$group.$f" -> n.longValue())
                case _ => None // non-numeric observed metrics don't flatten
              }
            }
          }
      }
    }.toMap
}
