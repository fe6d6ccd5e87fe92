package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** S3: point-lookup source (SURVEY.md §2.1; /root/reference/main.py:179-194 —
  * `GET /ticket/{id}`, 30 s timeout, null on error).
  *
  * Spark shape: a Dataset of keys mapPartitions'd through a connector
  * function — lookups run distributed at task parallelism (replacing the
  * reference's ThreadPoolExecutor, main.py:437), failures yield None rather
  * than failing the job, and nothing round-trips through the driver. The
  * connector function is pluggable; offline it's a deterministic stub
  * standing in for the HTTP client.
  */
object PointLookup {

  /** Distributed keyed lookup: one connector call per key, partition-local.
    * `fetch` must be serializable; per-partition setup (connection pools,
    * auth) belongs in the mapPartitions closure before the iterator map. */
  def fetchAll[V: org.apache.spark.sql.Encoder](
      keys: Dataset[String],
      fetch: String => Option[V]): Dataset[V] =
    keys.mapPartitions { it =>
      // per-partition client setup would go here (one pool per task)
      it.flatMap(k => fetch(k)) // None = fetch error -> row dropped (main.py:452)
    }

  /** Offline stub connector: deterministic "ticket detail" per id, with the
    * reference's null-on-error contract (unparseable id → None). */
  def stubFetch(id: String): Option[(String, Long, String)] =
    scala.util.Try {
      val n = id.stripPrefix("T").toLong
      (id, 1700000000L - n * 60L, s"Ticket $n detail")
    }.toOption
}
