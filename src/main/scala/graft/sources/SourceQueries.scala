package graft.sources

import graft.functions.TicketFunctions
import graft.ops.Q
import org.apache.spark.sql.functions._

/** Inventory queries for the custom sources. The paginated source is fully
  * deterministic, so the oracle can re-synthesize it with generate_series —
  * which also gives the clean_html expression an end-to-end oracle pairing
  * (entities + tags + whitespace collapse). */
object SourceQueries {

  val qs: Seq[Q] = Seq(

    Q("s2_paginated_source",
      (s, _) => s.read.format("ticket-pages")
        .option("pages", "5").option("pageSize", "100").load()
        .select(col("_id"), col("page"), col("createdTimestamp"),
          TicketFunctions.cleanHtml(col("subject")).as("subject_text"))
        .orderBy("_id"),
      Some("""SELECT printf('T%06d', g) AS _id,
                CAST(g // 100 AS INTEGER) AS page,
                1700000000 - g * 60 AS createdTimestamp,
                'Ticket ' || g || ' & update' AS subject_text
              FROM (SELECT unnest(generate_series(0, 499)) AS g)
              ORDER BY _id ASC NULLS FIRST"""))
  )
}
