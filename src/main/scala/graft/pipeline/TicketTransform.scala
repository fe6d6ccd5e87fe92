package graft.pipeline

import graft.functions.TicketFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's ticket record shape and row transform
  * (/root/reference/main.py:196-320) re-expressed as one declarative
  * projection — every column is a Catalyst expression, so the whole 40-column
  * transform runs inside a single whole-stage-codegen'd Project over the
  * source scan (vs the reference's per-row Python dict building on a thread
  * pool, main.py:440-453).
  */
object TicketTransform {

  val emailStructType: StructType = StructType(Seq(
    StructField("email", StringType), StructField("name", StringType)))

  /** Input schema at the API boundary (main.py:189-194 response shape). */
  val ticketInputSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("createdTimestamp", LongType),      // epoch SECONDS (main.py:252-256)
    StructField("updatedTimestamp", LongType),
    StructField("deletedTimestamp", LongType),
    StructField("lastMessageTimestamp", LongType),
    StructField("createdBy", StringType),
    StructField("updatedBy", StringType),
    StructField("deleted", BooleanType),
    StructField("incoming", BooleanType),
    StructField("subject", StringType),
    StructField("description", StringType),          // HTML
    StructField("status", StringType),
    StructField("priority", StringType),
    StructField("fromEmail", emailStructType),
    StructField("toEmails", ArrayType(emailStructType)),
    StructField("ccEmails", ArrayType(StringType)),
    StructField("bccEmails", ArrayType(StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("attachmentIds", ArrayType(StringType)),
    StructField("discounts", ArrayType(StringType)),
    StructField("sendEmailFailureCount", LongType),
    StructField("createdViaWidget", BooleanType),
    StructField("permanentlyDeleted", BooleanType),
    StructField("isRead", BooleanType),
    StructField("meta", MapType(StringType, StringType)),
    StructField("stats", StringType),                // JSON string OR object → kept raw
    StructField("attachments", ArrayType(MapType(StringType, StringType)))))

  val statsSchema: StructType = StructType(Seq(
    StructField("resolvedAt", LongType),
    StructField("firstRespondedAt", LongType)))

  /** The fixed ~40-key output projection (main.py:270-320). Column-for-column
    * with the reference's de-facto BigQuery schema, including its quirks:
    * epoch 0 → NULL (main.py:235,246), Python bool/list renderings for
    * stringified fields (main.py:289,301-305), empty attachments → NULL
    * (main.py:429-430). */
  def transform(tickets: DataFrame): DataFrame = {
    def ts(c: String) = col(c)
    tickets.select(
      toStr(col("_id")).as("_id"),
      // datetime-string pairs (main.py:272-279)
      secondsToReadable(ts("createdTimestamp")).as("createdOn"),
      secondsToDateOnly(ts("createdTimestamp")).as("createdOnDate"),
      secondsToReadable(ts("updatedTimestamp")).as("updatedOn"),
      secondsToDateOnly(ts("updatedTimestamp")).as("updatedOnDate"),
      secondsToReadable(ts("deletedTimestamp")).as("deletedOn"),
      secondsToDateOnly(ts("deletedTimestamp")).as("deletedOnDate"),
      secondsToReadable(ts("lastMessageTimestamp")).as("lastMessageOn"),
      secondsToDateOnly(ts("lastMessageTimestamp")).as("lastMessageOnDate"),
      // raw epochs kept as strings (main.py:280-283)
      toStr(col("createdTimestamp")).as("createdTimestamp"),
      toStr(col("updatedTimestamp")).as("updatedTimestamp"),
      toStr(col("deletedTimestamp")).as("deletedTimestamp"),
      toStr(col("lastMessageTimestamp")).as("lastMessageTimestamp"),
      toStr(col("createdBy")).as("createdBy"),
      toStr(col("updatedBy")).as("updatedBy"),
      boolOrFalse(col("deleted")).as("deleted"),
      toStr(col("incoming"), isBool = true).as("incoming"),
      toStr(col("subject")).as("subject"),
      cleanHtml(col("description")).as("description"),
      toStr(col("status")).as("status"),
      toStr(col("priority")).as("priority"),
      emailStruct(col("fromEmail")).as("fromEmail"),
      emailArray(col("toEmails")).as("toEmails"),
      // Python str() list renderings (main.py:301-305) — quirk preserved
      pythonListRepr(col("ccEmails")).as("ccEmails"),
      pythonListRepr(col("bccEmails")).as("bccEmails"),
      pythonListRepr(col("tags")).as("tags"),
      pythonListRepr(col("attachmentIds")).as("attachmentIds"),
      pythonListRepr(col("discounts")).as("discounts"),
      toStr(col("sendEmailFailureCount")).as("sendEmailFailureCount"),
      boolOrFalse(col("createdViaWidget")).as("createdViaWidget"),
      boolOrFalse(col("permanentlyDeleted")).as("permanentlyDeleted"),
      toStr(col("isRead"), isBool = true).as("isRead"),
      jsonSerialize(col("meta")).as("meta"),
      // stats: parse-if-string, null on malformed (main.py:211-231), then
      // the two tracked sub-fields formatted like the top-level timestamps
      secondsToReadable(parseIfString(col("stats"), statsSchema)
        .getField("resolvedAt")).as("resolvedAt"),
      secondsToReadable(parseIfString(col("stats"), statsSchema)
        .getField("firstRespondedAt")).as("firstRespondedAt"),
      jsonSerialize(parseIfString(col("stats"), statsSchema)).as("stats"),
      // attachments: [] → NULL then JSON (main.py:318,429-430)
      jsonSerialize(nullIfEmptyArray(col("attachments"))).as("attachments"))
  }
}
