package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Declarative MERGE INTO builder (SURVEY.md §4.3.3): the reference expresses
  * its upsert as a BigQuery `MERGE` statement (main.py:349-363); this is the
  * same statement surface as a Spark-first DataFrame combinator, lowered at
  * the builder level (no analyzer rule — per the §4.3 engine decision) into
  * ONE full-outer join plus a codegen'd projection/filter.
  *
  * Clause semantics (SQL MERGE, Delta-style API):
  *   - `on(keys)` — equi-match on the key columns (null-safe).
  *   - `whenMatchedDelete(cond)` — matched rows satisfying `cond` disappear.
  *   - `whenMatchedUpdateAll([cond])` — remaining matched rows take ALL
  *     source column values when `cond` (default: always); otherwise they
  *     keep the target values. Delete is evaluated BEFORE update, the usual
  *     MERGE clause order when delete is listed first.
  *   - `whenNotMatchedInsertAll([cond])` — source-only rows are inserted
  *     when `cond` (default: always). Absent: source-only rows are dropped.
  *   - Target-only rows always survive (MERGE never touches them).
  *
  * Inside a condition, reference the two sides through the aliases `t` and
  * `s` (e.g. `col("s.price") > col("t.price")`).
  *
  * Scale shape: one shuffle join on the keys — when the source is a small
  * delta against a huge target AQE broadcasts it; no driver-side state. The
  * equivalent imperative pair (`Upsert.merge` = anti-join + union) remains
  * the hot-path implementation for the plain upsert; this builder exists for
  * the conditional update/delete/insert forms SQL MERGE can express and the
  * anti+union shape cannot. Property-pinned equivalent to `Upsert.merge` on
  * the unconditional update+insert case (MergeIntoSpec).
  */
case class MergeInto(
    target: DataFrame,
    source: DataFrame,
    keys: Seq[String] = Nil,
    matchedUpdate: Option[Option[Column]] = None,
    matchedDelete: Option[Column] = None,
    notMatchedInsert: Option[Option[Column]] = None) {

  def on(keyCols: String*): MergeInto = copy(keys = keyCols)

  def whenMatchedUpdateAll(condition: Option[Column] = None): MergeInto =
    copy(matchedUpdate = Some(condition))

  def whenMatchedDelete(condition: Column): MergeInto =
    copy(matchedDelete = Some(condition))

  def whenNotMatchedInsertAll(condition: Option[Column] = None): MergeInto =
    copy(notMatchedInsert = Some(condition))

  /** Lower to one full-outer join + projection. Output schema = target's. */
  def result(): DataFrame = {
    require(keys.nonEmpty, "MergeInto requires on(keys)")
    val missing = target.columns.filterNot(source.columns.contains)
    require(missing.isEmpty, s"source lacks target columns: ${missing.mkString(",")}")
    // Presence markers survive the outer join where key columns would be
    // ambiguous with legitimate nulls on the other side.
    val t = target.withColumn("__t", lit(true)).alias("t")
    val s = source.withColumn("__s", lit(true)).alias("s")
    val joinCond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val matched = col("t.__t").isNotNull && col("s.__s").isNotNull
    val tOnly = col("s.__s").isNull
    val sOnly = col("t.__t").isNull
    val delCond = matchedDelete.map(c => matched && c).getOrElse(lit(false))
    val updCond = matchedUpdate.map(c => matched && c.getOrElse(lit(true))).getOrElse(lit(false))
    val insCond = notMatchedInsert.map(c => sOnly && c.getOrElse(lit(true))).getOrElse(lit(false))
    val keep = tOnly || (matched && !delCond) || insCond
    val takeSource = insCond || (updCond && !delCond)
    val projected = target.columns.map { c =>
      when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    t.join(s, joinCond, "full_outer").filter(keep).select(projected.toIndexedSeq: _*)
  }
}

object MergeInto {

  def into(target: DataFrame): HalfBuilt = HalfBuilt(target)
  case class HalfBuilt(target: DataFrame) {
    def using(source: DataFrame): MergeInto = MergeInto(target, source)
  }

  private def orders3(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_totalprice").cast("decimal(18,2)").as("price"),
      col("o_orderstatus").as("st"))

  val qs: Seq[Q] = Seq(

    // The full MERGE clause surface in one query: conditional delete wins
    // over update on matched keys, conditional insert on source-only keys,
    // target-only rows untouched. The oracle spells the identical clause
    // algebra as an explicit FULL OUTER JOIN + CASE — dialect-portable and
    // independent of whether the engine has a MERGE statement.
    Q("j12_merge_into",
      (s, dir) => {
        val tgt = orders3(s, dir).filter(col("o_orderkey") % 4 =!= 3)
        val src = orders3(s, dir).filter(col("o_orderkey") % 2 === 0)
          .withColumn("price", (col("price") * 2).cast("decimal(18,2)"))
        MergeInto.into(tgt).using(src)
          .on("o_orderkey")
          .whenMatchedDelete(col("s.st") === "F")
          .whenMatchedUpdateAll()
          .whenNotMatchedInsertAll(Some(col("s.price") > 150000))
          .result()
          .select(col("o_orderkey"), col("price").cast("double").as("price"), col("st"))
          .orderBy("o_orderkey")
      },
      Some("""WITH t AS (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                     o_orderstatus AS st
                   FROM orders WHERE o_orderkey % 4 <> 3),
              s AS (SELECT o_orderkey,
                     CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price,
                     o_orderstatus AS st
                   FROM orders WHERE o_orderkey % 2 = 0),
              m AS (SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
                      t.o_orderkey IS NOT NULL AS tp, s.o_orderkey IS NOT NULL AS sp,
                      t.price AS tprice, t.st AS tst, s.price AS sprice, s.st AS sst
                    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey)
              SELECT o_orderkey,
                CAST(CASE WHEN (sp AND NOT tp) OR (tp AND sp AND sst <> 'F')
                     THEN sprice ELSE tprice END AS DOUBLE) AS price,
                CASE WHEN (sp AND NOT tp) OR (tp AND sp AND sst <> 'F')
                     THEN sst ELSE tst END AS st
              FROM m
              WHERE (tp AND NOT sp)
                 OR (tp AND sp AND sst <> 'F')
                 OR (sp AND NOT tp AND sprice > 150000)
              ORDER BY o_orderkey ASC NULLS FIRST"""))
  )
}
