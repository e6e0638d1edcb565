package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** As-of joins — for each left row, ONE right row with the same key:
  *
  *  - [[backward]]: the most recent right row with `rightTime <= leftTime`;
  *  - [[forward]]:  the earliest right row with `rightTime >= leftTime`;
  *  - [[nearest]]:  whichever of the two is closer in time (ties →
  *    backward, the conventional as-of default).
  *
  * Spark has no native as-of join; the naive range join explodes to
  * |L|×|R| per key. Technique: tag and union both sides, then one window
  * pass per key in time order carrying the last non-null right payload
  * (`last(_, ignoreNulls = true)` over an unbounded-preceding frame) —
  * forward is the same pass with time order reversed, nearest runs both
  * carries over one sort layout. Cost: ONE shuffle by key (nearest adds
  * a second sort, not a second shuffle), independent of match distances,
  * so it scales to arbitrarily long histories.
  *
  * Determinism: right rows sort before left rows at equal timestamps
  * (inclusive bound semantics, matching DuckDB's `ASOF JOIN`), and
  * duplicate (key, rightTime) right rows are pre-deduplicated to the
  * greatest payload tuple — DuckDB's ASOF leaves the duplicate choice
  * unspecified, so both engines must pin it the same way.
  *
  * Internal column names are generated collision-free against both
  * inputs (a left frame already containing `_t`/`_side` can't silently
  * corrupt the result), and payload names must be disjoint from the
  * non-key left columns (both appear in the output).
  */
object AsOfJoin {

  /** Shortest `_asofN_` prefix no input column starts with. */
  private def freshPrefix(cols: Iterable[String]): String =
    Iterator.from(0).map(i => s"_asof${i}_")
      .find(p => !cols.exists(_.startsWith(p))).get

  /** Time distance in an exactly-comparable integer domain where the
    * type allows (timestamps → microseconds); doubles otherwise. */
  private def timeVal(c: Column, df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType => unix_micros(c)
      case DateType => datediff(c, lit("1970-01-01"))
      case _ => c.cast("double")
    }

  /** One union+window layout shared by all three variants. Returns the
    * tagged frame plus the generated column names. */
  private case class Tagged(df: DataFrame, t: String, side: String,
                            pay: String, mt: String, leftCols: Seq[String])

  private def tagged(left: DataFrame, right: DataFrame, key: String,
                     leftTime: String, rightTime: String,
                     payload: Seq[String]): Tagged = {
    val leftCols = left.columns.toSeq
    val clash = payload.toSet & leftCols.filterNot(_ == key).toSet
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")}")
    val p = freshPrefix(leftCols ++ right.columns ++ payload)
    val (tC, sideC, payC, mtF, rnC) =
      (p + "t", p + "side", p + "pay", p + "mt", p + "rn")

    // duplicate (key, rightTime) right rows: keep the greatest payload
    // tuple, deterministically — mirrors the oracle's explicit dedup
    val wDup = Window.partitionBy(col(key), col(rightTime))
      .orderBy(payload.map(c => col(c).desc): _*)
    val rightDedup = right
      .withColumn(rnC, row_number().over(wDup))
      .filter(col(rnC) === 1)
      .drop(rnC)

    val pay = struct(col(rightTime).as(mtF) +: payload.map(col): _*)
    val taggedRight = rightDedup.select(
      Seq(col(key), col(rightTime).as(tC), lit(0).as(sideC), pay.as(payC)) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).as(tC), lit(1).as(sideC),
          lit(null).cast(taggedRight.schema(payC).dataType).as(payC)) ++
        leftCols.filterNot(_ == key).map(col): _*)
    Tagged(taggedRight.unionByName(taggedLeft), tC, sideC, payC, mtF, leftCols)
  }

  private def carry(tg: Tagged, key: String, forward: Boolean): Column = {
    val ord = if (forward) col(tg.t).desc else col(tg.t).asc
    val w = Window.partitionBy(key).orderBy(ord, col(tg.side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col(tg.pay), ignoreNulls = true).over(w)
  }

  private def emit(tg: Tagged, matched: Column, payload: Seq[String]): DataFrame =
    tg.df
      .withColumn(tg.pay + "m", matched)
      .filter(col(tg.side) === 1)
      .select(tg.leftCols.map(col) ++
              payload.map(p => col(tg.pay + "m").getField(p).as(p)): _*)

  /** Null a carried match whose time distance from the left row exceeds
    * `maxGap` — the attribution-window semantics (a click 3 weeks before
    * a purchase is not its cause). The carried match is always the
    * NEAREST one in its direction, so nulling it is exact: any other
    * candidate is farther. `maxGap` is in the integer time domain of
    * [[timeVal]] — microseconds for timestamps, days for dates, the raw
    * value otherwise — and the bound is inclusive. The window pass is
    * unchanged: the gate is a map-only projection, so the tolerance dial
    * costs nothing at any scale. */
  private def gate(tg: Tagged, matched: Column, right: DataFrame,
                   rightTime: String, fwd: Boolean,
                   maxGap: Option[Long]): Column =
    maxGap match {
      case None => matched
      case Some(g) =>
        def t(c: Column) = timeVal(c, right, rightTime)
        val lt = t(col(tg.t))
        val mt = t(matched.getField(tg.mt))
        val gap = if (fwd) mt - lt else lt - mt
        // matched null → condition null → otherwise-less when → null
        when(gap <= g, matched)
    }

  /** @param payload right-side columns to attach (null when no match)
    * @param maxGap  inclusive attribution window in [[timeVal]] units
    *                (µs for timestamps); matches farther away become
    *                null, as if no right row qualified. */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               maxGap: Option[Long] = None): DataFrame = {
    val tg = tagged(left, right, key, leftTime, rightTime, payload)
    val m = gate(tg, carry(tg, key, forward = false), right, rightTime,
                 fwd = false, maxGap)
    emit(tg, m, payload)
  }

  /** Earliest right row at or after the left time. */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String],
              maxGap: Option[Long] = None): DataFrame = {
    val tg = tagged(left, right, key, leftTime, rightTime, payload)
    val m = gate(tg, carry(tg, key, forward = true), right, rightTime,
                 fwd = true, maxGap)
    emit(tg, m, payload)
  }

  /** Closer of the backward/forward matches; ties → backward. With
    * `maxGap`, each direction is gated BEFORE choosing — the result is
    * the nearest match WITHIN the window (a too-far backward match never
    * shadows an in-window forward one). */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String],
              maxGap: Option[Long] = None): DataFrame = {
    val tg = tagged(left, right, key, leftTime, rightTime, payload)
    val back = gate(tg, carry(tg, key, forward = false), right, rightTime,
                    fwd = false, maxGap)
    val fwd = gate(tg, carry(tg, key, forward = true), right, rightTime,
                   fwd = true, maxGap)
    val bC = col(tg.pay + "b"); val fC = col(tg.pay + "f")
    def t(c: Column) = timeVal(c, right, rightTime)
    val lt = t(col(tg.t))
    val chosen =
      when(bC.isNull, fC)
        .when(fC.isNull, bC)
        .when(lt - t(bC.getField(tg.mt)) <= t(fC.getField(tg.mt)) - lt, bC)
        .otherwise(fC)
    tg.df
      .withColumn(tg.pay + "b", back)
      .withColumn(tg.pay + "f", fwd)
      .filter(col(tg.side) === 1)
      .select(tg.leftCols.map(col) ++
              payload.map(p => chosen.getField(p).as(p)): _*)
  }
}
