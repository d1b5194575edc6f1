package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Durations

/** As-of join — the reference's one genuinely novel relational operator
  * (reference: native_shim/src/lazy.rs:501-569 `pl_lazy_join_asof`; strategy
  * map at lazy.rs:526-531, tolerance parse at lazy.rs:533-547; C#
  * LazyFrame.cs:529-572; README.md:44-58 trades/quotes example).
  *
  * Spark has no asof primitive. The scalable formulation is the union+window
  * composition: tag rows by side, sort each `by`-group by (time, side-tag),
  * and carry the most recent right-side row forward with
  * `last(struct, ignoreNulls)` — ONE shuffle on (by, time), no range-join row
  * explosion, skew-safe under AQE. A range-join would be O(|L|·|R|) per group;
  * this is O((|L|+|R|) log) via sort — the plan you want at 100 TB.
  *
  * Strategies: backward (match latest right.time <= left.time), forward
  * (earliest right.time >= left.time), nearest (closer of the two; ties →
  * backward, matching Polars). `allowEq=false` makes the comparisons strict.
  * Tolerance (duration string or µs) nulls out matches farther than the bound.
  */
object AsofJoin {

  sealed trait Strategy
  case object Backward extends Strategy
  case object Forward extends Strategy
  case object Nearest extends Strategy

  def join(left: DataFrame, right: DataFrame,
           leftOn: String, rightOn: String,
           by: Seq[(String, String)] = Seq.empty, // (leftBy, rightBy) pairs
           strategy: Strategy = Backward,
           tolerance: Option[String] = None,
           allowEq: Boolean = true): DataFrame = {

    val tolUs: Option[Long] = tolerance.map(Durations.parseMicros)

    // right-side payload = all right columns except the on/by keys
    val rightByCols = by.map(_._2)
    val payloadCols = right.columns.filterNot(c => c == rightOn || rightByCols.contains(c)).toSeq
    // resolve output-name collisions with the Polars "_right" suffix
    val leftNames = left.columns.toSet
    val outName: Map[String, String] =
      payloadCols.map(c => c -> (if (leftNames.contains(c)) s"${c}_right" else c)).toMap

    strategy match {
      case Nearest =>
        // two directional passes merged column-wise on a stable row id
        val withId = left.withColumn("__row_id", monotonically_increasing_id())
        val b = directional(withId, right, leftOn, rightOn, by, backward = true, tolUs, allowEq,
          payloadCols, outName, matchTimeCol = Some("__bt"))
        val f = directional(withId, right, leftOn, rightOn, by, backward = false, tolUs, allowEq,
          payloadCols, outName, matchTimeCol = Some("__ft"))
        val fSel = f.select((Seq(col("__row_id").as("__rid2"), col("__ft")) ++
          payloadCols.map(c => col(outName(c)).as(s"__f_${outName(c)}"))).toIndexedSeq: _*)
        val merged = b.join(fSel, col("__row_id") === col("__rid2"), "inner").drop("__row_id", "__rid2")
        val lt = col(leftOn).cast("timestamp")
        val bDist = abs(unix_micros(lt) - unix_micros(col("__bt").cast("timestamp")))
        val fDist = abs(unix_micros(lt) - unix_micros(col("__ft").cast("timestamp")))
        val useB = col("__ft").isNull || (col("__bt").isNotNull && bDist <= fDist)
        val outCols = left.columns.map(col).toSeq ++ payloadCols.map { c =>
          when(useB, col(outName(c))).otherwise(col(s"__f_${outName(c)}")).as(outName(c))
        }
        merged.select(outCols.toIndexedSeq: _*)
      case _ =>
        directional(left, right, leftOn, rightOn, by, strategy == Backward, tolUs, allowEq,
          payloadCols, outName, matchTimeCol = None)
    }
  }

  /** One directional pass (backward or forward) of the union+window plan. */
  private def directional(left: DataFrame, right: DataFrame,
                          leftOn: String, rightOn: String,
                          by: Seq[(String, String)],
                          backward: Boolean,
                          tolUs: Option[Long],
                          allowEq: Boolean,
                          payloadCols: Seq[String],
                          outName: Map[String, String],
                          matchTimeCol: Option[String]): DataFrame = {
    val byOut = by.map(_._1)

    // normalize both sides to (on-key µs, by..., side, payload-struct, left cols)
    val tUs = (c: Column) => unix_micros(c.cast("timestamp"))

    val lPrep = left
      .withColumn("__t", tUs(col(leftOn)))
      .withColumn("__side", lit(1))

    // right payload packed into one struct → a single last()/first() window call
    val rStruct = struct((col(rightOn).as("__rt") +:
      payloadCols.map(c => col(c).as(c))).toIndexedSeq: _*)
    val rPrep0 = right
      .withColumn("__t", tUs(col(rightOn)))
      .withColumn("__side", lit(0))
      .withColumn("__rstruct", rStruct)
    val rPrep = by.foldLeft(rPrep0) { case (acc, (lb, rb)) =>
      if (lb == rb) acc else acc.withColumnRenamed(rb, lb)
    }

    val lCols = left.columns.toSeq
    val commonSel: Seq[String] = byOut ++ Seq("__t", "__side")
    val lSel = lPrep.select((commonSel.map(col) ++ Seq(lit(null).cast(rPrep.schema("__rstruct").dataType).as("__rstruct")) ++
      lCols.filterNot(byOut.contains).map(col)).toIndexedSeq: _*)
    val rSel = rPrep.select((commonSel.map(col) ++ Seq(col("__rstruct")) ++
      lCols.filterNot(byOut.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c))).toIndexedSeq: _*)

    val unioned = lSel.unionByName(rSel)

    // sort: time asc; at equal time, right rows first iff equality allowed
    // (so last() sees them); reversed for forward via descending time order.
    val sideOrder = if (allowEq) col("__side").asc else col("__side").desc
    val tOrd = if (backward) col("__t").asc else col("__t").desc

    val matched =
      if (by.nonEmpty) {
        val w = Window.partitionBy(byOut.map(col).toIndexedSeq: _*)
          .orderBy(tOrd, sideOrder)
          .rowsBetween(Window.unboundedPreceding, 0)
        unioned.withColumn("__match", last(col("__rstruct"), ignoreNulls = true).over(w))
      } else {
        unkeyedCarry(unioned, tOrd, sideOrder, backward, allowEq)
      }
    val onlyLeft = matched.filter(col("__side") === 1)

    // tolerance: null the match when |l.t - r.t| > tol
    val withTol = tolUs match {
      case Some(us) =>
        onlyLeft.withColumn("__match",
          when(abs(col("__t") - unix_micros(col("__match.__rt").cast("timestamp"))) <= lit(us),
            col("__match")))
      case None => onlyLeft
    }

    val base = lCols.map(col) ++
      payloadCols.map(c => col(s"__match.$c").as(outName(c))) ++
      matchTimeCol.map(mt => col("__match.__rt").as(mt)).toSeq
    withTol.select(base.toIndexedSeq: _*)
  }

  /** Scale path for as-of WITHOUT `by` keys (legal in the reference,
    * lazy.rs:501-569). A bare `Window.partitionBy()` would serialize the
    * whole dataset through one task; instead:
    *
    *   1. range-partition on the order key — every partition computes its
    *      running carry (`last(__rstruct, ignoreNulls)`) in parallel, keyed
    *      on `spark_partition_id()`;
    *   2. a per-partition "final carry" frame (≤ shuffle-partitions rows)
    *      gets a prefix window — the boundary value each partition inherits
    *      from all earlier ones — and is broadcast back onto the rows.
    *
    * Two shuffles of the data (range + pid hash, both fully parallel) plus
    * one tiny single-partition window over P rows; the range exchange is
    * shared by both branches via Spark's ReuseExchange. The equality guard
    * on the boundary handles an equal-time row pair straddling a partition
    * boundary under allowEq=false.
    */
  private def unkeyedCarry(unioned: DataFrame, tOrd: Column, sideOrder: Column,
                           backward: Boolean, allowEq: Boolean): DataFrame = {
    val parted = unioned.repartitionByRange(tOrd, sideOrder)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(tOrd, sideOrder)
      .rowsBetween(Window.unboundedPreceding, 0)
    val running = parted.withColumn("__match", last(col("__rstruct"), ignoreNulls = true).over(w))

    // per-partition final carry: the extreme-time right row of each pid
    // (struct compares field-by-field, so (t, rstruct) picks by time first)
    val pick = when(col("__side") === 0, struct(col("__t"), col("__rstruct")))
    val carryAgg = if (backward) max(pick) else min(pick)
    val prefixW = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    val boundaries = parted.groupBy("__pid").agg(carryAgg.as("__c"))
      .withColumn("__bnd", last(col("__c"), ignoreNulls = true).over(prefixW))
      .select(col("__pid"), col("__bnd"))

    val joined = running.join(broadcast(boundaries), Seq("__pid"), "left")
    val bT = col("__bnd.__t")
    val bndOk =
      if (backward) { if (allowEq) bT <= col("__t") else bT < col("__t") }
      else { if (allowEq) bT >= col("__t") else bT > col("__t") }
    joined
      .withColumn("__match", coalesce(col("__match"), when(bndOk, col("__bnd.__rstruct"))))
      .drop("__pid", "__bnd")
  }
}
