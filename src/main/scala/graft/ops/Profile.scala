package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level corpus profiling — the data-QA pass every new 100 TB drop
 * gets before anything trains on it: per column the row count, NULL
 * count, exact distinct count, and min/max rendered as strings. The
 * reference exposes per-FILE stats via `get_add_actions`
 * (`crates/core/src/operations/mod.rs` add_actions table); this is the
 * corpus-level synthesis of the same question over arbitrary columns.
 *
 * One wide aggregation computes every metric, then a generator unpivots
 * the single row into one output row per column — one job, one shuffle.
 * `count(DISTINCT)` over k columns expands to a k-way grouping internally
 * (Spark's Expand) — the SCAN is effectively multiplied k-fold — so the
 * exact default is for the handful of identity columns a go/no-go
 * decision needs (exact, not approx, deliberately: profile numbers feed
 * decisions and approx sketches differ across engines and runs). For a
 * WIDE profile at 100 TB pass `approxDistinct = true`: HyperLogLog++
 * (`approx_count_distinct`, default rsd 5%) is a plain partial-mergeable
 * aggregate, so the whole profile stays ONE linear scan with map-side
 * combine, no Expand, at any column count.
 *
 * min/max render via CAST AS STRING, bit-stable for integral and string
 * columns; floating columns render engine-dependently — prefer profiling
 * the integral/string/date identity columns this is meant for.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "Profile.profile: at least one column")
    require(cols.distinct == cols,
      s"Profile.profile: duplicate columns ${cols.diff(cols.distinct).mkString(", ")}")
    cols.foreach(c => require(df.columns.contains(c),
      s"Profile.profile: no such column '$c' (have ${df.columns.mkString(", ")})"))
    // resolve names EXACTLY as validated: bare col(c) re-parses dots, so a
    // column literally named "a.b" passed the guard above but resolved to
    // struct field a.b (silently profiling the wrong data) or threw an
    // unresolved-column error the guard promised away
    def exact(c: String): org.apache.spark.sql.Column =
      col("`" + c.replace("`", "``") + "`")
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.flatMap { c =>
      Seq(
        // coalesce: sum() over ZERO rows is NULL — an empty corpus must
        // profile as n_nulls = 0, not poison downstream null-rate checks
        coalesce(sum(when(exact(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(exact(c))
         else count_distinct(exact(c))).as(s"__nd_$c"),
        min(exact(c)).cast("string").as(s"__mn_$c"),
        max(exact(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map(c => struct(
      lit(c).as("column"),
      col("__rows").as("n_rows"),
      exact(s"__nn_$c").as("n_nulls"),
      exact(s"__nd_$c").as("n_distinct"),
      exact(s"__mn_$c").as("min_value"),
      exact(s"__mx_$c").as("max_value"))): _*)
    one.select(explode(rows).as("p")).select("p.*")
  }
}
