package graft

import org.apache.spark.sql.functions._

/** Dev probe (NOT part of the library): prints the physical plan of
  * [[graft.operators.Profiling.ksDrift]]'s TWO-PHASE bucket-offset CDF
  * arm (domains above `windowDomain`; r18) by forcing the crossover to
  * 1 on the q164 shape — the committed plan evidence that the
  * cumulative windows are per-range-bucket, never a global-order
  * single partition. The default-arm plan is the declared q164 explain
  * (plans/r18/q164_ks_drift_after.txt).
  */
object KsCdfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-ks-cdf-probe", "4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.tables.Tables.lineitem(spark, sfDir)
    val qty = floor(col("l_quantity")).cast("long")
    val forced = graft.operators.Profiling.ksDrift(
      li.filter(col("l_returnflag") === "R").select(qty.as("x")),
      li.filter(col("l_returnflag") === "N").select(qty.as("x")),
      col("x"), windowDomain = 1L)
    println("===== ksDrift two-phase CDF arm (windowDomain forced to 1) =====")
    forced.explain("formatted")
    spark.stop()
  }
}
