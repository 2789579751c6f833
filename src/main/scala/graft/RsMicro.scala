package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Sub-phase micro-probe for the [[graft.operators.Profiling]]
  * ranking machinery (dev main): times the individual pieces of one
  * bucketed ranking pass over the persisted q144 projection — raw
  * cache aggregate, bounds-joined bucket aggregate, bucket aggregate
  * plus its cumulative window, and the tail (target-joined) pass —
  * so the 3 s/ranking reading from [[RsProbe]] names its stage.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.RsMicro"
  */
object RsMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = Sessions.local("rs-micro", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rsm] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, sfDir)
    val v = li.select(col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType).as("x"),
        lit(1L).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist fill (count)") { v.count() }
    for (run <- 1 to 2) {
      t(s"plain cache agg run$run") {
        v.groupBy("g").agg(sum("x")).write.format("noop").mode("overwrite").save()
      }
      val bounds = v.groupBy("g")
        .agg(min("x").as("__lo"), max("x").as("__hi"), sum("w").as("__n"))
        .localCheckpoint(eager = true)
      val B = 64L
      val vb = v.join(broadcast(bounds), Seq("g"))
        .withColumn("__bkt", call_function("div",
          (col("x") - col("__lo")) * lit(B), col("__hi") - col("__lo") + lit(1L)))
      t(s"bounds-joined bucket agg run$run") {
        vb.groupBy(col("g"), col("__bkt"))
          .agg(sum("w").as("__bcnt"), max("__n").as("__n"))
          .write.format("noop").mode("overwrite").save()
      }
      val perBkt = vb.groupBy(col("g"), col("__bkt"))
        .agg(sum("w").as("__bcnt"), max("__n").as("__n"))
        .withColumn("__cum", sum(col("__bcnt")).over(
          Window.partitionBy("g").orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val target = t(s"target frame (bucket agg + window + agg) run$run") {
        val kq = call_function("div", col("__n") + lit(1L), lit(2L))
        perBkt.groupBy("g")
          .agg(min(when(col("__cum") >= kq, col("__bkt"))).as("__tbkt"),
            coalesce(max(when(col("__cum") < kq, col("__cum"))), lit(0L)).as("__off"),
            max("__n").as("__n"))
          .localCheckpoint(eager = true)
      }
      t(s"tail pass (target-joined scan + ordered tail) run$run") {
        vb.join(broadcast(target.drop("__n")), Seq("g"))
          .filter(col("__bkt") === col("__tbkt"))
          .groupBy(col("g"), col("x"))
          .agg(sum("w").as("cnt"), max("__off").as("__off"))
          .withColumn("__cum", col("__off") + sum("cnt").over(
            Window.partitionBy("g").orderBy("x")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("__cum") >= lit(3000001L))
          .groupBy("g").agg(min("x").as("q0"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
