package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Throwaway micro-probe: try_cast vs regex-guarded cast on
  * non-numeric strings (the q02 cost theory). */
object TcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("tc-probe", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(2000000)
      .select(when(col("id") % 2 === 0, lit("BUILDING"))
        .otherwise(col("id").cast(StringType)).as("s"))
      .localCheckpoint(true)
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(c.as("v")).write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("try_cast")(col("s").try_cast(IntegerType))
    time("guarded ")(graft.functions.Fns.tryCastInt(col("s")))
    // equality check on mixed content incl. overflow + spaces + signs
    val probe = Seq("42", " 17 ", "+8", "-0", "BUILDING", "12.5", "",
      "99999999999", "999999999999999999999", "1e3", "0x10", " - 5",
      "\t42", "\n7", "\r8", "\u00A09", "\u20283", "5\t", "\u000B6",
      "\u00012", "00042", "-00042", "+000000000000000000000042", "2147483647",
      "2147483648", "-2147483648", "-2147483649", "0", "000", "4 2").toDF("s")
    val both = probe.select(col("s"),
      col("s").try_cast(IntegerType).as("tc"),
      graft.functions.Fns.tryCastInt(col("s")).as("g"))
    both.collect().foreach(r => println(s"CMP [${r.getString(0)}] tc=${r.get(1)} g=${r.get(2)} ${if (r.get(1) == r.get(2)) "OK" else "DIVERGE"}"))
    spark.stop()
  }
}
