package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling
import graft.tables.Tables

/** Bounded-domain gate probe (dev main, the [[Explain]] family): runs
  * the maxDomain contract against a LIVE fixture and prints what each
  * side of the contract actually does there — the evidence the r08
  * verdict asked for, since the key-shifted sf1 stand-in could never
  * grow a value domain and so never exercised the gates.
  *
  * On a `--widen` fixture (scripts/gen_sf_scale.py) it shows BOTH
  * contract arms:
  *   1. documented-construction arm — a deliberately discretized
  *      measure (integer-banded l_quantity) keeps a tiny domain
  *      however many copies the fixture holds, and the count-frame
  *      operator runs fine;
  *   2. loud-failure arm — a near-continuous measure
  *      (l_extendedprice: distincts ≈ rows, growing with every copy)
  *      trips the gate with remediation instructions instead of
  *      funneling the data through one global-order window sort.
  *
  * `maxDomain` for arm 2 comes from SPARK_GRAFT_GATE_MAX (default
  * 2^20): the probe's point is the gate FIRING on a domain that grows
  * with the data — the production default 2^24 needs >16.7M rows of
  * continuous values to trip, more than the local stand-in holds.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1w sbt "runMain graft.GateProbe"
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val gateMax = sys.env.get("SPARK_GRAFT_GATE_MAX").map(_.toLong)
      .getOrElse(1L << 20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Sessions.defaultCpus)
    val spark = Sessions.local("graft-gate-probe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = Tables.lineitem(spark, sfDir)
    val nRows = li.count()
    val dQty = li.select(countDistinct(floor(col("l_quantity")))).first().getLong(0)
    val dExt = li.select(countDistinct(col("l_extendedprice"))).first().getLong(0)
    println(s"[gate] fixture=$sfDir rows=$nRows " +
      s"distinct(floor(l_quantity))=$dQty distinct(l_extendedprice)=$dExt")

    // arm 1: discretized measure — domain stays bounded by construction
    val drift = Profiling.ksDrift(
      li.filter(col("l_returnflag") === "R"),
      li.filter(col("l_returnflag") === "A"),
      floor(col("l_quantity")).cast("long"))
    println(s"[gate] arm1 (discretized, default maxDomain): ksDrift ran, " +
      s"result rows=${drift.count()}")

    // arm 2: continuous measure — the gate must refuse, loudly
    try {
      Profiling.ksDrift(
        li.filter(col("l_returnflag") === "R"),
        li.filter(col("l_returnflag") === "A"),
        col("l_extendedprice"), maxDomain = gateMax).count()
      println(s"[gate] arm2 FAILED: continuous measure with " +
        s"maxDomain=$gateMax did NOT trip the gate")
      sys.exit(1)
    } catch {
      case e: IllegalArgumentException =>
        println(s"[gate] arm2 fired as designed (maxDomain=$gateMax): " +
          e.getMessage.takeWhile(_ != '\n'))
    }
    spark.stop()
  }
}
