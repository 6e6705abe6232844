package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg == direct aggregate, including a pathological hot key") {
    // hot key: one entity with 10k rows, cold keys with a handful
    val hot = (1 to 10000).map(i => ("whale", (i % 97) / 100.0 + 1.0))
    val cold = (1 to 50).map(i => (s"u$i", i / 100.0))
    val df = (hot ++ cold).toDF("k", "v")

    val salted = Skew.saltedAgg(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = df.groupBy(col("k").as("entity_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(salted == direct) // decimal partials merge losslessly
    assert(salted("whale")._1 == 10000L)

    // determinism across runs: a retry-recomputed stage must land every
    // row on the SAME salt, so repeated evaluations agree exactly
    val again = Skew.saltedAgg(df, "k", "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again == salted)
  }

  test("saltedAgg stage-1 actually spreads the hot key") {
    // content-derived salt: the hot key's varying value column spreads it
    val df = (1 to 1000).map(i => ("whale", (i % 97) / 100.0)).toDF("k", "v")
    val salts = df.withColumn("_salt",
      pmod(xxhash64(col("k"), col("v")), lit(8)))
      .select("_salt").distinct().count()
    assert(salts > 1, "salt must distribute a single key over reducers")
  }

  test("saltedAgg's plan contains no nondeterministic expression") {
    // the retry-correctness guarantee: every expression in the analyzed
    // plan is deterministic, so a recomputed map task reproduces the
    // exact same (key, salt) assignment
    val df = (1 to 100).map(i => ("k", i / 10.0)).toDF("k", "v")
    val plan = Skew.saltedAgg(df, "k", "v", salts = 8)
      .queryExecution.analyzed
    val nondet = plan.collect {
      case node => node.expressions.flatMap(_.collect {
        case e if !e.deterministic => e
      })
    }.flatten
    assert(nondet.isEmpty,
      s"nondeterministic expressions in salted plan: $nondet")
  }
}
