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

  test("saltedAgg tolerates map-typed columns (excluded from the salt hash)") {
    // xxhash64 rejects MapType since Spark 3.0 — a map column in the
    // frame must be skipped, not fed to the hash (round-5 behavior,
    // previously untested)
    val df = (1 to 200).map(i => ("whale", (i % 13) / 10.0, Map("a" -> i)))
      .toDF("k", "v", "m")
    val out = Skew.saltedAgg(df, "k", "v", salts = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = df.groupBy(col("k").as("entity_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == direct)
  }

  test("saltCols override restores spread when hot-key rows are whole-row duplicates") {
    // a pure (key, 1.0) count shape: content-derived salt collapses all
    // duplicate rows onto one salt; an explicit high-cardinality column
    // restores the spread
    val df = (1 to 1000).map(i => ("whale", 1.0, i.toLong))
      .toDF("k", "v", "event_id")
    val collapsed = df.withColumn("_salt",
        pmod(xxhash64(col("k"), col("v"), col("event_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(collapsed > 1)
    val out = Skew.saltedAgg(df, "k", "v", salts = 8,
      saltCols = Seq("event_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map("whale" -> (1000L, 1000.0)))
    // and the spread actually happens on the named column alone
    val spread = df.withColumn("_salt",
        pmod(xxhash64(col("event_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread > 1, "saltCols column must distribute the hot key")
  }

  test("all-map schema fails fast with a saltCols hint") {
    val df = (1 to 10).map(i => (Map("k" -> "x"), Map("v" -> i.toDouble)))
      .toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedAgg(df, "k", "v", salts = 4)
    }
    assert(e.getMessage.contains("saltCols"))
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

  test("saltedJoin == plain join, duplicates preserved, hot key spread") {
    // skewed fact: one whale key with 5k rows; small dim with dups
    val fact = ((1 to 5000).map(i => ("whale", i)) ++
      (1 to 60).map(i => (s"u${i % 20}", i))).toDF("k", "fv")
    val dim = (Seq(("whale", "w1"), ("whale", "w2")) ++
      (1 to 20).map(i => (s"u$i", s"d$i"))).toDF("dk", "dv")
    val plain = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "fv", "dv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val salted = Skew.saltedJoin(fact, "k", dim, "dk", salts = 8)
      .select("k", "fv", "dv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(salted === plain, "salted join must equal the plain join")
    // the whale's rows actually spread: >1 distinct salt observed
    val spread = fact.filter(col("k") === "whale")
      .withColumn("s", pmod(xxhash64(col("k"), col("fv")), lit(8)))
      .select("s").distinct().count()
    assert(spread > 1, "content salt must spread the hot key")
  }

  test("saltedJoin: content salt is deterministic in the plan (replay-safe)") {
    val fact = (1 to 100).map(i => ("k", i)).toDF("k", "fv")
    val dim = Seq(("k", "v")).toDF("dk", "dv")
    val plan = Skew.saltedJoin(fact, "k", dim, "dk", salts = 4)
      .queryExecution.analyzed
    val nondet = plan.collect { case p =>
      p.expressions.flatMap(_.collect {
        case e if !e.deterministic => e.getClass.getSimpleName
      })
    }.flatten
    assert(nondet.isEmpty,
      s"nondeterministic expressions in salted join plan: $nondet")
  }
}
