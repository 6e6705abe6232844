package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** The pure-SQL surface of graft's custom codegen expressions — the
  * same operators the DataFrame facade uses, registered so a
  * `spark.sql(...)`-only user (notebooks, JDBC/Thrift, SQL files) can
  * run every text/vector kernel without touching the Scala API:
  *
  *  - `graft_dot(a, b)`            float-vector dot product (double)
  *  - `graft_shingles(text, n)`    distinct 64-bit n-word shingle hashes
  *  - `graft_simhash64(text)`      64-bit SimHash signature
  *  - `graft_simhash64(text, fam)` independent signature family `fam`
  *                                 (wide-simhash banding; 0 = canonical)
  *
  * Two registration paths, one definition list:
  *  - cluster config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (injected at session build — survives `newSession()`)
  *  - live session: `GraftSqlFunctions.register(spark)`
  */
object GraftSqlFunctions {

  /** Constructor-parameter arguments (shingle width, signature family)
    * must be literal ints: the expression is specialized at plan time
    * — exactly like Spark's own `percentile_approx` accuracy arg. */
  private def litInt(fn: String, arg: String, e: Expression): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be an INTEGER literal, got $other")
    }

  private def arity(fn: String, c: Seq[Expression], n: Int*): Unit =
    require(n.contains(c.size),
      s"$fn takes ${n.mkString(" or ")} arguments, got ${c.size}")

  private def info(name: String, clazz: Class[_], usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "misc_funcs", "", "", "built-in")

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
                Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", classOf[FloatVecDot],
        "graft_dot(a, b) - dot product of two array<float> vectors as a double"),
      (c: Seq[Expression]) => {
        arity("graft_dot", c, 2)
        FloatVecDot(c(0), c(1))
      }),
    (FunctionIdentifier("graft_shingles"),
      info("graft_shingles", classOf[ShingleHash],
        "graft_shingles(text, n) - distinct 64-bit hashes of the n-word " +
          "shingles of text (n a literal int)"),
      (c: Seq[Expression]) => {
        arity("graft_shingles", c, 2)
        ShingleHash(c.head, litInt("graft_shingles", "n", c(1)))
      }),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", classOf[SimHash64],
        "graft_simhash64(text[, family]) - 64-bit SimHash signature; " +
          "family (literal int, default 0) selects an independent " +
          "signature family for wide banding"),
      (c: Seq[Expression]) => {
        arity("graft_simhash64", c, 1, 2)
        val fam =
          if (c.size < 2) 0 else litInt("graft_simhash64", "family", c(1))
        if (fam == 0) SimHash64(c.head)
        else SimHash64(c.head,
          ShingleHash.mix(ShingleHash.FnvOffset, fam.toLong))
      }))

  /** Register every graft function on a live session (idempotent —
    * re-registration replaces the same definition). */
  def register(spark: SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    all.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
  }
}

/** Session extension for cluster deployments:
  * `spark.sql.extensions=graft.functions.GraftExtensions` exposes the
  * whole [[GraftSqlFunctions]] surface to pure-SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSqlFunctions.all.foreach(ext.injectFunction)
}
