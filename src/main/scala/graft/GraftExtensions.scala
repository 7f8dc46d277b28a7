package graft

import graft.functions.{LshBucketExpr, WinnowFingerprintsExpr}
import graft.ops.PointInPolygonExpr
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-function surface for graft's native Catalyst expressions, so the
  * operators are reachable from pure `spark.sql(...)` text as well as the
  * Column API:
  *
  *  - `lsh_bucket(embedding[, nPlanes, dim])`     → BIGINT bucket id
  *  - `winnow_fingerprints(text[, k, w])`          → ARRAY<BIGINT>
  *  - `point_in_polygon(lat, lon, ring)`           → BOOLEAN
  *
  * Two registration paths, same builders:
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `spark.sql.extensions=graft.GraftExtensions` (the standard
  *    [[SparkSessionExtensions]] injection point) at session build.
  */
object GraftFunctions {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "lsh_bucket" -> { args: Seq[Expression] =>
      args match {
        case Seq(e) => LshBucketExpr(e, 12, 64)
        case Seq(e, p, d) => LshBucketExpr(e, intLit(p, "nPlanes"), intLit(d, "dim"))
        case _ => throw new IllegalArgumentException(
          "usage: lsh_bucket(embedding[, nPlanes, dim])")
      }
    },
    "winnow_fingerprints" -> { args: Seq[Expression] =>
      args match {
        case Seq(e) => WinnowFingerprintsExpr(e, 8, 16)
        case Seq(e, k, w) => WinnowFingerprintsExpr(e, intLit(k, "k"), intLit(w, "w"))
        case _ => throw new IllegalArgumentException(
          "usage: winnow_fingerprints(text[, k, w])")
      }
    },
    "point_in_polygon" -> { args: Seq[Expression] =>
      args match {
        case Seq(lat, lon, ring) => PointInPolygonExpr(lat, lon, ring)
        case _ => throw new IllegalArgumentException(
          "usage: point_in_polygon(lat, lon, ring)")
      }
    })

  def register(spark: SparkSession): Unit = registry.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info(name), builder)
  }

  private[graft] def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.GraftFunctions", name)
}

/** `spark.sql.extensions=graft.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registry.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), GraftFunctions.info(name), builder))
    }
}
