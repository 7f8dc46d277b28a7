package graft

import graft.functions.{CosineExpr, LshBucketExpr, ShinglesExpr, WinnowFingerprintsExpr}
import graft.ops.{GeodesicDistExpr, PointInPolygonExpr}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Expression, ExpressionInfo, Literal, Md5, Pmod, Substring}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-function surface for graft's native Catalyst expressions, so the
  * operators are reachable from pure `spark.sql(...)` text as well as the
  * Column API:
  *
  *  - `lsh_bucket(embedding[, nPlanes, dim])`     → BIGINT bucket id
  *  - `winnow_fingerprints(text[, k, w])`          → ARRAY<BIGINT>
  *  - `point_in_polygon(lat, lon, ring)`           → BOOLEAN
  *  - `cosine_sim(a, b)`                           → DOUBLE
  *  - `geodesic_dist(lat1, lon1, lat2, lon2)`      → DOUBLE (WGS-84 m)
  *  - `shingles(text[, k])`                        → ARRAY<STRING>
  *
  * Two registration paths, same builders:
  *  - `GraftFunctions.register(spark)` on a live session;
  *  - `spark.sql.extensions=graft.GraftExtensions` (the standard
  *    [[SparkSessionExtensions]] injection point) at session build.
  */
object GraftFunctions {

  /** Evaluate a constant integer argument: builders run at resolution
    * time, before constant folding, so accept any foldable expression
    * (`2*8`, `CAST(12 AS BIGINT)`), not only pre-folded Int literals.
    */
  private def intLit(e: Expression, name: String): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$name must be an integer constant, got $other")
    } else throw new IllegalArgumentException(
      s"$name must be a constant, got $e")

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
        // implicit input casts: SQL users write point_in_polygon(51.5, …)
        // and Spark parses 51.5 as DECIMAL(3,1); the expression itself
        // requires doubles (Catalyst removes redundant casts)
        case Seq(lat, lon, ring) => PointInPolygonExpr(
          Cast(lat, DoubleType), Cast(lon, DoubleType),
          Cast(ring, ArrayType(DoubleType)))
        case _ => throw new IllegalArgumentException(
          "usage: point_in_polygon(lat, lon, ring)")
      }
    },
    "cosine_sim" -> { args: Seq[Expression] =>
      args match {
        case Seq(a, b) => CosineExpr(a, b)
        case _ => throw new IllegalArgumentException("usage: cosine_sim(a, b)")
      }
    },
    "geodesic_dist" -> { args: Seq[Expression] =>
      args match {
        case Seq(lat1, lon1, lat2, lon2) => GeodesicDistExpr(
          Cast(lat1, DoubleType), Cast(lon1, DoubleType),
          Cast(lat2, DoubleType), Cast(lon2, DoubleType))
        case _ => throw new IllegalArgumentException(
          "usage: geodesic_dist(lat1, lon1, lat2, lon2)")
      }
    },
    "shingles" -> { args: Seq[Expression] =>
      args match {
        case Seq(e) => ShinglesExpr(e, 3)
        case Seq(e, k) => ShinglesExpr(e, intLit(k, "k"))
        case _ => throw new IllegalArgumentException("usage: shingles(text[, k])")
      }
    },
    "hash_bucket" -> { args: Seq[Expression] =>
      // same op tree as Sampling.hashBucket, spelled in Catalyst directly
      // (a Column built from unresolved functions cannot cross the
      // bridge mid-resolution): pmod(conv(substr(md5(salt||key),1,8),16,10), 1e6)
      def build(key: Expression, salt: String): Expression =
        Pmod(Cast(Conv(Substring(Md5(Concat(Seq(Literal(salt),
          Cast(key, org.apache.spark.sql.types.StringType)))),
          Literal(1), Literal(8)), Literal(16), Literal(10)),
          org.apache.spark.sql.types.LongType), Literal(1000000L))
      args match {
        case Seq(key) => build(key, "graft")
        case Seq(key, salt) if salt.foldable =>
          build(key, String.valueOf(salt.eval()))
        case _ => throw new IllegalArgumentException(
          "usage: hash_bucket(key[, salt]) — salt must be a string constant")
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
