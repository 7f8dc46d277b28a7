package graft

import graft.core.Checkpoints
import org.scalatest.matchers.should.Matchers

/** Pins the release() safety contract the iterate-and-release loops
  * rely on: a checkpoint ROOT releases its persisted blocks; a frame
  * merely DERIVED from a checkpoint must be a no-op (releasing it
  * would reach through to a parent a sibling may still need).
  */
class CheckpointsSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("release drops a checkpoint root's persisted RDD") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ck = Checkpoints.eager(Seq(1, 2, 3).toDF("x"), reliable = false)
    val created = spark.sparkContext.getPersistentRDDs.keySet -- before
    created should not be empty
    Checkpoints.release(ck)
    (spark.sparkContext.getPersistentRDDs.keySet intersect created) shouldBe empty
  }

  test("release is a no-op on a derived frame (parent stays persisted and usable)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val parent = Checkpoints.eager(Seq(1, 2, 3).toDF("x"), reliable = false)
    val created = spark.sparkContext.getPersistentRDDs.keySet -- before
    val derived = parent.filter($"x" > 1).select(($"x" * 2).as("y"))
    Checkpoints.release(derived)
    (spark.sparkContext.getPersistentRDDs.keySet intersect created) should not be empty
    derived.collect().map(_.getInt(0)).sorted shouldBe Array(4, 6)
    Checkpoints.release(parent)
    (spark.sparkContext.getPersistentRDDs.keySet intersect created) shouldBe empty
  }

}
