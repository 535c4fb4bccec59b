package graft

import graft.operators.Triangles

/** Degree-oriented triangle counting: known closed forms, input
  * canonicalization, and the no-triangle cases.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, every vertex in three") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    assert(count(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars are triangle-free; one closing edge = one triangle") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    val star = (2L to 6L).map(i => (1L, i))
    assert(count(star) === Map.empty)
    assert(count(star :+ (2L, 3L)) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicates, reversed edges and self-loops canonicalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(count(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
