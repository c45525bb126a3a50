package graft

import graft.functions.TypeLattice

/** A4 — the 4-type lattice (FIXTURES.md F4 + invariants of
  * /root/reference/pkg/util/types.go:65-84). */
class TypeLatticeSpec extends SparkTestBase {

  private val allTags = Seq("string", "null", "bool", "int", "float", "undefined")

  test("F4 fixture: mixed batches resolve by priority") {
    val lines = Seq(
      """{"a": 1, "b": 1.5, "c": true, "d": "x", "e": null}""",
      """{"a": 2.5, "b": 2,  "c": "yes", "d": 3, "e": null}""")
    val types = TypeLattice.inferTypes(lines)
    assert(types == Map(
      "a" -> "float", // float beats int
      "b" -> "float",
      "c" -> "string", // string beats bool
      "d" -> "string", // string beats int
      "e" -> "string")) // null-only defaults to string
  }

  test("int requires a 64-bit-parsable raw token") {
    assert(TypeLattice.inferTypes(Seq("""{"x": 123}"""))("x") == "int")
    assert(TypeLattice.inferTypes(Seq("""{"x": 1e3}"""))("x") == "float")
    assert(TypeLattice.inferTypes(Seq("""{"x": 1.0}"""))("x") == "float")
    // beyond int64 → float (strconv.Atoi fails in the reference)
    assert(TypeLattice.inferTypes(Seq("""{"x": 99999999999999999999}"""))("x") == "float")
    assert(TypeLattice.inferTypes(Seq(s"""{"x": ${Long.MaxValue}}"""))("x") == "int")
  }

  test("bool only wins when alone; arrays/objects force string") {
    assert(TypeLattice.inferTypes(Seq("""{"x": true}""", """{"x": false}"""))("x") == "bool")
    assert(TypeLattice.inferTypes(Seq("""{"x": true}""", """{"x": 1}"""))("x") == "int")
    assert(TypeLattice.inferTypes(Seq("""{"x": [1,2]}"""))("x") == "string")
    assert(TypeLattice.inferTypes(Seq("""{"x": {"y":1}}"""))("x") == "string")
  }

  test("exhaustive: every non-empty tag subset resolves to the highest-priority member") {
    // priority: string > undefined > float > int > bool; null alone → string
    for (subset <- allTags.toSet.subsets() if subset.nonEmpty) {
      val expect =
        if (subset("string") || subset("undefined")) "string"
        else if (subset("float")) "float"
        else if (subset("int")) "int"
        else if (subset("bool")) "bool"
        else "string" // {null}
      assert(TypeLattice.resolve(subset) == expect, s"subset=$subset")
      // order independence
      assert(TypeLattice.resolve(subset.toSeq.reverse) == expect)
    }
  }

  test("distributed inference matches driver-side inference") {
    val lines = Seq(
      """{"a": 1, "b": true, "c": "s"}""",
      """{"a": 2.5, "b": false, "d": null}""",
      """{"a": 3, "c": 7, "e": 1}""")
    val local = TypeLattice.inferTypes(lines)
    val dist = TypeLattice.inferTypesDistributed(spark, spark.createDataset(lines)(
      spark.implicits.newStringEncoder))
    assert(local == dist)
  }
}
