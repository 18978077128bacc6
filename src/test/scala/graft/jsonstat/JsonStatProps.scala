package graft.jsonstat

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck properties for the densifier (SURVEY.md §5.3): the distributed
  * stride-decode must agree with the driver-side reference enumeration for
  * arbitrary cubes, dense or sparse.
  */
object JsonStatProps extends Properties("JsonStat") {

  private lazy val spark = SparkSpec.session

  private val genDims: Gen[Seq[(String, IndexedSeq[String])]] = for {
    nDims <- Gen.choose(1, 4)
    sizes <- Gen.listOfN(nDims, Gen.choose(1, 5))
  } yield sizes.zipWithIndex.map { case (sz, j) =>
    s"d$j" -> (0 until sz).map(k => s"c${j}_$k").toIndexedSeq
  }

  private val genDenseCube: Gen[JsonStatCube] = for {
    dims <- genDims
    n = dims.map(_._2.length).product
    vals <- Gen.listOfN(n, Gen.option(Gen.choose(-1000.0, 1000.0)))
  } yield JsonStatCube(dims, Some(vals.toIndexedSeq), None)

  private val genSparseCube: Gen[JsonStatCube] = for {
    dims <- genDims
    n = dims.map(_._2.length).product
    present <- Gen.listOfN(n, Gen.oneOf(true, false))
    vals <- Gen.listOfN(n, Gen.choose(-1000.0, 1000.0))
  } yield JsonStatCube(dims, None,
    Some(present.zip(vals).zipWithIndex.collect { case ((true, v), i) => i.toLong -> v }.toMap))

  private def decodeMatchesReference(cube: JsonStatCube): Prop = {
    val expected = JsonStat.densifyLocal(cube)
      .map { case (codes, v) => cube.dims.map(d => codes(d._1)) -> v }.toMap
    val n = cube.dims.length
    val got = JsonStat.densify(spark, cube).collect().map { r =>
      (0 until n).map(r.getString) ->
        (if (r.isNullAt(n)) None else Some(r.getDouble(n)))
    }.toMap
    Prop(got == expected) :| s"dims=${cube.sizes} n=${cube.n}"
  }

  property("dense densify == reference enumeration") =
    forAll(genDenseCube)(decodeMatchesReference)

  property("sparse densify keeps null rows and == reference enumeration") =
    forAll(genSparseCube)(decodeMatchesReference)

  property("row count is always the size product") = forAll(genDenseCube) { cube =>
    JsonStat.densify(spark, cube).count() == cube.n
  }
}
