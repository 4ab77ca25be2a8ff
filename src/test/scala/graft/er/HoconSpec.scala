package graft.er

import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free HOCON-subset parser against the syntax the
  * reference's own example configs use (comments, optional commas,
  * substitutions, nested objects/lists, unquoted scalars). */
class HoconSpec extends AnyFunSuite {

  test("reference-style config: comments, substitutions, lists, nesting") {
    val conf = Hocon.parse(
      """dblink : {
        |    // a reusable block, referenced below
        |    lowDistortion : {alpha : 0.5, beta : 50.0}
        |    simFn : {
        |        name : "LevenshteinSimilarityFn",
        |        parameters : {
        |            threshold : 7.0
        |            maxSimilarity : 10.0
        |        }
        |    }
        |    data : {
        |        path : "./examples/data.csv"
        |        recordIdentifier : "rec_id",
        |        # hash comments too
        |        nullValue : "NA"
        |        matchingAttributes : [
        |            {name : "by", similarityFunction : ${dblink.simFn}, distortionPrior : ${dblink.lowDistortion}},
        |            {name : "bm", similarityFunction : ${dblink.simFn}, distortionPrior : ${dblink.lowDistortion}}
        |        ]
        |    }
        |    randomSeed : 319158
        |    expectedMaxClusterSize : 10
        |    steps : [
        |        {name : "sample", parameters : {
        |            sampleSize : 100,
        |            burninInterval : 0,
        |            thinningInterval : 10,
        |            resume : false,
        |            sampler : "PCG-I"
        |        }},
        |        {name : "evaluate", parameters : {
        |            metrics : ["pairwise", "cluster"]
        |        }}
        |    ]
        |}""".stripMargin)
    assert(Hocon.string(conf, "dblink.data.path").contains("./examples/data.csv"))
    assert(Hocon.long(conf, "dblink.randomSeed").contains(319158L))
    assert(Hocon.double(conf, "dblink.lowDistortion.beta").contains(50.0))
    val attrs = Hocon.list(conf, "dblink.data.matchingAttributes").get
    assert(attrs.length == 2)
    val a0 = attrs.head.asInstanceOf[Map[String, Any]]
    // substitution resolved to the full object
    assert(Hocon.string(a0, "similarityFunction.name")
      .contains("LevenshteinSimilarityFn"))
    assert(Hocon.double(a0, "similarityFunction.parameters.threshold")
      .contains(7.0))
    assert(Hocon.double(a0, "distortionPrior.alpha").contains(0.5))
    val steps = Hocon.list(conf, "dblink.steps").get
      .map(_.asInstanceOf[Map[String, Any]])
    assert(Hocon.long(steps.head, "parameters.sampleSize").contains(100L))
    assert(Hocon.boolean(steps.head, "parameters.resume").contains(false))
    assert(Hocon.list(steps(1), "parameters.metrics")
      .contains(List("pairwise", "cluster")))
  }

  test("dotted keys, '=' separator, duplicate-object merge, bare scalars") {
    val conf = Hocon.parse(
      """a.b.c = 3
        |a : { d : true }
        |a : { e : hello world }
        |list : [1, 2.5, x]
        |""".stripMargin)
    assert(Hocon.long(conf, "a.b.c").contains(3L))
    assert(Hocon.boolean(conf, "a.d").contains(true)) // merged, not replaced
    assert(Hocon.string(conf, "a.e").contains("hello world"))
    assert(Hocon.list(conf, "list").contains(List(1L, 2.5, "x")))
  }

  test("unresolved substitutions and cycles are errors") {
    intercept[IllegalArgumentException](Hocon.parse("a : ${no.such.path}"))
    intercept[IllegalArgumentException](
      Hocon.parse("a : ${b}\nb : ${a}"))
  }
}
