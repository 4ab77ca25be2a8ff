package graft.er

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Config-driven end-to-end project run: CSV in → sample → summarize →
  * evaluate → resume, exercising every source/sink in SURVEY §2.1. */
class ERProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixture(dir: String): Unit = {
    val rng = new java.util.SplittableRandom(99L)
    val names = Vector("ANNA", "BERND", "CARSTEN", "DORIS", "ERWIN", "FRIEDA",
      "GERD", "HELGA", "INGO", "JUTTA")
    val sb = new StringBuilder("rec_id,ent_id,fname,by\n")
    (0 until 50).foreach { e =>
      val fn = names(rng.nextInt(names.length))
      val by = (1950 + rng.nextInt(30)).toString
      sb.append(s"r$e-0,$e,$fn,$by\n")
      if (e % 5 == 0) {
        val fn2 = fn.updated(rng.nextInt(fn.length), 'X')
        sb.append(s"r$e-1,$e,$fn2,$by\n")
      }
      if (e == 7) sb.append(s"r$e-2,$e,NA,$by\n") // missing value path
    }
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/records.csv"), sb.toString)
  }

  test("auto blocked sweeps: k=2 only when the sample cadence survives") {
    def conf(thin: Int, burnIn: Int, spj: Int = 0) =
      ERProject.Conf(dataPath = "x", idColumn = "id", outputPath = "y",
        thin = thin, burnIn = burnIn, sweepsPerJob = spj)
    assert(ERProject.effectiveSweepsPerJob(conf(thin = 2, burnIn = 0)) == 2)
    assert(ERProject.effectiveSweepsPerJob(conf(thin = 10, burnIn = 4)) == 2)
    // odd thin or burn-in would shift recorded samples off cadence → k=1
    assert(ERProject.effectiveSweepsPerJob(conf(thin = 1, burnIn = 0)) == 1)
    assert(ERProject.effectiveSweepsPerJob(conf(thin = 2, burnIn = 3)) == 1)
    // explicit setting always wins
    assert(ERProject.effectiveSweepsPerJob(conf(thin = 1, burnIn = 0, spj = 5)) == 5)
  }

  test("verbatim dblink-syntax HOCON config runs end to end") {
    val dir = Files.createTempDirectory("erhocon").toString
    writeFixture(dir)
    // the reference's examples/RLdata500.conf shape, verbatim syntax:
    // substitutions, comments, optional commas, nested step parameters
    val conf =
      s"""dblink : {
         |
         |    // Define distortion hyperparameters (to be referenced below)
         |    lowDistortion : {alpha : 0.5, beta : 50.0}
         |
         |    constSimFn : {
         |        name : "ConstantSimilarityFn",
         |    }
         |
         |    levSimFn : {
         |        name : "LevenshteinSimilarityFn",
         |        parameters : {
         |            threshold : 7.0
         |            maxSimilarity : 10.0
         |        }
         |    }
         |
         |    data : {
         |        path : "$dir/records.csv"
         |        recordIdentifier : "rec_id",
         |        entityIdentifier : "ent_id" // optional
         |        nullValue : "NA"
         |        matchingAttributes : [
         |            {name : "fname", similarityFunction : $${dblink.levSimFn}, distortionPrior : $${dblink.lowDistortion}},
         |            {name : "by", similarityFunction : $${dblink.constSimFn}, distortionPrior : $${dblink.lowDistortion}}
         |        ]
         |    }
         |
         |    randomSeed : 319158
         |    expectedMaxClusterSize : 10
         |
         |    partitioner : {
         |        name : "KDTreePartitioner",
         |        parameters : {
         |            numLevels : 1,
         |            matchingAttributes : ["fname"]
         |        }
         |    }
         |
         |    outputPath : "$dir/out/"
         |
         |    checkpointPath : "/tmp/spark_checkpoint/"
         |
         |    steps : [
         |        {name : "sample", parameters : {
         |            sampleSize : 4,
         |            burninInterval : 4,
         |            thinningInterval : 2,
         |            resume : false,
         |            sampler : "PCG-I"
         |        }},
         |        {name : "summarize", parameters : {
         |            lowerIterationCutoff : 0,
         |            quantities : ["cluster-size-distribution"]
         |        }},
         |        {name : "evaluate", parameters : {
         |            lowerIterationCutoff : 4,
         |            metrics : ["pairwise", "cluster"],
         |            useExistingSMPC : false
         |        }}
         |    ]
         |}""".stripMargin
    val confPath = s"$dir/project.conf"
    Files.writeString(Paths.get(confPath), conf)
    val parsed = ERProject.loadConf(confPath)
    assert(parsed.idColumn == "rec_id")
    assert(parsed.entityIdColumn.contains("ent_id"))
    assert(parsed.seed == 319158L)
    assert(parsed.attributes.map(_.name) == Seq("fname", "by"))
    assert(parsed.attributes.head.similarity == "levenshtein")
    assert(parsed.attributes.head.threshold == 7.0)
    assert(parsed.attributes(1).similarity == "constant")
    assert(parsed.partitioner == "kdtree" && parsed.numLevels == 1)
    assert(parsed.splitAttributes == Seq("fname"))
    assert(parsed.sampler == "pcg1")
    // sampleSize=4 recorded samples, burn-in 4, thinning 2 -> 12 sweeps
    assert(parsed.sweeps == 12 && parsed.burnIn == 4 && parsed.thin == 2)
    assert(parsed.steps == Seq("sample", "summarize", "evaluate"))

    val smpc = ERProject.run(spark, parsed)
    assert(smpc.isDefined)
    assert(Files.exists(Paths.get(s"$dir/out/diagnostics.csv")))
    assert(Files.exists(Paths.get(s"$dir/out/evaluation-results.txt")))
    val eval = Files.readString(Paths.get(s"$dir/out/evaluation-results.txt"))
    assert(eval.contains("precision:") && eval.contains("adjusted-rand-index:"))
  }

  test("config-driven sample/summarize/evaluate run + resume") {
    val dir = Files.createTempDirectory("erproject").toString
    writeFixture(dir)
    val confJson =
      s"""{
         |  "dataPath": "$dir/records.csv",
         |  "idColumn": "rec_id",
         |  "entityIdColumn": "ent_id",
         |  "nullValue": "NA",
         |  "attributes": [
         |    {"name": "fname", "similarity": "levenshtein",
         |     "threshold": 7.0, "maxSimilarity": 10.0,
         |     "alpha": 0.5, "beta": 50.0},
         |    {"name": "by", "similarity": "constant"}
         |  ],
         |  "partitioner": "kdtree", "numLevels": 1,
         |  "splitAttributes": ["fname"],
         |  "seed": 7, "sweeps": 12, "burnIn": 4, "thin": 2,
         |  "outputPath": "$dir/out",
         |  "steps": ["sample", "summarize", "evaluate"]
         |}""".stripMargin
    val conf = ERProject.parseConf(confJson)
    assert(conf.attributes.length == 2)
    assert(conf.fileIdColumn.isEmpty)

    val smpc = ERProject.run(spark, conf)
    assert(smpc.isDefined)

    // every sink exists and has content
    assert(Files.exists(Paths.get(s"$dir/out/diagnostics.csv")))
    val diag = Files.readString(Paths.get(s"$dir/out/diagnostics.csv"))
    assert(diag.linesIterator.next().startsWith("iteration,"))
    assert(diag.linesIterator.size == 5) // header + 4 recorded samples

    assert(Files.exists(Paths.get(s"$dir/out/evaluation-results.txt")))
    val eval = Files.readString(Paths.get(s"$dir/out/evaluation-results.txt"))
    assert(eval.contains("precision:") && eval.contains("adjusted-rand-index:"))

    assert(Files.exists(Paths.get(s"$dir/out/cluster-size-distribution.csv")))
    assert(Files.exists(Paths.get(s"$dir/out/partition-sizes.csv")))
    assert(Files.list(Paths.get(s"$dir/out/shared-most-probable-clusters.csv"))
      .count() > 0)

    // chain is readable + burn-in filter prunes
    val chain = IO.readChain(spark, s"$dir/out/linkage-chain.parquet")
    val n = chain.count()
    assert(n > 0)
    assert(IO.chainAfterBurnIn(chain, Long.MaxValue).count() == 0)

    // clusters CSV round-trips
    val clustersBack = IO.readClustersCsv(spark,
      s"$dir/out/shared-most-probable-clusters.csv")
    assert(clustersBack.count() > 0)

    // resume: saved state picks up at iteration 12 and can step further
    val resumed = IO.loadState(spark, s"$dir/out/saved-state")
    assert(resumed.iteration == 12L)
    assert(resumed.partitioner.numPartitions == 2)
    val stepped = resumed.step()
    assert(stepped.iteration == 13L)
    assert(stepped.summary.numObservedEntities > 0)

    // copy-files step: plain files AND parquet directories land at the
    // destination; missing names are skipped; source left in place
    val dest = s"$dir/archive"
    val copyConf = conf.copy(
      steps = Seq("copy-files"),
      copyFiles = Seq("diagnostics.csv", "evaluation-results.txt",
        "linkage-chain.parquet", "no-such-output.csv"),
      copyDestination = dest)
    ERProject.run(spark, copyConf)
    assert(Files.exists(Paths.get(s"$dest/diagnostics.csv")))
    assert(Files.exists(Paths.get(s"$dest/evaluation-results.txt")))
    assert(IO.readChain(spark, s"$dest/linkage-chain.parquet").count() > 0)
    assert(!Files.exists(Paths.get(s"$dest/no-such-output.csv")))
    assert(Files.exists(Paths.get(s"$dir/out/diagnostics.csv")))
  }
}
