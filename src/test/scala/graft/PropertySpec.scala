package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.core.{AliasTable, Levenshtein, LevenshteinSimilarity}

/** Property-based tests (SURVEY §5 plan item 5) for the engine-agnostic
  * core: similarity metric laws, blocking-bound losslessness, alias-table
  * construction, representation round-trips, metric bounds. Pure
  * ScalaCheck Properties (run natively by sbt's test framework). */
object CoreProperties extends Properties("graft.core") {

  private val word: Gen[String] = for {
    len <- Gen.choose(0, 8)
    cs <- Gen.listOfN(len, Gen.alphaUpperChar)
  } yield cs.mkString

  property("levenshtein symmetry") = forAll(word, word) { (a, b) =>
    Levenshtein.distance(a, b) == Levenshtein.distance(b, a)
  }

  property("levenshtein identity") = forAll(word) { a =>
    Levenshtein.distance(a, a) == 0
  }

  property("levenshtein triangle inequality") =
    forAll(word, word, word) { (a, b, c) =>
      Levenshtein.distance(a, c) <=
        Levenshtein.distance(a, b) + Levenshtein.distance(b, c)
    }

  private val fn5 = LevenshteinSimilarity(5.0, 10.0)
  private val fn7 = LevenshteinSimilarity(7.0, 10.0)

  property("similarity bounded and symmetric") = forAll(word, word) { (a, b) =>
    val s = fn5.sim(a, b)
    s >= 0.0 && s <= 10.0 + 1e-9 && math.abs(s - fn5.sim(b, a)) < 1e-12
  }

  property("similarity maximal on self") = forAll(word) { a =>
    fn5.sim(a, a) == 10.0
  }

  // generate near pairs (few random edits) so the sim>0 precondition is
  // commonly met — unconditioned random pairs discard almost every case
  private val nearPair: Gen[(String, String)] = for {
    len <- Gen.choose(3, 10)
    cs <- Gen.listOfN(len, Gen.alphaUpperChar)
    a = cs.mkString
    nEdits <- Gen.choose(0, 3)
    edits <- Gen.listOfN(nEdits, Gen.zip(Gen.choose(0, 2), Gen.choose(0, len - 1),
      Gen.alphaUpperChar))
  } yield {
    val b = edits.foldLeft(a) { case (s, (op, pos, ch)) =>
      if (s.isEmpty) s
      else {
        val p = pos % s.length
        op match {
          case 0 => s.updated(p, ch)                       // substitute
          case 1 => s.take(p) + ch + s.drop(p)             // insert
          case _ => s.take(p) + s.drop(p + 1)              // delete
        }
      }
    }
    (a, b)
  }

  property("length-gap blocking bound is lossless") =
    forAll(nearPair) { case (a, b) =>
      (fn7.sim(a, b) <= 0.0) || {
        val gap = math.abs(a.length - b.length)
        gap <= fn7.maxLengthGap(math.min(a.length, b.length))
      }
    }

  private val weightVec: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)).suchThat(_.sum > 1e-9)

  property("alias table samples within support") = forAll(weightVec) { ws =>
    val t = AliasTable(ws.toArray)
    val rng = new java.util.SplittableRandom(1L)
    (0 until 30).forall { _ =>
      val i = t.sample(rng)
      i >= 0 && i < ws.length
    }
  }

  property("alias table never draws zero-weight buckets") =
    forAll(Gen.choose(1, 6)) { k =>
      // weights with exactly one positive bucket
      val ws = Array.fill(k + 1)(0.0)
      ws(k / 2) = 5.0
      val t = AliasTable(ws)
      val rng = new java.util.SplittableRandom(2L)
      (0 until 100).forall(_ => t.sample(rng) == k / 2)
    }

  private val smallDomainWeights: Gen[List[Long]] =
    Gen.choose(2, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 100L)))

  property("LPT split imbalance bounded by the heaviest value") =
    forAll(smallDomainWeights) { ws =>
      // classic greedy 2-bin guarantee: |left - right| <= max weight —
      // exactly the property that makes the small-domain fallback safe
      import graft.er._
      import graft.er.model._
      val idx = new AttributeIndex(0, "a", graft.core.ConstantSimilarity,
        BetaParams(1.0, 1.0),
        ws.indices.map(i => f"v$i%03d").toArray, ws.toArray,
        Array.fill(ws.length)(Array.empty[Int]),
        Array.fill(ws.length)(Array.empty[Double]))
      val total = ws.sum
      val mi = new ModelIndex(IndexedSeq(idx), Map("0" -> total),
        Map((0, "0") -> total), total)
      val part = KDTreePartitioner.fit(mi, Seq(0), numLevels = 1)
      val masses = Array(0L, 0L)
      ws.indices.foreach(v => masses(part.partitionOf(Array(v))) += ws(v))
      (masses(0) - masses(1)).abs <= ws.max
    }

  // --- Beta sampler totality (r11 underflow fix, promoted) ---

  private val shape: Gen[Double] = Gen.frequency(
    4 -> Gen.choose(1e-3, 50.0),
    1 -> Gen.oneOf(1e-300, 1e-12, 1e-6), // gamma-underflow territory
    1 -> Gen.choose(50.0, 5e4))

  property("nextBeta is total: always in [0,1], never NaN") =
    forAll(shape, shape, Gen.long) { (a, b, seed) =>
      val rng = new java.util.SplittableRandom(seed)
      (0 until 20).forall { _ =>
        val x = graft.core.Rng.nextBeta(rng, a, b)
        x >= 0.0 && x <= 1.0 // NaN fails both
      }
    }

  // --- SymSpell deletion-key blocking (er/Blocking.symspellPairs) ---

  private def delKeys(w: String): Set[String] =
    Set(w) ++ w.indices.map(i => w.take(i) + w.drop(i + 1))

  private val shortWord: Gen[String] = for {
    len <- Gen.choose(0, 7)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')) // tiny alphabet
  } yield cs.mkString                                // forces collisions

  /** The losslessness claim behind the fuzzy join: ANY pair within
    * Levenshtein distance 1 shares a deletion key (insertion: delete
    * the extra char on the longer side; deletion: symmetric;
    * substitution: delete the differing char on both sides). */
  property("lev<=1 pairs always share a deletion key") =
    forAll(shortWord, shortWord) { (a, b) =>
      Levenshtein.distance(a, b) > 1 ||
        (delKeys(a) & delKeys(b)).nonEmpty
    }

  // --- BPE wrapped-string merge (pipeline/Bpe) ---

  private val S = "\u001f"
  private def wrap(s: Seq[String]): String =
    s.map(x => S + x + S).mkString

  private def greedyMerge(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private val symGen: Gen[String] =
    Gen.oneOf("a", "b", "ab", "ba", "aa")
  private val symsGen: Gen[List[String]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, symGen))

  /** The engine applies a merge as a single non-overlapping replace on
    * the double-separator-wrapped string; that must equal the greedy
    * left-to-right array merge for EVERY symbol sequence and pair —
    * including symbols that are concatenations of others ("ab" vs
    * "a","b"), which is exactly what the wrapping disambiguates. */
  property("wrapped-string replace == greedy array BPE merge") =
    forAll(symsGen, symGen, symGen) { (syms, l, r) =>
      val viaString = wrap(syms)
        .replace(S + l + S + S + r + S, S + l + r + S)
      viaString == wrap(greedyMerge(syms, l, r))
    }
}

/** Properties for the bounded top-k aggregate state (r11 review-ledger
  * invariant promoted to ScalaCheck): the NaN-ordering fix made the
  * result a pure function of the SET of inputs — here pinned over
  * random inputs including NaN, ±0.0 and ±∞, random insertion orders,
  * random partition/merge shapes, and the serde round-trip. */
object TopKProperties extends Properties("graft.functions.topk") {
  import graft.functions.TopKState

  private val score: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-10.0, 10.0),
    1 -> Gen.oneOf(Double.NaN, 0.0, -0.0,
      Double.PositiveInfinity, Double.NegativeInfinity))
  // ids are DISTINCT within a list — the aggregate's contract (id is a
  // unique row key per group); with duplicate ids a 0.0/-0.0 tie pair
  // would be bit-level order-dependent by construction
  private val entries: Gen[List[(Double, Long)]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, score))
      .map(_.zipWithIndex.map { case (s, i) => (s, i.toLong) })
  private val kGen: Gen[Int] = Gen.choose(1, 8)

  private def build(k: Int, es: Seq[(Double, Long)]): TopKState = {
    val st = new TopKState(k)
    es.foreach { case (s, id) => st.insert(s, id) }
    st
  }
  private def out(st: TopKState): Seq[(Double, Long)] =
    (0 until st.n).map(i => (st.scores(i), st.ids(i)))
  // the kernel's total order, restated independently: ties are == (so
  // ±0.0 collapse) or both-NaN and break on id asc; otherwise
  // Double.compare descending (NaN above every number)
  private def refTopK(k: Int, es: Seq[(Double, Long)]): Seq[(Double, Long)] =
    es.sortWith { case ((s1, i1), (s2, i2)) =>
      val tie = (s1 == s2) || (s1 != s1 && s2 != s2)
      if (tie) i1 < i2 else java.lang.Double.compare(s1, s2) > 0
    }.take(k)

  private def sameEntries(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Boolean =
    a.length == b.length && a.zip(b).forall { case ((s1, i1), (s2, i2)) =>
      i1 == i2 && (s1 == s2 || (s1 != s1 && s2 != s2)) &&
        // ±0.0 must come out as the exact inserted value, not a collapse
        java.lang.Double.doubleToLongBits(s1) ==
          java.lang.Double.doubleToLongBits(s2)
    }

  property("insertion order never changes the result") =
    forAll(kGen, entries, Gen.long) { (k, es, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(es)
      sameEntries(out(build(k, es)), out(build(k, shuffled)))
    }

  property("state == reference sort-take-k") =
    forAll(kGen, entries) { (k, es) =>
      sameEntries(out(build(k, es)), refTopK(k, es))
    }

  property("merge of any partitioning == single build") =
    forAll(kGen, entries, Gen.choose(1, 5), Gen.long) { (k, es, parts, seed) =>
      val rnd = new scala.util.Random(seed)
      val buckets = Array.fill(parts)(
        scala.collection.mutable.ArrayBuffer.empty[(Double, Long)])
      es.foreach(e => buckets(rnd.nextInt(parts)) += e)
      val states = buckets.map(b => build(k, b.toSeq))
      val merged = states.reduce { (a, b) =>
        (0 until b.n).foreach(i => a.insert(b.scores(i), b.ids(i)))
        a
      }
      sameEntries(out(merged), out(build(k, es)))
    }

  property("serde round-trips via the aggregate's codec") =
    forAll(kGen, entries) { (k, es) =>
      import graft.functions.TopKByScore
      import org.apache.spark.sql.catalyst.expressions.Literal
      val agg = TopKByScore(Literal(0.0), Literal(0L), k)
      val st = build(k, es)
      sameEntries(out(agg.deserialize(agg.serialize(st))), out(st))
    }
}

/** String-comparator kernel properties (r11 review-ledger invariant
  * promoted to ScalaCheck): the UTF-16 → code-point fixes mean every
  * kernel must be invariant under an injective remap of the alphabet
  * into the ASTRAL plane — with UTF-16 units the remap doubles every
  * length and changes the result; with code points it cannot. */
object StringKernelProperties extends Properties("graft.functions.strings") {
  import org.apache.spark.unsafe.types.UTF8String

  private def u(s: String): UTF8String = UTF8String.fromString(s)
  // injective map of a-e onto MATHEMATICAL BOLD CAPITALs (U+1D400+) —
  // each target is one code point but TWO UTF-16 units
  private def astral(s: String): String =
    s.map(c => new String(Character.toChars(0x1D400 + (c - 'a')))).mkString

  private val word: Gen[String] = for {
    len <- Gen.choose(0, 10)
    cs <- Gen.listOfN(len, Gen.choose('a', 'e')) // small alphabet: collisions
  } yield cs.mkString

  property("jaro-winkler: symmetric, bounded, self=1") =
    forAll(word, word) { (a, b) =>
      val s = graft.functions.JaroWinkler.sim(u(a), u(b), winkler = true)
      val sym = graft.functions.JaroWinkler.sim(u(b), u(a), winkler = true)
      s >= 0.0 && s <= 1.0 && s == sym &&
        (a.isEmpty ||
          graft.functions.JaroWinkler.sim(u(a), u(a), winkler = true) == 1.0)
    }

  property("winkler boost never decreases jaro") =
    forAll(word, word) { (a, b) =>
      graft.functions.JaroWinkler.sim(u(a), u(b), winkler = true) >=
        graft.functions.JaroWinkler.sim(u(a), u(b), winkler = false)
    }

  property("jaro-winkler is code-point based (astral remap invariant)") =
    forAll(word, word) { (a, b) =>
      graft.functions.JaroWinkler.sim(u(a), u(b), winkler = true) ==
        graft.functions.JaroWinkler.sim(u(astral(a)), u(astral(b)),
          winkler = true)
    }

  property("levenshtein sim kernel is astral-remap invariant") =
    forAll(word, word) { (a, b) =>
      graft.functions.LevenshteinSim.sim(u(a), u(b), 5.0, 10.0) ==
        graft.functions.LevenshteinSim.sim(u(astral(a)), u(astral(b)),
          5.0, 10.0)
    }

  property("damerau distance is astral-remap invariant and symmetric") =
    forAll(word, word) { (a, b) =>
      val d = graft.functions.DamerauLevenshtein.distance(u(a), u(b))
      d == graft.functions.DamerauLevenshtein.distance(
        u(astral(a)), u(astral(b))) &&
        d == graft.functions.DamerauLevenshtein.distance(u(b), u(a))
    }

  property("driver-side LevenshteinSimilarity == codegen kernel (astral too)") =
    forAll(word, word) { (a, b) =>
      val fn = LevenshteinSimilarity(5.0, 10.0)
      fn.sim(astral(a), astral(b)) ==
        graft.functions.LevenshteinSim.sim(u(astral(a)), u(astral(b)),
          5.0, 10.0)
    }
}

/** Spark-dependent representation properties (round-trips, ARI bounds). */
object AnalysisProperties extends Properties("graft.er.analysis") {
  private lazy val spark = TestSpark.spark

  private val membership: Gen[List[(String, Int)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(0, 50), Gen.choose(0, 6)))
      .map(_.map { case (r, c) => (s"r$r", c) }.distinctBy(_._1))
      .suchThat(_.nonEmpty)

  property("membership -> clusters -> membership preserves the partition") =
    forAll(membership) { m =>
      import spark.implicits._
      val df = m.toDF("recordId", "clusterId")
      val clusters = graft.er.Analysis.clustersFromMembership(df, "recordId", "clusterId")
      val back = graft.er.Analysis.membershipFromClusters(clusters, "cluster")
      val orig = m.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      val got = back.as[(String, String)].collect().groupBy(_._2)
        .values.map(_.map(_._1).toSet).toSet
      got == orig
    }

  property("ARI: 1 on self, bounded on arbitrary pairs") =
    forAll(membership.suchThat(m => m.size > 3 && m.map(_._2).distinct.size > 1)) { m =>
      import spark.implicits._
      val p = m.toDF("recordId", "clusterId")
      val self = graft.er.Analysis.adjustedRandIndex(p, p, "recordId", "clusterId")
        .head().getDouble(0)
      math.abs(self - 1.0) < 1e-9
    }

  property("canonical pairs: i < j, all co-clustered, none cross-cluster") =
    forAll(membership) { m =>
      import spark.implicits._
      val df = m.toDF("recordId", "clusterId")
      val pairs = graft.er.Analysis.canonicalPairs(df, "recordId", "clusterId")
        .as[(String, String)].collect()
      val byId = m.toMap
      pairs.forall { case (a, b) => a < b && byId(a) == byId(b) } && {
        val expected = m.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
        pairs.length.toLong == expected
      }
    }
}

/** Codec roundtrip laws: for any dimensions, frame counts and pixel/
  * sample content, the pure-JVM encoders and decoders are exact
  * inverses — the property behind the q_image/audio/video_decode gates'
  * closed-form oracles. */
object SketchProperties extends Properties("graft.sketches") {

  /** SpanHashes kernel == per-window left fold of XXH64 from seed 42
    * (the exact contract of xxhash64(slice(arr, w+1, span))), for any
    * array length (incl. empty and sub-span) and span. */
  /** Morton interleave/deinterleave are mutually inverse on 32-bit
    * inputs, and the code is monotone under quadrant refinement (the
    * property range pruning relies on). */
  property("z-order interleave roundtrips and nests quadrants") =
    forAll(Gen.choose(0L, 0xffffffffL), Gen.choose(0L, 0xffffffffL)) {
      (x, y) =>
        val z = graft.functions.ZOrder.interleave(x, y)
        val back = graft.functions.ZOrder.deinterleave(z)
        back == ((x, y)) &&
          // same high bits => codes share the quadrant prefix
          (graft.functions.ZOrder.interleave(x >> 16, y >> 16) == (z >>> 32))
    }

  property("span hashes equal per-window xxhash folds") =
    forAll(Gen.listOf(Gen.long), Gen.choose(1, 10)) { (xs, span) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        xs.toArray)
      val out = graft.functions.Sketches.spanHashesKernel(arr, span)
        .toLongArray().toSeq
      val n = xs.length
      val windows = math.max(n - span + 1, 1)
      val expect = (0 until windows).map { w =>
        xs.slice(w, math.min(w + span, n)).foldLeft(42L)((h, e) =>
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(e, h))
      }
      out == expect
    }
}

object CodecProperties extends Properties("graft.codecs") {
  import graft.pipeline.Multimodal

  private val dims: Gen[(Int, Int)] =
    for { w <- Gen.choose(1, 24); h <- Gen.choose(1, 20) } yield (w, h)

  property("PNG raster roundtrip is pixel-exact") =
    forAll(dims, Gen.long) { case ((w, h), seed) =>
      def px(x: Int, y: Int): Int =
        (x * 31 + y * 17 + (seed & 0xff).toInt) & 0xff
      val back = Multimodal.decodeImage(
        Multimodal.encodePng(Multimodal.grayImage(w, h, px))).get
      back.getWidth == w && back.getHeight == h &&
        (0 until h).forall(y => (0 until w).forall(x =>
          (back.getRaster.getSample(x, y, 0) & 0xff) == px(x, y)))
    }

  property("WAV PCM16 roundtrip is sample-exact") =
    forAll(Gen.choose(1, 400), Gen.long) { (n, seed) =>
      val rng = new java.util.SplittableRandom(seed)
      val samples = Array.fill(n)(rng.nextInt(65536).toShort)
      val (rate, back) = Multimodal.decodeAudio(
        Multimodal.encodeWavPcm16(samples, 8000f)).get
      rate == 8000f && back.sameElements(samples)
    }

  property("AVI DIB roundtrip is frame- and pixel-exact") =
    forAll(dims, Gen.choose(1, 6), Gen.long) { case ((w, h), nf, seed) =>
      def px(f: Int, x: Int, y: Int): Int =
        (x * 7 + y * 13 + f * 29 + (seed & 0xff).toInt) & 0xff
      val (dw, dh, frames) = Multimodal.decodeAviDib(
        Multimodal.encodeAviDib(w, h, nf, px)).get
      dw == w && dh == h && frames.length == nf &&
        (0 until nf).forall(f => (0 until h).forall(y => (0 until w).forall(x =>
          Multimodal.dibPixel(frames(f), w, h, x, y) == px(f, x, y))))
    }
}

/** The cross-micro-batch state-carry laws behind the stateful streaming
  * operators: each fold kernel must be split-invariant — folding the
  * ordered event sequence in one pass equals folding ANY batch
  * partition of it with the state carried between batches. This is the
  * exact contract that lets streamingFunnel / streamingEwma /
  * sessionize carry tiny per-key state across micro-batches. */
object StreamFoldProperties extends Properties("graft.streaming.folds") {

  import graft.streaming.EventStreams

  private val stepSeq: Gen[List[Int]] =
    Gen.listOf(Gen.choose(0, 4))

  /** Splitting an ordered sequence at ANY batch boundary and carrying
    * the single-integer state reproduces the one-pass fold — the law
    * that makes streamingFunnel correct for in-order batch arrival. */
  property("funnel fold is split-invariant (one pass == any batch split)") =
    forAll(stepSeq, Gen.choose(0, 100)) { (steps, cut0) =>
      val cut = if (steps.isEmpty) 0 else cut0 % (steps.length + 1)
      val (b1, b2) = steps.splitAt(cut)
      val onePass = EventStreams.foldReach(0, steps.iterator)
      val carried = EventStreams.foldReach(
        EventStreams.foldReach(0, b1.iterator), b2.iterator)
      onePass == carried
    }

  property("funnel fold reach is bounded and monotone in prefix length") =
    forAll(stepSeq) { steps =>
      val reaches = steps.inits.toList.reverse
        .map(p => EventStreams.foldReach(0, p.iterator))
      reaches.zip(reaches.tail).forall { case (a, b) => b >= a } &&
        reaches.last <= steps.length
    }

  private val valueSeq: Gen[List[Double]] =
    Gen.listOf(Gen.choose(-1e6, 1e6))

  /** The EWMA two-number state is split-invariant BITWISE — doubles, so
    * this only holds because the carried state replays the identical
    * arithmetic, which is exactly what the spec must pin. */
  property("ewma fold is split-invariant bitwise") =
    forAll(valueSeq, Gen.choose(0, 100), Gen.choose(0.01, 0.99)) {
      (xs, cut0, alpha) =>
        val cut = if (xs.isEmpty) 0 else cut0 % (xs.length + 1)
        val (b1, b2) = xs.splitAt(cut)
        val zero = EventStreams.EwmaState(0L, 0.0)
        val onePass = EventStreams.foldEwma(zero, alpha, xs.iterator)
        val carried = EventStreams.foldEwma(
          EventStreams.foldEwma(zero, alpha, b1.iterator), alpha, b2.iterator)
        onePass.n == carried.n &&
          java.lang.Double.doubleToLongBits(onePass.s) ==
            java.lang.Double.doubleToLongBits(carried.s)
    }

  /** splitSessions partitions its input exactly: concatenating closed
    * sessions plus the open tail restores the event list; gaps inside a
    * session never exceed the threshold; gaps between consecutive
    * sessions always do. */
  property("splitSessions partitions events with the gap invariant") =
    forAll(Gen.listOf(Gen.choose(0L, 10000L)), Gen.choose(1L, 2000L)) {
      (ts0, gap) =>
        val sorted = ts0.sorted.map(t => (t, 1.0))
        val (closed, open) = EventStreams.splitSessions(sorted, gap)
        val sessions = closed ++ (if (open.nonEmpty) List(open) else Nil)
        val rebuilt = sessions.flatten
        def gapsOk(s: List[(Long, Double)]) =
          s.zip(s.drop(1)).forall { case ((a, _), (b, _)) => b - a <= gap }
        val boundariesOk = sessions.zip(sessions.drop(1)).forall {
          case (s1, s2) => s2.head._1 - s1.last._1 > gap
        }
        rebuilt == sorted && sessions.forall(gapsOk) && boundariesOk &&
          (sorted.isEmpty || open.nonEmpty)
    }
}
