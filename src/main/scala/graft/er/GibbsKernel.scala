package graft.er

import java.util.SplittableRandom

import scala.collection.mutable.ArrayBuffer

import graft.er.model._

/** The per-partition Gibbs transition kernel — the engine's "physical
  * operator" (reference capability: GibbsUpdates.scala:124-755, re-derived
  * from the d-blink model of Marchant et al. 2021, JCGS 30(2):406-421).
  *
  * The whole sweep is a pure function of (rng seed, partition contents,
  * broadcast model), so it is deterministic under task retry and
  * repartitioning. It runs inside `flatMapGroups` on the state Dataset;
  * partition contents are materialized in heap exactly as the reference
  * does — the entity-space partitioner bounds the per-partition size.
  *
  * Model recap: entity values y ~ φ (empirical); distortion indicators
  * z ~ Bernoulli(θ_{attr,file}); record value x = y if z=0, else
  * x ~ ψ(·|y) ∝ φ(x)·exp(sim(x,y)). Missing x contributes nothing.
  */
object GibbsKernel {

  /** Mutable in-memory view of one partition's state. */
  final class PartitionState(
      val entities: ArrayBuffer[Array[Int]],    // entity idx -> values
      val records: Array[StateRecord],          // flat records (stable order)
      val assign: Array[Int],                   // record idx -> entity idx
      val links: ArrayBuffer[ArrayBuffer[Int]]) // entity idx -> record idxs

  object PartitionState {

    /** Deterministic load order: clusters sorted by smallest member record
      * id (isolates last, by value signature) — the shuffle's iterator
      * order is not stable, the sweep must be. */
    def fromClusters(clusters: Array[EntityCluster]): PartitionState = {
      val sorted = clusters.sortBy { c =>
        if (c.records.nonEmpty) (0, c.records.map(_.id).min, "")
        else (1, "", java.util.Arrays.toString(c.entityValues))
      }
      val entities = ArrayBuffer.empty[Array[Int]]
      val recs = ArrayBuffer.empty[StateRecord]
      val assign = ArrayBuffer.empty[Int]
      val links = ArrayBuffer.empty[ArrayBuffer[Int]]
      sorted.foreach { c =>
        val e = entities.length
        entities += c.entityValues.clone()
        links += ArrayBuffer.empty[Int]
        c.records.foreach { r =>
          links(e) += recs.length
          recs += r
          assign += e
        }
      }
      new PartitionState(entities, recs.toArray, assign.toArray, links)
    }
  }

  /** Inverted index (attrId, valueId) -> entity idxs, used to prune the
    * record-assignment draw to entities that agree on some non-distorted
    * attribute (reference capability: GibbsUpdates.scala:41-76). */
  private def buildInvertedIndex(
      st: PartitionState, numAttrs: Int): java.util.HashMap[Long, ArrayBuffer[Int]] = {
    val idx = new java.util.HashMap[Long, ArrayBuffer[Int]]()
    var e = 0
    while (e < st.entities.length) {
      val vals = st.entities(e)
      var a = 0
      while (a < numAttrs) {
        val key = postingKey(a, vals(a))
        var lst = idx.get(key)
        if (lst == null) { lst = ArrayBuffer.empty[Int]; idx.put(key, lst) }
        lst += e
        a += 1
      }
      e += 1
    }
    idx
  }

  @inline private def postingKey(attr: Int, value: Int): Long =
    (attr.toLong << 32) | (value.toLong & 0xffffffffL)

  /** One full sweep. Returns the partition's clusters re-keyed by the
    * partitioner (the caller's groupByKey supplies the shuffle). */
  def sweep(
      clusters: Array[EntityCluster],
      index: ModelIndex,
      partitioner: EntityPartitioner,
      theta: DistortionProbs,
      rng: SplittableRandom,
      collapsedAssignment: Boolean): Iterator[EntityCluster] = {

    val st = PartitionState.fromClusters(clusters)
    val nA = index.numAttributes

    updateAssignments(st, index, theta, rng, collapsedAssignment)
    updateEntityValues(st, index, rng)
    updateDistortions(st, index, theta, rng)

    // Re-key each cluster by its (possibly changed) entity values.
    val out = ArrayBuffer.empty[EntityCluster]
    var e = 0
    while (e < st.entities.length) {
      val vals = st.entities(e)
      val recs = st.links(e).sorted.map(st.records(_)).toArray
      out += EntityCluster(partitioner.partitionOf(vals), vals, recs)
      e += 1
    }
    out.iterator
  }

  // --- record → entity assignment ---------------------------------------

  private def updateAssignments(
      st: PartitionState,
      index: ModelIndex,
      theta: DistortionProbs,
      rng: SplittableRandom,
      collapsed: Boolean): Unit = {
    val nA = index.numAttributes
    val inv = if (collapsed) null else buildInvertedIndex(st, nA)
    var r = 0
    while (r < st.records.length) {
      val rec = st.records(r)
      val (cands, weights) =
        if (collapsed) collapsedAssignmentWeights(st, index, theta, rec)
        else indexedAssignmentWeights(st, inv, index, rec)
      val pick = cands(sampleCategorical(weights, rng))
      val prev = st.assign(r)
      if (pick != prev) {
        st.links(prev) -= r
        st.links(pick) += r
        st.assign(r) = pick
      }
      r += 1
    }
  }

  /** Candidates = intersection (smallest posting list first) over
    * non-distorted observed attributes; weight(e) = Π over distorted
    * observed attrs of exp(sim(x, y_e)) / z(y_e) (the φ(x) factor is
    * constant across entities). Falls back to all entities when every
    * observed attribute is distorted. */
  private[er] def indexedAssignmentWeights(
      st: PartitionState,
      inv: java.util.HashMap[Long, ArrayBuffer[Int]],
      index: ModelIndex,
      rec: StateRecord): (Array[Int], Array[Double]) = {
    val nA = index.numAttributes

    var postings: List[ArrayBuffer[Int]] = Nil
    var a = 0
    while (a < nA) {
      if (rec.values(a) != MissingValue && !rec.distorted(a)) {
        val lst = inv.get(postingKey(a, rec.values(a)))
        postings = (if (lst == null) ArrayBuffer.empty[Int] else lst) :: postings
      }
      a += 1
    }

    val cands: Array[Int] =
      if (postings.isEmpty) Array.tabulate(st.entities.length)(identity)
      else {
        // smallest-first intersection of the posting lists; never empty —
        // the record's current entity matches every non-distorted attribute
        // by the sweep invariant.
        val sortedLists = postings.sortBy(_.length)
        val smallest = sortedLists.head
        val rest = sortedLists.tail.map(_.toSet)
        val buf = ArrayBuffer.empty[Int]
        smallest.foreach { e => if (rest.forall(_.contains(e))) buf += e }
        buf.toArray
      }

    val weights = new Array[Double](cands.length)
    var i = 0
    while (i < cands.length) {
      val vals = st.entities(cands(i))
      var w = 1.0
      var a2 = 0
      while (a2 < nA) {
        val x = rec.values(a2)
        if (x != MissingValue && rec.distorted(a2)) {
          val attr = index.attributes(a2)
          val y = vals(a2)
          w *= attr.expSim(x, y) / attr.simNorms(y)
        }
        a2 += 1
      }
      weights(i) = w
      i += 1
    }
    (cands, weights)
  }

  /** Partially-collapsed variant: distortions integrated out, weight over
    * every entity in the partition via the per-attribute mixture
    * (1-θ)·1{x=y} + θ·ψ(x|y). */
  private[er] def collapsedAssignmentWeights(
      st: PartitionState,
      index: ModelIndex,
      theta: DistortionProbs,
      rec: StateRecord): (Array[Int], Array[Double]) = {
    val nA = index.numAttributes
    val cands = Array.tabulate(st.entities.length)(identity)
    val weights = new Array[Double](cands.length)
    var e = 0
    while (e < cands.length) {
      val vals = st.entities(e)
      var w = 1.0
      var a = 0
      while (a < nA) {
        val x = rec.values(a)
        if (x != MissingValue) {
          val attr = index.attributes(a)
          val th = theta(a, rec.fileId)
          val y = vals(a)
          val hit = if (x == y) 1.0 - th else 0.0
          w *= hit + th * attr.distortionProb(x, y)
        }
        a += 1
      }
      weights(e) = w
      e += 1
    }
    (cands, weights)
  }

  // --- entity value resampling ------------------------------------------

  private def updateEntityValues(
      st: PartitionState, index: ModelIndex, rng: SplittableRandom): Unit = {
    val nA = index.numAttributes
    var e = 0
    while (e < st.entities.length) {
      val vals = st.entities(e)
      val linked = st.links(e)
      var a = 0
      while (a < nA) {
        vals(a) = sampleEntityValue(index.attributes(a), a, linked, st, rng)
        a += 1
      }
      e += 1
    }
  }

  /** Conditional of y_a given the linked records: a non-distorted observed
    * link pins y to its value; otherwise p(y) ∝ φ(y)·z(y)^(-m)·Π_i
    * exp(sim(x_i, y)) over the m distorted observed links — sampled exactly
    * via the base/perturbation mixture (base = cached powered alias table;
    * perturbation lives on the union of the x_i's similarity
    * neighborhoods, where the product differs from 1). */
  private[er] def sampleEntityValue(
      attr: AttributeIndex,
      a: Int,
      linked: ArrayBuffer[Int],
      st: PartitionState,
      rng: SplittableRandom): Int = {

    var m = 0
    var pinned = MissingValue
    val distortedXs = ArrayBuffer.empty[Int]
    linked.foreach { r =>
      val rec = st.records(r)
      val x = rec.values(a)
      if (x != MissingValue) {
        if (!rec.distorted(a)) pinned = x
        else { m += 1; distortedXs += x }
      }
    }
    if (pinned != MissingValue) return pinned
    if (m == 0) return attr.samplePowered(0, rng)

    // Perturbation support: values where Π exp(sim(x_i, y)) > 1.
    val factor = new java.util.HashMap[Integer, java.lang.Double]()
    def bump(y: Int, e: Double): Unit = {
      val cur = factor.get(y)
      factor.put(y, if (cur == null) e else cur * e)
    }
    distortedXs.foreach { x =>
      bump(x, math.exp(attr.similarity.maxSimilarity))
      val ns = attr.neighbors(x)
      val es = attr.neighborExpSims(x)
      var i = 0
      while (i < ns.length) { bump(ns(i), es(i)); i += 1 }
    }

    val support = new Array[Int](factor.size)
    val pertW = new Array[Double](factor.size)
    var s = 0.0
    var i = 0
    val it = factor.entrySet().iterator()
    while (it.hasNext) {
      val kv = it.next()
      val y = kv.getKey.intValue()
      val w = attr.baseWeight(m, y) * (kv.getValue.doubleValue() - 1.0)
      support(i) = y
      pertW(i) = w
      s += w
      i += 1
    }

    val tm = attr.poweredTotal(m)
    if (rng.nextDouble() * (tm + s) < tm) attr.samplePowered(m, rng)
    else support(sampleCategorical(pertW, rng))
  }

  // --- distortion indicator resampling ----------------------------------

  private def updateDistortions(
      st: PartitionState,
      index: ModelIndex,
      theta: DistortionProbs,
      rng: SplittableRandom): Unit = {
    val nA = index.numAttributes
    var r = 0
    while (r < st.records.length) {
      val rec = st.records(r)
      val entityVals = st.entities(st.assign(r))
      var a = 0
      while (a < nA) {
        rec.distorted(a) =
          sampleDistortion(index.attributes(a), theta(a, rec.fileId),
            rec.values(a), entityVals(a), rng)
        a += 1
      }
      r += 1
    }
  }

  /** z | x, y, θ: forced true on disagreement; Bernoulli-with-odds
    * θ·ψ(x|y) : (1-θ) on agreement; false (by convention — no likelihood
    * contribution) when x is missing. */
  private[er] def sampleDistortion(
      attr: AttributeIndex, theta: Double, x: Int, y: Int,
      rng: SplittableRandom): Boolean = {
    if (x == MissingValue) false
    else if (x != y) true
    else {
      val pDist = theta * attr.distortionProb(x, y)
      val p = pDist / (pDist + (1.0 - theta))
      rng.nextDouble() < p
    }
  }

  // --- shared helpers ----------------------------------------------------

  private[er] def sampleCategorical(
      weights: Array[Double], rng: SplittableRandom): Int = {
    var total = 0.0
    var i = 0
    while (i < weights.length) { total += weights(i); i += 1 }
    if (total <= 0.0) return rng.nextInt(weights.length)
    var u = rng.nextDouble() * total
    i = 0
    while (i < weights.length - 1) {
      u -= weights(i)
      if (u <= 0.0) return i
      i += 1
    }
    weights.length - 1
  }
}
