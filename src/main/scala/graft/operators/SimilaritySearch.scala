package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — engine
  * extension for training-data pipelines (BASELINE.json north star).
  *
  * Two paths:
  *  - brute force: exact cosine top-k entirely in native expressions
  *    (zip_with dot product inside whole-stage codegen) — the correctness
  *    baseline, O(n) per query, fine up to millions of rows per executor.
  *  - LSH-bucketed: random-hyperplane signatures (sign of 64 random
  *    projections) bucket the vectors; near-dup search joins within
  *    chunk-equal buckets only. This is the 100 TB path: the shuffle
  *    carries (id, 64-bit signature), not the vectors, and exact cosine
  *    runs only on candidate pairs.
  */
object SimilaritySearch {

  /** Native cosine similarity between two array<double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(dot / (na * nb))
  }

  private def asDoubles(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k nearest neighbors of one query vector: a single scan,
    * codegen'd dot product, TakeOrderedAndProject for the top-k (no
    * global sort materialization). */
  def bruteForceTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol).as("neighbor_id"),
        cosine(asDoubles(col(vecCol)), q).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
      .limit(k)
  }

  /** 64-bit random-hyperplane signature: bit i = sign(v · r_i) where r_i
    * is a deterministic pseudo-random hyperplane (components derived from
    * mix64(seed, i, j) mapped to ±1). Row-local, no shuffle. */
  def hyperplaneSignature(seed: Long) = udf { (vec: Seq[Float]) =>
    if (vec == null || vec.isEmpty) null
    else {
      var sig = 0L
      var i = 0
      while (i < 64) {
        var dot = 0.0
        var j = 0
        while (j < vec.length) {
          // ±1 hyperplane component from the bit of a mixed counter
          val h = DetRngHash.mix(seed ^ (i.toLong << 32) ^ j.toLong)
          dot += (if ((h & 1L) == 1L) vec(j) else -vec(j))
          j += 1
        }
        if (dot >= 0) sig |= (1L << i)
        i += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }

  /** Embedding near-duplicate pairs: hyperplane-LSH buckets → exact
    * cosine on candidates only. Returns (id0, id1, cosine) with
    * cosine >= minCosine. Chunks give recall on pairs whose signatures
    * differ in <= chunks-1 bits (small angles ⇒ few differing bits). */
  def cosineNearDupPairs(
      df: DataFrame, vecCol: String, idCol: String,
      minCosine: Double = 0.95, chunks: Int = 4, seed: Long = 42L): DataFrame = {
    val bits = 64 / chunks
    val signed = df.select(col(idCol).as("id"), asDoubles(col(vecCol)).as("v"),
        hyperplaneSignature(seed)(col(vecCol)).as("sig"))
      .filter(col("sig").isNotNull)
    val chunked = signed.select(col("id"), col("v"),
      posexplode(array((0 until chunks).map(c =>
        shiftrightunsigned(col("sig"), c * bits)
          .bitwiseAND(lit((1L << bits) - 1))): _*)).as(Seq("chunk", "chunk_val")))
    val l = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id0"), col("v").as("v0"))
    val r = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id1"), col("v").as("v1"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id0") < col("id1"))
      .dropDuplicates("id0", "id1")
      .withColumn("cosine", cosine(col("v0"), col("v1")))
      .filter(col("cosine") >= minCosine)
      .select("id0", "id1", "cosine")
  }

  /** IVF-style two-stage search: coarse quantization by nearest of
    * `nCentroids` centroids (sampled deterministically from the data —
    * at scale replace with a proper k-means fit), then exact search only
    * in the query's `nProbe` nearest cells. The scan prunes to
    * nProbe/nCentroids of the data. */
  def ivfTopK(
      df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val data = df.select(col(idCol).as("id"), asDoubles(col(vecCol)).as("v"))
    // deterministic centroid sample: first nCentroids ids — a stand-in
    // coarse quantizer with the same plan shape as a trained one
    val centroids = data.orderBy("id").limit(nCentroids)
      .collect().zipWithIndex
      .map { case (row, i) => (i, row.getSeq[Double](1)) }
    val bc = data.sparkSession.sparkContext.broadcast(centroids)

    val assign = udf { (v: Seq[Double]) =>
      var best = -1
      var bestSim = Double.MinValue
      for ((cid, c) <- bc.value) {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var j = 0
        while (j < v.length) { dot += v(j) * c(j); na += v(j) * v(j); nb += c(j) * c(j); j += 1 }
        val sim = if (na == 0 || nb == 0) -2.0 else dot / math.sqrt(na * nb)
        if (sim > bestSim) { bestSim = sim; best = cid }
      }
      best
    }

    // query's nProbe nearest cells
    val qn = math.sqrt(query.map(x => x * x).sum)
    val probeCells = centroids.map { case (cid, c) =>
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      val cn = math.sqrt(c.map(x => x * x).sum)
      (cid, if (cn == 0 || qn == 0) -2.0 else dot / (cn * qn))
    }.sortBy(-_._2).take(nProbe).map(_._1).toSeq

    data.withColumn("cell", assign(col("v")))
      .filter(col("cell").isin(probeCells: _*))
      .select(col("id").as("neighbor_id"), cosine(col("v"), typedLit(query)).as("cosine"))
      .filter(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
      .limit(k)
  }
}
