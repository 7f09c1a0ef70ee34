package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Product quantization ANN (Jégou et al. 2011; the Faiss `ProductQuantizer`
  * design) — the third compression lever of the ANN stack, next to SQ8's
  * per-vector affine codes ([[Similarity.sq8TopK]]) and JL's dimension cut
  * ([[Similarity.projectedTopK]]): split each vector into `m` subvectors,
  * k-means-quantize each subspace independently (`k` centroids per
  * subspace), and store only the `m` code indices — here packed into ONE
  * int64 (m=8 × 4-bit codes), a 32× compression of a 64-dim float vector.
  *
  * Query-time ranking is asymmetric-distance (ADC): one `m×k` table of
  * `dot(q_j, centroid_{j,c})` per query, and each row's approximate dot is
  * `m` table lookups — no float vector is touched until the exact re-rank
  * of the top `rerank` survivors.
  *
  * 100 TB shape: training shuffles one partially-aggregated (sum, count)
  * per (partition, subspace, centroid) — map-side combined, bytes
  * independent of row count; encoding is a narrow codegen'd projection
  * ([[graft.functions.PqEncode]]); the candidate scan reads 8 BYTES per
  * vector (the packed codes) instead of 256; the ADC fold is a codegen'd
  * lookup sum ([[graft.functions.PqAdcDot]], table as a plan reference).
  *
  * Subspace k-means uses L2 geometry (the PQ standard — each subspace
  * approximates its slice of the dot product, so means are NOT
  * re-normalized, unlike [[Ivf.train]]'s cosine centroids).
  */
object Pq {

  /** codebooks(j)(c) = the `ds`-dim centroid c of subspace j. */
  final case class Model(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def ds: Int = codebooks.head.head.length
    require(k <= 16, s"codes pack 4 bits each: k must be <= 16, got $k")
    require(m <= 16, s"codes pack into one long: m must be <= 16, got $m")

    /** The ADC lookup table for one query: table(j*k + c) = dot(q_j, c_jc),
      * double accumulation in ascending dimension order.
      */
    def adcTable(query: Array[Float]): Array[Double] = {
      val t = new Array[Double](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          val cent = codebooks(j)(c)
          var d = 0.0
          var i = 0
          while (i < ds) { d += query(j * ds + i).toDouble * cent(i); i += 1 }
          t(j * k + c) = d
          c += 1
        }
        j += 1
      }
      t
    }
  }

  /** Squared L2 distance of `sub` to each centroid; argmin, ties → lowest
    * index (strict `<` keeps the first minimum).
    */
  private[graft] def argminL2(sub: Array[Float], cents: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < cent.length) {
        val diff = sub(i).toDouble - cent(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train `m` subspace codebooks with `iters` Lloyd iterations over a
    * deterministic hash-sample ([[Ivf.train]]'s seeding: the k lowest
    * id-hashes seed EVERY subspace from the same rows). One distributed
    * pass per iteration covers all subspaces (flatMap emits m slim
    * (subspace·k+code, subvector) pairs per row; reduceGroups map-side
    * combines).
    */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int = 16,
            iters: Int = 2, sampleMod: Int = 1): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    // persisted for the same reason as Ivf.train: seed scan + every Lloyd
    // iteration re-reads this bounded sample otherwise
    val vecs: Dataset[(Long, Seq[Float])] = df
      .where(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(col(idCol).cast("long").as("_1"), col(vecCol).as("_2"))
      .as[(Long, Seq[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val seedRows = vecs
      .withColumn("__h", xxhash64(col("_1")))
      .orderBy("__h").limit(k)
      .select("_2").as[Seq[Float]]
      .collect().map(_.toArray)
    require(seedRows.length == k, s"need at least $k training vectors, got ${seedRows.length}")
    val dim = seedRows.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val ds = dim / m

    var books: Array[Array[Array[Float]]] =
      Array.tabulate(m)(j => seedRows.map(_.slice(j * ds, (j + 1) * ds)))

    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(books)
      val sums = vecs
        .flatMap { case (_, v) =>
          val arr = v.toArray
          (0 until bc.value.length).map { j =>
            val d = arr.length / bc.value.length
            val sub = arr.slice(j * d, (j + 1) * d)
            (j * 16 + argminL2(sub, bc.value(j)), (sub.map(_.toDouble), 1L))
          }
        }
        .groupByKey(_._1)
        .reduceGroups { (a, b) =>
          val (va, ca) = a._2; val (vb, cb) = b._2
          var i = 0; while (i < va.length) { va(i) += vb(i); i += 1 }
          (a._1, (va, ca + cb))
        }
        .map { case (key, (_, (sum, cnt))) => (key, sum.map(_ / cnt), cnt) }
        .collect()
      val next = books.map(_.clone())
      sums.foreach { case (key, mean, _) =>
        next(key / 16)(key % 16) = mean.map(_.toFloat) // L2 mean: no renorm
      }
      books = next
      bc.destroy()
    }
    vecs.unpersist()
    Model(books)
  }

  /** Encode every vector to its packed codes — the narrow "index build"
    * projection (codebooks ride as a plan reference object).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    df.select(col(idCol).cast("long").as(idCol), col(vecCol),
      graft.functions.CdcExpressions.pqEncode(col(vecCol), model.codebooks).as("codes"))

  /** ADC top-k: rank ALL rows by the m-lookup approximate dot over the
    * packed codes, exact-cosine re-rank the top `rerank`. Both stages
    * `TakeOrderedAndProject`. At scale the codes column is PERSISTED
    * (32× smaller than the floats) and the candidate scan reads only it.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, model: Model,
           query: Array[Float], k: Int, rerank: Int = 40): DataFrame = {
    val table = model.adcTable(query)
    val cands = encode(df, idCol, vecCol, model)
      .select(col(idCol), col(vecCol),
        graft.functions.CdcExpressions.pqAdcDot(col("codes"), table, model.m, model.k)
          .as("__approx"))
      .orderBy(col("__approx").desc, col(idCol)).limit(rerank)
    cands.select(col(idCol), Similarity.cosineCol(col(vecCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
      .select(col(idCol))
  }
}
