package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Brute-force top-k is the correctness baseline (and the oracle); IVF is
  * the scale path: assign every vector to its nearest centroid (broadcast
  * centroids, map-side), then restrict each query to its `nprobe` closest
  * clusters — the candidate scan shrinks from |N| to |N| * nprobe / K,
  * and the heavy join is an equi-join on cluster_id instead of a cross
  * join. Output is (query, rank, neighbor) — ids not scores — so ranking
  * is robust to last-ulp float differences between engines.
  */
object AnnOps {

  val topK = 5
  val nQueries = 10
  val nprobe = 3

  private def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dot(a, b)

  private def embeddingsWithNorm(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      // single-split test parquet: spread the per-pair similarity work
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))

  // ------------------------------------------------ brute-force top-k

  /** Exact cosine top-5 for query vectors (vec_id < 10), self excluded. */
  def annTopk(s: SparkSession, dir: String): DataFrame = {
    val e = embeddingsWithNorm(s, dir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("v").as("cv"), col("norm").as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  val annTopkSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |  FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cosine
       |  FROM e q JOIN e c ON q.vec_id < $nQueries AND q.vec_id <> c.vec_id)
       |SELECT query_id, rank, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= $topK
       |ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------ IVF

  /** Trained centroids: the per-label mean vector (labels carry the
    * cluster structure of the synthetic embeddings; in production this is
    * one k-means iteration, which is the same groupBy-mean shape). */
  def centroids(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("m"))
    dims.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e.getField("m")).as("cv"))
      .select(col("label").cast("long").as("centroid_id"), col("cv"))
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
  }

  /** Cluster assignment: nearest centroid by cosine (broadcast, map-side). */
  def assignments(s: SparkSession, dir: String): DataFrame = {
    val e = embeddingsWithNorm(s, dir)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    e.join(broadcast(centroids(s, dir)))
      .withColumn("csim", dot(col("v"), col("cv")) / (col("norm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("centroid_id").as("cluster_id"))
  }

  /** IVF search: probe the `nprobe` closest clusters per query, exact
    * re-rank within candidates. Recall vs brute force is pinned in spec. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val assigned = assignments(s, dir).cache()
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))

    // nprobe closest centroids per query
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = q.join(broadcast(centroids(s, dir)))
      .withColumn("csim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("centroid_id").as("cluster_id"))

    // candidates = vectors in probed clusters (equi-join on cluster_id)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    probes.join(assigned.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("norm").as("cn"), col("cluster_id")), Seq("cluster_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_topk" -> (annTopk _),
    "q_ann_ivf"  -> (annIvf _))

  /** IVF is approximate by construction — spec-pinned, rows-only check. */
  def oracles: Map[String, String] = Map(
    "q_ann_topk" -> annTopkSql)
}
