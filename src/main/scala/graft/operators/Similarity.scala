package graft.operators

import graft.Engine._
import graft.{GQuery, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` fixture (64-dim float vectors).
  *
  * Two paths, as a real 100 TB pipeline would ship them:
  *  - q64: brute-force cosine top-k — the exact baseline. Query side is tiny
  *    (16 vectors) so the position-join is effectively a broadcast fan-out;
  *    cost is linear in corpus size.
  *  - q65: IVF (inverted-file) ANN — vectors are assigned to their nearest
  *    centroid once, and each query searches ONLY its own centroid's
  *    partition. At scale the assignment is the partition key: the corpus is
  *    clustered/bucketed by cluster id and a probe touches 1/K of the data.
  *
  * Parity design: dot products and norms accumulate per-dimension products in
  * DECIMAL(38,20) (order-independent, identical in DuckDB), then the cosine
  * is plain IEEE double division — so even the top-k ORDER is bit-identical
  * across engines. Ties broken by vec_id.
  */
object Similarity extends QueryModule {

  private val DEC = DecimalType(38, 20)

  /** (vec_id, pos, xd): one row per vector dimension, double-widened. */
  private def flat(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "x")))
      .select(col("vec_id"), (col("pos0") + 1).as("pos"), col("x").cast("double").as("xd"))

  private val flatSql =
    """flat AS (
      |  SELECT vec_id, i AS pos, CAST(embedding[i] AS DOUBLE) AS xd
      |  FROM (SELECT vec_id, embedding, unnest(range(1, len(embedding)+1)) AS i
      |        FROM embeddings))""".stripMargin

  private def norms(flatDf: DataFrame): DataFrame =
    flatDf.groupBy(col("vec_id"))
      .agg(sum((col("xd") * col("xd")).cast(DEC)).as("n2"))
      .select(col("vec_id"), sqrt(col("n2").cast("double")).as("nrm"))

  private val normsSql =
    """norms AS (
      |  SELECT vec_id, sqrt(CAST(SUM(CAST(xd*xd AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
      |  FROM flat GROUP BY vec_id)""".stripMargin

  /** Brute-force exact cosine top-5 for the 16 probe vectors (vec_id < 16). */
  def cosineKnn(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val f = flat(s, dir)
    val nrm = norms(f)
    val q = f.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("pos"), col("xd").as("qx"))
    val dots = q.join(f.select(col("vec_id").as("vid"), col("pos"), col("xd").as("vx")), "pos")
      .filter(col("qid") =!= col("vid"))
      .groupBy(col("qid"), col("vid"))
      .agg(sum((col("qx") * col("vx")).cast(DEC)).as("dotd"))
      .select(col("qid"), col("vid"), col("dotd").cast("double").as("dot"))
    val cos = dots
      .join(nrm.select(col("vec_id").as("qid"), col("nrm").as("nq")), "qid")
      .join(nrm.select(col("vec_id").as("vid"), col("nrm").as("nv")), "vid")
      .select(col("qid"), col("vid"), (col("dot") / (col("nq") * col("nv"))).as("cosim"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vid"))
    cos.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("vid"), round(col("cosim"), 9).as("cosim"), col("rn"))
  }

  private val cosineKnnSql =
    s"""WITH $flatSql,
       |$normsSql,
       |dots AS (
       |  SELECT q.vec_id AS qid, v.vec_id AS vid,
       |         CAST(SUM(CAST(q.xd*v.xd AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM flat q JOIN flat v ON q.pos = v.pos AND q.vec_id <> v.vec_id
       |  WHERE q.vec_id < 16
       |  GROUP BY q.vec_id, v.vec_id),
       |cos AS (
       |  SELECT qid, vid, dot / (a.nrm * b.nrm) AS cosim
       |  FROM dots JOIN norms a ON a.vec_id = qid JOIN norms b ON b.vec_id = vid)
       |SELECT qid, vid, round(cosim, 9) AS cosim, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosim DESC, vid) AS INT) AS rn
       |  FROM cos)
       |WHERE rn <= 5""".stripMargin

  /** IVF ANN: assign every vector to its nearest of 8 centroids, then each
    * probe searches only its own cluster. Top-3 within the probed cluster.
    */
  def ivfAnn(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    val f = flat(s, dir).cache()
    val nrm = norms(f).cache()
    val cent = f.filter(col("vec_id") % 250 === 0)
      .select(col("vec_id").as("cid"), col("pos"), col("xd").as("cx"))
    // assignment: cosine of every vector against each centroid, argmax
    val adots = f.join(broadcast(cent), "pos")
      .groupBy(col("vec_id"), col("cid"))
      .agg(sum((col("xd") * col("cx")).cast(DEC)).as("dotd"))
      .select(col("vec_id"), col("cid"), col("dotd").cast("double").as("dot"))
    val acos = adots
      .join(nrm, "vec_id")
      .join(nrm.select(col("vec_id").as("cid"), col("nrm").as("nc")), "cid")
      .select(col("vec_id"), col("cid"), (col("dot") / (col("nrm") * col("nc"))).as("cosim"))
    import org.apache.spark.sql.expressions.Window
    val wa = Window.partitionBy(col("vec_id")).orderBy(col("cosim").desc, col("cid"))
    val assign = acos.withColumn("rn", row_number().over(wa))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
      .cache()
    // probe: candidates = same-cluster vectors only
    val pairs = assign.filter(col("vec_id") < 16).select(col("vec_id").as("qid"), col("cid"))
      .join(assign.select(col("vec_id").as("vid"), col("cid")), "cid")
      .filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"))
    val pdots = pairs
      .join(f.select(col("vec_id").as("qid"), col("pos"), col("xd").as("qx")), "qid")
      .join(f.select(col("vec_id").as("vid"), col("pos"), col("xd").as("vx")), Seq("vid", "pos"))
      .groupBy(col("qid"), col("vid"))
      .agg(sum((col("qx") * col("vx")).cast(DEC)).as("dotd"))
      .select(col("qid"), col("vid"), col("dotd").cast("double").as("dot"))
    val pcos = pdots
      .join(nrm.select(col("vec_id").as("qid"), col("nrm").as("nq")), "qid")
      .join(nrm.select(col("vec_id").as("vid"), col("nrm").as("nv")), "vid")
      .select(col("qid"), col("vid"), (col("dot") / (col("nq") * col("nv"))).as("cosim"))
    val wp = Window.partitionBy(col("qid")).orderBy(col("cosim").desc, col("vid"))
    pcos.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), round(col("cosim"), 9).as("cosim"), col("rn"))
  }

  private val ivfAnnSql =
    s"""WITH $flatSql,
       |$normsSql,
       |cent AS (SELECT vec_id AS cid, pos, xd AS cx FROM flat WHERE vec_id % 250 = 0),
       |adots AS (
       |  SELECT f.vec_id, c.cid, CAST(SUM(CAST(f.xd*c.cx AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM flat f JOIN cent c ON f.pos = c.pos
       |  GROUP BY f.vec_id, c.cid),
       |acos AS (
       |  SELECT a.vec_id, a.cid, a.dot / (n1.nrm * n2.nrm) AS cosim
       |  FROM adots a JOIN norms n1 ON n1.vec_id = a.vec_id JOIN norms n2 ON n2.vec_id = a.cid),
       |assign AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosim DESC, cid) AS rn
       |    FROM acos)
       |  WHERE rn = 1),
       |pairs AS (
       |  SELECT q.vec_id AS qid, v.vec_id AS vid
       |  FROM assign q JOIN assign v ON q.cid = v.cid AND q.vec_id < 16 AND q.vec_id <> v.vec_id),
       |pdots AS (
       |  SELECT p.qid, p.vid, CAST(SUM(CAST(a.xd*b.xd AS DECIMAL(38,20))) AS DOUBLE) AS dot
       |  FROM pairs p
       |  JOIN flat a ON a.vec_id = p.qid
       |  JOIN flat b ON b.vec_id = p.vid AND b.pos = a.pos
       |  GROUP BY p.qid, p.vid),
       |pcos AS (
       |  SELECT d.qid, d.vid, d.dot / (n1.nrm * n2.nrm) AS cosim
       |  FROM pdots d JOIN norms n1 ON n1.vec_id = d.qid JOIN norms n2 ON n2.vec_id = d.vid)
       |SELECT qid, vid, round(cosim, 9) AS cosim, rn FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosim DESC, vid) AS INT) AS rn
       |  FROM pcos)
       |WHERE rn <= 3""".stripMargin

  /** Array/vector column breadth (F16): structural access to the embedding
    * column — dims, first/last elements — no float arithmetic, so values
    * pass through from parquet bit-identically.
    */
  def arrayOps(s: SparkSession, dir: String): DataFrame = {
    tune(s)
    table(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_x"),
        element_at(col("embedding"), -1).as("last_x"))
  }

  private val arrayOpsSql =
    """SELECT vec_id, label, CAST(len(embedding) AS INT) AS dim,
      |embedding[1] AS first_x, embedding[-1] AS last_x
      |FROM embeddings""".stripMargin

  override val queries: Seq[GQuery] = Seq(
    GQuery("q55_array_ops", "array column structural access (F16)", arrayOps, Some(arrayOpsSql)),
    GQuery("q64_cosine_knn", "brute-force exact cosine top-5 (ANN baseline)", cosineKnn, Some(cosineKnnSql)),
    GQuery("q65_ivf_ann", "IVF-partitioned ANN: centroid assignment + in-cluster top-3", ivfAnn, Some(ivfAnnSql)),
  )
}
