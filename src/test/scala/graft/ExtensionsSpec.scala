package graft

import graft.functions.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-registered kernels must be callable from `spark.sql` and agree
  * with the DataFrame route (same Expression class, so agreement is by
  * construction — this pins the registration plumbing and the codegen path
  * staying active under the SQL parser). */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTestBase._

  test("graft_dist2 / graft_dot are SQL-callable and match the column API") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dist2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d2,
        |       graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp
        |""".stripMargin).head()
    assert(row.getDouble(0) === 25.0)
    assert(row.getDouble(1) === 32.0)
    // and over a real table, equal to the DataFrame-API expression
    GraftExtensions.register(spark)  // idempotent re-registration must not throw
    val d = s"$sfDir"
    Tables.embeddings(spark, d)
      .selectExpr("vec_id", "cast(embedding as array<double>) AS v")
      .createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      s"""SELECT a.vec_id, graft_dist2(a.v, b.v) AS d2
         |FROM ext_vecs a JOIN ext_vecs b ON b.vec_id = 0 AND a.vec_id < 10
         |ORDER BY a.vec_id""".stripMargin).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaDf = {
      import org.apache.spark.sql.functions._
      val v = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probe = v.filter(col("vec_id") === 0).select(col("v").as("pv"))
      v.filter(col("vec_id") < 10).crossJoin(broadcast(probe))
        .select(col("vec_id"), graft.functions.VectorExprs.dist2(col("v"), col("pv")).as("d2"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    assert(viaSql.sameElements(viaDf))
  }

  test("SQL route casts raw float arrays and rejects wrong arity") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("ext_raw")
    // embedding is array<float> — the builder's Cast must make this equal
    // to the explicitly-cast route instead of reading float bits as doubles
    val viaRaw = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS n2 FROM ext_raw WHERE vec_id = 1")
      .head().getDouble(0)
    val viaCast = spark.sql(
      """SELECT graft_dot(cast(embedding AS array<double>),
        |                 cast(embedding AS array<double>)) AS n2
        |FROM ext_raw WHERE vec_id = 1""".stripMargin).head().getDouble(0)
    assert(viaRaw === viaCast)
    assert(viaRaw > 0.0)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dist2(array(1.0D))").head()
    }
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("graft_query table function: headline reports SQL ≡ DataFrame, composable") {
    GraftExtensions.register(spark)
    // the four headline pipeline reports the SQL surface must reach
    for (name <- Seq("q_dedup_clusters", "q_quality_ensemble", "q_bm25", "q_mmd_drift")) {
      val viaSql = spark.sql(
        s"SELECT * FROM graft_query('$name', '$sfDir')")
        .collect().map(_.toString).sorted
      val viaDf = SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).sorted
      assert(viaSql.sameElements(viaDf), s"$name: SQL route diverged from DataFrame route")
      assert(viaSql.nonEmpty, s"$name returned no rows")
    }
    // the TVF result is a real relation: composable with WHERE/agg
    val kept = spark.sql(
      s"""SELECT sum(n_docs) AS n FROM graft_query('q_quality_ensemble', '$sfDir')
         |WHERE decision = 'keep'""".stripMargin).head().getLong(0)
    val keptDf = SparkEntry.queries("q_quality_ensemble")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("decision") === "keep")
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    assert(kept == keptDf && kept > 0, s"composed TVF aggregate: $kept vs $keptDf")
    // registry listing covers every queries() entry
    val listed = spark.sql("SELECT name FROM graft_queries()")
      .collect().map(_.getString(0)).toSet
    assert(listed == SparkEntry.queries.keySet, "graft_queries() diverged from the registry")
    // unknown name fails at analysis with a pointer to the listing
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_query('q_no_such', '$sfDir')").head()
    }
    assert(err.getMessage.contains("graft_queries"), err.getMessage)
  }

  test("registerViews: plain SQL over the loaded SF dir, schema-adaptive") {
    GraftExtensions.register(spark)
    GraftExtensions.registerViews(spark, sfDir)
    val nDocs = spark.sql("SELECT count(*) AS n FROM documents").head().getLong(0)
    assert(nDocs == Tables.documents(spark, sfDir).count())
    // events must come through the adaptive loader: ts is a usable timestamp
    val hours = spark.sql(
      "SELECT count(DISTINCT date_trunc('hour', ts)) AS h FROM events").head().getLong(0)
    assert(hours > 0)
    // views + kernels compose
    val d0 = spark.sql(
      """SELECT graft_dist2(cast(a.embedding AS array<double>),
        |                   cast(b.embedding AS array<double>)) AS d
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 1 AND b.vec_id = 1
        |""".stripMargin).head().getDouble(0)
    assert(d0 === 0.0)
  }
}
