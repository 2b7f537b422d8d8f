package graft

import java.nio.file.{Files, Paths}

import graft.gql.GqlEngine
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** MovieLens end-to-end (reference test/movielens.cpp:26-91: create groups,
  * upsert all movies as vertices, tags as edges, query, dump). Bulk load
  * goes straight through the catalog's parquet write path — the scale
  * ingestion route (S11); per-statement GQL upserts are for incremental
  * mutations, not 9k-row imports. */
class MovielensSpec extends AnyFunSuite {
  import SparkTestBase.spark

  private val data = Paths.get("/root/reference/data/ml-latest-small")

  test("movielens: bulk CSV ingest, GQL queries, neighbor, dump") {
    assume(Files.exists(data), "movielens data not present")
    val root = Files.createTempDirectory("ml").toString
    val engine = new GqlEngine(spark, root)
    engine.exec("{create: 'movielens', group: ['movie', 'user', ['user', 'tagged', 'movie']]};")

    val movies = Sources.csv(spark, s"$data/movies.csv", StructType(Seq(
      StructField("movieId", LongType), StructField("title", StringType),
      StructField("genres", StringType))))
    val tags = Sources.csv(spark, s"$data/tags.csv", StructType(Seq(
      StructField("userId", LongType), StructField("movieId", LongType),
      StructField("tag", StringType), StructField("timestamp", LongType))))

    // bulk vertex load: catalog parquet write with the engine's key schema
    engine.catalog.write("movielens", "movie",
      movies.select(col("movieId").as("key_i"), lit(null).cast("string").as("key_s"),
        col("title"), col("genres")),
      kind = "vertex", keyType = "int")
    engine.catalog.write("movielens", "tagged",
      tags.select(col("userId").as("src_i"), lit(null).cast("string").as("src_s"),
        col("movieId").as("dst_i"), lit(null).cast("string").as("dst_s"),
        lit(true).as("directed"), col("tag")),
      kind = "edge", keyType = "")

    val nMovies = engine.query("{query: 'movie', in: 'movielens'};").count()
    assert(nMovies == movies.count() && nMovies > 9000)

    // point lookup + projection through GQL (movielens.cpp queries movies)
    val toyStory = engine.query(
      "{query: [movie.title], in: 'movielens', where: {id: 1}};").collect()
    assert(toyStory.length == 1 && toyStory(0).getString(0).startsWith("Toy Story"))

    // predicate scan on genres (array-less string contains-equality)
    val horror = engine.query(
      "{query: 'movie', in: 'movielens', where: {genres: 'Horror'}};").count()
    val horrorTruth = movies.filter(col("genres") === "Horror").count()
    assert(horror == horrorTruth && horror > 0)

    // neighbor query: movies user 2 tagged (edge scan with endpoint pred)
    val tagged2 = engine.query(
      "{query: 'tagged', in: 'movielens', where: [2, ->, *]};").count()
    val tagged2Truth = tags.filter(col("userId") === 2).count()
    assert(tagged2 == tagged2Truth && tagged2 > 0)

    // incremental GQL upsert on top of the bulk load (merge-on-key)
    engine.exec("{upset: 'movie', vertex: [[1, {title: 'Toy Story (1995) DIRECTOR CUT', genres: 'Adventure'}]]};")
    val updated = engine.query(
      "{query: [movie.title], in: 'movielens', where: {id: 1}};").collect()
    assert(updated(0).getString(0).endsWith("DIRECTOR CUT"))
    assert(engine.query("{query: 'movie', in: 'movielens'};").count() == nMovies)

    // dump emits the create statement (full dump of 9k vertices is a
    // driver-side export; just check the script head is replayable form)
    val dump = engine.exec("{dump: 'movielens'};").head
    assert(dump.status == "DUMP SUCCESS")
    assert(dump.text.get.startsWith("{create: 'movielens'"))
  }
}
